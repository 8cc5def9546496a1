#!/usr/bin/env python3
"""Merge N BENCH_SELF-shaped json files into one element-wise-min
BENCH_SELF.json (the repo's min-of-repeats protocol: totals wander
+-15-30% with box state, so a single post-churn run bakes a noisy
ceiling into the next round's 2x gate).

Usage: bench_min.py out.json note "..." in1.json in2.json [...]
"""
import json, sys

out, _note_kw, note = sys.argv[1], sys.argv[2], sys.argv[3]
assert _note_kw == "note", (
    f"usage: bench_min.py out.json note '...' in1.json in2.json [...] "
    f"(got {_note_kw!r} where 'note' expected)")
ins = [json.load(open(p)) for p in sys.argv[4:]]
assert len(ins) >= 2
names = set(ins[0]["queries"])
for b in ins[1:]:
    assert set(b["queries"]) == names, "query sets differ"
qs = {q: min(b["queries"][q] for b in ins) for q in sorted(names)}
total = round(sum(qs.values()), 2)
merged = {
    "metric": "total", "value": total, "unit": "sec",
    "queries": {q: qs[q] for q in sorted(qs)},
    "errors": [], "sf": ins[0]["sf"],
    "note": note,
}
json.dump(merged, open(out, "w"))
print(f"{out}: {len(qs)} queries, element-wise-min total {total} s "
      f"(inputs: {', '.join(str(round(b['value'], 1)) for b in ins)})")
