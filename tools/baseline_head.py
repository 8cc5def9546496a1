#!/usr/bin/env python3
"""Regenerate the HEAD gate-reference table in BASELINE.md (r10,
verdict #7): one table of current per-query seconds from
BENCH_SELF.json, marked as THE 2x-gate reference, spliced between
the HEAD-TABLE-START/END markers. Historical batches below stay as
archive. The measurement-protocol sentence is derived from the
json's own `note` field (r11 advice: the prose used to hardcode
"cold single-shot" while the json had moved to min-of-3). Run after
refreshing BENCH_SELF.json at round close:

    python3 tools/baseline_head.py
"""
import json, os, re, datetime

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

bench = json.load(open(os.path.join(REPO, "BENCH_SELF.json")))
qs = bench["queries"]
names = sorted(qs)
ncol = 3  # (query, s) pairs per row
rows = []
per = (len(names) + ncol - 1) // ncol
for i in range(per):
    cells = []
    for c in range(ncol):
        j = i + c * per
        if j < len(names):
            cells.append(f"{names[j]} | {qs[names[j]]:.2f}")
        else:
            cells.append(" | ")
    rows.append("| " + " | ".join(cells) + " |")

today = datetime.date.today().isoformat()
# methodology comes from the json itself, not hardcoded prose
protocol = bench.get("note") or "single-shot run (protocol unrecorded)"
header = (
    f"## HEAD gate reference (generated {today} — THE 2x-gate table)\n\n"
    f"Seconds per query from `graft.Bench` under the driver's\n"
    f"config (local[32], sf0.1), {len(names)} queries, total\n"
    f"**{bench['value']:.1f} s**. Protocol: {protocol}.\n"
    f"This table is the regression reference: a query exceeding 2x\n"
    f"its value here is a regression (individual runs carry\n"
    f"+-15-40% JIT/box noise — confirm with a `graft.TimeOne <query>`\n"
    f"3-run median before acting). Everything below this section is\n"
    f"historical archive.\n\n"
    + "| query | s | query | s | query | s |\n"
    + "|---|---|---|---|---|---|\n"
)
table = header + "\n".join(rows) + "\n"

path = os.path.join(REPO, "BASELINE.md")
text = open(path).read()
START, END = "<!-- HEAD-TABLE-START -->", "<!-- HEAD-TABLE-END -->"
block = f"{START}\n{table}{END}"
if START in text:
    text = re.sub(re.escape(START) + r".*?" + re.escape(END), block,
                  text, flags=re.S)
else:
    # insert after the driver-defined-targets section (before the
    # first measured-baseline archive section)
    anchor = "## Measured Spark baseline (round 1"
    text = text.replace(anchor, block + "\n" + anchor, 1)
open(path, "w").write(text)
print(f"wrote HEAD table: {len(names)} queries, total {bench['value']:.1f} s")

# Flat machine-readable twin of the HEAD table (r16, verdict #5):
# graft.Bench reads this at the end of a run and re-runs any >2x query
# 3x in-session, emitting a `triage` block in BENCH_SELF.json so the
# gate check is self-contained (no manual TimeOne passes).
floors_path = os.path.join(REPO, "BASELINE_FLOORS.json")
json.dump({q: round(qs[q], 2) for q in names}, open(floors_path, "w"))
print(f"wrote {floors_path}: {len(names)} floors")
