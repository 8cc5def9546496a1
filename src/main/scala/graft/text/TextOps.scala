package graft.text

/** Shared SQL fragments for the text/dedup operators (SURVEY.md north
  * star: dedup, text analysis). The fragments are engine-neutral SQL
  * (valid in both Spark SQL and duckdb) so the engine query and its
  * oracle evaluate the *same* integer hash — the cross-engine
  * determinism anchor for minhash/simhash.
  */
object TextOps {

  /** Parse one lowercase hex digit to its value — portable CASE. */
  private def hexDigit(e: String): String =
    s"(CASE $e " +
      (0 to 9).map(d => s"WHEN '$d' THEN $d").mkString(" ") + " " +
      "abcdef".zipWithIndex.map { case (c, i) => s"WHEN '$c' THEN ${10 + i}" }.mkString(" ") +
      " END)"

  /** 32-bit integer hash of a string expression: first 8 hex digits of
    * md5, parsed positionally. Identical in Spark SQL and duckdb. */
  def md5Hash32(x: String): String =
    (1 to 8).map { i =>
      val p = math.pow(16, 8 - i).toLong
      // CAST keeps the arithmetic in BIGINT — Spark 4 runs ANSI mode and
      // would raise on int×int overflow; duckdb accepts the same cast.
      s"${hexDigit(s"substr(md5($x), $i, 1)")} * CAST($p AS BIGINT)"
    }.mkString("(", " + ", ")")

  /** Spark-side fast form of [[md5Hash32]]: one md5 + hex parse via
    * `conv`. Value-identical to the CASE tree (Σ digit·16^(8−i)), which
    * stays as the duckdb oracle form (duckdb has no `conv`). */
  def md5Hash32Fast(x: String): String =
    s"CAST(conv(substr(md5($x), 1, 8), 16, 10) AS BIGINT)"

  /** Universal-hash family over a base hash column `h`:
    * h_k = (a_k·h + b_k) mod 2147483647. */
  def minhashExpr(h: String, k: Int): String =
    s"((${2 * k + 3} * $h + ${k * k + 1}) % 2147483647)"

  // ---- HyperLogLog fragments (d30): p = 6 → m = 64 registers over the
  // 32-bit md5 hash. All pure-integer (the one float op, the final
  // estimate division, divides exact int64s < 2^53 — IEEE-exact in both
  // engines). The low 6 hash bits pick the register; the remaining 26
  // bits feed the leading-zero rank.

  /** Floor integer division as engine-neutral SQL: num and den exact
    * BIGINTs < 2^53, num ≥ 0, den > 0 — (num − num%den)/den is an exact
    * double, so the CAST is exact. */
  def idiv(num: String, den: String): String =
    s"CAST((($num) - (($num) % ($den))) / ($den) AS BIGINT)"

  /** The 26 value bits above the register index: h div 64. */
  def hllW(h: String): String = idiv(h, "64")

  /** HLL rank ρ(w) = leading zeros of the 26-bit w, plus 1 (∈ [1,27]);
    * a CASE ladder keeps it integer-exact in both engines. */
  def hllRho(w: String): String =
    "(CASE " +
      (0 until 26).map(i => s"WHEN ($w) >= ${1L << (25 - i)} THEN ${i + 1}").mkString(" ") +
      " ELSE 27 END)"

  /** 2^e for e ∈ [0,27] as a CASE ladder (no engine-specific shift op). */
  def pow2(e: String): String =
    "(CASE " + (0 to 27).map(k => s"WHEN ($e) = $k THEN ${1L << k}").mkString(" ") + " ELSE 0 END)"

  /** Flajolet small-range (linear-counting) table: round(m·ln(m/V)) for
    * V ∈ [1,64] zero registers, precomputed HERE so both engines read
    * identical integer constants — no cross-engine libm exposure. */
  def hllLinearCount(v: String): String =
    "(CASE " +
      (1 to 64).map(vv => s"WHEN ($v) = $vv THEN ${Math.round(64.0 * Math.log(64.0 / vv))}").mkString(" ") +
      " ELSE 0 END)"

  /** Raw HLL estimate floor(α_64·m²·2^27 / Z) where Z = Σ 2^(27−M_j):
    * α_64 = 0.709 exactly as the rational 709/1000, so the numerator is
    * the exact integer 2904064·2^27 and the whole estimate is one
    * integer floor-division. */
  def hllRaw(z: String): String =
    idiv((2904064L * 134217728L).toString, s"1000 * ($z)")
}
