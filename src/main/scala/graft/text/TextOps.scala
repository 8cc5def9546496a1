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
}
