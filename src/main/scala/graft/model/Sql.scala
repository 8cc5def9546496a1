package graft.model

/** Shared SQL-literal helpers for the cross-engine-exact model DAGs
  * (one definition; LimbDark/Kepler/Flare/GpHyper delegate — r10
  * advice: D was defined three times). */
object Sql {

  /** A double literal valid — and typed DOUBLE — in BOTH dialects.
    * Plain literals like `1000.0` are DECIMAL in DuckDB; a
    * DECIMAL·DECIMAL product is decimal128 and hash-mismatches the
    * Spark double, so every literal that can meet another literal is
    * wrapped. */
  def D(x: Double): String = s"CAST($x AS DOUBLE)"
}
