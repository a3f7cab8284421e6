package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** BM25 scoring constants + formula — the single source of truth shared by
  * the DataFrame path, the WAND mapPartitions scorer, and the oracle SQL.
  *
  * Parameters fixed by BASELINE.json north_star: k1 = 1.2, b = 0.75.
  * idf is the Robertson-Sparck-Jones form with +1 smoothing (always
  * positive): ln((N - df + 0.5)/(df + 0.5) + 1).
  *
  * Rank order is defined on scores ROUNDED to [[Scale]] decimals with
  * tiebreak doc_id ASC — this makes ranking immune to float summation
  * order (SURVEY.md §7.4 "rank-identity incl. ties").
  */
object Bm25 {
  val K1: Double = 1.2
  val B: Double = 0.75

  /** Decimal places scores are rounded to before ranking/comparison. */
  val Scale: Int = 4

  def idf(n: Long, df: Long): Double =
    math.log((n - df + 0.5) / (df + 0.5) + 1.0)

  /** Query-independent contribution of one (term, doc) posting. */
  def contrib(idf: Double, tf: Long, dl: Long, avgdl: Double): Double =
    idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))

  /** The idf-free factor: contrib = idf * g(tf, dl). Monotone in tf, so
    * max(g) per block times idf is a valid WAND upper bound.
    */
  def g(tf: Long, dl: Long, avgdl: Double): Double =
    tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))

  /** Column form of [[idf]] (for the DataFrame path). */
  def idfCol(n: Column, df: Column): Column =
    log((n - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))

  /** Column form of [[contrib]]. */
  def contribCol(idf: Column, tf: Column, dl: Column, avgdl: Column): Column =
    idf * tf * lit(K1 + 1.0) /
      (tf + lit(K1) * (lit(1.0 - B) + lit(B) * dl / avgdl))

  /** DuckDB SQL fragment for the per-posting contribution; identifiers are
    * the caller's column names for n, df, tf, dl, avgdl.
    */
  def sqlContribExpr(n: String, df: String, tf: String, dl: String, avgdl: String): String =
    s"ln(($n - $df + 0.5)/($df + 0.5) + 1.0) * $tf * ${K1 + 1.0} / " +
      s"($tf + $K1 * (${1.0 - B} + $B * $dl / $avgdl))"
}
