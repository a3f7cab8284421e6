package graft.tokenize

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic code tokenizer — the single source of truth for what a
  * "term" is, shared by the Spark path, the oracle SQL (DuckDB
  * `regexp_split_to_array` with the same pattern), and the tests.
  *
  * Semantics: lowercase, split on runs of anything outside
  * [a-z0-9_], drop empties. Keeps identifiers (underscores) whole —
  * appropriate for source code.
  *
  * Reference analog: the fixed input transform of the reference is
  * identity (raw float columns, /root/reference/src/index.jl:103); the
  * graft's tokenizer is its "feature extraction" stage.
  */
object Tokenizer {

  /** The split pattern. Used verbatim in oracle SQL. */
  val SplitRe = "[^a-z0-9_]+"

  /** Pure Scala tokenizer — used in mapPartitions build paths and tests.
    * Must stay semantically identical to [[tokensCol]].
    */
  def tokenize(content: String): Array[String] =
    content.toLowerCase(java.util.Locale.ROOT).split(SplitRe).filter(_.nonEmpty)

  /** Codegen'd Column form: filter(split(lower(c), re), _ != "").
    * No UDF — stays inside whole-stage codegen.
    */
  def tokensCol(c: Column): Column =
    filter(split(lower(c), SplitRe), t => t =!= lit(""))

  /** DuckDB SQL fragment producing the same token array for a column. */
  def sqlTokensExpr(col: String): String =
    s"list_filter(regexp_split_to_array(lower($col), '$SplitRe'), x -> x <> '')"
}
