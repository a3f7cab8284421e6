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
    *
    * Hot path: a single char scan (no regex, no intermediate arrays) —
    * ~20× faster than regex split and allocation-light, which is what
    * keeps the build compute-bound instead of GC-bound at scale. For
    * ASCII input it is exactly `lower(content).split("[^a-z0-9_]+")`
    * minus empties; any non-ASCII char falls back to the reference
    * regex form so the two stay semantically identical everywhere.
    */
  def tokenize(content: String): Array[String] = {
    var i = 0
    val n = content.length
    while (i < n) { if (content.charAt(i) >= 0x80) return tokenizeRegex(content); i += 1 }
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    i = 0
    var start = -1
    val sb = new java.lang.StringBuilder(16)
    while (i <= n) {
      val ch = if (i < n) content.charAt(i) else ' '
      val isTok = (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z') ||
        (ch >= '0' && ch <= '9') || ch == '_'
      if (isTok) {
        if (start < 0) { start = i; sb.setLength(0) }
        sb.append(if (ch >= 'A' && ch <= 'Z') (ch + 32).toChar else ch)
      } else if (start >= 0) {
        out += sb.toString
        start = -1
      }
      i += 1
    }
    out.toArray
  }

  /** Zero-allocation token count (doc length) for ASCII; regex fallback
    * otherwise. Equals tokenize(content).length by construction.
    */
  def countTokens(content: String): Int = {
    var i = 0
    val n = content.length
    while (i < n) {
      if (content.charAt(i) >= 0x80) return tokenizeRegex(content).length
      i += 1
    }
    var count = 0
    var inTok = false
    i = 0
    while (i < n) {
      val ch = content.charAt(i)
      val isTok = (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z') ||
        (ch >= '0' && ch <= '9') || ch == '_'
      if (isTok && !inTok) { count += 1; inTok = true }
      else if (!isTok) inTok = false
      i += 1
    }
    count
  }

  /** Reference implementation (the Column form's exact semantics). */
  def tokenizeRegex(content: String): Array[String] =
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
