package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.tokenize.Tokenizer

/** Salted two-phase aggregation for stop-word-heavy term keys
  * (north_rule: "salted-key skew handling for stop-word-heavy terms").
  *
  * Where it matters: COMBINABLE aggregates (count/sum/min/max) are
  * already skew-proof — map-side partial aggregation pre-combines every
  * hot key per task, which is why the engine's dictionary needs no salt.
  * The aggregations that DO melt a reducer are the non-combinable,
  * list-building kind — materializing a term's full posting list is the
  * canonical case: a stop word's list is the whole corpus, and an
  * unsalted `groupBy(term).agg(collect_list(...))` funnels it through
  * one task.
  *
  * Phase 1 groups by (term, salt = hash(doc_id) % buckets) — a hot
  * term's docs spread over `buckets` reducers, each building a bounded
  * sub-list. Phase 2 merges `buckets` sub-lists per term — bounded fan-in
  * regardless of df. Output order is deterministic (sub-lists and the
  * merged list are sorted), so the result is salt-invariant.
  */
object SkewedAgg {

  /** Per-term posting-list materialization with salted assembly.
    * Output: (term, df, doc_ids_sha) where doc_ids_sha is the sha256 of
    * the comma-joined ascending doc list — a scalar witness of the full
    * list content (array columns don't hash-compare portably).
    */
  def termPostingLists(docs: DataFrame, buckets: Int): DataFrame = {
    // r7: the (term, doc_id) base is exactly the shared per-(term, doc)
    // frequency frame the BM25/dictionary paths derive once per docs
    // identity — reuse it instead of re-running tokenize+explode+groupBy
    // per call (one tokenize pass serves one more operator).
    val termDocs = graft.query.Bm25SqlPath.termFreqs(docs)
      .select(col("term"), col("doc_id"))

    val phase1 = termDocs
      .withColumn("salt", pmod(hash(col("doc_id")), lit(buckets)))
      .groupBy(col("term"), col("salt"))
      .agg(sort_array(collect_list(col("doc_id"))).as("part_ids"),
        count(lit(1)).as("part_df"))

    phase1
      .groupBy(col("term"))
      .agg(
        sort_array(flatten(collect_list(col("part_ids")))).as("doc_ids"),
        sum(col("part_df")).as("df"))
      .select(col("term"), col("df"),
        sha2(concat_ws(",", col("doc_ids")), 256).as("doc_ids_sha"))
      .orderBy("term")
  }

  /** DuckDB oracle: the same list content via ordered string_agg. */
  def oracleSql: String = {
    val toks = Tokenizer.sqlTokensExpr("content")
    s"""WITH ${graft.sources.Corpus.sqlDocsCtes},
       |tok AS (SELECT doc_id, unnest($toks) AS term FROM docs),
       |td AS (SELECT DISTINCT term, doc_id FROM tok)
       |SELECT term, count(*) AS df,
       |       sha256(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
       |         AS doc_ids_sha
       |FROM td GROUP BY term ORDER BY term""".stripMargin
  }
}
