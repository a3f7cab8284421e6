package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the data-mixing primitive a
  * training pipeline runs after filtering ("take exactly k documents
  * per language, reproducibly, independent of partitioning"). Sample
  * membership is the top-k of a content-independent pseudorandom key
  * (sha256 over the doc id), so the sample is stable across runs,
  * engines, and cluster sizes, and adding documents only perturbs the
  * sample where the key order says so — no RNG state anywhere.
  *
  * Scale shape: a single `row_number() OVER (PARTITION BY group)` puts
  * every row of a group on ONE reducer — and one dominant language is
  * the norm in web corpora, so that reducer sees ~all of 100 TB. The
  * two-phase salted form bounds it: phase 1 ranks within (group, salt)
  * — `salts` × more, `salts` × smaller partitions — and keeps k per
  * shard; the group's true top-k each survive their own shard (k kept
  * per shard ⊇ the shard's share of the global top-k, pigeonhole), so
  * phase 2 ranks ≤ salts·k survivors per group and is exactly the
  * single-window result. Both phases are plain window functions —
  * Catalyst sees the narrow projection and pushes the column pruning
  * into the scan.
  */
object Sampling {

  /** Exact deterministic top-k sample per `lang` (rank 1 = smallest
    * key). Output: (lang, sample_rank, doc_id, skey).
    */
  def stratifiedSample(docs: DataFrame, k: Int, salts: Int = 16): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(salts > 0, s"salts must be positive, got $salts")
    val keyed = docs.select(
      col("lang"), col("doc_id"),
      sha2(concat(lit("s"), col("doc_id").cast("string")), 256).as("skey"))
      .withColumn("_salt", pmod(col("doc_id"), lit(salts.toLong)))
    val perShard = Window.partitionBy(col("lang"), col("_salt"))
      .orderBy(col("skey"), col("doc_id"))
    val perGroup = Window.partitionBy(col("lang"))
      .orderBy(col("skey"), col("doc_id"))
    keyed
      .withColumn("_rn", row_number().over(perShard))
      .filter(col("_rn") <= k)
      .drop("_rn", "_salt")
      .withColumn("sample_rank", row_number().over(perGroup))
      .filter(col("sample_rank") <= k)
      .select(col("lang"), col("sample_rank"), col("doc_id"), col("skey"))
      .orderBy("lang", "sample_rank")
  }

  /** DuckDB twin: the single-window form (the salted two-phase plan is
    * an exact rewrite of it; the hash-match IS the equivalence proof).
    */
  def oracleSql(k: Int): String =
    s"""WITH ${graft.sources.Corpus.sqlDocsCtes},
       |keyed AS (
       |  SELECT lang, doc_id,
       |         sha256('s' || CAST(doc_id AS VARCHAR)) AS skey
       |  FROM docs),
       |ranked AS (
       |  SELECT lang,
       |         CAST(row_number() OVER (
       |           PARTITION BY lang ORDER BY skey, doc_id) AS INTEGER)
       |           AS sample_rank,
       |         doc_id, skey
       |  FROM keyed)
       |SELECT lang, sample_rank, doc_id, skey FROM ranked
       |WHERE sample_rank <= $k
       |ORDER BY lang, sample_rank""".stripMargin
}
