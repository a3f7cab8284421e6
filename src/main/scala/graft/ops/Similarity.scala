package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column — the training-data-pipeline
  * operator family: exact brute-force top-k as the correctness baseline,
  * IVFADC (graft.parity.IvfAdc) as the sub-linear scale path.
  *
  * The brute-force path is pure `functions._` (zip_with + aggregate) —
  * codegen'd, no UDF, and with the same double arithmetic order as the
  * DuckDB oracle's list_distance.
  */
object Similarity {

  /** Euclidean distance column between two double-array columns. */
  def l2Dist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, x) => acc + x))

  /** Cosine similarity column between two double-array columns. */
  def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)
    val na = sqrt(aggregate(a, lit(0.0), (s, x) => s + x * x))
    val nb = sqrt(aggregate(b, lit(0.0), (s, x) => s + x * x))
    dot / (na * nb)
  }

  private def asDouble(c: org.apache.spark.sql.Column) =
    transform(c, x => x.cast("double"))

  /** Exact L2 top-k: each query vector against the full set. Queries are
    * broadcast; the scan is embarrassingly parallel (one pass over the
    * big side, no shuffle until the tiny per-query top-k merge).
    */
  def bruteForceTopK(
      spark: SparkSession,
      embeddings: DataFrame, // (vec_id, embedding)
      queryIds: Seq[Long],
      k: Int): DataFrame = {
    import spark.implicits._
    // r7: the double-cast vectors come from the shared embed-norm frame
    // (one derivation serves this and the embedding dedup — identical
    // transform expression), and the broadcast side is a LITERAL of the
    // collected query vectors (deterministic per frame, served by the
    // value cache): no per-call filter job to build the broadcast.
    val emb = Dedup.embedNorm(embeddings).select(col("vec_id"), col("e"))
    val qRows = DerivedValueCache(embeddings,
      s"brute-q@${queryIds.mkString(",")}")(
      emb.filter(col("vec_id").isin(queryIds: _*))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
        .sortBy(_._1).toSeq)
    val q = qRows.toDF("query_id", "qe")
    val d = emb.crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id"),
        round(l2Dist(col("qe"), col("e")), 4).as("dist"))
    val win = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("vec_id").asc)
    d.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "dist")
      .orderBy("query_id", "rank")
  }

  /** DuckDB oracle for [[bruteForceTopK]]. */
  def bruteForceOracleSql(queryIds: Seq[Long], k: Int): String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
       |  FROM embeddings WHERE vec_id IN (${queryIds.mkString(", ")})),
       |d AS (
       |  SELECT q.query_id, e.vec_id,
       |         round(list_distance(q.qe, CAST(e.embedding AS DOUBLE[])), 4) AS dist
       |  FROM q CROSS JOIN embeddings e),
       |r AS (
       |  SELECT query_id,
       |         CAST(row_number() OVER (
       |           PARTITION BY query_id ORDER BY dist, vec_id) AS INTEGER) AS rank,
       |         vec_id, dist
       |  FROM d)
       |SELECT query_id, rank, vec_id, dist FROM r
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
}
