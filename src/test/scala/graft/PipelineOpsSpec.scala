package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Sampling, TextStats}
import graft.sources.Corpus

/** Round-6 pipeline additions: repetition signals + stratified sample. */
class PipelineOpsSpec extends SparkSpec {

  test("repetition signals match hand-computed values") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b a b a"), // top 3/5, bigrams 4 (2 distinct), trigrams 3 (2 distinct)
      (1L, "x"),         // single token
      (2L, ""),          // empty
      (3L, "p q r s")    // all unique
    ).toDF("doc_id", "content")
    val out = TextStats.repetition(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out(0) == ((0L, 5, 0.6, 0.5, 0.3333)))
    assert(out(1) == ((1L, 1, 1.0, 0.0, 0.0)))
    assert(out(2) == ((2L, 0, 0.0, 0.0, 0.0)))
    assert(out(3) == ((3L, 4, 0.25, 0.0, 0.0)))
  }

  test("repetition flags a degenerate doc above a clean one") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spam spam spam spam spam ham"),
      (1L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "content")
    val rows = TextStats.repetition(docs).collect()
    assert(rows(0).getDouble(2) > 0.8 && rows(1).getDouble(2) < 0.3)
    assert(rows(0).getDouble(3) > rows(1).getDouble(3))
  }

  test("stratified sample: salted two-phase == single window, ranks complete") {
    val docs = Corpus.docs(spark, sf0001)
    val out = Sampling.stratifiedSample(docs, k = 7, salts = 16)
    val single = {
      val keyed = docs.select(col("lang"), col("doc_id"),
        sha2(concat(lit("s"), col("doc_id").cast("string")), 256).as("skey"))
      keyed.withColumn("sample_rank", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("skey"), col("doc_id"))))
        .filter(col("sample_rank") <= 7)
        .select("lang", "sample_rank", "doc_id", "skey")
    }
    assert(out.exceptAll(single).isEmpty && single.exceptAll(out).isEmpty)
    // every lang contributes exactly min(k, langDocs) ranks 1..k
    val perLang = out.groupBy("lang")
      .agg(count(lit(1)).as("n"), max("sample_rank").as("mx"),
        countDistinct("sample_rank").as("d"))
      .collect()
    assert(perLang.nonEmpty)
    perLang.foreach { r =>
      assert(r.getLong(1) <= 7 && r.getLong(1) == r.getLong(3)
        && r.getInt(2) == r.getLong(1))
    }
  }

  test("stratified sample is deterministic and salt-count-invariant") {
    val docs = Corpus.docs(spark, sf0001)
    val a = Sampling.stratifiedSample(docs, k = 5, salts = 1).collect().toSeq
    val b = Sampling.stratifiedSample(docs, k = 5, salts = 32).collect().toSeq
    assert(a == b)
  }
}
