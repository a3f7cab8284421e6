package graft

import graft.query.{Bm25, Bm25SqlPath, QuerySet}
import graft.sources.Corpus

class Bm25SqlPathSpec extends SparkSpec {

  test("flagship top-10: 10 rows, ranks 1..10, scores non-increasing") {
    val out = Bm25SqlPath
      .topK(spark, Corpus.docs(spark, sf0001), QuerySet.queries.take(1), 10)
      .collect()
    assert(out.length == 10)
    assert(out.map(_.getInt(1)).toSeq == (1 to 10))
    val scores = out.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("hand-computed BM25 on a 3-doc corpus matches engine") {
    import spark.implicits._
    // corpus: terms and lengths chosen so everything is hand-checkable
    val docs = Seq(
      (0L, "cat dog cat", 3),
      (1L, "dog dog dog fish", 4),
      (2L, "fish bird", 2)
    ).toDF("doc_id", "content", "doc_len")
    val out = Bm25SqlPath.topK(spark, docs, Seq(1 -> Seq("cat", "dog")), 3)
      .collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    val n = 3L
    val avgdl = 3.0
    def score(pairs: Seq[(Long, Long, Long)]): Double = // (df, tf, dl)
      pairs.map { case (df, tf, dl) =>
        Bm25.contrib(Bm25.idf(n, df), tf, dl, avgdl)
      }.sum
    def r4(x: Double): Double = BigDecimal(x)
      .setScale(Bm25.Scale, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = Map(
      0L -> r4(score(Seq((1L, 2L, 3L), (2L, 1L, 3L)))), // cat tf=2, dog tf=1
      1L -> r4(score(Seq((2L, 3L, 4L)))), // dog tf=3
      2L -> 0.0 // no query terms... absent entirely
    )
    assert(out.length == 2) // doc 2 has no query term => no row
    out.foreach { case (id, s) => assert(math.abs(s - exp(id)) < 1e-9, s"doc $id") }
  }

  test("driver contract: SparkEntry.entry returns rows (smoke)") {
    assert(SparkEntry.entry(spark).count() == 10)
  }

  test("batch of 20 queries returns 10 ranked rows per query") {
    val out = Bm25SqlPath
      .topK(spark, Corpus.docs(spark, sf0001), QuerySet.queries, 10)
    val perQ = out.groupBy("query_id").count().collect()
    assert(perQ.length == 20)
    assert(perQ.forall(_.getLong(1) == 10))
  }
}
