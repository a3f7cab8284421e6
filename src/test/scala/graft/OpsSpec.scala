package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextStats}
import graft.sources.Corpus

class OpsSpec extends SparkSpec {

  lazy val docs = Corpus.docs(spark, sf0001).cache()

  test("minhash-LSH finds the planted near-dup pairs; jaccard bounds hold") {
    val pairs = Dedup.minhashNearDups(spark, docs, 0.5).collect()
    assert(pairs.nonEmpty, "expected near-dup pairs in the corpus")
    pairs.foreach { r =>
      val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(a < b)
      assert(j >= 0.5 && j <= 1.0)
    }
  }

  test("LSH candidates superset check: every verified pair is a candidate") {
    val sh = Dedup.shingles(docs).cache()
    val cands = Dedup.lshCandidates(Dedup.minhash(spark, sh))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = Dedup.verifyJaccard(
      Dedup.lshCandidates(Dedup.minhash(spark, sh)), sh, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.subsetOf(cands))
  }

  test("exact dedup: self-union produces one group per distinct content") {
    val d = docs.select("doc_id", "content_sha")
    val doubled = d.unionAll(d.withColumn("doc_id", col("doc_id") + 500000L))
    val groups = Dedup.exactGroups(doubled).collect()
    val distinctShas = d.select("content_sha").distinct().count()
    assert(groups.length == distinctShas)
    assert(groups.forall(_.getLong(1) >= 2))
  }

  test("simhash: identical docs have identical fingerprints") {
    import spark.implicits._
    val two = Seq((0L, "alpha beta gamma alpha"), (1L, "alpha beta gamma alpha"),
      (2L, "totally different words here"))
      .toDF("doc_id", "content")
    val fp = Dedup.simhash(spark, two).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(1L))
    assert(fp(0L) != fp(2L))
  }

  test("langid predicts a language with ratios in [0,1]") {
    val out = TextStats.langId(docs).collect()
    assert(out.length == docs.count())
    out.foreach { r =>
      (1 to 4).foreach { i =>
        val v = r.getDouble(i)
        assert(v >= 0.0 && v <= 1.0)
      }
      assert(Set("en", "de", "fr", "es", "und").contains(r.getString(5)))
    }
  }

  test("quality score bounded and monotone-ish in length cap") {
    val out = TextStats.quality(docs).collect()
    out.foreach { r =>
      val s = r.getDouble(5)
      assert(s >= 0.0 && s <= 1.0, s"score $s out of range")
    }
  }
}
