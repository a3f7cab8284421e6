package graft

import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {

  test("assets: 2 per doc, binary payload 128 bytes, metadata typed") {
    val a = Multimodal.assets(spark, sf0001).cache()
    assert(a.count() == 1000) // 500 docs x 2 kinds
    val row = a.filter(org.apache.spark.sql.functions.col("asset_id") === 0)
      .collect().head
    assert(row.getAs[String]("kind") == "image")
    assert(row.getAs[Array[Byte]]("payload").length == 256) // 64-hex sha x 4
  }

  test("stub decode is deterministic; frame sampling shape") {
    val payload = Array.tabulate[Byte](256)(i => (i % 251).toByte)
    val (h1, c1) = Multimodal.stubDecode(payload)
    val (h2, c2) = Multimodal.stubDecode(payload)
    assert(h1.toSeq == h2.toSeq && c1 == c2)
    assert(h1.sum == payload.length)
    val frames = Multimodal.frameSample(payload, 32, 16)
    assert(frames.size == 16)
    assert(frames.forall(f => f.length <= 32 && f.nonEmpty))
  }

  test("extractFeatures: one feature row per asset, recomputation-stable") {
    val a = Multimodal.assets(spark, sf0001)
    val f1 = Multimodal.extractFeatures(spark, a)
      .orderBy("asset_id").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getLong(5)))
    assert(f1.length == 1000)
    val f2 = Multimodal.extractFeatures(spark, a)
      .orderBy("asset_id").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getLong(5)))
    assert(f1.toSeq == f2.toSeq)
  }
}
