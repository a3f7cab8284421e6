package graft

import org.apache.spark.sql.functions._

import graft.parity.{IvfAdc, Pq}

/** F4 — IVFADC rank-identity parity (FIXTURES.md): the Spark
  * cluster-partitioned ADC scorer must be rank-identical to an
  * independent single-threaded implementation of the reference's scoring
  * formula (/root/reference/src/index.jl:240-246: d seeded with the
  * coarse distance, plus per-sub-quantizer LUT sums; 0-based dense ids
  * per :189) for k ∈ {1,5}, w ∈ {1,2}.
  */
class IvfAdcParitySpec extends SparkSpec {

  lazy val embeddings = spark.read.parquet(s"$sf0001/embeddings.parquet")

  lazy val (model, encoded) = {
    val (m, e) = IvfAdc.build(spark, embeddings, kc = 8, m = 4, k = 16)
    (m, e.cache())
  }

  /** Sequential reference-semantics scorer (no Spark). */
  def referenceTopK(
      all: Array[(Long, Array[Float])],
      q: Array[Float],
      k: Int,
      w: Int): Seq[(Long, Double)] = {
    val byCell = all.map { case (id, v) =>
      (IvfAdc.coarseAssign(v, model.centroids), id, v)
    }.groupBy(_._1)
    val coarse = model.centroids.zipWithIndex
      .map { case (c, i) => (Pq.sqDistFull(q, c), i) }
      .sortBy { case (d, i) => (d, i) }
      .take(w)
    val hits = coarse.flatMap { case (dc, cell) =>
      val qr = Array.tabulate(q.length)(i =>
        (q(i) - model.centroids(cell)(i)).toFloat)
      val luts = model.codebooks.luts(qr)
      byCell.getOrElse(cell, Array.empty).map { case (_, id, v) =>
        val rv = Array.tabulate(v.length)(i =>
          (v(i) - model.centroids(cell)(i)).toFloat)
        val codes = model.codebooks.encode(rv)
        var d = dc
        var s = 0
        while (s < luts.length) { d += luts(s)(codes(s) & 0xff); s += 1 }
        (id, d)
      }
    }
    hits.sortBy { case (id, d) => (d, id) }.take(k).toSeq
  }

  test("Spark ADC search rank-identical to reference formula, k x w grid") {
    import spark.implicits._
    val all = embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val queryIds = (0 until 10).map(_ * 7L)
    val queries = queryIds.zipWithIndex.map { case (vid, qi) =>
      (qi, all(vid.toInt)._2)
    }
    for (k <- Seq(1, 5); w <- Seq(1, 2)) {
      val got = IvfAdc.search(spark, model, encoded, queries, k, w)
        .collect()
        .map(r => (r.getInt(0), r.getLong(2), r.getDouble(3)))
      val exp = queries.flatMap { case (qi, qv) =>
        referenceTopK(all, qv, k, w).map { case (id, d) => (qi, id, d) }
      }
      assert(got.toSeq == exp.toSeq, s"mismatch at k=$k w=$w")
    }
  }

  test("encode/decode determinism: same codes on recomputation") {
    val c1 = encoded.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toList))
    val (_, enc2) = IvfAdc.build(spark, embeddings, kc = 8, m = 4, k = 16)
    val c2 = enc2.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toList))
    assert(c1.toSeq == c2.toSeq)
  }

  test("ADC at w=kc recalls the true nearest neighbor reasonably (sanity)") {
    import spark.implicits._
    val all = embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val queries = (0 until 20).map(i => (i, all(i * 11)._2))
    val adc = IvfAdc.search(spark, model, encoded, queries, 10, model.kc)
      .collect().groupBy(_.getInt(0))
    var recalled = 0
    queries.foreach { case (qi, qv) =>
      val trueNn = all
        .map { case (id, v) => (Pq.sqDistFull(qv, v.map(_.toDouble)), id) }
        .minBy { case (d, id) => (d, id) }._2
      if (adc(qi).map(_.getLong(2)).contains(trueNn)) recalled += 1
    }
    // lossy quantization: expect the true NN inside ADC top-10 most of
    // the time (the query vector itself is in the indexed set)
    assert(recalled >= 15, s"recall@10 too low: $recalled/20")
  }
}
