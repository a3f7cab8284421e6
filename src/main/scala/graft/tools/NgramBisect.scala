package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** r7 scratch probe: bisect q_dedup_ngram's candidate-join stage to
  * find where its ~0.6 s wall goes. Measurement only.
  */
object NgramBisect {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (256 * 1024).toString)
      .config("spark.local.dir", graft.Bench.localDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Corpus.docs(spark, "/root/testdata/sf0.1")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val t = 0.5
    val sh = graft.ops.Dedup.shinglesCached(docs)
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("shingle"))
    val prefix = sh.join(dfreq, "shingle")
      .withColumn("r", row_number().over(byRarity))
      .withColumn("sz", count(lit(1)).over(byRarity.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("r") <= col("sz") - ceil(lit(t) * col("sz")) + 1)
      .select(col("doc_id"), col("shingle"), col("r"), col("sz"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"prefix rows = ${prefix.count()}")
    def timed(tag: String)(body: => Long): Unit = {
      // warm once, then min of 2
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$tag%-28s min=${ts.map(_._1).drop(1).min}%6.3f rows=${ts.head._2}")
    }
    val joined = prefix.as("a").join(prefix.as("b"),
      col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
    timed("join-noconds")(joined.count())
    val withConds = prefix.as("a").join(prefix.as("b"),
      col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id") &&
        least(col("a.sz"), col("b.sz")) >=
          lit(t) * greatest(col("a.sz"), col("b.sz")) &&
        (least(col("a.sz") - col("a.r"), col("b.sz") - col("b.r")) + 1) >=
          lit(t) / (1 + t) * (col("a.sz") + col("b.sz")))
    timed("join-conds")(withConds.count())
    val agged = withConds
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.r").as("ra"), col("a.sz").as("sza"),
        col("b.r").as("rb"), col("b.sz").as("szb"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("op"),
        max(col("ra")).as("ram"), max(col("rb")).as("rbm"),
        first(col("sza")).as("sza"), first(col("szb")).as("szb"))
    timed("join+agg")(agged.count())
    val cands = agged
      .withColumn("ub", col("op") +
        least(col("sza") - col("ram"), col("szb") - col("rbm")))
      .filter(round(col("ub").cast("double") /
        (col("sza") + col("szb") - col("ub")), 4) >= t)
      .select("doc_a", "doc_b")
    timed("cands")(cands.count())
    timed("full")(graft.ops.Dedup.ngramJaccardNearDups(docs, t).count())
    spark.stop()
  }
}
