package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage timings for the CURRENT ngram pipeline (r4 form), run twice
  * to separate cache effects — diagnostic only.
  */
object NgramStage {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]").appName("ns")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (256 * 1024).toString)
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Corpus.docs(s, "/root/testdata/sf0.1")
    def timed(tag: String)(b: => Long): Unit = {
      val t0 = System.nanoTime(); val n = b
      System.err.println(
        f"[ns] $tag%-14s rows=$n%9d ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val t = 0.5
    (1 to 2).foreach { rep =>
      System.err.println(s"[ns] === rep $rep ===")
      val sh = graft.ops.Dedup.shinglesCached(docs)
      timed("shingles")(sh.count())
      val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      timed("dfreq")(dfreq.count())
      val byRarity = Window.partitionBy(col("doc_id"))
        .orderBy(col("df"), col("shingle"))
      val prefix = sh.join(dfreq, "shingle")
        .withColumn("r", row_number().over(byRarity))
        .withColumn("sz", count(lit(1)).over(byRarity.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
        .filter(col("r") <= col("sz") - ceil(lit(t) * col("sz")) + 1)
        .select(col("doc_id"), col("shingle"), col("r"), col("sz"))
      timed("prefix")(prefix.count())
      val joined = prefix.as("a").join(prefix.as("b"),
          col("a.shingle") === col("b.shingle") &&
            col("a.doc_id") < col("b.doc_id") &&
            least(col("a.sz"), col("b.sz")) >=
              lit(t) * greatest(col("a.sz"), col("b.sz")) &&
            (least(col("a.sz") - col("a.r"), col("b.sz") - col("b.r")) + 1) >=
              lit(t) / (1 + t) * (col("a.sz") + col("b.sz")))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.r").as("ra"), col("a.sz").as("sza"),
          col("b.r").as("rb"), col("b.sz").as("szb"))
      timed("join-rows")(joined.count())
      val cands = joined
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("op"),
          max(col("ra")).as("ram"), max(col("rb")).as("rbm"),
          first(col("sza")).as("sza"), first(col("szb")).as("szb"))
        .withColumn("ub", col("op") +
          least(col("sza") - col("ram"), col("szb") - col("rbm")))
        .filter(round(col("ub").cast("double") /
          (col("sza") + col("szb") - col("ub")), 4) >= t)
        .select("doc_a", "doc_b")
      timed("cands")(cands.count())
      timed("verify")(
        graft.ops.Dedup.verifyJaccardFused(cands, sh, t).count())
      timed("full-query")(
        graft.ops.Dedup.ngramJaccardNearDups(docs, t).count())
    }
    s.stop()
  }
}
