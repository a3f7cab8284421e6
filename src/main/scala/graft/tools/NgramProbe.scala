package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-level timings for the exact n-gram Jaccard pipeline (the r3
  * PPJoin prefix-filter form) — diagnostic only.
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]").appName("np")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false")
      .config("spark.sql.files.maxPartitionBytes",(256*1024).toString).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Corpus.docs(s, "/root/testdata/sf0.1")
    def timed(tag: String)(b: => Long): Unit = {
      val t0 = System.nanoTime(); val n = b
      System.err.println(f"[np] $tag%-16s rows=$n%9d ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    val t = 0.5
    val sh = graft.ops.Dedup.shingles(docs).cache()
    timed("sh")(sh.count())
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    timed("dfreq")(dfreq.count())
    val byRarity = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
    val byDoc = Window.partitionBy(col("doc_id"))
    val prefix = sh.join(dfreq, "shingle")
      .withColumn("r", row_number().over(byRarity))
      .withColumn("sz", count(lit(1)).over(byDoc))
      .filter(col("r") <= col("sz") - ceil(lit(t) * col("sz")) + 1)
      .select(col("doc_id"), col("shingle")).cache()
    timed("prefix")(prefix.count())
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct().cache()
    timed("cands")(cands.count())
    timed("verify")(graft.ops.Dedup.verifyJaccard(cands, sh, t).count())
    // old-style full candidates for comparison
    val candsOld = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct().cache()
    timed("cands_old")(candsOld.count())
    timed("verify_old")(graft.ops.Dedup.verifyJaccard(candsOld, sh, t).count())
    timed("full_r3")(graft.ops.Dedup.ngramJaccardNearDups(docs, t).count())
    timed("full_r3_again")(graft.ops.Dedup.ngramJaccardNearDups(docs, t).count())
    s.stop()
  }
}
