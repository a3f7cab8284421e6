package graft.tools
import org.apache.spark.sql.SparkSession
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .appName("dprobe").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (256*1024).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def timed(tag: String)(b: => Long): Unit = {
      val t0 = System.nanoTime(); val n = b
      System.err.println(f"[dprobe] $tag rows=$n ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    val docs = graft.sources.Corpus.docs(s, sfDir)
    timed("simhash_fp")(graft.ops.Dedup.simhash(s, docs).count())
    timed("simhash_full")(graft.ops.Dedup.simhashNearDups(s, docs, 3).count())
    timed("simhash_full2")(graft.ops.Dedup.simhashNearDups(s, docs, 3).count())
    timed("embed")(graft.ops.Dedup.embeddingNearDups(s.read.parquet(s"$sfDir/embeddings.parquet"), 0.45).count())
    timed("minhash")(graft.ops.Dedup.minhashNearDups(s, docs, 0.6).count())
    s.stop()
  }
}
