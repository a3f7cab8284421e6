package graft.tools
import org.apache.spark.sql.SparkSession
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]").appName("np")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false")
      .config("spark.sql.files.maxPartitionBytes",(256*1024).toString).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Corpus.docs(s, "/root/testdata/sf0.1")
    Seq(1,2).foreach { i =>
      val t0=System.nanoTime()
      val n = graft.ops.Dedup.ngramJaccardNearDups(docs, 0.5).count()
      System.err.println(f"[np] run$i rows=$n ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    s.stop()
  }
}
