package graft.tools
import org.apache.spark.sql.SparkSession
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .appName("qprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (256*1024).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val idx = graft.build.Indexes.ensureBuilt(s, sfDir)
    def timed(tag: String)(b: => Long): Unit = {
      val t0 = System.nanoTime(); val n = b
      System.err.println(f"[qprobe] $tag rows=$n ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    timed("wand_flagship_1")(graft.query.IndexSearcher.topK(s, idx, graft.query.QuerySet.queries.take(1), 10).count())
    timed("wand_flagship_2")(graft.query.IndexSearcher.topK(s, idx, graft.query.QuerySet.queries.take(1), 10).count())
    timed("wand_batch")(graft.query.IndexSearcher.topK(s, idx, graft.query.QuerySet.queries, 10).count())
    timed("wand_split1")(graft.query.IndexSearcher.topK(s, idx, graft.query.QuerySet.queries.take(1), 10, splitsPerCluster = 1).count())
    val df = graft.query.IndexSearcher.topK(s, idx, graft.query.QuerySet.queries.take(1), 10)
    System.err.println(df.queryExecution.executedPlan.toString.take(3000))
    s.stop()
  }
}
