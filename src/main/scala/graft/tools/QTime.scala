package graft.tools
import org.apache.spark.sql.SparkSession

/** Times named SparkEntry queries at local[32] (GRAFT_QT_QUERIES,
  * GRAFT_QT_SF, GRAFT_QT_REPS) — diagnostic only.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]").appName("qt")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (256 * 1024).toString)
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("GRAFT_QT_SF", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("GRAFT_QT_REPS", "3").toInt
    val names = sys.env.getOrElse("GRAFT_QT_QUERIES", "q_dedup_ngram")
      .split(",").toSeq
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val rows = fn(s, sf).count()
        System.err.println(
          f"[qt] $n%-18s rep$i rows=$rows ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    s.stop()
  }
}
