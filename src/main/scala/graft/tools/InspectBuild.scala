package graft.tools
import org.apache.spark.sql.SparkSession

/** Diagnostic main: builds at GRAFT_INSPECT_AMPLIFY and dumps the
  * docstore file-size layout — the input the postings step's
  * maxPartitionBytes sizing packs into read tasks. Not part of the
  * engine.
  */
object InspectBuild {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]").appName("inspect")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (256 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val amplify = sys.env.getOrElse("GRAFT_INSPECT_AMPLIFY", "104").toInt
    val dir = "/dev/shm/graft-inspect-idx"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    graft.build.IndexBuilder.build(s, "/root/testdata/sf0.1", dir,
      graft.build.IndexBuilder.BuildConfig(resume = false,
        amplify = amplify, postingsBatches = 1))
    val files = org.apache.commons.io.FileUtils.listFiles(
      new java.io.File(s"$dir/docstore"), Array("parquet"), true)
    import scala.jdk.CollectionConverters._
    val sizes = files.asScala.toSeq.map(f =>
      (f.getParentFile.getName, f.length)).sortBy(-_._2)
    System.err.println(f"[inspect] docstore files=${sizes.size} " +
      f"total=${sizes.map(_._2).sum / 1e6}%.2f MB")
    sizes.take(40).foreach { case (p, b) =>
      System.err.println(f"[inspect]   $p%-16s ${b / 1e6}%8.2f MB") }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    s.stop()
  }
}
