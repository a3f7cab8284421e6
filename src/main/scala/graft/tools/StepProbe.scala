package graft.tools
import org.apache.spark.sql.SparkSession
/** Diagnostic main: full-build wall time at configurable thread levels
  * (GRAFT_PROBE_LEVELS, default "4,1,4"), the tool used to calibrate the
  * bench's N -> 4N pair and partitioning. Not part of the engine.
  */
object StepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("GRAFT_PROBE_SF", "/root/testdata/sf0.1")
    val levels = sys.env.getOrElse("GRAFT_PROBE_LEVELS", "4,1,4")
      .split(",").map(_.trim.toInt)
    val amplify = sys.env.getOrElse("GRAFT_PROBE_AMPLIFY", "52").toInt
    val parts = sys.env.getOrElse("GRAFT_PROBE_PARTS", "16").toInt
    levels.foreach { n =>
      val s = SparkSession.builder().master(s"local[$n]")
        .appName(s"probe-$n")
        .config("spark.io.compression.codec",
          sys.env.getOrElse("GRAFT_PROBE_CODEC", "zstd"))
        .config("spark.sql.parquet.compression.codec",
          sys.env.getOrElse("GRAFT_PROBE_PARQUET", "snappy"))
        .config("spark.sql.shuffle.partitions", parts.toString)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", (256 * 1024).toString)
        .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
        .config("spark.local.dir", "/dev/shm/graft-spark-local")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), s"probe-$n").toString
      val t0 = System.nanoTime()
      val r = graft.build.IndexBuilder.build(s, sfDir, dir,
        graft.build.IndexBuilder.BuildConfig(resume = false, amplify = amplify))
      val wall = (System.nanoTime() - t0) / 1e9
      System.err.println(
        f"[probe] local[$n] total=$wall%.2fs fps=${r.filesPerSec}%.0f")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      s.stop()
    }
  }
}
