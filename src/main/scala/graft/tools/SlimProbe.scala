package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: interleaved A/B of the slimmed docstore slot
  * exchange (Corpus.SourceRederive) at the bench's two parallelism
  * levels. Configs alternate WITHIN one run because ambient co-tenancy
  * makes cross-run comparisons meaningless on this host (BASELINE.md).
  * Not part of the engine.
  */
object SlimProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("GRAFT_PROBE_SF", "/root/testdata/sf0.1")
    val amplify = sys.env.getOrElse("GRAFT_PROBE_AMPLIFY", "209").toInt
    val parts = sys.env.getOrElse("GRAFT_PROBE_PARTS", "16").toInt
    val reps = sys.env.getOrElse("GRAFT_PROBE_REPS", "3").toInt
    val zstdLevels = sys.env.getOrElse("GRAFT_PROBE_ZSTD", "1")
      .split(",").map(_.trim.toInt)
    val slims = sys.env.getOrElse("GRAFT_PROBE_SLIMS", "false,true")
      .split(",").map(_.trim.toBoolean)

    def session(n: Int, zstd: Int): SparkSession = {
      val s = SparkSession.builder().master(s"local[$n]")
        .appName(s"slimprobe-$n")
        .config("spark.io.compression.codec", "zstd")
        .config("spark.io.compression.zstd.level", zstd.toString)
        .config("spark.sql.shuffle.partitions", parts.toString)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", (256 * 1024).toString)
        .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
        .config("spark.local.dir", "/dev/shm/graft-spark-local")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    // warmup build (JIT + page cache)
    locally {
      val s = session(4, zstdLevels.head)
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "slimprobe-warm").toString
      graft.build.IndexBuilder.build(s, sfDir, dir,
        graft.build.IndexBuilder.BuildConfig(resume = false,
          amplify = math.max(1, amplify / 16)))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      s.stop()
    }

    val results = scala.collection.mutable.Map[(Boolean, Int, Int),
      Vector[Double]]().withDefaultValue(Vector.empty)
    (1 to reps).foreach { rep =>
      for {
        slim <- slims.toSeq
        zstd <- zstdLevels
        n <- Seq(1, 4)
      } {
        val s = session(n, zstd)
        val dir = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("/dev/shm"), s"slimprobe-$n").toString
        val t0 = System.nanoTime()
        graft.build.IndexBuilder.build(s, sfDir, dir,
          graft.build.IndexBuilder.BuildConfig(resume = false,
            amplify = amplify, slimExchange = slim))
        val wall = (System.nanoTime() - t0) / 1e9
        results((slim, zstd, n)) = results((slim, zstd, n)) :+ wall
        System.err.println(
          f"[slimprobe] rep$rep slim=$slim zstd=$zstd local[$n] $wall%.2fs")
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
        s.stop()
      }
    }
    results.toSeq.sortBy(_._1.toString).foreach { case ((slim, z, n), ts) =>
      val eff4 = results.get((slim, z, 1)).flatMap(t1s =>
        if (n == 4 && t1s.nonEmpty && ts.nonEmpty)
          Some(t1s.min / (4 * ts.min)) else None)
      System.err.println(
        f"[slimprobe] slim=$slim zstd=$z local[$n] min=${ts.min}%.2fs " +
          f"all=${ts.map(t => f"$t%.1f").mkString(",")}" +
          eff4.map(e => f" eff=$e%.3f").getOrElse(""))
    }
  }
}
