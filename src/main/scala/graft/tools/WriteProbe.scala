package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: interleaved A/B of docstore parquet-writer options
  * at the bench's two parallelism levels. The docstore write map stage
  * is the build's one CPU-inflating stage at 4 threads (cpu_inflation
  * ~1.46 with gc ≈ 0, BASELINE.md); these are encode-path levers that
  * might shrink the stage or its inflation:
  *
  *   - `dictoff`: parquet.enable.dictionary#content=false — content is
  *     high-cardinality in real corpora, so the dictionary hash-table
  *     build is wasted CPU + allocation (the amplified bench corpus
  *     repeats content ×factor, which is the dictionary's BEST case —
  *     if dictoff wins even here, it wins everywhere);
  *   - `rg32`: parquet.block.size=32 MiB — smaller row-group buffers
  *     per write task (4 tasks × 128 MiB default is real allocator
  *     pressure on a shared heap).
  *
  * Configs alternate WITHIN one run (ambient co-tenancy makes cross-run
  * comparisons meaningless on this host). Per-config per-level: wall +
  * docstore step wall from BuildResult.stepWindows. Not part of the
  * engine.
  */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("GRAFT_PROBE_SF", "/root/testdata/sf0.1")
    val amplify = sys.env.getOrElse("GRAFT_PROBE_AMPLIFY", "209").toInt
    val parts = sys.env.getOrElse("GRAFT_PROBE_PARTS", "16").toInt
    val reps = sys.env.getOrElse("GRAFT_PROBE_REPS", "3").toInt

    val configs: Seq[(String, Map[String, String])] = Seq(
      "default" -> Map.empty[String, String],
      "dictoff" -> Map("parquet.enable.dictionary#content" -> "false"),
      "rg32" -> Map("parquet.block.size" -> (32 * 1024 * 1024).toString),
      "dictoff+rg32" -> Map(
        "parquet.enable.dictionary#content" -> "false",
        "parquet.block.size" -> (32 * 1024 * 1024).toString)
    ).filter { case (n, _) =>
      sys.env.get("GRAFT_PROBE_CONFIGS").forall(_.split(",").contains(n))
    }

    def session(n: Int): SparkSession = {
      val s = SparkSession.builder().master(s"local[$n]")
        .appName(s"writeprobe-$n")
        .config("spark.io.compression.codec", "zstd")
        .config("spark.io.compression.zstd.level", "1")
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
      val s = session(4)
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "writeprobe-warm").toString
      graft.build.IndexBuilder.build(s, sfDir, dir,
        graft.build.IndexBuilder.BuildConfig(resume = false,
          amplify = math.max(1, amplify / 16)))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      s.stop()
    }

    // (config, level) -> (wall, docstoreWall, docstoreBytes) per rep
    val results = scala.collection.mutable.Map[(String, Int),
      Vector[(Double, Double, Long)]]().withDefaultValue(Vector.empty)
    (1 to reps).foreach { rep =>
      for {
        (cname, copts) <- configs
        n <- Seq(1, 4)
      } {
        val s = session(n)
        val dir = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("/dev/shm"), s"writeprobe-$n").toString
        val t0 = System.nanoTime()
        val res = graft.build.IndexBuilder.build(s, sfDir, dir,
          graft.build.IndexBuilder.BuildConfig(resume = false,
            amplify = amplify, docstoreWriteOptions = copts))
        val wall = (System.nanoTime() - t0) / 1e9
        val dsWall = res.stepWindows.collectFirst {
          case ("docstore", lo, hi) => (hi - lo) / 1000.0
        }.getOrElse(Double.NaN)
        val dsBytes = org.apache.commons.io.FileUtils
          .sizeOfDirectory(new java.io.File(s"$dir/docstore"))
        results((cname, n)) = results((cname, n)) :+ ((wall, dsWall, dsBytes))
        System.err.println(
          f"[writeprobe] rep$rep $cname%-13s local[$n] wall=$wall%.2fs " +
            f"docstore=$dsWall%.2fs bytes=${dsBytes / 1e6}%.1fMB")
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
        s.stop()
      }
    }
    configs.foreach { case (cname, _) =>
      Seq(1, 4).foreach { n =>
        val rs = results((cname, n))
        if (rs.nonEmpty) {
          val eff4 =
            if (n == 4 && results((cname, 1)).nonEmpty)
              f" eff=${results((cname, 1)).map(_._1).min /
                (4 * rs.map(_._1).min)}%.3f"
            else ""
          System.err.println(
            f"[writeprobe] $cname%-13s local[$n] " +
              f"minWall=${rs.map(_._1).min}%.2fs " +
              f"minDs=${rs.map(_._2).min}%.2fs " +
              f"walls=${rs.map(r => f"${r._1}%.1f").mkString(",")}" + eff4)
        }
      }
    }
  }
}
