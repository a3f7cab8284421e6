package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tokenize.Tokenizer

/** Diagnostic main: isolates the scaling behavior of the tokenize+agg
  * stage (the dictionary step's core) at several thread counts.
  * Not part of the engine; used to calibrate bench parallelism levels.
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val amplify = sys.env.getOrElse("SPARK_GRAFT_AMPLIFY", "256").toInt
    val levels = sys.env.getOrElse("SPARK_GRAFT_LEVELS", "8,32")
      .split(",").map(_.trim.toInt)

    // stage input once
    val prep = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    prep.sparkContext.setLogLevel("WARN")
    val tmp = "/tmp/graft-probe-docs"
    graft.sources.Corpus.docs(prep, sfDir, amplify)
      .select("doc_id", "content")
      .write.mode("overwrite").parquet(tmp)
    prep.stop()

    val mode0 = sys.env.getOrElse("SPARK_GRAFT_PROBE", "dict")
    levels.foreach { n =>
      // "build" mirrors graft.Bench's scaling session EXACTLY (same
      // shuffle partitioning at every level = plan-identical jobs, zstd
      // shuffle blocks, tmpfs local dir, v2 committer) — stage metrics
      // from any other config answer a different question (the r6 probe
      // with partitions=n showed a 5.4x keys-pass "inflation" that was
      // purely the partitioning difference, not the bench's behavior)
      val sp =
        if (mode0 == "build")
          sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTS", "16").toInt
        else n
      val b = SparkSession.builder().master(s"local[$n]")
        .appName(s"probe-$n")
        .config("spark.sql.shuffle.partitions", sp.toString)
        .config("spark.sql.files.maxPartitionBytes", (256 * 1024).toString)
        .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
        .config("spark.ui.enabled", "false")
      val s = (if (mode0 == "build")
        b.config("spark.io.compression.codec", "zstd")
          .config("spark.io.compression.zstd.level",
            sys.env.getOrElse("SPARK_GRAFT_ZSTD_LEVEL", "1"))
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.local.dir", "/dev/shm/graft-probe-local")
          .config("spark.hadoop.mapreduce.fileoutputcommitter" +
            ".algorithm.version", "2")
      else b).getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val m = si.taskMetrics
            stages.add(
              f"stage ${si.stageId}%3d tasks=${si.numTasks}%4d " +
                f"wall=${(si.completionTime.get - si.submissionTime.get) / 1e3}%6.2fs " +
                f"cpuSum=${m.executorCpuTime / 1e9}%7.2fs " +
                f"runSum=${m.executorRunTime / 1e3}%7.2fs " +
                f"gc=${m.jvmGCTime / 1e3}%5.1fs " +
                f"shufW=${m.shuffleWriteMetrics.writeTime / 1e9}%5.1fs " +
                f"fetchW=${m.shuffleReadMetrics.fetchWaitTime / 1e3}%5.1fs " +
                f"spill=${(m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6}%6.0fMB " +
                f"out=${m.outputMetrics.bytesWritten / 1e6}%6.0fMB " +
                si.name.takeWhile(_ != '\n').take(40))
          }
        })
      val mode = mode0
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val cnt = mode match {
          case "sha" =>
            // pure CPU per row, no explode/agg: does the stage scale?
            s.read.parquet(tmp)
              .select(sha2(col("content"), 256).as("h"))
              .filter(col("h") > "f")
              .count()
          case "shaheavy" =>
            s.read.parquet(tmp)
              .select(sha2(concat_ws("", Seq.fill(8)(col("content")): _*), 256).as("h"))
              .filter(col("h") > "f")
              .count()
          case "tok" =>
            // char-scan token count, minimal allocation
            import s.implicits._
            s.read.parquet(tmp).select("content").as[String]
              .mapPartitions { it =>
                var tokens = 0L
                it.foreach { c =>
                  var i = 0
                  val len = c.length
                  var inTok = false
                  while (i < len) {
                    val ch = c.charAt(i)
                    val isT = (ch >= 'a' && ch <= 'z') ||
                      (ch >= 'A' && ch <= 'Z') ||
                      (ch >= '0' && ch <= '9') || ch == '_'
                    if (isT && !inTok) { tokens += 1; inTok = true }
                    else if (!isT) inTok = false
                    i += 1
                  }
                }
                Iterator.single(tokens)
              }.reduce(_ + _)
          case "dict2" =>
            // typed per-partition tf maps, tiny shuffle
            import s.implicits._
            s.read.parquet(tmp).select("content").as[String]
              .mapPartitions { it =>
                val m = new java.util.HashMap[String, Long]()
                it.foreach { c =>
                  graft.tokenize.Tokenizer.tokenize(c).foreach { t =>
                    m.merge(t, 1L, (a, b) => a + b)
                  }
                }
                import scala.jdk.CollectionConverters._
                m.asScala.iterator.map { case (t, n) => (t, n) }
              }
              .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
              .count()
          case "build" =>
            // tmpfs output like the bench's scaling section
            val dir = java.nio.file.Files.createTempDirectory(
              java.nio.file.Paths.get("/dev/shm"), s"graft-probe-build-$n")
              .toString
            try {
              val res = graft.build.IndexBuilder.build(s, sfDir, dir,
                graft.build.IndexBuilder.BuildConfig(
                  resume = false, amplify = amplify))
              res.manifest.num_docs
            } finally org.apache.commons.io.FileUtils.deleteQuietly(
              new java.io.File(dir)): Unit
          case _ =>
            s.read.parquet(tmp)
              .select(col("doc_id"),
                explode(Tokenizer.tokensCol(col("content"))).as("term"))
              .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
              .groupBy("term").agg(count(lit(1)).as("df"))
              .count()
        }
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[probe] local[$n%2d] rep$rep $mode $secs%6.2fs (rows=$cnt)")
        if (rep == 2) {
          stages.forEach(l => println(s"[probe]   $l"))
        }
        stages.clear()
      }
      s.stop()
    }
  }
}
