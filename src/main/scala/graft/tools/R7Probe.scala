package graft.tools

import org.apache.spark.sql.SparkSession

/** r7 optimization probe — measurement only, never on the bench path.
  *
  * Times every declared query with the bench's own action (count) and,
  * optionally, the noop sink (guide §1.4: computes every column, no
  * optimizer pruning of the action), and dumps `.explain("formatted")`
  * per query for the plans/r07 before/after evidence.
  *
  * Usage: runMain graft.tools.R7Probe [reps] [planDir|-] [mode]
  *   reps    timing reps per query (default 3; 0 = plans only)
  *   planDir where to write <query>_<suffix>.txt plans ("-" = skip)
  *   mode    count | noop (action used for timing; default count)
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (bench contract),
  *      GRAFT_R7_SUFFIX (plan file suffix, default "before"),
  *      GRAFT_R7_ONLY (comma-separated query subset).
  */
object R7Probe {

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val planDir = args.lift(1).getOrElse("-")
    val mode = args.lift(2).getOrElse("count")
    val suffix = sys.env.getOrElse("GRAFT_R7_SUFFIX", "before")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val only = sys.env.get("GRAFT_R7_ONLY").map(_.split(",").toSet)

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-r7probe")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (256 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
      .config("spark.local.dir", graft.Bench.localDir)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // GRAFT_R7_JOBLOG=1: per-job walls + executor run time, labeled by
    // the probe's job description — attributes a query's wall to its
    // driver-visible jobs (broadcast builds, collects, main stages)
    if (sys.env.getOrElse("GRAFT_R7_JOBLOG", "0") == "1") {
      val t0 = System.nanoTime()
      val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Double, String)]()
      val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
      val jobRun = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
      val jobTasks = new java.util.concurrent.ConcurrentHashMap[Int, Integer]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val desc = Option(js.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse("")
            jobStart.put(js.jobId, ((System.nanoTime() - t0) / 1e9, desc))
            js.stageIds.foreach(st => stageToJob.put(st, js.jobId))
          }
          override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val j = stageToJob.getOrDefault(te.stageId, -1)
            if (te.taskMetrics != null) {
              jobRun.merge(j, te.taskMetrics.executorRunTime, (a, b) => a + b)
              jobTasks.merge(j, 1, (a, b) => a + b): Unit
            }
          }
          override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val (st, desc) = jobStart.getOrDefault(je.jobId, (0.0, "?"))
            val now = (System.nanoTime() - t0) / 1e9
            System.err.println(f"[r7job] ${desc}%-28s job ${je.jobId}%3d " +
              f"wall=${now - st}%5.2f run=${jobRun.getOrDefault(je.jobId, 0L) / 1000.0}%6.2f " +
              f"tasks=${jobTasks.getOrDefault(je.jobId, 0)}")
          }
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val wall = (for {a <- si.completionTime; b <- si.submissionTime}
              yield (a - b) / 1000.0).getOrElse(-1.0)
            val nm = si.name.take(60).replaceAll("\\s+", " ")
            System.err.println(f"[r7stage] job ${stageToJob.getOrDefault(si.stageId, -1)}%3d " +
              f"stage ${si.stageId}%3d wall=$wall%5.2f tasks=${si.numTasks} $nm")
          }
        })
    }

    // bench parity: fresh index per timed pass; warmup pass on sf0.001
    val idxDir = graft.build.Indexes.indexDirFor(sfDir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxDir))
    val warmSf = "/root/testdata/sf0.001"
    if (new java.io.File(warmSf).isDirectory) {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(graft.build.Indexes.indexDirFor(warmSf)))
      graft.SparkEntry.queries.foreach { case (n, fn) =>
        try { fn(spark, warmSf).count(): Unit }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[r7probe] warmup $n failed: ${e.getMessage}") }
      }
    }
    Seq("q_dedup_ngram", "q_dedup_minhash", "q_dedup_embed",
        "q_dedup_simhash", "q_bm25_batch").foreach { n =>
      graft.SparkEntry.queries.get(n).foreach { fn =>
        try { fn(spark, sfDir).count(): Unit }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[r7probe] sf-warm $n failed: ${e.getMessage}") }
      }
    }

    val ordered = graft.SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .sortBy { case (n, _) =>
        (if (n == "q_index_build") "0" else "1") + n
      }

    // plans
    if (planDir != "-") {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(planDir))
      ordered.foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(planDir, s"${name}_$suffix.txt"),
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[r7probe] plan $name failed: ${e.getMessage}")
        }
      }
    }

    if (reps > 0) {
      val times = scala.collection.mutable.LinkedHashMap[
        String, Vector[Double]]()
      (1 to reps).foreach { pass =>
        // every pass (incl. 1 — the plan-dump phase may have built):
        // q_index_build must measure a full build, not a resume
        locally {
          graft.build.Indexes.invalidate(sfDir)
          org.apache.commons.io.FileUtils.deleteQuietly(
            new java.io.File(idxDir))
        }
        ordered.foreach { case (name, fn) =>
          spark.sparkContext.setJobDescription(s"r7probe:$name")
          val t0 = System.nanoTime()
          try {
            val df = fn(spark, sfDir)
            if (mode == "noop")
              df.write.format("noop").mode("overwrite").save()
            else df.count(): Unit
            val dt = (System.nanoTime() - t0) / 1e9
            times(name) = times.getOrElse(name, Vector.empty) :+ dt
          } catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[r7probe] $name failed: ${e.getMessage}")
            times(name) = times.getOrElse(name, Vector.empty) :+ Double.NaN
          }
          spark.sparkContext.setJobDescription(null)
        }
      }
      def num(d: Double) = if (d.isNaN) "null"
        else String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
      val js = times.map { case (n, ts) =>
        val ok = ts.filterNot(_.isNaN)
        val mn = if (ok.nonEmpty) ok.min else Double.NaN
        s""""$n":{"min":${num(mn)},"reps":[${ts.map(num).mkString(",")}]}"""
      }.mkString("{", ",", "}")
      val total = times.values.map { ts =>
        val ok = ts.filterNot(_.isNaN); if (ok.nonEmpty) ok.min else 0.0
      }.sum
      println(s"""{"r7probe":"$mode","total_min":${num(total)},"queries":$js}""")
    }
    spark.stop()
  }
}
