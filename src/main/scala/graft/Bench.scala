package graft

import org.apache.spark.sql.SparkSession

import graft.build.IndexBuilder

/** Benchmark main. Prints TWO JSON lines:
  *
  *   1. a diagnostics line (`"diag":"graft-bench"`) carrying the bulky
  *      transparency payloads — per-query rep arrays, scaling rep
  *      arrays, per-step wall/core-second evidence, plan fingerprints;
  *   2. LAST, the compact record line the driver parses
  *      (`"metric":"total",...`).
  *
  * r5 inlined the rep arrays into the record line and the driver's
  * tail capture cut off the head (`parsed: null`) — the record line
  * must stay short and last on stdout [VERDICT r5 #1].
  *
  * When SPARK_GRAFT_SCALING=1 (default) it also measures the
  * north_rule scaling evidence: the SAME index-build job at two
  * parallelism levels (local[N] and local[4N], the sandbox stand-in
  * for N vs 4N executors) over the SAME deterministic input, reporting
  * throughput at both and the scaling efficiency
  * = fps(4N) / (4 × fps(N)). The (N,4N) rep pairs are SPLIT around the
  * query section (default 2 before, 3 after, ~tens of minutes apart):
  * r5 ran all five back-to-back and one sustained ambient-load window
  * poisoned every pair (recorded 0.715 vs 0.771-0.773 same-code dress
  * runs) — time-decorrelating the pairs gives each level a shot at a
  * quiet window, exactly like the query section's suite-granularity
  * passes [VERDICT r5 #2]. Each level's record is the min across its
  * reps; every rep is published.
  *
  * Machine-readable ceiling evidence [VERDICT r5 #3]: for the rep that
  * set each level's record, the diagnostics line carries (a) a plan
  * fingerprint — sha over the normalized executed-plan strings of every
  * query execution in the build, expr-ids/paths stripped — identical
  * fingerprints at both levels prove the plans are the same and only
  * the thread count changed; (b) per-step walls from the builder's step
  * windows; (c) per-step core-seconds (Σ task executorRunTime of the
  * jobs launched inside each step's window) — the locus of any
  * core-second inflation between levels is then auditable from the
  * artifact instead of from BASELINE.md prose.
  *
  * The scaling corpus is deterministically amplified (Corpus
  * .documentsAmplified) so the job is compute-bound, not
  * job-scheduling-overhead-bound — at the real 10^12-file scale the
  * fixed overheads amortize away; the amplification emulates that.
  */
object Bench {

  /** Spark scratch dir: env override > roomy /dev/shm (needs ≥ 16 GiB
    * free) > OS tmp.
    */
  private[graft] val localDir: String =
    sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.getUsableSpace > 16L * 1024 * 1024 * 1024)
        "/dev/shm/graft-spark-local"
      else s"${System.getProperty("java.io.tmpdir")}/graft-spark-local"
    })

  private def cleanLocalDir(): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(localDir))

  private def session(cpus: Int, shufflePartitions: Int = 0): SparkSession = {
    val sp = if (shufflePartitions > 0) shufflePartitions else cpus
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      // zstd shuffle/spill blocks: ~25% fewer bytes through the
      // non-scaling memory/page-cache path for CPU that scales — the
      // r3 A/B showed the best local[4] walls (lz4 was the r2 pick;
      // uncompressed was already ruled out in r2). Level tuning (r5):
      // TWO interleaved SlimProbe A/Bs (1 vs 3, then 2 vs 3; 3 reps
      // each at bench conditions) found no reproducible difference —
      // T1 54-58 s / T4 18.4-20.1 s under every level, spreads
      // overlapping. Level 1 (the Spark default) stays; env-tunable.
      .config("spark.io.compression.codec", "zstd")
      .config("spark.io.compression.zstd.level",
        sys.env.getOrElse("SPARK_GRAFT_ZSTD_LEVEL", "1"))
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // sandbox datasets are tiny; without this, CPU-heavy scan stages
      // (tokenize/explode) collapse onto 1-2 input partitions. At real
      // scale the 128 MB default is right; this is per-SF tuning
      // (SURVEY.md: "size maxPartitionBytes so partitions fit at the
      // target SF").
      .config("spark.sql.files.maxPartitionBytes", (256 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
      // shuffle/spill on tmpfs: task metrics showed ~25% of task time in
      // I/O wait on the shared /tmp disk; production shuffles land on
      // executor-local NVMe that scales with the cluster. Falls back to
      // plain tmp when /dev/shm is small (shuffle competing with process
      // memory under a tight tmpfs cap risks OOM kills [ADVICE r2]);
      // SPARK_GRAFT_LOCAL_DIR overrides. Cleaned at start + end of main.
      .config("spark.local.dir", localDir)
      // task-side commit renames (v2): the v1 driver-side per-task dir
      // moves serialize at job end — pure serial time under the
      // north_rule's scaling criterion
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Locale-pinned number formatting: the artifact must be valid JSON
    * under ANY default locale (a comma-decimal locale would corrupt
    * f"%.3f" output) [ADVICE r5].
    */
  private def num(t: Double, digits: Int = 3): String =
    if (t.isNaN) "null"
    else String.format(java.util.Locale.ROOT, "%." + digits + "f",
      Double.box(t))

  private def sha16(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8)
      .map(b => String.format(java.util.Locale.ROOT, "%02x", Byte.box(b)))
      .mkString
  }

  /** Strip the run-varying parts of an executed-plan string (expr ids,
    * codegen/plan ids, file paths, stats) so two runs of the same plan
    * hash identically and a PLAN difference (different operators,
    * different partitioning) still changes the hash. Shuffle partition
    * counts are forced equal at both scaling levels (session() pins
    * shufflePartitions), so surviving digits are genuinely comparable.
    */
  private def normalizePlan(p: String): String = p
    .replaceAll("#\\d+", "#x")
    .replaceAll("plan_id=\\d+", "plan_id=x")
    .replaceAll("\\[id=#?\\d+\\]", "[id=x]")
    .replaceAll("Lambda\\$\\d+/0x[0-9a-f]+", "Lambda\\$x")
    // identity hashes print as 1-8 hex chars with no leading zeros —
    // match them all (over-matching is harmless here: normalization is
    // applied identically at both levels; UNDER-matching would leak a
    // run-varying token into the fingerprint)
    .replaceAll("@[0-9a-f]+", "@x")
    .replaceAll(
      "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}",
      "uuid")
    .replaceAll("file:[^\\s,\\)\\]]+", "file:_")
    .replaceAll("(/dev/shm|/tmp)[^\\s,\\)\\]]*", "_tmp_")
    .replaceAll("Statistics\\([^)]*\\)", "Statistics(_)")

  // cpuSecs = Σ task executorCpuTime (cycles actually burned), gcSecs =
  // Σ task jvmGCTime: together they decompose coreSecs (executorRunTime)
  // inflation — the r6 probe showed the 4-thread inflation is ~all
  // executorCpuTime (gc ≈ 0, fetch wait 0, spill 0, shuffle-write ~0),
  // i.e. a hardware CPU-throughput ceiling (SMT/turbo/memory bandwidth
  // on the shared VM), not allocator pressure, I/O contention, or skew
  private case class StepEv(name: String, wall: Double, coreSecs: Double,
      cpuSecs: Double, gcSecs: Double)
  private case class BuildEv(planFp: String, nPlans: Int,
      steps: Seq[StepEv], totalCoreSecs: Double) {
    def json: String = {
      val ss = steps.map(s =>
        s""""${s.name}":{"wall":${num(s.wall)},""" +
          s""""core_secs":${num(s.coreSecs)},""" +
          s""""cpu_secs":${num(s.cpuSecs)},""" +
          s""""gc_secs":${num(s.gcSecs)}}""").mkString("{", ",", "}")
      s"""{"plan_fp":"$planFp","plans":$nPlans,""" +
        s""""total_core_secs":${num(totalCoreSecs)},"steps":$ss}"""
    }
  }

  /** Per-session instrumentation for one scaling build: job→task
    * executorRunTime via SparkListener (jobs keyed by their submit
    * timestamp, so they map onto the builder's step windows), plan
    * hashes via QueryExecutionListener. Read `evidence` only AFTER
    * session.stop() — stopping drains the listener bus.
    */
  private final class Instrument(s: SparkSession) {
    import java.util.concurrent.ConcurrentHashMap
    private val jobStartMs = new ConcurrentHashMap[Integer, java.lang.Long]()
    private val stageToJob = new ConcurrentHashMap[Integer, Integer]()
    private val jobRunMs = new ConcurrentHashMap[Integer, java.lang.Long]()
    private val jobCpuNs = new ConcurrentHashMap[Integer, java.lang.Long]()
    private val jobGcMs = new ConcurrentHashMap[Integer, java.lang.Long]()
    private val planShas = ConcurrentHashMap.newKeySet[String]()
    s.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobStartMs.put(js.jobId, js.time)
          js.stageIds.foreach(st => stageToJob.put(st, js.jobId))
        }
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val j = stageToJob.getOrDefault(te.stageId, -1)
          if (te.taskMetrics != null) {
            jobRunMs.merge(j, te.taskMetrics.executorRunTime,
              (a, b) => a + b)
            jobCpuNs.merge(j, te.taskMetrics.executorCpuTime,
              (a, b) => a + b)
            jobGcMs.merge(j, te.taskMetrics.jvmGCTime,
              (a, b) => a + b): Unit
          }
        }
      })
    s.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = {
          val norm = normalizePlan(qe.executedPlan.toString)
          val h = sha16(norm)
          // plan-fingerprint audit trail: GRAFT_PLAN_DUMP=<dir> writes
          // each distinct normalized plan there, named by its hash
          sys.env.get("GRAFT_PLAN_DUMP").foreach { d =>
            val p = java.nio.file.Paths.get(d,
              s"${s.sparkContext.master.replaceAll("[^a-z0-9]", "")}-$h.txt")
            java.nio.file.Files.createDirectories(p.getParent)
            java.nio.file.Files.write(p, norm.getBytes(
              java.nio.charset.StandardCharsets.UTF_8)): Unit
          }
          planShas.add(h): Unit
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })

    def evidence(stepWindows: Seq[(String, Long, Long)]): BuildEv = {
      import scala.jdk.CollectionConverters._
      val jobs = jobStartMs.asScala.toSeq
        .map { case (j, t) => (j.intValue, t.longValue) }
      def sumIn(m: ConcurrentHashMap[Integer, java.lang.Long],
          lo: Long, hi: Long): Long = jobs.collect {
        case (j, t) if t >= lo && t <= hi =>
          m.getOrDefault(j, 0L).longValue
      }.sum
      val steps = stepWindows.map { case (n, lo, hi) =>
        StepEv(n, (hi - lo) / 1000.0,
          sumIn(jobRunMs, lo, hi) / 1000.0,
          sumIn(jobCpuNs, lo, hi) / 1e9,
          sumIn(jobGcMs, lo, hi) / 1000.0)
      }
      BuildEv(
        sha16(planShas.asScala.toSeq.sorted.mkString(",")),
        planShas.size, steps,
        jobRunMs.asScala.values.map(_.longValue).sum / 1000.0)
    }
  }

  def main(args: Array[String]): Unit = {
    cleanLocalDir() // leftovers from a previous crashed run
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "1"
    // scaling corpus targets a fixed doc count (compute-bound but quick)
    // regardless of the base SF's size
    val targetDocs = sys.env.getOrElse("SPARK_GRAFT_SCALE_DOCS", "1048576").toLong

    // ---- scaling setup ------------------------------------------------
    // N defaults to 1 (→ 4N = 4): the region where this shared-memory
    // sandbox VM adds real compute per thread. Beyond ~4-8 threads the
    // box is SMT/memory-bandwidth-limited (see BASELINE.md hardware
    // calibration) — a constraint of the single-JVM stand-in, not of the
    // engine's partitioning (every stage has >= 16 parallel tasks).
    val nLow = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "1").toInt
    val nHigh = nLow * 4
    // ≥4 reps: r2's 2-rep draw showed ±16% noise at local[1]
    // (reps_n = [76.06, 65.36]) and cost ~0.15 recorded efficiency —
    // the min over interleaved reps pins each level's real capability
    // [VERDICT r2 #1a]. 5 since r5; from r6 the pairs additionally
    // split 2-before / 3-after the query section (see scaladoc).
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "5").toInt
    val preReps = math.max(0, math.min(
      sys.env.getOrElse("SPARK_GRAFT_SCALE_PRE", "2").toInt, reps))
    var amplify = 1
    var files = 0L
    val times = scala.collection.mutable.Map[Int, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    val evids = scala.collection.mutable.Map[Int, Vector[BuildEv]]()
      .withDefaultValue(Vector.empty)

    // IDENTICAL plan at both levels (same shuffle partitioning = same
    // tasks); only the thread count changes — the faithful analog of
    // adding executors to a fixed-partitioning job. The plan_fp fields
    // in the diagnostics line prove it from the artifact.
    def scalePair(): Unit = Seq(nLow, nHigh).foreach { n =>
      val s = session(n, shufflePartitions = nHigh * 4)
      val inst = new Instrument(s)
      var win: Seq[(String, Long, Long)] = Nil
      var secsOpt: Option[Double] = None
      try {
        // tmpfs output: the scaling metric targets COMPUTE scaling;
        // production writes land on distributed storage that grows
        // with the cluster, while this box's single shared disk
        // would serialize commits and add cross-tenant noise
        val dir = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("/dev/shm"), s"graft-bench-scale-$n")
          .toString
        try {
          val (res, secs) = timed {
            IndexBuilder.build(s, sfDir, dir, IndexBuilder.BuildConfig(
              resume = false, amplify = amplify))
          }
          files = res.manifest.num_docs
          win = res.stepWindows
          secsOpt = Some(secs)
        } finally org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(dir))
      } catch {
        // NonFatal only: an OOM/VM error must propagate — a degraded
        // JVM would record garbage walls for every later section
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] scaling build local[$n] failed: " +
            e.getMessage)
      } finally s.stop()
      // after stop: listener bus drained, evidence complete
      secsOpt.foreach { secs =>
        times(n) = times(n) :+ secs
        evids(n) = evids(n) :+ inst.evidence(win)
      }
    }

    if (doScaling) {
      // JIT/page-cache warmup: one small untimed build; also reads the
      // base corpus size to derive the amplification factor
      val s = session(4)
      try {
        val base = graft.sources.Corpus.documents(s, sfDir).count()
        amplify = math.max(1, (targetDocs / base).toInt)
        val dir = java.nio.file.Files
          .createTempDirectory("graft-bench-warmup").toString
        try IndexBuilder.build(s, sfDir, dir, IndexBuilder.BuildConfig(
          resume = false, amplify = math.max(1, amplify / 16)))
        finally org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(dir))
      } finally s.stop()
      (1 to preReps).foreach(_ => scalePair())
    }

    // ---- per-query timings at the requested parallelism ----------------
    // An untimed warmup pass at the smallest SF JIT-compiles each
    // query's pipeline so the timed run measures the engine, not the
    // first-call compiler.

    val spark = session(cpus)
    // make q_index_build measure a real build, not a resume of stale state
    val idxDir = graft.build.Indexes.indexDirFor(sfDir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxDir))

    locally {
      val warmSf = "/root/testdata/sf0.001"
      if (new java.io.File(warmSf).isDirectory) {
        val wIdx = graft.build.Indexes.indexDirFor(warmSf)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wIdx))
        SparkEntry.queries.foreach { case (name, fn) =>
          try fn(spark, warmSf).count()
          catch { case e: Throwable =>
            System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
          }
        }
      }
      // sfDir frame-cache warm [VERDICT r4 #6]: the pipelines share
      // bounded per-sfDir caches (shingles, PPJoin prefix, embeddings,
      // simhash fingerprints, BM25 term frequencies); without this
      // untimed touch, pass 1's timed reps pay their materialization
      // and the per-query rep arrays are not comparable across passes.
      // q_dedup_simhash + q_bm25_batch joined the list in r6: their
      // frames moved into the cross-pass-persistent DerivedFrameCache
      // in r5 but were never warmed [ADVICE r5, VERDICT r5 #5].
      Seq("q_dedup_ngram", "q_dedup_minhash", "q_dedup_embed",
          "q_dedup_simhash", "q_bm25_batch").foreach { n =>
        SparkEntry.queries.get(n).foreach { fn =>
          try fn(spark, sfDir).count()
          catch { case e: Throwable =>
            System.err.println(s"[bench] sf-warm $n failed: ${e.getMessage}")
          }
        }
      }
    }

    // q_index_build FIRST: it pays the build; the wand queries then
    // reuse the cached index (their timings = pure query cost)
    val ordered = SparkEntry.queries.toSeq.sortBy { case (n, _) =>
      (if (n == "q_index_build") "0" else "1") + n
    }
    // Noise robustness [VERDICT r4 #1]: reps interleave at SUITE
    // granularity — the whole query pass runs `passes` times and each
    // query records the min ACROSS passes. Back-to-back per-query reps
    // (r4) sat inside the same ambient-load window (the hypervisor
    // steals cross-tenant time invisibly; BENCH_r04 recorded 19s for a
    // query the builder measured at 1.1-2.9s), while suite-granularity
    // reps are ~10 minutes apart and decorrelate from it. Every rep is
    // published in the artifact (query_reps) so the min is auditable
    // [ADVICE r4]. Between passes the index dir + build memo are wiped
    // so each pass's q_index_build measures a full build, not a resume.
    // A rep that THROWS records null (excluded from the min); a query
    // whose reps all failed records -1 — the artifact shows the failure
    // instead of a fast wall [ADVICE r4].
    val passes = sys.env.getOrElse("SPARK_GRAFT_QUERY_PASSES", "3").toInt
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          Double.NaN
      }
    }
    val repsByQuery =
      scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    (1 to passes).foreach { pass =>
      if (pass > 1) {
        graft.build.Indexes.invalidate(sfDir)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxDir))
      }
      ordered.foreach { case (name, fn) =>
        repsByQuery(name) =
          repsByQuery.getOrElse(name, Vector.empty) :+ runOnce(name, fn)
      }
    }
    val results = ordered.map { case (name, _) =>
      val ok = repsByQuery(name).filterNot(_.isNaN)
      name -> (if (ok.nonEmpty) ok.min else -1.0)
    }
    val repsJsonPerQuery = ordered.map { case (name, _) =>
      val arr = repsByQuery(name).map(num(_)).mkString("[", ",", "]")
      s""""$name":$arr"""
    }.mkString("{", ",", "}")
    // MUST stop before the remaining scaling pairs: getOrCreate would
    // otherwise hand them this 32-thread session instead of local[N]
    spark.stop()

    // ---- remaining scaling pairs (time-decorrelated from the first) ----
    if (doScaling) (1 to (reps - preReps)).foreach(_ => scalePair())

    // ---- assemble + print ----------------------------------------------
    var scalingJson = ""
    var scalingDiag = ""
    if (doScaling && times(nLow).nonEmpty && times(nHigh).nonEmpty) {
      val secsL = times(nLow).min
      val secsH = times(nHigh).min
      val fpsL = files / secsL
      val fpsH = files / secsH
      val eff = fpsH / (fpsL * (nHigh.toDouble / nLow))
      // evidence of the rep that set each level's record
      val evL = evids(nLow)(times(nLow).indexOf(secsL))
      val evH = evids(nHigh)(times(nHigh).indexOf(secsH))
      val planIdentical = evL.planFp == evH.planFp
      // per-step core-second inflation (4N core-secs / N core-secs for
      // IDENTICAL work): >1 quantifies the shared-memory contention the
      // ceiling argument localizes; ~1.0 means the step's CPU scales
      def inflBy(name: String, f: StepEv => Double): Option[Double] =
        for {
          a <- evL.steps.find(_.name == name) if f(a) > 0
          b <- evH.steps.find(_.name == name)
        } yield f(b) / f(a)
      def infl(name: String): Option[Double] = inflBy(name, _.coreSecs)
      def inflMap(f: StepEv => Double): String = evL.steps
        .flatMap(s => inflBy(s.name, f).map(v =>
          s""""${s.name}":${num(v, 2)}"""))
        .mkString("{", ",", "}")
      val inflJson = inflMap(_.coreSecs)
      // cpu_inflation ≈ core_inflation with gc_secs ≈ 0 at both levels
      // pins the inflation to executorCpuTime: cycles per unit work —
      // a hardware throughput ceiling, not GC/IO/skew (see StepEv)
      val cpuInflJson = inflMap(_.cpuSecs)
      def repsJson(n: Int) =
        times(n).map(num(_, 2)).mkString("[", ",", "]")
      scalingJson =
        s""","scaling":{"files":$files,"amplify":$amplify,""" +
          s""""local_n":$nLow,"secs_n":${num(secsL, 2)},""" +
          s""""files_per_sec_n":${num(fpsL, 1)},""" +
          s""""local_4n":$nHigh,"secs_4n":${num(secsH, 2)},""" +
          s""""files_per_sec_4n":${num(fpsH, 1)},""" +
          s""""pairs_split":[$preReps,${reps - preReps}],""" +
          s""""plan_identical":$planIdentical,""" +
          s""""core_infl_docstore":${
            infl("docstore").map(num(_, 2)).getOrElse("null")},""" +
          s""""efficiency":${num(eff, 4)}}"""
      scalingDiag =
        s""","scaling_reps":{"n":${repsJson(nLow)},"4n":${repsJson(nHigh)}},""" +
          s""""scaling_evidence":{"local_n":${evL.json},""" +
          s""""local_4n":${evH.json},"core_inflation":$inflJson,""" +
          s""""cpu_inflation":$cpuInflJson,""" +
          s""""plan_identical":$planIdentical}"""
    } else if (doScaling) {
      // every rep failed at one or both levels: record the failure
      // loudly instead of a clean-looking artifact with the north_rule
      // evidence silently absent
      scalingJson = s""","scaling":{"error":"no successful scaling reps"}"""
      System.err.println("[bench] SCALING FAILED: no successful build " +
        s"reps (local[$nLow]: ${times(nLow).size}, " +
        s"local[$nHigh]: ${times(nHigh).size})")
    }

    val qs = results.map { case (k, v) => s""""$k":${num(v)}""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // diagnostics first (bulky), record line LAST and compact — the
    // driver tail-captures stdout and must always see the record whole
    println(
      s"""{"diag":"graft-bench","query_passes":$passes,""" +
        s""""query_reps":$repsJsonPerQuery$scalingDiag}""")
    println(
      s"""{"metric":"total","value":${num(total)},"unit":"sec",""" +
        s""""queries":$qs,"sf":"$sfDir","cpus":$cpus$scalingJson}""")
    cleanLocalDir()
  }
}
