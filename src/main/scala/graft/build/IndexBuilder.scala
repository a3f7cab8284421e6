package graft.build

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Observation, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.CollectionAccumulator

import graft.cluster.CoarseClusterer
import graft.codec.{PostingCodec, PostingEntry}
import graft.model.{PartitionMeta, Posting, PostingBlock}
import graft.query.Bm25
import graft.sources.Corpus
import graft.tokenize.Tokenizer

/** The index build job — entry point 1 of the reference
  * (`IVFADCIndex(data; kwargs)`, /root/reference/src/index.jl:103-165)
  * re-expressed as a Spark pipeline (SURVEY.md §3.1):
  *
  *   read source table → tokenize → hashed term-vectors →
  *   deterministic kmeans (centroids collected at the driver — the only
  *   driver-sync barrier) → cluster_id column →
  *   ONE shuffle: granule hash on (cluster_id, doc_id div W) →
  *   sortWithinPartitions(cluster_id, granule, term, doc_id) →
  *   mapPartitions posting-block build (delta+varint, block-max) →
  *   write postings partitioned by cluster_id + manifest.
  *
  * Layout under `indexDir`:
  *   docstore/    parquet, partitionBy(cluster_id) — lossless row store
  *   dictionary/  parquet (term, df, cf, idf)
  *   postings/    parquet, partitionBy(cluster_id) of PostingBlock rows
  *   manifest.json
  *   _checkpoints/<step>.done — resumable build markers
  *
  * SCALE NOTES (100 TB):
  *  - range partitioning on (cluster_id, doc_id) both balances segment
  *    sizes by row count (stop-word-heavy terms are spread across doc
  *    ranges — the order-preserving equivalent of salting) and keeps each
  *    (cluster, term) posting run split into DISJOINT doc ranges, so the
  *    read side can concatenate block runs without a merge;
  *  - BM25 factorizes as idf × g(tf, dl), so posting encode needs no
  *    dictionary join, and the dictionary aggregates from three tiny
  *    block-metadata columns (map-side partial agg absorbs stop-word
  *    keys — the effect explicit salting gives non-combinable aggs);
  *  - resume: step-level checkpoint markers, plus PER-PARTITION batch
  *    markers inside the postings step (cluster batches, partition-
  *    pruned incremental rebuild).
  */
object IndexBuilder {

  /** On-disk layout version, part of the resume fingerprint: bumping it
    * invalidates checkpoints of older layouts (r2: granule windows).
    */
  val FormatVersion = 2

  /** Granule window: each (cluster_id, doc_id div W) granule holds at
    * most W dense doc ids. Because W bounds granule size regardless of
    * how clusters correlate with the doc_id order, hashing granules over
    * the shuffle slots gives balanced tasks WITHOUT the full extra
    * sampling pass a range partitioner runs over its input — and every
    * posting block stays inside one granule, so block doc-ranges are
    * provably disjoint across tasks (the property the read side's
    * sorted-run concatenation relies on). ~4 granules per slot, floored
    * at 8k docs per window: below that, granule boundaries fragment
    * posting runs into sub-block pieces and compression/bytes-per-
    * posting degrade — a tiny corpus degrades gracefully to cluster-only
    * partitioning (one window), where it never needed intra-cluster
    * splits to begin with.
    */
  def granuleWindow(n: Long, parts: Int): Long =
    math.max(8192L, math.ceil(n.toDouble / (4.0 * parts)).toLong)

  case class BuildConfig(
      kc: Int = 0, // 0 = auto (CoarseClusterer.pickKc)
      resume: Boolean = true,
      amplify: Int = 1, // bench-only deterministic corpus blow-up
      postingsBatches: Int = 2, // per-partition resume granularity (tests use 4)
      validateInput: Boolean = false, // B2-style key-uniqueness check (one extra job)
      // coarse-assignment metric — the reference's Dc type parameter
      // (/root/reference/src/index.jl:40); affects only how docs group
      // into cells, never BM25 scores
      distance: graft.cluster.Distance = graft.cluster.Distance.SqEuclidean,
      // opt back into the r2 granule-slot exchange ahead of the posting
      // encode (the r3 default reads the granule-aligned docstore files
      // with no exchange at all — same query results either way)
      postingsExchange: Boolean =
        sys.env.getOrElse("GRAFT_POSTINGS_SHUFFLE", "0") == "1",
      // slim the docstore slot exchange for derivable sources (build()
      // supplies the Corpus re-derivation; see Corpus.SourceRederive).
      // DEFAULT OFF — measured and rejected for this corpus shape
      // (SlimProbe, 3 interleaved reps at bench conditions: T1 min
      // 60.9s vs 55.1s, T4 20.5s vs 18.5s, efficiency 0.743 vs 0.746):
      // the bit-exact restore needs a second sha2 per row for `commit`,
      // which costs more CPU than the ~40 B/row of shuffle bytes saved.
      // The lever stays for sources whose keys restore cheaply.
      slimExchange: Boolean =
        sys.env.getOrElse("GRAFT_SLIM_EXCHANGE", "0") == "1",
      // extra parquet writer options for the docstore write (the
      // build's one non-scaling-inflated stage; BASELINE.md "Hardware
      // ceiling"). A/B surface for encode-path levers — e.g.
      // "parquet.enable.dictionary#content" -> "false" (skip the
      // dictionary hash-table build for the high-cardinality content
      // column), "parquet.block.size" -> smaller row groups (less
      // buffered memory per write task). Default empty = parquet
      // defaults; bytes on disk change, query results never do.
      docstoreWriteOptions: Map[String, String] = Map.empty)

  /** Split cluster ids 0..kc-1 into up to `nBatches` contiguous groups. */
  def clusterBatches(kc: Int, nBatches: Int): Seq[Seq[Int]] = {
    val per = math.max(1, math.ceil(kc.toDouble / nBatches).toInt)
    (0 until kc).grouped(per).map(_.toSeq).toSeq
  }

  case class BuildResult(
      manifest: IndexManifest,
      totalMillis: Long,
      filesPerSec: Double,
      stepsRun: Seq[String],
      stepsSkipped: Seq[String],
      // (step, startEpochMs, endEpochMs) for top-level steps actually
      // run — lets the bench attribute per-job task metrics to steps by
      // time window and emit the per-step wall/core-seconds scaling
      // evidence machine-readably [VERDICT r5 #3]
      stepWindows: Seq[(String, Long, Long)] = Nil)

  private def ckptPath(indexDir: String, step: String) =
    Paths.get(indexDir, "_checkpoints", s"$step.done")

  private def markDone(indexDir: String, step: String, info: String): Unit = {
    val p = ckptPath(indexDir, step)
    Files.createDirectories(p.getParent)
    Files.write(p, info.getBytes(StandardCharsets.UTF_8))
  }

  private def isDone(indexDir: String, step: String): Boolean =
    Files.exists(ckptPath(indexDir, step))

  def build(
      spark: SparkSession,
      sfDir: String,
      indexDir: String,
      cfg: BuildConfig = BuildConfig()): BuildResult = {
    // exact row count from parquet metadata (footer-only job, ~ms):
    // amplification is a pure ×factor, so the docstore step's sample
    // stride needs no count job on its critical path — the same
    // metadata count any table format (parquet/Iceberg) serves for free
    val base = spark.read.parquet(s"$sfDir/documents.parquet").count()
    buildFromSource(spark,
      Corpus.sourceTable(spark, sfDir, cfg.amplify), indexDir, cfg,
      lineageName = sfDir,
      knownRows = base * cfg.amplify,
      exchangeSlim =
        if (cfg.slimExchange)
          Some((Corpus.SourceRederive.slim _, Corpus.SourceRederive.restore _))
        else None)
  }

  /** Build from any F1-shaped source DataFrame; `idOrder` defines the
    * dense docID order (compaction passes the old id).
    *
    * `fixedCentroids`: reuse an existing coarse quantizer instead of
    * fitting one — the kmeans fit is SKIPPED entirely and every doc is
    * assigned under the given centroids. Compaction threads the source
    * manifest's centroids through here: the reference's
    * `delete_from_index!` only shifts ids and never retrains the coarse
    * or residual quantizer (/root/reference/src/utils.jl:90-105), so
    * cluster assignments stay STABLE across compactions and the rebuild
    * spends no sample-fit driver time [VERDICT r4 #3].
    */
  def buildFromSource(
      spark: SparkSession,
      source: DataFrame,
      indexDir: String,
      cfg: BuildConfig = BuildConfig(),
      idOrder: Seq[String] = Seq("repo", "path", "commit"),
      lineageName: String = "<dataframe>",
      knownRows: Long = 0L,
      fixedCentroids: Option[Array[Array[Double]]] = None,
      // (slim, restore) projection pair around the docstore slot
      // exchange for sources whose key columns are derivable — restore
      // MUST be bit-exact (the docstore is the source of truth for every
      // later step); only build() supplies one (Corpus.SourceRederive)
      exchangeSlim: Option[(DataFrame => DataFrame, DataFrame => DataFrame)] =
        None,
      // compaction fast path (r7): the source ALREADY carries dense
      // 0-based doc_id, cluster_id, doc_len and content_sha (the
      // docstore is lossless and compaction never retrains, so every
      // one of them is a stored, deterministic value — recomputing them
      // was provably redundant work). The docstore step then skips the
      // dense-id keys pass, the kmeans sample collect and the per-row
      // content->cluster assignment entirely: ONE slot exchange + write.
      // Requires fixedCentroids and an exact knownRows; granule weights
      // are caller-supplied estimates (placement only — balance, never
      // correctness).
      preAssigned: Option[PreAssignedSource] = None): BuildResult = {
    import spark.implicits._
    val t0 = System.nanoTime()
    val sfDir = lineageName
    // B2 analog (/root/reference/src/index.jl:115-125): config sanity is
    // always checked; the key-uniqueness scan (docID determinism depends
    // on unique idOrder keys) is opt-in because it costs one job.
    require(cfg.kc == 0 || cfg.kc >= 2, s"kc must be >= 2, got ${cfg.kc}")
    require(cfg.postingsBatches >= 1, "postingsBatches must be >= 1")
    require(cfg.amplify >= 1, "amplify must be >= 1")
    if (cfg.validateInput) {
      val keyed = source.select(idOrder.map(col): _*)
      val total = keyed.count()
      val distinctKeys = keyed.distinct().count()
      require(total == distinctKeys,
        s"idOrder keys ${idOrder.mkString("(", ",", ")")} must be unique: " +
          s"$total rows, $distinctKeys distinct")
    }
    // Resume identity [ADVICE r1]: a marker's existence is not enough —
    // a dir previously built from a different source/config must NOT
    // have its steps silently skipped. The fingerprint covers input,
    // config, and on-disk format; on mismatch all checkpoint state and
    // the append-mode postings dir are wiped before any step runs.
    val fingerprint =
      s"v=$FormatVersion input=$sfDir kc=${cfg.kc} amplify=${cfg.amplify} " +
        s"batches=${cfg.postingsBatches} idOrder=${idOrder.mkString(",")} " +
        s"dist=${cfg.distance.getClass.getSimpleName}" +
        fixedCentroids.map(c => s" fixed=${java.util.Arrays.deepHashCode(
          c.asInstanceOf[Array[AnyRef]])}").getOrElse("") +
        (if (preAssigned.nonEmpty) " pre=1" else "")
    val fpPath = Paths.get(indexDir, "_checkpoints", "fingerprint.txt")
    val fpMatches = Files.exists(fpPath) &&
      new String(Files.readAllBytes(fpPath), StandardCharsets.UTF_8) ==
        fingerprint
    // no fingerprint but markers present = a pre-fingerprint-era or
    // partially-wiped dir: equally stale
    if (cfg.resume && !fpMatches &&
        Files.isDirectory(Paths.get(indexDir, "_checkpoints"))) {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$indexDir/_checkpoints"))
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$indexDir/postings"))
    }
    Files.createDirectories(fpPath.getParent)
    Files.write(fpPath, fingerprint.getBytes(StandardCharsets.UTF_8))

    var run = Vector.empty[String]
    var skip = Vector.empty[String]
    var stepWin = Vector.empty[(String, Long, Long)]
    // epoch-ms windows derived from ONE epoch anchor + monotonic nano
    // offsets: windows stay ordered and walls non-negative even if the
    // wall clock steps (NTP) mid-build — close enough to Spark's
    // job-submit currentTimeMillis for per-step attribution
    val epochAnchor = System.currentTimeMillis()
    def monoMs(): Long = epochAnchor + (System.nanoTime() - t0) / 1000000L

    def step[T](name: String)(body: => T): Unit =
      if (cfg.resume && isDone(indexDir, name)) { skip :+= name }
      else {
        val t = System.nanoTime()
        val ms0 = monoMs()
        body
        markDone(indexDir, name, s"input=$sfDir")
        stepWin :+= ((name, ms0, monoMs()))
        System.err.println(
          f"[build] step $name%-10s ${(System.nanoTime() - t) / 1e9}%.2fs")
        run :+= name
      }

    // ---- step 1: docstore (docs + kmeans cluster assignment) ----------
    // Job economy (the north_rule scaling criterion punishes a long
    // serial driver chain): j1 range-boundary sample for the dense-id
    // exchange, j2 per-partition counts (whose sum is the TOTAL row
    // count — no separate stats job), j3 kmeans-sample collect (the
    // doc_id-stride filter is pushed below sha/tokenize, so only the
    // ~10k sampled docs are tokenized), j4 the write itself, carrying an
    // Observation that computes num_docs, Σdoc_len and per-cluster doc
    // counts as a free side effect of the write job. Round 1 ran ~7
    // sequential jobs here, including a SECOND full compute pass for the
    // write's range-partitioner sampling; the granule-hash exchange
    // needs no sampling at all.
    step("docstore") {
      preAssigned match {
        case Some(pa) =>
          docstorePreAssigned(spark, source, indexDir, cfg,
            fixedCentroids.getOrElse(sys.error(
              "preAssigned requires fixedCentroids")),
            knownRows, pa)
        case None =>
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      // The step's head used to be THREE sequential driver jobs (keys-
      // only id pass → kmeans-sample collect → fit) before the write
      // could even launch — pure critical path that a multi-executor
      // cluster would overlap. r4 runs them CONCURRENTLY: the keys pass
      // and the sample collect are independent jobs (the sample is
      // key-hash-strided, not doc_id-strided, so it no longer waits on
      // the id map), and for corpora past the 10k sample cap the kmeans
      // fit runs the moment the sample lands, overlapping the keys
      // pass's tail. Fixture-scale corpora (n <= 10k ⇒ fitStep == 1)
      // sample EVERY doc either way and keep the id-seeded fit, so their
      // centroids — and every golden result — are bit-identical to r3.
      //
      // the GRAFT_DOCSTORE_SHUFFLE=0 experiment writes straight from the
      // dense-id partitioning, which is only granule-aligned under the
      // exchange id strategy (the broadcast strategy leaves rows in
      // source order — writing from it would break the disjoint-doc-
      // range-per-file invariant the zero-shuffle postings step needs)
      val denseF = Future {
        Corpus.docsFromCounted(source, idOrder,
          idStrategy =
            if (sys.env.getOrElse("GRAFT_DOCSTORE_SHUFFLE", "1") == "0")
              "exchange"
            else sys.env.getOrElse("GRAFT_ID_STRATEGY", "auto"),
          // lets small corpora take the one-job driver-sort id path
          // (r7, Corpus.IdDriverSortMaxDocs); 0/over-bound/wrong hints
          // fall back safely
          rowHint = knownRows)
      }
      // row count for stride/kc sizing: metadata-derived when the
      // caller knows it (build() always does — parquet/Iceberg row
      // counts are free), else a column-pruned count job that runs
      // while the keys pass is in flight (for a deterministic source
      // it equals the keys pass's own count exactly)
      val nEst = if (knownRows > 0) knownRows else source.count()
      require(nEst > 0, "empty source")
      val kc = fixedCentroids.map(_.length).getOrElse(
        if (cfg.kc > 0) cfg.kc else CoarseClusterer.pickKc(nEst))
      // kmeans fits driver-locally on a deterministic key-hash-strided
      // sample (at real scale you never run Lloyd's over the full
      // corpus); assignment below still covers every doc. The sample is
      // capped at ~10k: the fit is a SERIAL driver cost, and a
      // partitioning signal does not improve past that. Only this
      // bounded sample ever materializes a `feat` column — the full
      // corpus is assigned by the fused zero-allocation expression below.
      val fitStep = math.max(1L, nEst / 10000)
      val keyHash = xxhash64(idOrder.map(col): _*)
      val sampleHF = Future {
        CoarseClusterer.withFeatures(
            source.filter(pmod(keyHash, lit(fitStep)) === lit(0L)))
          .select(keyHash.as("h"), col("feat"))
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      }
      // fitStep > 1: seeds keyed by (murmur3(hash), hash) — id-free, so
      // the fit overlaps the keys pass instead of serializing after it.
      // Fixed centroids skip the fit entirely (the sample still feeds
      // the granule-weight estimate below).
      val fitF: Future[Array[Array[Double]]] =
        if (fitStep > 1 && fixedCentroids.isEmpty) sampleHF.map { sh =>
          if (sh.isEmpty) null
          else CoarseClusterer.fitLocal(sh, kc, dist = cfg.distance)
        } else null
      val dense = Await.result(denseF, Duration.Inf)
      val n = dense.numRows
      require(n > 0, "empty source")
      if (knownRows > 0 && knownRows != n)
        // a caller passing a wrong count deserves a breadcrumb: the hint
        // sized the sample stride AND (when kc is auto and centroids are
        // not fixed) the persisted cluster count [ADVICE r4]
        System.err.println(s"[build] knownRows=$knownRows != actual $n" +
          " rows; sample stride and auto-kc were sized from the hint" +
          s" (kc=$kc${if (fixedCentroids.nonEmpty) ", fixed" else ""})")
      // sample with doc_ids (granule weights need them): broadcast id
      // strategy resolves them driver-side from the exact hash→id map —
      // zero extra jobs; the exchange fallback re-derives the r3
      // doc_id-strided sample from the id'd frame (one bounded job,
      // fallback path only)
      lazy val sampleIdsFallback = CoarseClusterer
        .withFeatures(dense.df.filter(col("doc_id") % fitStep === 0))
        .select("doc_id", "feat")
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
        .sortBy(_._1)
      val sampleIds: Array[(Long, Array[Long])] = dense.idOfHash match {
        case Some(m) =>
          val sh = Await.result(sampleHF, Duration.Inf)
          val resolved = sh.map { case (h, f) => (m.get(h), f) }
            .filter(_._1 >= 0).sortBy(_._1)
          if (resolved.nonEmpty) resolved else sampleIdsFallback
        case None => sampleIdsFallback
      }
      val centroids = fixedCentroids.getOrElse {
        val pre =
          if (fitF != null) Await.result(fitF, Duration.Inf) else null
        if (pre != null) pre
        else CoarseClusterer.fitLocal(sampleIds, kc, dist = cfg.distance)
      }
      saveCentroids(indexDir, centroids)
      val parts = spark.sessionState.conf.numShufflePartitions
      val window = granuleWindow(n, parts)
      // granule weights estimated from the (deterministic) kmeans sample
      // drive contiguous slot assignment here and in the postings step —
      // balanced tasks, low file counts, no partitioner sampling pass
      val weights = sampleIds
        .map { case (id, f) =>
          (CoarseClusterer.assign(f, centroids, cfg.distance), id / window)
        }
        .groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
        .toSeq
      saveGranuleWeights(indexDir, weights)
      val slotCol = GranulePartitioner.slotKeyCol(
        GranulePartitioner.slotMap(weights, parts), window, parts) _
      val obs = Observation()
      val metrics =
        count(lit(1)).as("n") +: sum(col("doc_len")).as("sum_dl") +:
          min(col("doc_id")).as("min_id") +:
          (0 until kc).map(c =>
            sum(when(col("cluster_id") === c, 1L).otherwise(0L)).as(s"c$c"))
      // fused content→features→argmin assignment, one codegen call per
      // row with a reused feature buffer — no feat array column, no udf
      // Seq boxing on the build's biggest stage (r3; ClusterAssignExpr).
      // Late r3: doc_len rides the SAME scan (packed Long) — the
      // docsFromCounted TokenCountExpr column is dropped and its
      // second full tokenize pass pruned from this job entirely
      // (token count == sum of feature buckets, property-tested)
      val clustered = dense.df
        .drop("doc_len")
        .withColumn("_cl", graft.functions.ClusterAssignExpr
          .clusterIdAndLen(col("content"), centroids, cfg.distance))
        .withColumn("cluster_id", shiftright(col("_cl"), 32).cast("int"))
        .withColumn("doc_len",
          col("_cl").bitwiseAND(lit(0xffffffffL)).cast("int"))
        .drop("_cl")
        .observe(obs, metrics.head, metrics.tail: _*)
      // granule-slot exchange ahead of the write: each task holds a few
      // CONTIGUOUS (cluster, doc range) slices → ~2 files per cluster
      // instead of tasks × clusters; measured faster end-to-end than
      // writing from the dense-id partitioning despite the extra
      // shuffle (GRAFT_DOCSTORE_SHUFFLE=0 opts out for experiments)
      // content_sha is recomputed on the POST-exchange side: the column
      // is derivable from content, so shipping it through the shuffle
      // would pay 64 B/row of exchange bytes (the non-scaling resource)
      // to save a sha2 recompute (CPU, which scales) — backwards at 4
      // threads and at 4N executors alike
      // exchangeSlim (r5): for derivable sources, repo/path/commit are
      // additionally dropped through the exchange and re-derived after —
      // the same bytes-for-CPU trade as the sha recompute, ~40 B/row off
      // the one content shuffle (the docstore write map stage's shuffle
      // write is the build's residual non-scaling cost, BASELINE.md)
      // the task-local sort runs on the SLIM rows (before restore/sha):
      // the write task's external sorter then holds ~60 fewer bytes per
      // row, and the narrow derive projection above the Sort preserves
      // row order, so the parquet files stay (cluster_id, doc_id)-sorted
      val toWrite =
        if (sys.env.getOrElse("GRAFT_DOCSTORE_SHUFFLE", "1") == "1") {
          val (slimF, restoreF) = exchangeSlim.getOrElse(
            (identity[DataFrame] _, identity[DataFrame] _))
          val exchanged = restoreF(
            slimF(clustered.drop("content_sha"))
              .withColumn("_slot", slotCol(col("cluster_id"), col("doc_id")))
              .repartition(parts, col("_slot"))
              .drop("_slot")
              .sortWithinPartitions(col("cluster_id"), col("doc_id")))
            .withColumn("content_sha", sha2(col("content"), 256))
          // canonical column order regardless of what restore appended
          exchanged.select("doc_id", "repo", "path", "commit", "lang",
            "content", "cluster_id", "doc_len", "content_sha")
        } else clustered
          .sortWithinPartitions(col("cluster_id"), col("doc_id"))
      toWrite
        .write.mode("overwrite")
        .options(cfg.docstoreWriteOptions)
        .partitionBy("cluster_id")
        .parquet(s"$indexDir/docstore")
      dense.unpersist()
      val m = obs.get
      // a negative id = the broadcast id lookup saw a key its keys-only
      // pass did not (non-deterministic source) — fail the build, the
      // docstore written above is not trustworthy
      require(m("min_id").asInstanceOf[Long] >= 0,
        s"dense-id lookup missed a key (min doc_id = ${m("min_id")}): " +
          "the source is not deterministic across jobs")
      saveStats(indexDir,
        CorpusStats(n, m("sum_dl").asInstanceOf[Long], window))
      saveDocCounts(indexDir, (0 until kc)
        .map(c => c -> m(s"c$c").asInstanceOf[Long])
        .filter(_._2 > 0).toMap)
      }
    }

    def docstore = IndexSchemas.readDocstore(spark, indexDir)

    // ---- step 2: postings (blocks, ONE wide shuffle) -------------------
    // BM25 factorizes as idf × g(tf, dl): blocks store the idf-free
    // g-max, so NO dictionary join is needed here, and the dictionary
    // (step 3) aggregates from block metadata — one tokenize pass total.
    // Per-PARTITION resumability (north_rule): clusters are built in
    // batches; each batch reads only its clusters' docstore partitions
    // (partition pruning), writes its posting partitions, and commits a
    // marker. A crashed build resumes at the first unfinished batch,
    // first wiping that batch's partial partition dirs.
    step("postings") {
      val stats = loadStats(indexDir)
      val avgdl = stats.avgdl
      val kc = loadCentroids(indexDir).length
      val weights = loadGranuleWeights(indexDir)
      val parts = spark.sessionState.conf.numShufflePartitions
      val batches = clusterBatches(kc, cfg.postingsBatches)
      if (!cfg.resume) {
        // fresh build: wipe all posting partitions + batch markers (a
        // reused dir may hold state from a different kc)
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"$indexDir/postings"))
        val ck = new java.io.File(s"$indexDir/_checkpoints")
        // batch markers AND per-batch cluster stats: a dir previously
        // built with a different postingsBatches count would otherwise
        // leave stale clusterstats_batch_*.json files that
        // loadAllClusterStats sums into the manifest [ADVICE r2]
        if (ck.isDirectory) ck.listFiles()
          .filter(f => f.getName.startsWith("postings_batch_") ||
            f.getName.startsWith("clusterstats_batch_"))
          .foreach(_.delete())
        saveSegments(indexDir, Seq.empty)
      }
      // batches are INDEPENDENT (disjoint clusters, own staging dir, own
      // marker), so pending ones are submitted CONCURRENTLY from driver
      // threads — the scheduler interleaves their stages and the
      // inter-batch barrier (idle cores at each batch's straggler tail)
      // disappears. Spark's FIFO scheduler backfills idle slots with the
      // next job's tasks. Metadata checkpoint writes share `metaLock`.
      val metaLock = new Object
      val pending = batches.zipWithIndex.flatMap { case (clusters, bi) =>
        val marker = s"postings_batch_$bi"
        if (cfg.resume && isDone(indexDir, marker)) {
          metaLock.synchronized { skip :+= marker }
          None
        } else Some((clusters, bi, bi * 10000))
      }
      // ZERO-shuffle postings (r3): the docstore was WRITTEN from
      // granule-slot tasks sorted by (cluster_id, doc_id), so its files
      // are already contiguous granule-aligned runs — the encode needs
      // only a partition-LOCAL sort regardless of how files map to read
      // partitions (blocks group by (cluster, granule, term) within a
      // partition; splits keep per-(cluster,term) doc ranges disjoint,
      // the same invariant appends rely on). Dropping the exchange
      // removes the build's largest remaining shuffle — full content
      // rows — which is exactly the stage class that refuses to scale
      // with threads (BASELINE.md calibration). Read-partition sizing
      // replaces the exchange's balancing role: target ≈ bytes/parts.
      // GRAFT_POSTINGS_SHUFFLE=1 (or cfg.postingsExchange) opts back
      // into the r2 exchange path.
      val postingsExchange = cfg.postingsExchange
      // compaction transform (r7): source = the OLD index's postings
      val transformFrom = preAssigned.flatMap(_.transformFrom)
      val mpbKey = "spark.sql.files.maxPartitionBytes"
      val mpbPrev = spark.conf.get(mpbKey)
      if (!postingsExchange) {
        val totalBytes = org.apache.commons.io.FileUtils
          .sizeOfDirectory(new java.io.File(transformFrom
            .map { case (srcDir, _) => s"$srcDir/postings" }
            .getOrElse(s"$indexDir/docstore")))
        // read-granularity factor: >1 packs finer partitions (more
        // waves, smoother straggler tail), at the cost of more/smaller
        // posting files
        val factor = sys.env.getOrElse("GRAFT_POSTINGS_READ_FACTOR", "1")
          .toInt
        // floor 1 MB (was 4 MB): the amplified bench docstore
        // dictionary-compresses to ~15-30 MB, and the 4 MB floor
        // collapsed the whole postings read to ~6 tasks — a 4-thread
        // level ran a 2-wave job with an idle tail. At real scale
        // bytes/parts dominates the floor either way.
        spark.conf.set(mpbKey,
          math.max(1L << 20,
            totalBytes / math.max(1, parts * factor)).toString)
      }
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val jobs = pending.map { case (clusters, bi, segOffset) =>
        Future {
          val marker = s"postings_batch_$bi"
          // each batch writes to its own staging dir (concurrent jobs
          // must not share a FileOutputCommitter _temporary), then the
          // driver moves the cluster dirs into postings/ — idempotent
          // restart wipes partial moves first
          val staging = s"$indexDir/postings_staging_$bi"
          clusters.foreach { cid =>
            org.apache.commons.io.FileUtils.deleteQuietly(
              new java.io.File(s"$indexDir/postings/cluster_id=$cid"))
          }
          org.apache.commons.io.FileUtils.deleteQuietly(
            new java.io.File(staging))
          val (blocks, acc, cacc) = transformFrom match {
            case Some((srcDir, deadBc)) =>
              // decode→shift→re-encode the source index's blocks — no
              // content pass (see transformBlocks)
              val oldSlice = IndexSchemas.readPostings(spark, srcDir)
                .filter(col("cluster_id").isin(clusters: _*))
              transformBlocks(spark, oldSlice, deadBc, avgdl, segOffset,
                stats.granule_window)
            case None =>
              val slice = docstore
                .filter(col("cluster_id").isin(clusters: _*))
              // exchange path only: re-pack THIS batch's granules over
              // all slots (a batch covers a cluster subset; without
              // re-packing half the slots idle)
              val batchSlots =
                if (postingsExchange) GranulePartitioner.slotMap(
                  weights.filter(g => clusters.contains(g._1._1)), parts)
                else Map.empty[(Int, Long), Int]
              encodeBlocks(spark, slice, avgdl,
                segOffset, stats.granule_window, batchSlots,
                exchange = postingsExchange)
          }
          blocks.write.mode("overwrite")
            .partitionBy("cluster_id")
            .parquet(staging)
          Files.createDirectories(Paths.get(s"$indexDir/postings"))
          new java.io.File(staging).listFiles()
            .filter(_.getName.startsWith("cluster_id="))
            .foreach { d =>
              Files.move(d.toPath,
                Paths.get(s"$indexDir/postings/${d.getName}"))
            }
          org.apache.commons.io.FileUtils.deleteQuietly(
            new java.io.File(staging))
          val segs = {
            import scala.jdk.CollectionConverters._
            acc.value.asScala.toSeq.sortBy(_.segment_id)
          }
          val cstats = {
            import scala.jdk.CollectionConverters._
            cacc.value.asScala.toSeq.sortBy(_.cluster_id)
          }
          metaLock.synchronized {
            appendSegments(indexDir, segs, segOffset, segOffset + 10000)
            saveClusterStats(indexDir, bi, cstats)
            markDone(indexDir, marker,
              s"input=$sfDir clusters=${clusters.mkString(",")}")
            run :+= marker
          }
        }
      }
      try jobs.foreach(Await.result(_, Duration.Inf))
      finally spark.conf.set(mpbKey, mpbPrev)
    }

    // ---- step 3: dictionary (df/cf/idf from block metadata) ------------
    // Vocab size rides along on the write job via an Observation.
    // The HNSW coarse-graph build (B7) is driver-local CPU that depends
    // only on the centroids, fixed since the docstore step — start it
    // here so the dictionary job's wall absorbs it instead of paying it
    // serially inside the manifest step [VERDICT r5 #6].
    val graphF: Option[scala.concurrent.Future[
        (Array[Array[Int]], Array[Array[Array[Int]]])]] =
      if (cfg.resume && isDone(indexDir, "manifest")) None
      else Some {
        import scala.concurrent.ExecutionContext.Implicits.global
        scala.concurrent.Future {
          graft.cluster.GraphCoarseSearch.buildGraph(
            loadCentroids(indexDir), metric = cfg.distance)
        }
      }
    step("dictionary") {
      writeDictionary(spark, indexDir, loadStats(indexDir).num_docs)
    }

    // ---- step 4: manifest (ZERO jobs: assembled from the stats the
    // earlier steps observed/accumulated — doc counts from the docstore
    // write observation, block stats from the encode accumulator, vocab
    // from the dictionary write observation) -----------------------------
    step("manifest") {
      val cstats = loadStats(indexDir)
      writeManifest(spark, indexDir, cstats.num_docs, cstats.avgdl, sfDir,
        vocabOpt = loadVocab(indexDir),
        docCountsOpt = loadDocCounts(indexDir),
        clusterStatsOpt = Some(loadAllClusterStats(indexDir))
          .filter(_.nonEmpty),
        granuleWindow = cstats.granule_window,
        distanceName = graft.cluster.Distance.name(cfg.distance),
        coarseGraphOpt = graphF.map(f =>
          scala.concurrent.Await.result(
            f, scala.concurrent.duration.Duration.Inf)))
    }

    val manifest = ManifestIO.read(s"$indexDir/manifest.json")
    val totalMillis = (System.nanoTime() - t0) / 1000000L
    BuildResult(manifest, totalMillis,
      manifest.num_docs * 1000.0 / math.max(1L, totalMillis), run, skip,
      stepWin)
  }

  /** Marker + placement hints for the compaction fast path — see the
    * `preAssigned` parameter of [[buildFromSource]]. `transformFrom`
    * additionally routes the postings step through [[transformBlocks]]:
    * (source index dir, broadcast sorted tombstone array).
    */
  case class PreAssignedSource(
      granuleWeights: Seq[((Int, Long), Long)],
      transformFrom: Option[(String,
        org.apache.spark.broadcast.Broadcast[Array[Long]])] = None)

  /** The preAssigned docstore step: the source rows already carry dense
    * doc_id, cluster_id, doc_len, content_sha — so the step is exactly
    * ONE job: granule-slot exchange → local sort → partitioned write,
    * with the corpus stats observed on the write like the normal path.
    * The write observation's row count is REQUIRED to equal knownRows:
    * a wrong caller-side id shift cannot silently produce a plausible
    * index.
    */
  private def docstorePreAssigned(
      spark: SparkSession,
      source: DataFrame,
      indexDir: String,
      cfg: BuildConfig,
      centroids: Array[Array[Double]],
      knownRows: Long,
      pa: PreAssignedSource): Unit = {
    require(knownRows > 0, "preAssigned requires exact knownRows > 0")
    val kc = centroids.length
    saveCentroids(indexDir, centroids)
    val parts = spark.sessionState.conf.numShufflePartitions
    val window = granuleWindow(knownRows, parts)
    // weights carry over for later maintenance (exchange-path appends);
    // this write itself needs no slot placement — see below
    saveGranuleWeights(indexDir, pa.granuleWeights)
    val obs = Observation()
    val metrics =
      count(lit(1)).as("n") +: sum(col("doc_len")).as("sum_dl") +:
        min(col("doc_id")).as("min_id") +:
        (0 until kc).map(c =>
          sum(when(col("cluster_id") === c, 1L).otherwise(0L)).as(s"c$c"))
    // ZERO-exchange write (r7): the source IS the old docstore — its
    // files are cluster-partitioned and (cluster, doc)-sorted, the
    // tombstone filter preserves order, and the id shift is monotone,
    // so every read split is already a sorted run with doc ranges
    // disjoint across tasks (whole files, or pieces of one sorted
    // file). The local sort re-states the invariant for free on
    // already-sorted runs, and partitionBy(cluster_id) writes ~the same
    // file count the source had. Compaction therefore moves the content
    // bytes exactly ONCE — old files → new files — with no exchange
    // anywhere (the slot map stays saved for later appends). Stored
    // content_sha rides through unchanged (it is already materialized —
    // re-deriving it would cost n sha2 calls to save nothing).
    source
      .observe(obs, metrics.head, metrics.tail: _*)
      .sortWithinPartitions(col("cluster_id"), col("doc_id"))
      .select("doc_id", "repo", "path", "commit", "lang",
        "content", "cluster_id", "doc_len", "content_sha")
      .write.mode("overwrite")
      .options(cfg.docstoreWriteOptions)
      .partitionBy("cluster_id")
      .parquet(s"$indexDir/docstore")
    val m = obs.get
    val n = m("n").asInstanceOf[Long]
    require(n == knownRows,
      s"preAssigned row count $n != expected $knownRows: " +
        "the caller's id shift and the source disagree")
    require(m("min_id").asInstanceOf[Long] >= 0,
      "preAssigned ids must be dense non-negative")
    saveStats(indexDir,
      CorpusStats(n, m("sum_dl").asInstanceOf[Long], window))
    saveDocCounts(indexDir, (0 until kc)
      .map(c => c -> m(s"c$c").asInstanceOf[Long])
      .filter(_._2 > 0).toMap)
  }

  // centroids + segment metrics stashed as JSON between steps (part of
  // the checkpoint state a resumed build reloads)
  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(new com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  /** The B6 heart: docs → posting rows (one char-scan tokenize pass) →
    * ONE granule-hash shuffle on (cluster_id, doc_id div window) →
    * sorted runs per (cluster, granule, term) → delta+varint blocks with
    * idf-free g-max headers. Granule windows replace round 1's range
    * partitioner: same balance (window size bounds granule size), same
    * disjoint-doc-range blocks (a block never crosses its granule), but
    * NO partitioner sampling job — which re-ran the whole tokenize pass.
    * Per-segment and per-cluster lineage/metrics flow back via
    * accumulators (the manifest step then needs no postings scan).
    * `segmentOffset` keeps appended segments' ids distinct from the base
    * build's (Maintenance.append).
    */
  def encodeBlocks(
      spark: SparkSession,
      docs: DataFrame,
      avgdl: Double,
      segmentOffset: Int,
      window: Long,
      slots: Map[(Int, Long), Int] = Map.empty,
      exchange: Boolean = true):
      (org.apache.spark.sql.Dataset[PostingBlock],
      CollectionAccumulator[SegmentMeta], CollectionAccumulator[ClusterStat]) = {
    import spark.implicits._
    require(window >= 1, s"granule window must be >= 1, got $window")
    val acc: CollectionAccumulator[SegmentMeta] =
      spark.sparkContext.collectionAccumulator[SegmentMeta]("segments")
    val cacc: CollectionAccumulator[ClusterStat] =
      spark.sparkContext.collectionAccumulator[ClusterStat]("cluster-stats")
    val parts = spark.sessionState.conf.numShufflePartitions
    val w = window

    // With exchange=true, DOC rows move to their granule slot and the
    // tokenize/explode runs AFTER it, partition-locally: the shuffle
    // carries the text once (~3-5× fewer bytes than shuffling exploded
    // posting rows), and the (cluster, granule, term, doc) ordering is
    // restored by a LOCAL external sort — no second exchange.
    // With exchange=false (the build path, r3), even that shuffle is
    // gone: the input (granule-aligned docstore files) streams straight
    // into the local sort — block correctness never depended on the
    // placement, only on the local sort, since blocks group by
    // (cluster, granule, term) within each partition.
    val selected = docs
      .select(col("doc_id"), col("cluster_id"), col("content"),
        col("doc_len"))
    val routed =
      if (exchange) selected
        .withColumn("_slot", GranulePartitioner
          .slotKeyCol(slots, w, parts)(col("cluster_id"), col("doc_id")))
        .repartition(parts, col("_slot"))
        .drop("_slot")
      else selected
    val postingRows = routed
      .as[(Long, Int, String, Int)]
      .mapPartitions { docRows =>
        // per-term position grouping with REUSED structures: the
        // tokenize→group loop runs once per doc over the whole corpus,
        // and a fresh map + per-term growable buffers per doc cost
        // ~d small allocations × docs on exactly the resource (G1
        // allocation throughput) that does not scale with threads in a
        // shared JVM. One HashMap + a pool of int buffers serve every
        // doc of the partition; only the Posting rows and their
        // positions arrays (the actual output) are allocated. Emission
        // order per doc is irrelevant — the local sort below
        // canonicalizes on (cluster, granule, term, doc), unique per
        // posting.
        final class PosBuf {
          var a = new Array[Int](8)
          var n = 0
          def add(p: Int): Unit = {
            if (n == a.length) a = java.util.Arrays.copyOf(a, n << 1)
            a(n) = p; n += 1
          }
          def result(): Array[Int] = java.util.Arrays.copyOfRange(a, 0, n)
        }
        val byTerm = new java.util.HashMap[String, PosBuf]()
        val pool = new scala.collection.mutable.ArrayBuffer[PosBuf]()
        docRows.flatMap { case (docId, clusterId, content, dl) =>
          val toks = Tokenizer.tokenize(content)
          byTerm.clear()
          var used = 0
          var i = 0
          toks.foreach { t =>
            var b = byTerm.get(t)
            if (b == null) {
              if (used == pool.length) pool += new PosBuf
              b = pool(used)
              b.n = 0
              used += 1
              byTerm.put(t, b)
            }
            b.add(i)
            i += 1
          }
          // materialized eagerly: the pooled buffers are reused by the
          // NEXT doc, so the row iterator must not read them lazily
          val out = new Array[Posting](byTerm.size)
          var j = 0
          val it = byTerm.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val b = e.getValue
            out(j) = Posting(e.getKey, clusterId, docId, b.n, dl, b.result())
            j += 1
          }
          out.iterator
        }
      }
    val blocks = encodePostingRows(spark, postingRows, avgdl, segmentOffset,
      w, acc, cacc)
    (blocks, acc, cacc)
  }

  /** Sorted-run block encode over a Dataset of [[Posting]] rows — the
    * shared tail of [[encodeBlocks]] (tokenize source) and
    * [[transformBlocks]] (decode-shift source): partition-local sort on
    * (cluster, granule, term, doc) then streaming delta+varint encode
    * with per-segment/per-cluster metrics via the accumulators.
    */
  private def encodePostingRows(
      spark: SparkSession,
      postings: org.apache.spark.sql.Dataset[Posting],
      avgdl: Double,
      segmentOffset: Int,
      w: Long,
      acc: CollectionAccumulator[SegmentMeta],
      cacc: CollectionAccumulator[ClusterStat]):
      org.apache.spark.sql.Dataset[PostingBlock] = {
    import spark.implicits._
    postings
      .sortWithinPartitions(
        col("cluster_id"), expr(s"doc_id div $w"), col("term"), col("doc_id"))
      .select("term", "cluster_id", "doc_id", "tf", "dl", "positions")
      .as[(String, Int, Long, Int, Int, Array[Int])]
      .mapPartitions { rows =>
        val segId = TaskContext.getPartitionId() + segmentOffset
        val tStart = System.nanoTime()
        var nPostings = 0L
        var nBlocks = 0L
        var nBytes = 0L
        // per-cluster encode metrics (cluster → postings, blocks, bytes,
        // encode nanos) — the manifest's PartitionMeta without a scan
        val perCluster = scala.collection.mutable.LinkedHashMap
          .empty[Int, Array[Long]]
        val out = scala.collection.mutable.ArrayBuffer.empty[PostingBlock]
        var curKey: (Int, Long, String) = null // (cluster, granule, term)
        val buf = scala.collection.mutable.ArrayBuffer.empty[PostingEntry]
        def flush(): Unit = if (buf.nonEmpty) {
          val f0 = System.nanoTime()
          val bs = PostingCodec.encodeTerm(curKey._3, curKey._1, segId,
            buf.toSeq, (tf, dl) => Bm25.g(tf, dl, avgdl))
          val cs = perCluster.getOrElseUpdate(curKey._1, new Array[Long](4))
          bs.foreach { b =>
            out += b
            nBlocks += 1
            val sb = PostingCodec.storedBytes(b)
            nBytes += sb
            cs(1) += 1
            cs(2) += sb
          }
          nPostings += buf.size
          cs(0) += buf.size
          cs(3) += System.nanoTime() - f0
          buf.clear()
        }
        rows.foreach { case (term, cid, docId, tf, dl, pos) =>
          val key = (cid, docId / w, term)
          if (key != curKey) { flush(); curKey = key }
          buf += PostingEntry(docId, tf, dl, pos)
        }
        flush()
        val millis = math.max(1L, (System.nanoTime() - tStart) / 1000000L)
        if (nPostings > 0) acc.add(SegmentMeta(
          segId, nPostings, nBlocks, nBytes, millis,
          nPostings * 1000.0 / millis,
          nBytes.toDouble / nPostings))
        perCluster.foreach { case (cid, cs) =>
          cacc.add(ClusterStat(cid, cs(0), cs(1), cs(2),
            math.max(1L, cs(3) / 1000000L)))
        }
        out.iterator
      }
  }

  /** Compaction's postings path (r7): instead of re-tokenizing the
    * compacted corpus, DECODE the source index's existing blocks, drop
    * tombstoned entries, shift surviving doc ids (monotone, so decoded
    * ascending runs stay ascending and per-(cluster, term) doc ranges
    * stay disjoint across tasks), regroup by the NEW granule window and
    * re-encode under the refreshed avgdl — the same streaming
    * decode→encode shape as segment merge, with zero exchanges. At
    * scale this replaces a full content pass (tokenize over every
    * surviving document) with a pass over the compressed postings,
    * which are a fraction of the content bytes; correctness needs only
    * the decoded (doc, tf, dl, positions) tuples, all of which the
    * blocks store losslessly.
    */
  def transformBlocks(
      spark: SparkSession,
      oldBlocks: DataFrame,
      deadBc: org.apache.spark.broadcast.Broadcast[Array[Long]],
      avgdl: Double,
      segmentOffset: Int,
      window: Long):
      (org.apache.spark.sql.Dataset[PostingBlock],
      CollectionAccumulator[SegmentMeta], CollectionAccumulator[ClusterStat]) = {
    import spark.implicits._
    require(window >= 1, s"granule window must be >= 1, got $window")
    val acc: CollectionAccumulator[SegmentMeta] =
      spark.sparkContext.collectionAccumulator[SegmentMeta]("segments")
    val cacc: CollectionAccumulator[ClusterStat] =
      spark.sparkContext.collectionAccumulator[ClusterStat]("cluster-stats")
    val postingRows = oldBlocks
      .as[PostingBlock]
      .mapPartitions { it =>
        val dead = deadBc.value
        it.flatMap { b =>
          PostingCodec.decodeEntries(b).iterator.flatMap { e =>
            val nid = graft.functions.TombstoneShiftExpr.shift(dead, e.doc)
            if (nid < 0) Iterator.empty
            else Iterator.single(
              Posting(b.term, b.cluster_id, nid, e.tf, e.dl, e.positions))
          }
        }
      }
    val blocks = encodePostingRows(spark, postingRows, avgdl, segmentOffset,
      window, acc, cacc)
    (blocks, acc, cacc)
  }

  /** Dictionary = df/cf/idf aggregated from block metadata: each
    * (term, doc) posting lives in exactly one block, so df = Σ count and
    * cf = Σ tf_sum over a term's blocks. Scans only three tiny columns —
    * no content pass. Map-side partial aggregation already spreads
    * stop-word-heavy terms (each reducer key receives pre-combined
    * partials per task — the effect salting gives non-combinable aggs).
    * Also used by Maintenance.append to refresh idf after segment adds.
    */
  def writeDictionary(spark: SparkSession, indexDir: String, n: Long): Long = {
    val tmp = s"$indexDir/dictionary_tmp"
    val obs = Observation()
    // read-task sizing: the scan touches three tiny metadata columns of
    // the postings files; the session's fine-grained maxPartitionBytes
    // (tuned for content scans) fragments it into ~80 near-empty tasks
    // whose scheduling overhead dominates the sub-second aggregation
    val mpbKey = "spark.sql.files.maxPartitionBytes"
    val mpbPrev = spark.conf.get(mpbKey)
    val postingsBytes = org.apache.commons.io.FileUtils
      .sizeOfDirectory(new java.io.File(s"$indexDir/postings"))
    val parts = spark.sessionState.conf.numShufflePartitions
    spark.conf.set(mpbKey,
      math.max(4L << 20, postingsBytes / math.max(1, parts)).toString)
    try IndexSchemas.readPostings(spark, indexDir)
      .groupBy(col("term"))
      .agg(sum(col("count")).as("df"), sum(col("tf_sum")).as("cf"))
      .withColumn("idf", Bm25.idfCol(lit(n), col("df")))
      .observe(obs, count(lit(1)).as("vocab"))
      .write.mode("overwrite").parquet(tmp)
    finally spark.conf.set(mpbKey, mpbPrev)
    // swap: move the live dir ASIDE first, then the new one in, then
    // drop the aside copy — a crash mid-swap leaves a recoverable
    // dictionary_old instead of no dictionary at all [ADVICE r1]
    val target = Paths.get(s"$indexDir/dictionary")
    val aside = Paths.get(s"$indexDir/dictionary_old")
    org.apache.commons.io.FileUtils.deleteQuietly(aside.toFile)
    if (Files.exists(target)) Files.move(target, aside)
    Files.move(Paths.get(tmp), target)
    org.apache.commons.io.FileUtils.deleteQuietly(aside.toFile)
    val vocab = obs.get("vocab").asInstanceOf[Long]
    saveVocab(indexDir, vocab)
    vocab
  }

  /** Writes the manifest. The build path passes everything precomputed
    * (observations + accumulators ⇒ ZERO jobs); Maintenance callers omit
    * them and pay the recompute scans (non-critical paths).
    */
  def writeManifest(spark: SparkSession, indexDir: String,
      numDocs: Long, avgdl: Double, lineageName: String,
      vocabOpt: Option[Long] = None,
      docCountsOpt: Option[Map[Int, Long]] = None,
      clusterStatsOpt: Option[Map[Int, ClusterStat]] = None,
      granuleWindow: Long = 0L,
      distanceName: String = "sqeuclidean",
      coarseGraphOpt: Option[(Array[Array[Int]],
        Array[Array[Array[Int]]])] = None): Unit = {
    val vocab = vocabOpt.getOrElse(
      IndexSchemas.readDictionary(spark, indexDir).count())
    val centroids = loadCentroids(indexDir)
    // one graph build, both regimes (exact kNN edges below ExactKnnMax,
    // layered incremental insert above — level 0 + upper layers), under
    // the index's own coarse metric so the sub-linear probe works for
    // any Dc (the reference's HierarchicalNSW carries D the same way,
    // /root/reference/src/coarsequantizers.jl:59-60) [VERDICT r3].
    // The build path hands it in precomputed (overlapped with the
    // dictionary job); Maintenance callers pay it here.
    val coarseGraph = coarseGraphOpt.getOrElse(
      graft.cluster.GraphCoarseSearch.buildGraph(centroids,
        metric = graft.cluster.Distance.byName(distanceName)))
    val blockStats: Map[Int, ClusterStat] = clusterStatsOpt.getOrElse {
      IndexSchemas.readPostings(spark, indexDir)
        .groupBy("cluster_id")
        .agg(
          sum(col("count")).as("postings"),
          count(lit(1)).as("blocks"),
          sum(length(col("doc_gaps")) + length(col("tfs")) +
            length(col("dls")) + length(col("positions"))).as("bytes"))
        .collect()
        .map(r => r.getInt(0) ->
          ClusterStat(r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
            build_millis = 0L)).toMap
    }
    val docCounts = docCountsOpt.getOrElse {
      IndexSchemas.readDocstore(spark, indexDir)
        .groupBy("cluster_id").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    }

    val parts = docCounts.keys.toSeq.sorted.map { cid =>
      val cs = blockStats.getOrElse(cid, ClusterStat(cid, 0L, 0L, 0L, 0L))
      PartitionMeta(cid, docCounts(cid), cs.num_postings, cs.num_blocks,
        cs.bytes,
        build_millis = cs.build_millis,
        postings_per_sec =
          if (cs.build_millis > 0) cs.num_postings * 1000.0 / cs.build_millis
          else 0.0,
        bytes_per_posting =
          if (cs.num_postings > 0) cs.bytes.toDouble / cs.num_postings
          else 0.0)
    }

    val manifest = IndexManifest(
      version = FormatVersion,
      num_docs = numDocs,
      avgdl = avgdl,
      vocab_size = vocab,
      kc = centroids.length,
      feature_dim = CoarseClusterer.Dim,
      k1 = Bm25.K1,
      b = Bm25.B,
      round_scale = Bm25.Scale,
      distance = distanceName,
      granule_window = granuleWindow,
      centroids = centroids,
      coarse_graph = coarseGraph._1,
      coarse_graph_upper = coarseGraph._2,
      coarse_graph_metric = distanceName,
      lineage = InputLineage(lineageName, numDocs),
      partitions = parts,
      segments = loadSegments(indexDir))
    ManifestIO.write(s"$indexDir/manifest.json", manifest)
  }

  /** Corpus stats observed once on the docstore write job (exact Long
    * sum → deterministic avgdl) and reused by every later step.
    * `granule_window` fixes the (cluster, doc_id div W) granule scheme
    * for the whole index lifetime — appends reuse it so query-side
    * granule splits stay valid across segments.
    */
  case class CorpusStats(num_docs: Long, sum_dl: Long,
      granule_window: Long = 1L) {
    def avgdl: Double = sum_dl.toDouble / num_docs
  }

  private def saveStats(indexDir: String, s: CorpusStats): Unit = {
    val p = Paths.get(indexDir, "_checkpoints", "stats.json")
    Files.createDirectories(p.getParent)
    Files.write(p, mapper.writeValueAsBytes(s))
  }

  /** Maintenance hooks (segment merge refreshes these). */
  def saveStatsPublic(indexDir: String, s: CorpusStats): Unit =
    saveStats(indexDir, s)

  def replaceSegments(indexDir: String, segs: Seq[SegmentMeta]): Unit =
    saveSegments(indexDir, segs)

  def loadStats(indexDir: String): CorpusStats =
    mapper.readValue(
      Files.readAllBytes(Paths.get(indexDir, "_checkpoints", "stats.json")),
      classOf[CorpusStats])

  private def saveGranuleWeights(indexDir: String,
      w: Seq[((Int, Long), Long)]): Unit = {
    val p = Paths.get(indexDir, "_checkpoints", "granuleweights.json")
    Files.createDirectories(p.getParent)
    Files.write(p, mapper.writeValueAsBytes(
      w.sortBy(_._1).map { case ((c, win), n) => Array(c.toLong, win, n) }
        .toArray))
  }

  def loadGranuleWeights(indexDir: String): Seq[((Int, Long), Long)] = {
    val p = Paths.get(indexDir, "_checkpoints", "granuleweights.json")
    if (!Files.exists(p)) Seq.empty
    else mapper.readValue(Files.readAllBytes(p), classOf[Array[Array[Long]]])
      .map(a => (a(0).toInt, a(1)) -> a(2)).toSeq
  }

  private def saveDocCounts(indexDir: String, m: Map[Int, Long]): Unit = {
    val p = Paths.get(indexDir, "_checkpoints", "doccounts.json")
    Files.createDirectories(p.getParent)
    Files.write(p, mapper.writeValueAsBytes(
      m.toSeq.sortBy(_._1).map { case (k, v) => Array(k.toLong, v) }.toArray))
  }

  def loadDocCounts(indexDir: String): Option[Map[Int, Long]] = {
    val p = Paths.get(indexDir, "_checkpoints", "doccounts.json")
    if (!Files.exists(p)) None
    else Some(mapper.readValue(Files.readAllBytes(p),
      classOf[Array[Array[Long]]])
      .map(a => a(0).toInt -> a(1)).toMap)
  }

  private def saveVocab(indexDir: String, vocab: Long): Unit = {
    val p = Paths.get(indexDir, "_checkpoints", "vocab.json")
    Files.createDirectories(p.getParent)
    Files.write(p, mapper.writeValueAsBytes(vocab))
  }

  def loadVocab(indexDir: String): Option[Long] = {
    val p = Paths.get(indexDir, "_checkpoints", "vocab.json")
    if (!Files.exists(p)) None
    else Some(mapper.readValue(Files.readAllBytes(p), classOf[Long]))
  }

  /** Per-batch cluster encode stats (a rerun batch overwrites its own
    * file; clusters never span batches, so merging = concatenation).
    */
  private def saveClusterStats(indexDir: String, batch: Int,
      stats: Seq[ClusterStat]): Unit = {
    val p = Paths.get(indexDir, "_checkpoints", s"clusterstats_batch_$batch.json")
    Files.createDirectories(p.getParent)
    Files.write(p, mapper.writeValueAsBytes(stats.toArray))
  }

  def loadAllClusterStats(indexDir: String): Map[Int, ClusterStat] = {
    val dir = Paths.get(indexDir, "_checkpoints").toFile
    if (!dir.isDirectory) Map.empty
    else dir.listFiles()
      .filter(_.getName.startsWith("clusterstats_batch_"))
      .sortBy(_.getName)
      .flatMap(f => mapper.readValue(Files.readAllBytes(f.toPath),
        classOf[Array[ClusterStat]]))
      .groupBy(_.cluster_id)
      .map { case (cid, cs) =>
        cid -> ClusterStat(cid,
          cs.map(_.num_postings).sum, cs.map(_.num_blocks).sum,
          cs.map(_.bytes).sum, cs.map(_.build_millis).sum)
      }
  }

  private def saveCentroids(indexDir: String, c: Array[Array[Double]]): Unit = {
    val p = Paths.get(indexDir, "_checkpoints", "centroids.json")
    Files.createDirectories(p.getParent)
    Files.write(p, mapper.writeValueAsBytes(c))
  }

  def loadCentroids(indexDir: String): Array[Array[Double]] =
    mapper.readValue(
      Files.readAllBytes(Paths.get(indexDir, "_checkpoints", "centroids.json")),
      classOf[Array[Array[Double]]])

  private def saveSegments(indexDir: String, segs: Seq[SegmentMeta]): Unit = {
    val p = Paths.get(indexDir, "_checkpoints", "segments.json")
    Files.createDirectories(p.getParent)
    Files.write(p, mapper.writeValueAsBytes(segs.toArray))
  }

  /** Merge new segment metas into the checkpoint: a (re-)run batch
    * replaces its ENTIRE segment-id range [from, until). Public because
    * Maintenance.append records its mini-segments the same way.
    */
  def appendSegments(indexDir: String, segs: Seq[SegmentMeta],
      from: Int, until: Int): Unit = {
    val merged = (loadSegments(indexDir)
      .filterNot(s => s.segment_id >= from && s.segment_id < until)
      ++ segs).sortBy(_.segment_id)
    saveSegments(indexDir, merged)
  }

  private def loadSegments(indexDir: String): Seq[SegmentMeta] = {
    val p = Paths.get(indexDir, "_checkpoints", "segments.json")
    if (!Files.exists(p)) Seq.empty
    else mapper.readValue(Files.readAllBytes(p),
      classOf[Array[SegmentMeta]]).toSeq
  }
}
