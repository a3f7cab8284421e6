package graft.build

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
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
  *   ONE shuffle: repartitionByRange(cluster_id, doc_id) →
  *   sortWithinPartitions(cluster_id, term, doc_id) →
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

  case class BuildConfig(
      kc: Int = 0, // 0 = auto (CoarseClusterer.pickKc)
      resume: Boolean = true,
      amplify: Int = 1, // bench-only deterministic corpus blow-up
      postingsBatches: Int = 2, // per-partition resume granularity (tests use 4)
      validateInput: Boolean = false) // B2-style key-uniqueness check (one extra job)

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
      stepsSkipped: Seq[String])

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
      cfg: BuildConfig = BuildConfig()): BuildResult =
    buildFromSource(spark,
      Corpus.sourceTable(spark, sfDir, cfg.amplify), indexDir, cfg,
      lineageName = sfDir)

  /** Build from any F1-shaped source DataFrame; `idOrder` defines the
    * dense docID order (compaction passes the old id).
    */
  def buildFromSource(
      spark: SparkSession,
      source: DataFrame,
      indexDir: String,
      cfg: BuildConfig = BuildConfig(),
      idOrder: Seq[String] = Seq("repo", "path", "commit"),
      lineageName: String = "<dataframe>"): BuildResult = {
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
    var run = Vector.empty[String]
    var skip = Vector.empty[String]

    def step[T](name: String)(body: => T): Unit =
      if (cfg.resume && isDone(indexDir, name)) { skip :+= name }
      else {
        val t = System.nanoTime()
        body
        markDone(indexDir, name, s"input=$sfDir")
        System.err.println(
          f"[build] step $name%-10s ${(System.nanoTime() - t) / 1e9}%.2fs")
        run :+= name
      }

    // ---- step 1: docstore (docs + kmeans cluster assignment) ----------
    step("docstore") {
      val docs = CoarseClusterer.withFeatures(
        Corpus.docsFrom(source, idOrder))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // ONE stats job: count + exact doc-length sum (Long — order
      // independent), stashed for later steps (no recomputation).
      val statsRow = docs
        .agg(count(lit(1)), sum(col("doc_len"))).head()
      val n = statsRow.getLong(0)
      val sumDl = statsRow.getLong(1)
      saveStats(indexDir, CorpusStats(n, sumDl))
      val kc = if (cfg.kc > 0) cfg.kc else CoarseClusterer.pickKc(n)
      // kmeans fits driver-locally on a deterministic doc_id-strided
      // sample (at real scale you never run Lloyd's over the full
      // corpus); assignment below still covers every doc. The sample is
      // capped at 10k: the fit is a SERIAL driver cost, and a
      // partitioning signal does not improve past that.
      val fitStep = math.max(1L, n / 10000)
      val sample = docs
        .filter(col("doc_id") % fitStep === 0)
        .select("doc_id", "feat")
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
        .sortBy(_._1)
      val centroids = CoarseClusterer.fitLocal(sample, kc)
      saveCentroids(indexDir, centroids)
      // range-partition before the partitionBy write: each task then
      // holds a contiguous (cluster_id, doc_id) slice and writes O(1)
      // files per cluster instead of tasks × clusters small files.
      CoarseClusterer.withClusterId(docs, centroids)
        .repartitionByRange(col("cluster_id"), col("doc_id"))
        .write.mode("overwrite")
        .partitionBy("cluster_id")
        .parquet(s"$indexDir/docstore")
      docs.unpersist()
    }

    def docstore = spark.read.parquet(s"$indexDir/docstore")

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
      val avgdl = loadStats(indexDir).avgdl
      val kc = loadCentroids(indexDir).length
      val batches = clusterBatches(kc, cfg.postingsBatches)
      if (!cfg.resume) {
        // fresh build: wipe all posting partitions + batch markers (a
        // reused dir may hold state from a different kc)
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"$indexDir/postings"))
        val ck = new java.io.File(s"$indexDir/_checkpoints")
        if (ck.isDirectory) ck.listFiles()
          .filter(_.getName.startsWith("postings_batch_"))
          .foreach(_.delete())
        saveSegments(indexDir, Seq.empty)
      }
      var segOffset = 0
      batches.zipWithIndex.foreach { case (clusters, bi) =>
        val marker = s"postings_batch_$bi"
        if (cfg.resume && isDone(indexDir, marker)) {
          skip :+= marker
          segOffset += 10000 // keep segment ids disjoint across batches
        } else {
          // wipe partial output of this batch (idempotent restart)
          clusters.foreach { cid =>
            org.apache.commons.io.FileUtils.deleteQuietly(
              new java.io.File(s"$indexDir/postings/cluster_id=$cid"))
          }
          val slice = docstore
            .filter(col("cluster_id").isin(clusters: _*))
          val (blocks, acc) = encodeBlocks(spark, slice, avgdl, segOffset)
          blocks.write.mode("append")
            .partitionBy("cluster_id")
            .parquet(s"$indexDir/postings")
          val segs = {
            import scala.jdk.CollectionConverters._
            acc.value.asScala.toSeq.sortBy(_.segment_id)
          }
          appendSegments(indexDir, segs, segOffset, segOffset + 10000)
          markDone(indexDir, marker,
            s"input=$sfDir clusters=${clusters.mkString(",")}")
          run :+= marker
          segOffset += 10000
        }
      }
    }

    // ---- step 3: dictionary (df/cf/idf from block metadata) ------------
    step("dictionary") {
      writeDictionary(spark, indexDir, loadStats(indexDir).num_docs)
    }

    // ---- step 4: manifest ----------------------------------------------
    step("manifest") {
      val cstats = loadStats(indexDir)
      writeManifest(spark, indexDir, cstats.num_docs, cstats.avgdl, sfDir)
    }

    val manifest = ManifestIO.read(s"$indexDir/manifest.json")
    val totalMillis = (System.nanoTime() - t0) / 1000000L
    BuildResult(manifest, totalMillis,
      manifest.num_docs * 1000.0 / math.max(1L, totalMillis), run, skip)
  }

  // centroids + segment metrics stashed as JSON between steps (part of
  // the checkpoint state a resumed build reloads)
  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(new com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  /** The B6 heart: docs → posting rows (one char-scan tokenize pass) →
    * ONE range shuffle on (cluster_id, doc_id) → sorted runs per
    * (cluster, term) → delta+varint blocks with idf-free g-max headers.
    * Per-segment lineage/metrics flow back via an accumulator.
    * `segmentOffset` keeps appended segments' ids distinct from the base
    * build's (Maintenance.append).
    */
  def encodeBlocks(
      spark: SparkSession,
      docs: DataFrame,
      avgdl: Double,
      segmentOffset: Int): (org.apache.spark.sql.Dataset[PostingBlock],
      CollectionAccumulator[SegmentMeta]) = {
    import spark.implicits._
    val postings = docs
      .select("doc_id", "cluster_id", "content", "doc_len")
      .as[(Long, Int, String, Int)]
      .flatMap { case (docId, clusterId, content, dl) =>
        val toks = Tokenizer.tokenize(content)
        val byTerm = scala.collection.mutable.LinkedHashMap
          .empty[String, scala.collection.mutable.ArrayBuffer[Int]]
        var i = 0
        toks.foreach { t =>
          byTerm.getOrElseUpdate(t,
            scala.collection.mutable.ArrayBuffer.empty[Int]) += i
          i += 1
        }
        byTerm.iterator.map { case (t, ps) =>
          Posting(t, clusterId, docId, ps.length, dl, ps.toArray)
        }
      }

    val acc: CollectionAccumulator[SegmentMeta] =
      spark.sparkContext.collectionAccumulator[SegmentMeta]("segments")

    val blocks = postings
      .repartitionByRange(col("cluster_id"), col("doc_id"))
      .sortWithinPartitions(col("cluster_id"), col("term"), col("doc_id"))
      .select("term", "cluster_id", "doc_id", "tf", "dl", "positions")
      .as[(String, Int, Long, Int, Int, Array[Int])]
      .mapPartitions { rows =>
        val segId = TaskContext.getPartitionId() + segmentOffset
        val tStart = System.nanoTime()
        var nPostings = 0L
        var nBlocks = 0L
        var nBytes = 0L
        val out = scala.collection.mutable.ArrayBuffer.empty[PostingBlock]
        var curKey: (Int, String) = null
        val buf = scala.collection.mutable.ArrayBuffer.empty[PostingEntry]
        def flush(): Unit = if (buf.nonEmpty) {
          val bs = PostingCodec.encodeTerm(curKey._2, curKey._1, segId,
            buf.toSeq, (tf, dl) => Bm25.g(tf, dl, avgdl))
          bs.foreach { b =>
            out += b
            nBlocks += 1
            nBytes += PostingCodec.storedBytes(b)
          }
          nPostings += buf.size
          buf.clear()
        }
        rows.foreach { case (term, cid, docId, tf, dl, pos) =>
          val key = (cid, term)
          if (key != curKey) { flush(); curKey = key }
          buf += PostingEntry(docId, tf, dl, pos)
        }
        flush()
        val millis = math.max(1L, (System.nanoTime() - tStart) / 1000000L)
        if (nPostings > 0) acc.add(SegmentMeta(
          segId, nPostings, nBlocks, nBytes, millis,
          nPostings * 1000.0 / millis,
          nBytes.toDouble / nPostings))
        out.iterator
      }
    (blocks, acc)
  }

  /** Dictionary = df/cf/idf aggregated from block metadata: each
    * (term, doc) posting lives in exactly one block, so df = Σ count and
    * cf = Σ tf_sum over a term's blocks. Scans only three tiny columns —
    * no content pass. Map-side partial aggregation already spreads
    * stop-word-heavy terms (each reducer key receives pre-combined
    * partials per task — the effect salting gives non-combinable aggs).
    * Also used by Maintenance.append to refresh idf after segment adds.
    */
  def writeDictionary(spark: SparkSession, indexDir: String, n: Long): Unit = {
    val tmp = s"$indexDir/dictionary_tmp"
    spark.read.parquet(s"$indexDir/postings")
      .groupBy(col("term"))
      .agg(sum(col("count")).as("df"), sum(col("tf_sum")).as("cf"))
      .withColumn("idf", Bm25.idfCol(lit(n), col("df")))
      .write.mode("overwrite").parquet(tmp)
    val target = Paths.get(s"$indexDir/dictionary")
    org.apache.commons.io.FileUtils.deleteQuietly(target.toFile)
    Files.move(Paths.get(tmp), target)
  }

  /** Recomputes per-partition stats and writes the manifest. Also used
    * by Maintenance after appends.
    */
  def writeManifest(spark: SparkSession, indexDir: String,
      numDocs: Long, avgdl: Double, lineageName: String): Unit = {
    val vocab = spark.read.parquet(s"$indexDir/dictionary").count()
    val centroids = loadCentroids(indexDir)
    val blockStats = spark.read.parquet(s"$indexDir/postings")
      .groupBy("cluster_id")
      .agg(
        sum(col("count")).as("postings"),
        count(lit(1)).as("blocks"),
        sum(length(col("doc_gaps")) + length(col("tfs")) +
          length(col("dls")) + length(col("positions"))).as("bytes"))
      .collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docCounts = spark.read.parquet(s"$indexDir/docstore")
      .groupBy("cluster_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

    val parts = docCounts.keys.toSeq.sorted.map { cid =>
      val (p, b, by) = blockStats.getOrElse(cid, (0L, 0L, 0L))
      PartitionMeta(cid, docCounts(cid), p, b, by,
        build_millis = 0L,
        postings_per_sec = 0.0,
        bytes_per_posting = if (p > 0) by.toDouble / p else 0.0)
    }

    val manifest = IndexManifest(
      version = 1,
      num_docs = numDocs,
      avgdl = avgdl,
      vocab_size = vocab,
      kc = centroids.length,
      feature_dim = CoarseClusterer.Dim,
      k1 = Bm25.K1,
      b = Bm25.B,
      round_scale = Bm25.Scale,
      centroids = centroids,
      lineage = InputLineage(lineageName, numDocs),
      partitions = parts,
      segments = loadSegments(indexDir))
    ManifestIO.write(s"$indexDir/manifest.json", manifest)
  }

  /** Corpus stats computed once in the docstore step (exact Long sum →
    * deterministic avgdl) and reused by every later step.
    */
  case class CorpusStats(num_docs: Long, sum_dl: Long) {
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
    * replaces its ENTIRE segment-id range [from, until).
    */
  private def appendSegments(indexDir: String, segs: Seq[SegmentMeta],
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
