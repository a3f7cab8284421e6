package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.build.ManifestIO
import graft.cluster.CoarseClusterer
import graft.model.ScorerBlock

/** Index-backed top-k BM25 — entry point 2 of the reference
  * (`knn_search`, /root/reference/src/index.jl:204-258) re-expressed as
  * the graft lifecycle (SURVEY.md §3.2):
  *
  *   query terms → idf lookup (dictionary scan pruned to the terms) →
  *   probed clusters (driver argsort over manifest centroids — Q2) →
  *   postings scan with PARTITION PRUNING on cluster_id + predicate
  *   pushdown on term → one repartition(cluster_id) so each task owns
  *   whole clusters → block-max WAND `mapPartitions` scorer with local
  *   bounded top-k (Q6/Q7) → global TakeOrderedAndProject-style merge.
  *
  * Batch queries (Q8) run in the SAME job: each cluster's term lists are
  * decoded once and reused across all queries probing that cluster —
  * where Spark beats the reference's sequential query loop
  * (/root/reference/src/index.jl:261-273).
  *
  * `w` is the probe width of the reference (`knn_search(..., w)`,
  * /root/reference/src/index.jl:207): w >= kc probes everything (exact
  * BM25, rank-identical to the SQL path and DuckDB); w < kc prunes to
  * the w nearest clusters by centroid distance (approximate, like the
  * reference's default w=1).
  */
object IndexSearcher {

  /** Query-side view of one parsed query. */
  private case class QuerySpec(
      qid: Int,
      terms: Array[(String, Int)], // (term, qtf)
      probed: Set[Int]) // cluster ids this query scans

  def topK(
      spark: SparkSession,
      indexDir: String,
      queries: Seq[(Int, Seq[String])],
      k: Int,
      w: Int = Int.MaxValue): DataFrame = {
    import spark.implicits._

    val manifest = ManifestIO.read(s"$indexDir/manifest.json")
    val kc = manifest.kc
    val centroids = manifest.centroids

    val parsed = queries.map { case (qid, terms) =>
      val withQtf = terms.groupBy(identity).toArray
        .map { case (t, occ) => (t, occ.length) }
        .sortBy(_._1)
      val probed: Set[Int] =
        if (w >= kc) (0 until kc).toSet
        else {
          // Q2 coarse search: distance of the query's term-vector to each
          // centroid, take top-w (ties toward lower cluster id — matches
          // the reference's stable sortperm).
          val feat = CoarseClusterer
            .features(terms)
            .map(_.toDouble)
          CoarseClusterer.distances(feat, centroids)
            .zipWithIndex
            .sortBy { case (d, c) => (d, c) }
            .take(w)
            .map(_._2)
            .toSet
        }
      QuerySpec(qid, withQtf, probed)
    }

    val allTerms = parsed.flatMap(_.terms.map(_._1)).distinct
    val allClusters = parsed.flatMap(_.probed).toSet.toSeq.sorted

    // dictionary idf for the query terms (predicate pushdown on term)
    val idfMap: Map[String, Double] = spark.read
      .parquet(s"$indexDir/dictionary")
      .filter(col("term").isin(allTerms: _*))
      .select("term", "idf")
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap

    val queriesBc = spark.sparkContext.broadcast(parsed)
    val idfBc = spark.sparkContext.broadcast(idfMap)
    val tombstonesBc = spark.sparkContext.broadcast(
      graft.maintain.Maintenance.loadTombstones(indexDir))
    val avgdl = manifest.avgdl
    val kLocal = k

    // Postings scan: cluster_id is the partition column (partition
    // pruning), term is a sorted data column (row-group + dictionary
    // pushdown). One shuffle co-locates each cluster's blocks.
    // explicit projection → Parquet column pruning drops the positions
    // payload (the heaviest column) from the scan entirely
    val blocks = spark.read
      .parquet(s"$indexDir/postings")
      .filter(col("cluster_id").isin(allClusters: _*) &&
        col("term").isin(allTerms: _*))
      .select("term", "cluster_id", "first_doc", "last_doc", "count",
        "block_max", "doc_gaps", "tfs", "dls")
      .as[ScorerBlock]

    val localHits = blocks
      .repartition(col("cluster_id"))
      .mapPartitions { it =>
        val qs = queriesBc.value
        val idf = idfBc.value
        // group this task's blocks by (cluster, term); runs from
        // different segments cover disjoint doc ranges (range
        // partitioning at build), so sorting by first_doc yields a
        // globally sorted list. Blocks stay COMPRESSED until the WAND
        // cursor actually touches them (LazyBlockList) — skipping saves
        // decompression, not just arithmetic.
        val byClusterTerm = it.toSeq.groupBy(b => (b.cluster_id, b.term))
        val cursors: Map[(Int, String), Wand.LazyBlockList] =
          byClusterTerm.map { case (key, bs) =>
            val sorted = bs.sortBy(_.first_doc).toArray
            key -> new Wand.LazyBlockList(
              sorted, 1.0, idf.getOrElse(key._2, 0.0), avgdl)
          }
        val clustersHere = cursors.keySet.map(_._1)
        clustersHere.iterator.flatMap { cid =>
          qs.iterator
            .filter(_.probed.contains(cid))
            .flatMap { q =>
              val lists: Array[Wand.PostingCursor] =
                q.terms.flatMap { case (t, qtf) =>
                  cursors.get((cid, t)).map { c =>
                    if (qtf == 1) c: Wand.PostingCursor
                    else new Wand.WeightedCursor(c, qtf.toDouble)
                  }
                }
              Wand.topK(lists, kLocal, tombstonesBc.value.contains)
                .map(h => (q.qid, h.docId, h.score))
            }
        }
      }
      .toDF("query_id", "doc_id", "score")

    val win = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    localHits
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "score")
      .orderBy("query_id", "rank")
  }
}
