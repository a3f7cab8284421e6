package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.build.ManifestIO
import graft.codec.PostingCodec
import graft.model.PhraseBlock

/** Exact phrase search over the index's position payloads — the operator
  * that justifies storing `positions` in the posting blocks (north_star:
  * postings carry (docID, tf, positions)). Counts adjacency runs:
  * a phrase [t0, t1, ..., tm] occurs at p iff t_i has position p+i for
  * all i.
  *
  * Same physical shape as the WAND scorer: partition-pruned block scan →
  * repartition(cluster_id) → per-cluster decode (docs + positions) →
  * merge-intersect the phrase terms' doc lists → position adjacency
  * count. One shuffle, partition-local work, tiny output.
  */
object PhraseSearch {

  /** (doc_id, occurrences) for docs containing the exact phrase,
    * ordered by (occurrences desc, doc_id asc).
    */
  def search(
      spark: SparkSession,
      indexDir: String,
      phrase: Seq[String]): DataFrame = {
    import spark.implicits._
    require(phrase.size >= 2, "phrase needs >= 2 terms")
    val manifest = ManifestIO.read(s"$indexDir/manifest.json")
    val terms = phrase.distinct
    val phraseBc = spark.sparkContext.broadcast(phrase.toArray)
    val tombstones = spark.sparkContext.broadcast(
      graft.maintain.Maintenance.loadTombstones(indexDir))

    // projection: positions but no tfs/dls/block_max (column pruning)
    val blocks = spark.read
      .parquet(s"$indexDir/postings")
      .filter(col("term").isin(terms: _*))
      .select("term", "cluster_id", "first_doc", "count", "doc_gaps",
        "positions")
      .as[PhraseBlock]

    blocks
      .repartition(col("cluster_id"))
      .mapPartitions { it =>
        val ph = phraseBc.value
        val dead = tombstones.value
        val byClusterTerm = it.toSeq.groupBy(b => (b.cluster_id, b.term))
        val decoded: Map[(Int, String), (Array[Long], Array[Array[Int]])] =
          byClusterTerm.map { case (key, bs) =>
            val sorted = bs.sortBy(_.first_doc)
            val docs = sorted.flatMap(b =>
              PostingCodec.decodeDocs(b.count, b.first_doc, b.doc_gaps))
              .toArray
            val pos = sorted.flatMap(b =>
              PostingCodec.decodePositionsRaw(b.count, b.positions)).toArray
            key -> (docs, pos)
          }
        val clusters = decoded.keySet.map(_._1)
        clusters.iterator.flatMap { cid =>
          val lists = ph.map(t => decoded.get((cid, t)))
          if (lists.exists(_.isEmpty)) Iterator.empty
          else {
            val ls = lists.map(_.get)
            // intersect doc lists via the rarest term's list
            val (baseDocs, _) = ls.minBy(_._1.length)
            baseDocs.iterator
              .filterNot(dead.contains)
              .flatMap { d =>
                // per-term position set for doc d (binary search)
                val posSets = ls.map { case (docs, pos) =>
                  val i = java.util.Arrays.binarySearch(docs, d)
                  if (i < 0) null else pos(i)
                }
                if (posSets.contains(null)) Iterator.empty
                else {
                  val first = posSets(0)
                  val rest = posSets.tail.map(_.toSet)
                  val occ = first.count(p =>
                    rest.zipWithIndex.forall { case (s, i) => s.contains(p + i + 1) })
                  if (occ > 0) Iterator.single((d, occ.toLong))
                  else Iterator.empty
                }
              }
          }
        }
      }
      .toDF("doc_id", "occurrences")
      .orderBy(col("occurrences").desc, col("doc_id").asc)
  }

  /** DuckDB oracle: adjacency self-joins over token positions. */
  def oracleSql(phrase: Seq[String]): String = {
    val toks = graft.tokenize.Tokenizer.sqlTokensExpr("content")
    val joins = phrase.zipWithIndex.tail.map { case (_, i) =>
      s"JOIN tok t$i ON t$i.doc_id = t0.doc_id AND t$i.pos = t0.pos + $i"
    }.mkString("\n       |  ")
    val preds = phrase.zipWithIndex
      .map { case (t, i) => s"t$i.term = '$t'" }.mkString(" AND ")
    s"""WITH ${graft.sources.Corpus.sqlDocsCtes},
       |tok AS (
       |  SELECT doc_id, unnest($toks) AS term,
       |         generate_subscripts($toks, 1) AS pos
       |  FROM docs)
       |SELECT t0.doc_id, count(*) AS occurrences
       |FROM tok t0
       |  $joins
       |WHERE $preds
       |GROUP BY 1 ORDER BY occurrences DESC, t0.doc_id""".stripMargin
  }
}
