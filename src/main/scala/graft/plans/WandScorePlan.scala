package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, GenericInternalRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.model.ScorerBlock
import graft.query.Wand

/** The block-max WAND scorer as a FIRST-CLASS Catalyst operator —
  * SURVEY.md §7.3's "custom SparkPlan" tier: instead of an opaque
  * `mapPartitions`, the scorer is a logical node planned by
  * [[WandStrategy]] into [[WandScoreExec]], which DECLARES its
  * distribution and ordering requirements so Spark's EnsureRequirements
  * inserts the (cluster_id, _split) exchange and the
  * (cluster, split, term, first_doc) local sort — and `EXPLAIN` shows
  * `WandScoreExec` with its child exchange instead of a generic
  * DeserializeToObject/MapPartitions sandwich. Execution semantics are
  * identical to the round-1 scorer (same golden/rank-identity suites).
  */

/** Driver-computed query context captured by the operator (small:
  * parsed queries, idf of the query terms, tombstones, BM25 stats).
  */
case class WandMeta(
    queries: Seq[(Int, Array[(String, Int)], Set[Int])], // (qid, (term,qtf)*, probed)
    idf: Map[String, Double],
    tombstones: Set[Long],
    avgdl: Double,
    window: Long,
    splits: Int,
    k: Int) extends Serializable

/** Logical: score `child` (a ScorerBlock relation + `_split` column)
  * into (query_id, doc_id, score) local hits.
  */
case class WandScore(
    meta: WandMeta,
    output: Seq[Attribute],
    child: LogicalPlan) extends UnaryNode {
  // output attrs live in the constructor so `copy`/withNewChild keep
  // their exprIds STABLE across analyzer/optimizer rewrites (parents
  // reference them by id); the companion mints fresh ids per scorer
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  override protected def withNewChildInternal(newChild: LogicalPlan): WandScore =
    copy(child = newChild)
}

object WandScore {
  def apply(meta: WandMeta, child: LogicalPlan): WandScore =
    WandScore(meta, Seq(
      AttributeReference("query_id", IntegerType, nullable = false)(),
      AttributeReference("doc_id", LongType, nullable = false)(),
      AttributeReference("score", DoubleType, nullable = false)()), child)
}

object WandStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case ws: WandScore =>
      WandScoreExec(ws.meta, ws.output, planLater(ws.child)) :: Nil
    case _ => Nil
  }

  /** Idempotent per-session registration (experimental.extraStrategies —
    * the public extension point; cf. SNIPPETS.md [1]).
    */
  def setup(spark: SparkSession): Unit =
    org.apache.spark.sql.GraftColumnBridge.addStrategy(spark, this)
}

case class WandScoreExec(
    meta: WandMeta,
    output: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  private def childAttr(name: String): Attribute =
    child.output.find(_.name == name).getOrElse(
      throw new IllegalStateException(s"WandScoreExec child lacks $name"))

  /** Each (cluster, split) group must be co-located… */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(
      Seq(childAttr("cluster_id"), childAttr("_split"))) :: Nil

  /** …and sorted so the scorer can STREAM one group at a time. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq("cluster_id", "_split", "term", "first_doc")
      .map(n => SortOrder(childAttr(n), Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val out = child.output
    def ord(n: String): Int = out.indexWhere(_.name == n)
    val (iTerm, iCluster, iFirst, iLast, iCount, iMax, iGaps, iTfs, iDls) =
      (ord("term"), ord("cluster_id"), ord("first_doc"), ord("last_doc"),
        ord("count"), ord("block_max"), ord("doc_gaps"), ord("tfs"),
        ord("dls"))
    val m = meta
    child.execute().mapPartitions { rows =>
      val proj = UnsafeProjection.create(
        Array[org.apache.spark.sql.types.DataType](
          IntegerType, LongType, DoubleType))
      // decode to ScorerBlock (copies: the child reuses its UnsafeRow)
      val blocks = rows.map { r =>
        ScorerBlock(
          term = r.getUTF8String(iTerm).toString,
          cluster_id = r.getInt(iCluster),
          first_doc = r.getLong(iFirst),
          last_doc = r.getLong(iLast),
          count = r.getInt(iCount),
          block_max = r.getDouble(iMax),
          doc_gaps = r.getBinary(iGaps),
          tfs = r.getBinary(iTfs),
          dls = r.getBinary(iDls))
      }.buffered
      def groupKey(b: ScorerBlock): (Int, Long) =
        (b.cluster_id, (b.first_doc / m.window) % m.splits)
      // stream one (cluster, split) group at a time — retained heap is
      // one group's COMPRESSED blocks; cursors decode lazily
      new Iterator[Iterator[(Int, Long, Double)]] {
        def hasNext: Boolean = blocks.hasNext
        def next(): Iterator[(Int, Long, Double)] = {
          val key = groupKey(blocks.head)
          val cid = key._1
          val byTerm = scala.collection.mutable.LinkedHashMap
            .empty[String, scala.collection.mutable.ArrayBuffer[ScorerBlock]]
          while (blocks.hasNext && groupKey(blocks.head) == key) {
            val b = blocks.next()
            byTerm.getOrElseUpdate(b.term,
              scala.collection.mutable.ArrayBuffer.empty) += b
          }
          val cursors = byTerm.map { case (t, bs) =>
            t -> new Wand.LazyBlockList(
              bs.toArray, 1.0, m.idf.getOrElse(t, 0.0), m.avgdl)
          }
          m.queries.iterator
            .filter(_._3.contains(cid))
            .flatMap { case (qid, terms, _) =>
              val lists: Array[Wand.PostingCursor] =
                terms.flatMap { case (t, qtf) =>
                  cursors.get(t).map { c =>
                    if (qtf == 1) c: Wand.PostingCursor
                    else new Wand.WeightedCursor(c, qtf.toDouble)
                  }
                }
              Wand.topK(lists, m.k, m.tombstones.contains)
                .map(h => (qid, h.docId, h.score))
            }
        }
      }.flatten.map { case (qid, docId, score) =>
        proj(new GenericInternalRow(
          Array[Any](qid, docId, score))): InternalRow
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): WandScoreExec =
    copy(child = newChild)
}
