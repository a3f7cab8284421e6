package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Open-addressing Long → Long hash map (linear probing, power-of-2
  * capacity, ~0.5 load factor), the broadcastable payload of the
  * dense-id lookup (Corpus.withDenseIdCounted broadcast strategy).
  * Values must be >= 0 (dense doc ids): a negative value slot encodes
  * "empty", so no separate presence bitmap is needed. ~32 B per entry
  * at the default load factor.
  */
final class LongLongMap(expectedSize: Long) extends Serializable {
  private val capacity: Int = {
    var c = 64
    // <= 2^30 slots (the array cap); callers bound expectedSize well below
    while (c < expectedSize * 2 && c < (1 << 30)) c <<= 1
    c
  }
  private val mask = capacity - 1
  private val keys = new Array[Long](capacity)
  private val vals = Array.fill(capacity)(-1L)
  private var n = 0L

  def size: Long = n

  /** Avalanche mixer (murmur3 fmix64): xxhash64 outputs are already
    * well spread; this is cheap insurance for the linear probe.
    */
  @inline private def mix(h0: Long): Int = {
    var h = h0
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    (h & mask).toInt
  }

  /** Inserts; returns false on a key collision (the key is already
    * present) — the caller's signal that two rows hashed identically
    * and the exact lookup strategy must be abandoned.
    */
  def put(key: Long, value: Long): Boolean = {
    require(value >= 0, "values must be >= 0")
    require(n < capacity / 2 + 1, s"map over target load: $n/$capacity")
    var i = mix(key)
    while (vals(i) >= 0) {
      if (keys(i) == key) return false
      i = (i + 1) & mask
    }
    keys(i) = key
    vals(i) = value
    n += 1
    true
  }

  /** Value for `key`, or -1 when absent. */
  def get(key: Long): Long = {
    var i = mix(key)
    while (vals(i) >= 0) {
      if (keys(i) == key) return vals(i)
      i = (i + 1) & mask
    }
    -1L
  }
}

/** `bc.value.get(childHash)` as a codegen'd unary expression — the
  * per-row side of the broadcast dense-id strategy: the driver computed
  * the exact (key hash → dense id) map from a keys-only pass; this
  * expression attaches ids to full content rows WITHOUT ever exchanging
  * them.
  *
  * TOTALITY: a key absent from the map returns [[IdLookupExpr.Missing]]
  * (-1), never throws. The optimizer is free to evaluate a pushed-down
  * predicate containing this expression on rows OUTSIDE the id'd frame
  * — e.g. `InferFiltersFromConstraints` propagates a filter on the id
  * through an equi-join condition onto the OTHER side (observed: the
  * kmeans-sample filter inferred onto the tombstone anti-join's dead-id
  * LocalRelation, where Catalyst constant-folds it at optimization
  * time). Those rows can never reach the frame's output (the map covers
  * exactly its rows; anything else is eliminated by the very operators
  * the predicate was inferred across), so any consistent sentinel is
  * semantically safe — and -1 can never collide with a real dense id
  * (ids are >= 0). Consumers that must notice a genuinely
  * non-deterministic source (different keys between the two passes)
  * validate min(id) >= 0 on their output instead
  * (IndexBuilder's docstore write observation).
  */
case class IdLookupExpr(child: Expression, bc: Broadcast[LongLongMap])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override protected def nullSafeEval(input: Any): Any =
    IdLookupExpr.lookup(bc.value, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("idMapBc", bc,
      classOf[Broadcast[LongLongMap]].getName)
    val mapTerm = ctx.addMutableState(
      classOf[LongLongMap].getName, "idMap",
      v => s"$v = (${classOf[LongLongMap].getName}) $bcRef.value();")
    val h = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${h.code}
        final long ${ev.value} =
          graft.functions.IdLookupExpr.lookup($mapTerm, ${h.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IdLookupExpr {

  /** Sentinel for a key outside the map (see TOTALITY above). */
  val Missing = -1L

  /** Shared by interpreted eval and generated code. */
  def lookup(m: LongLongMap, h: Long): Long = m.get(h)

  def col(hash: Column, bc: Broadcast[LongLongMap]): Column =
    GraftColumnBridge.column(
      IdLookupExpr(GraftColumnBridge.expression(hash), bc))
}
