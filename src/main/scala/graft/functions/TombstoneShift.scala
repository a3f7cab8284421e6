package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** The reference's delete-time id shift
  * (/root/reference/src/utils.jl:16-20: every id above a deleted id
  * moves down by one) as a single codegen expression over a BROADCAST
  * sorted tombstone array: for a live id, the compacted dense id is
  * `id - |{d in dead : d < id}|` (one binary search); for a dead id it
  * returns [[TombstoneShiftExpr.Dead]] (-1), which the caller filters.
  *
  * This makes compaction's dense-id assignment a pure per-row map-side
  * expression — the docstore already holds the OLD dense ids 0..n-1, so
  * a compact never needs the generic dense-id machinery (keys-only
  * range pass + rank collect) to re-rank survivors in old-id order; the
  * shift IS the rank. Scale: the broadcast is the tombstone set the
  * delete path already broadcasts for its anti-join, and the per-row
  * cost is one O(log |dead|) search.
  */
case class TombstoneShiftExpr(child: Expression, bc: Broadcast[Array[Long]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override protected def nullSafeEval(input: Any): Any =
    TombstoneShiftExpr.shift(bc.value, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("deadBc", bc,
      classOf[Broadcast[Array[Long]]].getName)
    val arrTerm = ctx.addMutableState("long[]", "deadArr",
      v => s"$v = (long[]) $bcRef.value();")
    val h = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${h.code}
        final long ${ev.value} =
          graft.functions.TombstoneShiftExpr.shift($arrTerm, ${h.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TombstoneShiftExpr {

  /** Sentinel for a tombstoned id (real compacted ids are >= 0). */
  val Dead = -1L

  /** Shared by interpreted eval and generated code: binary search over
    * the sorted dead array — found ⇒ dead; else the insertion point IS
    * the count of dead ids below `id`, i.e. the shift.
    */
  def shift(dead: Array[Long], id: Long): Long = {
    val i = java.util.Arrays.binarySearch(dead, id)
    if (i >= 0) Dead else id - (-(i + 1))
  }

  def col(docId: Column, bc: Broadcast[Array[Long]]): Column =
    GraftColumnBridge.column(
      TombstoneShiftExpr(GraftColumnBridge.expression(docId), bc))
}
