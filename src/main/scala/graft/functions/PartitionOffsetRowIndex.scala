package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** `offset(partitionId) + localRowIndex` as a stateful leaf expression —
  * the scalable dense-ID assignment (Corpus.withDenseIdCounted).
  *
  * Replaces `row_number() OVER (PARTITION BY _pid)`: Catalyst cannot
  * know the data is ALREADY clustered by its own partition id, so the
  * window forced a second full exchange of content rows on the build's
  * hottest path. This expression reads the partition's rows in their
  * stored (sorted) order and counts — same ids, zero exchange. The
  * pattern is Spark's own MonotonicallyIncreasingID with the partition
  * mask replaced by an exact per-partition offset map (bounded: one
  * entry per shuffle partition).
  *
  * Determinism contract (same as the row_number form): the input
  * partition order must be deterministic — guaranteed here because rows
  * arrive range-partitioned + sorted within partitions on a unique key,
  * so any task retry replays the identical sequence.
  */
case class PartitionOffsetRowIndex(offsets: Map[Int, Long])
    extends LeafExpression with Nondeterministic {

  // per-row mutable counter: the optimizer must not collapse or clone
  // this expression into multiple evaluation sites
  override def stateful: Boolean = true

  @transient private[this] var count: Long = _
  @transient private[this] var offset: Long = _

  override protected def initializeInternal(partitionIndex: Int): Unit = {
    count = 0L
    offset = PartitionOffsetRowIndex.lookup(offsets, partitionIndex)
  }

  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override protected def evalInternal(input: InternalRow): Any = {
    val c = count
    count += 1
    offset + c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val countTerm = ctx.addMutableState(CodeGenerator.JAVA_LONG, "rowIdxCount")
    val offsetTerm = ctx.addMutableState(CodeGenerator.JAVA_LONG, "rowIdxOffset")
    val mapRef = ctx.addReferenceObj("offsets", offsets,
      "scala.collection.immutable.Map")
    ctx.addPartitionInitializationStatement(s"$countTerm = 0L;")
    ctx.addPartitionInitializationStatement(
      s"$offsetTerm = graft.functions.PartitionOffsetRowIndex.lookup(" +
        s"$mapRef, partitionIndex);")
    ev.copy(
      code = code"""
        final long ${ev.value} = $offsetTerm + $countTerm;
        $countTerm++;""",
      isNull = FalseLiteral)
  }
}

object PartitionOffsetRowIndex {

  /** Shared by interpreted eval and generated code. */
  def lookup(m: Map[Int, Long], pid: Int): Long = m.getOrElse(pid, 0L)

  def col(offsets: Map[Int, Long]): Column =
    GraftColumnBridge.column(PartitionOffsetRowIndex(offsets))
}
