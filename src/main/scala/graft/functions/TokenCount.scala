package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

import graft.tokenize.Tokenizer

/** Native Catalyst expression for the engine's hottest scalar: the
  * document token count (doc_len), evaluated for every row of every
  * build. A Scala UDF here costs UTF8String→String conversion + boxing
  * per row; this expression generates the ASCII char-scan loop straight
  * into whole-stage codegen and reads the UTF8String bytes in place.
  * Non-ASCII rows fall back to the reference tokenizer so semantics stay
  * identical to Tokenizer.countTokens (property-tested).
  */
case class TokenCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    TokenCountExpr.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenCountExpr.count($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenCountExpr =
    copy(child = newChild)
}

object TokenCountExpr {

  /** Shared runtime kernel (called from generated code AND interpreted
    * eval): scans the UTF8String's bytes without materializing a String.
    * Any byte >= 0x80 (non-ASCII) falls back to the reference tokenizer.
    */
  def count(s: UTF8String): Int = {
    val n = s.numBytes()
    var i = 0
    var cnt = 0
    var inTok = false
    while (i < n) {
      val b = s.getByte(i)
      if (b < 0) return Tokenizer.tokenizeRegex(s.toString).length
      val isTok = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
        (b >= '0' && b <= '9') || b == '_'
      if (isTok && !inTok) { cnt += 1; inTok = true }
      else if (!isTok) inTok = false
      i += 1
    }
    cnt
  }

  /** Column form (Spark 4 Column↔Expression bridge). */
  def tokenCount(c: Column): Column =
    GraftColumnBridge.column(TokenCountExpr(GraftColumnBridge.expression(c)))
}
