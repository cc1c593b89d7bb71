package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen integer dot product over two array<int> columns —
  * the scoring kernel of the SQ8 retrieval path
  * ([[graft.pipeline.Similarity.int8TopK]]). The HOF form
  * (aggregate over zip_with) materializes an intermediate product
  * array and walks two lambda closures per row; at one byte per
  * dimension the whole point of quantized retrieval is memory-
  * bandwidth-bound scanning, so the kernel should be a single fused
  * loop in whole-stage codegen, like [[CosineSimilarity]] is for the
  * float path. Long accumulation cannot overflow from int products
  * (SQ8 codes are |v| <= 127, so each term is < 2^14 and 2^49 terms
  * would be needed to reach Long range).
  */
case class DotProductInt(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<int> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_int"

  // null for length-mismatched vectors or null elements — a partial
  // dot product is a plausible-looking wrong number
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0L; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getInt(i).toLong * y.getInt(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += (long) $a.getInt($i) * (long) $b.getInt($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductInt =
    copy(left = newLeft, right = newRight)
}

object DotProductInt {

  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductInt(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Expose as SQL function `dot_int` on a session. */
  /** (identifier, info, builder) — shared by the session-level
    * [[register]] and the config-level [[graft.GraftExtensions]]. */
  private[graft] val descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("dot_int"),
      new ExpressionInfo(classOf[DotProductInt].getName, "dot_int"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"dot_int expects exactly 2 arguments, got ${children.size}")
        DotProductInt(children.head, children(1))
      })

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      descriptor._1, descriptor._2, descriptor._3)
}
