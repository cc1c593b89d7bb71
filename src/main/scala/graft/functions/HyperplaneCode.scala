package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen random-hyperplane LSH bucket code over an
  * array<double> vector: bit p is set iff the dot product with
  * deterministic ±1 hyperplane p is non-negative.
  *
  * This is the per-row hot kernel of every hyperplane-LSH path —
  * single-query probing, the shuffled banded knn regime, and the
  * embedding near-dup blocker all hash both sides through it. The
  * composable form (a transform over a plane-matrix literal with a
  * nested zip_with/aggregate fold) materializes two intermediate
  * arrays per row and walks three lambda closures per plane; this
  * expression runs the whole planes × dims loop nest in one fused
  * codegen body with zero allocation.
  *
  * Float semantics are IDENTICAL to the fold it replaces: the dot
  * accumulates in dimension order (±1.0 multiplies are exact), so
  * bucket codes — and therefore every oracle-checked LSH answer —
  * are bit-for-bit unchanged.
  *
  * Degenerate inputs mirror the HOF tree it replaces: a NULL vector
  * is NULL; a length-mismatched vector or one with a NULL element
  * yields code 0 (every per-plane fold there saw a null product, and
  * the final when(d >= 0) sent each plane to its otherwise(0) branch).
  */
case class HyperplaneCode(child: Expression, planes: Int, dims: Int)
  extends UnaryExpression {

  require(planes >= 1 && planes <= 63, s"planes must be in [1,63], got $planes")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<double>, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_code"

  // row-major planes × dims sign matrix, same md5 derivation as
  // Similarity.hyperplane — one copy per expression instance,
  // broadcast to executors inside the serialized plan
  private lazy val signs: Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Double](planes * dims)
    var p = 0
    while (p < planes) {
      var d = 0
      while (d < dims) {
        val h = md.digest(s"${p}_$d".getBytes("UTF-8"))
        out(p * dims + d) = if ((h(0) & 1) == 0) 1.0 else -1.0
        d += 1
      }
      p += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != dims) return 0L
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return 0L; i += 1 }
    var code = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      val off = p * dims
      var d = 0
      while (d < dims) { dot += v.getDouble(d) * signs(off + d); d += 1 }
      if (dot >= 0.0) code |= 1L << p
      p += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val mat = ctx.addReferenceObj("hyperplaneSigns", signs, "double[]")
      val n = ctx.freshName("n")
      val ok = ctx.freshName("ok")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val code = ctx.freshName("code")
      s"""
         |long $code = 0L;
         |int $n = $v.numElements();
         |boolean $ok = ($n == $dims);
         |if ($ok) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($v.isNullAt($i)) { $ok = false; break; }
         |  }
         |}
         |if ($ok) {
         |  for (int $p = 0; $p < $planes; $p++) {
         |    double $dot = 0.0;
         |    int $off = $p * $dims;
         |    for (int $d = 0; $d < $dims; $d++) {
         |      $dot += $v.getDouble($d) * $mat[$off + $d];
         |    }
         |    if ($dot >= 0.0) $code |= (1L << $p);
         |  }
         |}
         |${ev.value} = $code;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneCode =
    copy(child = newChild)
}

object HyperplaneCode {

  def apply(v: Column, planes: Int, dims: Int): Column =
    GraftSqlBridge.column(HyperplaneCode(
      GraftSqlBridge.expression(v), planes, dims))
}
