package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Digest plumbing shared by [[Md5Fast]]'s interpreted and codegen
  * paths. Spark's own `Md5` expression calls
  * `DigestUtils.md5Hex`, which looks up `MessageDigest.getInstance
  * ("MD5")` — a synchronized provider-table walk plus an allocation —
  * on EVERY call, and when the call sits inside a higher-order
  * function (`transform(arr, x => md5(x))`, the per-row gram/shingle
  * idiom all over this library) the whole lambda additionally runs on
  * the interpreted expression path, so the per-element cost was
  * observed dominating entire stages (a 100 s single-task gram fold
  * in the r19 baseline). A thread-confined reused digest instance
  * (MD5 digests reset themselves after `digest()`) plus a direct
  * hex encode removes the per-call lookup on both paths. The OUTPUT
  * is bit-identical to `functions.md5` — lowercase hex of the MD5 —
  * so every oracle replay and every persisted signature is unchanged.
  */
object Md5Fast {
  private val local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private val HEX: Array[Byte] = "0123456789abcdef".getBytes

  /** Lowercase MD5 hex of `input`, reusing a thread-local digest. */
  def hex(input: Array[Byte]): UTF8String = {
    val d = local.get().digest(input)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** Drop-in replacement for Catalyst's `Md5` with the per-call
  * `MessageDigest.getInstance` hoisted to a thread-local (see
  * [[Md5Fast$]]). Same input contract (binary, strings implicitly
  * cast), same output (lowercase hex string), codegen'd as one static
  * call when the surrounding operator supports it and cheap on the
  * interpreted path (inside higher-order functions) when it doesn't.
  */
case class Md5Fast(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary or string input, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "md5_fast"

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => Md5Fast.hex(s.getBytes)
    case b => Md5Fast.hex(b.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.Md5Fast.hex($c.getBytes())")
      case _ =>
        defineCodeGen(ctx, ev, c => s"graft.functions.Md5Fast.hex($c)")
    }

  override protected def withNewChildInternal(newChild: Expression): Md5Fast =
    copy(child = newChild)
}

/** Import `graft.functions.FastHash.md5` AFTER `functions._` to shadow
  * the stock `md5` in a whole file — explicit imports win over
  * wildcards, so every Column-context `md5(...)` in that file routes
  * through [[Md5Fast]] with zero per-site edits, while `md5` inside
  * SQL oracle strings is (correctly) untouched.
  */
object FastHash {
  def md5(c: Column): Column =
    GraftSqlBridge.column(Md5Fast(GraftSqlBridge.expression(c)))
}
