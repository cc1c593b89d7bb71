package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen Bloom-filter membership test: does a (typically
  * literal) bitset contain an md5-hex-keyed element? Four 20-bit probe
  * positions come from hex chars 1-20 of the digest column — the same
  * derivation the driver uses to SET bits when building the filter, and
  * simple enough that an external SQL engine can replay the decision
  * exactly (each probe is substr + hex parse + modulo).
  *
  * This is the "ship the filter, not the set" screen: a 2^20-bit
  * filter is 128 KB in the task binary regardless of how many elements
  * built it, where the broadcast-semi-join screen ships (and hashes)
  * the full element set. The test itself runs fused inside
  * whole-stage codegen — no join, no shuffle, one branchy loop per row.
  *
  * Malformed digests (shorter than 20 chars, non-hex) return null —
  * a silent false would look like "not contaminated".
  */
case class BloomContains(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary bitset, string hex digest), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val bits = a.asInstanceOf[Array[Byte]]
    val hx = b.asInstanceOf[UTF8String].getBytes
    if (hx.length < 20 || bits.length == 0) return null
    val mBits = bits.length * 8
    var j = 0
    while (j < 4) {
      var pos = 0
      var i = 5 * j
      while (i < 5 * j + 5) {
        val d = Character.digit(hx(i).toChar, 16)
        if (d < 0) return null
        pos = (pos << 4) | d
        i += 1
      }
      pos = pos % mBits
      if (((bits(pos >> 3) >> (pos & 7)) & 1) == 0) return false
      j += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val pos = ctx.freshName("pos")
      val all = ctx.freshName("all")
      s"""
         |byte[] $h = $b.getBytes();
         |if ($h.length < 20 || $a.length == 0) { ${ev.isNull} = true; }
         |else {
         |  boolean $all = true;
         |  for (int $j = 0; $j < 4 && $all && !${ev.isNull}; $j++) {
         |    int $pos = 0;
         |    for (int $i = 5 * $j; $i < 5 * $j + 5; $i++) {
         |      int $d = Character.digit((char) $h[$i], 16);
         |      if ($d < 0) { ${ev.isNull} = true; break; }
         |      $pos = ($pos << 4) | $d;
         |    }
         |    if (!${ev.isNull}) {
         |      $pos = $pos % ($a.length * 8);
         |      $all = (($a[$pos >> 3] >> ($pos & 7)) & 1) != 0;
         |    }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $all; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomContains {

  /** Probe positions per element: 4 × 20-bit slices of the md5 hex. */
  val Probes = 4
  val ProbeHexChars = 5

  def apply(bitset: Column, hexDigest: Column): Column =
    GraftSqlBridge.column(BloomContains(
      GraftSqlBridge.expression(bitset), GraftSqlBridge.expression(hexDigest)))

  /** Driver-side builder: the bitset an md5-hex element set implies
    * under the same probe derivation the expression tests.
    */
  def build(hexDigests: Iterator[String], mBits: Int = 1 << 20): Array[Byte] = {
    require(mBits % 8 == 0 && mBits > 0, s"mBits must be a positive x8: $mBits")
    val bits = new Array[Byte](mBits / 8)
    hexDigests.foreach { hx =>
      var j = 0
      while (j < Probes) {
        val pos = Integer.parseInt(
          hx.substring(ProbeHexChars * j, ProbeHexChars * j + ProbeHexChars),
          16) % mBits
        bits(pos >> 3) = (bits(pos >> 3) | (1 << (pos & 7))).toByte
        j += 1
      }
    }
    bits
  }

  /** Distributed builder: partial-OR fold of per-partition bit
    * arrays over a one-string-column relation of md5-hex digests —
    * the `treeAggregate` twin of [[build]]. Each task folds its
    * partition's digests into a local 128 KB bitset; the combine is a
    * byte-wise OR, tree-shaped so the driver merges O(log P) arrays,
    * not P. Input size never reaches the driver — only bitsets do —
    * so the builder holds at ANY element count (the driver-side
    * [[build]] stays for genuinely driver-resident sets).
    */
  def buildDistributed(hexDigests: org.apache.spark.sql.DataFrame,
                       mBits: Int = 1 << 20): Array[Byte] = {
    require(mBits % 8 == 0 && mBits > 0, s"mBits must be a positive x8: $mBits")
    import hexDigests.sparkSession.implicits._
    def orInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }
    hexDigests.as[String].rdd.treeAggregate(new Array[Byte](mBits / 8))(
      (bits, hx) => {
        var j = 0
        while (j < Probes) {
          val pos = Integer.parseInt(
            hx.substring(ProbeHexChars * j, ProbeHexChars * j + ProbeHexChars),
            16) % mBits
          bits(pos >> 3) = (bits(pos >> 3) | (1 << (pos & 7))).toByte
          j += 1
        }
        bits
      },
      orInto)
  }

  /** Expose as SQL function `bloom_contains` on a session. */
  /** (identifier, info, builder) — shared by the session-level
    * [[register]] and the config-level [[graft.GraftExtensions]]. */
  private[graft] val descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, "bloom_contains"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"bloom_contains expects exactly 2 arguments, got ${children.size}")
        BloomContains(children.head, children(1))
      })

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      descriptor._1, descriptor._2, descriptor._3)
}
