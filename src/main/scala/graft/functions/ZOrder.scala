package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Morton (Z-order) bit interleaving — the multi-column clustering key
  * behind [[graft.operators.ZOrderLayout]]. Reference analog: the
  * `date=/hour=` prefix layout of `ingest_clickstream_to_s3.py:71`
  * generalized from one clustering dimension to two (the Databricks
  * Delta OPTIMIZE ZORDER idea, done as a plain write-once Spark job).
  *
  * `spread` expands the low 21 bits of x so consecutive bits land two
  * apart (standard magic-mask Morton spreading); `interleave` merges
  * two 21-bit coordinates into one 42-bit key whose ordering is the
  * Z-curve: sorting by it clusters rows that are close in BOTH
  * dimensions, so every parquet row group covers a small 2-D bounding
  * box and min/max footer stats prune on either (or both) predicates.
  * 21 bits per dimension (~2M distinct cells per axis) keeps the
  * scaled multiply `(v-min)*2^21/range` inside Long for any
  * microsecond-timestamp range (2^63/2^21 ≈ 4.4e12 µs ≈ 139 years).
  */
object ZOrderKey {
  val DimBits: Int = 21
  val DimMax: Long = (1L << DimBits) - 1

  /** Spread the low 21 bits of x two apart (bit i → bit 2i) — the
    * standard 2-D magic-mask Morton spreading over a 64-bit lane. */
  def spread(x: Long): Long = {
    var v = x & DimMax
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** 2-D Morton key of two 21-bit coordinates (a gets the odd bits). */
  def interleave(a: Long, b: Long): Long = (spread(a) << 1) | spread(b)
}

/** `interleave_bits(a, b)` — 2-D Z-order key of two pre-scaled 21-bit
  * coordinates (see [[ZOrderKey]]); codegen'd scalar, null if either
  * input is null. Inputs outside [0, 2^21) are masked to their low 21
  * bits (callers scale with [[graft.operators.ZOrderLayout.scaled]]).
  */
case class InterleaveBits(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKey.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrderKey.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}
