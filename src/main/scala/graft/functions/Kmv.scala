package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) theta sketch — the third mergeable-summary
  * family, covering the operation the other two cannot: SET
  * INTERSECTION over stored sketches. HLL ([[HllBuffer]]) unions
  * losslessly but cannot intersect (inclusion-exclusion error
  * explodes); MinHash ([[MinHashUnionAgg]]) estimates RELATIVE
  * overlap (Jaccard) and degrades at low similarity. KMV keeps the k
  * smallest distinct element hashes; θ = (k-th smallest)/2^63 is an
  * unbiased sample-rate estimate, so |S| ≈ (k−1)/θ (Bar-Yossef et
  * al. 2002; Beyer et al., "Distinct-value synopses", SIGMOD 2007),
  * and ANY set expression — intersection, difference — evaluates on
  * the retained hash sets below the common θ with additive error
  * O(|S|/√k) (the theta-sketch framework, Dasgupta et al. 2016).
  *
  * Below k distinct values the sketch IS the exact distinct hash set
  * — small groups estimate exactly, the same property HllBuffer's
  * linear-counting range provides.
  *
  * Hashes are forced into [0, 2^63) (`>>> 1`) so plain signed-long
  * ordering is the sample order; storage is the sorted long array
  * (distinct, ascending), which makes union a merge and intersection
  * a linear scan at read time.
  */
final class KmvBuffer(val k: Int) {
  // sorted distinct retained hashes; length ≤ k
  var hashes: Array[Long] = Array.emptyLongArray

  def addHash(raw: Long): Unit = {
    val h = raw >>> 1
    if (hashes.length >= k && h >= hashes(hashes.length - 1)) return
    val idx = java.util.Arrays.binarySearch(hashes, h)
    if (idx >= 0) return // already retained
    val ins = -idx - 1
    val grown = new Array[Long](math.min(k, hashes.length + 1))
    System.arraycopy(hashes, 0, grown, 0, ins)
    grown(ins) = h
    val tailLen = grown.length - ins - 1
    if (tailLen > 0) System.arraycopy(hashes, ins, grown, ins + 1, tailLen)
    hashes = grown
  }

  def mergeFrom(other: KmvBuffer): Unit = {
    // merge two sorted distinct arrays, keep the k smallest
    val out = new Array[Long](math.min(k, hashes.length + other.hashes.length))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < hashes.length || j < other.hashes.length)) {
      val takeLeft = j >= other.hashes.length ||
        (i < hashes.length && hashes(i) <= other.hashes(j))
      val v = if (takeLeft) hashes(i) else other.hashes(j)
      if (takeLeft) i += 1 else j += 1
      if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
      else () // duplicate across sides
    }
    hashes = if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  def serialized: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * hashes.length)
    bb.putInt(k); bb.putInt(hashes.length)
    hashes.foreach(bb.putLong)
    bb.array()
  }
}

object KmvBuffer {
  private val Max = (1L << 62) * 2.0 // 2^63 as double

  val Seed = 9181L

  def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt())
    val n = bb.getInt()
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) { arr(i) = bb.getLong(); i += 1 }
    buf.hashes = arr
    buf
  }

  private def parse(bytes: Array[Byte]): (Int, Array[Long]) = {
    val b = deserialize(bytes); (b.k, b.hashes)
  }

  /** Distinct-count estimate: exact below k, (k−1)/θ at capacity. */
  def estimateOf(bytes: Array[Byte]): Long = {
    val (k, hs) = parse(bytes)
    if (hs.length < k) hs.length.toLong
    else {
      val theta = hs(hs.length - 1) / Max
      math.rint((k - 1) / theta).toLong
    }
  }

  /** Intersection-cardinality estimate of two sketches: count shared
    * hashes below the common θ, scale by 1/θ. Exact when both sides
    * are below capacity (θ = 1: the full hash sets are present). */
  def intersectEstimateOf(a: Array[Byte], b: Array[Byte]): Long = {
    val (ka, ha) = parse(a)
    val (kb, hb) = parse(b)
    val thetaA = if (ha.length < ka) 1.0 else ha(ha.length - 1) / Max
    val thetaB = if (hb.length < kb) 1.0 else hb(hb.length - 1) / Max
    val theta = math.min(thetaA, thetaB)
    val cut = (theta * Max).toLong
    var i = 0; var j = 0; var shared = 0L
    while (i < ha.length && j < hb.length && ha(i) <= cut && hb(j) <= cut) {
      if (ha(i) == hb(j)) { shared += 1; i += 1; j += 1 }
      else if (ha(i) < hb(j)) i += 1
      else j += 1
    }
    math.rint(shared / theta).toLong
  }
}

/** Shared plumbing for the KMV aggregate pair. */
abstract class KmvAggBase extends TypedImperativeAggregate[KmvBuffer] {
  def child: Expression
  def k: Int

  // bounds checked at analysis time, never in the abstract constructor
  // (the HllAggBase lesson: it runs during executor-side
  // deserialization with subclass fields still 0)
  protected def kCheck: Option[TypeCheckResult] =
    if (k < 16 || k > 65536)
      Some(TypeCheckResult.TypeCheckFailure(s"$prettyName requires 16 <= k <= 65536, got $k"))
    else None

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)
  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = { a.mergeFrom(b); a }
  override def eval(buf: KmvBuffer): Any = buf.serialized
  override def serialize(buf: KmvBuffer): Array[Byte] = buf.serialized
  override def deserialize(bytes: Array[Byte]): KmvBuffer = KmvBuffer.deserialize(bytes)
}

/** `kmv_sketch(col[, k])` — build the KMV theta sketch of a column
  * (binary, ≤ 8k+8 bytes). Store one per partition key; any later
  * union/intersection/count evaluates on stored sketches. */
case class KmvSketchAgg(
    child: Expression,
    k: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends KmvAggBase {

  override def prettyName: String = "kmv_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    kCheck.getOrElse(child.dataType match {
      case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint/int/string, got $other")
    })

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val h = v match {
        case l: java.lang.Long    => XXH64.hashLong(l, KmvBuffer.Seed)
        case i: java.lang.Integer => XXH64.hashLong(i.toLong, KmvBuffer.Seed)
        case s: UTF8String =>
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, KmvBuffer.Seed)
      }
      buf.addHash(h)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

/** `kmv_union(sketchCol[, k])` — merge stored sketches (sorted-array
  * merge keeping the k smallest); emits the merged sketch. */
case class KmvUnionAgg(
    child: Expression,
    k: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends KmvAggBase {

  override def prettyName: String = "kmv_union"

  override def checkInputDataTypes(): TypeCheckResult =
    kCheck.getOrElse(child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary sketch column, got $other")
    })

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.mergeFrom(KmvBuffer.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvUnionAgg =
    copy(child = newChildren.head)
}

/** `kmv_estimate(sketch)` — distinct-count estimate of a stored
  * sketch (scalar, codegen'd). */
case class KmvEstimate(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_estimate"
  override def nullSafeEval(v: Any): Any =
    KmvBuffer.estimateOf(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.KmvBuffer.estimateOf($x)")
  override protected def withNewChildInternal(newChild: Expression): KmvEstimate =
    copy(child = newChild)
}

/** `kmv_intersect(a, b)` — intersection-cardinality estimate of two
  * stored sketches (scalar, codegen'd): shared retained hashes below
  * the common θ, scaled by 1/θ. The operation HLL cannot provide. */
case class KmvIntersect(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two binary sketch columns, got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_intersect"
  override def nullSafeEval(a: Any, b: Any): Any =
    KmvBuffer.intersectEstimateOf(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.KmvBuffer.intersectEstimateOf($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvIntersect =
    copy(left = newLeft, right = newRight)
}
