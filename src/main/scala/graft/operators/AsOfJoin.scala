package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable as-of join (an operator Spark lacks natively; SURVEY.md
  * §2.4 extension surface): for every left row, attach the latest
  * right row with `rightTime <= leftTime` within the same key group.
  *
  * Implementation is the union+window formulation: tag sides, union,
  * and take `last(rightCol, ignoreNulls)` over a window ordered by
  * (time, side) with rights-before-lefts on ties (>= semantics). ONE
  * shuffle on the key columns and linear state — the 100 TB-safe
  * shape. The naive alternative (inequality theta-join + per-left-row
  * max) degenerates to a per-key cross product: |L|×|R| pairs per key
  * before aggregation, which is quadratic in key frequency and
  * explodes at scale.
  *
  * Requirements: right is unique per (keys, rightTime) — pre-dedupe
  * with an aggregation; left/right column names disjoint apart from
  * the keys; right payload columns non-null (null is the no-match
  * marker).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String): DataFrame = {
    val lCols = left.columns.filterNot(keys.contains).toSeq
    val rCols = right.columns.filterNot(keys.contains).toSeq
    require(lCols.intersect(rCols).isEmpty,
      s"ambiguous columns: ${lCols.intersect(rCols).mkString(",")}")

    def side(df: DataFrame, time: String, mark: Int,
             own: Seq[String], other: DataFrame, othersCols: Seq[String]): DataFrame = {
      val nulls = othersCols.map(c =>
        lit(null).cast(other.schema(c).dataType).as(c))
      val cols: Seq[Column] =
        keys.map(col) ++ Seq(col(time).as("__t"), lit(mark).as("__side")) ++
          own.map(col) ++ nulls
      df.select(cols: _*)
    }

    val l = side(left, leftTime, 1, lCols, right, rCols)
    val r = side(right, rightTime, 0, rCols, left, lCols)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rCols.foldLeft(l.unionByName(r.select(l.columns.toIndexedSeq.map(col): _*))) {
      case (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.where(col("__side") === 1).drop("__t", "__side")
  }

  /** Native as-of join via the custom
    * [[graft.plans.AsOfMergeJoinExec]] physical operator — same
    * semantics and same oracle as [[asOf]], different machinery: each
    * side shuffles/sorts independently on (keys, time) and a forward
    * merge with O(1) state attaches the latest right row, instead of
    * union-widening both payloads and running per-column IGNORE-NULLS
    * window fills. Output column order matches [[asOf]] up to the
    * keys' position (left columns then right payload). */
  def asOfNative(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTime: String, rightTime: String,
                 forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    graft.functions.GraftFunctions.install(spark) // ensures the strategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(sys.error(s"asOfNative: no column $n"))
    org.apache.spark.sql.graftshim.DatasetShim.ofRows(spark,
      graft.plans.AsOfJoinNode(lp, rp,
        keys.map(attr(lp, _)), keys.map(attr(rp, _)),
        attr(lp, leftTime), attr(rp, rightTime), forward))
  }
}
