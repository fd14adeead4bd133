package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim.{aggColumn, column, expression => toExpr}
import org.apache.spark.sql.types.BinaryType

/** Bloom-filtered semi join — shuffle pruning for selective fact⋈fact
  * joins (the J-family's 100 TB missing piece between broadcast and
  * full shuffle; same role as Spark's own runtime row-level filtering,
  * surfaced as an explicit operator with a chooseable build side).
  *
  * Shape: ONE aggregate over the (filtered) build side folds every
  * join key into a bloom sketch (Spark's `BloomFilterAggregate` —
  * partial sketches OR-merge, so the build is a regular two-phase
  * aggregation, no row shuffle); the probe side is pre-filtered
  * MAP-SIDE with `might_contain` BEFORE its shuffle; the exact join
  * then runs on the survivors only. The result is EXACTLY the plain
  * join — the bloom passes a superset (false positives only, never
  * false negatives) and the join verifies — so the gate is a full
  * hash oracle against the plain-SQL semi join.
  *
  * At 100 TB: a selective build side means the probe shuffle carries
  * ~|matches| + ε·|probe| rows instead of |probe| — the dominant cost
  * of a large semi/inner join. The sketch itself is
  * O(numBits) ≈ 1.2 bytes/item at 3% FPP, independent of probe size;
  * it rides to every probe task as one broadcast-sized literal (the
  * same driver-boundedness argument as SaltedJoin's hot-key set, and
  * exactly how Spark's InjectRuntimeFilter materializes its subquery
  * result).
  *
  * Uses Spark's own catalyst bloom expressions (public Spark source:
  * BloomFilterAggregate / BloomFilterMightContain, the pair behind
  * spark.sql.optimizer.runtime.bloomFilter) through the graftshim
  * Column bridge — codegen'd, no UDF.
  */
object BloomJoin {

  /** Build the bloom sketch of `key` over `build` — one binary scalar.
    * `estimatedItems` sizes the sketch (≈ distinct build keys; Spark
    * derives numBits for ~3% FPP and caps at its max-bits conf). */
  def buildSketch(build: DataFrame, key: Column, estimatedItems: Long): Array[Byte] =
    build.agg(aggColumn(new BloomFilterAggregate(
        new XxHash64(Seq(toExpr(key))), estimatedItems)))
      .head().getAs[Array[Byte]](0)

  /** Sketch build with an EXPLICIT bit budget (r11): the default ~3%
    * FPP is right for row-grain semi joins, but an ANY-of-k probe
    * (does any of a document's k grams hit?) compounds it to
    * 1−(1−fpp)^k per document — useless pruning at k ≈ 150. Pick
    * numBits ≈ 1.44·items·log2(1/fpp) for the per-PROBE-UNIT rate the
    * consumer needs (decontamination uses ~3e-4 per gram ⇒ ~2.1
    * bytes/item — still 4× smaller than broadcasting the exact sorted
    * gram array, with O(k) probe instead of O(k log n)). */
  def buildSketchBits(build: DataFrame, key: Column,
                      estimatedItems: Long, numBits: Long): Array[Byte] = {
    // BloomFilterAggregate SILENTLY clamps to
    // spark.sql.optimizer.runtime.bloomFilter.maxNumBits /
    // maxNumItems (review r11, verified in the shipped jar): past the
    // caps the sketch degrades toward fpp 1 with no error and the
    // consumer's pruning math is voided without a signal. Fail loudly
    // instead — the operator raises the confs for a bigger build.
    val conf = build.sparkSession.conf
    val maxBits = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    val maxItems = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    require(numBits <= maxBits && estimatedItems <= maxItems,
      s"bloom build ($estimatedItems items, $numBits bits) exceeds the " +
        s"session caps (maxNumItems=$maxItems, maxNumBits=$maxBits) — " +
        "BloomFilterAggregate would clamp SILENTLY; raise " +
        "spark.sql.optimizer.runtime.bloomFilter.maxNumBits/maxNumItems " +
        "for a build this size")
    build.agg(aggColumn(new BloomFilterAggregate(
        new XxHash64(Seq(toExpr(key))),
        Literal(estimatedItems), Literal(numBits))))
      .head().getAs[Array[Byte]](0)
  }

  /** Probe-side predicate: true iff `key` MIGHT be in the sketch. */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    column(BloomFilterMightContain(
      Literal(sketch, BinaryType), new XxHash64(Seq(toExpr(key)))))

  /** Exact semi join with bloom shuffle pruning: rows of `probe` whose
    * `probeKey` appears in `build`'s `buildKey`. Identical output to
    * `probe.join(build, ..., "left_semi")`. */
  def semiJoin(probe: DataFrame, build: DataFrame,
               probeKey: String, buildKey: String,
               estimatedItems: Long): DataFrame = {
    val sketch = buildSketch(build, col(buildKey), estimatedItems)
    probe.where(mightContain(sketch, col(probeKey)))
      .join(build, col(probeKey) === col(buildKey), "left_semi")
  }

  /** Gate query (q_bloom_join): lineitem rows whose order is URGENT —
    * build = filtered orders keys, probe = lineitem, rolled up per
    * return flag. Oracle: plain IN-subquery SQL (the bloom is
    * invisible in the result, only in the plan). */
  def bloomSemiLineitems(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
    val urgent = graft.Tables.load(spark, dir, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val est = math.max(1024L, graft.Tables.rowCount(spark, dir, "orders") / 4)
    semiJoin(li, urgent, "l_orderkey", "o_orderkey", est)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        graft.functions.F.roundBin(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }
}
