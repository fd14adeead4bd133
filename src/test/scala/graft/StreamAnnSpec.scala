package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.VectorQueries

/** ST × E3 streaming ANN index maintenance (r11): the LSH bucket
  * index is kept current by micro-batch appends, each trigger doing
  * O(new vectors) work, and the maintained index is
  * probe-equivalent to the batch-built one. */
class StreamAnnSpec extends SparkSpec {

  private val Bits = 4
  private val Tables_ = 3

  /** Batch-computed (t, bucket, vec_id) signatures of a (vec_id, v)
    * frame — the ground truth the maintained index must equal. */
  private def batchSignatures(df: org.apache.spark.sql.DataFrame): Set[(Int, Long, Long)] = {
    graft.functions.GraftFunctions.install(spark)
    val tb = array((0 until Tables_).map(t =>
      struct(lit(t).as("t"),
        graft.functions.F.hyperplaneBucket(col("v"), Bits, t.toLong).as("bucket"))): _*)
    df.select(col("vec_id"), explode(tb).as("tb"))
      .select(col("tb.t"), col("tb.bucket"), col("vec_id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("two drains: second drain is one batch, prior index files untouched, index == batch signatures") {
    val in = Files.createTempDirectory("sann-in")
    val idx = Files.createTempDirectory("sann-idx")
    val ck = Files.createTempDirectory("sann-ck")
    Seq(in, idx, ck).foreach(_.toFile.deleteOnExit())
    val e = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    (0 until 3).foreach { k =>
      e.where(pmod(col("vec_id"), lit(3)) === k)
        .select(to_json(struct(col("vec_id"), col("embedding"))).as("value"))
        .coalesce(1).write.mode("append").text(in.toString)
    }
    val n1 = VectorQueries.streamAnnDrain(
      spark, in.toString, idx.toString, ck.toString, Bits, Tables_)
    assert(n1 >= 3L, s"expected >= 3 micro-batches, got $n1")
    val idx1 = VectorQueries.streamAnnIndex(spark, idx.toString)
      .select(col("t"), col("bucket"), col("vec_id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(idx1 === batchSignatures(e.select(col("vec_id"), col("embedding").as("v"))),
      "maintained index != batch-computed signatures after full drain")
    def parquetFiles(dir: java.nio.file.Path): Set[(String, Long)] = {
      import scala.jdk.CollectionConverters._
      val s = Files.walk(dir)
      try s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(p => (dir.relativize(p).toString, Files.size(p))).toSet
      finally s.close()
    }
    val filesBefore = parquetFiles(idx)
    // drain 2: ONE new vector (clone of the lowest-id vector under a
    // fresh id — its buckets are computable from the clone source)
    val src = e.orderBy(col("vec_id")).limit(1).collect()(0)
    val newId = e.agg(max(col("vec_id"))).collect()(0).getLong(0) + 1
    import spark.implicits._
    val newVec = Seq((newId, src.getSeq[Float](1))).toDF("vec_id", "embedding")
    newVec.select(to_json(struct(col("vec_id"), col("embedding"))).as("value"))
      .coalesce(1).write.mode("append").text(in.toString)
    val n2 = VectorQueries.streamAnnDrain(
      spark, in.toString, idx.toString, ck.toString, Bits, Tables_)
    assert(n2 === 1L, s"second drain must process ONLY the new file, ran $n2 batches")
    // prior index files byte-identical (append-only maintenance)
    val survivors = parquetFiles(idx)
    assert(filesBefore.subsetOf(survivors),
      "a prior index file was rewritten — maintenance is not O(new data)")
    // delta = exactly the new vector's L signatures, bucket-identical
    // to its clone source's
    val idx2 = VectorQueries.streamAnnIndex(spark, idx.toString)
      .select(col("t"), col("bucket"), col("vec_id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val srcSigs = idx1.filter(_._3 == src.getLong(0))
    assert(idx2 === idx1 ++ srcSigs.map { case (t, b, _) => (t, b, newId) },
      "index delta is not exactly the new vector's signatures")
  }

  test("maintained-index probe: gated output = exact brute rows, recall claim holds") {
    val rows = VectorQueries.streamAnn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("recall_ok"),
      "maintained-index probe recall below floor"))
    // the gated output IS the exact brute answer (oracle-pinned shape)
    val brute = VectorQueries.knnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSet === brute)
  }
}
