package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import graft.functions.Sketches

/** Property checks of the r11 native kernels (SURVEY.md §5): the
  * laws the SemDeDup assignment and the bloom decontamination screen
  * rely on for ANY input, not just the fixtures.
  */
object KernelProperties extends Properties("r11 kernels") {

  // ---- nearestCentroids (top-k soft assignment) ----

  private def vec(xs: Seq[Float]): ArrayData = new GenericArrayData(xs.toArray)
  private def centList(cents: Seq[(Long, Seq[Float])]): ArrayData =
    new GenericArrayData(cents.map { case (id, v) =>
      InternalRow(id, vec(v)): Any
    }.toArray)

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private val genDim = Gen.choose(2, 6)
  private val genNonZeroVec: Int => Gen[Seq[Float]] = dim =>
    Gen.listOfN(dim, Gen.choose(-8, 8).map(_.toFloat))
      .retryUntil(v => v.exists(_ != 0f), 50)

  private val genCase = for {
    dim <- genDim
    n <- Gen.choose(1, 8)
    cents <- Gen.listOfN(n, genNonZeroVec(dim))
    v <- genNonZeroVec(dim)
    k <- Gen.choose(1, 10)
  } yield (cents.zipWithIndex.map { case (c, i) => (i.toLong, c) }, v, k)

  property("top-k: ids are centroid ids, length min(k, n), descending true cosine, head = argmax") =
    Prop.forAll(genCase) { case (cents, v, k) =>
      val got = Sketches.nearestCentroids(vec(v), centList(cents), k)
        .toLongArray().toSeq
      val sims = cents.map { case (id, c) => id -> cos(v, c) }.toMap
      val idsOk = got.forall(sims.contains) && got.distinct == got
      val lenOk = got.length == math.min(k, cents.length)
      val ordered = got.map(sims).sliding(2).forall {
        case Seq(a, b) => a >= b; case _ => true
      }
      val headOk = got.isEmpty ||
        got.head == Sketches.nearestCentroid(vec(v), centList(cents)).longValue()
      idsOk && lenOk && ordered && headOk
    }

  property("top-k with k >= n is the full ranking; exact ties keep list order") =
    Prop.forAll(genCase) { case (cents, v, _) =>
      val got = Sketches.nearestCentroids(vec(v), centList(cents), cents.length)
        .toLongArray().toSeq
      // stable sort on descending cosine = the kernel's first-seen
      // tie convention over the (c_id-ordered) list
      val exp = cents.map { case (id, c) => (id, cos(v, c)) }
        .sortBy(-_._2).map(_._1)
      got == exp
    }

  // ---- bloomAny (decontamination screen) ----

  private def sketchOf(values: Seq[Long], bits: Long): Array[Byte] = {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(
      math.max(1, values.length).toLong, bits)
    values.foreach(v => bf.putLong(XXH64.hashLong(v, 42L)))
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  private val genBloomCase = for {
    inserted <- Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))
    probe <- Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))
    hit <- Gen.oneOf(true, false)
  } yield (inserted.distinct, probe, hit)

  property("no false negatives: any array holding an inserted value hits") =
    Prop.forAll(genBloomCase) { case (inserted, probe, hit) =>
      val bytes = sketchOf(inserted, 4096L)
      val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(bytes)
      val arr = if (hit) probe ++ inserted.take(1) else probe
      val got = Sketches.bloomAny(new GenericArrayData(arr.toArray), bf)
      // guarantee direction: inserted present => MUST be true;
      // agreement direction: kernel == reference element loop
      val ref = arr.exists(g => bf.mightContainLong(XXH64.hashLong(g, 42L)))
      got == ref && (!hit || got)
    }

  property("empty array never hits") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0L, 1L << 40))) { inserted =>
      val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
        sketchOf(inserted.distinct, 4096L))
      !Sketches.bloomAny(new GenericArrayData(Array.emptyLongArray), bf)
    }
}
