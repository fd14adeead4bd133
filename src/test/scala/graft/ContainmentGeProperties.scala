package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.catalyst.util.ArrayData

/** Property checks of the merge-walk set-overlap kernels against a
  * set-based reference: jaccard_ge and its r10 directed sibling
  * containment_ge must agree with |∩|-arithmetic on ANY pair of
  * sorted distinct long arrays, at boundary-hostile rational
  * thresholds — the early-exit branch must never change the answer,
  * and a ratio exactly AT num/den must pass (IEEE division of the
  * exact rational yields the same double as the threshold literal).
  */
object ContainmentGeProperties extends Properties("ContainmentGe") {

  // small element domain so intersections (and threshold boundaries)
  // are common, not vanishing
  private val genSet: Gen[Array[Long]] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 60L)).map(_.distinct.sorted.toArray))

  private val genT: Gen[(Int, Int)] =
    Gen.oneOf((1, 2), (9, 10), (3, 4), (1, 1))

  private def arr(a: Array[Long]): ArrayData = ArrayData.toArrayData(a)

  property("containment_ge equals set arithmetic at rational thresholds") =
    Prop.forAll(genSet, genSet, genT) { (a, b, t) =>
      val (num, den) = t
      val got = graft.functions.Sketches.containmentGeLong(
        arr(a), arr(b), num.toDouble / den)
      val inter = (a.toSet & b.toSet).size
      val expected: Option[Double] =
        if (a.isEmpty) None
        else if (inter * den >= a.length * num) Some(inter.toDouble / a.length)
        else None
      Prop(Option(got).map(_.doubleValue) == expected) :|
        s"na=${a.length} nb=${b.length} inter=$inter t=$num/$den"
    }

  property("jaccard_ge equals set arithmetic at rational thresholds") =
    Prop.forAll(genSet, genSet, genT) { (a, b, t) =>
      val (num, den) = t
      val got = graft.functions.Sketches.jaccardGeLong(
        arr(a), arr(b), num.toDouble / den)
      val inter = (a.toSet & b.toSet).size
      val union = a.length + b.length - inter
      val expected: Option[Double] =
        if (union == 0) None
        else if (inter * den >= union * num) Some(inter.toDouble / union)
        else None
      Prop(Option(got).map(_.doubleValue) == expected) :|
        s"na=${a.length} nb=${b.length} inter=$inter t=$num/$den"
    }
}
