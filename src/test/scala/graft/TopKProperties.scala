package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.TopKBuffer

/** Property checks of the bounded top-k buffer (SURVEY.md §5): for ANY
  * input the buffer must agree with sort-then-take, and partial-merge
  * must be insertion-order-insensitive — the laws that make TopKAgg's
  * map-side partial aggregation lossless.
  */
object TopKProperties extends Properties("TopKBuffer") {

  private val genPair: Gen[(Double, Long)] = for {
    // coarse scores force ties so the id tiebreak is exercised
    s <- Gen.choose(0, 10).map(_ / 10.0)
    id <- Gen.choose(0L, 50L)
  } yield (s, id)

  private def reference(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)).take(k)

  property("equals sort-then-take for any input") =
    Prop.forAll(Gen.listOf(genPair), Gen.choose(1, 8)) { (xs, k) =>
      val b = new TopKBuffer(k)
      xs.foreach { case (s, i) => b.add(s, i) }
      b.sorted.toSeq == reference(xs, k)
    }

  property("merge of split halves equals single-pass") =
    Prop.forAll(Gen.listOf(genPair), Gen.choose(1, 8), Gen.choose(0, 100)) {
      (xs, k, cut) =>
        val (l, r) = xs.splitAt(cut % (xs.length + 1))
        val whole = new TopKBuffer(k)
        xs.foreach { case (s, i) => whole.add(s, i) }
        val a = new TopKBuffer(k); l.foreach { case (s, i) => a.add(s, i) }
        val b = new TopKBuffer(k); r.foreach { case (s, i) => b.add(s, i) }
        a.mergeFrom(b)
        a.sorted.toSeq == whole.sorted.toSeq
    }
}
