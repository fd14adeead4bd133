package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.CmsBuffer

/** Property checks of the Count-Min buffer (SURVEY.md §5): the laws
  * that make CmsAgg's partial aggregation and sketch-table rollups
  * sound for ANY multiset and partitioning — never undercount,
  * exact cell-wise merge, serde identity.
  */
object CmsProperties extends Properties("CmsBuffer") {

  private val genKeys: Gen[List[Long]] =
    Gen.listOf(Gen.choose(0L, 40L))
  private val genShape: Gen[(Int, Int)] = for {
    depth <- Gen.choose(1, 5)
    width <- Gen.oneOf(16, 32, 128)
  } yield (depth, width)

  private def build(keys: Seq[Long], depth: Int, width: Int): CmsBuffer = {
    val b = new CmsBuffer(depth, width)
    keys.foreach { k =>
      val (h1, h2) = CmsBuffer.hashPair(Long.box(k))
      b.addHash(h1, h2)
    }
    b
  }

  private def estimate(b: CmsBuffer, k: Long): Long = {
    val (h1, h2) = CmsBuffer.hashPair(Long.box(k))
    b.estimate(h1, h2)
  }

  property("never undercounts any key") =
    Prop.forAll(genKeys, genShape) { (keys, shape) =>
      val (d, w) = shape
      val b = build(keys, d, w)
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong)
      exact.forall { case (k, n) => estimate(b, k) >= n }
    }

  property("merge of split halves equals single-pass, cell for cell") =
    Prop.forAll(genKeys, genShape, Gen.choose(0, 100)) { (keys, shape, cut) =>
      val (d, w) = shape
      val (l, r) = keys.splitAt(cut % (keys.length + 1))
      val whole = build(keys, d, w)
      val a = build(l, d, w)
      a.mergeFrom(build(r, d, w))
      a.cells.sameElements(whole.cells)
    }

  property("serde round-trip is identity") =
    Prop.forAll(genKeys, genShape) { (keys, shape) =>
      val (d, w) = shape
      val b = build(keys, d, w)
      val back = CmsBuffer.deserialize(b.serialized)
      back.depth == d && back.width == w && back.cells.sameElements(b.cells)
    }

  property("total mass conserved: each row sums to |multiset|") =
    Prop.forAll(genKeys, genShape) { (keys, shape) =>
      val (d, w) = shape
      val cells = build(keys, d, w).cells
      (0 until d).forall { row =>
        (0 until w).map(c => cells(row * w + c)).sum == keys.length.toLong
      }
    }
}
