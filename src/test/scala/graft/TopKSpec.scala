package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKKeys

/** TopKKeys aggregator algebra (pure, no Spark): bounded buffer, merge
  * associativity/commutativity on disjoint inputs, exact top-k result. */
class TopKSpec extends AnyFunSuite {

  private val agg = new TopKKeys(3)
  private val rnd = new scala.util.Random(7)
  private val data = Seq.fill(200)((rnd.nextDouble() * 100, rnd.nextLong().abs))

  private def fold(xs: Seq[(Double, Long)]) = xs.foldLeft(agg.zero)(agg.reduce)

  test("buffer never exceeds k during reduce or merge") {
    var buf = agg.zero
    data.foreach { x => buf = agg.reduce(buf, x); assert(buf.size <= 3) }
    val (l, r) = data.splitAt(97)
    assert(agg.merge(fold(l), fold(r)).size <= 3)
  }

  test("split-merge equals single fold equals sort-take") {
    val (l, r) = data.splitAt(123)
    val merged = agg.finish(agg.merge(fold(l), fold(r)))
    val single = agg.finish(fold(data))
    val expected = data.sortBy { case (v, k) => (-v, k) }.take(3).map(_._2)
    assert(merged == expected)
    assert(single == expected)
    assert(agg.finish(agg.merge(fold(r), fold(l))) == expected, "merge not commutative")
  }

  test("groups smaller than k return all keys, ordered") {
    val small = Seq((1.0, 5L), (3.0, 2L))
    assert(agg.finish(fold(small)) == Seq(2L, 5L))
  }
}
