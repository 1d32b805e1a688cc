package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.expressions.{DotProduct, PolyHash}

/** ScalaCheck properties for the pure kernels behind the custom Catalyst
  * surface — the parts whose correctness the oracle gate exercises only on
  * the data distributions present in testdata. Randomized inputs cover
  * supplementary code points, adversarial merge trees, duplicate values,
  * and empty inputs. All Spark-free and exact (no tolerances). */
object FunctionProps extends Properties("graft.functions") {

  // ---- PolyHash: interpreted/codegen kernel vs an independent BigInt fold

  private val genCodePoint: Gen[Int] = Gen.frequency(
    8 -> Gen.choose(0x20, 0x7e),          // ASCII
    2 -> Gen.choose(0xa0, 0xffff)         // BMP, incl. CJK
      .suchThat(cp => !Character.isSurrogate(cp.toChar)),
    1 -> Gen.choose(0x10000, 0x10ffff))   // supplementary → surrogate pairs

  private val genString: Gen[String] = Gen.listOf(genCodePoint)
    .map(cps => new String(cps.toArray, 0, cps.size))

  property("PolyHash.compute == BigInt code-point fold") = forAll(genString) { s =>
    val expected = s.codePoints().toArray.foldLeft(BigInt(0)) { (h, cp) =>
      (h * 31 + cp) % BigInt(PolyHash.Prime)
    }
    PolyHash.compute(UTF8String.fromString(s)) == expected.toLong
  }

  // ---- DotProduct: expression eval vs a plain index-order loop

  private val genVec: Gen[List[Double]] =
    Gen.listOf(Gen.choose(-8.0, 8.0))

  property("DotProduct eval == index-order multiply-add loop") =
    forAll(genVec, genVec) { (a0, b0) =>
      val n = math.min(a0.size, b0.size)
      val (a, b) = (a0.take(n), b0.take(n))
      val expr = DotProduct(Literal.create(a), Literal.create(b))
      var acc = 0.0
      var i = 0
      while (i < n) { acc += a(i) * b(i); i += 1 }
      // identical operand order → bit-exact, no tolerance
      expr.eval(null).asInstanceOf[Double] == acc
    }

  // ---- TopKKeys: any partitioning + any merge order == global sort-take-k

  private val genRows: Gen[List[(Double, Long)]] = for {
    n <- Gen.choose(0, 60)
    // values from a small pool so ties are common; keys unique
    vs <- Gen.listOfN(n, Gen.choose(0, 9).map(_.toDouble))
  } yield vs.zipWithIndex.map { case (v, i) => (v, i.toLong) }

  property("TopKKeys: partitioned reduce + arbitrary merge == sorted take(k)") =
    forAll(genRows, Gen.choose(1, 8), Gen.choose(1, 5)) { (rows, k, parts) =>
      val agg = new TopKKeys(k)
      val partitions =
        if (rows.isEmpty) List(List.empty[(Double, Long)])
        else rows.grouped(math.max(1, rows.size / parts)).toList
      val partials = partitions.map(_.foldLeft(agg.zero)(agg.reduce))
      // fold merges left-to-right AND right-to-left: order must not matter
      val l2r = agg.finish(partials.foldLeft(agg.zero)(agg.merge))
      val r2l = agg.finish(partials.foldRight(agg.zero)((p, acc) => agg.merge(acc, p)))
      val expected = rows.sortBy { case (v, key) => (-v, key) }.take(k).map(_._2)
      l2r == expected && r2l == expected
    }

  // ---- TopKKeysAgg (the native TypedImperativeAggregate): any split +
  // serialize roundtrip between every merge == global sort-take-k, with
  // value specials (NaN, ±0.0) in the pool — the total order must match
  // the Aggregator twin's Ordering.by((-v, key)) exactly

  private val genSpecialRows: Gen[List[(Double, Long)]] = for {
    n <- Gen.choose(0, 60)
    vs <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.choose(0, 9).map(_.toDouble),
      1 -> Gen.const(Double.NaN),
      1 -> Gen.const(0.0),
      1 -> Gen.const(-0.0)))
  } yield vs.zipWithIndex.map { case (v, i) => (v, i.toLong) }

  property("TopKKeysAgg: split + serialize-roundtrip merges == Aggregator twin") =
    forAll(genSpecialRows, Gen.choose(1, 8), Gen.choose(1, 5)) { (rows, k, parts) =>
      import graft.expressions.{TopKBuffer, TopKKeysAgg}
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val agg = TopKKeysAgg(Literal(0.0), Literal(0L), Literal(k))
      def fill(xs: List[(Double, Long)]): TopKBuffer = {
        val b = new TopKBuffer(k)
        xs.foreach { case (v, key) => b.insert(v, key) }
        b
      }
      val partitions =
        if (rows.isEmpty) List(List.empty[(Double, Long)])
        else rows.grouped(math.max(1, rows.size / parts)).toList
      // every partial crosses a serialize/deserialize boundary (the wire)
      val partials = partitions.map(p => agg.deserialize(agg.serialize(fill(p))))
      val merged = partials.reduceLeft { (a, b) => agg.merge(a, b) }
      val got = agg.eval(merged).asInstanceOf[GenericArrayData].toLongArray().toSeq
      val twin = new TopKKeys(k)
      val expected = twin.finish(rows.foldLeft(twin.zero)(twin.reduce))
      got == expected
    }

  // ---- MisraGries: the superset guarantee under arbitrary splits/merges

  private val genTok: Gen[String] = Gen.frequency(
    6 -> Gen.const("hot"), 3 -> Gen.const("warm"),
    1 -> Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))

  // ---- NGrams generator: eval vs the scala-collections sliding window

  private val genText: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.oneOf("alpha", "beta", "gamma", "x"),
    1 -> Gen.const(""))) // empty tokens model repeated spaces
    .map(_.mkString(" "))

  property("NGrams.eval == words.sliding(n) for any text and n") =
    forAll(genText, Gen.choose(-1, 5)) { (s, n) =>
      val got = graft.expressions.NGrams(Literal.create(s), Literal(n))
        .eval(null).iterator.map(_.getUTF8String(0).toString).toList
      val words = s.split(" ").filter(_.nonEmpty).toList
      val expected =
        if (n <= 0 || words.length < n) Nil
        else words.sliding(n).map(_.mkString(" ")).toList
      got == expected
    }

  property("MisraGries: candidates ⊇ {count > n/(c+1)} and ≤ c, any split") =
    forAll(Gen.listOf(genTok), Gen.choose(1, 6)) { (xs, nSplits) =>
      val c = 4
      val mg = new MisraGries(c)
      val parts =
        if (xs.isEmpty) List(List.empty[String])
        else xs.grouped(math.max(1, xs.size / nSplits)).toList
      val partials = parts.map(_.foldLeft(mg.zero)(mg.reduce))
      val l2r = mg.finish(partials.foldLeft(mg.zero)(mg.merge)).toSet
      val r2l = mg.finish(partials.foldRight(mg.zero)((p, acc) => mg.merge(acc, p))).toSet
      val n = xs.size
      val hh = xs.groupBy(identity)
        .collect { case (k, v) if v.size.toLong * (c + 1) > n => k }.toSet
      hh.subsetOf(l2r) && hh.subsetOf(r2l) && l2r.size <= c && r2l.size <= c
    }
}
