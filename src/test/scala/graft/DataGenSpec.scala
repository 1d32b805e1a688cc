package graft

import org.apache.spark.sql.functions._

/** Pins for the `graft.DataGen` scale-slice generator — the properties
  * the sf1 scaling evidence in BASELINE.md rests on:
  *
  *  1. cardinality: every amplified table has exactly N× the base rows;
  *     nation/region stay verbatim.
  *  2. copy 0 is the identity: the slice strictly contains the base
  *     corpus (doc text equality, embedding equality).
  *  3. referential integrity WITHIN a copy and never ACROSS copies: the
  *     lineitem→orders join has zero orphans, and every joined pair sits
  *     in the same copy stripe (key DIV 2⁴²).
  *  4. token renaming is a per-copy bijection: a copy-k doc's token
  *     stream is exactly the base stream with the `_ck` suffix — so
  *     within-copy shingle sets are isomorphic to the base corpus (near-
  *     dup structure replicates exactly) while cross-copy shingle overlap
  *     is ZERO (dedup output scales linearly, the honest 10× case).
  *  5. the embedding dim shift is orthogonal: per-vector component
  *     multisets (hence norms) are preserved, and within-copy dot
  *     products equal the base pair's dot exactly.
  */
class DataGenSpec extends SparkSpec {

  private val out = Tables.scratchPath("datagen_spec_n2", sf0001)
  private val N = 2
  private lazy val gen: Unit = DataGen.generate(spark, sf0001, out, N)

  test("amplified tables have exactly Nx rows; dimensions stay verbatim") {
    gen
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings")) {
      val base = spark.read.parquet(s"$sf0001/$t.parquet").count()
      val amp = spark.read.parquet(s"$out/$t.parquet").count()
      assert(amp == N * base, s"$t: $amp != $N x $base")
    }
    for (t <- Seq("nation", "region")) {
      val base = spark.read.parquet(s"$sf0001/$t.parquet")
      val amp = spark.read.parquet(s"$out/$t.parquet")
      assert(amp.exceptAll(base).isEmpty && base.exceptAll(amp).isEmpty)
    }
  }

  test("copy 0 is the identity slice of the base corpus") {
    gen
    val stride = 1L << 42
    val baseDocs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val copy0 = spark.read.parquet(s"$out/documents.parquet")
      .filter(col("doc_id") < stride).select(col("doc_id"), col("text"))
    assert(copy0.exceptAll(baseDocs).isEmpty && baseDocs.exceptAll(copy0).isEmpty)
    val baseEmb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val emb0 = spark.read.parquet(s"$out/embeddings.parquet")
      .filter(col("vec_id") < stride).select(col("vec_id"), col("embedding"))
    assert(emb0.exceptAll(baseEmb).isEmpty && baseEmb.exceptAll(emb0).isEmpty)
  }

  test("joins resolve within a copy stripe and never across copies") {
    gen
    val stride = 1L << 42
    val li = spark.read.parquet(s"$out/lineitem.parquet")
      .select(col("l_orderkey"))
    val o = spark.read.parquet(s"$out/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    // zero orphans: every amplified lineitem finds its amplified order
    assert(li.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .count() == 0L)
    // same-stripe invariant on the order→customer edge
    assert(o.filter(expr(s"o_orderkey DIV $stride") =!=
      expr(s"o_custkey DIV $stride")).count() == 0L)
  }

  test("token renaming is a per-copy bijection with zero cross-copy shingle overlap") {
    gen
    val stride = 1L << 42
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val copy1 = spark.read.parquet(s"$out/documents.parquet")
      .filter(col("doc_id") >= stride).select(col("doc_id"), col("text"))
      .limit(50).collect()
    assert(copy1.nonEmpty)
    for (r <- copy1) {
      val origId = r.getLong(0) - stride
      val expected = base(origId).split(" ", -1).map(_ + "_c1").mkString(" ")
      assert(r.getString(1) == expected, s"doc $origId not a _c1 rename")
    }
    // bijection ⇒ token multisets are disjoint across copies, hence zero
    // shared 3-shingles — spot-check the token sets directly
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(expr(s"doc_id DIV $stride").as("copy"), col("w")).distinct()
    val shared = toks.groupBy(col("w"))
      .agg(countDistinct(col("copy")).as("nc"))
      .filter(col("nc") > 1).count()
    assert(shared == 0L, s"$shared tokens shared across copies")
  }

  test("embedding dim shift preserves norms and within-copy dot products") {
    gen
    val stride = 1L << 42
    val all = spark.read.parquet(s"$out/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val baseIds = all.keys.filter(_ < stride).toSeq.sorted.take(8)
    for (Seq(i, j) <- baseIds.sliding(2).map(_.toSeq) if i != j) {
      val (bi, bj) = (all(i), all(j))
      val (ci, cj) = (all(i + stride), all(j + stride))
      // component multiset preserved (circular shift) ⇒ identical norms
      assert(bi.sorted.sameElements(ci.sorted), s"vec $i multiset changed")
      // orthogonal transform ⇒ pairwise dot preserved as a REAL number;
      // the float SUMMATION ORDER shifts with the dims, so equality is
      // up-to-reordering (relative 1e-9), not bitwise
      val (d0, d1) = (dot(bi, bj), dot(ci, cj))
      assert(math.abs(d0 - d1) <= 1e-9 * math.max(1.0, math.abs(d0)),
        s"dot($i,$j) changed under shift: $d0 vs $d1")
    }
  }

  // ---- skew mode (r12): planted hot-key frequencies are exact ----

  private val skewOut = Tables.scratchPath("datagen_spec_skew_n2", sf0001)
  private lazy val genSkew: Unit = DataGen.generate(spark, sf0001, skewOut, N, skew = true)
  private val stride = 1L << 42

  test("skew mode plants the hot customer/part/order at exact predicate-derived counts") {
    genSkew
    val baseOrders = spark.read.parquet(s"$sf0001/orders.parquet")
    val baseLine = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val so = spark.read.parquet(s"$skewOut/orders.parquet")
    val sl = spark.read.parquet(s"$skewOut/lineitem.parquet")
    val lineHash = col("l_orderkey") * 31 + col("l_linenumber")

    // every copy>0 row with the hot key IS a planted row (key 0's natural
    // copy-k twin is offset by the stride, so the planted set is exactly
    // identifiable), and its count is (N-1) x the base predicate count
    val expCust = (N - 1) * baseOrders
      .filter(col("o_orderkey") % DataGen.HotCustMod === DataGen.HotCustRes).count()
    val gotCust = so.filter(col("o_orderkey") >= stride &&
      col("o_custkey") === DataGen.HotKey).count()
    assert(gotCust == expCust && expCust > 0, s"hot customer: $gotCust != $expCust")

    val expPart = (N - 1) * baseLine
      .filter(lineHash % DataGen.HotPartMod === DataGen.HotPartRes).count()
    val gotPart = sl.filter(col("l_orderkey") >= stride &&
      col("l_partkey") === DataGen.HotKey).count()
    assert(gotPart == expPart && expPart > 0, s"hot part: $gotPart != $expPart")

    val expOrder = (N - 1) * baseLine
      .filter(lineHash % DataGen.HotOrderMod === DataGen.HotOrderRes).count()
    // hot-order rows keep their (offset) partkeys unless the part plant
    // also hit them, so identify them by the redirected orderkey alone
    val gotOrder = sl.filter(col("l_orderkey") === DataGen.HotKey).count() -
      baseLine.filter(col("l_orderkey") === DataGen.HotKey).count() // copy-0 naturals
    assert(gotOrder == expOrder && expOrder > 0, s"hot order: $gotOrder != $expOrder")
  }

  test("skew slice keeps referential integrity and leaves unplanted rows identical") {
    genSkew; gen
    val so = spark.read.parquet(s"$skewOut/orders.parquet")
    val sc = spark.read.parquet(s"$skewOut/customer.parquet")
    val sl = spark.read.parquet(s"$skewOut/lineitem.parquet")
    // zero orphans: every redirect targets a copy-0 key that exists
    assert(so.join(sc, col("o_custkey") === col("c_custkey"), "left_anti").count() == 0)
    assert(sl.join(so, col("l_orderkey") === col("o_orderkey"), "left_anti").count() == 0)
    // unplanted rows are byte-identical to the plain slice (the plant
    // predicate is recoverable from the offset key: original = key mod stride)
    val po = spark.read.parquet(s"$out/orders.parquet")
    val plantedPred = col("o_orderkey") >= stride &&
      (col("o_orderkey") % stride) % DataGen.HotCustMod === DataGen.HotCustRes
    val a = so.filter(!plantedPred)
    val b = po.filter(!plantedPred)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("skew mode plants the hot vector cluster and the hot word at exact counts") {
    genSkew
    val baseEmb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val se = spark.read.parquet(s"$skewOut/embeddings.parquet")
    val expVec = (N - 1) * baseEmb
      .filter(col("vec_id") % DataGen.HotVecMod === DataGen.HotVecRes).count()
    val planted = se.filter(col("vec_id") >= stride &&
      (col("vec_id") % stride) % DataGen.HotVecMod === DataGen.HotVecRes)
    assert(planted.count() == expVec && expVec > 0)
    // all planted vectors are the identical constant → one LSH bucket
    val distinctPlanted = planted.select(col("embedding")).distinct().collect()
    assert(distinctPlanted.length == 1)
    assert(distinctPlanted.head.getSeq[Float](0).forall(_ == DataGen.HotVecVal))

    val baseDocs = spark.read.parquet(s"$sf0001/documents.parquet")
    val sd = spark.read.parquet(s"$skewOut/documents.parquet")
    val expWord = (N - 1) * baseDocs
      .filter(col("doc_id") % DataGen.HotWordMod === 0).count()
    val gotWord = sd.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") === DataGen.HotWord).count()
    assert(gotWord == expWord && expWord > 0, s"hot word: $gotWord != $expWord")
  }
}
