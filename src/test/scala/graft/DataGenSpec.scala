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
}
