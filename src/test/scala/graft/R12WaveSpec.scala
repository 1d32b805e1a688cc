package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Round-12 pinned-on-arrival wave: the hot-key-cap twins (the r11
  * verdict weak item #2 — the documented-but-unimplemented pair-generation
  * guards, now conf-gated code with fixed-cap oracled twins).
  *
  *  - each `*_capped` entry gets a FULL imperative driver recompute at
  *    sf0.001 (collect the incidence, apply the cap in plain Scala maps,
  *    replicate the micro/round6 lattice) — the IndependentRecomputeSpec
  *    discipline, so the mirrored DuckDB oracle is not the only witness;
  *  - the conf gate is pinned both ways: `graft.rec.hotKeyCap` /
  *    `graft.dedup.lshBucketCap` set to the twin's literal makes the
  *    UNCAPPED entry byte-identical to the twin, and the default conf
  *    reproduces the uncapped output — so production knob-turning is
  *    exactly the oracled semantics;
  *  - the caps are proven to BITE at the harness SFs (keys above the cap
  *    exist; capped pair generation sees strictly fewer rows), so the
  *    twins exercise the lever rather than no-op.
  */
class R12WaveSpec extends SparkSpec {

  private def round6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  /** Distinct (orderkey, partkey) incidence at sf0.001, driver-side. */
  private lazy val opInc: Seq[(Long, Long)] =
    Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  /** Distinct (custkey, partkey) incidence at sf0.001, driver-side. */
  private lazy val cpInc: Seq[(Long, Long)] =
    Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("rec_assoc_rules_capped equals an imperative capped recompute, exactly") {
    val byBasket = opInc.groupBy(_._1)
    val nBaskets = byBasket.size.toLong
    val marg = opInc.groupBy(_._2).map { case (p, xs) => p -> xs.size.toLong }
    // the cap must bite at this sf, else the twin is a no-op test
    assert(byBasket.values.exists(_.size > Recommend.OrderBasketCap),
      s"no basket exceeds ${Recommend.OrderBasketCap} at sf0.001 — cap untested")
    val capped = byBasket.filter(_._2.size <= Recommend.OrderBasketCap)
    val nAb = collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    for ((_, items) <- capped) {
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size)
        nAb((ps(i), ps(j))) += 1
    }
    val rules = nAb.toSeq.flatMap { case ((pa, pb), n) =>
      Seq((pa, pb, n), (pb, pa, n))
    }.map { case (ante, cons, n) =>
      val na = marg(ante); val nc = marg(cons)
      (ante, cons, n, na, nc, nBaskets,
        n * 1000000L / na, n * nBaskets * 1000000L / (na * nc))
    }
    val expected = rules.sortBy { case (a, c, _, _, _, _, conf, lift) =>
      (-lift, -conf, a, c)
    }.take(20)
    val got = Recommend.queries("rec_assoc_rules_capped")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got.toSeq == expected)
  }

  test("rec_item_cosine_capped equals an imperative capped recompute, exactly") {
    val byCust = cpInc.groupBy(_._1)
    assert(byCust.values.exists(_.size > Recommend.CustBasketCap),
      s"no customer basket exceeds ${Recommend.CustBasketCap} at sf0.001 — cap untested")
    val marg = cpInc.groupBy(_._2).map { case (p, xs) => p -> xs.size.toLong }
    val capped = byCust.filter(_._2.size <= Recommend.CustBasketCap)
    val co = collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    for ((_, items) <- capped) {
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size)
        co((ps(i), ps(j))) += 1
    }
    val rows = co.toSeq.map { case ((pa, pb), c) =>
      val na = marg(pa); val nb = marg(pb)
      (pa, pb, c, na, nb,
        round6(c.toDouble / math.sqrt((na * nb).toDouble)).toDouble)
    }
    val expected = rows.sortBy { case (pa, pb, c, _, _, cos) =>
      (-cos, -c, pa, pb)
    }.take(25)
    val got = Recommend.queries("rec_item_cosine_capped")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == expected)
  }

  test("rec_user_cf_capped equals an imperative capped recompute, exactly") {
    val audience = cpInc.groupBy(_._2).map { case (p, xs) => p -> xs.size.toLong }
    assert(audience.values.exists(_ > Recommend.PartAudienceCap),
      s"no part audience exceeds ${Recommend.PartAudienceCap} at sf0.001 — cap untested")
    val deg = cpInc.groupBy(_._1).map { case (c, xs) => c -> xs.size.toLong }
    val items = cpInc.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSet }
    val okParts = audience.filter(_._2 <= Recommend.PartAudienceCap).keySet
    // directed budget pairs (u < 20, v ≠ u) through eligible parts only
    val byPart = cpInc.filter(x => okParts(x._2)).groupBy(_._2)
    val coUV = collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    for ((_, cs) <- byPart) {
      val users = cs.map(_._1)
      for (u <- users if u < 20; v <- users if v != u) coUV((u, v)) += 1
    }
    val cosMicro = coUV.toSeq.map { case ((u, v), c) =>
      val micro = (round6(c.toDouble / math.sqrt((deg(u) * deg(v)).toDouble))
        * 1000000).toLongExact
      (u, v, c, micro)
    }
    val nbr = cosMicro.groupBy(_._1).flatMap { case (u, xs) =>
      xs.sortBy { case (_, v, c, m) => (-m, -c, v) }.take(10)
    }
    val votes = collection.mutable.Map[(Long, Long), (Long, Long)]()
    for ((u, v, _, micro) <- nbr; p <- items(v) if !items(u)(p)) {
      val (s, n) = votes.getOrElse((u, p), (0L, 0L))
      votes((u, p)) = (s + micro, n + 1)
    }
    val expected = votes.toSeq
      .map { case ((u, p), (s, n)) => (u, p, s, n) }
      .groupBy(_._1).toSeq.flatMap { case (_, xs) =>
        xs.sortBy { case (_, p, s, n) => (-s, -n, p) }.take(5).zipWithIndex
          .map { case ((u, p, s, n), i) => (u, p, s, n, (i + 1).toLong) }
      }.sortBy(x => (x._1, x._5))
    val got = Recommend.queries("rec_user_cf_capped")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected)
  }

  test("rec_mf_rankk equals an imperative rank-2 ridge-ALS recompute, exactly") {
    // ratings: distinct (c, p) purchase counts at sf0.001
    val obs = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .agg(count(lit(1)).as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    type Fac = Map[Long, (BigDecimal, BigDecimal)]
    val v0: Fac = obs.map(_._2).distinct.map(p =>
      p -> (BigDecimal(1).setScale(6), round6((p % 7 + 1).toDouble / 10.0))).toMap
    // one ridge half-step: exact BigDecimal moments, ONE double Cramer
    // chain in the plan's operand order, round6 back onto the lattice
    def step(rows: Seq[(Long, Long, Long)], fixed: Fac): Fac =
      rows.groupBy(_._1).map { case (k, xs) =>
        var s11, s12, s22, b1, b2 = BigDecimal(0)
        for ((_, o, r) <- xs) {
          val (f1, f2) = fixed(o)
          s11 += f1 * f1; s12 += f1 * f2; s22 += f2 * f2
          b1 += BigDecimal(r) * f1; b2 += BigDecimal(r) * f2
        }
        val a = s11.toDouble + 0.1; val c2 = s22.toDouble + 0.1
        val b = s12.toDouble; val g1 = b1.toDouble; val g2 = b2.toDouble
        val det = a * c2 - b * b
        k -> (round6((g1 * c2 - g2 * b) / det), round6((a * g2 - b * g1) / det))
      }
    val byC = obs; val byP = obs.map { case (c, p, r) => (p, c, r) }
    val u1 = step(byC, v0)
    val v1 = step(byP, u1)
    val u2 = step(byC, v1)
    val v2 = step(byP, u2)
    val observed = obs.map(x => (x._1, x._2)).toSet
    val expected = u2.keys.filter(_ < 20).toSeq.sorted.flatMap { c =>
      val (cu1, cu2) = u2(c)
      v2.toSeq.filter { case (p, _) => !observed((c, p)) }
        .map { case (p, (pv1, pv2)) =>
          (p, round6(cu1.toDouble * pv1.toDouble + cu2.toDouble * pv2.toDouble).toDouble)
        }
        .sortBy { case (p, s) => (-s, p) }.take(5).zipWithIndex
        .map { case ((p, s), i) => (c, p, s, (i + 1).toLong) }
    }
    val got = Recommend.queries("rec_mf_rankk")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == expected)
  }

  test("graft.rec.hotKeyCap conf gate reproduces the capped twins and defaults off") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq
    val cappedExpected = rows(Recommend.itemCosineCapped(spark, sf0001))
    val uncappedExpected = rows(Recommend.itemCosineWith(spark, sf0001, None))
    spark.conf.set("graft.rec.hotKeyCap", Recommend.CustBasketCap.toString)
    try assert(rows(Recommend.itemCosine(spark, sf0001)) == cappedExpected)
    finally spark.conf.unset("graft.rec.hotKeyCap")
    assert(rows(Recommend.itemCosine(spark, sf0001)) == uncappedExpected)
    // the cap changes the sf0.001 answer, so the gate test is not vacuous
    assert(cappedExpected != uncappedExpected)
  }

  test("graft.dedup.lshBucketCap conf gate + occupancy-capped pairs are a subset of uncapped") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(Dedup.embeddingLshWith(spark, sf0001, None))
    val capped = pairs(Dedup.embeddingLshCapped(spark, sf0001))
    assert(capped.subsetOf(uncapped)) // dropping buckets can only remove candidates
    // the occupancy rule (13n DIV 320) equals an absolute conf cap at the
    // same value — the twin implements the sizing, the conf the override
    val nVec = Tables.embeddings(spark, sf0001).count()
    val occCap = Dedup.embOccupancyCap(nVec)
    spark.conf.set("graft.dedup.lshBucketCap", occCap.toString)
    try assert(pairs(Dedup.queries("dedup_embedding_lsh")(spark, sf0001)) == capped)
    finally spark.conf.unset("graft.dedup.lshBucketCap")
    assert(pairs(Dedup.queries("dedup_embedding_lsh")(spark, sf0001)) == uncapped)
    // the rule BITES at this sf: over-cap buckets exist (recomputed
    // driver-side from the same sign-band definition)
    import graft.functions.VectorOps
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val bands = e.select(col("vec_id"), explode(array(
      (0 until Dedup.EmbBands).map(b => struct(
        lit(b).as("band_idx"),
        VectorOps.signBand(col("v"), b, Dedup.EmbBandBits).as("band_val"))): _*
    )).as("band")).select(col("band.band_idx"), col("band.band_val"))
    val overCap = bands.groupBy(col("band_idx"), col("band_val"))
      .agg(count(lit(1)).as("bsz")).filter(col("bsz") > occCap).count()
    assert(overCap > 0, s"no bucket exceeds the occupancy cap $occCap at sf0.001 — rule untested")
  }
}
