package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Z-order (Morton) clustering keys — the multi-dimensional data-layout
  * lever: sorting a 100 TB fact table by the bit-interleaved key of two
  * filter columns gives every parquet row group a tight min/max envelope
  * on BOTH columns at once, so a predicate on EITHER prunes scans — where
  * a single-column sort leaves the second column's per-file ranges as wide
  * as the whole table (ZorderLayoutSpec measures exactly this on a real
  * write).
  *
  * The interleave is the textbook 16→32-bit spread with multiply/AND steps
  * (shifts expressed as ·2^k so the identical integer math runs in Spark
  * and DuckDB); everything is exact BIGINT — no float anywhere.
  */
object Layout {

  /** (multiplier, mask) pairs of the classic bit-spread ladder:
    * x=(x|x<<8)&0x00FF00FF; (x|x<<4)&0x0F0F0F0F; (x|x<<2)&0x33333333;
    * (x|x<<1)&0x55555555. */
  private val SpreadSteps: Seq[(Long, Long)] = Seq(
    (256L, 0x00FF00FFL), (16L, 0x0F0F0F0FL), (4L, 0x33333333L), (2L, 0x55555555L))

  /** Spread the low 16 bits of `c` to even bit positions (Column form). */
  def spreadBits(c: Column): Column =
    SpreadSteps.foldLeft(c) { case (x, (m, mask)) =>
      (x.bitwiseOR(x * lit(m))).bitwiseAND(lit(mask))
    }

  /** The same ladder as portable SQL text (DuckDB oracle side). */
  private def spreadSql(e: String): String =
    SpreadSteps.foldLeft(e) { case (x, (m, mask)) =>
      s"((($x) | (($x) * $m)) & $mask)"
    }

  /** 32-bit Morton key of (l_partkey, l_suppkey) — partkey on even bits,
    * suppkey on odd. */
  def zkey(pk: Column, sk: Column): Column =
    spreadBits(pk % 65536) + spreadBits(sk % 65536) * lit(2L)

  /** Z-bucket profile: bucket = zkey >> 12, i.e. 64×64 tiles of the
    * (partkey, suppkey) plane; per bucket, the count and the min/max of
    * BOTH dimensions. The bounded per-bucket widths (≤64 in each dim, vs
    * table-wide ranges) are the pruning guarantee the layout buys; output
    * is |occupied tiles|, corpus-size-independent for a fixed key domain.
    * One projection + one hash-agg: embarrassingly parallel. */
  def zorderBuckets(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select((col("l_partkey") % 65536).as("px"),
              (col("l_suppkey") % 65536).as("sx"))
    l.withColumn("z", zkey(col("px"), col("sx")))
      .withColumn("z_bucket",
        ((col("z") - col("z") % 4096) / 4096).cast("long"))
      .groupBy(col("z_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("px")).as("min_part"), max(col("px")).as("max_part"),
        min(col("sx")).as("min_supp"), max(col("sx")).as("max_supp"))
      .orderBy(col("z_bucket"))
  }

  /** Hilbert-curve distance of (x, y) on the 256×256 grid — the
    * locality-preserving successor to the Morton key (Delta/Iceberg
    * "liquid"-style clustering): unlike Z-order, consecutive Hilbert
    * distances are always ADJACENT cells, so an arbitrary curve range
    * maps to a compact region. The transform is the textbook top-down
    * quadrant walk, 8 unrolled rounds of pure integer CASE/AND arithmetic
    * (no XOR builtin needed: (3·rx)⊕ry over bits is a 4-case table), with
    * the n−1 reflection form so every intermediate stays in [0, 255] —
    * identical two's-complement math in Spark and DuckDB. */
  /** Applies the 8 rounds as CHAINED PROJECTIONS over columns (x, y, d),
    * not as one composed Column: Columns are expression TREES with no
    * sharing, so threading each round's x/y/d (each referencing the
    * previous round's full CASE trees ~3×) through a single expression
    * balloons to ~3⁸ nodes and hangs planning/codegen — the projection
    * chain keeps rounds as attribute references (CollapseProject leaves
    * multi-use non-cheap expressions un-inlined), linear in rounds. */
  def hilbertRounds(df: DataFrame): DataFrame =
    Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L).foldLeft(
      df.withColumn("x", col("px")).withColumn("y", col("sx"))
        .withColumn("d", lit(0L))) { (cur, s) =>
      val a = cur
        .withColumn("rx", when(col("x").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("ry", when(col("y").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
      a.select(col("px"), col("sx"),
        (col("d") + lit(s * s) *
          when(col("rx") === 1L && col("ry") === 1L, lit(2L))
            .when(col("rx") === 1L, lit(3L))
            .when(col("ry") === 1L, lit(1L))
            .otherwise(lit(0L))).as("d"),
        when(col("ry") === 0L,
          when(col("rx") === 1L, lit(255L) - col("y")).otherwise(col("y")))
          .otherwise(col("x")).as("x"),
        when(col("ry") === 0L,
          when(col("rx") === 1L, lit(255L) - col("x")).otherwise(col("x")))
          .otherwise(col("y")).as("y"))
    }

  /** Hilbert-bucket profile on (l_partkey, l_suppkey) % 256 — deliberately
    * bucketed at a NON-power-of-4 size (3000 cells), because that is where
    * Hilbert actually beats Z-order: at power-of-4-aligned boundaries both
    * curves partition into perfect square tiles (identical envelopes), but
    * real file boundaries are byte-sized, not subtree-aligned, and on
    * misaligned ranges the Morton curve's quadrant jumps blow up the
    * bounding box (measured on this grid: avg envelope area 4562 Hilbert
    * vs 7575 Morton at bucket 3000 — 1.66× tighter; ZorderLayoutSpec pins
    * the comparison). Same shape as `layout_zorder_buckets`: one
    * projection + one hash-agg, output bounded by the key domain. */
  def hilbertBuckets(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select((col("l_partkey") % 256).as("px"),
              (col("l_suppkey") % 256).as("sx"))
    hilbertRounds(l)
      .withColumn("h_bucket", expr("d DIV 3000"))
      .groupBy(col("h_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("px")).as("min_part"), max(col("px")).as("max_part"),
        min(col("sx")).as("min_supp"), max(col("sx")).as("max_supp"))
      .orderBy(col("h_bucket"))
  }

  /** The unrolled 8-round Hilbert walk as a DuckDB CTE chain — the same
    * integer CASE arithmetic, round for round. */
  private def hilbertSqlCtes: String =
    Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L).zipWithIndex.map { case (s, i) =>
      val prev = if (i == 0) "h0" else s"h${i}b"
      s"""h${i + 1}a AS (
         |  SELECT px, sx, d, x, y,
         |    CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |    CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry
         |  FROM $prev),
         |h${i + 1}b AS (
         |  SELECT px, sx,
         |    d + ${s * s} * (CASE rx * 2 + ry
         |      WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 2 END) AS d,
         |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN 255 - y ELSE y END
         |      ELSE x END AS x,
         |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN 255 - x ELSE x END
         |      ELSE y END AS y
         |  FROM h${i + 1}a)""".stripMargin
    }.mkString(",\n")

  /** Shard-balance audit — the OTHER layout question after clustering
    * (z-order/hilbert answer "are row groups tight"; this answers "is the
    * hash partitioning even"): documents assigned to 16 shards by an
    * md5 slice, per-shard counts with the signed deviation 16·O_s − n
    * (exact — no float, no negative DIV) and the χ² uniformity statistic
    * Σ(16·O_s − n)²/(16n) carried on every row (deviation squares
    * decimal-lifted: (16·O−n)² passes 2⁶³ near n ≈ 3e9). A skewed
    * χ² here means a hot shard at 100 TB — the audit you run BEFORE
    * committing to a bucketing key.
    *
    * Scale: one hash-agg to 16 rows; the χ² fold is over those 16. */
  def shardBalance(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 7),
        16, 10).cast("long"), lit(16L)).as("shard"))
      .groupBy(col("shard")).agg(count(lit(1)).as("n_docs"))
    val withDev = d
      .crossJoin(broadcast(d.agg(sum(col("n_docs")).as("n"))))
      .withColumn("dev_scaled", col("n_docs") * 16 - col("n"))
      .cache() // χ² fold + the per-shard output read it
    val chi = withDev.agg(
        sum(col("dev_scaled").cast("decimal(19,0)") * col("dev_scaled"))
          .as("dsum"),
        max(col("n")).as("nn"))
      .select(round(col("dsum").cast("double") /
        (lit(16.0) * col("nn").cast("double")), 6).as("chi2"))
    withDev.crossJoin(broadcast(chi))
      .select(col("shard"), col("n_docs"), col("dev_scaled"), col("chi2"))
      .orderBy(col("shard"))
  }

  /** Zone-map (file-skipping) statistics + a pruning simulation — the
    * manifest-level min/max stats a lakehouse table format (Iceberg/Delta)
    * keeps per data file, and the reason layout matters at 100 TB: a scan
    * with a ship-date predicate reads only files whose [min, max] envelope
    * intersects it. Two simulated file layouts over the SAME rows:
    * `insertion` (files cut by arrival order — orderkey ranges, so every
    * file's date envelope is table-wide) vs `clustered` (files cut by
    * ship month — the envelope IS the predicate grain). Per layout: file
    * count, and how many files/rows a one-month predicate skips. The
    * pruning delta between the two rows is the entire value proposition
    * of clustering, measured exactly.
    *
    * Scale: each layout is one hash-agg keyed by file_id (the zone-map
    * build is embarrassingly parallel and runs at write time in a real
    * table format); the simulation is an aggregate over |files| rows. */
  def zoneMaps(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    val lo = lit("1997-03-01").cast("timestamp")
    val hi = lit("1997-04-01").cast("timestamp")
    def layoutStats(name: String, fileId: Column): DataFrame = {
      val files = li.withColumn("file_id", fileId)
        .groupBy(col("file_id"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_shipdate")).as("mn"), max(col("l_shipdate")).as("mx"))
      val skipped = col("mx") < lo || col("mn") >= hi
      files.agg(
          count(lit(1)).as("n_files"),
          sum(col("n_rows")).as("total_rows"),
          sum(when(skipped, 1L).otherwise(0L)).as("files_pruned"),
          sum(when(skipped, col("n_rows")).otherwise(0L)).as("rows_pruned"))
        .select(lit(name).as("layout"), col("n_files"), col("total_rows"),
          col("files_pruned"), col("rows_pruned"),
          expr("rows_pruned * 1000000 DIV total_rows").as("prune_ppm"))
    }
    layoutStats("insertion", expr("l_orderkey DIV 2048"))
      .unionByName(layoutStats("clustered",
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate"))).cast("long")))
      .orderBy(col("layout"))
  }

  /** Compaction bin-packing plan — the maintenance operator a lakehouse
    * table runs over the `layout_zone_maps` manifest: small files from the
    * insertion layout (the same `l_orderkey DIV 2048` file grain) are
    * packed into target-size output bins (T = 4096 rows) by the
    * SORTED-CUMULATIVE rule: order files by size desc (id tie-break),
    * running-sum, bin = cum_before DIV T. This is the scalable relaxation
    * of first-fit-decreasing — bins are contiguous ranges of the sorted
    * manifest, so the bin count is ≤ ceil(total/T) — exact when
    * max_file ≤ T (a file larger than T can make cum_before skip a bin
    * index entirely, merging would-be bins) — and every bin's load is
    * < T + max_file (WriteLayoutSpec pins the bounds plus conservation;
    * the exact-count pin applies only under the max_file ≤ T
    * precondition).
    *
    * Scale stance: the plan runs over the FILE MANIFEST, not the data —
    * at 100 TB with 128 MB files that's ~800k manifest rows, and the one
    * unpartitioned running-sum window follows the W1 rule (window over an
    * aggregated, manifest-sized relation, never over facts). Real engines
    * (Iceberg rewriteDataFiles, Delta OPTIMIZE) shard this per partition
    * first; the per-shard plan is this exact shape. */
  def binpack(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val files = Tables.lineitem(spark, dir)
      .withColumn("file_id", expr("l_orderkey DIV 2048"))
      .groupBy(col("file_id")).agg(count(lit(1)).as("n_rows"))
    val w = Window.orderBy(col("n_rows").desc, col("file_id"))
    files.withColumn("cum_after", sum(col("n_rows")).over(w))
      .withColumn("bin", expr("(cum_after - n_rows) DIV 4096"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("bin_rows"),
        max(col("n_rows")).as("largest_file"),
        min(col("file_id")).as("first_file"))
      .orderBy(col("bin"))
  }

  /** Zone-map OVERLAP DEPTH — the clustering-quality number a lakehouse
    * optimizer reads before deciding to rewrite (Iceberg's
    * rewriteDataFiles / Delta OPTIMIZE ZORDER both report it): the
    * stabbing depth of the file min–max envelopes on the sort key, i.e.
    * how many files a point predicate at a file's start boundary must
    * open. depth(t) = #(files with mn ≤ t) − #(files with mx < t),
    * computed by two running sums over the DISTINCT boundary points;
    * probed at every file's own start (each file weighted once), per
    * layout: insertion-order files (table-wide envelopes → depth ≈
    * n_files) vs month-clustered files (depth ≈ files-per-month). The
    * insertion-vs-clustered depth gap IS the compaction ROI, measured
    * exactly on the same rows.
    *
    * All-integer (epoch-micro boundaries, exact counts, positive-DIV
    * ppm). Scale: the manifest hash-agg is the only corpus-sized pass;
    * the two windows run over the boundary-point relation (≤ 2·files
    * rows — the W1 manifest-window exception, like `layout_binpack`). */
  def overlapDepth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    def depthStats(name: String, fileId: Column): DataFrame = {
      val files = li.withColumn("file_id", fileId)
        .groupBy(col("file_id"))
        // l_shipdate is TIMESTAMP_NTZ; the UTC-session cast is the repo's
        // established epoch idiom (≡ DuckDB epoch_us on the same value)
        .agg(expr("unix_micros(CAST(min(l_shipdate) AS TIMESTAMP))").as("mn"),
          expr("unix_micros(CAST(max(l_shipdate) AS TIMESTAMP))").as("mx"))
      val starts = files.groupBy(col("mn").as("t"))
        .agg(count(lit(1)).as("ns"))
      val ends = files.groupBy(col("mx").as("t"))
        .agg(count(lit(1)).as("ne"))
      val pts = starts.join(ends, Seq("t"), "full_outer")
        .select(col("t"),
          coalesce(col("ns"), lit(0L)).as("ns"),
          coalesce(col("ne"), lit(0L)).as("ne"))
      val w = Window.orderBy(col("t"))
      val d = pts
        .withColumn("cs", sum(col("ns")).over(w))
        .withColumn("ce", sum(col("ne")).over(w))
        // files ending exactly AT t still cover t — subtract only mx < t
        .withColumn("depth", col("cs") - (col("ce") - col("ne")))
        .filter(col("ns") > 0)
      d.agg(
          sum(col("ns")).as("n_files"),
          max(col("depth")).as("max_depth"),
          expr("sum(ns * depth) * 1000000 DIV sum(ns)").as("avg_depth_ppm"))
        .select(lit(name).as("layout"), col("n_files"), col("max_depth"),
          col("avg_depth_ppm"))
    }
    depthStats("insertion", expr("l_orderkey DIV 2048"))
      .unionByName(depthStats("clustered",
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate"))).cast("long")))
      .orderBy(col("layout"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder_buckets" -> (zorderBuckets _),
    "layout_hilbert_buckets" -> (hilbertBuckets _),
    "layout_shard_balance" -> (shardBalance _),
    "layout_zone_maps" -> (zoneMaps _),
    "layout_binpack" -> (binpack _),
    "layout_overlap_depth" -> (overlapDepth _)
  )

  val oracle: Map[String, String] = Map(
    "layout_overlap_depth" -> {
      def block(name: String, fileExpr: String) =
        s"""SELECT '$name' AS layout, n_files, max_depth, avg_depth_ppm
           |FROM (
           |  WITH files AS (
           |    SELECT $fileExpr AS file_id,
           |      epoch_us(MIN(l_shipdate)) AS mn,
           |      epoch_us(MAX(l_shipdate)) AS mx
           |    FROM lineitem GROUP BY 1),
           |  starts AS (SELECT mn AS t, CAST(COUNT(*) AS BIGINT) AS ns
           |    FROM files GROUP BY 1),
           |  ends AS (SELECT mx AS t, CAST(COUNT(*) AS BIGINT) AS ne
           |    FROM files GROUP BY 1),
           |  pts AS (
           |    SELECT t, COALESCE(ns, 0) AS ns, COALESCE(ne, 0) AS ne
           |    FROM starts FULL JOIN ends USING (t)),
           |  d AS (
           |    SELECT ns,
           |      CAST(SUM(ns) OVER (ORDER BY t) AS BIGINT)
           |        - (CAST(SUM(ne) OVER (ORDER BY t) AS BIGINT) - ne)
           |        AS depth
           |    FROM pts)
           |  SELECT CAST(SUM(ns) AS BIGINT) AS n_files,
           |    CAST(MAX(depth) AS BIGINT) AS max_depth,
           |    CAST(SUM(ns * depth) * 1000000 // SUM(ns) AS BIGINT)
           |      AS avg_depth_ppm
           |  FROM d WHERE ns > 0)""".stripMargin
      block("insertion", "l_orderkey // 2048") + "\nUNION ALL\n" +
        block("clustered",
          "CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)") +
        "\nORDER BY layout"
    },
    "layout_binpack" ->
      """WITH files AS (
        |  SELECT l_orderkey // 2048 AS file_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows
        |  FROM lineitem GROUP BY 1),
        |planned AS (
        |  SELECT file_id, n_rows,
        |    CAST(SUM(n_rows) OVER (ORDER BY n_rows DESC, file_id) AS BIGINT)
        |      AS cum_after
        |  FROM files)
        |SELECT (cum_after - n_rows) // 4096 AS bin,
        |  COUNT(*) AS n_files,
        |  CAST(SUM(n_rows) AS BIGINT) AS bin_rows,
        |  CAST(MAX(n_rows) AS BIGINT) AS largest_file,
        |  CAST(MIN(file_id) AS BIGINT) AS first_file
        |FROM planned GROUP BY 1 ORDER BY bin""".stripMargin,
    "layout_zone_maps" -> {
      def block(name: String, fileExpr: String) =
        s"""SELECT '$name' AS layout,
           |  CAST(COUNT(*) AS BIGINT) AS n_files,
           |  CAST(SUM(n_rows) AS BIGINT) AS total_rows,
           |  CAST(SUM(CASE WHEN skipped THEN 1 ELSE 0 END) AS BIGINT)
           |    AS files_pruned,
           |  CAST(SUM(CASE WHEN skipped THEN n_rows ELSE 0 END) AS BIGINT)
           |    AS rows_pruned,
           |  CAST(SUM(CASE WHEN skipped THEN n_rows ELSE 0 END) AS BIGINT)
           |    * 1000000 // CAST(SUM(n_rows) AS BIGINT) AS prune_ppm
           |FROM (
           |  SELECT $fileExpr AS file_id,
           |    CAST(COUNT(*) AS BIGINT) AS n_rows,
           |    MAX(l_shipdate) < TIMESTAMP '1997-03-01'
           |      OR MIN(l_shipdate) >= TIMESTAMP '1997-04-01' AS skipped
           |  FROM lineitem GROUP BY 1)""".stripMargin
      s"""${block("insertion", "l_orderkey // 2048")}
         |UNION ALL
         |${block("clustered",
           "CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)")}
         |ORDER BY layout""".stripMargin
    },
    "layout_shard_balance" ->
      """WITH d AS (
        |  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
        |    % 16 AS shard
        |  FROM documents),
        |g AS (
        |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM d GROUP BY shard),
        |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM g),
        |w AS (
        |  SELECT shard, n_docs, n_docs * 16 - t.n AS dev_scaled, t.n
        |  FROM g CROSS JOIN t),
        |c AS (
        |  SELECT ROUND(CAST(SUM(CAST(dev_scaled AS HUGEINT) * dev_scaled)
        |      AS DOUBLE) / (16.0 * CAST(MAX(n) AS DOUBLE)), 6) AS chi2
        |  FROM w)
        |SELECT shard, n_docs, dev_scaled, c.chi2
        |FROM w CROSS JOIN c
        |ORDER BY shard""".stripMargin,
    "layout_zorder_buckets" -> {
      val z = s"(${spreadSql("px")} + ${spreadSql("sx")} * 2)"
      s"""WITH b AS (
         |  SELECT l_partkey % 65536 AS px, l_suppkey % 65536 AS sx
         |  FROM lineitem),
         |zc AS (
         |  SELECT px, sx, $z AS z FROM b)
         |SELECT CAST((z - (z % 4096)) / 4096 AS BIGINT) AS z_bucket,
         |  COUNT(*) AS n_rows,
         |  MIN(px) AS min_part, MAX(px) AS max_part,
         |  MIN(sx) AS min_supp, MAX(sx) AS max_supp
         |FROM zc
         |GROUP BY 1
         |ORDER BY 1""".stripMargin
    },
    "layout_hilbert_buckets" ->
      s"""WITH h0 AS (
         |  SELECT l_partkey % 256 AS px, l_suppkey % 256 AS sx,
         |    l_partkey % 256 AS x, l_suppkey % 256 AS y,
         |    CAST(0 AS BIGINT) AS d
         |  FROM lineitem),
         |$hilbertSqlCtes
         |SELECT CAST(d // 3000 AS BIGINT) AS h_bucket,
         |  COUNT(*) AS n_rows,
         |  MIN(px) AS min_part, MAX(px) AS max_part,
         |  MIN(sx) AS min_supp, MAX(sx) AS max_supp
         |FROM h8b
         |GROUP BY 1
         |ORDER BY 1""".stripMargin
  )
}
