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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder_buckets" -> (zorderBuckets _)
  )

  val oracle: Map[String, String] = Map(
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
    }
  )
}
