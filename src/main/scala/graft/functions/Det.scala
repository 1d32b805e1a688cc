package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic floating-point aggregation helpers.
  *
  * Double summation is order-sensitive; across engines (Spark vs the DuckDB
  * oracle) and across partition layouts the last few ulps of a plain
  * `sum(double)` differ, which breaks hash-matching (SURVEY.md §7.6). The
  * harness contract compares results byte-wise, so every money aggregate in
  * the catalog goes through an exact decimal(18,2) sum — associative and
  * engine-independent — and is cast back to double at the very end.
  *
  * Oracle-side equivalents (DuckDB):
  *   dsum(c)  == CAST(SUM(CAST(c AS DECIMAL(18,2))) AS DOUBLE)
  *   davg(c)  == CAST(SUM(CAST(c AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c)
  */
object Det {
  /** Exact cents-resolution sum, returned as double. */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact-sum average: deterministic double (one IEEE division at the end). */
  def davg(c: Column): Column =
    dsum(c) / count(c)

  /** Exact discounted-revenue sum: SUM(price * (1 - discount)) computed
    * entirely in decimal. Casting the double *product* to decimal is NOT
    * engine-stable (price*(1-disc) lands exactly on half-cent boundaries,
    * where Spark's shortest-repr HALF_UP and DuckDB's binary rounding
    * disagree), so both factors are cast first and multiplied exactly.
    * Requires 2-decimal inputs (holds for all testdata money columns). */
  def drevenue(price: Column, discount: Column): Column =
    sum(price.cast(DecimalType(12, 2)) *
        (lit(1.0).cast(DecimalType(4, 2)) - discount.cast(DecimalType(4, 2))))
      .cast(DoubleType)
}
