package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.expressions.PolyHash

/** graft.expressions.PolyHash must equal the HOF formulation it replaced
  * (ascii-per-char fold) for ASCII and general BMP text. */
class PolyHashSpec extends SparkSpec {

  private def polyhash(c: org.apache.spark.sql.Column) =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c)))

  test("equals the ascii-fold HOF formulation on document words") {
    import spark.implicits._
    val words = Seq("spark", "a", "", "Hello,World", "café", "naïve-été", "数据")
      .toDF("w")
    val hof = aggregate(
      filter(transform(split(col("w"), ""), c => ascii(c).cast("long")), a => a > 0),
      lit(0L), (acc, a) => (acc * 31 + a) % PolyHash.Prime)
    val rows = words.select(polyhash(col("w")).as("fast"), hof.as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("null propagates, empty string hashes to 0") {
    import spark.implicits._
    val df = Seq(Some("x"), None).toDF("w")
    val got = df.select(polyhash(col("w"))).collect()
    assert(got.count(_.isNullAt(0)) == 1)
    assert(Seq("").toDF("w").select(polyhash(col("w"))).head().getLong(0) == 0L)
  }
}
