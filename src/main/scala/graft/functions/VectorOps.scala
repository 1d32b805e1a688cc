package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns via higher-order functions —
  * SURVEY.md §7.5 (similarity search). All folds run in array order, so the
  * result is a bit-deterministic double reproducible by a sequential
  * `list_reduce` fold on the oracle side (no rounding needed).
  *
  * Inputs must be cast to array<double> FIRST (`array<float>` would
  * round each product to float and diverge from a double-arithmetic oracle).
  *
  * Scale note: HOFs are not whole-stage-codegen'd; if a bench shows the
  * pair-scoring stage dominated by fold overhead, the upgrade path is a
  * codegen'd Catalyst Expression with the same left-to-right semantics.
  */
object VectorOps {

  /** Sequential-fold dot product: ((0 + a0·b0) + a1·b1) + … */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm (IEEE sqrt is correctly rounded → engine-identical). */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine from precomputed norms (one division at the end). */
  def cosine(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)
}
