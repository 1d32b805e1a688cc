package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst GENERATOR (table function) — the one extension-ladder
  * tier the scalar expressions (DotProduct, PolyHash), optimizer rule
  * (FoldGraftExpressions), and physical operator (AsOfJoinExec) don't
  * cover: a 1→N row producer usable from `LATERAL VIEW` / `explode`
  * position in SQL text, planned by Spark's own `GenerateExec`.
  *
  * Emits every `n`-word window of a whitespace-tokenized string — the
  * shingling primitive the dedup pipelines build from `transform` +
  * `slice` higher-order functions (Dedup.shingled), here as a native
  * generator: no intermediate array materialization per row, rows stream
  * straight out of the generate loop.
  *
  * Null/short inputs produce zero rows (the `explode(array())` contract).
  * Evaluation is `CodegenFallback`: GenerateExec only codegens the
  * built-in explode family, so a custom generator runs interpreted inside
  * a codegen'd pipeline — the documented cost of this tier (and why the
  * hot dedup paths keep the higher-order-function formulation).
  *
  * Ref: the reference tokenizes with split+flatMap
  * (/root/reference/code/02_RDDOperations.scala:238-253); this is the
  * same 1→N shape surfaced to SQL text.
  */
case class NGrams(text: Expression, n: Expression)
  extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, n)

  override def elementSchema: StructType =
    new StructType().add("ngram", StringType, nullable = false)

  override def prettyName: String = "graft_ngrams"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    val k0 = n.eval(input)
    if (t == null || k0 == null) Iterator.empty
    else {
      val k = k0.asInstanceOf[Int]
      val words = t.asInstanceOf[UTF8String].toString
        .split(" ").filter(_.nonEmpty)
      if (k <= 0 || words.length < k) Iterator.empty
      else (0 to words.length - k).iterator.map { i =>
        InternalRow(UTF8String.fromString(words.slice(i, i + k).mkString(" ")))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NGrams =
    copy(text = newChildren(0), n = newChildren(1))
}
