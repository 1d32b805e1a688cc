package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial string hash: fold over code points,
  * h ← (h·31 + codePoint) mod prime, seeded 0.
  *
  * Semantically identical to the higher-order-function formulation
  * `aggregate(filter(transform(split(w, ""), c => ascii(c)), a => a > 0),
  * 0L, (acc, a) => (acc*31 + a) % P)` used by the simhash pipeline
  * (Dedup.simhashClusters) for any string without NUL code points:
  * `split(w, "")` yields one code point per element, `ascii` returns it,
  * and the `> 0` filter only drops split's empty-string artifacts
  * (ascii("") = 0). Reproduced on the oracle side by DuckDB's
  * `list_reduce` over `string_split(w, '')` — engine-portable by
  * construction.
  *
  * Codegen emits a static call (the built-in pattern for non-trivial
  * scalar kernels): the fold runs as one JIT-friendly loop per row inside
  * whole-stage codegen instead of 3 interpreted lambda evals per character.
  */
case class PolyHash(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override def nullSafeEval(v: Any): Any =
    PolyHash.compute(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.PolyHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val Prime = 1000000007L

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % Prime
      i += Character.charCount(cp)
    }
    h
  }
}
