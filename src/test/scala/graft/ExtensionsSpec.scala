package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{DotProduct, PolyHash}
import org.apache.spark.sql.catalyst.expressions.Literal

/** GraftExtensions wiring: injection applies cleanly and the injected
  * builders construct working expressions. (Runtime SQL resolution of
  * graft_dot is covered end-to-end in DotProductSpec via the
  * functionRegistry path — same builder.) */
class ExtensionsSpec extends AnyFunSuite {

  test("injects both functions into a fresh SparkSessionExtensions") {
    new GraftExtensions().apply(new SparkSessionExtensions) // must not throw
  }

  test("builders construct evaluable expressions") {
    val dot = DotProduct(
      Literal.create(Seq(1.0, 2.0)), Literal.create(Seq(3.0, 4.0)))
    assert(dot.eval(null) == 11.0)
    val ph = PolyHash(Literal.create("ab"))
    assert(ph.eval(null) == (('a'.toLong * 31 + 'b') % PolyHash.Prime))
  }
}
