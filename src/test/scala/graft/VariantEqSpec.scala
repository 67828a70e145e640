package graft

import graft.cypher.Values
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.plans.VariantEq]] (native) must agree with `Values.eqTree`
  * (the composed-Column executable specification) on every operand pair —
  * including NaN, ±0.0, the 2^53 precision boundary, the 2^63 saturation
  * guard, cross-type pairs, nulls, and nested lists with null elements.
  * Both run through Spark execution, so codegen and interpreted paths of
  * the native expression are covered (the corpus runs large enough that
  * both compile and fallback paths appear).
  */
object VariantEqSpec {
  // kind: 0=int 1=float 2=string 3=bool 4=null 5=list(of scalars) 6=nested
  case class Cell(kind: Int, i: Long, f: Double, s: String, b: Boolean,
      l: Seq[Cell])
  case class FlatCell(kind: Int, i: Long, f: Double, s: String, b: Boolean)
  case class SubCell(kind: Int, i: Long, f: Double, s: String, b: Boolean,
      l: Seq[FlatCell])
  case class PairRow(
      a_kind: Int, a_i: Long, a_f: Double, a_s: String, a_b: Boolean,
      a_l: Seq[SubCell],
      b_kind: Int, b_i: Long, b_f: Double, b_s: String, b_b: Boolean,
      b_l: Seq[SubCell])
}

class VariantEqSpec extends AnyFunSuite {
  import SparkTestSession._
  import VariantEqSpec._

  private val scalarCell: Gen[Cell] = for {
    kind <- Gen.choose(0, 4)
    i <- Gen.oneOf(Gen.choose(-5L, 5L), Gen.oneOf(0L, 1L << 53, (1L << 53) + 1,
      Long.MaxValue, Long.MinValue))
    f <- Gen.oneOf(Gen.choose(-5.0, 5.0), Gen.oneOf(0.0, -0.0,
      Double.NaN, Double.PositiveInfinity, 9.3e18, (1L << 53).toDouble,
      ((1L << 53) + 1).toDouble, 2.0, 2.5))
    s <- Gen.oneOf("", "a", "b", "ab")
    b <- Gen.oneOf(true, false)
  } yield Cell(kind, i, f, s, b, Nil)

  private val genCell: Gen[Cell] = Gen.frequency(
    6 -> scalarCell,
    2 -> Gen.listOfN(2, scalarCell).map(l => Cell(5, 0, 0, "", false, l)),
    1 -> (for {
      inner <- Gen.listOfN(2, scalarCell)
      outer <- scalarCell
    } yield Cell(6, 0, 0, "", false,
      Seq(Cell(5, 0, 0, "", false, inner), outer))))

  private def variant(p: String): Column = {
    def scal(k: Column, i: Column, f: Column, s: Column, b: Column) =
      when(k === 0, Values.vInt(i))
        .when(k === 1, Values.vFloat(f))
        .when(k === 2, Values.vStr(s))
        .when(k === 3, Values.vBool(b))
        .otherwise(Values.vNull)
    def elemOf(e: Column) = Values.narrow(
      scal(e.getField("kind"), e.getField("i"), e.getField("f"),
        e.getField("s"), e.getField("b")))
    val k = col(s"${p}_kind")
    when(k <= 4, scal(k, col(s"${p}_i"), col(s"${p}_f"), col(s"${p}_s"),
      col(s"${p}_b")))
      .when(k === 5, Values.vArr(transform(col(s"${p}_l"), e => elemOf(e))))
      .otherwise(Values.vArr(transform(col(s"${p}_l"), e =>
        when(e.getField("kind") === 5,
          Values.narrow(Values.vArr(transform(e.getField("l"),
            i => Values.narrow(Values.widen(elemOf(i)))))))
          .otherwise(elemOf(e)))))
  }

  test("VariantEq ≡ eqTree on a 4000-pair generated corpus") {
    import SparkTestSession.implicits._
    val n = 4000
    val params = Gen.Parameters.default
    val cells = (0 until 2 * n).flatMap(i => genCell(params, Seed(7L + i)))
    assert(cells.size >= 2 * n * 95 / 100)
    def sub(c: Cell) = SubCell(c.kind, c.i, c.f, c.s, c.b,
      c.l.map(x => FlatCell(x.kind, x.i, x.f, x.s, x.b)))
    val pairs = cells.grouped(2).collect { case Seq(a, b) =>
      PairRow(a.kind, a.i, a.f, a.s, a.b, a.l.map(sub),
        b.kind, b.i, b.f, b.s, b.b, b.l.map(sub))
    }.toSeq
    // self-pairs too: equality's reflexivity edge cases (NaN, lists)
    val selfs = cells.take(500).map(a =>
      PairRow(a.kind, a.i, a.f, a.s, a.b, a.l.map(sub),
        a.kind, a.i, a.f, a.s, a.b, a.l.map(sub)))
    val df = (pairs ++ selfs).toDF()
    // project the variant constructors to ATTRIBUTES first: eqTree over a
    // constructor-tree operand re-expands it per reference (the very
    // explosion VariantEq exists to fix) and OOMs at plan build
    val vdf = df.select(variant("a").as("va"), variant("b").as("vb"),
      col("a_kind"), col("b_kind"), col("a_i"), col("b_i"),
      col("a_f"), col("b_f")).localCheckpoint(true)
    val va = vdf("va"); val vb = vdf("vb")
    // construct the native expression DIRECTLY rather than through
    // Values.eq, so this corpus keeps pinning native ≡ tree even if eq's
    // routing ever changes again (round 10 briefly dispatched adaptively)
    import org.apache.spark.sql.GraftColumn
    val native = GraftColumn.column(graft.plans.VariantEq(
      GraftColumn.expression(va), GraftColumn.expression(vb)))
    val cmp = vdf.select(
      native.as("native"),
      Values.eqTree(va, vb).as("tree"),
      col("a_kind"), col("b_kind"), col("a_i"), col("b_i"),
      col("a_f"), col("b_f"))
    val bad = cmp.filter(!(col("native") <=> col("tree"))).collect()
    assert(bad.isEmpty,
      s"${bad.length} disagreements; first: ${bad.take(3).mkString(" | ")}")
  }

  test("eq always takes the native single-evaluation expression") {
    import SparkTestSession.implicits._
    val df = Seq((5L, Map("k" -> 5L))).toDF("x", "m")
    // EVERY operand shape routes native — construction-time "cheapness"
    // cannot see that an attribute is a scan alias PushDownPredicates will
    // re-inline per tree reference (87 fuzz queries fell to interpreted
    // eval under an adaptive tree dispatch; see Values.eq scaladoc)
    val cheap = df.select(Values.eq(Values.vInt(col("x")),
      Values.vInt(lit(5))).as("r"))
    assert(cheap.queryExecution.analyzed.toString.contains("variant_eq"))
    val probe = df.select(Values.eq(
      Values.vInt(element_at(col("m"), "k")), Values.vInt(lit(5))).as("r"))
    assert(probe.queryExecution.analyzed.toString.contains("variant_eq"))
    assert(cheap.collect().head.getBoolean(0) === true)
    assert(probe.collect().head.getBoolean(0) === true)
  }
}
