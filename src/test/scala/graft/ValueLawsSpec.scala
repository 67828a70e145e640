package graft

import graft.cypher.Values
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based laws for the Cypher value kernel (ternary comparison,
  * cross-type NULL semantics, global sort order) — the ScalaTest+ScalaCheck
  * analogue of the reference's value suites
  * (`tests/unit/test_value.cpp`, `tests/flow/test_value_comparisons.py`).
  *
  * Random scalar pairs are generated driver-side, loaded as ONE DataFrame,
  * and each law is evaluated as a violation-count expression over the whole
  * set (the laws run through the exact codegen'd expressions the engine
  * uses, not a Scala re-implementation).
  */
class ValueLawsSpec extends AnyFunSuite {
  import SparkTestSession._

  // kind: 0=int 1=float 2=string 3=bool 4=null
  case class Cell(kind: Int, i: Long, f: Double, s: String, b: Boolean)

  private val genCell: Gen[Cell] = for {
    kind <- Gen.choose(0, 4)
    i <- Gen.choose(-1000L, 1000L)
    f <- Gen.choose(-1000.0, 1000.0)
    s <- Gen.alphaStr.map(_.take(8))
    b <- Gen.oneOf(true, false)
  } yield Cell(kind, i, f, s, b)

  private def variant(p: String): Column = {
    val k = col(s"${p}_kind")
    when(k === 0, Values.vInt(col(s"${p}_i")))
      .when(k === 1, Values.vFloat(col(s"${p}_f")))
      .when(k === 2, Values.vStr(col(s"${p}_s")))
      .when(k === 3, Values.vBool(col(s"${p}_b")))
      .otherwise(Values.vNull)
  }

  private def pairsDf(n: Int) = {
    val pairs = Gen.listOfN(n, Gen.zip(genCell, genCell))
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L)).get
    import SparkTestSession.implicits._
    pairs.map { case (a, b) =>
      (a.kind, a.i, a.f, a.s, a.b, b.kind, b.i, b.f, b.s, b.b)
    }.toDF("a_kind", "a_i", "a_f", "a_s", "a_b",
      "b_kind", "b_i", "b_f", "b_s", "b_b")
      .select(variant("a").as("a"), variant("b").as("b"),
        col("a_kind"), col("b_kind"))
  }

  private def violations(df: org.apache.spark.sql.DataFrame,
      law: Column): Long =
    df.filter(coalesce(law, lit(false))).count()

  private lazy val df = pairsDf(2000).cache()
  private def a = col("a"); private def b = col("b")
  private def bothNum = Values.isNum(a) && Values.isNum(b)
  private def comparable = a.isNotNull && b.isNotNull &&
    (bothNum || Values.tag(a) === Values.tag(b))

  test("equality is reflexive for non-null scalars") {
    assert(violations(df, a.isNotNull && !Values.eq(a, a)) == 0)
  }

  test("comparison/equality with NULL operand is NULL") {
    assert(violations(df, (a.isNull || b.isNull) &&
      (Values.eq(a, b).isNotNull || Values.lt(a, b).isNotNull)) == 0)
  }

  test("incomparable cross-type: eq is false, lt is NULL (DISJOINT)") {
    val crossType = a.isNotNull && b.isNotNull && !bothNum &&
      Values.tag(a) =!= Values.tag(b)
    assert(violations(df, crossType && Values.eq(a, b) =!= false) == 0)
    assert(violations(df, crossType && Values.lt(a, b).isNotNull) == 0)
  }

  test("trichotomy: comparable pairs satisfy exactly one of < = >") {
    val cnt = coalesce(Values.lt(a, b).cast("int"), lit(0)) +
      coalesce(Values.eq(a, b).cast("int"), lit(0)) +
      coalesce(Values.gt(a, b).cast("int"), lit(0))
    assert(violations(df, comparable && cnt =!= 1) == 0)
  }

  test("antisymmetry and lte consistency") {
    assert(violations(df,
      Values.lt(a, b) && Values.lt(b, a)) == 0)
    assert(violations(df, comparable &&
      (Values.lte(a, b) =!= (Values.lt(a, b) || Values.eq(a, b)))) == 0)
  }

  test("orderKey agrees with lt on comparable pairs") {
    val ka = Values.orderKey(a); val kb = Values.orderKey(b)
    assert(violations(df, comparable &&
      coalesce(Values.lt(a, b), lit(false)) && !(ka < kb)) == 0)
  }

  test("arithmetic: NULL propagation, int/float promotion, commutativity") {
    import Values._
    // + * commutative (as values)
    assert(violations(df, a.isNotNull && b.isNotNull &&
      isNum(a) && isNum(b) &&
      !Values.eq(add(a, b), add(b, a))) == 0)
    assert(violations(df, a.isNotNull && b.isNotNull &&
      isNum(a) && isNum(b) &&
      !Values.eq(mul(a, b), mul(b, a))) == 0)
    // NULL operand → NULL result
    assert(violations(df, (a.isNull || b.isNull) &&
      add(a, b).isNotNull) == 0)
    // int+int stays int; any float operand promotes to float
    assert(violations(df, tag(a) === T_INT && tag(b) === T_INT &&
      tag(add(a, b)) =!= T_INT) == 0)
    assert(violations(df, isNum(a) && isNum(b) &&
      (tag(a) === T_FLOAT || tag(b) === T_FLOAT) &&
      tag(add(a, b)) =!= T_FLOAT) == 0)
    // non-numeric (non-string-concat, non-list) arithmetic → NULL
    assert(violations(df, a.isNotNull && b.isNotNull &&
      !(isNum(a) && isNum(b)) && sub(a, b).isNotNull) == 0)
  }

  test("nested lists: identity, ordering key stability, equality laws") {
    import Values._
    // [a] and [[a]] are distinct values; equal nested lists compare equal
    val la = vArr(array(narrow(a)))
    val lla = vArr(array(narrow(vArr(array(narrow(a))))))
    assert(violations(df, a.isNotNull &&
      coalesce(Values.eq(la, lla), lit(false))) == 0)
    assert(violations(df, a.isNotNull &&
      !coalesce(Values.eq(lla, lla), lit(false))) == 0)
    // orderKey respects nested equality: equal nested lists → equal keys
    assert(violations(df, a.isNotNull &&
      !(orderKey(lla) === orderKey(lla))) == 0)
    // distinct scalars produce distinct nested singletons
    assert(violations(df, a.isNotNull && b.isNotNull &&
      coalesce(Values.eq(a, b), lit(false)) =!=
      coalesce(Values.eq(lla, vArr(array(narrow(vArr(array(narrow(b))))))),
        lit(false))) == 0)
  }

  test("nested lists ORDER recursively (SIArray_Compare semantics)") {
    import Values._
    // [[1],[2]] < [[1],[3]] — element lists recurse instead of comparing
    // as incomparable (the round-4 flat-comparator deviation, closed by
    // plans.VariantArrayCmp)
    def lst(xs: Long*): Column =
      narrow(vArr(array(xs.map(x => narrow(vInt(lit(x)))): _*)))
    val one = spark.range(1).toDF("x")
    def evalB(c: Column): Any = one.select(c.as("r")).head().get(0)
    assert(evalB(lt(vArr(array(lst(1), lst(2))),
      vArr(array(lst(1), lst(3))))) == true)
    assert(evalB(lt(vArr(array(lst(1), lst(3))),
      vArr(array(lst(1), lst(2))))) == false)
    assert(evalB(Values.eq(vArr(array(lst(1), lst(2))),
      vArr(array(lst(1), lst(2))))) == true)
    // prefix rule still holds through nesting: [[1],[2]] vs [[1]] → longer
    assert(evalB(gt(vArr(array(lst(1), lst(2))), vArr(array(lst(1))))) == true)
    // null element inside a nested list → incomparable when reached
    assert(evalB(lt(vArr(array(narrow(vArr(array(
      lit(null).cast(elemType)))))),
      vArr(array(lst(1))))) == null)
    // nested ordering mirrors scalar ordering on comparable pairs
    val lla = vArr(array(narrow(vArr(array(narrow(a))))))
    val llb = vArr(array(narrow(vArr(array(narrow(b))))))
    assert(violations(df, comparable &&
      coalesce(lt(a, b), lit(false)) =!= coalesce(lt(lla, llb), lit(false)))
      == 0)
  }

  test("scalacheck: driver-side generator sanity (non-degenerate kinds)") {
    val prop = Prop.forAll(genCell)(c => c.kind >= 0 && c.kind <= 4)
    val res = SCTest.check(SCTest.Parameters.default, prop)
    assert(res.passed)
    // all five kinds appear in the generated corpus
    assert(df.select(countDistinct(col("a_kind"))).head().getLong(0) == 5L)
  }
}
