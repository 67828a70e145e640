package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Cypher `=` over two variant structs as ONE native expression — the
  * ternary-equality semantics of `Values.eq`'s composed Column tree
  * (`graft.cypher.Values`), value-identical branch for branch.
  *
  * Why native: the composed tree references each operand ~30 times. After
  * predicate pushdown inlines the scan's flat-column alias, a non-trivial
  * operand (`element_at(props, k)`) is re-generated at every reference —
  * the TCK MatchWhere1 [10] disjunctive-WHERE shape produced 1.8 MB of
  * generated Java, fell past Janino's 64 KB method limit, and the filter
  * ran interpreted. Catalyst's late `PushDownPredicates` re-run (the
  * "Pushdown Filters from PartitionPruning" batch) undoes any alias-based
  * CSE, and the `With` rewrite batch runs before extension rules can
  * inject one — so single-evaluation must be structural: here each operand
  * is evaluated exactly once and the whole compare is one JIT-compiled
  * method (precedent: [[VariantArrayCmp]] ≡ the reference's
  * `SIValue_Compare` family, `/root/reference/src/value.c:148-304`).
  *
  * Semantics (all mirrored from the Column tree, enforced by ValueLawsSpec
  * + the TCK equality features):
  *   - NULL operand → NULL; NaN equals nothing AT TOP LEVEL (IEEE), while
  *     ELEMENT-level numeric equality follows Spark's `=` (NaN = NaN);
  *   - mixed int/float requires the double to round-trip the long exactly
  *     (2^53+1 ≠ 2^53.0), saturating above 2^63;
  *   - cross-type → false; string/boxed compare canonical text; lists
  *     compare pairwise ternary (length mismatch false, any definite
  *     mismatch false, else any null-compare null, else true);
  *   - temporal: date/localtime by instant, time by offset-normalized
  *     nano-of-day, (local)datetime by (i, f), duration by all components;
  *     element-level temporal compares all fields null-safely;
  *   - same-tag fallthrough (node/edge/point/boxed-map) = struct equiv.
  */
case class VariantEq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "variant_eq"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
    right.dataType) match {
    case (l: StructType, r: StructType)
      if l.fieldNames.contains("t") && r.fieldNames.contains("t") =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"variant_eq expects two variant structs, got $other")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VariantEq =
    copy(left = newLeft, right = newRight)

  /** Per-nesting-level struct shape (see [[VariantArrayCmp]]). */
  private final case class Lvl(n: Int, arrIdx: Int, child: Lvl)
  private def lvlOf(st: StructType): Lvl = {
    val ai = st.fieldNames.indexOf("arr")
    if (ai < 0) Lvl(st.fields.length, -1, null)
    else Lvl(st.fields.length, ai, lvlOf(st.fields(ai).dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]))
  }
  @transient private lazy val leftLvl =
    lvlOf(left.dataType.asInstanceOf[StructType])
  @transient private lazy val rightLvl =
    lvlOf(right.dataType.asInstanceOf[StructType])

  // variant field ordinals (fixed layout: t,i,f,s,b[,arr])
  private val T = 0; private val I = 1; private val F = 2
  private val S = 3; private val B = 4
  private val TInt = 1; private val TFloat = 2; private val TString = 3
  private val TBool = 4; private val TArray = 5; private val TBoxed = 9
  private val TDate = 11; private val TDuration = 16

  private val True = java.lang.Boolean.TRUE
  private val False = java.lang.Boolean.FALSE

  /** Ternary AND over boxed booleans (null = unknown). */
  private def and3(a: java.lang.Boolean,
      b: java.lang.Boolean): java.lang.Boolean =
    if (a == False || b == False) False
    else if (a == null || b == null) null
    else True

  /** `x.getField(f) === y.getField(f)` on long fields (null-propagating). */
  private def eqLong(x: InternalRow, y: InternalRow,
      f: Int): java.lang.Boolean =
    if (x.isNullAt(f) || y.isNullAt(f)) null
    else java.lang.Boolean.valueOf(x.getLong(f) == y.getLong(f))

  /** Spark `=` on double fields (codegen semantics: NaN = NaN true). */
  private def eqDoubleSpark(dx: Double, dy: Double): Boolean =
    dx == dy || (java.lang.Double.isNaN(dx) && java.lang.Double.isNaN(dy))

  /** `<=>` on a field pair, with Spark double/string equiv semantics. */
  private def nullSafeFieldEq(x: InternalRow, y: InternalRow, f: Int,
      dt: DataType): Boolean = {
    val nx = x.isNullAt(f); val ny = y.isNullAt(f)
    if (nx || ny) nx == ny
    else dt match {
      case LongType => x.getLong(f) == y.getLong(f)
      case DoubleType => eqDoubleSpark(x.getDouble(f), y.getDouble(f))
      case StringType => x.getUTF8String(f) == y.getUTF8String(f)
      case BooleanType => x.getBoolean(f) == y.getBoolean(f)
      case IntegerType => x.getInt(f) == y.getInt(f)
      case _ => false
    }
  }

  private def tagOf(r: InternalRow): Int =
    if (r.isNullAt(T)) -1 else r.getInt(T)

  /** Top-level equality (`Values.eq`). */
  private[plans] def topEq(x: InternalRow, lx: Lvl, y: InternalRow,
      ly: Lvl): java.lang.Boolean = {
    if (x == null || y == null) return null
    val tx = tagOf(x); val ty = tagOf(y)
    val numX = tx == TInt || tx == TFloat
    val numY = ty == TInt || ty == TFloat
    if (numX && numY) {
      // NaN equals nothing, including itself
      if ((tx == TFloat && !x.isNullAt(F) &&
          java.lang.Double.isNaN(x.getDouble(F))) ||
        (ty == TFloat && !y.isNullAt(F) &&
          java.lang.Double.isNaN(y.getDouble(F)))) return False
      if (tx == TInt && ty == TInt) return eqLong(x, y, I)
      if (tx == TFloat && ty == TFloat) {
        if (x.isNullAt(F) || y.isNullAt(F)) return null
        return java.lang.Boolean.valueOf(x.getDouble(F) == y.getDouble(F))
      }
      // mixed int/float: exact round-trip equality, saturation-guarded
      val (ir, fr) = if (tx == TInt) (x, y) else (y, x)
      if (ir.isNullAt(I) || fr.isNullAt(F)) return null
      val ia = ir.getLong(I); val fb = fr.getDouble(F)
      if (math.abs(fb) > 9.223372036854775e18) return False
      return java.lang.Boolean.valueOf(
        ia.toDouble == fb && ia == fb.toLong)
    }
    if (tx != ty) return False
    tx match {
      case TString | TBoxed =>
        if (x.isNullAt(S) || y.isNullAt(S)) null
        else java.lang.Boolean.valueOf(
          x.getUTF8String(S) == y.getUTF8String(S))
      case TBool =>
        if (x.isNullAt(B) || y.isNullAt(B)) null
        else java.lang.Boolean.valueOf(x.getBoolean(B) == y.getBoolean(B))
      case TArray =>
        if (lx.arrIdx < 0 || ly.arrIdx < 0) structEquiv(x, lx, y, ly)
        else pairEq(
          if (x.isNullAt(lx.arrIdx)) null else x.getArray(lx.arrIdx),
          lx.child,
          if (y.isNullAt(ly.arrIdx)) null else y.getArray(ly.arrIdx),
          ly.child)
      case 11 | 12 => eqLong(x, y, I) // date / localtime: instant only
      case 13 => // time: offset-normalized nano-of-day
        if (x.isNullAt(I) || x.isNullAt(F) || y.isNullAt(I) ||
          y.isNullAt(F)) null
        else java.lang.Boolean.valueOf(
          x.getLong(I).toDouble - x.getDouble(F) * 1e9d ==
            y.getLong(I).toDouble - y.getDouble(F) * 1e9d)
      case 14 | 15 => // (local)datetime: (i, f) with ternary AND
        and3(eqLong(x, y, I),
          if (x.isNullAt(F) || y.isNullAt(F)) null
          else java.lang.Boolean.valueOf(
            x.getDouble(F) == y.getDouble(F)))
      case 16 => // duration: all normalized components
        and3(and3(eqLong(x, y, I),
          if (x.isNullAt(F) || y.isNullAt(F)) null
          else java.lang.Boolean.valueOf(x.getDouble(F) == y.getDouble(F))),
          if (x.isNullAt(S) || y.isNullAt(S)) null
          else java.lang.Boolean.valueOf(
            x.getUTF8String(S) == y.getUTF8String(S)))
      case _ => structEquiv(x, lx, y, ly) // node/edge/point/boxed-map
    }
  }

  /** Element-level equality (`Values.scalarEq` / sub1Eq / sub0Eq —
    * identical at every depth except list recursion availability).
    */
  private def elemEq(x: InternalRow, lx: Lvl, y: InternalRow,
      ly: Lvl): java.lang.Boolean = {
    if (x == null || y == null) return null
    val tx = tagOf(x); val ty = tagOf(y)
    val numX = tx == TInt || tx == TFloat
    val numY = ty == TInt || ty == TFloat
    if (numX && numY) {
      // element numerics compare as plain Spark doubles (NaN = NaN true)
      if ((if (tx == TInt) x.isNullAt(I) else x.isNullAt(F)) ||
        (if (ty == TInt) y.isNullAt(I) else y.isNullAt(F))) return null
      val dx = if (tx == TInt) x.getLong(I).toDouble else x.getDouble(F)
      val dy = if (ty == TInt) y.getLong(I).toDouble else y.getDouble(F)
      return java.lang.Boolean.valueOf(eqDoubleSpark(dx, dy))
    }
    if (tx != ty) return False
    tx match {
      case TString | TBoxed =>
        if (x.isNullAt(S) || y.isNullAt(S)) null
        else java.lang.Boolean.valueOf(
          x.getUTF8String(S) == y.getUTF8String(S))
      case TBool =>
        if (x.isNullAt(B) || y.isNullAt(B)) null
        else java.lang.Boolean.valueOf(x.getBoolean(B) == y.getBoolean(B))
      case TArray if lx.arrIdx >= 0 && ly.arrIdx >= 0 =>
        pairEq(
          if (x.isNullAt(lx.arrIdx)) null else x.getArray(lx.arrIdx),
          lx.child,
          if (y.isNullAt(ly.arrIdx)) null else y.getArray(ly.arrIdx),
          ly.child)
      case t if t >= TDate && t <= TDuration =>
        // i <=> i && f <=> f && s <=> s (all null-safe → definite result)
        java.lang.Boolean.valueOf(
          nullSafeFieldEq(x, y, I, LongType) &&
            nullSafeFieldEq(x, y, F, DoubleType) &&
            nullSafeFieldEq(x, y, S, StringType))
      case _ => null
    }
  }

  /** Ternary pairwise list equality (`Values.listPairEq`). */
  private def pairEq(a: ArrayData, la: Lvl, b: ArrayData,
      lb: Lvl): java.lang.Boolean = {
    if (a == null || b == null) return null
    val na = a.numElements(); val nb = b.numElements()
    if (na != nb) return False
    var anyNull = false
    var i = 0
    while (i < na) {
      val x = if (a.isNullAt(i)) null else a.getStruct(i, la.n)
      val y = if (b.isNullAt(i)) null else b.getStruct(i, lb.n)
      val e = elemEq(x, la, y, lb)
      if (e == False) return False
      if (e == null) anyNull = true
      i += 1
    }
    if (anyNull) null else True
  }

  /** Catalyst `=` on whole same-tag structs (EqualTo struct semantics:
    * field-wise equiv, null fields equal iff both null) — the tree's
    * `.otherwise(a === b)` branch for node/edge/point/boxed-map tags.
    */
  private def structEquiv(x: InternalRow, lx: Lvl, y: InternalRow,
      ly: Lvl): java.lang.Boolean = {
    if (lx.n != ly.n) return False
    var ok = nullSafeFieldEq(x, y, T, IntegerType) &&
      nullSafeFieldEq(x, y, I, LongType) &&
      nullSafeFieldEq(x, y, F, DoubleType) &&
      nullSafeFieldEq(x, y, S, StringType) &&
      nullSafeFieldEq(x, y, B, BooleanType)
    if (ok && lx.arrIdx >= 0) {
      val nx = x.isNullAt(lx.arrIdx); val ny = y.isNullAt(ly.arrIdx)
      ok =
        if (nx || ny) nx == ny
        else {
          val a = x.getArray(lx.arrIdx); val b = y.getArray(ly.arrIdx)
          val na = a.numElements()
          na == b.numElements() && {
            var i = 0; var eq = true
            while (eq && i < na) {
              val ex = if (a.isNullAt(i)) null else a.getStruct(i, lx.child.n)
              val ey = if (b.isNullAt(i)) null else b.getStruct(i, ly.child.n)
              eq =
                if (ex == null || ey == null) ex == ey
                else structEquiv(ex, lx.child, ey, ly.child) == True
              i += 1
            }
            eq
          }
        }
    }
    java.lang.Boolean.valueOf(ok)
  }

  /** Codegen entry: boxed ternary result over non-null operand structs. */
  def compute(x: InternalRow, y: InternalRow): java.lang.Boolean =
    topEq(x, leftLvl, y, rightLvl)

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else compute(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
  }

  /** Codegen: the scalar tag pairs (int/float/mixed-numeric/string/bool —
    * the overwhelming majority of runtime compares) are INLINE primitive
    * Java, branch-for-branch the [[topEq]] semantics; only composite and
    * temporal tags (arrays, boxed, dates, durations, same-null-tag struct
    * equivalence) pay the boxed per-row [[compute]] call. This keeps the
    * hot path free of virtual dispatch and Boolean boxing while the cold
    * branches reuse the interpreted kernel (one source of truth for the
    * recursive cases; VariantEqSpec pins inline ≡ tree on a value corpus).
    */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val self = ctx.addReferenceObj("veq", this, classOf[VariantEq].getName)
    val a = left.genCode(ctx)
    val b = right.genCode(ctx)
    val x = ctx.freshName("veqx"); val y = ctx.freshName("veqy")
    val tx = ctx.freshName("veqtx"); val ty = ctx.freshName("veqty")
    val ir = ctx.freshName("veqir"); val fr = ctx.freshName("veqfr")
    val ia = ctx.freshName("veqia"); val fb = ctx.freshName("veqfb")
    val r = ctx.freshName("veqr")
    val row = "org.apache.spark.sql.catalyst.InternalRow"
    // field ordinals / tags as code text (the block interpolator takes
    // strings and ExprValues, not raw Ints)
    val (fT, fI, fF, fS, fB) =
      (T.toString, I.toString, F.toString, S.toString, B.toString)
    val (tInt, tFloat, tString, tBool, tBoxed) = (TInt.toString,
      TFloat.toString, TString.toString, TBool.toString, TBoxed.toString)
    ev.copy(code = code"""
      |${a.code}
      |${b.code}
      |boolean ${ev.isNull} = true;
      |boolean ${ev.value} = false;
      |if (!${a.isNull} && !${b.isNull}) {
      |  $row $x = ${a.value};
      |  $row $y = ${b.value};
      |  int $tx = $x.isNullAt($fT) ? -1 : $x.getInt($fT);
      |  int $ty = $y.isNullAt($fT) ? -1 : $y.getInt($fT);
      |  if (($tx == $tInt || $tx == $tFloat) &&
      |      ($ty == $tInt || $ty == $tFloat)) {
      |    if (($tx == $tFloat && !$x.isNullAt($fF) &&
      |         Double.isNaN($x.getDouble($fF))) ||
      |        ($ty == $tFloat && !$y.isNullAt($fF) &&
      |         Double.isNaN($y.getDouble($fF)))) {
      |      ${ev.isNull} = false; // NaN equals nothing, incl. itself
      |    } else if ($tx == $tInt && $ty == $tInt) {
      |      if (!$x.isNullAt($fI) && !$y.isNullAt($fI)) {
      |        ${ev.isNull} = false;
      |        ${ev.value} = $x.getLong($fI) == $y.getLong($fI);
      |      }
      |    } else if ($tx == $tFloat && $ty == $tFloat) {
      |      if (!$x.isNullAt($fF) && !$y.isNullAt($fF)) {
      |        ${ev.isNull} = false;
      |        ${ev.value} = $x.getDouble($fF) == $y.getDouble($fF);
      |      }
      |    } else {
      |      $row $ir = $tx == $tInt ? $x : $y;
      |      $row $fr = $tx == $tInt ? $y : $x;
      |      if (!$ir.isNullAt($fI) && !$fr.isNullAt($fF)) {
      |        long $ia = $ir.getLong($fI);
      |        double $fb = $fr.getDouble($fF);
      |        ${ev.isNull} = false;
      |        // exact round-trip equality, saturation-guarded at 2^63
      |        ${ev.value} = Math.abs($fb) <= 9.223372036854775e18 &&
      |          ((double) $ia) == $fb && $ia == (long) $fb;
      |      }
      |    }
      |  } else if ($tx != $ty) {
      |    ${ev.isNull} = false; // cross-type (incl. one null tag) -> false
      |  } else if ($tx == $tString || $tx == $tBoxed) {
      |    if (!$x.isNullAt($fS) && !$y.isNullAt($fS)) {
      |      ${ev.isNull} = false;
      |      ${ev.value} = $x.getUTF8String($fS).equals($y.getUTF8String($fS));
      |    }
      |  } else if ($tx == $tBool) {
      |    if (!$x.isNullAt($fB) && !$y.isNullAt($fB)) {
      |      ${ev.isNull} = false;
      |      ${ev.value} = $x.getBoolean($fB) == $y.getBoolean($fB);
      |    }
      |  } else {
      |    // composite/temporal tags: the interpreted recursive kernel
      |    java.lang.Boolean $r = $self.compute($x, $y);
      |    if ($r != null) { ${ev.isNull} = false; ${ev.value} = $r; }
      |  }
      |}
      """.stripMargin)
  }
}
