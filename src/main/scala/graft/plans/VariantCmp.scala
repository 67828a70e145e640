package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Ternary lexicographic comparison of two variant ARRAYS, recursing into
  * nested list elements (≡ the reference's `SIArray_Compare` calling
  * `SIValue_Compare` per element pair, `/root/reference/src/value.c:455-523`).
  *
  * Returns an Int code: 0 = equal, 1 = a<b, 2 = a>b, 3 = incomparable
  * (→ NULL at the boolean layer). The first non-equal element pair over the
  * common prefix decides; a null element or cross-type pair reached before a
  * decision yields 3; a fully-equal prefix falls through to list length
  * (TCK Comparison2 [4]: `[1,null] >= [1]` is true — the null is never
  * compared — while `[1,2] >= [1,null]` is null).
  *
  * Why a native expression and not a Column tree: the recursive compare
  * inlined through `zip_with`/`aggregate` multiplies Catalyst
  * optimize/codegen cost ×3 per nesting level (the round-4 flat comparator
  * was that trade), and higher-order functions are CodegenFallback anyway —
  * so the tree paid interpreted-setup cost per task WITHOUT recursion. One
  * compact JIT-compiled method gives full recursive semantics, a
  * constant-size plan, and cheaper per-row evaluation than either tree.
  * Depth is bounded statically by the variant schema (Values.MaxNest).
  */
case class VariantArrayCmp(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VariantArrayCmp =
    copy(left = newLeft, right = newRight)

  /** Per-nesting-level shape: field count of the element struct, ordinal of
    * its `arr` field (-1 at the depth floor), tail level.
    */
  private final case class Lvl(n: Int, arrIdx: Int, child: Lvl)

  private def lvlOf(st: StructType): Lvl = {
    val ai = st.fieldNames.indexOf("arr")
    if (ai < 0) Lvl(st.fields.length, -1, null)
    else Lvl(st.fields.length, ai, lvlOf(st.fields(ai).dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]))
  }

  @transient private lazy val leftLvl = lvlOf(left.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType])
  @transient private lazy val rightLvl = lvlOf(right.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType])

  // variant field ordinals (fixed layout: t,i,f,s,b[,arr])
  private val T = 0; private val I = 1; private val F = 2
  private val S = 3; private val B = 4
  private val TInt = 1; private val TFloat = 2; private val TString = 3
  private val TBool = 4; private val TArray = 5

  private def cmpElem(x: InternalRow, lx: Lvl,
      y: InternalRow, ly: Lvl): Int = {
    if (x == null || y == null) return 3
    val tx = x.getInt(T); val ty = y.getInt(T)
    val numX = tx == TInt || tx == TFloat
    val numY = ty == TInt || ty == TFloat
    if (numX && numY) {
      val dx = if (tx == TInt) x.getLong(I).toDouble else x.getDouble(F)
      val dy = if (ty == TInt) y.getLong(I).toDouble else y.getDouble(F)
      return if (dx < dy) 1 else if (dx > dy) 2 else 0
    }
    if (tx != ty) return 3
    tx match {
      case TString =>
        val c = x.getUTF8String(S).compareTo(y.getUTF8String(S))
        if (c < 0) 1 else if (c > 0) 2 else 0
      case TBool =>
        val bx = x.getBoolean(B); val by = y.getBoolean(B)
        if (bx == by) 0 else if (by) 1 else 2
      case TArray =>
        if (lx.arrIdx < 0 || ly.arrIdx < 0) 3 // below the depth floor
        else cmpArr(
          if (x.isNullAt(lx.arrIdx)) null else x.getArray(lx.arrIdx),
          lx.child,
          if (y.isNullAt(ly.arrIdx)) null else y.getArray(ly.arrIdx),
          ly.child)
      case _ => 3 // point/entity/other: no defined order
    }
  }

  private def cmpArr(a: ArrayData, la: Lvl, b: ArrayData, lb: Lvl): Int = {
    if (a == null || b == null) return 3
    val na = a.numElements(); val nb = b.numElements()
    val n = math.min(na, nb)
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) null else a.getStruct(i, la.n)
      val y = if (b.isNullAt(i)) null else b.getStruct(i, lb.n)
      val c = cmpElem(x, la, y, lb)
      if (c != 0) return c
      i += 1
    }
    if (na < nb) 1 else if (na > nb) 2 else 0
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    cmpArr(a.asInstanceOf[ArrayData], leftLvl,
      b.asInstanceOf[ArrayData], rightLvl)
  }

  override def prettyName: String = "variant_array_cmp"
}
