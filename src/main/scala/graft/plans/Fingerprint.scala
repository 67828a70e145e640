package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_fingerprint(s)` — the rolling content fingerprint of
  * [[graft.text.TextOps.fingerprint]] as ONE codegen'd expression:
  * fold `acc = (acc·31 + codepoint) mod 1e9+7` over the string's code
  * points.
  *
  * Value-identical to the composed built-in pipeline it replaces
  * (`aggregate(transform(split(text, ""), c -> ascii(c)), 0L,
  * (acc, c) -> (acc*31 + c) % 1000000007)`): `split(s, "")` yields one
  * piece per CODE POINT (Java regex never splits a surrogate pair),
  * `ascii` returns the piece's first code point, and the fold is a left
  * fold in index order — so iterating `codePointAt` directly reproduces
  * every intermediate value, including the empty-string case (split("")
  * = [""], ascii("") = 0 ⇒ fingerprint 0). The composed form is NOT used
  * because Spark higher-order functions are CodegenFallback: the lambda
  * interpreted `eval` boxes two invocations per character per row — the
  * hottest inner loop of the text-fingerprint pass at corpus scale. The
  * DuckDB oracle (`list_reduce(list_transform(regexp_split_to_array(...),
  * unicode), ...)`) is unchanged; FingerprintSpec pins native ≡ composed
  * on ASCII, multi-byte, astral, empty and NULL inputs.
  */
case class Fingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint expects string, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    Fingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Fingerprint.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Fingerprint {

  /** Left fold of (acc·31 + codepoint) mod 1e9+7 in code-point order.
    * Both factors stay far below 2⁶³ (acc < 1e9+7, cp ≤ 0x10FFFF), so the
    * arithmetic is exact in a Long — same domain the composed pipeline
    * (and the DuckDB oracle's overflow-checked BIGINT) relies on.
    */
  def compute(text: UTF8String): Long = {
    val s = text.toString
    val n = s.length
    var acc = 0L
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }
}
