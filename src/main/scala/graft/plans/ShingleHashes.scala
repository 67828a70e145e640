package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_shingle_hashes(text, k)` — the per-document shingle pass of the
  * MinHash/Jaccard dedup family ([[graft.dedup.Dedup]]) as ONE codegen'd
  * expression: tokenize (trim → lower → split `\s+`), slide a k-token
  * window, and [[PolyHash]] each k-gram, returning `array<long>`.
  *
  * Value-identical to the composed built-in pipeline it replaces
  * (`transform(sequence(1, greatest(n-k+1, 1)),
  *    i -> graft_polyhash(concat_ws(' ', slice(tokens, i, k))))`)
  * — same trim/lower/split primitives, same `concat_ws` byte layout
  * (0x20 separators), same [[PolyHash]] fold — so the DuckDB oracle SQL is
  * unchanged. The composed form is NOT used because Spark higher-order
  * functions are `CodegenFallback`: the lambda interpreted `eval` re-ran
  * the regex split once per window position (O(tokens · |text|) string
  * work per document), ran outside whole-stage codegen, and its
  * JIT-state-sensitive interpreted loop was the round-6..8
  * `q_dedup_minhash` cold-run bistability. Here the whole pass is a single
  * static-method call inside generated code: O(|text| · k) byte work, no
  * per-window re-tokenization, nothing interpreted.
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes expects string, got ${child.dataType.sql}")
    else if (k < 1) TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes expects k >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_hashes"

  // NULL text behaves like '' (one empty gram, hash 0) — parity with the
  // composed pipeline this replaces: there, `greatest(null, 1)` = 1 and
  // `concat_ws` skips the null token array, yielding one "" gram. The
  // DuckDB oracle reproduces that, so the hash gate depends on it.
  override def nullable: Boolean = false

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    val s =
      if (v == null) UTF8String.EMPTY_UTF8 else v.asInstanceOf[UTF8String]
    ShingleHashes.compute(s, k)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val in = ctx.freshName("shtext")
    ev.copy(
      code = code"""
        |${childGen.code}
        |org.apache.spark.unsafe.types.UTF8String $in =
        |  ${childGen.isNull}
        |    ? org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
        |    : ${childGen.value};
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  graft.plans.ShingleHashes.compute($in, $k);
        """.stripMargin,
      isNull =
        org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {

  private val WhitespaceRx = UTF8String.fromString("\\s+")

  /** Tokens exactly as `split(lower(trim(text)), "\\s+")` produces them:
    * `UTF8String.trim` (spaces only), collation-default lowercase (the
    * `Lower` expression's UTF8_BINARY + ICU case mapping path), regex
    * split keeping trailing empties (limit -1).
    */
  private def tokenize(text: UTF8String): Array[UTF8String] =
    org.apache.spark.sql.catalyst.util.CollationSupport.Lower
      .exec(text.trim(), 0, true)
      .split(WhitespaceRx, -1)

  /** All k-gram polyhashes of `text` in one pass. Mirrors the window rule
    * of the composed pipeline: `max(numTokens - (k-1), 1)` windows, window
    * i covering tokens `[i, min(i+k, n))` (shorter-than-k docs produce one
    * short gram), gram bytes = token bytes joined by 0x20, hash =
    * [[PolyHash]]'s dual 31/131 polynomial fold.
    */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val toks = tokenize(text)
    val n = toks.length
    val g = math.max(n - (k - 1), 1)
    val out = new Array[Long](g)
    var i = 0
    while (i < g) {
      var h1 = 0L
      var h2 = 0L
      val end = math.min(i + k, n)
      var t = i
      while (t < end) {
        if (t > i) { // the concat_ws(" ") separator byte
          h1 = (h1 * 31 + 0x20) % 1000000007L
          h2 = (h2 * 131 + 0x20) % 1000000007L
        }
        val tok = toks(t)
        val m = tok.numBytes()
        var j = 0
        while (j < m) {
          val c = (tok.getByte(j) & 0xff).toLong
          h1 = (h1 * 31 + c) % 1000000007L
          h2 = (h2 * 131 + c) % 1000000007L
          j += 1
        }
        t += 1
      }
      out(i) = h1 * 2147483648L + h2
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}
