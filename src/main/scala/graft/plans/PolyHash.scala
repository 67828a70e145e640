package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_polyhash(s)` — engine-portable 62-bit string hash: two
  * polynomial rolling hashes over the byte sequence
  * (`h = ((acc*base + byte) mod 1e9+7)`, bases 31 and 131) packed as
  * `h31 · 2³¹ + h131`.
  *
  * Unlike xxhash64 this is reproducible in ANY engine with 64-bit integer
  * arithmetic (the DuckDB oracle computes the same fold with
  * `list_reduce`), which is what lets hash-bucketed operators (MinHash/LSH
  * dedup) be verified end-to-end against an independent SQL
  * implementation. Byte values equal code points for ASCII corpora (the
  * oracle folds `unicode(c)`); intermediate products stay < 2⁶³, final
  * value < 2⁶¹ — no overflow under ANSI arithmetic in either engine.
  * Collision odds at 62 bits are negligible for corpus-scale shingle sets.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash expects string, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_polyhash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < n) {
      val c = (s.getByte(i) & 0xff).toLong
      h1 = (h1 * 31 + c) % 1000000007L
      h2 = (h2 * 131 + c) % 1000000007L
      i += 1
    }
    h1 * 2147483648L + h2
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val c = ctx.freshName("c")
      s"""
         |final int $n = $s.numBytes();
         |long $h1 = 0L; long $h2 = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $c = (long) ($s.getByte($i) & 0xff);
         |  $h1 = ($h1 * 31L + $c) % 1000000007L;
         |  $h2 = ($h2 * 131L + $c) % 1000000007L;
         |}
         |${ev.value} = $h1 * 2147483648L + $h2;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  /** The DuckDB-SQL replication of `graft_polyhash(e)` — THE single source
    * for every oracle that reproduces the engine hash (MinHash, SimHash,
    * contamination, sampling splits). Lives next to the expression so the
    * two implementations can only change in lockstep.
    */
  def sql(e: String): String = {
    def fold(base: Int) =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |  list_transform(regexp_split_to_array($e, ''),
         |                 c -> unicode(c))),
         |  (acc, c) -> (acc * $base + c) % 1000000007)""".stripMargin
    s"(${fold(31)} * 2147483648 + ${fold(131)})"
  }
}
