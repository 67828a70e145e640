package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.DataType

/** Driver-side holder for a late-bound query parameter value (stored in
  * Catalyst INTERNAL representation — UTF8String / InternalRow / ArrayData).
  *
  * The box is what makes a translated plan re-executable with new parameter
  * values: tasks serialize the references array (box included) at job
  * submission, so each execution ships the value bound at that moment while
  * the physical plan — and its generated code, which never inlines the
  * value — is reused verbatim. Rebinding between executions is safe because
  * writers serialize under the session write lock.
  */
final class ParamBox(val name: String) extends Serializable {
  @volatile var value: Any = null
}

/** A parameter placeholder expression (≡ the reference's plan-cache
  * parameterization: plans compile once per query string and params bind per
  * execution, `/root/reference/src/commands/execution_ctx.c:79-87`).
  *
  * Not foldable (constant folding would bake the first binding in);
  * deterministic within an execution, so filter pushdown through the plan
  * stays legal. Codegen reads the box via the references array — the
  * generated source is identical for every binding, so the Janino cache hits
  * across executions.
  */
case class ParamRef(box: ParamBox, dataType: DataType)
    extends LeafExpression {
  override def nullable: Boolean = true
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = box.value

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxRef =
      ctx.addReferenceObj("paramBox", box, classOf[ParamBox].getName)
    val javaType = CodeGenerator.javaType(dataType)
    val boxedType = CodeGenerator.boxedType(dataType)
    val obj = ctx.freshName("paramVal")
    ev.copy(code = code"""
      Object $obj = $boxRef.value();
      boolean ${ev.isNull} = $obj == null;
      $javaType ${ev.value} = ${ev.isNull}
        ? ${CodeGenerator.defaultValue(dataType)} : (($boxedType) $obj);""")
  }

  override def toString: String = s"$$${box.name}"
}
