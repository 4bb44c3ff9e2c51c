package graft.plans

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the polynomial rolling hash
  * (TextFunctions.rollingHash): one pass over the UTF8String bytes inside
  * whole-stage codegen.
  *
  * Why it exists (SURVEY §4 / builder-prompt custom-operator ladder): the
  * portable HOF formulation — `aggregate(sequence(1, len), …,
  * ascii(substr(s, i, 1)))` — allocates a position array and a substring
  * per character (O(n²) byte copying per string). This expression is the
  * (b)-tier replacement: a scalar `Expression` with `doGenCode`, ~10×
  * less work per row, no UDF serialization boundary. The gate queries
  * keep the portable HOF (its integer math is what the DuckDB oracle
  * mirrors); values are identical for 7-bit ASCII input — the synthetic
  * corpus and the reference's hashtags/shortcodes — and byte-level (not
  * codepoint-level) beyond ASCII, documented here.
  */
case class RollingHashExpr(child: Expression) extends UnaryExpression {

  // AbstractDataType (and with it ExpectsInputTypes) is private[sql] in
  // Spark 4 — input typing is enforced here instead
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hash expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHashExpr.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.RollingHashExpr.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

object RollingHashExpr {
  final val P = 1000000007L
  final val Mul = 31L

  /** Single-pass byte fold — called from generated code. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * Mul + (bytes(i) & 0xff)) % P
      i += 1
    }
    h
  }

  /** Register `graft_rolling_hash` in a session's function registry (the
    * same builder GraftExtensions injects at session construction).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHashExpr].getName, "graft_rolling_hash"),
      (children: Seq[Expression]) => RollingHashExpr(children.head))
}
