package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization — the first
  * step of the text-cleaning pass every web corpus runs before dedup and
  * tokenization (mojibake repair: a decomposed "e" + U+0301 must hash,
  * shingle, and dedup identically to the precomposed "é"; CCNet and C4
  * both normalize before fingerprinting for exactly this reason).
  *
  * Spark ships no NFC builtin, so this is the (b)-tier custom piece from
  * the builder ladder: a scalar `Expression` with `doGenCode` delegating
  * to `java.text.Normalizer` (the JDK's ICU-derived implementation of
  * UAX #15). The common all-ASCII case — virtually every row of a web
  * corpus — is detected with one byte scan and returns the input
  * UTF8String UNCOPIED (ASCII is closed under NFC), so the expression
  * runs at scan speed and only genuinely composed rows pay the
  * String-conversion round trip. Codegen keeps the call inside
  * whole-stage codegen (no UDF serialization boundary).
  *
  * Cross-engine contract: the t30 gate pins this against DuckDB's
  * `nfc_normalize` — both implement Unicode NFC, so values agree on any
  * input; the gate's fixture exercises combining marks explicitly.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalizeExpr.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  /** Called from generated code. ASCII fast path returns the input
    * object itself — no allocation, no copy.
    */
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "graft_nfc"),
      (children: Seq[Expression]) => NfcNormalizeExpr(children.head))
}
