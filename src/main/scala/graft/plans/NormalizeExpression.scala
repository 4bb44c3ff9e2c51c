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
    // Byte scan via getByte — s.getBytes would COPY whenever the
    // UTF8String is an offset slice of a shared row buffer (the common
    // codegen case); this path must stay allocation-free.
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
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

/** The FULL cleaning pass as one native scan — semantically identical to
  * the four chained rewrites the t30/c04 oracles pin in DuckDB SQL:
  *
  *   1. NFC normalize (UAX #15, JDK Normalizer)
  *   2. strip `[\p{Cc}\p{Cf}]` (controls + format chars, incl. ZWSP/BOM)
  *   3. if `asciiFold`: strip `[^\x00-\x7f]` (every non-ASCII code point)
  *   4. collapse `\s+` to one space, trim
  *
  * The chained form rewrites the whole document once PER STEP — four
  * regexp passes and three intermediate strings per row, the dominant
  * constant of the cleaning path (c04 was the most expensive gate in
  * BENCH at 4.6 s/sf0.1). This expression does all four in ONE pass.
  *
  * Equivalence argument (why one pass = the chain): after step 2 the
  * only ASCII whitespace left is the space itself (tab/CR/LF/VT/FF are
  * all Cc), so step 4's `\s+` only ever collapses space runs; a stripped
  * char BETWEEN two spaces merges their runs, which the single pass
  * reproduces by carrying a pending-space flag across skipped chars and
  * emitting at most one space before the next kept char. Leading and
  * trailing runs are never emitted — exactly `trim` after collapse.
  * Java's `\p{Cc}`/`\p{Cf}` match by `Character.getType`, the same
  * classifier used here, so kept/stripped sets are identical; CleanSpec
  * pins the parity against the literal regexp chain on random strings.
  *
  * ASCII fast path (virtually every web row): one byte scan via
  * `getByte` — no copy of a shared row buffer — and if the row is
  * already clean (no control bytes, no doubled/leading/trailing space)
  * the input UTF8String is returned uncopied.
  */
case class CleanTextExpr(child: Expression, asciiFold: Boolean)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_clean expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_clean"

  override def nullSafeEval(input: Any): Any =
    CleanTextExpr.clean(input.asInstanceOf[UTF8String], asciiFold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CleanTextExpr.clean($c, $asciiFold)")

  override protected def withNewChildInternal(newChild: Expression): CleanTextExpr =
    copy(child = newChild)
}

object CleanTextExpr {
  /** Called from generated code. */
  def clean(s: UTF8String, asciiFold: Boolean): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) cleanAscii(s) else cleanUnicode(s, asciiFold)
  }

  /** All-ASCII row: NFC is the identity and no Cf chars exist below
    * 0x80, so the pass reduces to: strip Cc bytes (<0x20 and 0x7F),
    * collapse/trim spaces. Already-clean rows return the input object.
    */
  private def cleanAscii(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var dirty = false
    var prevSpace = false
    while (!dirty && i < n) {
      val b = s.getByte(i)
      if (b < 0x20 || b == 0x7f) dirty = true
      else if (b == 0x20) {
        if (prevSpace || i == 0 || i == n - 1) dirty = true
        prevSpace = true
      } else prevSpace = false
      i += 1
    }
    if (!dirty) return s
    val out = new Array[Byte](n)
    var o = 0
    var pending = false
    i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b == 0x20) pending = true
      else if (b < 0x20 || b == 0x7f) () // Cc: stripped BEFORE collapse sees it
      else {
        if (pending && o > 0) { out(o) = 0x20; o += 1 }
        pending = false
        out(o) = b
        o += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  private def cleanUnicode(s: UTF8String, asciiFold: Boolean): UTF8String = {
    var str = s.toString
    if (!java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC))
      str = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(str.length)
    var pending = false
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      if (cp == 0x20) pending = true
      else {
        val t = Character.getType(cp)
        val drop = t == Character.CONTROL || t == Character.FORMAT ||
          (asciiFold && cp > 0x7f)
        if (!drop) {
          if (pending && sb.length > 0) sb.append(' ')
          pending = false
          sb.appendCodePoint(cp)
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }
}
