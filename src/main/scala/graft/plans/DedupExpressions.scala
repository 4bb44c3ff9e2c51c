package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native single-pass kernels for the near-dup signature pipelines
  * (builder-prompt custom-operator ladder, tier (b): scalar Catalyst
  * `Expression` with `doGenCode`).
  *
  * Why they exist: the portable HOF formulations compute
  *  - 64 MinHash signatures as 64 `array_min(transform(shs, …))` passes —
  *    64 intermediate array allocations + traversals per row;
  *  - a 64-bit SimHash as 16 lane-packed `aggregate` passes over the
  *    token-hash array.
  * Each kernel here is ONE loop over the input array with zero
  * allocations beyond the result, inside whole-stage codegen. The integer
  * math ((a·s + b) mod P mins; majority-bit counting) is IDENTICAL to the
  * HOF versions — PropertySpec asserts bit-equality — so the DuckDB
  * oracles (which mirror the HOF math) are unchanged.
  *
  * Reference analog: the MinHash/SimHash dedup extensions (builder
  * prompt); the reference itself dedups exactly (Preprocessor.py:161-167).
  */
case class MinHashSigsExpr(child: Expression, numPerms: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sigs expects ARRAY<BIGINT>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    MinHashSigsExpr.sigs(input.asInstanceOf[ArrayData], numPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MinHashSigsExpr.sigs($c, $numPerms)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigsExpr =
    copy(child = newChild)
}

object MinHashSigsExpr {
  final val P = 1000000007L

  /** (a, b) permutation constants per signature count — the same
    * deterministic xorshift64 stream as `Dedup.permConstants`, so the SQL
    * oracle's embedded literals match.
    */
  private val permCache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def perms(n: Int): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent(n, { m =>
      val cs = graft.operators.Dedup.permConstants(m)
      (cs.map(_._1).toArray, cs.map(_._2).toArray)
    })

  /** One pass over the shingle array updating all `n` mins — called from
    * generated code. Empty input → all-P sentinel row (the HOF's
    * `coalesce(array_min(…), P)`). a·s < 1e9·1e9 < 2^63: no overflow.
    */
  def sigs(shs: ArrayData, n: Int): ArrayData = {
    val (a, b) = perms(n)
    val out = new Array[Long](n)
    java.util.Arrays.fill(out, P)
    val m = shs.numElements()
    var i = 0
    while (i < m) {
      val s = shs.getLong(i)
      var j = 0
      while (j < n) {
        val v = (a(j) * s + b(j)) % P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `bits`-wide SimHash over the token-hash multiset in one pass: bit b of
  * the result is set iff the b-th bits of the inputs are a strict
  * majority (2·count_b > n ⟺ Σ(±1) > 0) — bit-identical to both the
  * per-bit aggregate reference formulation (`Dedup.simHash`) and the
  * lane-packed pipeline (`Dedup.withSimHashHof`).
  */
case class SimHashExpr(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 64, s"bits must be in [1, 64], got $bits")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects ARRAY<BIGINT>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    SimHashExpr.hash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHashExpr.hash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {
  def hash(hs: ArrayData, bits: Int): Long = {
    val n = hs.numElements()
    val cnt = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < bits) {
        cnt(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < bits) {
      if (2 * cnt(b) > n) sim |= (1L << b)
      b += 1
    }
    sim
  }
}

/** Column-level wrappers: direct Expression→Column construction (no
  * function-registry dependence), usable inside HOF lambdas.
  */
object DedupExprs {
  def minHashSigs(shingles: Column, numPerms: Int): Column =
    ColumnBridge.column(MinHashSigsExpr(ColumnBridge.expression(shingles), numPerms))
  def simHash(tokenHashes: Column, bits: Int): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(tokenHashes), bits))
  def rollingHash(c: Column): Column =
    ColumnBridge.column(RollingHashExpr(ColumnBridge.expression(c)))
  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(c)))
  def cleanText(c: Column, asciiFold: Boolean): Column =
    ColumnBridge.column(CleanTextExpr(ColumnBridge.expression(c), asciiFold))
}
