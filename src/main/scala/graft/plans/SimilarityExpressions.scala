package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native kernels for the similarity operators (same custom-operator tier
  * as the dedup kernels in [[DedupExpressions]]): the fixed-point dot
  * product and the random-hyperplane LSH bucket.
  *
  * The portable HOF formulations (`Similarity.dotFixedHof`,
  * `Similarity.lshBucketFromVfixHof`) allocate a `zip_with` intermediate
  * array per evaluation — per candidate PAIR in the KNN joins — and the
  * bucket runs one zip_with+aggregate pass per hyperplane. Each kernel
  * here is one fused loop, no allocation, inside whole-stage codegen.
  * Integer math identical to the HOFs (PropertySpec asserts equality);
  * the DuckDB oracles are unchanged.
  */
case class DotFixedExpr(left: Expression, right: Expression) extends BinaryExpression {
  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot_fixed expects two ARRAY<FLOAT>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_fixed"

  // Length mismatch → null, matching the HOF path: zip_with null-pads the
  // shorter side and the aggregate sum then propagates null. The two
  // formulations must agree on ALL inputs, ragged included.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null else DotFixedExpr.dot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.plans.DotFixedExpr.dot($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotFixedExpr =
    copy(left = newLeft, right = newRight)
}

object DotFixedExpr {
  final val Scale = 1e15

  /** Σ floor(aᵢ·bᵢ·1e15) over the common prefix as one fused loop —
    * called from generated code. Matches the zip_with∘aggregate HOF: for
    * the equal-length, null-free arrays every embedding column carries,
    * the per-element floored products are exact integers and the sums in
    * play stay far below 2^53, where long and double accumulation agree.
    */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.floor(a.getFloat(i).toDouble * b.getFloat(i).toDouble * Scale).toLong
      i += 1
    }
    acc
  }
}

/** All `planes` hyperplane sign bits in ONE pass over the pre-bound
  * fixed-point embedding: for each dimension d the loop adds
  * vfix(d)·sign(r,d) into per-plane accumulators, then assembles the
  * bucket id — versus `planes` separate zip_with+aggregate passes in the
  * HOF formulation. Sign constants are the same deterministic LCG as
  * `Similarity.hyperplaneSign`.
  */
case class LshBucketExpr(child: Expression, planes: Int, dims: Int) extends UnaryExpression {
  require(planes >= 1 && planes <= 63, s"planes must be in [1, 63], got $planes")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bucket expects ARRAY<BIGINT>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"

  override def nullSafeEval(input: Any): Any =
    LshBucketExpr.bucket(input.asInstanceOf[ArrayData], planes, dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.LshBucketExpr.bucket($c, $planes, $dims)")

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

object LshBucketExpr {
  /** sign(r, d) ∈ {−1, +1}: bit 15 of an LCG step of r·dims + d (the
    * exact `Similarity.hyperplaneSign` math, inlined for the hot loop).
    */
  private def sign(r: Int, d: Int, dims: Int): Long = {
    val n = r.toLong * dims + d
    val g = Math.floorMod(n * 1103515245L + 12345L, 2147483648L)
    if (((g >> 15) & 1L) == 1L) 1L else -1L
  }

  /** Cached per-(planes, dims) sign matrix, plane-major. */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Long]]()
  private def signs(planes: Int, dims: Int): Array[Long] =
    signCache.computeIfAbsent((planes, dims), { case (p, m) =>
      Array.tabulate(p * m)(i => sign(i / m, i % m, m))
    })

  def bucket(vfix: ArrayData, planes: Int, dims: Int): Long = {
    val s = signs(planes, dims)
    val n = math.min(vfix.numElements(), dims)
    val dots = new Array[Long](planes)
    var d = 0
    while (d < n) {
      val x = vfix.getLong(d)
      var r = 0
      while (r < planes) {
        dots(r) += x * s(r * dims + d)
        r += 1
      }
      d += 1
    }
    var b = 0L
    var r = 0
    while (r < planes) {
      if (dots(r) > 0) b |= (1L << r)
      r += 1
    }
    b
  }
}

/** Column-level wrappers (direct Expression construction, no registry). */
object SimilarityExprs {
  def dotFixed(a: Column, b: Column): Column =
    ColumnBridge.column(DotFixedExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def lshBucket(vfix: Column, planes: Int, dims: Int): Column =
    ColumnBridge.column(LshBucketExpr(ColumnBridge.expression(vfix), planes, dims))
}
