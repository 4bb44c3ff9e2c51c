package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a native codegen expression — the
  * explicit form of the runtime row-level filtering engines inject for
  * selective joins: probe a pre-built filter of the small side's keys
  * and drop non-matching big-side rows BEFORE they reach the join
  * shuffle. A bloom probe admits false positives, so it is only ever a
  * pre-prune — the exact join downstream keeps the result exact (see
  * [[graft.operators.BloomPrune]]).
  *
  * The serialized filter rides in the expression as a byte array
  * (shipped with the task closure like a broadcast literal, ~1.2 MB per
  * million keys at 1% fpp) and deserializes once per JVM via a
  * content-keyed cache; generated code holds a direct reference — one
  * `mightContainLong` per row, no per-row deserialization, inside
  * whole-stage codegen.
  */
case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain expects an integral key, got ${other.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomMightContainExpr.deserialize(bloomBytes)

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong((long) $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}

object BloomMightContainExpr {
  /** One deserialized filter per distinct content per JVM. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[java.math.BigInteger, BloomFilter]()

  def deserialize(bytes: Array[Byte]): BloomFilter =
    cache.computeIfAbsent(new java.math.BigInteger(
        java.security.MessageDigest.getInstance("MD5").digest(bytes)),
      _ => BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes)))

  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}

object BloomExprs {
  def mightContain(key: Column, bf: BloomFilter): Column =
    ColumnBridge.column(BloomMightContainExpr(
      ColumnBridge.expression(key), BloomMightContainExpr.serialize(bf)))
}
