package graft

import org.apache.spark.sql.types._

/** Schema contract over the driver-generated testdata (TESTDATA.md).
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * shipped `events.ts` in three different encodings (TIMESTAMP(NANOS),
  * TIMESTAMP_NTZ, TIMESTAMP). A drift must fail HERE, in one named test
  * that prints the offending table/column/dtype — not as analysis errors
  * scattered across every consumer suite. Raw-file assertions pin what the
  * generator may emit; normalized assertions pin what [[Tables]] owes
  * every downstream operator regardless of the raw encoding.
  */
class TestdataContractSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def assertTypes(table: String, df: org.apache.spark.sql.DataFrame,
                          expected: Map[String, DataType]): Unit =
    expected.foreach { case (colName, dt) =>
      val actual = df.schema.find(_.name == colName).map(_.dataType)
      assert(actual.contains(dt),
        s"testdata contract drift: $table.$colName is " +
          s"${actual.getOrElse("ABSENT")}, engine expects $dt")
    }

  test("events.ts raw encoding is one the Tables normalizer handles") {
    val prev = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try {
      val raw = spark.read.parquet(s"$sf/events.parquet")
      val tsType = raw.schema("ts").dataType
      assert(Seq(LongType, TimestampNTZType, TimestampType).contains(tsType),
        s"testdata contract drift: events.ts raw dtype $tsType is a FOURTH " +
          "encoding — extend Tables.normalizedEventTs")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
      case None    => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
  }

  test("Tables.events normalizes ts to TIMESTAMP and leaks no session conf") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    val ev = Tables.events(spark, sf)
    assertTypes("events(normalized)", ev, Map(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType))
    // a nanos-encoded file legitimately keeps the conf set (execution
    // re-reads it); for the µs encodings the loader must restore it.
    if (spark.read.parquet(s"$sf/events.parquet")
          .schema("ts").dataType != LongType)
      assert(spark.conf.getOption(key) == before,
        s"Tables.events leaked $key into the session")
    assert(ev.limit(1).count() == 1) // the normalized column actually reads
  }

  test("dimension and fact tables carry the dtypes the queries bind to") {
    assertTypes("documents", Tables.documents(spark, sf), Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType))
    assertTypes("embeddings", Tables.embeddings(spark, sf), Map(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType, true),
      "label" -> IntegerType))
    // date columns ship as naive µs timestamps (NTZ under Spark's default
    // inference) — the queries bind to that, so the contract pins it.
    assertTypes("lineitem", Tables.lineitem(spark, sf), Map(
      "l_orderkey" -> LongType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_tax" -> DoubleType, "l_returnflag" -> StringType,
      "l_shipdate" -> TimestampNTZType))
    assertTypes("orders", Tables.orders(spark, sf), Map(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderdate" -> TimestampNTZType, "o_totalprice" -> DoubleType))
    assertTypes("customer", Tables.customer(spark, sf), Map(
      "c_custkey" -> LongType, "c_nationkey" -> IntegerType))
    assertTypes("nation", Tables.nation(spark, sf), Map(
      "n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType,
      "n_name" -> StringType))
  }
}
