package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

/** Bucketed co-located joins plan without a shuffle exchange and return
  * the same rows as the shuffled join.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("matching-bucket join has no exchange; results equal plain join") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(orders, "b_orders", 8, "o_orderkey")
    Bucketing.writeBucketed(lineitem, "b_lineitem", 8, "o_orderkey")

    val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")

    val expected = orders.join(lineitem, Seq("o_orderkey")).count()
    assert(joined.count() == expected)

    // aggregation on the bucket key also reuses the layout: no exchange
    val agg = spark.table("b_lineitem").groupBy("o_orderkey")
      .agg(count(lit(1)).as("n"))
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
  }
}
