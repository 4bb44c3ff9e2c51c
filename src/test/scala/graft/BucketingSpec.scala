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

  test("b01 gate query joins the bucketed layout without shuffling either side") {
    val df = SparkEntry.queries("b01_bucketed_join")(spark, "/root/testdata/sf0.001")
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected the merge-hinted join:\n$plan")
    // a shuffled join would repartition on the join keys — neither may appear
    // (the only exchanges allowed are the post-join groupBy/orderBy ones)
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join inputs must not shuffle:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scan must use the bucketed layout:\n$plan")
    // faster-path sanity: bucketed result equals the plain shuffled twin
    val plain = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .join(spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderstatus") === "F")
      .count()
    assert(df.as[(String, Long, Double)].collect().map(_._2).sum == plain)
  }
}
