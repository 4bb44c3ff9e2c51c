package graft

import org.apache.spark.sql.functions._

/** Graph-round invariants (g03 PageRank, g04 triangles) that the oracle
  * gate cannot express: conservation laws and equivalence to the naive
  * formulation the degree-ordered plan replaces.
  */
class GraphSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("g03: one PageRank round conserves (floored) probability mass") {
    val out = SparkEntry.queries("g03_pagerank_round")(spark, dir)
    val rows = out.collect()
    val n = rows.length
    val total = rows.map(_.getLong(1)).sum
    // Each of the ≤ 3 integer divisions per term floors away < 1 ppb per
    // node/edge; mass can only be lost, never created.
    assert(total <= 1000000000L, s"mass created: $total")
    assert(total >= 1000000000L - 3L * (n + 10000), s"too much floor loss: $total")
    // every node holds at least the teleport share
    val minRank = rows.map(_.getLong(1)).min
    assert(minRank >= 150000000L / n)
  }

  test("g04: degree-ordered count ≡ naive closure; corner counts sum to 3×triangles") {
    val events = Tables.events(spark, dir)
    val edges = events.select(
      col("user_id").as("src"),
      (regexp_extract(col("props"), "[0-9]+", 0).cast("long") % 150).as("dst"))
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct().cache()
    // naive closure on id order alone (u < v < w), no degree ordering
    val e1 = und.select(col("u").as("a"), col("v").as("b"))
    val e2 = und.select(col("u").as("b"), col("v").as("c"))
    val e3 = und.select(col("u").as("a"), col("v").as("c"))
    val naive = e1.join(e2, "b").join(e3, Seq("a", "c")).count()
    val out = SparkEntry.queries("g04_triangle_count")(spark, dir)
    val cornerSum = out.agg(sum("n_tri")).collect()(0).getLong(0)
    assert(cornerSum == 3 * naive,
      s"corner sum $cornerSum != 3 × naive closure $naive")
    und.unpersist()
  }

  test("t18: HOF membership count ≡ explode + join count") {
    val out = SparkEntry.queries("t18_blocklist_filter")(spark, dir)
      .select("doc_id", "n_blocked")
    // independent formulation: explode tokens, join the same blocklist
    import graft.functions.TextFunctions._
    val docs = Tables.documents(spark, dir)
    val blRows = docs.select(explode(tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("f"))
      .filter(rollingHash(col("t")) % 3 === 0)
      .orderBy(desc("f"), asc("t")).limit(20)
      .select("t").collect().map(_.getString(0)).toSet
    val blB = spark.sparkContext.broadcast(blRows)
    val viaExplode = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .filter(udf((t: String) => blB.value.contains(t)).apply(col("t")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_blocked_x"))
    val mismatch = out.join(viaExplode, Seq("doc_id"), "outer")
      .filter(coalesce(col("n_blocked"), lit(0L)) =!=
        coalesce(col("n_blocked_x"), lit(0L)))
      .count()
    assert(mismatch == 0)
  }

  test("a23: winsorized mean sits inside the [p05, p95] clamp band") {
    val rows = SparkEntry.queries("a23_winsorized_stats")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p05, p95, m) = (r.getDouble(2), r.getDouble(3), r.getDouble(6))
      assert(p05 <= m && m <= p95, s"mean $m outside [$p05, $p95] for ${r.get(0)}")
      val n = r.getLong(1)
      val (lo, hi) = (r.getLong(4), r.getLong(5))
      // type-1 quantile bounds: at most ceil(pn) strictly below p05's rank
      assert(lo <= math.ceil(0.05 * n).toLong && hi <= n - math.floor(0.95 * n).toLong + 1)
    }
  }
}
