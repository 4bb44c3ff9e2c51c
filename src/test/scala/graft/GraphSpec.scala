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

  test("g05: adopted labels are genuine neighbors; isolated keep their own") {
    val out = SparkEntry.queries("g05_labelprop_round")(spark, dir)
    val events = Tables.events(spark, dir)
    val edges = events.select(
      col("user_id").as("src"),
      (regexp_extract(col("props"), "[0-9]+", 0).cast("long") % 150).as("dst"))
    val adj = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v")).distinct()
    val nbrs = adj.select(col("u").as("node"), col("v").as("nbr"))
      .union(adj.select(col("v").as("node"), col("u").as("nbr")))
    // every (node, new_label) with new_label != node must be an edge
    val bad = out.filter(col("new_label") =!= col("node"))
      .join(nbrs, out("node") === nbrs("node") && col("new_label") === col("nbr"),
        "left_anti").count()
    assert(bad == 0, s"$bad adopted labels are not neighbors")
  }

  test("g06: peel-round survivors all met the degree threshold, degrees only drop") {
    val events = Tables.events(spark, dir)
    val edges = events.select(
      col("user_id").as("src"),
      (regexp_extract(col("props"), "[0-9]+", 0).cast("long") % 150).as("dst"))
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v")).distinct()
    val deg0 = und.select(col("u").as("node")).union(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg0"))
    val out = SparkEntry.queries("g06_kcore_round")(spark, dir)
    val joined = out.join(deg0, "node").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (after, before) = (r.getAs[Long]("deg_after"), r.getAs[Long]("deg0"))
      assert(before >= 30, s"survivor ${r.get(0)} had pre-peel degree $before < k")
      assert(after <= before, s"degree rose: $after > $before")
    }
  }

  test("d14: diff rows match the mutation slices exactly") {
    val out = SparkEntry.queries("d14_snapshot_diff")(spark, dir).collect()
    val docs = Tables.documents(spark, dir)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val expRemoved = ids.filter(_ % 41 == 3)
    val expAdded = ids.filter(_ % 29 == 7).map(_ + 1000000L)
    val expChanged = ids.filter(i => i % 41 != 3 && i % 17 == 5)
    def got(t: String) =
      out.filter(_.getString(1) == t).map(_.getLong(0)).toSet
    assert(got("removed") == expRemoved)
    assert(got("added") == expAdded)
    assert(got("changed") == expChanged)
  }

  test("j09: every dirty record resolves at distance 1") {
    val rows = SparkEntry.queries("j09_fuzzy_match")(spark, dir).collect()
    val nDirty = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 31 === 0).count()
    assert(rows.length == nDirty, "a dirty record found no candidate")
    // the uncorrupted original is always a candidate at distance 1, so the
    // min-struct winner's distance can never exceed 1
    assert(rows.forall(_.getAs[Int]("dist") == 1))
  }

  test("g08: capped projection is a subset of the uncapped one, bounded per item") {
    import graft.Tables
    val eng = Tables.events(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast("long").as("item"),
        col("user_id"))
      .distinct()
    // uncapped ground truth: every user pair sharing any item
    val uncapped = eng.as("a").join(eng.as("b"),
        col("a.item") === col("b.item") && col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id").as("u1"), col("b.user_id").as("u2"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = SparkEntry.queries("g08_co_engagement")(spark, dir).collect()
    assert(capped.nonEmpty)
    capped.foreach { r =>
      val p = (r.getLong(0), r.getLong(1))
      assert(uncapped.contains(p), s"capped pair $p not in uncapped projection")
      assert(r.getLong(0) < r.getLong(1), s"unordered pair $p")
    }
    // the cap's whole point: per-item pair fan-out is C(8,2) regardless of
    // how hot the item is
    val perItem = eng.groupBy("item").agg(count(lit(1)).as("m")).collect()
    assert(perItem.exists(_.getLong(1) > 8), "no hot item — cap untested")
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

  /** g09's load-bearing claim: alternating large-star/small-star to a
    * fixpoint yields star graphs rooted at component minima — the same
    * labeling Dedup.connectedComponents computes. The gate pins one
    * round's edge algebra; this pins the ALGORITHM the round iterates.
    */
  test("g09: LS/SS fixpoint labels equal connectedComponents exactly") {
    import org.apache.spark.sql.DataFrame
    val events = Tables.events(spark, dir)
    val edges = events.select(
        col("user_id").as("src"),
        (regexp_extract(col("props"), "[0-9]+", 0).cast("long") % 150).as("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct().cache()

    def star(e: DataFrame, large: Boolean): DataFrame = {
      val adj = e.select(col("u").as("node"), col("v").as("nbr"))
        .unionAll(e.select(col("v").as("node"), col("u").as("nbr")))
      val side = if (large) adj.filter(col("nbr") > col("node"))
                 else adj.filter(col("nbr") <= col("node"))
      // large-star hangs v>u under min over the FULL neighborhood ∪ {u};
      // small-star's local min is over the ≤-neighborhood ∪ {u} only
      val mBase = if (large) adj else side
      val m = mBase.groupBy("node").agg(min("nbr").as("mn"))
        .select(col("node"), least(col("mn"), col("node")).as("m"))
      val hung = side.join(m, "node")
        .select(col("nbr").as("child"), col("m").as("parent"))
      val withSelf = if (large) hung
                     else hung.unionAll(m.select(col("node").as("child"), col("m").as("parent")))
      withSelf.filter(col("child") =!= col("parent"))
        .select(least(col("child"), col("parent")).as("u"),
          greatest(col("child"), col("parent")).as("v"))
        .distinct()
    }
    var cur = edges
    var prev = Set.empty[(Long, Long)]
    var curSet = cur.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    var rounds = 0
    while (curSet != prev && rounds < 40) {
      prev = curSet
      cur = star(star(cur, large = true), large = false).cache()
      curSet = cur.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      rounds += 1
    }
    assert(rounds < 40, "LS/SS did not converge")
    // at the fixpoint every edge is (root, member): labels = root per node
    val starLabels = curSet.flatMap { case (a, b) =>
      val root = math.min(a, b); Seq(math.max(a, b) -> root, root -> root)
    }.toMap
    val ccLabels = graft.operators.Dedup.connectedComponents(
        edges.select(col("u").as("id_a"), col("v").as("id_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // compare on non-root nodes too: every node must agree
    ccLabels.foreach { case (node, label) =>
      assert(starLabels.getOrElse(node, node) == label,
        s"node $node: star ${starLabels.getOrElse(node, node)} vs cc $label")
    }
  }
}
