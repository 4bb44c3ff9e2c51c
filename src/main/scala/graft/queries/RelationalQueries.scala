package graft.queries

import graft.{Det, GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2.2–§2.5) expressed over the
  * driver's synthetic tables. Every query is paired with a DuckDB oracle.
  *
  * Conventions for scale + determinism:
  *  - row-level operators return a top-N by a stable key (Spark plans this
  *    as TakeOrderedAndProject — no full sort/shuffle) plus a broadcast
  *    total row count, so full-table semantics are still checked;
  *  - double aggregates go through Det.dsum (exact decimal summation) so
  *    results are bit-identical across engines;
  *  - every result carries an unambiguous ORDER BY.
  */
object RelationalQueries {
  import Dsl.{topNWithTotal, sqlTopNWithTotal, yearIs, yearRange}

  // ---------------------------------------------------------------- flagship
  /** Flagship pricing-summary aggregation: P4 arithmetic derive + A1-style
    * grouped agg (ref: Preprocessor.py:153, plotting.py:50-67).
    */
  val q01PricingSummary: GraftQuery = GraftQuery(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST((l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
      |  (CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*)) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy($c("l_returnflag"), $c("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
        Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private def $c(name: String): Column = col(name)

  /** Second flagship: revenue by nation — the canonical multi-join shape
    * (fact×fact×3 broadcast dims) AQE + broadcast thresholds must get
    * right at scale.
    */
  val q02RevenueByNation: GraftQuery = GraftQuery(
    "q02_revenue_by_nation",
    """SELECT n.n_name AS nation,
      |  CAST(SUM(CAST((l.l_extendedprice * (1 - l.l_discount)) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'ASIA' AND year(o.o_orderdate) = 1995
      |GROUP BY 1 ORDER BY revenue DESC, nation""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).filter(yearIs(col("o_orderdate"), 1995)),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), asc("nation"))
  }

  // ------------------------------------------------------------- projections
  /** P1 — derived filename `{id}_{code}.jpg` (ref: Preprocessor.py:138). */
  val p01DeriveImage: GraftQuery = GraftQuery(
    "p01_derive_image",
    sqlTopNWithTotal(
      "SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) || '_' || o_orderstatus || '.jpg' AS image FROM orders",
      "o_orderkey, image", "o_orderkey", 1000)) { (spark, dir) =>
    val df = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        concat(col("o_orderkey").cast("string"), lit("_"), col("o_orderstatus"), lit(".jpg")).as("image"))
    topNWithTotal(df, 1000, col("o_orderkey"))
  }

  /** P3 — date-part derivations year/month/day (ref: Preprocessor.py:149-151). */
  val p03DateParts: GraftQuery = GraftQuery(
    "p03_date_parts",
    """SELECT CAST(year(o_orderdate) AS INT) AS year, CAST(month(o_orderdate) AS INT) AS month,
      |       CAST(day(o_orderdate) AS INT) AS day, COUNT(*) AS n
      |FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .select(
        year(col("o_orderdate")).as("year"),
        month(col("o_orderdate")).as("month"),
        dayofmonth(col("o_orderdate")).as("day"))
      .groupBy("year", "month", "day").agg(count(lit(1)).as("n"))
      .orderBy("year", "month", "day")
  }

  /** P4 + P6 — arithmetic derive (likes+comments analog) and constant column
    * (ref: Preprocessor.py:153,110).
    */
  val p04ArithDerive: GraftQuery = GraftQuery(
    "p04_arith_derive",
    sqlTopNWithTotal(
      """SELECT event_id, CAST(value + CAST(user_id AS DOUBLE) AS DOUBLE) AS interactions, TRUE AS scrape_image
        |FROM events""".stripMargin,
      "event_id, interactions, scrape_image", "event_id", 1000)) { (spark, dir) =>
    val df = Tables.events(spark, dir).select(
      col("event_id"),
      (col("value") + col("user_id").cast("double")).as("interactions"),
      lit(true).as("scrape_image"))
    topNWithTotal(df, 1000, col("event_id"))
  }

  /** P9 — equality filter (ref: Preprocessor.py:169-170). */
  val p09EqFilter: GraftQuery = GraftQuery(
    "p09_eq_filter",
    sqlTopNWithTotal(
      "SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'",
      "event_id, user_id, value", "event_id", 1000)) { (spark, dir) =>
    val df = Tables.events(spark, dir)
      .filter(col("event_type") === lit("purchase"))
      .select("event_id", "user_id", "value")
    topNWithTotal(df, 1000, col("event_id"))
  }

  /** P10 — half-open year-range filter (ref: Preprocessor.py:172-180). */
  val p10YearRange: GraftQuery = GraftQuery(
    "p10_year_range",
    sqlTopNWithTotal(
      "SELECT o_orderkey, o_orderdate FROM orders WHERE year(o_orderdate) >= 1996 AND year(o_orderdate) < 1998",
      "o_orderkey, o_orderdate", "o_orderkey", 1000)) { (spark, dir) =>
    val df = Tables.orders(spark, dir)
      .filter(yearRange(col("o_orderdate"), 1996, 1998))
      .select("o_orderkey", "o_orderdate")
    topNWithTotal(df, 1000, col("o_orderkey"))
  }

  // ------------------------------------------------------------------- dedup
  /** D1 — dedup keeping first occurrence by a stable order (ref:
    * Preprocessor.py:161-167; deterministic row_number variant per SURVEY §4).
    */
  val d01DedupFirst: GraftQuery = GraftQuery(
    "d01_dedup_first",
    """WITH ranked AS (
      |  SELECT l_orderkey, l_linenumber, l_quantity,
      |         row_number() OVER (PARTITION BY l_orderkey
      |                            ORDER BY l_linenumber, l_quantity) AS rn
      |  FROM lineitem)
      |SELECT l_orderkey, l_linenumber, l_quantity FROM ranked WHERE rn = 1
      |ORDER BY l_orderkey LIMIT 2000""".stripMargin) { (spark, dir) =>
    // (l_orderkey, l_linenumber) is not unique in the synthetic data, so the
    // tie-break extends over every projected column for a deterministic pick.
    // Aggregate form (Dedup.dedupFirstAgg): partial agg + one-row-per-key
    // shuffle instead of a full-table window sort; oracle keeps rn=1.
    graft.operators.Dedup.dedupFirstAgg(
      Tables.lineitem(spark, dir),
      keys = Seq("l_orderkey"),
      order = Seq(col("l_linenumber"), col("l_quantity")),
      payload = Seq("l_linenumber", "l_quantity"))
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey").limit(2000)
  }

  /** D6 — ordered frequency list / value_counts (ref: ExploratoryAnalysis.py:88). */
  val d06FreqList: GraftQuery = GraftQuery(
    "d06_freq_list",
    """SELECT event_type, COUNT(*) AS occurrence FROM events
      |GROUP BY event_type ORDER BY occurrence DESC, event_type""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy("event_type").agg(count(lit(1)).as("occurrence"))
      .orderBy(desc("occurrence"), asc("event_type"))
  }

  // ------------------------------------------------------------------- joins
  /** J1 — inner equi-join to small dimensions, explicitly broadcast (ref:
    * ImageLabeler.py:169, scene-hierarchy dim join).
    */
  val j01DimJoin: GraftQuery = GraftQuery(
    "j01_dim_join",
    """SELECT r.r_name AS region, n.n_name AS nation,
      |  COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS sum_bal
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_cust"), Det.dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy("region", "nation")
  }

  /** J3/P14 — left-anti membership: customers with no orders (ref:
    * InstagramImageScraper.py:157-160 undone-set anti-join). The oracle
    * filters NULL o_custkey explicitly: SQL NOT IN yields no rows if the
    * subquery contains a NULL, while left_anti treats nulls as non-matching
    * — parity must not depend on the generator never emitting NULL keys.
    */
  val j03AntiJoin: GraftQuery = GraftQuery(
    "j03_anti_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
      |                        WHERE year(o_orderdate) = 1995 AND o_custkey IS NOT NULL)
      |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir)
      .join(
        Tables.orders(spark, dir)
          .filter(yearIs(col("o_orderdate"), 1995) && col("o_custkey").isNotNull),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** J4 — left-semi existence join: orders that have lineitems (ref:
    * InstagramPostScraper.py:350-359 image-exists join).
    */
  val j04SemiJoin: GraftQuery = GraftQuery(
    "j04_semi_join",
    """WITH base AS (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem))
      |SELECT b.o_orderkey, b.o_totalprice, t.total_rows
      |FROM (SELECT * FROM base ORDER BY o_orderkey LIMIT 1000) b
      |CROSS JOIN (SELECT COUNT(*) AS total_rows FROM base) t
      |ORDER BY b.o_orderkey""".stripMargin) { (spark, dir) =>
    val df = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_totalprice")
    topNWithTotal(df, 1000, col("o_orderkey"))
  }

  // ------------------------------------------------------------- aggregation
  /** A1 — time-bucket grouped aggregation at month grain (ref:
    * plotting.py:50-67, ExploratoryAnalysis.py:83-85).
    */
  val a01TimeBucket: GraftQuery = GraftQuery(
    "a01_time_bucket_month",
    """SELECT date_trunc('month', o_orderdate) AS bucket, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_price,
      |  (CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*)) AS avg_price
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("bucket"))
      .agg(
        count(lit(1)).as("n_orders"),
        Det.dsum(col("o_totalprice")).as("sum_price"),
        Det.davg(col("o_totalprice")).as("avg_price"))
      .orderBy("bucket")
  }

  /** J6 — as-of (point-in-time) join: every click is annotated with the
    * same user's most recent purchase at or before the click's event
    * time ([[graft.operators.AsOf.asOfJoin]] — union + one keyed window,
    * a single shuffle; never a per-row probe or range-join explosion).
    * The oracle runs the identical union-window formulation in DuckDB,
    * so boundary (`rightTs == leftTs` matches) and tie (last
    * `event_id` wins at equal ts) semantics are checked exactly.
    */
  val j06AsOfJoin: GraftQuery = GraftQuery(
    "j06_asof_join", {
      val asof = graft.operators.AsOf.sqlAsOfJoin(
        leftSel = "SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'click'",
        rightSel = "SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase'",
        key = "user_id", leftTs = "ts", rightTs = "ts",
        leftCols = Seq("user_id", "event_id", "ts", "value"),
        rightCols = Seq("event_id", "ts", "value"),
        rightTieBreak = "event_id")
      s"""WITH $asof
         |SELECT user_id, event_id, ts, value,
         |       prior_event_id, prior_ts, prior_value,
         |       date_diff('second', prior_ts, ts) AS secs_since_purchase
         |FROM asof_rows ORDER BY event_id""".stripMargin
    }) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "event_id", "ts", "value")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts", "value")
    graft.operators.AsOf.asOfJoin(clicks, purchases, "user_id", "ts", "ts",
        rightCols = Seq("event_id", "ts", "value"), rightTieBreak = "event_id")
      .withColumn("secs_since_purchase",
        unix_timestamp(col("ts")) - unix_timestamp(col("prior_ts")))
      .orderBy("event_id")
  }

  /** Q3 — the TPC-H Q5 "local supplier" topology: the classic star join
    * PLUS a cross-dimension equality (supplier nation must equal customer
    * nation) that correlates two dimension arms of the star — the join
    * shape Catalyst's reorder + broadcast planning has to get right
    * beyond a simple snowflake chain. Both nation/region dims broadcast;
    * the supplier arm joins on l_suppkey before the cross-dimension
    * filter applies.
    */
  val q03LocalSupplier: GraftQuery = GraftQuery(
    "q03_local_supplier",
    """SELECT n.n_name AS nation,
      |  CAST(SUM(CAST((l.l_extendedprice * (1 - l.l_discount)) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'ASIA' AND year(o.o_orderdate) BETWEEN 1995 AND 1996
      |GROUP BY 1 ORDER BY revenue DESC, nation""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(yearRange(col("o_orderdate"), 1995, 1997)),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), asc("nation"))
  }

  /** J7 — point-in-interval RANGE join ([[graft.operators.RangeJoin]]):
    * events matched to overlapping 18-hour windows spaced every 12 hours
    * (each event lands in 1–2 windows), via the 6-hour bucketed equi-join
    * — never a nested-loop/cartesian plan (PlanSpec asserts). The oracle
    * runs the naive BETWEEN theta join; equality proves the bucketing
    * loses and duplicates nothing, including at window boundaries.
    */
  val j07RangeJoin: GraftQuery = GraftQuery(
    "j07_range_join",
    """WITH iv AS (
      |  SELECT g AS interval_id,
      |         TIMESTAMP '2024-01-01 00:00:00' + g * INTERVAL 12 HOUR AS start_ts,
      |         TIMESTAMP '2024-01-01 00:00:00' + g * INTERVAL 12 HOUR
      |           + INTERVAL 18 HOUR AS end_ts
      |  FROM range(60) t(g))
      |SELECT interval_id, start_ts, COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM iv JOIN events e ON e.ts >= iv.start_ts AND e.ts < iv.end_ts
      |GROUP BY interval_id, start_ts ORDER BY interval_id""".stripMargin) { (spark, dir) =>
    val baseUs = 1704067200000000L // 2024-01-01T00:00:00Z
    val hourUs = 3600000000L
    val intervals = spark.range(60).select(
      col("id").as("interval_id"),
      timestamp_micros(lit(baseUs) + col("id") * (12 * hourUs)).as("start_ts"),
      timestamp_micros(lit(baseUs) + col("id") * (12 * hourUs) + 18 * hourUs).as("end_ts"))
    graft.operators.RangeJoin.pointInInterval(
        Tables.events(spark, dir).select("ts", "value"), "ts",
        intervals, "start_ts", "end_ts", bucketUs = 6 * hourUs)
      .groupBy("interval_id", "start_ts")
      .agg(count(lit(1)).as("n"), Det.dsum(col("value"), 6).as("sum_value"))
      .orderBy("interval_id")
  }

  /** J8 — interval-OVERLAP join ([[graft.operators.RangeJoin
    * .intervalOverlapJoin]]): two derived window tables (18h-every-12h
    * maintenance windows × 8h-every-5h campaign windows) joined on
    * overlap via the bucketed equi-join with first-shared-bucket dedup —
    * no distinct, no nested loop. Per maintenance window: the number of
    * overlapping campaigns and the total overlap seconds (exact integer
    * arithmetic). The oracle runs the naive theta join.
    */
  val j08IntervalOverlap: GraftQuery = GraftQuery(
    "j08_interval_overlap",
    """WITH a AS (
      |  SELECT g AS a_id,
      |         TIMESTAMP '2024-01-01 00:00:00' + g * INTERVAL 12 HOUR AS a_start,
      |         TIMESTAMP '2024-01-01 00:00:00' + g * INTERVAL 12 HOUR
      |           + INTERVAL 18 HOUR AS a_end
      |  FROM range(60) t(g)),
      |b AS (
      |  SELECT g AS b_id,
      |         TIMESTAMP '2024-01-01 02:00:00' + g * INTERVAL 5 HOUR AS b_start,
      |         TIMESTAMP '2024-01-01 02:00:00' + g * INTERVAL 5 HOUR
      |           + INTERVAL 8 HOUR AS b_end
      |  FROM range(100) t(g))
      |SELECT a_id, COUNT(*) AS n_overlaps,
      |       CAST(SUM(date_diff('second',
      |              GREATEST(a_start, b_start), LEAST(a_end, b_end))) AS BIGINT)
      |         AS overlap_secs
      |FROM a JOIN b ON a_start < b_end AND b_start < a_end
      |GROUP BY a_id ORDER BY a_id""".stripMargin) { (spark, dir) =>
    val hourUs = 3600000000L
    val base = 1704067200000000L // 2024-01-01T00:00:00Z
    val a = spark.range(60).select(
      col("id").as("a_id"),
      timestamp_micros(lit(base) + col("id") * (12 * hourUs)).as("a_start"),
      timestamp_micros(lit(base) + col("id") * (12 * hourUs) + 18 * hourUs).as("a_end"))
    val b = spark.range(100).select(
      col("id").as("b_id"),
      timestamp_micros(lit(base) + 2 * hourUs + col("id") * (5 * hourUs)).as("b_start"),
      timestamp_micros(lit(base) + 2 * hourUs + col("id") * (5 * hourUs) + 8 * hourUs)
        .as("b_end"))
    graft.operators.RangeJoin.intervalOverlapJoin(
        a, "a_start", "a_end", b, "b_start", "b_end", bucketUs = 6 * hourUs)
      .groupBy("a_id")
      .agg(count(lit(1)).as("n_overlaps"),
        sum(unix_timestamp(least(col("a_end"), col("b_end"))) -
          unix_timestamp(greatest(col("a_start"), col("b_start"))))
          .cast("long").as("overlap_secs"))
      .orderBy("a_id")
  }

  /** Q4 — correlated above-average filter (the `WHERE price > (SELECT
    * AVG … per customer)` subquery shape): per customer, how many orders
    * exceed that customer's own exact average spend. Implemented as one
    * window pass (Catalyst de-correlates such subqueries to the same
    * shape); decimal sums keep the per-customer mean bit-exact in both
    * engines.
    */
  val q04AboveAvg: GraftQuery = GraftQuery(
    "q04_above_avg",
    """WITH w AS (
      |  SELECT o_custkey, o_totalprice,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4)))
      |              OVER (PARTITION BY o_custkey) AS DOUBLE)
      |           / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg
      |  FROM orders)
      |SELECT o_custkey, COUNT(*) AS n_orders,
      |       COUNT(*) FILTER (WHERE o_totalprice > cust_avg) AS n_above,
      |       MAX(o_totalprice) AS max_price
      |FROM w GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (spark, dir) =>
    val byCust = Window.partitionBy("o_custkey")
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_totalprice"),
        (sum(col("o_totalprice").cast("decimal(28,4)")).over(byCust).cast("double") /
          count(lit(1)).over(byCust)).as("cust_avg"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        count(when(col("o_totalprice") > col("cust_avg"), 1)).as("n_above"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy("o_custkey")
  }

  /** J09 — FUZZY-MATCH join (entity resolution: blocking + edit-distance
    * verify + best-match pick — the record-linkage shape behind user /
    * account / merchant matching). The dirty side is a deterministic
    * single-character corruption of every 31st customer name (position
    * 10 + key mod 9, replaced with 'X'); matching blocks 2-OF-3: the
    * digit tail splits into three DISJOINT 3-char windows and candidates
    * must agree on a PAIR of windows (three equi-joins, one per window
    * pair). A single substitution damages at most one window, leaving
    * one pair fully intact — guaranteed recall for single-edit
    * corruption — while each join key carries 6 characters of entropy
    * (a single 3-char window key left a hot block doing 4M edit-distance
    * checks at sf0.1; the pair keys cut candidates ~8x). Candidates
    * verify with `levenshtein <= 2`; the winner per dirty record is the
    * min-struct (dist, key) — deterministic under distance ties.
    *
    * Scale shape: LSH-for-strings — banded blocking equi-joins (never a
    * cross join; the same band-key recall math as m01's MinHash bands),
    * exact edit distance only on candidates and verified INSIDE each
    * branch, and the best-pick is a map-side-combinable min-struct agg
    * (d01's pattern), not a window sort — a pair surviving in several
    * branches is absorbed by min, so no distinct over wide name pairs is
    * ever materialized. A still-skewed block gets x03's salting.
    */
  val j09FuzzyMatch: GraftQuery = GraftQuery(
    "j09_fuzzy_match",
    """WITH dirty AS (
      |  SELECT c_custkey AS dirty_id,
      |         substr(c_name, 1, CAST(9 + c_custkey % 9 AS INT)) || 'X' ||
      |         substr(c_name, CAST(11 + c_custkey % 9 AS INT)) AS dirty_name
      |  FROM customer WHERE c_custkey % 31 = 0),
      |cand AS (
      |  SELECT dirty_id, dirty_name, c.c_custkey, c.c_name
      |  FROM dirty d JOIN customer c
      |    ON substr(d.dirty_name, 10, 6) = substr(c.c_name, 10, 6)
      |  UNION
      |  SELECT dirty_id, dirty_name, c.c_custkey, c.c_name
      |  FROM dirty d JOIN customer c
      |    ON substr(d.dirty_name, 10, 3) || substr(d.dirty_name, 16, 3)
      |     = substr(c.c_name, 10, 3) || substr(c.c_name, 16, 3)
      |  UNION
      |  SELECT dirty_id, dirty_name, c.c_custkey, c.c_name
      |  FROM dirty d JOIN customer c
      |    ON substr(d.dirty_name, 13, 6) = substr(c.c_name, 13, 6)),
      |ver AS (
      |  SELECT dirty_id, c_custkey, levenshtein(dirty_name, c_name) AS dist
      |  FROM cand WHERE levenshtein(dirty_name, c_name) <= 2),
      |best AS (
      |  SELECT dirty_id, c_custkey, dist,
      |         row_number() OVER (PARTITION BY dirty_id ORDER BY dist, c_custkey) AS rn
      |  FROM ver)
      |SELECT dirty_id, c_custkey AS matched_key, dist
      |FROM best WHERE rn = 1 ORDER BY dirty_id""".stripMargin) { (spark, dir) =>
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_name")
    val dirty = cust.filter(col("c_custkey") % 31 === 0)
      .select(col("c_custkey").as("dirty_id"),
        expr("concat(substr(c_name, 1, cast(9 + c_custkey % 9 as int)), 'X', " +
          "substr(c_name, cast(11 + c_custkey % 9 as int)))").as("dirty_name"))
    // verify INSIDE each blocking branch (before the union): edit
    // distance runs only on that branch's candidates, and a pair
    // surviving several branches is harmless — min-struct is
    // duplicate-idempotent, so no distinct is ever materialized (the
    // oracle's UNION dedup is absorbed the same way)
    def block(key: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      dirty.withColumn("bk", key(col("dirty_name")))
        .join(cust.withColumn("bk", key(col("c_name"))), "bk")
        .select(col("dirty_id"), col("c_custkey"),
          levenshtein(col("dirty_name"), col("c_name")).as("dist"))
        .filter(col("dist") <= 2)
    val ab = block(n => substring(n, 10, 6))
    val ac = block(n => concat(substring(n, 10, 3), substring(n, 16, 3)))
    val bc = block(n => substring(n, 13, 6))
    ab.union(ac).union(bc)
      .groupBy("dirty_id")
      .agg(min(struct(col("dist"), col("c_custkey"))).as("m"))
      .select(col("dirty_id"), col("m.c_custkey").as("matched_key"),
        col("m.dist").as("dist"))
      .orderBy("dirty_id")
  }

  /** J10 — POINT-IN-TIME join of facts to an SCD2 dimension: every click
    * is attributed to the dimension version (x10's bucket history, built
    * from the same user's purchases) that was valid AT the click's event
    * time — the canonical warehouse join that makes historical reports
    * reproducible: joining facts to the CURRENT dimension silently
    * rewrites the past every time the dimension changes. Containment is
    * `valid_from <= ts < valid_to` (open current version = null
    * valid_to); clicks before a user's first version get no row (inner).
    *
    * Scale shape: the interval predicate rides a plain user-keyed
    * equi-join — the key carries all the locality, and versions per key
    * are few (bounded by that key's change count), so no range-join
    * machinery is needed; both sides shuffle once on user_id and AQE
    * handles key skew. A version-heavy dimension would switch to j06's
    * union-window as-of form (identical semantics — as-of on version
    * starts ≡ interval containment, since versions partition the
    * timeline from the first change on).
    */
  val j10Scd2Pit: GraftQuery = GraftQuery(
    "j10_scd2_pit",
    """WITH upd AS (
      |  SELECT user_id, ts, event_id, CAST(floor(value / 100) AS BIGINT) AS bucket
      |  FROM events WHERE event_type = 'purchase'),
      |marked AS (
      |  SELECT user_id, ts, event_id, bucket,
      |         CASE WHEN lag(bucket) OVER w IS NULL
      |                OR lag(bucket) OVER w <> bucket THEN 1 ELSE 0 END AS chg
      |  FROM upd WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |runs AS (
      |  SELECT user_id, ts, bucket,
      |         SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS version
      |  FROM marked),
      |hist AS (
      |  SELECT user_id, version, bucket, MIN(ts) AS valid_from
      |  FROM runs GROUP BY user_id, version, bucket),
      |dim AS (
      |  SELECT user_id, bucket, valid_from,
      |         lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to
      |  FROM hist),
      |clicks AS (
      |  SELECT user_id, ts, value FROM events WHERE event_type = 'click')
      |SELECT d.bucket, COUNT(*) AS n_clicks,
      |       COUNT(DISTINCT c.user_id) AS n_users,
      |       CAST(SUM(CAST(c.value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM clicks c JOIN dim d
      |  ON c.user_id = d.user_id AND c.ts >= d.valid_from
      |     AND (d.valid_to IS NULL OR c.ts < d.valid_to)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val upd = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") / 100).cast("long").as("bucket"))
    val marked = upd.withColumn("chg",
      when(lag(col("bucket"), 1).over(w).isNull ||
        lag(col("bucket"), 1).over(w) =!= col("bucket"), 1L).otherwise(0L))
    val runs = marked.withColumn("version",
      sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val hist = runs.groupBy("user_id", "version", "bucket")
      .agg(min(col("ts")).as("valid_from"))
    val byVersion = Window.partitionBy("user_id").orderBy("version")
    val dim = hist.select(col("user_id").as("d_user"), col("bucket"),
      col("valid_from"),
      lead(col("valid_from"), 1).over(byVersion).as("valid_to"))
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "value")
    clicks.join(dim,
        col("user_id") === col("d_user") && col("ts") >= col("valid_from") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_clicks"),
        countDistinct(col("user_id")).as("n_users"),
        Det.dsum(col("value"), 6).as("sum_value"))
      .orderBy("bucket")
  }

  /** Q05 — SHIPPING-PRIORITY top-k (the TPC-H Q3 topology): revenue of
    * the 10 highest-value orders in one market segment that were placed
    * before a cutoff but still shipping after it — a selective dim
    * filter riding a fact-fact join into a grouped top-k. The plan you
    * want at 100 TB and the plan this builds: the BUILDING customer
    * slice broadcasts into orders, BOTH date predicates are plain
    * column-vs-literal comparisons that reach `PushedFilters` (the q02
    * date-range lesson), the revenue agg is map-side combinable, and
    * the top-10 is `TakeOrderedAndProject` — no global sort. Revenue
    * is per-row double product (IEEE-deterministic) cast to DECIMAL
    * and summed exactly (Det convention), tie-break (revenue DESC,
    * l_orderkey).
    */
  val q05ShippingPriority: GraftQuery = GraftQuery(
    "q05_shipping_priority",
    """WITH r AS (
      |  SELECT l_orderkey, o_orderdate,
      |         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS rev
      |  FROM customer
      |  JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  WHERE c_mktsegment = 'BUILDING'
      |    AND o_orderdate < TIMESTAMP '1997-01-01'
      |    AND l_shipdate > TIMESTAMP '1997-01-01'
      |  GROUP BY 1, 2)
      |SELECT l_orderkey, CAST(rev AS DOUBLE) AS revenue, o_orderdate
      |FROM r ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (spark, dir) =>
    val cut = lit("1997-01-01").cast("timestamp")
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < cut)
      .select("o_orderkey", "o_custkey", "o_orderdate")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(28,6)")).as("rev"))
      .select(col("l_orderkey"), col("rev").cast("double").as("revenue"),
        col("o_orderdate"))
      .orderBy(desc("revenue"), asc("l_orderkey")).limit(10)
  }

  /** Q06 — FORECAST REVENUE (the TPC-H Q6 topology): the pure
    * data-skipping showcase — ONE narrow lineitem scan where every
    * predicate (shipdate year band, discount band, quantity cap) is a
    * bare column-vs-literal comparison that reaches `PushedFilters`
    * (the suite-wide PlanSpec audit enforces it), the projection is 2
    * columns, and the whole query is one map-side-combinable agg to a
    * single row. At 100 TB this plan reads only the row groups whose
    * stats intersect the bands — the io11 zone-map story done by
    * parquet footers alone. Revenue is the per-row double product
    * (IEEE-deterministic) summed exactly (Det convention).
    */
  val q06ForecastRevenue: GraftQuery = GraftQuery(
    "q06_forecast_revenue",
    """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |       COUNT(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(28,6)")).cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  /** Q07 — ORDER-PRIORITY CHECK (TPC-H Q4 topology, ref Q4): of the
    * orders placed in a quarter, how many — per priority class — had at
    * least one line shipped AFTER the order date (the late-shipment
    * existence test). The EXISTS turns into a LEFT-SEMI join with a
    * mixed equi + non-equi condition (l_orderkey match AND
    * l_shipdate > o_orderdate) — the orders side never duplicates no
    * matter how many lines match.
    *
    * Scale shape: the quarter predicate pushes into the orders scan
    * (suite-wide audit); the semi-join shuffles both sides on orderkey
    * once (AQE may broadcast the filtered orders side); the priority
    * rollup is a map-side agg to |priorities| rows.
    */
  val q07PriorityCount: GraftQuery = GraftQuery(
    "q07_priority_count",
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    val orders = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    orders.join(Tables.lineitem(spark, dir),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Q08 — PROMOTION EFFECT (TPC-H Q14 topology, ref Q14): the share of
    * one quarter's revenue from PROMO-type parts — the lineitem×part
    * dim join the suite didn't yet exercise. Both revenue sums run in
    * exact DECIMAL (map-side combinable); only the final percentage
    * assembles the same IEEE double expression on both engines (the
    * cosine convention — no decimal division, which engines round
    * differently).
    *
    * Scale shape: the quarter predicate pushes into the lineitem scan;
    * part is a broadcast dim (PlanSpec's j01 rule); ONE conditional agg
    * to a single row — no second pass for the denominator.
    */
  val q08PromoRevenue: GraftQuery = GraftQuery(
    "q08_promo_revenue",
    """WITH j AS (
      |  SELECT p_type, CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)) AS rev
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'),
      |s AS (SELECT SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(28,6)) END) AS promo,
      |             SUM(rev) AS total FROM j)
      |SELECT CAST(promo AS DOUBLE) AS promo_revenue,
      |       CAST(total AS DOUBLE) AS total_revenue,
      |       (CAST(promo AS DOUBLE) * 100) / CAST(total AS DOUBLE) AS promo_pct
      |FROM s""".stripMargin) { (spark, dir) =>
    val j = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .join(broadcast(Tables.part(spark, dir)),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_type"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(28,6)").as("rev"))
    j.agg(
        sum(when(col("p_type") === "PROMO", col("rev"))
          .otherwise(lit(0).cast("decimal(28,6)"))).as("promo"),
        sum(col("rev")).as("total"))
      .select(col("promo").cast("double").as("promo_revenue"),
        col("total").cast("double").as("total_revenue"),
        ((col("promo").cast("double") * 100) / col("total").cast("double"))
          .as("promo_pct"))
  }

  /** Q09 — CUSTOMER ORDER-COUNT DISTRIBUTION (TPC-H Q13 topology, ref
    * Q13): how many customers placed exactly k qualifying orders, for
    * every k INCLUDING ZERO — the zero bucket is why this is a LEFT
    * OUTER join with the filter inside the join condition (a WHERE
    * would silently delete the never-ordered customers, the classic
    * outer-join-filter trap). Two aggregations: per-customer count
    * (counting the nullable order key so no-match rows count 0), then
    * the k-histogram.
    *
    * Scale shape: one shuffle on custkey for the join + first agg (same
    * key — one exchange serves both); the histogram aggregates
    * |customers| rows map-side to |distinct k| rows. No windows.
    */
  val q09CustDistribution: GraftQuery = GraftQuery(
    "q09_cust_distribution",
    """WITH per_cust AS (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |SELECT c_count, COUNT(*) AS custdist
      |FROM per_cust GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir).select("c_custkey")
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  val all: Seq[GraftQuery] = Seq(
    q01PricingSummary, q02RevenueByNation, q03LocalSupplier, q04AboveAvg,
    q05ShippingPriority, q06ForecastRevenue, q07PriorityCount, q08PromoRevenue,
    q09CustDistribution,
    p01DeriveImage, p03DateParts, p04ArithDerive, p09EqFilter, p10YearRange,
    d01DedupFirst, d06FreqList, j01DimJoin, j03AntiJoin, j04SemiJoin,
    j06AsOfJoin, j07RangeJoin, j08IntervalOverlap, j09FuzzyMatch, j10Scd2Pit,
    a01TimeBucket)
}
