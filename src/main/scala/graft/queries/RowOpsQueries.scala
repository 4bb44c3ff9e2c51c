package graft.queries

import graft.{Det, GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-level operators from SURVEY.md §2.2–§2.3 not covered by
  * RelationalQueries: composite-key dedup, global sort, per-row top-k,
  * union, sorted-unique collect, and JSON field extraction.
  */
object RowOpsQueries {

  /** D2 — dedup by composite key, deterministic first-by-stable-order pick
    * (ref: InstagramFeedScraper.py:220 drop_duplicates(["id","shortcode"])).
    * Spark side uses the aggregate form (Dedup.dedupFirstAgg): min over
    * the lexicographic order struct per key — partial aggregation instead
    * of a full-table window sort, so the shuffle carries one row per key.
    * The oracle keeps the rn=1 window formulation; both pick the same row
    * because the order prefix is total within each key.
    */
  val d02DedupComposite: GraftQuery = GraftQuery(
    "d02_dedup_composite",
    """WITH ranked AS (
      |  SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
      |         row_number() OVER (PARTITION BY l_returnflag, l_linestatus
      |                            ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |                                     l_quantity, l_extendedprice) AS rn
      |  FROM lineitem)
      |SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber
      |FROM ranked WHERE rn = 1 ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    graft.operators.Dedup.dedupFirstAgg(
      Tables.lineitem(spark, dir),
      keys = Seq("l_returnflag", "l_linestatus"),
      order = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice").map(col),
      payload = Seq("l_orderkey", "l_linenumber"))
      .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber")
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** D4 — global sort by timestamp (ref: InstagramPostScraper.py:383);
    * bounded output makes Spark plan it as TakeOrderedAndProject (heap
    * top-N per partition, no full sort shuffle).
    */
  val d04SortByTime: GraftQuery = GraftQuery(
    "d04_sort_by_time",
    """SELECT event_id, ts, event_type FROM events
      |ORDER BY ts, event_id LIMIT 1000""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .select("event_id", "ts", "event_type")
      .orderBy("ts", "event_id").limit(1000)
  }

  /** D5 — per-row top-k (k=5) of a score vector with rank + argmax
    * semantics (ref: ImageLabeler.py:151-157 top-5 class probs).
    * Relational formulation: posexplode → per-key ranked window → k best;
    * identical shape in the DuckDB oracle via unnest + generate_subscripts.
    */
  val d05TopKPerRow: GraftQuery = GraftQuery(
    "d05_topk_per_row",
    """WITH flat AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim_idx,
      |         unnest(embedding) AS val
      |  FROM embeddings),
      |ranked AS (
      |  SELECT vec_id, dim_idx, val,
      |         row_number() OVER (PARTITION BY vec_id ORDER BY val DESC, dim_idx) AS rank
      |  FROM flat)
      |SELECT vec_id, rank, dim_idx, val FROM ranked WHERE rank <= 5
      |ORDER BY vec_id, rank""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy("vec_id").orderBy(desc("val"), asc("dim_idx"))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim_idx", "val")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("vec_id", "rank", "dim_idx", "val")
      .orderBy("vec_id", "rank")
  }

  /** D8 — union/concat of heterogeneous inputs into one schema (ref:
    * stages.py:82-84 pd.concat across search terms), aggregated per source
    * to keep the gate result small while checking full cardinality.
    */
  val d08Union: GraftQuery = GraftQuery(
    "d08_union",
    """WITH u AS (
      |  SELECT 'lineitem_returned' AS src, l_orderkey AS key, l_extendedprice AS val
      |  FROM lineitem WHERE l_returnflag = 'R'
      |  UNION ALL
      |  SELECT 'orders_open' AS src, o_orderkey AS key, o_totalprice AS val
      |  FROM orders WHERE o_orderstatus = 'O')
      |SELECT src, COUNT(*) AS n, CAST(SUM(CAST(val AS DECIMAL(28,4))) AS DOUBLE) AS sum_val
      |FROM u GROUP BY src ORDER BY src""".stripMargin) { (spark, dir) =>
    val a = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
      .select(lit("lineitem_returned").as("src"), col("l_orderkey").as("key"),
        col("l_extendedprice").as("val"))
    val b = Tables.orders(spark, dir).filter(col("o_orderstatus") === "O")
      .select(lit("orders_open").as("src"), col("o_orderkey").as("key"),
        col("o_totalprice").as("val"))
    a.unionByName(b)
      .groupBy("src")
      .agg(count(lit(1)).as("n"), Det.dsum(col("val")).as("sum_val"))
      .orderBy("src")
  }

  /** D9 — sorted-unique values per group (ref: ExploratoryAnalysis.py:40-43
    * per-column unique list): collect_set + array_sort. The list result is
    * serialized with to_json on BOTH sides so the driver's pandas checker
    * can sort/hash it (raw array cells crash its sort_values), and NULL
    * langs are excluded explicitly on both sides — collect_set drops nulls
    * while DuckDB's list(DISTINCT) keeps them, so parity must not depend
    * on the data never containing NULL.
    */
  val d09SortedUnique: GraftQuery = GraftQuery(
    "d09_sorted_unique",
    """SELECT source,
      |       to_json(list_sort(list(DISTINCT lang) FILTER (WHERE lang IS NOT NULL))) AS langs,
      |       COUNT(*) AS n_docs
      |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .groupBy("source")
      .agg(to_json(array_sort(collect_set(col("lang")))).as("langs"), count(lit(1)).as("n_docs"))
      .orderBy("source")
  }

  /** P7 — nested/JSON field extraction (ref: Preprocessor.py:45-51
    * statistics.actual.favoriteCount): parse the JSON props column, pull a
    * typed field, aggregate on it.
    */
  val p07JsonExtract: GraftQuery = GraftQuery(
    "p07_json_extract",
    """SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .select((get_json_object(col("props"), "$.k").cast("long") % 10).as("k_mod"), col("value"))
      .groupBy("k_mod")
      .agg(count(lit(1)).as("n"), Det.dsum(col("value"), 6).as("sum_value"))
      .orderBy("k_mod")
  }

  /** K1 — exact per-group top-k via the native k-bounded aggregate
    * ([[graft.plans.TopKAggExpr]], a `TypedImperativeAggregate` over a
    * primitive heap): map-side combinable, ≤ k entries per buffer — vs.
    * the window alternative that shuffles every row. The portable
    * `Aggregator` twin (graft.functions.TopKAggregator) stays for
    * API-level use; PropertySpec asserts the two produce identical
    * output. Oracle is the equivalent ranked window.
    */
  val k01TopKAggregator: GraftQuery = GraftQuery(
    "k01_topk_aggregator",
    """WITH ranked AS (
      |  SELECT event_type, event_id, value,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY value DESC, event_id) AS rank
      |  FROM events)
      |SELECT event_type, rank, event_id, value FROM ranked WHERE rank <= 3
      |ORDER BY event_type, rank""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(graft.plans.TopKAgg.topK(col("value"), col("event_id"), 3).as("top"))
      .select(col("event_type"), posexplode(col("top")).as(Seq("rank0", "s")))
      .select(col("event_type"), (col("rank0") + 1).cast("long").as("rank"),
        col("s.id").as("event_id"), col("s.score").as("value"))
      .orderBy("event_type", "rank")
  }

  /** D10 — deterministic hash-based stratified sampling
    * ([[graft.operators.Sampling]]): per-source keep rates applied as a
    * pure hash-of-key filter, so the EXACT sampled row set is reproduced
    * by the oracle — the property that makes the sample stable across
    * reruns, retries and engines, which seeded `sample()` cannot give.
    * Sources src0-src2 keep 60%, src3 is dropped, everything else 25%;
    * output is the surviving rows plus a per-source audit count.
    */
  val d10StratifiedSample: GraftQuery = GraftQuery(
    "d10_stratified_sample", {
      val bucket = graft.operators.Sampling.sqlHashBucket("doc_id")
      s"""WITH sampled AS (
         |  SELECT doc_id, source FROM documents
         |  WHERE $bucket < CASE WHEN source IN ('src0', 'src1', 'src2') THEN 600000
         |                       WHEN source = 'src3' THEN 0
         |                       ELSE 250000 END),
         |counts AS (SELECT source, COUNT(*) AS n_source FROM sampled GROUP BY source)
         |SELECT s.doc_id, s.source, c.n_source
         |FROM sampled s JOIN counts c ON s.source = c.source
         |ORDER BY s.doc_id""".stripMargin
    }) { (spark, dir) =>
    import graft.operators.Sampling
    val sampled = Sampling.stratifiedSample(
      Tables.documents(spark, dir).select("doc_id", "source"),
      col("source"), col("doc_id"),
      Map("src0" -> 0.6, "src1" -> 0.6, "src2" -> 0.6, "src3" -> 0.0),
      defaultRate = 0.25)
    val counts = sampled.groupBy("source").agg(count(lit(1)).as("n_source"))
    sampled.join(broadcast(counts), "source")
      .select("doc_id", "source", "n_source")
      .orderBy("doc_id")
  }

  /** D11 — z-order (Morton) clustering key ([[graft.operators.ZOrder]]):
    * the bit-interleaved (user_id, day) key that
    * `ZOrder.clusterByZ` range-partitions and sorts by for 2-D data
    * skipping. The gate computes the z-value per event with the pure
    * shift/mask Column arithmetic and profiles the z-space (per-bucket
    * count + exact z bounds); the oracle recomputes the identical
    * interleave in SQL — one bit wrong anywhere moves rows across
    * buckets and breaks the hash.
    */
  val d11ZOrder: GraftQuery = GraftQuery(
    "d11_zorder_key", {
      val z = graft.operators.ZOrder.sqlZValue2(
        "user_id", "date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))")
      s"""WITH z AS (SELECT $z AS zval FROM events)
         |SELECT zval >> 8 AS z_bucket, COUNT(*) AS n,
         |       MIN(zval) AS z_min, MAX(zval) AS z_max
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (spark, dir) =>
    import graft.operators.ZOrder
    val dayIdx = datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
    Tables.events(spark, dir)
      .select(ZOrder.zValue2(col("user_id"), dayIdx).as("zval"))
      .groupBy(shiftright(col("zval"), 8).as("z_bucket"))
      .agg(count(lit(1)).as("n"), min(col("zval")).as("z_min"),
        max(col("zval")).as("z_max"))
      .orderBy("z_bucket")
  }

  /** D12 — set operations (the remaining relational set surface beyond
    * d08's UNION): INTERSECT and EXCEPT with their distinct-set
    * semantics, over derived key sets (users who clicked vs users who
    * purchased), plus the symmetric-difference cardinality audit. Both
    * plan as aggregates/anti-joins — no sort-based set machinery needed.
    */
  val d12SetOps: GraftQuery = GraftQuery(
    "d12_set_ops",
    """WITH c AS (SELECT user_id FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
      |both_sides AS (SELECT user_id FROM c INTERSECT SELECT user_id FROM p),
      |click_only AS (SELECT user_id FROM c EXCEPT SELECT user_id FROM p)
      |SELECT (SELECT COUNT(*) FROM both_sides) AS n_both,
      |       (SELECT COUNT(*) FROM click_only) AS n_click_only,
      |       (SELECT CAST(COALESCE(SUM(user_id), 0) AS BIGINT) FROM both_sides) AS sum_both,
      |       (SELECT CAST(COALESCE(SUM(user_id), 0) AS BIGINT) FROM click_only) AS sum_click_only""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val c = ev.filter(col("event_type") === "click").select("user_id")
    val p = ev.filter(col("event_type") === "purchase").select("user_id")
    val both = c.intersect(p)
    val clickOnly = c.except(p)
    def audit(df: org.apache.spark.sql.DataFrame, n: String, s: String) =
      df.agg(count(lit(1)).as(n),
        coalesce(sum(col("user_id")), lit(0L)).cast("long").as(s))
    audit(both, "n_both", "sum_both")
      .crossJoin(audit(clickOnly, "n_click_only", "sum_click_only"))
      .select("n_both", "n_click_only", "sum_both", "sum_click_only")
  }

  /** D13 — deterministic SHARD SHUFFLE: the global training-order
    * shuffle + shard assignment every pretraining run materializes
    * before the data loader reads it. Each document's order key is the
    * portable hash of its id (same scramble across reruns, engines and
    * cluster sizes — the d10 determinism contract applied to ORDERING,
    * not sampling); shard = key mod 16; position = rank within the
    * shard by (key, doc_id). Restarting the job, adding executors or
    * switching engines reproduces byte-identical shards — which is what
    * makes a training run resumable at a sample boundary.
    *
    * Scale shape: hashing is a codegen'd per-row projection; the
    * per-shard rank is one shuffle on the shard key + a within-shard
    * sort — exactly the `repartition(shard).sortWithinPartitions(key)`
    * write every sharded-corpus writer executes (with thousands of
    * shards in production, each a writer task).
    */
  val d13ShardShuffle: GraftQuery = GraftQuery(
    "d13_shard_shuffle", {
      val h = graft.operators.Sampling.sqlHashBucket("doc_id")
      s"""WITH k AS (SELECT doc_id, $h AS okey FROM documents)
         |SELECT doc_id, okey, okey % 16 AS shard,
         |       row_number() OVER (PARTITION BY okey % 16
         |                          ORDER BY okey, doc_id) AS pos
         |FROM k ORDER BY shard, pos""".stripMargin
    }) { (spark, dir) =>
    import graft.operators.Sampling
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("okey", "doc_id")
    Tables.documents(spark, dir)
      .select(col("doc_id"), Sampling.hashBucket(col("doc_id")).as("okey"))
      .withColumn("shard", col("okey") % 16)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "okey", "shard", "pos")
      .orderBy("shard", "pos")
  }

  /** D14 — SNAPSHOT DIFF (table change detection between two corpus
    * versions — the Delta/Iceberg change-data-feed shape computed from
    * plain tables): the "new" snapshot is a deterministic mutation of
    * `documents` (every 41st doc removed, every 17th's text edited,
    * every 29th re-added under a shifted id), and the diff full-outer
    * joins the snapshots on the key comparing CONTENT HASHES, emitting
    * (doc_id, change_type) for added/removed/changed rows only.
    *
    * Scale shape: one keyed full-outer join (both sides co-partition on
    * the key — zero extra exchange off bucketed snapshots) over rolling-
    * hash fingerprints computed map-side; unchanged rows (the overwhelming
    * majority at 100 TB) are filtered before the gate's ORDER BY, so
    * output ∝ churn, not corpus.
    */
  val d14SnapshotDiff: GraftQuery = GraftQuery(
    "d14_snapshot_diff", {
      import graft.functions.TextFunctions.sqlRollingHash
      s"""WITH old AS (SELECT doc_id, ${sqlRollingHash("text")} AS h FROM documents),
         |new AS (
         |  SELECT doc_id,
         |         ${sqlRollingHash("CASE WHEN doc_id % 17 = 5 THEN text || ' v2' ELSE text END")} AS h
         |  FROM documents WHERE doc_id % 41 <> 3
         |  UNION ALL
         |  SELECT doc_id + 1000000, ${sqlRollingHash("text")} FROM documents
         |  WHERE doc_id % 29 = 7),
         |d AS (
         |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         |         CASE WHEN o.doc_id IS NULL THEN 'added'
         |              WHEN n.doc_id IS NULL THEN 'removed'
         |              WHEN o.h <> n.h THEN 'changed' END AS change_type
         |  FROM old o FULL JOIN new n ON o.doc_id = n.doc_id)
         |SELECT doc_id, change_type FROM d WHERE change_type IS NOT NULL
         |ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    import graft.functions.TextFunctions.rollingHash
    val docs = Tables.documents(spark, dir)
    val old = docs.select(col("doc_id"), rollingHash(col("text")).as("h"))
    val neu = docs.filter(col("doc_id") % 41 =!= 3)
      .select(col("doc_id"),
        rollingHash(when(col("doc_id") % 17 === 5, concat(col("text"), lit(" v2")))
          .otherwise(col("text"))).as("h"))
      .unionAll(docs.filter(col("doc_id") % 29 === 7)
        .select((col("doc_id") + 1000000).as("doc_id"),
          rollingHash(col("text")).as("h")))
    old.as("o").join(neu.as("n"), col("o.doc_id") === col("n.doc_id"), "full")
      .select(coalesce(col("o.doc_id"), col("n.doc_id")).as("doc_id"),
        when(col("o.doc_id").isNull, lit("added"))
          .when(col("n.doc_id").isNull, lit("removed"))
          .when(col("o.h") =!= col("n.h"), lit("changed")).as("change_type"))
      .filter(col("change_type").isNotNull)
      .orderBy("doc_id")
  }

  /** X10 — SCD TYPE-2 history build (the warehouse dimension pattern
    * x06's latest-wins upsert deliberately discards): each user's
    * purchase stream is an attribute-update feed; updates collapse into
    * RUNS of the same attribute state (value bucket = ⌊value/100⌋) and
    * each run becomes a versioned row with a validity interval —
    * `valid_from` = first update of the run, `valid_to` = start of the
    * next run (NULL while current), `is_current` on the open row. Type-2
    * "new row only on change" semantics, not one row per event.
    *
    * Scale shape: one shuffle on the entity key; run detection is the
    * islands idiom (lag + cumulative sum) and the interval close is a
    * lead over run starts — window state O(1) per row throughout.
    * Incremental maintenance composes with x06: merge the new batch,
    * re-run only touched entities.
    */
  val x10Scd2History: GraftQuery = GraftQuery(
    "x10_scd2_history",
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
      |  SELECT user_id, CAST(version AS BIGINT) AS version, bucket,
      |         MIN(ts) AS valid_from, COUNT(*) AS n_updates
      |  FROM runs GROUP BY user_id, version, bucket)
      |SELECT user_id, version, bucket, valid_from,
      |       lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
      |       CASE WHEN lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
      |            IS NULL THEN 1 ELSE 0 END AS is_current,
      |       n_updates
      |FROM hist ORDER BY user_id, version""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val upd = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") / 100).cast("long").as("bucket"))
    val marked = upd.withColumn("chg",
      when(lag(col("bucket"), 1).over(w).isNull ||
        lag(col("bucket"), 1).over(w) =!= col("bucket"), 1L).otherwise(0L))
    val runs = marked.withColumn("version",
      sum(col("chg")).over(Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val hist = runs.groupBy("user_id", "version", "bucket")
      .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_updates"))
    val byVersion = Window.partitionBy("user_id").orderBy("version")
    hist.select(col("user_id"), col("version"), col("bucket"), col("valid_from"),
      lead(col("valid_from"), 1).over(byVersion).as("valid_to"),
      when(lead(col("valid_from"), 1).over(byVersion).isNull, 1)
        .otherwise(0).as("is_current"),
      col("n_updates"))
      .orderBy("user_id", "version")
  }

  /** X11 — DELETE PROPAGATION (the right-to-be-forgotten cascade): a
    * tombstone set of entity keys (here the `user_id % 101 = 7` slice —
    * the d10 portable-hash selection convention) must purge BOTH the raw
    * event log and every derived artifact (here the per-user profile
    * rollup), with an audit row per table proving before/purged/after
    * counts reconcile and a content fingerprint (surviving user-id sum)
    * pinning WHAT survived, not just how many.
    *
    * Scale shape: the tombstone set is orders of magnitude smaller than
    * any fact table, so each purge is ONE broadcast left-anti pass over
    * its table — here fused further: a broadcast left join plants a 0/1
    * flag and a single map-side-combinable aggregate produces the whole
    * audit row, so each table is scanned exactly once and nothing
    * shuffles but the 1-row aggregates. A tombstone set too big to
    * broadcast degrades to x07's bloom-filter semi-join; the purged
    * REWRITE composes with x06's merge (tombstones as CDC deletes) and
    * io06's compaction.
    */
  val x11DeletePropagation: GraftQuery = GraftQuery(
    "x11_delete_propagation",
    """WITH del AS (SELECT DISTINCT user_id FROM events WHERE user_id % 101 = 7),
      |ev AS (
      |  SELECT e.user_id, CASE WHEN d.user_id IS NULL THEN 0 ELSE 1 END AS f
      |  FROM events e LEFT JOIN del d USING (user_id)),
      |prof AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1),
      |pf AS (
      |  SELECT p.user_id, CASE WHEN d.user_id IS NULL THEN 0 ELSE 1 END AS f
      |  FROM prof p LEFT JOIN del d USING (user_id))
      |SELECT 'events' AS table_name, COUNT(*) AS rows_before,
      |       CAST(SUM(f) AS BIGINT) AS rows_purged,
      |       COUNT(*) - CAST(SUM(f) AS BIGINT) AS rows_after,
      |       CAST(SUM(CASE WHEN f = 0 THEN user_id ELSE 0 END) AS BIGINT) AS sum_uid_after
      |FROM ev
      |UNION ALL
      |SELECT 'user_profiles', COUNT(*), CAST(SUM(f) AS BIGINT),
      |       COUNT(*) - CAST(SUM(f) AS BIGINT),
      |       CAST(SUM(CASE WHEN f = 0 THEN user_id ELSE 0 END) AS BIGINT)
      |FROM pf
      |ORDER BY table_name""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val del = ev.filter(pmod(col("user_id"), lit(101)) === 7)
      .select("user_id").distinct()
      .withColumn("__del", lit(1))
    def audit(table: DataFrame, name: String): DataFrame =
      table.join(broadcast(del), Seq("user_id"), "left")
        .agg(count(lit(1)).as("rows_before"),
          sum(coalesce(col("__del"), lit(0))).as("rows_purged"),
          (count(lit(1)) - sum(coalesce(col("__del"), lit(0)))).as("rows_after"),
          sum(when(col("__del").isNull, col("user_id")).otherwise(0L))
            .as("sum_uid_after"))
        .select(lit(name).as("table_name"), col("rows_before"),
          col("rows_purged"), col("rows_after"), col("sum_uid_after"))
    val prof = ev.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    audit(ev, "events").unionAll(audit(prof, "user_profiles"))
      .orderBy("table_name")
  }

  /** X13 — BITEMPORAL RESTATEMENT AUDIT: what did each day's metric
    * look like AS OF an earlier transaction-time watermark, and how
    * much did late-arriving facts restate it? Event time = `ts`
    * (valid time), ingestion order = `event_id` (transaction time; the
    * st04 convention). The report compares, per day, the value-sum
    * known at the 80%-ingestion watermark against the final sum — the
    * "numbers changed after month-close" audit every warehouse needs
    * when facts arrive late (x10 versions DIMENSIONS; this versions
    * AGGREGATES).
    *
    * Scale shape: one corpus scan with the as-of flag fused in
    * (`event_id <= wm` is a conditional inside the SAME
    * map-side-combinable agg, not a second pass); the watermark is a
    * broadcast 1-row agg. Output is |days| rows.
    */
  val x13BitemporalRestate: GraftQuery = GraftQuery(
    "x13_bitemporal_restate",
    """WITH wm AS (
      |  SELECT CAST(floor(MAX(event_id) * 0.8) AS BIGINT) AS wm FROM events),
      |daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |         CAST(SUM(CASE WHEN event_id <= wm
      |                       THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE)
      |           AS sum_asof,
      |         CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_final,
      |         COUNT(*) AS n_final,
      |         CAST(SUM(CASE WHEN event_id <= wm THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_asof
      |  FROM events CROSS JOIN wm GROUP BY 1, wm)
      |SELECT CAST(day AS TIMESTAMP) AS day, n_asof, n_final, sum_asof, sum_final,
      |       CASE WHEN n_asof <> n_final THEN 1 ELSE 0 END AS restated
      |FROM daily ORDER BY day""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val wm = ev.agg(floor(max(col("event_id")) * 0.8).cast("long").as("wm"))
    val asof = col("event_id") <= col("wm")
    ev.crossJoin(broadcast(wm))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        sum(when(asof, col("value").cast("decimal(28,6)"))).cast("double")
          .as("sum_asof"),
        Det.dsum(col("value"), 6).as("sum_final"),
        count(lit(1)).as("n_final"),
        sum(when(asof, 1L).otherwise(0L)).as("n_asof"))
      .select(col("day").cast("timestamp").as("day"), col("n_asof"),
        col("n_final"), col("sum_asof"), col("sum_final"),
        when(col("n_asof") =!= col("n_final"), 1).otherwise(0).as("restated"))
      .orderBy("day")
  }

  /** D15 — deterministic TRAIN/VAL/TEST split (80/10/10) by key hash:
    * the split every training corpus needs, assigned as a pure function
    * of the row key (d10's portable-hash convention) so membership is
    * stable across reruns, retries, cluster sizes and engines — and
    * CONSISTENT across tables sharing the key (a doc and its features
    * land in the same split with no join), which seeded `randomSplit`
    * cannot give: its assignment depends on partition layout and RNG
    * draw order. Contamination risk is structural, not statistical —
    * a row can never migrate between splits across pipeline versions.
    *
    * Scale shape: a codegen'd projection plus a 3-group map-side-
    * combinable audit agg — no shuffle beyond 3 rows. The audit carries
    * exact id/char sums per split, so one misassigned row anywhere in
    * 100 TB breaks the hash.
    */
  val d15HashSplit: GraftQuery = GraftQuery(
    "d15_hash_split", {
      // the key is SALTED with a split-purpose suffix: raw small-int ids
      // make short strings whose rolling hashes never reach the high
      // buckets (every doc would land in 'train'), and the salt also
      // decorrelates this split from every other hash-keyed decision
      // (d10 sampling, d13 sharding) made on the same ids
      val bucket = graft.operators.Sampling.sqlHashBucket("doc_id || '#split'")
      s"""WITH s AS (
         |  SELECT doc_id, n_chars,
         |         CASE WHEN $bucket < 800000 THEN 'train'
         |              WHEN $bucket < 900000 THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM documents)
         |SELECT split, COUNT(*) AS n_docs,
         |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
         |       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
         |FROM s GROUP BY split ORDER BY split""".stripMargin
    }) { (spark, dir) =>
    val b = graft.operators.Sampling.hashBucket(
      concat(col("doc_id").cast("string"), lit("#split")))
    val split = when(b < 800000L, "train")
      .when(b < 900000L, "val").otherwise("test")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"), split.as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        sum("doc_id").as("sum_ids"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("split")
  }

  /** X14 — K-ANONYMITY audit (the privacy-family completion: t07
    * scrubs direct identifiers, x11 cascades deletions, this flags
    * RE-IDENTIFICATION risk): group the corpus by its quasi-identifier
    * combination — (lang, source, length bucket), the released
    * attributes an adversary could join on — and flag every group
    * smaller than k=5; rows in flagged groups need suppression or
    * coarser generalization before release. The output is the full
    * equivalence-class table with sizes and flags, the artifact a
    * privacy review actually reads.
    *
    * Scale shape: ONE map-side-combinable aggregate over the corpus
    * (|QI-combos| output rows); enforcement composes as a broadcast of
    * the flagged combos back over the corpus (the x11 flag-and-scan
    * pattern) — never a row-level shuffle.
    */
  val x14KAnonymity: GraftQuery = GraftQuery(
    "x14_k_anonymity",
    """SELECT lang, source, n_chars // 100 AS len_bucket,
      |       COUNT(*) AS n,
      |       CASE WHEN COUNT(*) >= 5 THEN 1 ELSE 0 END AS is_anonymous
      |FROM documents GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"),
        floor(col("n_chars") / 100).as("len_bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("lang"), col("source"), col("len_bucket"), col("n"),
        when(col("n") >= 5, 1).otherwise(0).as("is_anonymous"))
      .orderBy("lang", "source", "len_bucket")
  }

  /** D16 — EXACT-SIZE deterministic sample (the eval-set cut): the k
    * rows with the smallest (portable-hash-bucket, key) — a fixed-size
    * companion to d10's Bernoulli rate sampling (d10 gives each row an
    * independent keep decision, so the sample SIZE varies; an eval set
    * must be exactly k rows). Same reproducibility contract: membership
    * is a pure function of the key — stable across reruns, engines,
    * cluster sizes, and consistent with any other consumer hashing the
    * same keys. "Smallest hash" is consistent sampling: growing the
    * corpus only ever swaps members whose hash crosses the k-th
    * boundary, never reshuffles the whole sample (the MinHash-sketch
    * membership rule applied to sampling).
    *
    * Scale shape: a codegen'd hash projection + global top-k —
    * `TakeOrderedAndProject` per-partition heaps, never a full sort
    * shuffle; ties broken by the key itself (total order).
    */
  val d16ExactSample: GraftQuery = GraftQuery(
    "d16_exact_sample",
    s"""WITH h AS (
       |  SELECT doc_id, ${graft.operators.Sampling.sqlHashBucket("doc_id")} AS bucket
       |  FROM documents)
       |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket
       |FROM h ORDER BY bucket, doc_id LIMIT 500""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.operators.Sampling.hashBucket(col("doc_id")).as("bucket"))
      .orderBy("bucket", "doc_id").limit(500)
  }

  /** D17 — PER-STRATUM exact-size deterministic sample: exactly k rows
    * from EVERY stratum (here: k=30 per language), the balanced-eval-set
    * cut. d10 gives per-stratum RATES (size varies), d16 a global exact
    * k (strata unbalanced); an eval suite needs both at once — fixed
    * size AND fixed composition. Membership is d16's consistent-sampling
    * rule applied within each stratum: the k rows with the smallest
    * (md5-hash-bucket, key), so the sample is a pure function of the
    * keys — stable across reruns/engines/cluster sizes, and growing a
    * stratum only swaps members across its own k-th hash boundary.
    *
    * Scale shape: a codegen'd hash projection + ONE rank window
    * partitioned by stratum — a single shuffle on the stratum key, O(k)
    * state per stratum. Strata are few and coarse by construction (the
    * partition-count knob is the stratum definition itself); a
    * pathologically hot stratum degrades to d16's global form per
    * stratum (TakeOrdered heaps), not a bigger window.
    */
  val d17StratifiedExactSample: GraftQuery = GraftQuery(
    "d17_stratified_exact_sample",
    s"""WITH h AS (
       |  SELECT lang, doc_id,
       |         ${graft.operators.Sampling.sqlHashBucket("doc_id")} AS bucket
       |  FROM documents)
       |SELECT lang, doc_id, CAST(bucket AS BIGINT) AS bucket
       |FROM h
       |QUALIFY ROW_NUMBER() OVER (PARTITION BY lang ORDER BY bucket, doc_id) <= 30
       |ORDER BY lang, bucket, doc_id""".stripMargin) { (spark, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("bucket", "doc_id")
    Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        graft.operators.Sampling.hashBucket(col("doc_id")).as("bucket"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 30).drop("__rn")
      .orderBy("lang", "bucket", "doc_id")
  }

  /** X21 — SUBJECT-ACCESS EXPORT (GDPR Art. 15 right-to-access), the
    * read half of the privacy family (t07 scrubs content, x11 deletes,
    * x14 flags re-identification risk, x21 REPORTS): for every requested
    * subject, one receipt row per user-data table with the matched row
    * count and an id-sum content fingerprint — including explicit ZERO
    * rows for tables that hold nothing on the subject (an access answer
    * must say "nothing" per table, not omit the table). The subject set
    * here derives from a key slice (user_id % 29 = 3), standing in for
    * the curated request list a DPO ships; subjects resolve to each
    * table through its own key column (events.user_id,
    * orders.o_custkey, customer.c_custkey — the cross-table identity
    * join every access request needs).
    *
    * Scale shape: x11's flag-and-scan — the subject list broadcasts as
    * a LEFT SEMI filter into each table's ONE scan, the per-subject agg
    * is map-side-combinable to ≤ |subjects| rows per table, and the
    * zero-fill join runs on |subjects| rows. No row-level shuffle
    * anywhere; adding a table is one more scan, never a join between
    * fact tables.
    */
  val x21SubjectAccessExport: GraftQuery = GraftQuery(
    "x21_subject_access_export",
    """WITH subj AS (SELECT DISTINCT user_id FROM events WHERE user_id % 29 = 3),
      |ev AS (SELECT user_id, COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS ids
      |       FROM events GROUP BY 1),
      |orr AS (SELECT o_custkey AS user_id, COUNT(*) AS n,
      |               CAST(SUM(o_orderkey) AS BIGINT) AS ids
      |        FROM orders GROUP BY 1),
      |cus AS (SELECT c_custkey AS user_id, COUNT(*) AS n,
      |               CAST(SUM(c_custkey) AS BIGINT) AS ids
      |        FROM customer GROUP BY 1),
      |x AS (
      |  SELECT s.user_id, 'events' AS table_name,
      |         COALESCE(ev.n, 0) AS n_rows, COALESCE(ev.ids, 0) AS id_sum
      |  FROM subj s LEFT JOIN ev USING (user_id)
      |  UNION ALL
      |  SELECT s.user_id, 'orders', COALESCE(orr.n, 0), COALESCE(orr.ids, 0)
      |  FROM subj s LEFT JOIN orr USING (user_id)
      |  UNION ALL
      |  SELECT s.user_id, 'customer', COALESCE(cus.n, 0), COALESCE(cus.ids, 0)
      |  FROM subj s LEFT JOIN cus USING (user_id))
      |SELECT user_id, table_name, CAST(n_rows AS BIGINT) AS n_rows, id_sum
      |FROM x ORDER BY user_id, table_name""".stripMargin) { (spark, dir) =>
    val subj = Tables.events(spark, dir)
      .filter(pmod(col("user_id"), lit(29)) === 3)
      .select("user_id").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def receipt(t: DataFrame, name: String): DataFrame = {
      val agg = t.join(broadcast(subj), Seq("user_id"), "leftsemi")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_rows"), sum("rid").as("id_sum"))
      subj.join(agg, Seq("user_id"), "left")
        .select(col("user_id"), lit(name).as("table_name"),
          coalesce(col("n_rows"), lit(0L)).as("n_rows"),
          coalesce(col("id_sum"), lit(0L)).as("id_sum"))
    }
    receipt(Tables.events(spark, dir)
        .select(col("user_id"), col("event_id").as("rid")), "events")
      .unionAll(receipt(Tables.orders(spark, dir)
        .select(col("o_custkey").as("user_id"), col("o_orderkey").as("rid")), "orders"))
      .unionAll(receipt(Tables.customer(spark, dir)
        .select(col("c_custkey").as("user_id"), col("c_custkey").as("rid")), "customer"))
      .orderBy("user_id", "table_name")
  }

  /** D18 — IMPORTANCE-WEIGHTED deterministic sampling: keep each row
    * with probability ∝ its own per-row weight — the SELECTION step of
    * importance resampling (t17 computes DSIR-style importance weights;
    * d18 is how a pipeline APPLIES such weights to cut a corpus, the
    * "sample proportional to quality" move in targeted data selection).
    * Same reproducibility contract as d10/d16/d17: the keep decision is
    * `md5-bucket(doc_id) < w_ppm` — a pure function of (key, weight),
    * so the sample is identical across reruns/engines/cluster sizes,
    * and nudging one document's weight flips only that document, never
    * reshuffling the rest (per-row thresholding is what seeded RNG
    * sampling cannot give). The weight here derives deterministically
    * from the text (ppm in [200000, 800000], standing in for a model
    * score); the audit rolls up per source: expected kept mass (Σw) vs
    * realized kept count, plus an order-free XOR fingerprint of the
    * kept ids.
    *
    * Scale shape: one codegen'd projection (hash + compare) and ONE
    * map-side-combinable agg to |sources| rows — zero data shuffle, a
    * pure map over the corpus at 100 TB, exactly like d10/d15.
    */
  val d18WeightedSample: GraftQuery = GraftQuery(
    "d18_weighted_sample", {
      val w = s"(200000 + (${graft.functions.TextFunctions.sqlRollingHash("text")}) % 600001)"
      s"""WITH d AS (
         |  SELECT doc_id, source, $w AS w_ppm,
         |         ${graft.operators.Sampling.sqlHashBucket("doc_id")} AS bucket
         |  FROM documents)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(w_ppm) AS BIGINT) AS expected_ppm_mass,
         |  CAST(SUM(CASE WHEN bucket < w_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  BIT_XOR(CASE WHEN bucket < w_ppm THEN doc_id ELSE 0 END) AS kept_fp
         |FROM d GROUP BY source ORDER BY source""".stripMargin
    }) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        (lit(200000L) + pmod(graft.functions.TextFunctions.rollingHash(col("text")),
          lit(600001L))).as("w_ppm"),
        graft.operators.Sampling.hashBucket(col("doc_id")).as("bucket"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w_ppm")).as("expected_ppm_mass"),
        sum(when(col("bucket") < col("w_ppm"), 1L).otherwise(0L)).as("n_kept"),
        expr("bit_xor(CASE WHEN bucket < w_ppm THEN doc_id ELSE 0 END)").as("kept_fp"))
      .orderBy("source")
  }

  /** D19 — CURRICULUM-BALANCED SHARD ASSIGNMENT: order documents by a
    * difficulty proxy (token count — the classic length curriculum),
    * cut the ordering into exact deciles, and deal each decile
    * round-robin across 8 output shards — so every shard spans the
    * full difficulty spectrum (a dataloader reading any one shard sees
    * the whole curriculum, and shard-sequential training never sees a
    * difficulty cliff). The gate emits the (shard × decile) manifest
    * with counts and score bounds; balance is structural: within a
    * decile the global ranks are contiguous, so `rank % 8` deals
    * ±1-even hands — PropertySpec pins that invariant.
    *
    * Scale shape: the GATE form is exact-rank (one global sort — the
    * a17/a24 exact-rank convention); the production twin (`benchAs`)
    * assigns deciles from broadcast approx-percentile thresholds and
    * shards by portable hash — zero global sort, pure map — the same
    * gate-vs-production split a05b/a24 document.
    */
  val d19CurriculumShards: GraftQuery = GraftQuery(
    "d19_curriculum_shards",
    s"""WITH t AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS score FROM documents),
       |r AS (SELECT *, row_number() OVER (ORDER BY score, doc_id) AS rn,
       |             COUNT(*) OVER () AS n
       |      FROM t),
       |cell AS (SELECT ((rn - 1) * 10) // n AS decile, (rn - 1) % 8 AS shard, score
       |         FROM r)
       |SELECT shard, decile, COUNT(*) AS n_docs,
       |       MIN(score) AS min_score, MAX(score) AS max_score
       |FROM cell GROUP BY shard, decile
       |ORDER BY shard, decile""".stripMargin) { (spark, dir) =>
    import graft.functions.TextFunctions.tokens
    val wAll = Window.partitionBy(lit(1))
    Tables.documents(spark, dir)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("score"))
      .select(col("score"),
        row_number().over(wAll.orderBy(col("score"), col("doc_id"))).as("rn"),
        count(lit(1)).over(wAll).as("n"))
      .select(expr("((rn - 1) * 10) div n").as("decile"),
        expr("(rn - 1) % 8").as("shard"), col("score"))
      .groupBy("shard", "decile")
      .agg(count(lit(1)).as("n_docs"),
        min(col("score")).as("min_score"), max(col("score")).as("max_score"))
      .orderBy("shard", "decile")
  }.benchAs { (spark, dir) =>
    // production form: deciles from broadcast approx thresholds, shard
    // by portable hash — no global sort anywhere
    import graft.functions.TextFunctions.tokens
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("score"))
    val thresholds = scored.agg(
      expr("approx_percentile(score, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
        .as("t")).collect()(0).getSeq[Long](0)
    val decile = thresholds.zipWithIndex.foldLeft(lit(0)) { case (acc, (t, _)) =>
      acc + when(col("score") > t, 1).otherwise(0)
    }
    scored
      .select(decile.cast("long").as("decile"),
        pmod(xxhash64(col("doc_id")), lit(8)).as("shard"), col("score"))
      .groupBy("shard", "decile")
      .agg(count(lit(1)).as("n_docs"),
        min(col("score")).as("min_score"), max(col("score")).as("max_score"))
      .orderBy("shard", "decile")
  }

  /** D20 — TEMPORAL SPLIT WITH EMBARGO (the purged time-series split,
    * de Prado's embargo discipline): train = first 20 days, test =
    * from day 23, and the 3 days between are an EMBARGO bucket used by
    * NEITHER side — d15 splits by hash (exchangeable rows) and x22 by
    * near-dup cluster (content leakage); this splits by TIME, the
    * leakage axis for anything autocorrelated (a model evaluated on
    * the day after its training window ends is graded on
    * autocorrelation, not generalization). Cutoffs derive from the
    * data's own min day, so the split is reproducible from the corpus
    * alone; the gate emits per-split counts, id fingerprints, and day
    * bounds — the ≥3-day train→test gap is structural in the bounds
    * and pinned by spec.
    *
    * Scale shape: one bounds aggregate (map-side to 1 row, broadcast
    * back) + one pure per-row projection and a 3-group aggregate — at
    * a real lake the day bounds come from partition metadata and the
    * split column is computed at scan time (zero extra passes).
    */
  val d20TemporalSplit: GraftQuery = GraftQuery(
    "d20_temporal_split",
    """WITH b AS (SELECT MIN(date_trunc('day', ts)) AS t0 FROM events),
      |s AS (
      |  SELECT event_id, date_trunc('day', ts) AS day,
      |         CASE WHEN date_trunc('day', ts) < t0 + INTERVAL 20 DAY THEN 'train'
      |              WHEN date_trunc('day', ts) < t0 + INTERVAL 23 DAY THEN 'embargo'
      |              ELSE 'test' END AS split
      |  FROM events CROSS JOIN b)
      |SELECT split, COUNT(*) AS n_rows, CAST(SUM(event_id) AS BIGINT) AS id_sum,
      |       MIN(day) AS min_day, MAX(day) AS max_day
      |FROM s GROUP BY split ORDER BY split""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val b = ev.agg(min(date_trunc("day", col("ts"))).as("t0"))
    ev.crossJoin(broadcast(b))
      .select(col("event_id"), date_trunc("day", col("ts")).as("day"), col("t0"))
      .select(col("event_id"), col("day"),
        when(col("day") < expr("t0 + INTERVAL 20 DAYS"), "train")
          .when(col("day") < expr("t0 + INTERVAL 23 DAYS"), "embargo")
          .otherwise("test").as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_rows"), sum(col("event_id")).as("id_sum"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"))
      .orderBy("split")
  }

  val all: Seq[GraftQuery] = Seq(
    d02DedupComposite, d04SortByTime, d05TopKPerRow, d08Union,
    d09SortedUnique, p07JsonExtract, k01TopKAggregator, d10StratifiedSample,
    d11ZOrder, d12SetOps, d13ShardShuffle, d14SnapshotDiff, d15HashSplit,
    x10Scd2History, x11DeletePropagation, x13BitemporalRestate,
    x14KAnonymity, d16ExactSample, d17StratifiedExactSample,
    x21SubjectAccessExport, d18WeightedSample, d19CurriculumShards,
    d20TemporalSplit)
}
