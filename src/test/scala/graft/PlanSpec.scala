package graft

import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan audits over the real testdata: the properties that keep
  * these operators viable at 100 TB — predicate pushdown to the parquet
  * scan, column pruning, broadcast joins for dims, top-N as
  * TakeOrderedAndProject, no accidental cartesian products.
  */
class PlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("equality filter pushes down to the parquet scan (p09)") {
    val plan = planOf("p09_eq_filter")
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("EqualTo(event_type,purchase)"))
  }

  test("year-range scan prunes columns to the projection (p10)") {
    val plan = planOf("p10_year_range")
    assert(plan.contains("o_orderkey") && plan.contains("o_orderdate"))
    assert(!plan.contains("o_totalprice")) // unread column never scanned
  }

  /** The year filters are written as half-open range comparisons on the
    * date column itself (Dsl.yearRange) precisely so they reach the scan:
    * at 100 TB `year(col)=K` post-scan means a full fact-table read under
    * the suite's most selective predicate.
    */
  test("year filters push into the orders scan as date ranges (q02/q03/j03/p10)") {
    for (q <- Seq("q02_revenue_by_nation", "q03_local_supplier",
                  "j03_anti_join", "p10_year_range")) {
      val plan = planOf(q)
      assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
        s"$q: no pushed lower date bound on orders scan:\n$plan")
      assert(plan.contains("LessThan(o_orderdate"),
        s"$q: no pushed upper date bound on orders scan:\n$plan")
    }
  }

  test("flagship aggregation reads only the six needed lineitem columns (q01)") {
    val plan = planOf("q01_pricing_summary")
    assert(!plan.contains("l_shipdate") && !plan.contains("l_partkey"))
  }

  test("dimension joins broadcast, never sort-merge (j01)") {
    val plan = planOf("j01_dim_join")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("anti-join stays a hash join (j03)") {
    val plan = planOf("j03_anti_join")
    assert(plan.contains("LeftAnti"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("bounded sorts plan as TakeOrderedAndProject, not global sort (d04)") {
    val plan = planOf("d04_sort_by_time")
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("vocab coverage cuts top-k with per-partition heaps, not a global sort (t28)") {
    val plan = planOf("t28_vocab_coverage")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-1000 vocab cut must plan as TakeOrderedAndProject:\n$plan")
    // the cumulative window must sit ABOVE the 1000-row cut (an
    // ancestor prints first in the top-down dump), never on the full
    // vocabulary
    assert(plan.contains("Window"), s"expected the bounded cumsum window:\n$plan")
    assert(plan.indexOf("Window") < plan.indexOf("TakeOrderedAndProject"),
      s"window must run on the bounded frame above the cut:\n$plan")
  }

  test("LSH candidate generation is an equi-join on band keys, no cartesian (m01)") {
    val plan = planOf("m01_minhash_lsh")
    assert(!plan.contains("CartesianProduct"))
    // the only nested-loop join is the 1-row audit-count cross join;
    // the pair-candidate join itself must be a hash equi-join
    assert(plan.contains("BroadcastHashJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("SortMergeJoin"))
  }

  test("windowed sessionization produces a single shuffle per window chain (st01)") {
    val plan = planOf("st01_sessionize")
    // lag + running sum share one (user_id) partitioning: exactly one
    // exchange below the final aggregate's
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected <=2 hash exchanges, plan:\n$plan")
  }

  test("near-dup signatures run through the native one-pass kernels (m01/s01)") {
    assert(planOf("m01_minhash_lsh").contains("graft_minhash_sigs"))
    assert(planOf("s01_simhash_pairs").contains("graft_simhash"))
  }

  test("similarity paths use the fused dot and one-pass bucket kernels (e02)") {
    val plan = planOf("e02_knn_lsh")
    assert(plan.contains("graft_lsh_bucket"))
    assert(plan.contains("graft_dot_fixed"))
    // the retired unrolled expression tree must not come back: the widest
    // FLOOR chain a plan should carry is inside a lambda, not 64 terms
    assert(!plan.contains("emb#") || "FLOOR".r.findAllIn(plan).length < 64)
  }

  test("range join plans as an equi-join on the bucket key, never nested-loop (j07)") {
    val plan = planOf("j07_range_join")
    assert(!plan.contains("CartesianProduct"),
      s"j07 must not plan a cartesian product:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"j07 must not plan a nested-loop join:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("SortMergeJoin"))
  }

  test("quantized KNN broadcasts the query side like the float path (e07)") {
    val plan = planOf("e07_knn_quantized")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("partitionBy writes prune partitions at read time (the (dataset, year) layout)") {
    // the SURVEY §4 layout lever: facts written partitioned by a coarse
    // time key are read with PartitionFilters, so a day-scoped query
    // never opens the other days' files at any corpus size
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.events(spark, sf)
      .withColumn("day", org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")))
      .write.partitionBy("day").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col("day") ===
        java.sql.Date.valueOf("2024-01-05"))
      .groupBy("event_type").count()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"expected a partition filter on day:\n$plan")
    // partition pruning is structural: the scan selects exactly ONE of
    // the 30 day partitions and only its files
    val unwrapped = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan // AQE wrapper is a leaf to collectLeaves
      case p => p
    }
    val scans = unwrapped.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        (f.selectedPartitions.partitionCount,
          f.selectedPartitions.toPartitionArray.map(_.urlEncodedPath).toSeq)
    }
    assert(scans.nonEmpty)
    val (nParts, files) = scans.head
    assert(nParts == 1, s"expected 1 selected partition, got $nParts")
    assert(files.nonEmpty && files.forall(_.contains("day=2024-01-05")),
      s"expected only day=2024-01-05 files, got:\n${files.mkString("\n")}")
  }

  test("t06 repetition has no Generate (the InferFiltersFromGenerate trap)") {
    val plan = planOf("t06_repetition")
    // an explode formulation plants size(shingle-pipeline)>0 into the scan
    // filter, evaluating the whole pipeline 3x per row (5.6s -> 0.17s at
    // sf0.1 when removed) — guard the generator-free shape
    assert(!plan.contains("Generate"), s"t06 must stay generator-free:\n$plan")
    assert(!plan.contains("PushedFilters: [IsNotNull"), "no inferred scan filter expected")
  }

  /** Suite-wide pushdown audit (VERDICT r7 #6): over the PlanDump
    * representative set, every plain single-column comparison against a
    * literal that survives as a post-scan Filter must ALSO appear in some
    * scan's `PushedFilters` — a scan-expressible predicate evaluated only
    * post-scan is a full-table read under the query's most selective
    * condition at 100 TB. Predicates that are functions of a column
    * (modulo slices, bloom membership, timestamp arithmetic) are excluded
    * by construction: no Parquet source can evaluate them, so the atom
    * regex deliberately matches bare `attr#id op literal` shapes only.
    */
  test("every scan-expressible literal predicate is pushed (suite-wide audit)") {
    val opName = Map("=" -> "EqualTo", "<" -> "LessThan", "<=" -> "LessThanOrEqual",
      ">" -> "GreaterThan", ">=" -> "GreaterThanOrEqual")
    // bare attribute `name#123L` compared to a literal (no `#`, no parens,
    // no casts in the value) — the exact shape Parquet pushdown accepts
    val atom = """\(([a-z][A-Za-z0-9_]*)#\d+L? (=|<=|>=|<|>) ([^()#]+?)\)""".r
    // columns that exist on the physical scans of this plan: FileScan
    // output lists `[c1#1,c2#2,...]`
    val scanOut = """FileScan parquet [^\[\n]*\[([^\]]*)\]""".r
    // Documented exceptions: filters that select WINDOW OUTPUT rows —
    // the window frame needs the rows the filter drops, so pushing the
    // predicate into the scan would change the window's inputs and the
    // answer. Each entry must narrow its scan by other means (j11
    // pushes `event_type IN (click, purchase)` instead — the audit
    // below separately asserts that In() reached the scan).
    val aboveWindow = Map("j11_nearest_event" -> Set("event_type"))
    var checked = 0
    for (n <- PlanDump.AuditQueries) {
      val plan = planOf(n)
      val scanCols = scanOut.findAllMatchIn(plan).flatMap(
        _.group(1).split(',').map(_.trim.takeWhile(_ != '#'))).toSet
      // only atoms on FILTER nodes (and scan DataFilters) are pushdown
      // candidates — the same comparison shape inside a conditional
      // aggregate (a26's SUM(CASE WHEN value > 95 ...)) or a projection
      // is not a filter and has nowhere to push
      val filterLines = plan.linesIterator.filter(_.contains("Filter")).mkString("\n")
      for (m <- atom.findAllMatchIn(filterLines)) {
        val (c, op) = (m.group(1), m.group(2))
        if (scanCols(c) && !aboveWindow.getOrElse(n, Set.empty).contains(c)) {
          checked += 1
          assert(plan.contains(s"${opName(op)}($c"),
            s"$n: scan-expressible predicate `$c ${m.group(2)} ${m.group(3)}` " +
              s"is evaluated post-scan but missing from PushedFilters")
        }
      }
    }
    // the j11 exception's compensating narrowing must actually push:
    // the scan carries an In(event_type, ...) filter
    assert(planOf("j11_nearest_event").contains("In(event_type"),
      "j11: the compensating IN(click, purchase) narrowing left the scan")
    // vacuity guard: the suite is known to carry at least the four orders
    // date ranges, r_name/o_orderstatus equalities, event_type equalities
    // and the vec_id probe bounds — if the regexes stop matching the plan
    // format, fail loudly instead of green-by-matching-nothing
    assert(checked >= 10, s"audit matched only $checked atoms — plan format drift?")
  }

  /** io07's whole point: a partition-column predicate is resolved against
    * DIRECTORY NAMES at planning time (`PartitionFilters`), so unselected
    * partitions are never opened — the difference between O(selected) and
    * O(corpus) for every coarse-filter read at 100 TB.
    */
  test("io07 read-back prunes partitions statically (PartitionFilters)") {
    val plan = planOf("io07_partitioned_lake")
    assert(plan.contains("PartitionFilters") && plan.contains("lang#"),
      s"io07: no partition filter on the lake scan:\n$plan")
    // the IN must sit in PartitionFilters, not be evaluated post-scan
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("lang"), s"io07: lang not in PartitionFilters: $pf")
  }

  /** Suite-wide single-reducer-window audit (VERDICT r8 #8): a Window
    * with an EMPTY partition spec funnels its whole input through ONE
    * reducer — fine when the input is provably collapsed to a bounded
    * row count first (|days|, |buckets|, |batches| carry windows), a
    * scale killer when it is O(corpus) (the a31 shape). The audit
    * flags every empty-partition logical Window outside the allowlist,
    * and fails on STALE allowlist entries too, so a fixed query can't
    * keep its exemption.
    */
  test("no unpartitioned window outside collapsed-frame allowlist (suite-wide audit)") {
    import org.apache.spark.sql.catalyst.plans.logical
    // name -> why the empty-partition window is safe at 100 TB
    val collapsed: Map[String, String] = Map(
      "w05_cumulative_uniques" ->
        "carry window over the |days| daily-aggregate frame (bounded by calendar, not corpus)",
      "w08_max_concurrency" ->
        "two-pass prefix sum: carry window over |days| per-day partials only",
      "st04_late_profile" ->
        "carry window over the |batches| micro-batch summary frame",
      "t16_bpe_merge_round" ->
        "rank window AFTER TakeOrdered(20) — touches exactly 20 surviving rows",
      "t24_bpe_apply_merge" ->
        "argmax-merge pick over the alphabet^2-bounded pair table (map-side-collapsed)",
      "a31_conversion_lag" ->
        "gate-exactness form (documented a05 convention); production twin a31b benches window-free",
      "a31b_conversion_lag_approx" ->
        "band-edge proof only — benchAs form is the sketch agg, no window in the production plan",
      "t28_vocab_coverage" ->
        "rank/cumsum windows AFTER the TakeOrdered(1000) heap cut — bounded frame (own PlanSpec pin)",
      "t31_url_domain_stats" ->
        "blocklist rank window over the |domains| aggregate frame (map-side-collapsed before the window)")
    val offenders = PlanDump.AuditQueries
      .flatMap { n =>
        val df = SparkEntry.queries(n)(spark, sf)
        val bad = df.queryExecution.optimizedPlan.collect {
          case w: logical.Window if w.partitionSpec.isEmpty => w
        }
        if (bad.nonEmpty) Some(n) else None
      }.toSet
    val unexplained = offenders -- collapsed.keySet
    val stale = collapsed.keySet -- offenders
    assert(unexplained.isEmpty,
      s"unpartitioned windows need a collapsed-frame justification: $unexplained")
    assert(stale.isEmpty,
      s"stale allowlist entries (window no longer in plan): $stale")
    // the a31b exemption's premise must hold: its PRODUCTION (benchAs)
    // plan carries no unpartitioned window at all
    val prod = SparkEntry.benchQueries("a31b_conversion_lag_approx")(spark, sf)
      .queryExecution.optimizedPlan.collect {
        case w: logical.Window if w.partitionSpec.isEmpty => w
      }
    assert(prod.isEmpty,
      "a31b production form must be window-free (sketch agg only)")
  }

  /** VERDICT r8 #1: the stored indexes apply io07's layout to THEMSELVES.
    * t21b's postings store is term-bucket partitioned and the retrieval
    * scan must be statically pruned to the query terms' buckets — the
    * difference between O(matched buckets) and O(store) I/O per query at
    * 100 TB. The pin requires the bucket IN-list in `PartitionFilters`
    * (directory-name resolution at planning time), not a post-scan
    * filter, and the corpus absent from the retrieval plan entirely.
    */
  test("t21b retrieval prunes the postings store to the query terms' buckets") {
    val plan = planOf("t21b_bm25_stored")
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString("\n")
    assert(pf.contains("bucket#") && pf.contains(" IN "),
      s"t21b: no static bucket IN-list in PartitionFilters:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"t21b: retrieval plan scans the corpus, not just the store:\n$plan")
  }

  /** VERDICT r9 #1 (what's wrong): the postings store must be
    * SELF-DESCRIBING — retrieval reads the bucket modulus from the
    * store's stats, never from the binary's compile-time default. The
    * version-skew shape: build at a NON-default bucket count (the "old
    * store"), retrieve with a binary whose default differs (today's
    * binary) — pruning with the wrong modulus would visit the wrong
    * directories and silently drop hits. Identical top-10 vs a
    * default-built store proves the metadata, not the constant, drives
    * pruning. A pre-metadata store (no `buckets` column) must REFUSE,
    * not guess.
    */
  test("t21b store is self-describing: non-default bucket count retrieves correctly") {
    import graft.queries.TextQueries
    assert(TextQueries.Bm25Buckets != 5) // the skew must be real
    val oldStore = graft.queries.Dsl.tempStore("t21b_skew")
    TextQueries.bm25BuildIndex(spark, sf, oldStore, buckets = 5)
    val defStore = graft.queries.Dsl.tempStore("t21b_def")
    TextQueries.bm25BuildIndex(spark, sf, defStore)
    val fromOld = TextQueries.bm25Retrieve(spark, oldStore).collect().toSeq
    val fromDef = TextQueries.bm25Retrieve(spark, defStore).collect().toSeq
    assert(fromOld == fromDef,
      s"retrieval from a 5-bucket store diverged from the default-built " +
        s"store:\n$fromOld\nvs\n$fromDef")
    // a store with no layout metadata must fail loudly, not prune wrong
    val legacy = graft.queries.Dsl.tempStore("t21b_legacy")
    TextQueries.bm25BuildIndex(spark, sf, legacy)
    spark.read.parquet(s"$legacy/stats").drop("buckets")
      .write.mode("overwrite").parquet(s"$legacy/stats_new")
    // overwrite stats with the stripped copy (can't overwrite from self)
    val fs = new org.apache.hadoop.fs.Path(legacy)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$legacy/stats"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$legacy/stats_new"),
      new org.apache.hadoop.fs.Path(s"$legacy/stats"))
    val e = intercept[IllegalArgumentException] {
      TextQueries.bm25Retrieve(spark, legacy)
    }
    assert(e.getMessage.contains("buckets"))
  }

  /** VERDICT r9 #8 — the GENERIC store-pruning sweep: every persistent
    * store the repo writes is enumerated in ONE registry
    * ([[StoreAudit.storeGates]]) with the pruning evidence its selective
    * read must exhibit; a new store gets a registry row, and removing
    * any store's pruning (re-flattening a layout, dropping the
    * driver-resolved IN-list or file list) fails this sweep — the r8
    * t21b/e19 class of gap cannot recur silently.
    */
  test("store reads prune: every registered store shows partition- or file-level pruning") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def leavesOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case f: FileSourceScanExec => Seq(f)
        case a: AdaptiveSparkPlanExec => leavesOf(a.executedPlan)
        // AQE hides materialized stage subtrees behind leaf wrappers
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          leavesOf(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          leavesOf(r.child)
      }.flatten
    for ((gate, evidence) <- StoreAudit.storeGates) evidence match {
      case StoreAudit.PartitionPruned(key) =>
        val plan = planOf(gate)
        val pf = plan.linesIterator.filter(_.contains("PartitionFilters"))
          .mkString("\n")
        assert(pf.contains(s"$key#") && pf.contains(" IN "),
          s"$gate: no static $key IN-list in PartitionFilters:\n$plan")
      case StoreAudit.FilePruned(levelsUp) =>
        val df = SparkEntry.queries(gate)(spark, sf)
        df.collect() // finalize AQE; the store is built as a side effect
        val scans = leavesOf(df.queryExecution.executedPlan)
        assert(scans.nonEmpty, s"$gate: no file scans in executed plan")
        // the STORE scan: walk up from a scanned file to the store root
        // and compare against everything physically there
        val pruned = scans.exists { s =>
          val files = s.relation.location.inputFiles.filter(_.contains("parquet"))
          files.nonEmpty && {
            var root = new java.io.File(new java.net.URI(files.head)).getParentFile
            (0 until levelsUp - 1).foreach(_ => root = root.getParentFile)
            val all = java.nio.file.Files.walk(root.toPath)
            val total = try all.filter(p =>
                p.toString.endsWith(".parquet") || p.getFileName.toString.startsWith("part-"))
              .count() finally all.close()
            files.length < total
          }
        }
        assert(pruned,
          s"$gate: no store scan reads a strict subset of its store's files " +
            s"(scans: ${scans.map(_.relation.location.inputFiles.length).mkString(",")})")
      case StoreAudit.CompactedDirs(maxDirs, baseDir) =>
        // retention evidence: the gate's store read must span at most
        // maxDirs partition directories, one of them the base slice —
        // i.e. compaction folded the committed tail instead of the store
        // keeping one directory per micro-batch
        val df = SparkEntry.queries(gate)(spark, sf)
        df.collect() // runs the stream + mid-stream compaction
        val scans = leavesOf(df.queryExecution.executedPlan)
        val partDirs = scans.flatMap(_.relation.location.inputFiles)
          .filter(_.contains(baseDir.takeWhile(_ != '=') + "="))
          .map(f => new java.io.File(new java.net.URI(f)).getParentFile.getName)
          .toSet
        assert(partDirs.nonEmpty, s"$gate: no store scan over partition dirs")
        assert(partDirs.size <= maxDirs && partDirs.contains(baseDir),
          s"$gate: store not compacted — scanned dirs $partDirs " +
            s"(want <= $maxDirs including $baseDir)")
    }
  }

  /** Same pin for e19: the IVF-PQ codes store is cluster-partitioned and
    * the search scan must be statically pruned to the probed clusters —
    * search I/O ∝ nprobe × cluster size, with the corpus nowhere in the
    * plan.
    */
  test("e19 search prunes the codes store to the probed clusters") {
    val plan = planOf("e19_ivfpq_stored")
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString("\n")
    assert(pf.contains("cluster#") && pf.contains(" IN "),
      s"e19: no static cluster IN-list in PartitionFilters:\n$plan")
    // the corpus must never appear as an unbounded search-side scan.
    // r14: the request-sized query frame is collected coordinator-side
    // (probe lists + ADC tables are local relations), so the retrieval
    // plan normally contains NO embeddings scan at all — the strictly
    // stronger form of the original pin; any embeddings scan that does
    // appear must still carry the query-side bound.
    val corpusScans = plan.linesIterator
      .filter(_.contains("embeddings.parquet")).toSeq
    assert(corpusScans.forall(_.contains("LessThan(vec_id")),
      s"e19: an embeddings scan without the query-side bound:\n$plan")
  }

  /** Dynamic partition pruning: when the partition predicate arrives via
    * a JOIN (star-schema: fact partitioned by key, dim carries the
    * selective filter), Spark plants a runtime subquery filter on the
    * scan — the fact read is still O(selected partitions) even though no
    * literal predicate exists at plan time. The spec builds a real
    * hive-layout lake and joins it with a 2-row filtered dim.
    */
  test("join-derived partition predicates prune dynamically (DPP)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val lake = graft.queries.Dsl.tempStore("dpp_lake")
    Tables.documents(spark, sf)
      .repartition(col("lang"))
      .write.mode("overwrite").partitionBy("lang").parquet(lake)
    // the dim must be a REAL source with a surviving Filter node — a
    // local Seq constant-folds its filter away and the DPP rule sees no
    // selective predicate to transplant
    val dimPath = graft.queries.Dsl.tempStore("dpp_dim")
    Seq(("en", 1), ("de", 2), ("fr", 3), ("es", 4), ("zh", 5))
      .toDF("d_lang", "d_pri").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("d_pri") <= 2)
    val joined = spark.read.parquet(lake)
      .join(broadcast(dim), col("lang") === col("d_lang"))
      .groupBy("lang").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning on the lake scan:\n$plan")
    val rows = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("en", "de"), s"wrong partitions read: $rows")
  }
}
