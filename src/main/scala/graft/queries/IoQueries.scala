package graft.queries

import graft.{Det, GraftQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IO-path gates: the CSV edge contract (SURVEY §2.1 S1/S7 — the
  * reference persists every stage boundary as CSV) proven through the
  * oracle. The Spark side writes the frame out and reads it back through
  * the real codec; the oracle computes the same aggregates from the
  * ORIGINAL table — any loss anywhere in the round-trip (timestamp
  * precision, double shortest-representation, quoting/escaping of the
  * JSON-bearing string column, null handling) breaks the hash.
  */
object IoQueries {

  private val eventsCsvSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** IO1 — CSV round-trip: microsecond timestamps need an explicit
    * 6-digit-fraction format (the default truncates to millis — the
    * schema-ownership lesson from the reference's converters,
    * Preprocessor.py:107); doubles round-trip via shortest
    * representation; the props column carries JSON (commas, quotes,
    * braces) and exercises quoting/escaping.
    */
  /** The per-group timestamp/props fingerprints are BIT_XOR, not SUM:
    * a SUM of epoch-microseconds overflows BIGINT under ANSI past ~5k
    * rows per group (it did, at sf0.1, the moment the bench stopped
    * letting count() prune the column), while XOR is exact,
    * order-independent, and overflow-free at ANY scale — and with COUNT
    * alongside, any per-row corruption the round-trip could introduce
    * still flips the fingerprint.
    */
  val io01CsvRoundtrip: GraftQuery = GraftQuery(
    "io01_csv_roundtrip", {
      val propsHash = graft.functions.TextFunctions.sqlRollingHash("props")
      s"""SELECT event_type, COUNT(*) AS n,
         |  ${Det.sqlSum("value", 6)} AS sum_value,
         |  BIT_XOR(epoch_us(ts)) AS xor_ts_us,
         |  BIT_XOR($propsHash) AS xor_props_hash,
         |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    }) { (spark, dir) =>
    val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val out = Dsl.tempStore("io01_csv")
    Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.option("header", "true").option("timestampFormat", tsFmt)
      .option("timestampNTZFormat", tsFmt) // sink owns BOTH flavors' formats
      .mode("overwrite").csv(out)
    spark.read.option("header", "true").option("timestampFormat", tsFmt)
      .option("timestampNTZFormat", tsFmt)
      .schema(eventsCsvSchema).csv(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        Det.dsum(col("value"), 6).as("sum_value"),
        bit_xor(unix_micros(col("ts"))).as("xor_ts_us"),
        bit_xor(graft.functions.TextFunctions.rollingHash(col("props")))
          .as("xor_props_hash"),
        min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
      .orderBy("event_type")
  }

  /** IO2 — JSON-lines round-trip (S2 scan / S8 sink): same loss-free
    * gate through the JSON codec; the props column nests raw JSON inside
    * a JSON string value, exercising escape round-trips.
    */
  val io02JsonRoundtrip: GraftQuery = GraftQuery(
    "io02_json_roundtrip", {
      val propsHash = graft.functions.TextFunctions.sqlRollingHash("props")
      s"""SELECT event_type, COUNT(*) AS n,
         |  ${Det.sqlSum("value", 6)} AS sum_value,
         |  BIT_XOR(epoch_us(ts)) AS xor_ts_us,
         |  BIT_XOR($propsHash) AS xor_props_hash
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    }) { (spark, dir) =>
    val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val out = Dsl.tempStore("io02_json")
    Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.option("timestampFormat", tsFmt)
      .option("timestampNTZFormat", tsFmt) // sink owns BOTH flavors' formats
      .mode("overwrite").json(out)
    spark.read.option("timestampFormat", tsFmt)
      .option("timestampNTZFormat", tsFmt)
      .schema(eventsCsvSchema).json(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        Det.dsum(col("value"), 6).as("sum_value"),
        bit_xor(unix_micros(col("ts"))).as("xor_ts_us"),
        bit_xor(graft.functions.TextFunctions.rollingHash(col("props")))
          .as("xor_props_hash"))
      .orderBy("event_type")
  }

  /** IO3 — BINARY sink + binaryFile scan round-trip (S10 image sink,
    * S5's read-back path): synthetic PNGs written file-per-row by the
    * executor-side binary writer ([[graft.operators.Multimodal
    * .writeImages]]), read back through the `binaryFile` source, and
    * DECODED through the real codec into pixel statistics the oracle
    * recomputes from the pixel formula — gating the write → listing →
    * read → decode chain end-to-end (i01's decode gate, through the
    * filesystem).
    */
  val io03BinaryRoundtrip: GraftQuery = GraftQuery(
    "io03_binary_roundtrip", {
      def gray =
        "(7*x + 11*y + 13*doc_id) % 256 + (3*x + 5*y + 17*doc_id) % 256 + (13*x + 7*y + 19*doc_id) % 256"
      s"""WITH d AS (
         |  SELECT doc_id, 16 + doc_id % 13 AS w, 12 + doc_id % 11 AS h
         |  FROM documents WHERE doc_id % 25 = 2)
         |SELECT doc_id, w, h,
         |  CAST(list_sum(flatten([[${gray} for x in range(w)] for y in range(h)])) AS BIGINT)
         |    AS gray_sum
         |FROM d ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    import graft.operators.Multimodal
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    val out = Dsl.tempStore("io03_bin")
    val imgSchema = StructType(Seq(
      StructField("image", StringType), StructField("content", BinaryType)))
    val imgEnc = RowEncoder.encoderFor(imgSchema)
    val images = Tables.documents(spark, dir)
      .filter(col("doc_id") % 25 === 2)
      .select("doc_id")
      .mapPartitions(rows => rows.map { r =>
        val id = r.getLong(0)
        Row(s"$id.png", Multimodal.syntheticImage(id)) // real PNG encode
      })(imgEnc)
    Multimodal.writeImages(images, out) // S10: file-per-row binary sink
    val model = Multimodal.ImageIoVisionModel()
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("w", LongType), StructField("h", LongType),
      StructField("gray_sum", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    Multimodal.readImages(spark, out) // S5 read-back: binaryFile source
      .mapPartitions { rows =>
        val m = model
        rows.map { r =>
          val id = r.getAs[String]("image").stripSuffix(".png").toLong
          val (w, h, rs, gs, bs) = m.channelSums(r.getAs[Array[Byte]]("content")).get
          Row(id, w.toLong, h.toLong, rs + gs + bs)
        }
      }(enc)
      .orderBy("doc_id")
  }

  /** IO4 — ORC round-trip (the columnar-sink alternative a lake running
    * mixed engines keeps alongside Parquet): events written through
    * Spark's built-in ORC codec and read back, gated by the same
    * loss-free aggregate contract as io01/io02 — timestamp microseconds,
    * doubles, and the JSON-bearing string column all survive bit-for-bit
    * or the hash breaks. ORC stores TIMESTAMP natively (no format
    * options to own, unlike the text codecs) — the gate proves the
    * binary fidelity claim rather than a format-string choice.
    *
    * Scale shape: identical to the Parquet path — columnar scan with
    * predicate/column pushdown; the round-trip is file-parallel both
    * directions.
    */
  val io04OrcRoundtrip: GraftQuery = GraftQuery(
    "io04_orc_roundtrip", {
      val propsHash = graft.functions.TextFunctions.sqlRollingHash("props")
      s"""SELECT event_type, COUNT(*) AS n,
         |  ${Det.sqlSum("value", 6)} AS sum_value,
         |  BIT_XOR(epoch_us(ts)) AS xor_ts_us,
         |  BIT_XOR($propsHash) AS xor_props_hash,
         |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    }) { (spark, dir) =>
    val out = Dsl.tempStore("io04_orc")
    Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").orc(out)
    spark.read.orc(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        Det.dsum(col("value"), 6).as("sum_value"),
        bit_xor(unix_micros(col("ts"))).as("xor_ts_us"),
        bit_xor(graft.functions.TextFunctions.rollingHash(col("props")))
          .as("xor_props_hash"),
        min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
      .orderBy("event_type")
  }

  /** IO5 — SCHEMA-EVOLUTION merge read (the lake reality: batches landed
    * months apart carry different column sets; the reader must unify).
    * Two parquet batches are written with DISJOINT optional columns
    * (batch A: content hash; batch B: char count) and read back through
    * `mergeSchema` — the union schema with nulls where a batch lacks the
    * column. The gate aggregates per language over the merged frame;
    * the oracle computes the same numbers from the original table with
    * the batch predicate inlined, so a dropped column, a misaligned
    * null, or a type widening anywhere in the merge breaks the hash.
    *
    * Scale shape: footer-only schema union at planning time; each file
    * still scans only its own columns (missing ones materialize as null
    * vectors, no data read) — merge costs no row-level work.
    */
  val io05SchemaMerge: GraftQuery = GraftQuery(
    "io05_schema_merge", {
      val rh = graft.functions.TextFunctions.sqlRollingHash("text")
      s"""SELECT lang,
         |  COUNT(*) AS n,
         |  CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_h,
         |  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_nc,
         |  BIT_XOR(CASE WHEN doc_id % 2 = 0 THEN $rh ELSE 0 END) AS xor_h,
         |  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS sum_nc
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
    }) { (spark, dir) =>
    import graft.functions.TextFunctions.rollingHash
    val out = Dsl.tempStore("io05_merge")
    val docs = Tables.documents(spark, dir)
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang"), rollingHash(col("text")).as("h"))
      .write.mode("overwrite").parquet(s"$out/batch_a")
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/batch_b")
    spark.read.option("mergeSchema", "true")
      .parquet(s"$out/batch_a", s"$out/batch_b")
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(when(col("h").isNotNull, 1L).otherwise(0L)).as("n_h"),
        sum(when(col("n_chars").isNotNull, 1L).otherwise(0L)).as("n_nc"),
        bit_xor(coalesce(col("h"), lit(0L))).as("xor_h"),
        sum(coalesce(col("n_chars"), lit(0L))).as("sum_nc"))
      .orderBy("lang")
  }

  /** IO6 — small-file COMPACTION (lake maintenance, `OPTIMIZE`-shape):
    * the corpus is first landed as 64 deliberately-small parquet files
    * (the streaming-sink reality), then [[graft.operators.Compact]]
    * rewrites it into size-targeted files (file count derived from the
    * MEASURED input bytes, ~4 here). The gate aggregates per language
    * over the COMPACTED copy against the original-table oracle — any
    * row lost, duplicated, or corrupted by the rewrite breaks the
    * count/hash. CompactionSpec pins the file-count contract itself.
    *
    * Scale shape: round-robin `repartition` (even output files
    * regardless of input skew; `coalesce` would glue uneven and cap
    * read parallelism); on a date-partitioned lake each partition
    * compacts independently.
    */
  val io06Compaction: GraftQuery = GraftQuery(
    "io06_compaction", {
      val rh = graft.functions.TextFunctions.sqlRollingHash("text")
      s"""SELECT lang, COUNT(*) AS n,
         |  BIT_XOR($rh) AS xor_h,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_nc
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
    }) { (spark, dir) =>
    import graft.functions.TextFunctions.rollingHash
    import graft.operators.Compact
    val small = Dsl.tempStore("io06_small")
    val compacted = Dsl.tempStore("io06_compacted")
    Tables.documents(spark, dir)
      .repartition(64) // the many-small-files landing shape
      .write.mode("overwrite").parquet(small)
    val target = math.max(1L, Compact.parquetBytes(spark, small) / 4)
    Compact.compact(spark, small, compacted, target)
    spark.read.parquet(compacted)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        bit_xor(rollingHash(col("text"))).as("xor_h"),
        sum(col("n_chars")).as("sum_nc"))
      .orderBy("lang")
  }

  /** IO07 — HIVE-PARTITIONED LAKE LAYOUT + partition-pruned read-back:
    * the corpus is written `partitionBy(lang)` (the `lang=en/` directory
    * layout every data lake uses for its coarsest filter column) and
    * read back under a partition-column predicate. The aggregate gates
    * the full round trip: partition values come back from DIRECTORY
    * NAMES, not file contents (the written files do not contain the
    * `lang` column at all), so any layout/inference drift breaks the
    * rows.
    *
    * Scale shape: this is the op that makes `p10`-style selective scans
    * O(selected) instead of O(corpus) — the catalyst `PartitionFilters`
    * entry (asserted in IoSpec, alongside a dynamic-partition-pruning
    * twin for the join-derived case) eliminates unselected directories
    * at PLANNING time; no task ever opens them. The write side shuffles
    * once on the partition key so each output directory is written by
    * few tasks (small-file control at 1000 executors — without it every
    * task writes every partition).
    */
  val io07PartitionedLake: GraftQuery = GraftQuery(
    "io07_partitioned_lake", {
      val rh = graft.functions.TextFunctions.sqlRollingHash("text")
      s"""SELECT lang, source, COUNT(*) AS n,
         |  BIT_XOR($rh) AS xor_h,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_nc
         |FROM documents WHERE lang IN ('en', 'de')
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    }) { (spark, dir) =>
    import graft.functions.TextFunctions.rollingHash
    val lake = Dsl.tempStore("io07_lake")
    Tables.documents(spark, dir)
      // one shuffle on the partition key: each lang directory is written
      // by its own task set, not |tasks|×|langs| small files
      .repartition(col("lang"))
      .write.mode("overwrite").partitionBy("lang").parquet(lake)
    spark.read.parquet(lake)
      .filter(col("lang").isin("en", "de"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"),
        bit_xor(rollingHash(col("text"))).as("xor_h"),
        sum(col("n_chars")).as("sum_nc"))
      .orderBy("lang", "source")
  }

  /** IO8 — atomic manifest-pointer PUBLISH ([[graft.operators.Publish]]):
    * snapshot-isolated multi-batch ingestion on a plain filesystem — the
    * contract the reference's chunked directory-glob landing
    * (DataStorage.py) is missing. Two batches (even/odd doc ids) are
    * published through versioned rename-committed manifests; a third
    * data dir is written WITHOUT a manifest commit, simulating a writer
    * that died after its data write — then the snapshot is read back
    * through the manifest and aggregated per language. The oracle
    * computes the same aggregate from the raw table: if the orphaned
    * batch leaked into the read (directory-glob semantics), every count
    * and sum doubles for its rows and the hash breaks — the gate proves
    * readers see exactly the committed snapshot, nothing more.
    *
    * Scale shape: publish is one data write + one tiny manifest rename
    * per batch (no table scan, no lock); the snapshot read plans as an
    * ordinary multi-path parquet scan, so pruning/pushdown work
    * unchanged. PublishSpec pins the crash/idempotence/time-travel
    * seams SQL cannot express.
    */
  val io08ManifestPublish: GraftQuery = GraftQuery(
    "io08_manifest_publish",
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_nc,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    import graft.operators.Publish
    val root = Dsl.tempStore("io08_lake")
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "lang", "n_chars")
    Publish.publishBatch(spark, docs.filter(pmod(col("doc_id"), lit(2)) === 0),
      root, "batch-even")
    Publish.publishBatch(spark, docs.filter(pmod(col("doc_id"), lit(2)) === 1),
      root, "batch-odd")
    // a crashed writer: data landed, manifest never committed
    docs.limit(500).write.mode("overwrite").parquet(s"$root/data/orphan")
    Publish.readSnapshot(spark, root).get
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_nc"),
        sum("doc_id").as("sum_ids"))
      .orderBy("lang")
  }

  /** IO9 — MALFORMED-INPUT tolerance (the dirty-feed reality the
    * reference's scrapers face: a landed CSV always contains rows that
    * don't parse). A clean CSV landing is polluted with deliberately
    * corrupt lines (unparseable id column, derived from `doc_id%25=3`
    * rows), then read back TWICE through the schema-owned reader:
    * PERMISSIVE mode quarantines each bad row into the corrupt-record
    * column (nothing is lost — the raw line survives for a dead-letter
    * sink) while DROPMALFORMED silently drops them. The gate pins all
    * four counts and an XOR fingerprint of the surviving ids against
    * the oracle's predicate-derived expectations — one corrupt row
    * leaking into the clean set, or one clean row misparsed, breaks it.
    *
    * Scale shape: both reads are ordinary parallel CSV scans; the
    * quarantine column is per-row, the audit one map-side aggregate.
    */
  val io09MalformedCsv: GraftQuery = GraftQuery(
    "io09_malformed_csv",
    """WITH bad AS (SELECT COUNT(*) AS n_bad FROM documents WHERE doc_id % 25 = 3),
      |clean AS (SELECT COUNT(*) AS n_clean, BIT_XOR(doc_id) AS xor_ids FROM documents)
      |SELECT n_clean + n_bad AS n_total, n_clean AS n_parsed,
      |       n_bad AS n_quarantined, n_clean AS n_after_drop, xor_ids
      |FROM bad, clean""".stripMargin) { (spark, dir) =>
    val out = Dsl.tempStore("io09_csv")
    val docs = Tables.documents(spark, dir).select("doc_id", "lang", "n_chars")
    docs.write.mode("overwrite").csv(s"$out/landed")
    // the polluter: same landing directory, lines whose id column can
    // never parse as LONG — what a half-written or garbled feed leaves
    import spark.implicits._
    docs.filter(pmod(col("doc_id"), lit(25)) === 3)
      .select(concat(lit("corrupt-"), col("doc_id"), lit(","), col("lang")).as("value"))
      .as[String]
      .write.mode("overwrite").text(s"$out/landed_bad")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType),
      StructField("_bad", StringType))) // corrupt-record quarantine
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_bad")
      .csv(s"$out/landed", s"$out/landed_bad")
    val dropped = spark.read.schema(StructType(schema.fields.dropRight(1)))
      .option("mode", "DROPMALFORMED")
      .csv(s"$out/landed", s"$out/landed_bad")
    val p = permissive.agg(
      count(lit(1)).as("n_total"),
      sum(when(col("_bad").isNull, 1L).otherwise(0L)).as("n_parsed"),
      sum(when(col("_bad").isNotNull, 1L).otherwise(0L)).as("n_quarantined"),
      bit_xor(when(col("_bad").isNull, col("doc_id"))).as("xor_ids"))
    // count(doc_id), NOT count(*): CSV column pruning means DROPMALFORMED
    // only drops a row when a REFERENCED column fails to parse — a bare
    // count(*) parses nothing and drops nothing (measured: 520, not 500).
    // The audit must touch the column it claims to audit.
    val d = dropped.agg(count(col("doc_id")).as("n_after_drop"))
    p.crossJoin(d)
      .select(col("n_total"), col("n_parsed"), col("n_quarantined"),
        col("n_after_drop"), col("xor_ids"))
  }

  /** IO10 — DYNAMIC PARTITION OVERWRITE (the "backfill one day"
    * lakehouse op, Spark's `partitionOverwriteMode=dynamic`): a
    * day-partitioned events lake receives a restated batch covering
    * THREE days; in dynamic mode the second write replaces exactly the
    * partitions the batch touches and leaves every other day's files
    * untouched (static mode — the default — would wipe the whole
    * table; that trap is why this op exists as a gate). The restated
    * rows carry value+1000 cents so leakage is arithmetic, not just
    * counts: the oracle computes original-days ∪ restated-days from
    * the raw table — any surviving old row in a restated day, or any
    * lost untouched day, breaks the per-day sums.
    *
    * Scale shape: the backfill write shuffles ONLY the batch (one
    * repartition on the partition key); untouched partitions cost
    * nothing — no read, no rewrite, no lock. The read-back is an
    * ordinary partition-pruned scan.
    */
  val io10DynamicOverwrite: GraftQuery = GraftQuery(
    "io10_dynamic_overwrite",
    """WITH base AS (
      |  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |expected AS (
      |  SELECT day,
      |         CASE WHEN day IN ('2024-01-05', '2024-01-06', '2024-01-07')
      |              THEN cents + 1000 ELSE cents END AS cents
      |  FROM base)
      |SELECT day, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
      |FROM expected GROUP BY day ORDER BY day""".stripMargin) { (spark, dir) =>
    val lake = Dsl.tempStore("io10_lake")
    val base = Tables.events(spark, dir)
      .select(to_date(col("ts")).cast("string").as("day"),
        (col("value").cast("decimal(18,2)") * 100).cast("bigint").as("cents"))
    base.repartition(col("day"))
      .write.mode("overwrite").partitionBy("day").parquet(lake)
    val restatedDays = Seq("2024-01-05", "2024-01-06", "2024-01-07")
    val batch = base.filter(col("day").isin(restatedDays: _*))
      .withColumn("cents", col("cents") + 1000)
    // Writer-scoped option (not a session-conf flip): under a shared
    // session, a concurrent writer racing the set/restore window could
    // run in STATIC mode and wipe every untouched partition — the exact
    // trap this gate exists to document. The per-writer form cannot race.
    batch.repartition(col("day"))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(lake)
    spark.read.parquet(lake)
      .groupBy("day")
      .agg(count(lit(1)).as("n"), sum("cents").cast("bigint").as("sum_cents"))
      .select(col("day").cast("string").as("day"), col("n"), col("sum_cents"))
      .orderBy("day")
  }

  /** IO11 — ZONE-MAP FILE SKIPPING ([[graft.operators.ZoneMap]]): the
    * data-skipping layer io07 cannot give a high-cardinality key — the
    * lake is written range-clustered on `ts` (each file a disjoint time
    * band), a sidecar manifest records per-file min/max, and a 3-day
    * range read consults the MANIFEST to open only intersecting files,
    * exactly the min/max-stats pruning lake table formats ship. The
    * oracle recomputes the band aggregate from the raw table, so zone
    * bounds, the half-open intersect test, and the residual filter are
    * all hash-gated; OpsSpec additionally pins that the file list is a
    * strict subset and that a miss-band read opens ZERO files.
    */
  val io11ZoneMapSkip: GraftQuery = GraftQuery(
    "io11_zonemap_skip",
    """SELECT event_type, COUNT(*) AS n,
      |       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      |  AND ts <  TIMESTAMP '2024-01-13 00:00:00'
      |GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, dir) =>
    import graft.operators.ZoneMap
    val lake = Dsl.tempStore("io11_lake")
    ZoneMap.writeClustered(Tables.events(spark, dir)
        .select("event_id", "ts", "event_type", "value"),
      lake, "ts", numFiles = 16)
    ZoneMap.readRange(spark, lake, "ts",
        lit("2024-01-10").cast("timestamp"), lit("2024-01-13").cast("timestamp"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("bigint"))
          .cast("bigint").as("sum_cents"))
      .orderBy("event_type")
  }

  /** IO12 — INCREMENTAL manifest consumption
    * ([[graft.operators.Publish.readIncrement]]): file-level CDC off
    * io08's manifest chain — a consumer that processed version v reads
    * ONLY the batches published after v (here: the first of three
    * batches is "already processed"; the increment is exactly the other
    * two). The oracle recomputes the increment's aggregate from the raw
    * table, so the version diff, batch immutability, and
    * orphan-invisibility (a crashed writer's dir lands mid-chain and
    * must NOT appear) are all hash-gated. O(increment) I/O — the read
    * plans over the new batch dirs only, never a snapshot rescan.
    */
  val io12IncrementalRead: GraftQuery = GraftQuery(
    "io12_incremental_read",
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_nc,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
      |FROM documents WHERE doc_id % 3 <> 0
      |GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    import graft.operators.Publish
    val root = Dsl.tempStore("io12_lake")
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "lang", "n_chars")
    val v1 = Publish.publishBatch(spark,
      docs.filter(pmod(col("doc_id"), lit(3)) === 0), root, "b0")
    Publish.publishBatch(spark,
      docs.filter(pmod(col("doc_id"), lit(3)) === 1), root, "b1")
    // a crashed writer between the increments: invisible to consumers
    docs.limit(300).write.mode("overwrite").parquet(s"$root/data/orphan")
    Publish.publishBatch(spark,
      docs.filter(pmod(col("doc_id"), lit(3)) === 2), root, "b2")
    Publish.readIncrement(spark, root, sinceVersion = v1).get
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_nc"),
        sum("doc_id").as("sum_ids"))
      .orderBy("lang")
  }

  /** IO13 — XML round-trip (Spark 4's NATIVE xml source; social feeds
    * still ship XML/RSS): the io01/io02 loss-free gate through the XML
    * codec. Strings nest raw JSON inside XML text nodes, exercising
    * entity escaping (&, <, quotes) both directions; timestamps pin an
    * explicit format so the sink owns the representation.
    *
    * Scale shape: identical to the CSV/JSON twins — an embarrassingly
    * parallel write, a schema-pinned parallel scan (XML rowTag framing
    * splits files like JSON-lines), one map-side agg.
    */
  val io13XmlRoundtrip: GraftQuery = GraftQuery(
    "io13_xml_roundtrip", {
      val propsHash = graft.functions.TextFunctions.sqlRollingHash("props")
      s"""SELECT event_type, COUNT(*) AS n,
         |  ${Det.sqlSum("value", 6)} AS sum_value,
         |  BIT_XOR(epoch_us(ts)) AS xor_ts_us,
         |  BIT_XOR($propsHash) AS xor_props_hash
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    }) { (spark, dir) =>
    val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val out = Dsl.tempStore("io13_xml")
    Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.option("rowTag", "event").option("timestampFormat", tsFmt)
      .mode("overwrite").format("xml").save(out)
    spark.read.option("rowTag", "event").option("timestampFormat", tsFmt)
      .schema(eventsCsvSchema).format("xml").load(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        Det.dsum(col("value"), 6).as("sum_value"),
        bit_xor(unix_micros(col("ts"))).as("xor_ts_us"),
        bit_xor(graft.functions.TextFunctions.rollingHash(col("props")))
          .as("xor_props_hash"))
      .orderBy("event_type")
  }

  /** CT01 — the CrowdTangle PREPROCESSOR STAGE hash-gated (ref:
    * Preprocessor.py:24-57, wired as `CTPreprocessorStage`): a CT-shaped
    * CSV — `statistics`/`account` as python-REPR dicts (single quotes,
    * `False`/`None` literals), exactly what pandas' to_csv leaves behind
    * — is synthesized from the documents table, pushed through the real
    * stage via the orchestrator (config parse, dispatch, CSV write), and
    * the stage's OUTPUT file is read back and ordered. The oracle
    * replays the synthesis arithmetic, so the repr→JSON normalization,
    * `from_json` extraction of nested actual/expected counts, the
    * account-id pull, the `#(\\w+)` hashtag regex, and both CSV
    * round-trips (quote-doubled dict commas included) are gated
    * bit-for-bit — upgrading the stage from spec-only to oracle-checked.
    *
    * Scale shape: the stage is one codegen'd projection over a
    * multiLine CSV scan (non-splittable by contract — CSV exists only
    * at declared edges; intermediates are parquet).
    */
  val ct01CtPreprocess: GraftQuery = GraftQuery(
    "ct01_ct_preprocess",
    """SELECT doc_id,
      |       (doc_id * 7) % 500 AS likes,
      |       (doc_id * 3) % 40 AS comment_count,
      |       (doc_id * 13) % 900 AS likes_expected,
      |       (doc_id * 5) % 60 AS comment_count_expected,
      |       (doc_id * 11) % 1000 AS owner_id,
      |       '["t' || CAST(doc_id % 7 AS VARCHAR) || '"]' AS tags
      |FROM documents WHERE doc_id % 6 = 1 ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val root = Dsl.tempStore("ct01_root")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    // synthesize the CT CSV: repr-dict columns built as strings, so the
    // CSV writer must quote them (embedded commas) and the stage must
    // survive the quote round-trip + repr literals
    Tables.documents(spark, dir).filter(col("doc_id") % 6 === 1)
      .select(
        col("doc_id"),
        concat(lit("p"), col("doc_id")).as("platformId"),
        concat(lit("post "), col("doc_id"), lit(" #t"), col("doc_id") % 7)
          .as("description"),
        concat(lit("{'actual': {'favoriteCount': "), (col("doc_id") * 7) % 500,
          lit(", 'commentCount': "), (col("doc_id") * 3) % 40,
          lit("}, 'expected': {'favoriteCount': "), (col("doc_id") * 13) % 900,
          lit(", 'commentCount': "), (col("doc_id") * 5) % 60, lit("}}"))
          .as("statistics"),
        concat(lit("{'id': "), (col("doc_id") * 11) % 1000,
          lit(", 'name': 'A, B', 'verified': False, 'bio': None}"))
          .as("account"),
        date_format(
          timestamp_seconds(lit(1262304000L) + col("doc_id") * 3600),
          "yyyy-MM-dd HH:mm:ss").as("date"))
      .coalesce(1).write.option("header", "true").option("escape", "\"")
      .csv(s"$root/ct_posts.csv")
    val cfg =
      """{"dataset_name": "ct", "stages": [
        |  {"name": "CT Preprocessing", "implementation": "CTPreprocessorStage",
        |   "input": "ct_posts.csv", "output": "ct_preprocessed.csv",
        |   "params": {}}]}""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "config.json"), cfg)
    val summary = graft.pipeline.Pipeline.run(spark, root,
      graft.pipeline.Pipeline.loadConfig(s"$root/config.json"))
    require(summary.filter(col("status") =!= "ok").isEmpty, "ct01 stage failed")
    spark.read.option("header", "true").option("multiLine", "true")
      .option("escape", "\"").csv(s"$root/ct_preprocessed.csv")
      .select(
        col("doc_id").cast("long").as("doc_id"),
        col("likes").cast("long").as("likes"),
        col("comment_count").cast("long").as("comment_count"),
        col("likes_expected").cast("long").as("likes_expected"),
        col("comment_count_expected").cast("long").as("comment_count_expected"),
        col("owner_id").cast("long").as("owner_id"),
        col("hashtags").as("tags"))
      .orderBy("doc_id")
  }

  /** IO14 — COMPRESSED JSON-lines round-trip: io02's loss-free gate
    * through a real compression codec (gzip — web corpora land as
    * .json.gz/.warc.gz; the scan must decompress transparently and the
    * sink must produce standard-codec files other tools read). Same
    * aggregate contract as io02, so codec involvement is the ONLY
    * difference — any decompression loss or encoding drift breaks the
    * hash.
    *
    * Scale caveat (the honest 100 TB note): gzip is NOT a splittable
    * codec — one task per file, so read parallelism = file count. The
    * write side repartitions to a deliberate file count for exactly
    * this reason (the io06 small-file dial, pointed at compressed
    * landing data); production pipelines prefer zstd/bzip2 (splittable
    * via framing) or size-bounded .gz parts, which this layout is.
    */
  val io14CompressedJsonRoundtrip: GraftQuery = GraftQuery(
    "io14_compressed_json_roundtrip", {
      val propsHash = graft.functions.TextFunctions.sqlRollingHash("props")
      s"""SELECT event_type, COUNT(*) AS n,
         |  ${Det.sqlSum("value", 6)} AS sum_value,
         |  BIT_XOR(epoch_us(ts)) AS xor_ts_us,
         |  BIT_XOR($propsHash) AS xor_props_hash
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    }) { (spark, dir) =>
    val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val out = Dsl.tempStore("io14_json_gz")
    Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(8) // deliberate file count: gzip reads are per-file
      .write.option("timestampFormat", tsFmt)
      .option("timestampNTZFormat", tsFmt)
      .option("compression", "gzip")
      .mode("overwrite").json(out)
    spark.read.option("timestampFormat", tsFmt)
      .option("timestampNTZFormat", tsFmt)
      .schema(eventsCsvSchema).json(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        Det.dsum(col("value"), 6).as("sum_value"),
        bit_xor(unix_micros(col("ts"))).as("xor_ts_us"),
        bit_xor(graft.functions.TextFunctions.rollingHash(col("props")))
          .as("xor_props_hash"))
      .orderBy("event_type")
  }

  /** IO15 — the PRODUCTION LANDING FORMAT io14's unsplittable-gzip note
    * names (ref analog: the landing-format contract,
    * `Scraper/common/util.py:3-5`): the same loss-free aggregate
    * contract, landed as ZSTD PARQUET with SIZE-BOUNDED parts.
    *
    * Read-parallelism contrast (the reason this twin exists): a
    * .json.gz landing zone decompresses one-task-per-FILE — read
    * parallelism is frozen at write time by the file count, and a fat
    * file serializes its whole band (io14 mitigates by repartitioning
    * to a deliberate count). Parquet+zstd splits at ROW-GROUP grain
    * regardless of file size, prunes columns at the footer, and
    * `maxRecordsPerFile` bounds part size at the WRITER without
    * guessing a repartition count — at 100 TB the scan parallelism is
    * data-sized, not landing-layout-sized. zstd here is the in-JVM
    * zstd-jni path every Spark 4 ships (the Hadoop TEXT codec for
    * .json.zst needs native libhadoop, absent in this sandbox — codec
    * availability is itself part of the landing-format decision).
    *
    * The oracle is io14's byte-level contract (count, 6dp-sum,
    * epoch-µs XOR, props-hash XOR per type) recomputed from the raw
    * table, so codec+layout involvement is the only variable.
    */
  val io15ZstdLanding: GraftQuery = GraftQuery(
    "io15_zstd_landing", {
      val propsHash = graft.functions.TextFunctions.sqlRollingHash("props")
      s"""SELECT event_type, COUNT(*) AS n,
         |  ${Det.sqlSum("value", 6)} AS sum_value,
         |  BIT_XOR(epoch_us(ts)) AS xor_ts_us,
         |  BIT_XOR($propsHash) AS xor_props_hash
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    }) { (spark, dir) =>
    val out = Dsl.tempStore("io15_parq_zstd")
    Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(4)
      .write.option("compression", "zstd")
      .option("maxRecordsPerFile", "2500") // size-bounded parts, writer-side
      .mode("overwrite").parquet(out)
    spark.read.parquet(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        Det.dsum(col("value"), 6).as("sum_value"),
        bit_xor(unix_micros(col("ts"))).as("xor_ts_us"),
        bit_xor(graft.functions.TextFunctions.rollingHash(col("props")))
          .as("xor_props_hash"))
      .orderBy("event_type")
  }

  /** IO16 — LANDING INTEGRITY VERIFICATION: the read half of io08's
    * manifest contract — a landing is only trustworthy if the reader
    * can PROVE the files it sees are the files the writer manifested.
    * The landing writes shard-partitioned parquet plus a manifest of
    * per-shard row counts and content fingerprints (bit_xor of the
    * rolling hash — order-free, overflow-free); the verifier re-reads
    * the LANDED files, recomputes both, and reports per-shard status.
    * The gate is load-bearing: one shard is corrupted in place after
    * the manifest commits (its highest-id row dropped — the
    * partial-loss/bit-rot case object stores actually exhibit), and
    * exactly that shard must report `mismatch` while the rest stay
    * `ok`. The oracle replays the shard split, both fingerprint sets,
    * and the injected loss.
    *
    * Scale shape: verification is one map-side-combinable aggregate
    * over the landing scan (the same pass a consumer's first read
    * makes anyway) joined to the |shards|-row manifest — no second
    * corpus pass, no driver-side file walking.
    */
  val io16ManifestVerify: GraftQuery = GraftQuery(
    "io16_manifest_verify", {
      val fpE = graft.functions.TextFunctions
        .sqlRollingHash("CAST(doc_id AS VARCHAR) || ':' || text")
      s"""WITH d AS (SELECT doc_id, text, doc_id % 4 AS shard FROM documents),
         |h AS (SELECT shard, doc_id, ($fpE) AS fp FROM d),
         |manifest AS (SELECT shard, COUNT(*) AS manifest_rows, bit_xor(fp) AS manifest_fp
         |             FROM h GROUP BY 1),
         |dropped AS (SELECT MAX(doc_id) AS did FROM d WHERE shard = 2),
         |landed AS (SELECT shard, COUNT(*) AS landed_rows, bit_xor(fp) AS landed_fp
         |           FROM h WHERE doc_id != (SELECT did FROM dropped) GROUP BY 1)
         |SELECT m.shard, manifest_rows, landed_rows, manifest_fp, landed_fp,
         |       CASE WHEN manifest_rows = landed_rows AND manifest_fp = landed_fp
         |            THEN 'ok' ELSE 'mismatch' END AS status
         |FROM manifest m JOIN landed l ON m.shard = l.shard
         |ORDER BY m.shard""".stripMargin
    }) { (spark, dir) =>
    import graft.functions.TextFunctions.rollingHash
    val root = graft.queries.Dsl.tempStore("io16_landing")
    val data = s"$root/data"
    def fp = rollingHash(concat(col("doc_id").cast("string"), lit(":"), col("text")))
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), pmod(col("doc_id"), lit(4)).as("shard"))
    // land the shards, then commit the manifest (io08's publish order)
    d.repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(data)
    d.select(col("shard"), col("doc_id"), fp.as("fp"))
      .groupBy("shard")
      .agg(count(lit(1)).as("manifest_rows"),
        expr("bit_xor(fp)").as("manifest_fp"))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/manifest")
    // corrupt shard 2 in place AFTER the manifest commits: stage the
    // partition minus its highest-id row, then swap the directory
    val maxDid = spark.read.parquet(s"$data/shard=2")
      .agg(max(col("doc_id"))).collect()(0).getLong(0)
    val staged = s"$root/_stage_shard2"
    spark.read.parquet(s"$data/shard=2").filter(col("doc_id") =!= maxDid)
      .coalesce(1).write.mode("overwrite").parquet(staged)
    // Hadoop FS for the swap, not java.io (ADVICE r12): the fixture is
    // local today, but the gate's load-bearing corruption must not
    // silently no-op if the landing ever lives on HDFS/S3 — a java.io
    // delete/move there does nothing and the gate would pass vacuously
    val shardPath = new org.apache.hadoop.fs.Path(s"$data/shard=2")
    val fs = shardPath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(shardPath).foreach(f => fs.delete(f.getPath, false))
    fs.listStatus(new org.apache.hadoop.fs.Path(staged))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(f => fs.rename(f.getPath,
        new org.apache.hadoop.fs.Path(shardPath, f.getPath.getName)))
    // verify: recompute from the LANDED files, join the manifest
    val landed = spark.read.parquet(data)
      .select(col("shard").cast("long").as("shard"), col("doc_id"), fp.as("fp"))
      .groupBy("shard")
      .agg(count(lit(1)).as("landed_rows"), expr("bit_xor(fp)").as("landed_fp"))
    spark.read.parquet(s"$root/manifest")
      .join(landed, "shard")
      .select(col("shard"), col("manifest_rows"), col("landed_rows"),
        col("manifest_fp"), col("landed_fp"),
        when(col("manifest_rows") === col("landed_rows") &&
          col("manifest_fp") === col("landed_fp"), "ok")
          .otherwise("mismatch").as("status"))
      .orderBy("shard")
  }

  /** IO17 — SCHEMA-CONTRACT QUARANTINE SPLIT: the semantic layer above
    * io09's parse-level tolerance — rows that PARSE but violate the
    * landing contract (type allowlist, value cap on purchases, props
    * field range) are diverted to a quarantine sink with a machine-
    * readable reason, never dropped silently and never allowed to
    * poison the landing (the dead-letter-queue discipline; a26 audits
    * violations as a REPORT, this one actually routes the rows). First
    * failing rule wins, in declared order, so every quarantined row has
    * exactly one reason and re-processing after a contract fix is
    * deterministic. Both sinks are REAL parquet writes and the gated
    * report is recomputed from the WRITTEN files — the split that
    * landed, not the split that was planned.
    *
    * Scale shape: one corpus scan fans into two filtered writes (the
    * disposition is a cheap per-row projection computed once via a
    * persisted split column at cluster scale); the report is a
    * map-side agg over each sink's read-back.
    */
  val io17QuarantineSplit: GraftQuery = GraftQuery(
    "io17_quarantine_split",
    """WITH e AS (
      |  SELECT *, CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k,
      |    CASE
      |      WHEN event_type NOT IN ('click', 'view', 'purchase', 'signup')
      |        THEN 'bad_type'
      |      WHEN event_type = 'purchase' AND value > 300.0 THEN 'value_cap'
      |      WHEN CAST(regexp_extract(props, '[0-9]+') AS BIGINT) >= 80
      |        THEN 'props_range'
      |    END AS reason
      |  FROM events)
      |SELECT CASE WHEN reason IS NULL THEN 'landed' ELSE 'quarantined' END
      |         AS disposition,
      |       COALESCE(reason, 'ok') AS reason, COUNT(*) AS n_rows,
      |       CAST(SUM(event_id) AS BIGINT) AS id_sum
      |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val root = graft.queries.Dsl.tempStore("io17_split")
    val reason = when(!col("event_type").isin("click", "view", "purchase", "signup"),
        "bad_type")
      .when(col("event_type") === "purchase" && col("value") > 300.0, "value_cap")
      .when(regexp_extract(col("props"), "[0-9]+", 0).cast("long") >= 80,
        "props_range")
    val e = Tables.events(spark, dir).withColumn("reason", reason)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.filter(col("reason").isNull).drop("reason")
      .write.mode("overwrite").parquet(s"$root/landing")
    e.filter(col("reason").isNotNull)
      .write.mode("overwrite").parquet(s"$root/quarantine")
    // explicit read schemas: an all-pass corpus leaves the quarantine
    // sink with no part files (the HEALTHY state) — schema inference
    // throws on it, an explicit schema reads zero rows
    val landSchema = e.drop("reason").schema
    val quarSchema = e.schema
    e.unpersist()
    val landed = spark.read.schema(landSchema).parquet(s"$root/landing")
      .agg(count(lit(1)).as("n_rows"), sum(col("event_id")).as("id_sum"))
      .select(lit("landed").as("disposition"), lit("ok").as("reason"),
        col("n_rows"), col("id_sum"))
    val quarantined = spark.read.schema(quarSchema).parquet(s"$root/quarantine")
      .groupBy(col("reason"))
      .agg(count(lit(1)).as("n_rows"), sum(col("event_id")).as("id_sum"))
      .select(lit("quarantined").as("disposition"), col("reason"),
        col("n_rows"), col("id_sum"))
    landed.unionByName(quarantined).orderBy("disposition", "reason")
  }

  val all: Seq[GraftQuery] = Seq(io01CsvRoundtrip, io02JsonRoundtrip, io13XmlRoundtrip,
    io03BinaryRoundtrip, io04OrcRoundtrip, io05SchemaMerge, io06Compaction,
    io07PartitionedLake, io08ManifestPublish, io09MalformedCsv,
    io10DynamicOverwrite, io11ZoneMapSkip, io12IncrementalRead,
    io14CompressedJsonRoundtrip, io15ZstdLanding, io16ManifestVerify,
    io17QuarantineSplit, ct01CtPreprocess)
}
