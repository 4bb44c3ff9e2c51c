package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Enrichment operators: language detection (U1) and conditional
  * translation (U2) with the reference's resume semantics
  * (Translator.py:67-145).
  *
  * The translation service is pluggable; [[DictTranslator]] is the
  * deterministic offline implementation for tests. The real rate-limited
  * HTTP service belongs in `foreachPartition` with bounded concurrency
  * and idempotent upsert — never an inline expression Spark may re-run on
  * task retry (SURVEY §4).
  */
object Enrich {

  /** U1 — language detection as a pure column expression: marker-set
    * scores + argmax (TextFunctions.langPick), with the reference's
    * ("empty", 1.0) sentinel for blank text (Translator.py:78-79).
    * Returns struct(lang, score); score = marker hits / tokens.
    */
  def detectLanguage(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    val scores = TextFunctions.langMarkers.map { case (lang, ms) =>
      lang -> TextFunctions.langScore(toks, ms)
    }
    val best = scores.map(_._2).reduce((a, b) => when(b > a, b).otherwise(a))
    val blank = text.isNull || length(trim(text)) === 0
    struct(
      when(blank, lit("empty")).otherwise(TextFunctions.langPick(scores, text)).as("lang"),
      when(blank, lit(1.0))
        .otherwise(best.cast("double") / greatest(size(toks), lit(1))).as("score"))
  }

  /** Translation backend. Implementations must be Serializable; the
    * production impl wraps a rate-limited client in mapPartitions.
    *
    * A real endpoint (the reference's googletrans client,
    * Translator.py:96-145, or any batched MT API) overrides
    * [[Translator.translateBatch]] — [[runTranslationJob]] calls ONLY the
    * batch method, with `serviceBatch`-bounded groups of texts that
    * actually need the service (short-circuited rows never reach it), one
    * semaphore acquisition per call. The per-text default makes a scalar
    * client a 1-method implementation.
    */
  trait Translator extends Serializable {
    def translate(text: String, targetLang: String): String
    /** Position-stable batch entry point (result i ↔ input i). */
    def translateBatch(texts: Seq[String], targetLang: String): Seq[String] =
      texts.map(translate(_, targetLang))
  }

  /** Deterministic offline translator: token-wise dictionary with
    * pass-through for unknown words. split limit -1 keeps trailing empty
    * tokens so output stays bit-identical to the SQL oracle's
    * string_split/array_to_string round-trip.
    */
  final case class DictTranslator(dict: Map[String, String]) extends Translator {
    def translate(text: String, targetLang: String): String =
      text.split(" ", -1).map(t => dict.getOrElse(t, t)).mkString(" ")
  }

  /** JVM-wide request pacer: at most one request per `minIntervalMs` per
    * endpoint across every task thread on the executor — the reference's
    * single-threaded `time.sleep(0.1)` between calls (Translator.py:132)
    * generalized to a parallel executor. Keyed by endpoint so two jobs
    * against different services do not throttle each other.
    */
  object HttpPacer {
    private val last =
      new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    def await(endpoint: String, minIntervalMs: Long): Unit = if (minIntervalMs > 0) {
      val slot = last.computeIfAbsent(endpoint,
        _ => new java.util.concurrent.atomic.AtomicLong(Long.MinValue))
      var done = false
      while (!done) {
        val prev = slot.get()
        val now = System.nanoTime()
        val next = math.max(now, prev + minIntervalMs * 1000000L)
        if (slot.compareAndSet(prev, next)) {
          val sleepNs = next - now
          if (sleepNs > 0) Thread.sleep(sleepNs / 1000000L, (sleepNs % 1000000L).toInt)
          done = true
        }
      }
    }
    /** Test hook. */
    def reset(): Unit = last.clear()
  }

  /** Real-transport translation client (ref: the GoogleTranslator HTTP
    * client, Translator.py:96-145, and the scraper's retrying session,
    * CTScraper.py:92): POST batches to `endpoint?target=<lang>`, body =
    * one URL-encoded text per line, response = one URL-encoded
    * translation per line, position-stable.
    *
    * Reference behaviors mirrored:
    *  - the <5000-char payload cap (Translator.py:100) — empty or
    *    over-cap texts short-circuit to the reference's `"<error>"`
    *    sentinel (the NotValidPayload branch, Translator.py:134-137)
    *    WITHOUT touching the service. Batches are greedily chunked by
    *    URL-ENCODED BYTE length (separator included) — the cap bounds
    *    the actual wire body, not the raw char count, because percent
    *    encoding inflates non-ASCII/reserved text up to 9×. The one
    *    unavoidable exception: a text that passes the reference's
    *    raw-char validity check but whose encoded form alone exceeds
    *    the cap is sent as its own chunk (splitting a text would
    *    corrupt the translation unit);
    *  - rate limiting — [[HttpPacer]] spaces requests `minIntervalMs`
    *    apart JVM-wide (the sleep(0.1) loop), beneath
    *    [[TranslationLimiter]]'s concurrency bound;
    *  - transient failure handling (the ConnectionError branch,
    *    Translator.py:138-140): IOExceptions and HTTP 5xx retry with
    *    exponential backoff up to `maxRetries`, then THROW — the task
    *    fails, Spark retries it, and [[runTranslationJob]]'s state-file
    *    resume keeps completed rows exactly-once. HTTP 4xx is a
    *    contract error and throws immediately.
    *
    * Usable behind a config flag via [[translatorFromConf]]; spec'd
    * end-to-end against a local stub server (TranslationJobSpec),
    * including a 503-then-recover path driven through
    * [[runTranslationJob]].
    */
  final case class HttpTranslator(endpoint: String,
                                  maxCharsPerRequest: Int = 5000,
                                  minIntervalMs: Long = 100,
                                  maxRetries: Int = 3,
                                  connectTimeoutMs: Int = 10000,
                                  readTimeoutMs: Int = 30000) extends Translator {
    def translate(text: String, targetLang: String): String =
      translateBatch(Seq(text), targetLang).head

    override def translateBatch(texts: Seq[String], targetLang: String): Seq[String] = {
      val out = new Array[String](texts.size)
      // NotValidPayload analog: empty/oversized texts never reach the wire
      val sendable = texts.zipWithIndex.filter { case (t, i) =>
        val ok = t != null && t.nonEmpty && t.length < maxCharsPerRequest
        if (!ok) out(i) = "<error>"
        ok
      }
      // greedy chunking under the per-request cap, measured in
      // URL-ENCODED bytes + the 1-byte line separator — the size the
      // endpoint actually sees (raw char count undercounts by up to 9×
      // on non-ASCII/reserved text); at least one text per request
      val chunks = scala.collection.mutable.ArrayBuffer.empty[Vector[(String, Int)]]
      var cur = Vector.empty[(String, Int)]
      var curBytes = 0
      for ((t, i) <- sendable) {
        val enc = java.net.URLEncoder.encode(t, "UTF-8").length + 1 // "\n"
        if (cur.nonEmpty && curBytes + enc >= maxCharsPerRequest) {
          chunks += cur; cur = Vector.empty; curBytes = 0
        }
        cur = cur :+ (t, i); curBytes += enc
      }
      if (cur.nonEmpty) chunks += cur
      for (chunk <- chunks) {
        val translations = post(chunk.map(_._1), targetLang)
        require(translations.size == chunk.size,
          s"$endpoint returned ${translations.size} lines for ${chunk.size} texts")
        chunk.map(_._2).zip(translations).foreach { case (i, tr) => out(i) = tr }
      }
      out.toSeq
    }

    private def post(texts: Seq[String], targetLang: String): Seq[String] = {
      val body = texts
        .map(java.net.URLEncoder.encode(_, "UTF-8"))
        .mkString("", "\n", "\n").getBytes("UTF-8")
      var attempt = 0
      var result: Seq[String] = null
      while (result == null) {
        HttpPacer.await(endpoint, minIntervalMs)
        try {
          val url = new java.net.URI(
            endpoint + "?target=" + java.net.URLEncoder.encode(targetLang, "UTF-8")).toURL
          val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
          try {
            conn.setRequestMethod("POST")
            conn.setConnectTimeout(connectTimeoutMs)
            conn.setReadTimeout(readTimeoutMs)
            conn.setDoOutput(true)
            conn.setRequestProperty("Content-Type", "text/plain; charset=utf-8")
            conn.getOutputStream.write(body)
            val code = conn.getResponseCode
            if (code >= 500) throw new java.io.IOException(s"HTTP $code from $endpoint")
            require(code == 200, s"HTTP $code from $endpoint — non-retryable contract error")
            val raw = new String(conn.getInputStream.readAllBytes(), "UTF-8")
            result = raw.split("\n", -1).toSeq.dropRight(1)
              .map(java.net.URLDecoder.decode(_, "UTF-8"))
          } finally conn.disconnect()
        } catch {
          case e: java.io.IOException if attempt < maxRetries =>
            // ConnectionError branch: back off and retry this request
            attempt += 1
            Thread.sleep(math.max(minIntervalMs, 1L) << attempt)
          case e: java.io.IOException =>
            throw new java.io.IOException(
              s"$endpoint unreachable after ${maxRetries + 1} attempts — " +
                "task will retry; completed rows are safe in the state dir", e)
        }
      }
      result
    }
  }

  /** Config-flag selection of the translation transport: set
    * `spark.graft.translator.endpoint` to route [[runTranslationJob]]
    * through [[HttpTranslator]]; unset = the deterministic
    * [[DictTranslator]] identity (offline/test default). Every
    * deployment-tunable knob of the client is plumbed:
    * `.maxChars` (wire-body cap), `.minIntervalMs` (pacing),
    * `.maxRetries` (5xx/IOException budget), `.connectTimeoutMs`,
    * `.readTimeoutMs` — so retry/backoff/timeout behavior is a config
    * change, not a code change.
    */
  def translatorFromConf(spark: org.apache.spark.sql.SparkSession): Translator = {
    def opt(key: String): Option[String] =
      spark.conf.getOption(s"spark.graft.translator.$key")
    spark.conf.getOption("spark.graft.translator.endpoint") match {
      case Some(url) => HttpTranslator(url,
        maxCharsPerRequest = opt("maxChars").map(_.toInt).getOrElse(5000),
        minIntervalMs = opt("minIntervalMs").map(_.toLong).getOrElse(100L),
        maxRetries = opt("maxRetries").map(_.toInt).getOrElse(3),
        connectTimeoutMs = opt("connectTimeoutMs").map(_.toInt).getOrElse(10000),
        readTimeoutMs = opt("readTimeoutMs").map(_.toInt).getOrElse(30000))
      case None => DictTranslator(Map.empty)
    }
  }

  /** U2 — conditional translation (Translator.py:96-128): translate only
    * rows not already in the target language with confidence > minScore;
    * skipped rows carry the original text. Null-normalizes first (P18).
    */
  def translateColumn(df: DataFrame, textCol: String, outCol: String,
                      targetLang: String, translator: Translator,
                      minScore: Double = 0.9): DataFrame = {
    val tUdf = udf((s: String) => translator.translate(s, targetLang))
    val det = detectLanguage(col(textCol))
    df.withColumn("__det", det)
      .withColumn(outCol,
        when(col(s"__det.lang") === "empty", lit(""))
          .when(col(s"__det.lang") === targetLang && col(s"__det.score") > minScore,
            coalesce(col(textCol), lit("")))
          .otherwise(tUdf(coalesce(col(textCol), lit("")))))
      .withColumn("lang", col("__det.lang"))
      .withColumn("lang_score", col("__det.score"))
      .drop("__det")
  }

  /** Partial-output resume (Translator.py:52-61,113-125): rows whose key
    * already has a non-null translation in `existing` keep it; only the
    * remainder is (re)translated. Re-running is idempotent — the
    * incremental left-join analog of the reference's checkpoint-every-100
    * rows.
    */
  def resumeTranslation(input: DataFrame, existing: DataFrame, keyCol: String,
                        textCol: String, outCol: String, targetLang: String,
                        translator: Translator, minScore: Double = 0.9): DataFrame = {
    val done = existing
      .filter(col(outCol).isNotNull)
      .select(col(keyCol), col(outCol).as("__done"))
    val joined = input.join(done, Seq(keyCol), "left_outer")
    val todo = joined.filter(col("__done").isNull).drop("__done")
    val kept = joined.filter(col("__done").isNotNull)
      .withColumn(outCol, col("__done")).drop("__done")
      .withColumn("lang", lit(null).cast("string"))
      .withColumn("lang_score", lit(null).cast("double"))
    translateColumn(todo, textCol, outCol, targetLang, translator, minScore)
      .unionByName(kept)
  }

  /** Executor-JVM-wide concurrency limiter: the external translation
    * service sees at most `permits` in-flight calls per executor no matter
    * how many task threads run there (the reference's single-threaded
    * rate-limited client, Translator.py:116-136, generalized to a
    * parallel executor).
    */
  object TranslationLimiter {
    // Keyed by permit count: concurrent jobs with different bounds each get
    // their own semaphore instead of silently sharing the first job's.
    private val sems =
      new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.Semaphore]()
    def get(permits: Int): java.util.concurrent.Semaphore =
      sems.computeIfAbsent(permits, p => new java.util.concurrent.Semaphore(p))
    /** Test hook: drop all JVM-wide instances. */
    def reset(): Unit = sems.clear()
  }

  /** State-row codec for the translation checkpoint files: one
    * URL-encoded TSV line per (key, translation) — binary-safe for
    * arbitrary caption text, no CSV quoting pitfalls, readable with a
    * plain text scan.
    */
  private object StateCodec {
    def enc(k: String, v: String): String =
      java.net.URLEncoder.encode(k, "UTF-8") + "\t" + java.net.URLEncoder.encode(v, "UTF-8")
    def dec(line: String): (String, String) = {
      val i = line.indexOf('\t')
      (java.net.URLDecoder.decode(line.substring(0, i), "UTF-8"),
        java.net.URLDecoder.decode(line.substring(i + 1), "UTF-8"))
    }
  }

  /** Completed (key, translation) pairs from a translation state dir;
    * empty frame if nothing checkpointed yet. Duplicate keys (a task that
    * died between flush and completion re-translates its tail on the next
    * run) collapse deterministically to the min translation.
    */
  def readTranslationState(spark: org.apache.spark.sql.SparkSession,
                           stateDir: String): DataFrame = {
    import spark.implicits._
    val dir = java.nio.file.Paths.get(stateDir)
    val hasState = java.nio.file.Files.isDirectory(dir) && {
      val s = java.nio.file.Files.list(dir)
      try s.anyMatch(p => p.toString.endsWith(".state")) finally s.close()
    }
    if (!hasState) Seq.empty[(String, String)].toDF("__k", "__v")
    // pathGlobFilter on the DIRECTORY, not a glob path: a glob makes the
    // source probe "<dir>/*.state" as a literal streaming-metadata path
    // and log a full FileNotFoundException stack (benign but alarming)
    // into every pipeline run's output
    else spark.read.option("pathGlobFilter", "*.state").textFile(stateDir)
      .map(StateCodec.dec)
      .toDF("__k", "__v")
      .groupBy("__k").agg(min("__v").as("__v"))
  }

  /** U2 production executor — the reference's checkpoint-every-100-rows
    * translation loop (Translator.py:121-144) at executor grain:
    *
    *  - resume: input is anti-joined against the state dir, so completed
    *    keys are NEVER re-translated across runs;
    *  - detection runs as a codegen'd column BEFORE foreachPartition —
    *    executors only ever pay the external call;
    *  - each partition buffers finished rows and flushes every
    *    `checkpointEvery` to its own uniquely-named file (write tmp →
    *    atomic rename), so a mid-run kill loses at most one in-flight
    *    batch per partition and concurrent partitions never contend;
    *  - the external call sits inside an executor-wide semaphore
    *    ([[TranslationLimiter]]) — bounded concurrency against the
    *    rate-limited service. The unit is CALLS, not texts: up to
    *    `maxConcurrentPerExecutor` concurrent `translateBatch` calls of
    *    ≤ `serviceBatch` texts each, so the in-flight text ceiling per
    *    executor is their product — size the pair together against the
    *    service's rate limit;
    *  - target-language high-confidence and empty rows short-circuit to
    *    identity without touching the service (Translator.py:128-130).
    *
    * Returns input with `outCol` joined from the state (null = still
    * untranslated, e.g. the run was killed — re-running resumes).
    * State files live on whatever shared filesystem `stateDir` points to;
    * at cluster scale that is the mounted object store, same as the
    * reference's CSV checkpoint on shared disk.
    */
  def runTranslationJob(input: DataFrame, stateDir: String, keyCol: String,
                        textCol: String, outCol: String, targetLang: String,
                        translator: Translator, minScore: Double = 0.9,
                        maxConcurrentPerExecutor: Int = 4,
                        checkpointEvery: Int = 100,
                        serviceBatch: Int = 16): DataFrame = {
    val spark = input.sparkSession
    val det = detectLanguage(col("__t")) // over the projected (null-normalized) text
    val pending = input
      .select(col(keyCol).cast("string").as("__k"),
        coalesce(col(textCol), lit("")).as("__t"))
      .join(readTranslationState(spark, stateDir), Seq("__k"), "left_anti")
      .withColumn("__lang", det.getField("lang"))
      .withColumn("__score", det.getField("score"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stateDir))
    pending.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val sem = TranslationLimiter.get(maxConcurrentPerExecutor)
      // Task-retry hygiene: a retried attempt re-reads its whole partition
      // iterator, but everything this partition already flushed sits on
      // disk under part-$pid-* — load those keys (first retry only; the
      // happy path pays nothing) and skip them, so a retry re-sends at
      // most the one in-flight batch to the service, never checkpointed
      // rows. The anti-join above gives the same guarantee ACROSS runs;
      // this gives it within one job. Stage resubmission (new attempt 0)
      // falls back to at-least-once; the state dedupe keeps output exact.
      val alreadyFlushed = new java.util.HashSet[String]()
      if (tc.attemptNumber() > 0) {
        val dir = java.nio.file.Paths.get(stateDir)
        val s = java.nio.file.Files.list(dir)
        try s.forEach { p =>
          val n = p.getFileName.toString
          if (n.startsWith(s"part-$pid-") && n.endsWith(".state"))
            java.nio.file.Files.readAllLines(p).forEach { l =>
              if (l.nonEmpty) alreadyFlushed.add(StateCodec.dec(l)._1)
            }
        } finally s.close()
      }
      val batch = scala.collection.mutable.ArrayBuffer.empty[String]
      var batchIdx = 0
      def flush(): Unit = if (batch.nonEmpty) {
        val dir = java.nio.file.Paths.get(stateDir)
        val id = s"part-$pid-$batchIdx-${java.util.UUID.randomUUID()}"
        val tmp = dir.resolve(s"$id.tmp")
        java.nio.file.Files.write(tmp,
          batch.mkString("", "\n", "\n").getBytes("UTF-8"))
        java.nio.file.Files.move(tmp, dir.resolve(s"$id.state"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        batch.clear()
        batchIdx += 1
      }
      // service calls are batched (one translateBatch per ≤serviceBatch
      // needy texts, one semaphore hold per call); short-circuited rows
      // never touch the service. State-file order is irrelevant (KV).
      rows.filter(r => !alreadyFlushed.contains(r.getString(0)))
        .grouped(serviceBatch).foreach { grp =>
        val parsed = grp.map(r =>
          (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
        val needy = parsed.zipWithIndex.filter { case ((_, _, lang, score), _) =>
          lang != "empty" && !(lang == targetLang && score > minScore)
        }
        val translated: Map[Int, String] =
          if (needy.isEmpty) Map.empty
          else {
            sem.acquire()
            val outs = try translator.translateBatch(needy.map(_._1._2), targetLang)
              finally sem.release()
            require(outs.size == needy.size,
              s"Translator.translateBatch contract violation: sent " +
                s"${needy.size} texts, got ${outs.size} translations back")
            needy.map(_._2).zip(outs).toMap
          }
        parsed.zipWithIndex.foreach { case ((k, t, lang, score), i) =>
          val out =
            if (lang == "empty") ""
            else if (lang == targetLang && score > minScore) t
            else translated(i)
          batch += StateCodec.enc(k, out)
          if (batch.size >= checkpointEvery) flush()
        }
      }
      flush()
    }
    input.join(
      readTranslationState(spark, stateDir)
        .select(col("__k"), col("__v").as(outCol)),
      input(keyCol).cast("string") === col("__k"), "left_outer")
      .drop("__k")
  }
}
