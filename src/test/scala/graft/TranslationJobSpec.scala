package graft

import graft.operators.Enrich
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Cross-run probe state for the production translation executor. Static
  * because local-mode executors share the test JVM — the same place the
  * executor-wide [[Enrich.TranslationLimiter]] lives in production.
  */
object TranslationProbe {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
  val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
  val maxInFlight = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile var failAfter: Int = Int.MaxValue
  def reset(failAt: Int): Unit = {
    calls.set(0); inFlight.set(0); maxInFlight.set(0); failAfter = failAt
  }
}

/** External-service stand-in: uppercases, counts calls, tracks peak
  * concurrency, and can simulate a quota kill after N calls.
  */
final case class ProbeTranslator() extends Enrich.Translator {
  def translate(text: String, targetLang: String): String = {
    if (TranslationProbe.calls.incrementAndGet() > TranslationProbe.failAfter)
      throw new RuntimeException("service quota exceeded (simulated)")
    val cur = TranslationProbe.inFlight.incrementAndGet()
    TranslationProbe.maxInFlight.getAndUpdate(m => math.max(m, cur))
    try { Thread.sleep(1); text.toUpperCase } finally TranslationProbe.inFlight.decrementAndGet()
  }
}

/** U2 production executor (Translator.py:121-144 checkpoint loop at
  * executor grain): mid-run kill → resume with zero re-translation of
  * checkpointed rows, bounded service concurrency, short-circuit for
  * rows already in the target language.
  */
class TranslationJobSpec extends SparkSpec {
  import spark.implicits._

  test("killed run checkpoints batches; resume re-translates only the lost tail") {
    val stateDir = Files.createTempDirectory("graft-trans").toString
    // every row is streamish → every row needs a service call to 'datish'
    val input = (1 to 250).map(i => (i.toLong, s"stream batch value v$i"))
      .toDF("id", "text").repartition(4)

    Enrich.TranslationLimiter.reset()
    TranslationProbe.reset(failAt = 120)
    intercept[Exception] {
      Enrich.runTranslationJob(input, stateDir, "id", "text", "text_en",
        "datish", ProbeTranslator(), maxConcurrentPerExecutor = 2,
        checkpointEvery = 20)
    }
    val checkpointed = Enrich.readTranslationState(spark, stateDir).count()
    // full batches survived the kill; the tail did not
    assert(checkpointed >= 20 && checkpointed < 250)

    TranslationProbe.reset(failAt = Int.MaxValue)
    val out = Enrich.runTranslationJob(input, stateDir, "id", "text", "text_en",
      "datish", ProbeTranslator(), maxConcurrentPerExecutor = 2,
      checkpointEvery = 20)
    // resume translated exactly the un-checkpointed remainder — never a
    // row the state already holds
    assert(TranslationProbe.calls.get() == 250 - checkpointed)
    assert(TranslationProbe.maxInFlight.get() <= 2) // semaphore held
    assert(out.count() == 250)
    assert(out.filter($"text_en".isNull).count() == 0)
    val r = out.filter($"id" === 7L).head()
    assert(r.getAs[String]("text_en") == "STREAM BATCH VALUE V7")
    // idempotent: a third run touches nothing
    TranslationProbe.reset(failAt = Int.MaxValue)
    Enrich.runTranslationJob(input, stateDir, "id", "text", "text_en",
      "datish", ProbeTranslator(), checkpointEvery = 20)
    assert(TranslationProbe.calls.get() == 0)
  }

  test("a retried task never re-sends flushed rows to the service") {
    val stateDir = Files.createTempDirectory("graft-trans-retry").toString
    // one partition; every row needs the service; flush after every row
    // (checkpointEvery=1, serviceBatch=1) so the failing attempt has
    // nothing in flight when it dies — the strongest exactly-once claim
    // the path can make under a task retry
    val input = (1 to 20).map(i => (i.toLong, s"stream batch value v$i"))
      .toDF("id", "text").repartition(1)
    Enrich.TranslationLimiter.reset()
    RetryTransProbe.reset()
    val out = Enrich.runTranslationJob(input, stateDir, "id", "text", "text_en",
      "datish", PoisonOnceTranslator(), maxConcurrentPerExecutor = 2,
      checkpointEvery = 1, serviceBatch = 1)
    // the poison throw really killed a task and Spark really retried it
    assert(RetryTransProbe.threw.get(), "poison translator never fired")
    assert(RetryTransProbe.sawRetryAttempt.get(),
      "no task ran with attemptNumber > 0 — the job was never retried")
    // every row translated EXACTLY once across both attempts
    import scala.jdk.CollectionConverters._
    val counts = RetryTransProbe.perText.asScala
    assert(counts.values.forall(_ == 1),
      s"rows translated more than once: ${counts.filter(_._2 > 1)}")
    assert(counts.size == 20)
    // and the job's output is complete and correct
    assert(out.filter($"text_en".isNull).count() == 0)
    assert(out.filter($"id" === 13L).head().getAs[String]("text_en")
      == "STREAM BATCH VALUE V13")
  }

  test("target-language and empty rows short-circuit without service calls") {
    val stateDir = Files.createTempDirectory("graft-trans2").toString
    val input = Seq(
      (1L, "data row column table"), // datish score 1.0 > 0.9 → identity
      (2L, ""),                      // empty sentinel → ""
      (3L, "stream batch value")     // streamish → service
    ).toDF("id", "text")
    Enrich.TranslationLimiter.reset()
    TranslationProbe.reset(failAt = Int.MaxValue)
    val out = Enrich.runTranslationJob(input, stateDir, "id", "text", "text_en",
      "datish", ProbeTranslator(), checkpointEvery = 10)
    assert(TranslationProbe.calls.get() == 1)
    val m = out.select($"id", $"text_en").as[(Long, String)].collect().toMap
    assert(m(1L) == "data row column table")
    assert(m(2L) == "")
    assert(m(3L) == "STREAM BATCH VALUE")
  }

  test("Translator seam: a batched endpoint drops in; service calls arrive batched") {
    val stateDir = Files.createTempDirectory("graft-trans3").toString
    // 10 needy rows + 1 short-circuit row, one partition
    val input = ((1 to 10).map(i => (i.toLong, s"stream batch value v$i")) :+
      (99L, "data row column table")).toDF("id", "text").repartition(1)
    Enrich.TranslationLimiter.reset()
    BatchTransProbe.sizes.clear()
    val out = Enrich.runTranslationJob(input, stateDir, "id", "text", "text_en",
      "datish", BatchProbeTranslator(), serviceBatch = 4, checkpointEvery = 100)
    val m = out.select($"id", $"text_en").as[(Long, String)].collect().toMap
    // outputs came from the BATCH override, not the per-text default
    assert(m(3L) == "B:STREAM BATCH VALUE V3")
    assert(m(99L) == "data row column table") // short-circuit never reached the service
    val sizes = {
      import scala.jdk.CollectionConverters._
      BatchTransProbe.sizes.asScala.toSeq
    }
    assert(sizes.sum == 10 && sizes.forall(_ <= 4) && sizes.max == 4,
      s"expected ≤4-bounded service batches over the 10 needy rows, got $sizes")
  }

  test("HTTP transport end-to-end: stub server, 503 retry, payload cap, config flag") {
    // a REAL socket transport under runTranslationJob (VERDICT r8 #7):
    // local stub server standing in for the reference's GoogleTranslator
    // endpoint (Translator.py:96-145) — uppercases, 503s the first two
    // requests (the ConnectionError/backoff path), and records payloads
    // so the 5000-char-cap chunking (here capped at 200) is observable
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)
    val served = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val maxBodyChars = new java.util.concurrent.atomic.AtomicInteger(0)
    val failFirst = new java.util.concurrent.atomic.AtomicInteger(2)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/translate",
      (exchange: com.sun.net.httpserver.HttpExchange) => {
        val body = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
        requests.incrementAndGet()
        if (failFirst.getAndDecrement() > 0) {
          exchange.sendResponseHeaders(503, -1); exchange.close()
        } else {
          val texts = body.split("\n", -1).toSeq.dropRight(1)
            .map(java.net.URLDecoder.decode(_, "UTF-8"))
          maxBodyChars.getAndUpdate(m => math.max(m, texts.map(_.length).sum))
          texts.foreach(served.add)
          val resp = texts
            .map(t => java.net.URLEncoder.encode(t.toUpperCase, "UTF-8"))
            .mkString("", "\n", "\n").getBytes("UTF-8")
          exchange.sendResponseHeaders(200, resp.length)
          exchange.getResponseBody.write(resp)
          exchange.close()
        }
      })
    server.start()
    try {
      val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/translate"
      // the config-flag path: transport selected from session conf
      spark.conf.set("spark.graft.translator.endpoint", endpoint)
      spark.conf.set("spark.graft.translator.maxChars", "200")
      spark.conf.set("spark.graft.translator.minIntervalMs", "1")
      val translator = Enrich.translatorFromConf(spark)
      assert(translator.isInstanceOf[Enrich.HttpTranslator])
      val oversized = "x" * 300 // over the cap → "<error>", never on the wire
      val input = ((1 to 60).map(i => (i.toLong, s"stream batch value nummer $i")) :+
        (61L -> oversized)).toDF("id", "text").repartition(3)
      val stateDir = Files.createTempDirectory("graft-trans-http").toString
      Enrich.TranslationLimiter.reset()
      Enrich.HttpPacer.reset()
      val out = Enrich.runTranslationJob(input, stateDir, "id", "text", "text_en",
        "datish", translator, maxConcurrentPerExecutor = 2,
        checkpointEvery = 10, serviceBatch = 8)
      val m = out.select($"id", $"text_en").as[(Long, String)].collect().toMap
      assert(m(5L) == "STREAM BATCH VALUE NUMMER 5")
      assert(m(61L) == "<error>",
        "over-cap text must map to the reference's NotValidPayload sentinel")
      // every needy text reached the wire exactly once (no kill, no loss)
      assert(served.size == 60, s"expected 60 served texts, got ${served.size}")
      assert(requests.get() >= 3, "the two 503s must have been retried through")
      assert(maxBodyChars.get() < 200,
        s"a request exceeded the char cap: ${maxBodyChars.get()}")
      // exactly-once across runs holds through the HTTP seam too
      val before = requests.get()
      Enrich.runTranslationJob(input, stateDir, "id", "text", "text_en",
        "datish", translator, checkpointEvery = 10)
      assert(requests.get() == before, "a second run must not re-send anything")
    } finally {
      server.stop(0)
      spark.conf.unset("spark.graft.translator.endpoint")
      spark.conf.unset("spark.graft.translator.maxChars")
      spark.conf.unset("spark.graft.translator.minIntervalMs")
    }
  }
}

/** Probe for the task-retry spec: per-text successful-translation counts
  * plus whether the poison fired and a retried attempt was observed.
  */
object RetryTransProbe {
  val perText = new java.util.concurrent.ConcurrentHashMap[String, Int]()
  val threw = new java.util.concurrent.atomic.AtomicBoolean(false)
  val sawRetryAttempt = new java.util.concurrent.atomic.AtomicBoolean(false)
  def reset(): Unit = { perText.clear(); threw.set(false); sawRetryAttempt.set(false) }
}

/** Throws on one specific text the FIRST time it is seen (a transient
  * service failure), succeeding on the retry; records every successful
  * translation and the task attempt number it ran under.
  */
final case class PoisonOnceTranslator() extends Enrich.Translator {
  def translate(text: String, targetLang: String): String = {
    if (org.apache.spark.TaskContext.get().attemptNumber() > 0)
      RetryTransProbe.sawRetryAttempt.set(true)
    if (text.endsWith("v13") && RetryTransProbe.threw.compareAndSet(false, true))
      throw new RuntimeException("transient service failure (simulated)")
    RetryTransProbe.perText.merge(text, 1, (a, b) => a + b)
    text.toUpperCase
  }
}

/** Batch-observation probe for the Translator seam spec. */
object BatchTransProbe {
  val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
}

/** Batched-endpoint stand-in (one HTTP call per batch): overrides only
  * translateBatch, the surface [[Enrich.runTranslationJob]] uses.
  */
final case class BatchProbeTranslator() extends Enrich.Translator {
  def translate(text: String, targetLang: String): String = "SCALAR:" + text
  override def translateBatch(texts: Seq[String], targetLang: String): Seq[String] = {
    BatchTransProbe.sizes.add(texts.size)
    texts.map(t => "B:" + t.toUpperCase)
  }
}
