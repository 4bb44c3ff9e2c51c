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
