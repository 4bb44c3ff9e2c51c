package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level attribution of g02/c02 tier-to-tier growth (VERDICT r7 #2):
  * the end-to-end 100×-step measured ~8× while star edges made the edge
  * count exactly linear — this harness times each STAGE of the two
  * queries per tier so the residual growth is pinned to a stage (LSH
  * candidate generation vs component-loop rounds vs per-round shuffle vs
  * decontamination vs packing) instead of inferred from totals.
  *
  * Stages, mirroring `g02_dedup_groups` / `c02_curation_full` exactly
  * (same constants ShingleK=2, NumPerms=16, Bands=8; same per-tier
  * shuffle-partition sizing rule):
  *
  *   - `edges`     — [[operators.Dedup.lshComponentEdges]] → count
  *   - `cc_auto`   — [[operators.Dedup.connectedComponents]] on the
  *                   materialized edges, production path (driver
  *                   union-find below the 2M-edge bound)
  *   - `cc_forced` — the same call with `localEdgeLimit = 0`: the
  *                   distributed pointer-jumping worst case, with
  *                   per-round seconds captured via `onRound`
  *   - `decontam`  — c02 stage 2 (4-gram explode → broadcast bench join)
  *   - `pack`      — c02 stage 3 on a same-cardinality removal set
  *                   (doc_id % 97: benchmark slice) — anti-join + running
  *                   -sum window + pack aggregate
  *   - `g02_full` / `c02_full` — the gate queries end-to-end, so stage
  *                   times can be checked against the whole
  *
  * Every number is best-of-3 on a cache-cleared session with a per-tier
  * contention canary, same methodology as [[ScaleBench]].
  *
  * Usage: `tools/run.sh graft.ScaleAttrib <scaleRoot> <outJson>`
  */
object ScaleAttrib {
  private val ShingleK = 2
  private val NumPerms = 16
  private val Bands = 8

  def main(args: Array[String]): Unit = {
    val Array(scaleRoot, outJson) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def bestOf3(thunk: () => Long): (Double, Long) = {
      var rows = 0L
      val secs = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        rows = thunk()
        (System.nanoTime() - t0) / 1e9
      }
      (secs.min, rows)
    }

    val tiers = Seq("1x", "10x", "100x").filter(t =>
      java.nio.file.Files.isDirectory(java.nio.file.Paths.get(s"$scaleRoot/$t")))

    val results = tiers.map { t =>
      val dir = s"$scaleRoot/$t"
      val docs = Tables.documents(spark, dir)
      val docsRows = docs.count()
      // same per-tier sizing as ScaleBench: per-partition shuffle bytes
      // ~constant as data grows
      val parts = math.max(cpus.toInt, (docsRows / 5000L).toInt)
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val canary = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.range(200000000L).selectExpr("sum(id % 9973)").collect()
        (System.nanoTime() - t0) / 1e9
      }.min

      def edgesDf(): DataFrame = operators.Dedup.lshComponentEdges(
        docs, "doc_id", "text", ShingleK, NumPerms, Bands)

      val (edgesSec, nEdges) = bestOf3(() => edgesDf().count())

      // materialize edges ONCE (off the clock) so the cc stages time the
      // component labeling alone, not candidate generation
      val matEdges = edgesDf().localCheckpoint()
      val ccParts = math.max(4L, docsRows / 5000L)

      def withCcParts[A](body: => A): A = {
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", ccParts.toString)
        try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      }

      val (ccAutoSec, nLabels) = bestOf3(() => withCcParts(
        operators.Dedup.connectedComponents(matEdges).count()))

      // forced-distributed with per-round capture: keep the LAST run's
      // rounds (cache-cleared best-of-3 time; round structure identical
      // across runs — the loop is deterministic)
      var rounds = Vector.empty[Double]
      val (ccForcedSec, _) = bestOf3 { () =>
        rounds = Vector.empty
        withCcParts(operators.Dedup.connectedComponents(
          matEdges, localEdgeLimit = 0L, streamEdgeLimit = 0L,
          onRound = (_, sec) => rounds :+= sec).count())
      }

      // c02 stage 2: decontamination
      import graft.functions.TextFunctions._
      def decontam(): Long = {
        val sh = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
          .select(col("doc_id"), explode(array_distinct(shingles(col("tk"), 4))).as("s"))
        val bench = sh.filter(col("doc_id") % 97 === 0).select("s").distinct()
        sh.filter(col("doc_id") % 97 =!= 0)
          .join(broadcast(bench), "s").select("doc_id").distinct().count()
      }
      val (decontamSec, nContaminated) = bestOf3(() => decontam())

      // c02 stage 3: anti-join + pack on the benchmark-slice removal set
      def pack(): Long = {
        val removed = docs.filter(col("doc_id") % 97 === 0).select("doc_id")
        val survivors = docs.join(removed, Seq("doc_id"), "left_anti")
          .select(col("source"), col("doc_id"), size(tokens(col("text"))).as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        survivors.withColumn("ex", coalesce(sum(col("n")).over(w), lit(0L)))
          .groupBy(col("source"), expr("ex div 4096").as("pack_id"))
          .agg(count(lit(1)).as("n_docs")).count()
      }
      val (packSec, _) = bestOf3(() => pack())

      val (g02Sec, _) = bestOf3(() =>
        SparkEntry.queries("g02_dedup_groups")(spark, dir).count())
      val (c02Sec, _) = bestOf3(() =>
        SparkEntry.queries("c02_curation_full")(spark, dir).count())

      matEdges.unpersist()
      println(f"[attrib] $t docs=$docsRows edges=$nEdges labels=$nLabels " +
        f"canary=$canary%.3f edges=$edgesSec%.2fs cc_auto=$ccAutoSec%.2fs " +
        f"cc_forced=$ccForcedSec%.2fs (${rounds.length} rounds) " +
        f"decontam=$decontamSec%.2fs pack=$packSec%.2fs " +
        f"g02=$g02Sec%.2fs c02=$c02Sec%.2fs")

      val roundsJson = rounds.map(r => f"$r%.3f").mkString("[", ",", "]")
      t -> (f"""{"docs_rows":$docsRows,"canary_sec":$canary%.3f,
        |"n_edges":$nEdges,"n_labels":$nLabels,"n_contaminated":$nContaminated,
        |"edges_sec":$edgesSec%.3f,"cc_auto_sec":$ccAutoSec%.3f,
        |"cc_forced_sec":$ccForcedSec%.3f,"cc_forced_rounds":${rounds.length},
        |"cc_forced_round_secs":$roundsJson,
        |"decontam_sec":$decontamSec%.3f,"pack_sec":$packSec%.3f,
        |"g02_full_sec":$g02Sec%.3f,"c02_full_sec":$c02Sec%.3f}""".stripMargin
        .replaceAll("\n", ""))
    }

    val json = results.map { case (t, j) => s""""$t":$j""" }
      .mkString("{\"metric\":\"g02_c02_attribution\",\"unit\":\"sec\",", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json)
    println(json)
    spark.stop()
  }
}
