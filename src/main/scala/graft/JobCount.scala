package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicInteger

/** Round-14 tail diagnostic (guide §1): per-gate JOB/STAGE/TASK counts —
  * the sub-0.6 s tail is per-job overhead-bound (r13 finding), so the
  * lever is how many jobs a gate launches, not how its tasks run.
  * Measurement-adjacent only; the bench does not touch this.
  *
  * Usage: `tools/run.sh graft.JobCount <name> [name...]`
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = { tasks.incrementAndGet(); () }
    })
    args.foreach { name =>
      // second (warm) run is the bench-comparable one; first absorbs codegen
      val times = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        Thread.sleep(300) // drain listener events from the previous gate
        jobs.set(0); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        Eval.forcedCount(SparkEntry.queries(name)(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        (dt, jobs.get(), stages.get(), tasks.get())
      }
      val (dt, j, s, t) = times.last
      println(f"[jobcount] $name%-36s warm=${dt}%6.3f s  jobs=$j%3d stages=$s%3d tasks=$t%5d  (cold ${times.head._1}%.3f)")
    }
    spark.stop()
  }
}
