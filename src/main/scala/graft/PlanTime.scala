package graft
import org.apache.spark.sql.SparkSession
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      (1 to 3).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)            // construct (may run side jobs: store builds etc.)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan       // analyze+optimize+plan only
        val t2 = System.nanoTime()
        Eval.forcedCount(df)                 // execute
        val t3 = System.nanoTime()
        println(f"[plantime] $name run$i construct=${(t1-t0)/1e9}%.3f plan=${(t2-t1)/1e9}%.3f exec=${(t3-t2)/1e9}%.3f")
      }
    }
    spark.stop()
  }
}
