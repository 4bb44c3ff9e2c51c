package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: run one gate query by name with best-of-N timing —
  * `sbt "runMain graft.One q_name [n]"`. Same session shape as Bench.
  */
object One {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 2
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
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(name)
    val times = (1 to n).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val c = fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[one] $name rows=$c $t%.3fs")
      t
    }
    println(f"[one] $name best=${times.min}%.3fs")
    spark.stop()
  }
}
