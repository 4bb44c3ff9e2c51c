package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to files — the
  * r13 optimization-round evidence format (`plans/r13/<q>_{before,after}.txt`).
  *
  * Usage: `tools/run.sh graft.FmtPlan <outDir> <suffix> <name> [name...]`
  * writes `<outDir>/<name>_<suffix>.txt` per query.
  */
object FmtPlan {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
        println(s"[fmtplan] wrote $name")
      } catch {
        case e: Throwable =>
          System.err.println(s"[fmtplan] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
