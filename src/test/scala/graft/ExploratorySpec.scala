package graft

import graft.operators.Exploratory
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Exploratory-analysis math edges: correlation values, histogram bucket
  * boundaries, profile null accounting.
  */
class ExploratorySpec extends SparkSpec {
  import spark.implicits._

  test("corrMatrix: perfect linear pair → 1.0; constant column → NaN") {
    val df = Seq((1.0, 2.0, 5.0), (2.0, 4.0, 5.0), (3.0, 6.0, 5.0)).toDF("x", "y", "c")
    val out = Exploratory.corrMatrix(df, Seq("x", "y", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(out(("x", "y")) - 1.0) < 1e-12)
    assert(out(("x", "c")).isNaN && out(("y", "c")).isNaN)
  }

  test("histogram: max value lands in the last bucket, min in the first") {
    val df = (0 to 30).map(_.toDouble).toDF("v")
    val out = Exploratory.histogram(df, "v", bins = 30)
      .as[(Long, Long)].collect().toMap
    assert(out(0L) == 1L)   // v=0
    assert(out(29L) == 2L)  // v=29 and the max v=30 clamped into bucket 29
    assert(out.values.sum == 31L)
  }

  test("profile counts nulls and distincts") {
    val df = Seq(Some("a"), Some("a"), Some("b"), None).toDF("s")
    val r = Exploratory.profile(df).head()
    assert(r.getAs[Long]("non_null") == 3 && r.getAs[Long]("missing") == 1 &&
      r.getAs[Long]("n_distinct") == 2)
  }

  test("timeCounts truncates to the requested grain") {
    val df = Seq(
      Timestamp.valueOf("2021-03-02 10:00:00"),
      Timestamp.valueOf("2021-03-25 10:00:00"),
      Timestamp.valueOf("2021-04-01 00:00:00")).toDF("ts")
    val out = Exploratory.timeCounts(df, "ts", "month")
      .as[(Timestamp, Long)].collect().toSeq
    assert(out == Seq(
      (Timestamp.valueOf("2021-03-01 00:00:00"), 2L),
      (Timestamp.valueOf("2021-04-01 00:00:00"), 1L)))
  }
}
