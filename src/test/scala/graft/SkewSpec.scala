package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import scala.util.Random

/** Salted aggregation/join equal their unsalted counterparts on skewed
  * data (one key holding most rows).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(7)
  // heavy skew: 80% of rows on key 0
  private lazy val skewed = (1 to 2000).map { i =>
    val k = if (rnd.nextInt(10) < 8) 0L else rnd.nextInt(50).toLong
    (i.toLong, k, rnd.nextInt(1000).toDouble)
  }.toDF("id", "k", "v").cache()

  test("saltedAggregate equals direct groupBy on skewed keys") {
    val direct = skewed.groupBy($"k".as("key"))
      .agg(count(lit(1)).as("n"),
        sum($"v".cast("decimal(28,6)")).cast("double").as("sum_value"))
      .collect().toSet
    val salted = Skew.saltedAggregate(skewed, $"k", $"v", saltBuckets = 8)
      .collect().toSet
    assert(salted == direct)
  }

  test("saltedBroadcastableJoin equals the plain inner join") {
    val dim = (0L to 49L).map(k => (k, s"name_$k")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k"), "inner")
      .select("id", "k", "v", "name").collect().toSet
    val salted = Skew.saltedBroadcastableJoin(skewed, dim, "k", saltBuckets = 8)
      .select("id", "k", "v", "name").collect().toSet
    assert(salted == plain)
  }
}
