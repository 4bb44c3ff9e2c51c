package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (the 100 TB concern the builder
  * prompt calls out; e.g. one viral hashtag dominating A4's explode-count
  * or one LSH bucket holding a large cluster).
  *
  * AQE's skew-join split handles most cases at runtime; these are the
  * explicit plan-level tools for when the skew is known up front:
  *
  *  - [[saltedAggregate]]: two-phase aggregation — partial aggregate on
  *    (key, salt), then final aggregate on key. The hot key's rows spread
  *    over `saltBuckets` reducers in phase 1; phase 2 only merges
  *    `saltBuckets` partials per key.
  *  - [[saltedBroadcastableJoin]]: replicate the small side once per salt
  *    bucket and salt the big side deterministically, so one hot join key
  *    no longer lands on a single task.
  *
  * Both patterns are salt-invariant — the final result is identical for
  * ANY salt assignment (aggregation is associative; the join replicates
  * the small side across every salt) — so reproducibility holds even
  * though the salt itself derives from partition-dependent ids.
  */
object Skew {

  /** Two-phase (salted) sum/count aggregation by `key`: returns
    * (key, n, sum_<valueCol>) equal to the direct groupBy, but with the
    * heavy shuffle spread over `saltBuckets` sub-keys.
    */
  def saltedAggregate(df: DataFrame, key: Column, valueCol: Column,
                      saltBuckets: Int): DataFrame = {
    val salted = df.select(key.as("__key"), valueCol.as("__v"),
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)).as("__salt"))
    val partial = salted.groupBy("__key", "__salt")
      .agg(count(lit(1)).as("__pn"), sum(col("__v").cast("decimal(28,6)")).as("__ps"))
    partial.groupBy("__key")
      .agg(sum(col("__pn")).as("n"), sum(col("__ps")).cast("double").as("sum_value"))
      .withColumnRenamed("__key", "key")
  }

  /** As [[saltedAggregate]] but keyed by multiple columns and keeping the
    * EXACT DECIMAL(28,6) sum — for callers composing further exact
    * arithmetic on the partials (e.g. a rolling window over per-(user,
    * day) pre-aggregates), where the double cast would re-introduce
    * float-order divergence. Output columns: the keys (original names),
    * `n`, `sum_value` (decimal).
    */
  def saltedAggregateExact(df: DataFrame, keys: Seq[String], valueCol: Column,
                           saltBuckets: Int): DataFrame = {
    val salted = df.select(keys.map(col) :+ valueCol.as("__v") :+
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)).as("__salt"): _*)
    val partial = salted.groupBy(keys.head, keys.tail :+ "__salt": _*)
      .agg(count(lit(1)).as("__pn"), sum(col("__v").cast("decimal(28,6)")).as("__ps"))
    partial.groupBy(keys.head, keys.tail: _*)
      .agg(sum(col("__pn")).as("n"),
        sum(col("__ps")).cast("decimal(28,6)").as("sum_value"))
  }

  /** Skew-resistant equi-join of a big frame against a small (but not
    * broadcast-tiny) frame: the small side is replicated `saltBuckets`
    * times, the big side salted deterministically, and the join runs on
    * (key, salt). Row multiset equals the plain inner join.
    */
  def saltedBroadcastableJoin(big: DataFrame, small: DataFrame, key: String,
                              saltBuckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedBig.join(explodedSmall, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
