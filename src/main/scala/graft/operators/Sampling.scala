package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the reproducible at-scale
  * alternative to `df.sample()`: a row is kept iff
  * `hash(key) mod 1e6 < rate·1e6`, so the decision is a pure function of
  * the row key. That gives properties `Random`-seeded sampling cannot:
  * the same rows survive across reruns, retries, cluster sizes and
  * engines (the DuckDB oracle reproduces the exact sample), samples are
  * consistent across tables sharing the key, and the filter is a
  * codegen'd projection — no shuffle, no RNG state per partition.
  *
  * [[stratifiedSample]] varies the rate per stratum (the training-data
  * mix knob: downsample the over-represented source, keep the rare one),
  * like `sampleBy` but deterministic.
  */
object Sampling {
  val Buckets = 1000000L

  /** Keep rows whose key hashes under `rate` (0..1) of the bucket space. */
  def deterministicSample(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.filter(hashBucket(key) < (rate * Buckets).toLong)

  /** Per-stratum rates with a default for unlisted strata. Rates are
    * applied as exact integer bucket thresholds, so Spark and SQL agree.
    */
  def stratifiedSample(df: DataFrame, strata: Column, key: Column,
                       rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit((defaultRate * Buckets).toLong)) {
      case (acc, (s, r)) => when(strata === s, lit((r * Buckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(key) < threshold)
  }

  /** Uniform bucket in [0, Buckets) from a PORTABLE high-entropy hash:
    * the first 48 bits of md5(key), hex-parsed identically by Spark's
    * `conv` and DuckDB's `0x` cast. The previous rolling-hash form was
    * structurally biased on short consecutive keys: short strings never
    * wrap the 1e9+7 modulus, so consecutive ids landed in consecutive
    * buckets and threshold sampling selected contiguous RANGES — d10's
    * realized keep-rate was ~95% for a ~29% request. md5 restores the
    * Bernoulli semantics every rate-based sampler here assumes (OpsSpec
    * pins the rate band and the nested-by-rate property).
    */
  def hashBucket(key: Column): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 12), 16, 10)
      .cast("bigint"), lit(Buckets))

  /** DuckDB twin of [[hashBucket]] for oracle SQL. */
  def sqlHashBucket(keyE: String): String =
    s"(CAST(concat('0x', substr(md5(CAST($keyE AS VARCHAR)), 1, 12)) AS BIGINT) % $Buckets)"
}
