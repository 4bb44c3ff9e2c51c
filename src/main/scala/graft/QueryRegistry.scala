package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One verifiable query: a Spark plan plus (optionally) the ANSI-SQL
  * oracle DuckDB runs over the same parquet tables. Names are stable
  * operator ids tied to SURVEY.md §2.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Option[(SparkSession, String) => DataFrame] = None) {
  /** Declare a production benchmark form distinct from the gate form.
    *
    * ε-band gates (a05b/a06b/a31b) compute exact twins PURELY to prove
    * the sketch correct — rank windows and countDistinct the production
    * deployment never runs. Benching the gate form times that proof, not
    * the operator (r8's a05b 3.1 s is ~90% band computation). `benchAs`
    * points Bench at the production plan while CORRECTNESS still gates
    * the banded form — no query loses its oracle.
    */
  def benchAs(fn: (SparkSession, String) => DataFrame): GraftQuery =
    copy(bench = Some(fn))
}

object GraftQuery {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, Some(oracle))
  def unchecked(name: String)(run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, None)
}

/** Determinism helpers for DuckDB-oracle parity.
  *
  * Floating-point aggregates are order-dependent, and Spark and DuckDB
  * sum in different orders. Routing each per-row double through an exact
  * DECIMAL cast, summing decimals (exact), and casting the total back to
  * DOUBLE yields bit-identical results in both engines: a binary double
  * can never sit exactly on a decimal rounding tie (x.5e-k is not a
  * binary fraction), so round-to-nearest is unambiguous, and decimal
  * addition is associative.
  */
/** Benchmark evaluation that cannot cheat. */
object Eval {
  /** Row count with EVERY output column forced to compute.
    *
    * `df.count()` alone lets the optimizer PRUNE columns nothing
    * downstream reads — a window function, an interpolation, a scoring
    * projection vanish from the executed plan entirely, and the bench
    * times the row cardinality instead of the operator (a cross-join
    * grid of 450M rows "computed" in 1.5 s was the tell). Folding
    * `xxhash64` of all columns into the count's aggregate makes every
    * column load-bearing — the plan above is unchanged, the added cost
    * is one hash per row — and `bit_xor` keeps the fold overflow-free
    * under ANSI. Map-typed columns are unhashable and skipped; if a
    * frame is all-maps, this degrades to plain count.
    */
  def forcedCount(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hashable(dt: DataType): Boolean = dt match {
      case _: MapType    => false
      case s: StructType => s.fields.forall(f => hashable(f.dataType))
      case a: ArrayType  => hashable(a.elementType)
      case _             => true
    }
    val cols = df.schema.fields.filter(f => hashable(f.dataType))
      .map(f => df(f.name))
    if (cols.isEmpty) df.count()
    else df.select(xxhash64(struct(cols: _*)).as("__h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(__h)"))
      .collect()(0).getLong(0)
  }
}

object Det {
  /** Exact, order-independent sum of a double column: bit-equal across engines. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(s"decimal(28,$scale)")).cast("double")

  /** Exact mean built from the exact sum (double/long division is IEEE-deterministic). */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(lit(1))

  /** SQL fragments mirroring the above for the DuckDB oracle. */
  def sqlSum(e: String, scale: Int = 4): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(28,$scale))) AS DOUBLE)"
  def sqlAvg(e: String, scale: Int = 4): String =
    s"(${sqlSum(e, scale)} / COUNT(*))"
}
