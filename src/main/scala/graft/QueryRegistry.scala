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
    oracle: Option[String])

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
