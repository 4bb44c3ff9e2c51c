package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared query-construction helpers for oracle-checked queries.
  *
  * Row-level operators over big tables return a deterministic top-N by a
  * stable key plus a broadcast total row count: Spark plans the top-N as
  * `TakeOrderedAndProject` (no global sort shuffle) and the count is a
  * map-side partial aggregate, so full-table semantics are still verified
  * without moving the whole table through the gate.
  */
object Dsl {
  /** Top-N by stable key plus full-cardinality audit column (SURVEY §2.5
    * A11 / Preprocessor.py:13-21 count audit).
    */
  def topNWithTotal(df: DataFrame, n: Int, key: Column*): DataFrame = {
    val total = df.agg(count(lit(1)).as("total_rows"))
    df.orderBy(key: _*).limit(n).crossJoin(broadcast(total))
  }

  def sqlTopNWithTotal(base: String, proj: String, order: String, n: Int): String =
    s"""WITH base AS ($base),
       |top_n AS (SELECT * FROM base ORDER BY $order LIMIT $n)
       |SELECT $proj, t.total_rows
       |FROM top_n CROSS JOIN (SELECT COUNT(*) AS total_rows FROM base) t
       |ORDER BY $order""".stripMargin
}
