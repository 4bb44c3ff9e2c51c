package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: each left row picks the single most
  * recent right row with `rightTs <= leftTs` for the same key — the
  * time-series lookup the reference's pandas layer would express with
  * `merge_asof`, and a first-class operator for feature backfill
  * (event → latest prior state).
  *
  * Implementation is the UNION-window formulation, not a per-key loop
  * or a range join: tag both sides, union them, and run one
  * `last(value, ignoreNulls)` window per carried right column over
  * (key, ts, tag) with ROWS UNBOUNDED PRECEDING..CURRENT. Right rows
  * sort before left rows at equal ts (tag 0 < 1), so `rightTs ==
  * leftTs` matches, and every left row reads the latest preceding
  * right payload in one pass.
  *
  * Scale shape: ONE shuffle on the key + one in-partition sort —
  * exactly a window aggregate over |L| + |R| rows. No broadcast
  * needed, no per-left-row probe join, no O(|L|·|R|) range-join
  * explosion; AQE's skew handling applies to the key shuffle as
  * usual. A running-frame `last` is O(1) per row, so the whole
  * operator is linear after the sort.
  *
  * Determinism: ties among right rows at the same (key, ts) are broken
  * by `rightTieBreak` (ascending; the LAST one wins) — supply a unique
  * column or the picked row is arbitrary under retry.
  */
object AsOf {

  /** Left as-of join. `rightCols` are the right-side payload columns to
    * carry; they arrive on the output with a `prior_` prefix (null when
    * the left row precedes every right row for its key).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightCols: Seq[String], rightTieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    // tagged union: left rows carry null right payload, right rows carry
    // null left payload; __tb orders right-side ties (lefts use null)
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .withColumn("__tb", lit(null).cast("long"))
    val lPadded = rightCols.foldLeft(l)((df, c) =>
      df.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType)))
    val r0 = right
      .select((col(key) +: col(rightTs).as("__ts") +: lit(0).as("__tag") +:
        col(rightTieBreak).cast("long").as("__tb") +:
        rightCols.map(c => col(c).as(s"__r_$c"))): _*)
    val rPadded = leftCols.filterNot(_ == key).foldLeft(r0)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lPadded.unionByName(rPadded)
    val w = Window.partitionBy(key)
      .orderBy(col("__ts").asc, col("__tag").asc, col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightCols.foldLeft(unioned)((df, c) =>
      df.withColumn(s"prior_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w)))
    filled
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"prior_$c")): _*)
  }

  /** DuckDB twin of [[asOfJoin]] for oracle SQL: identical union-window
    * formulation (`last_value ... IGNORE NULLS`), so the gate checks the
    * operator's exact tie and boundary semantics, not an approximation.
    * `leftSel`/`rightSel` are sub-selects producing the two sides.
    */
  def sqlAsOfJoin(leftSel: String, rightSel: String, key: String,
                  leftTs: String, rightTs: String,
                  leftCols: Seq[String], rightCols: Seq[String],
                  rightTieBreak: String): String = {
    val lNulls = rightCols.map(c => s"NULL AS __r_$c").mkString(", ")
    // UNION ALL aligns by POSITION: the right side re-lists leftCols in
    // the left side's exact order, nulling everything but the key
    val rLeftSlots = leftCols.map(c => if (c == key) key else s"NULL AS $c").mkString(", ")
    val rPayload = rightCols.map(c => s"$c AS __r_$c").mkString(", ")
    val lastCols = rightCols.map(c =>
      s"last_value(__r_$c IGNORE NULLS) OVER w AS prior_$c").mkString(", ")
    val outCols = (leftCols ++ rightCols.map(c => s"prior_$c")).mkString(", ")
    s"""u AS (
       |  SELECT ${leftCols.mkString(", ")}, $leftTs AS __ts, 1 AS __tag,
       |         CAST(NULL AS BIGINT) AS __tb, $lNulls
       |  FROM ($leftSel)
       |  UNION ALL
       |  SELECT $rLeftSlots, $rightTs AS __ts, 0 AS __tag,
       |         CAST($rightTieBreak AS BIGINT) AS __tb, $rPayload
       |  FROM ($rightSel)),
       |filled AS (
       |  SELECT *, $lastCols
       |  FROM u
       |  WINDOW w AS (PARTITION BY $key ORDER BY __ts, __tag, __tb NULLS LAST
       |               ROWS UNBOUNDED PRECEDING)),
       |asof_rows AS (SELECT $outCols FROM filled WHERE __tag = 1)""".stripMargin
  }
}
