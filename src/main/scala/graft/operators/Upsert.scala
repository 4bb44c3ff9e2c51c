package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog merge (CDC-style upsert): fold an update batch into a
  * compacted snapshot so that the result equals a full recompaction of
  * (history ∪ batch) — the "incremental merge ≡ backfill" property every
  * incremental ingestion pipeline relies on (same property class as
  * IncrementalDedup and the streaming backfill gates; ref resume
  * semantics: Translator.py:121-144, InstagramImageScraper.py:62-70).
  *
  * Scale shape (100 TB snapshot, small batch):
  *  - the update batch is compacted FIRST (one row per key via a window
  *    over the batch alone — the small side pays the sort);
  *  - the snapshot joins the compacted batch once, full-outer on the key.
  *    With the snapshot bucketed/partitioned by key this is exchange-free
  *    on the big side ([[Bucketing]]); the snapshot is never window-sorted
  *    or recompacted — cost is O(snapshot read + batch), not O(corpus
  *    shuffle).
  *  - version comparison is a lexicographic struct compare, so "latest"
  *    is total and deterministic as long as version tuples are unique per
  *    key (enforce with a rowid tiebreaker column when they are not).
  */
object Upsert {

  /** One row per key: the argmax by `version` (lexicographic, descending)
    * within `df`. Deterministic when version tuples are unique per key.
    */
  def compact(df: DataFrame, keys: Seq[String], version: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(version.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Latest-wins merge: for every key in `snapshot` ∪ `updates`, keep the
    * row with the greatest `version` tuple. `snapshot` must already be
    * compacted (one row per key); `updates` may carry any number of rows
    * per key. Both frames must share the same schema.
    */
  def latestWins(snapshot: DataFrame, updates: DataFrame,
                 keys: Seq[String], version: Seq[String]): DataFrame = {
    require(snapshot.columns.sameElements(updates.columns),
      s"schema mismatch: ${snapshot.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val cols = snapshot.columns.toSeq
    val s = snapshot.withColumn("__pres", lit(true)).as("s")
    val u = compact(updates, keys, version).withColumn("__pres", lit(true)).as("u")
    // null-safe key equality: a null key value is a legal key
    val cond = keys.map(k => col(s"s.$k") <=> col(s"u.$k")).reduce(_ && _)
    // Null-consistent lexicographic "u strictly newer than s": a plain
    // struct compare returns NULL when any version field is NULL, which
    // would keep the snapshot row even when compact() (desc nulls-last,
    // i.e. NULL = minimum) would pick the update — breaking incremental
    // merge ≡ backfill for null versions. Fold the compare field by
    // field with NULL as the smallest value, matching compact exactly.
    val uVerGreater = version.foldRight(lit(false)) { (c, rest) =>
      val (uc, sc) = (col(s"u.$c"), col(s"s.$c"))
      val gt = (sc.isNull && uc.isNotNull) || coalesce(uc > sc, lit(false))
      gt || ((uc <=> sc) && rest)
    }
    val takeU = col("u.__pres").isNotNull &&
      (col("s.__pres").isNull || uVerGreater)
    s.join(u, cond, "full_outer")
      .select(cols.map(c =>
        when(takeU, col(s"u.$c")).otherwise(col(s"s.$c")).as(c)): _*)
  }

  /** Full MERGE semantics — the `MERGE INTO` shape ([[latestWins]] plus
    * tombstones): `changes` carries `opCol` ∈ {'U','D'}; the LATEST
    * change per key (by `version`, compacted batch-side first) is
    * authoritative — 'U' upserts the key (WHEN MATCHED UPDATE / WHEN NOT
    * MATCHED INSERT), 'D' removes it (WHEN MATCHED DELETE). Keys the
    * changeset never mentions keep their snapshot row. Returns the new
    * snapshot with an `action` audit column ('inserted' | 'updated' |
    * 'kept'); deleted keys are absent by definition.
    *
    * Scale shape: identical to [[latestWins]] — the batch alone pays the
    * compaction window, the snapshot joins ONCE full-outer on the key
    * and is never re-sorted (O(snapshot read + batch)); tombstones ride
    * the same join, so a combined update+delete day costs one pass, not
    * an upsert pass plus an x11 delete pass.
    */
  def applyChangeset(snapshot: DataFrame, changes: DataFrame,
                     keys: Seq[String], version: Seq[String],
                     opCol: String = "op"): DataFrame = {
    val dataCols = snapshot.columns.toSeq
    require(changes.columns.contains(opCol), s"changes must carry $opCol")
    require(changes.columns.filterNot(_ == opCol).sameElements(dataCols),
      s"schema mismatch: ${changes.columns.mkString(",")} vs ${dataCols.mkString(",")}")
    val s = snapshot.withColumn("__pres", lit(true)).as("s")
    val c = compact(changes, keys, version)
      .withColumn("__pres", lit(true)).as("c")
    val cond = keys.map(k => col(s"s.$k") <=> col(s"c.$k")).reduce(_ && _)
    s.join(c, cond, "full_outer")
      .filter(!(col(s"c.$opCol") <=> lit("D")))
      .select(dataCols.map(cn =>
        when(col("c.__pres").isNotNull, col(s"c.$cn"))
          .otherwise(col(s"s.$cn")).as(cn)) :+
        when(col("c.__pres").isNotNull && col("s.__pres").isNotNull, lit("updated"))
          .when(col("c.__pres").isNotNull, lit("inserted"))
          .otherwise(lit("kept")).as("action"): _*)
  }
}
