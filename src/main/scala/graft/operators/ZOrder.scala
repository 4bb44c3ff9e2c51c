package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two dimension
  * keys so that range-partitioning + sorting on the single z-value
  * co-locates rows that are close in BOTH dimensions — the layout trick
  * behind multi-dimensional data skipping (each written file then covers
  * a tight (a, b) bounding box, so min/max footer stats prune scans on
  * either predicate, not just the leading sort key).
  *
  * The bit-spread is pure integer shift/mask arithmetic (the classic
  * parallel-prefix spread), expressible identically as Spark Columns and
  * ANSI SQL — fully codegen'd, no UDF, and the DuckDB oracle recomputes
  * it bit-for-bit.
  */
object ZOrder {
  // 0x00FF00FF, 0x0F0F0F0F, 0x33333333, 0x55555555
  private val Masks = Seq((8, 16711935L), (4, 252645135L), (2, 858993459L), (1, 1431655765L))

  /** Spread a 16-bit value's bits to the even bit positions of a 32-bit
    * lane: ...b3 b2 b1 b0 → ...0 b1 0 b0. Inputs are masked to their low
    * 16 bits so the spread is total (wider inputs alias rather than
    * garble the interleave); [[clusterByZ]] additionally REJECTS
    * out-of-range keys at runtime, because aliased z-values would give
    * overlapping file bounding boxes and silently kill data skipping.
    */
  def spread16(c: Column): Column =
    Masks.foldLeft(c.cast("long").bitwiseAND(lit(65535L))) { case (x, (s, m)) =>
      (x.bitwiseOR(shiftleft(x, s))).bitwiseAND(lit(m))
    }
  def sqlSpread16(e: String): String =
    Masks.foldLeft(s"(CAST($e AS BIGINT) & 65535)") { case (x, (s, m)) =>
      s"(($x | ($x << $s)) & $m)"
    }

  /** `c` if within [0, 65535], else a runtime error naming the column —
    * the guard rides inside the z-value expression so column pruning
    * cannot drop it. NULL keys pass through (z-value null, row sorts into
    * the null range of `repartitionByRange` and survives clustering) —
    * a null is missing data, not an out-of-range key, and dropping or
    * failing on it would make clustering lossy.
    */
  private def checked16(c: Column, name: String): Column =
    when(c.isNull, c)
      .when(c.cast("long").between(0L, 65535L), c)
      .otherwise(raise_error(concat(
        lit(s"ZOrder.clusterByZ: $name must be in [0, 65535] (16-bit z-order key), got "),
        c.cast("string"))))

  /** Morton z-value of two 16-bit keys: a's bits on even positions, b's
    * on odd — z(a,b) = spread(a) | spread(b)<<1.
    */
  def zValue2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))
  def sqlZValue2(aE: String, bE: String): String =
    s"(${sqlSpread16(aE)} | (${sqlSpread16(bE)} << 1))"

  /** Cluster a frame for 2-D data skipping: range-partition on the
    * z-value (so files carry disjoint z ranges) and sort within each
    * partition (so row groups carry tight ranges). Writing the result as
    * parquet gives min/max footer stats that prune on EITHER dimension.
    */
  def clusterByZ(df: DataFrame, a: Column, b: Column, numPartitions: Int): DataFrame = {
    val z = zValue2(checked16(a, "a"), checked16(b, "b")).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
