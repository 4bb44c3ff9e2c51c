package graft.queries

import graft.{GraftQuery, Tables}
import graft.operators.Exploratory
import graft.queries.Dsl._
import org.apache.spark.sql.functions._

/** Oracle-checked gate queries for the Preprocessor column operators that
  * round 1 verified by spec only (VERDICT r1 coverage table): P2 name
  * split, P5 canonical column projection, P6 constant columns, P17
  * schema-driven numeric projection.
  *
  * All four are narrow per-row projections — the plans are a pruned scan
  * + `TakeOrderedAndProject` + broadcast count (the [[Dsl.topNWithTotal]]
  * gate shape), so each verifies full-table semantics while moving only
  * 1000 rows through the checker.
  */
object PreprocessQueries {

  /** P2 — two-part name split (ref: Preprocessor.py:134-141
    * `city, building = dataset_name.split('_', 1)`). The stage applies it
    * config-time to one dataset name; the gate exercises the same
    * split-limit-2 semantics per row over `customer.c_name` ('#'-joined,
    * exactly one separator — remainder-preserving like the reference's
    * maxsplit=1).
    */
  val p02NameSplit: GraftQuery = GraftQuery(
    "p02_name_split",
    sqlTopNWithTotal(
      """SELECT c_custkey, split_part(c_name, '#', 1) AS name_head,
        |       split_part(c_name, '#', 2) AS name_tail FROM customer""".stripMargin,
      "c_custkey, name_head, name_tail", "c_custkey", 1000)) { (spark, dir) =>
    val parts = split(col("c_name"), "#", 2)
    val df = Tables.customer(spark, dir)
      .select(col("c_custkey"),
        element_at(parts, 1).as("name_head"),
        element_at(parts, 2).as("name_tail"))
    topNWithTotal(df, 1000, col("c_custkey"))
  }

  /** P5 — canonical column-subset projection in fixed order (ref:
    * Preprocessor.py:156-158, the 21-column `columns_sorted` select).
    * Same idiom over lineitem: a 6-column canonical order out of 11 —
    * `ReadSchema` must show only the 6 (PlanSpec asserts the pruning).
    */
  val p05Projection: GraftQuery = GraftQuery(
    "p05_projection",
    sqlTopNWithTotal(
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
        |       l_quantity, l_extendedprice FROM lineitem""".stripMargin,
      "l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity, l_extendedprice",
      "l_orderkey, l_linenumber", 1000)) { (spark, dir) =>
    val canonical = Seq("l_orderkey", "l_linenumber", "l_returnflag",
      "l_linestatus", "l_quantity", "l_extendedprice")
    val df = Tables.lineitem(spark, dir).select(canonical.map(col): _*)
    topNWithTotal(df, 1000, col("l_orderkey"), col("l_linenumber"))
  }

  /** P6 — constant/derived audit columns (ref: Preprocessor.py:110
    * `df['scrape_image'] = True` + dataset tag): literals fold into the
    * projection, zero extra cost at any scale.
    */
  val p06ConstCol: GraftQuery = GraftQuery(
    "p06_const_col",
    sqlTopNWithTotal(
      """SELECT p_partkey, TRUE AS scrape_image, 'graft' AS dataset,
        |       p_brand || '_' || p_type AS variant FROM part""".stripMargin,
      "p_partkey, scrape_image, dataset, variant", "p_partkey", 1000)) { (spark, dir) =>
    val df = Tables.part(spark, dir)
      .select(col("p_partkey"),
        lit(true).as("scrape_image"),
        lit("graft").as("dataset"),
        concat(col("p_brand"), lit("_"), col("p_type")).as("variant"))
    topNWithTotal(df, 1000, col("p_partkey"))
  }

  /** P17 — schema-driven numeric-column projection (ref:
    * ExploratoryAnalysis.py numeric-dtype select): the Spark side derives
    * the column set from the schema at plan time via
    * [[Exploratory.numericCols]]; the oracle pins the expected set, so a
    * schema drift breaks the gate loudly.
    */
  val p17NumericCols: GraftQuery = GraftQuery(
    "p17_numeric_cols",
    sqlTopNWithTotal(
      "SELECT c_custkey, c_nationkey, c_acctbal FROM customer",
      "c_custkey, c_nationkey, c_acctbal", "c_custkey", 1000)) { (spark, dir) =>
    val cust = Tables.customer(spark, dir)
    val df = cust.select(Exploratory.numericCols(cust).map(col): _*)
    topNWithTotal(df, 1000, col("c_custkey"))
  }

  val all: Seq[GraftQuery] = Seq(p02NameSplit, p05Projection, p06ConstCol, p17NumericCols)
}
