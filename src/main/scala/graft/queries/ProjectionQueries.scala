package graft.queries

import graft.{GraftQuery, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining projection / filter / sampling / explode operators from
  * SURVEY.md §2.2–§2.3 and §2.8, expressed over `documents`/`orders`/
  * `lineitem`: regex extract-all, array-overlap include/exclude filters,
  * substring-any OR filters, element transforms, per-group capped
  * sampling, token explode-count, and a nested collect→flatten round-trip
  * (the U6/U7 comment-thread idiom).
  */
object ProjectionQueries {

  /** P8 — regex extract-all (ref: Preprocessor.py:54 hashtag findall):
    * tokens starting with 's' pulled with a capture group.
    */
  val p08RegexExtract: GraftQuery = GraftQuery(
    "p08_regex_extract",
    """SELECT doc_id, to_json(regexp_extract_all(text, '\b(s\w+)\b', 1)) AS s_words,
      |       len(regexp_extract_all(text, '\b(s\w+)\b', 1)) AS n_s_words
      |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    // List result serialized via to_json on both sides: the driver's pandas
    // checker cannot sort/hash raw array cells (same fix as d09/p19).
    val pat = "\\b(s\\w+)\\b"
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        to_json(regexp_extract_all(col("text"), lit(pat), lit(1))).as("s_words"),
        size(regexp_extract_all(col("text"), lit(pat), lit(1))).as("n_s_words"))
      .orderBy("doc_id")
  }

  /** P11 — array-overlap include filter (ref: Preprocessor.py:182-188
    * hashtag-include): keep docs whose tokens intersect the include set.
    */
  val p11ArrayInclude: GraftQuery = GraftQuery(
    "p11_array_include",
    s"""SELECT doc_id, source FROM documents
       |WHERE len(list_filter(${TextFunctions.sqlTokens("text")},
       |      t -> list_contains(['spark', 'vector'], t))) > 0
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .filter(arrays_overlap(TextFunctions.tokens(col("text")),
        array(lit("spark"), lit("vector"))))
      .select("doc_id", "source")
      .orderBy("doc_id")
  }

  /** P12 — array-overlap exclude filter (ref: Preprocessor.py:190-196). */
  val p12ArrayExclude: GraftQuery = GraftQuery(
    "p12_array_exclude",
    s"""SELECT doc_id, source FROM documents
       |WHERE len(list_filter(${TextFunctions.sqlTokens("text")},
       |      t -> list_contains(['spark', 'vector'], t))) = 0
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .filter(!arrays_overlap(TextFunctions.tokens(col("text")),
        array(lit("spark"), lit("vector"))))
      .select("doc_id", "source")
      .orderBy("doc_id")
  }

  /** P13 — substring-any OR-filter (ref: InstagramPostScraper.py:437-457):
    * caption-contains-any-phrase ∨ token overlap ∨ source-in-set.
    */
  val p13ContainsAny: GraftQuery = GraftQuery(
    "p13_contains_any",
    s"""SELECT doc_id, source FROM documents
       |WHERE contains(text, 'spark join') OR contains(text, 'fast key')
       |   OR len(list_filter(${TextFunctions.sqlTokens("text")},
       |          t -> list_contains(['window'], t))) > 0
       |   OR source IN ('src1', 'src2')
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .filter(
        col("text").contains("spark join") || col("text").contains("fast key") ||
          arrays_overlap(TextFunctions.tokens(col("text")), array(lit("window"))) ||
          col("source").isin("src1", "src2"))
      .select("doc_id", "source")
      .orderBy("doc_id")
  }

  /** P19 — element-wise transform of an array column (ref:
    * Preprocessor.py:219-221 lowercase hashtags; upper here so the
    * transform is visible on the lowercase corpus), plus P18 null
    * normalization of the empty-array edge.
    */
  val p19TransformArray: GraftQuery = GraftQuery(
    "p19_transform_array",
    s"""SELECT doc_id,
       |  to_json(list_transform(list_slice(${TextFunctions.sqlTokens("text")}, 1, 3), t -> upper(t))) AS head_upper
       |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    // List result serialized via to_json on both sides (same fix as d09/p08).
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        to_json(transform(slice(TextFunctions.tokens(col("text")), 1, 3), t => upper(t))).as("head_upper"))
      .orderBy("doc_id")
  }

  /** D3 — per-group capped deterministic sample flag (ref:
    * Preprocessor.py:198-217 max_images_per_year): rows ranked inside each
    * year by a portable md5 pseudo-random order; rank ≤ cap ⇒ selected.
    * Result only flags rows — it never drops them — so the audit keeps
    * full group sizes.
    */
  val d03GroupSample: GraftQuery = GraftQuery(
    "d03_group_sample",
    """WITH ranked AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS yr,
      |         row_number() OVER (PARTITION BY year(o_orderdate)
      |                            ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn
      |  FROM orders)
      |SELECT yr, COUNT(*) AS n_rows,
      |       COUNT(*) FILTER (WHERE rn <= 50) AS n_selected
      |FROM ranked GROUP BY yr ORDER BY yr""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(year(col("o_orderdate")))
      .orderBy(md5(col("o_orderkey").cast("string")), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(year(col("o_orderdate")).as("yr"), row_number().over(w).as("rn"))
      .groupBy("yr")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("rn") <= 50, 1L).otherwise(0L)).as("n_selected"))
      .orderBy("yr")
  }

  /** A4 — explode + value_counts (ref: ExploratoryAnalysis.py:88 hashtag
    * frequencies): flatten every token array, count, order by frequency.
    */
  val a04ExplodeCount: GraftQuery = GraftQuery(
    "a04_explode_count",
    s"""SELECT t.token, COUNT(*) AS n
       |FROM documents, unnest(${TextFunctions.sqlTokens("text")}) AS t(token)
       |GROUP BY t.token ORDER BY n DESC, t.token""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(explode(TextFunctions.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token"))
  }

  /** J5/U6/U7 — nested collect → flatten round-trip (ref:
    * InstagramPostScraper.py:261-285 comment threads): lineitems nested
    * into a sorted array-of-structs per order, then exploded back with
    * positional indices and struct-field projection.
    */
  val j05NestRoundtrip: GraftQuery = GraftQuery(
    "j05_nest_roundtrip",
    """WITH nested AS (
      |  SELECT l_orderkey,
      |         list(struct_pack(ln := l_linenumber, qty := l_quantity, flag := l_returnflag)
      |              ORDER BY l_linenumber, l_quantity, l_returnflag) AS items
      |  FROM lineitem WHERE l_orderkey <= 1000 GROUP BY l_orderkey),
      |flat AS (
      |  SELECT l_orderkey, generate_subscripts(items, 1) - 1 AS pos, unnest(items) AS item
      |  FROM nested)
      |SELECT l_orderkey, pos, item.ln AS ln, item.qty AS qty, item.flag AS flag
      |FROM flat ORDER BY l_orderkey, pos""".stripMargin) { (spark, dir) =>
    val nested = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") <= 1000)
      .groupBy("l_orderkey")
      .agg(array_sort(collect_list(struct(
        col("l_linenumber").as("ln"), col("l_quantity").as("qty"),
        col("l_returnflag").as("flag")))).as("items"))
    nested
      .select(col("l_orderkey"), posexplode(col("items")).as(Seq("pos", "item")))
      .select(col("l_orderkey"), col("pos"),
        col("item.ln").as("ln"), col("item.qty").as("qty"), col("item.flag").as("flag"))
      .orderBy("l_orderkey", "pos")
  }

  /** F1 — scalar-function surface sweep (SURVEY §2.7): printf-style
    * formatting, padding, substring/slice, array_join, trim/length — the
    * string toolbox the reference touches, in one oracle-checked pass.
    */
  val f01ScalarSurface: GraftQuery = GraftQuery(
    "f01_scalar_surface",
    """SELECT doc_id,
      |  printf('%s_%03d.jpg', source, CAST(doc_id % 100 AS INT)) AS fname,
      |  rpad(source, 8, '.') AS padded,
      |  substring(text, 1, 12) AS head12,
      |  upper(substring(source, 2, 3)) AS mid_upper,
      |  array_to_string(list_slice(string_split(text, ' '), 1, 3), '|') AS first3,
      |  len(trim(text)) AS trimmed_len
      |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        format_string("%s_%03d.jpg", col("source"), (col("doc_id") % 100).cast("int")).as("fname"),
        rpad(col("source"), 8, ".").as("padded"),
        substring(col("text"), 1, 12).as("head12"),
        upper(substring(col("source"), 2, 3)).as("mid_upper"),
        array_join(slice(split(col("text"), " "), 1, 3), "|").as("first3"),
        length(trim(col("text"))).as("trimmed_len"))
      .orderBy("doc_id")
  }

  val all: Seq[GraftQuery] = Seq(
    p08RegexExtract, p11ArrayInclude, p12ArrayExclude, p13ContainsAny,
    p19TransformArray, d03GroupSample, a04ExplodeCount, j05NestRoundtrip,
    f01ScalarSurface)
}
