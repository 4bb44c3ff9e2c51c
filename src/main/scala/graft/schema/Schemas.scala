package graft.schema

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical schemas of the social-media engine — the tables the reference
  * pipeline exchanges between stages (SURVEY.md §1.2), declared once
  * instead of re-inferred with per-stage converters
  * (ref: Preprocessor.py:107, ExploratoryAnalysis.py:67-68).
  *
  * Storage convention: Parquet for intermediates (columnar, typed), CSV
  * only at declared edges for reference-format parity. List-typed CSV
  * cells use the repr-list codec below.
  */
object Schemas {

  /** Repr-list codec: the reference serializes `list[str]` cells into CSV
    * as Python reprs (`"['#a', '#b']"`, ref: InstagramFeedScraper.py:209)
    * and re-parses with literal_eval (Preprocessor.py:107). `from_json`
    * accepts the single-quoted form (Jackson ALLOW_SINGLE_QUOTES is on in
    * Spark), so decode needs no custom parser; encode writes JSON arrays
    * (double-quoted), the documented upgrade.
    */
  object ReprList {
    def decode(c: Column): Column =
      coalesce(from_json(c, ArrayType(StringType)), array().cast("array<string>"))
    def encode(c: Column): Column = to_json(c)
  }

  /** Epoch-seconds reader (ref: InstagramFeedScraper.py:219 pd.to_datetime
    * unit="s").
    */
  def epochSeconds(c: Column): Column = timestamp_seconds(c)

  /** `posts` — feed-scrape output, 17 cols
    * (ref: InstagramFeedScraper.py:194-215).
    */
  val posts: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("shortcode", StringType),
    StructField("post_url", StringType),
    StructField("type", StringType),
    StructField("is_video", BooleanType),
    StructField("likes", LongType),
    StructField("comment_count", LongType),
    StructField("comments_disabled", BooleanType),
    StructField("search_mode", StringType),
    StructField("search_term", StringType),
    StructField("caption", StringType),
    StructField("hashtags", ArrayType(StringType)),
    StructField("display_url", StringType),
    StructField("owner_id", LongType),
    StructField("timestamp", TimestampType),
    StructField("mentions", ArrayType(StringType)),
    StructField("thumbnail_src", StringType)))

  /** CSV-facing variant of [[posts]]: list columns arrive as repr strings. */
  val postsCsv: StructType = StructType(posts.map {
    case f if Set("hashtags", "mentions")(f.name) => f.copy(dataType = StringType)
    case f => f
  })

  /** `posts_preprocessed` — 21 payload cols in the exact reference order
    * (ref: Preprocessor.py:156-158), plus the leading `id` the pandas
    * index round-trip re-adds (Preprocessor.py:108,131 index semantics —
    * owned explicitly here per SURVEY §7).
    */
  val postsPreprocessedColumns: Seq[String] = Seq(
    "id", "city", "building", "year", "month", "day", "timestamp", "owner_id",
    "shortcode", "post_url", "type", "is_video", "interactions", "likes",
    "comment_count", "comments_disabled", "caption", "hashtags", "mentions",
    "image", "thumbnail_src", "scrape_image")

  /** Typed schema of [[postsPreprocessedColumns]]. */
  val postsPreprocessed: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("city", StringType),
    StructField("building", StringType),
    StructField("year", IntegerType),
    StructField("month", IntegerType),
    StructField("day", IntegerType),
    StructField("timestamp", TimestampType),
    StructField("owner_id", LongType),
    StructField("shortcode", StringType),
    StructField("post_url", StringType),
    StructField("type", StringType),
    StructField("is_video", BooleanType),
    StructField("interactions", LongType),
    StructField("likes", LongType),
    StructField("comment_count", LongType),
    StructField("comments_disabled", BooleanType),
    StructField("caption", StringType),
    StructField("hashtags", ArrayType(StringType)),
    StructField("mentions", ArrayType(StringType)),
    StructField("image", StringType),
    StructField("thumbnail_src", StringType),
    StructField("scrape_image", BooleanType)))

  /** CSV-facing variant of [[postsPreprocessed]]. */
  val postsPreprocessedCsv: StructType = StructType(postsPreprocessed.map {
    case f if Set("hashtags", "mentions")(f.name) => f.copy(dataType = StringType)
    case f => f
  })

  /** `post_comments` — 8 cols (ref: InstagramPostScraper.py:263-267). */
  val postComments: StructType = StructType(Seq(
    StructField("post_id", LongType),
    StructField("post_shortcode", StringType),
    StructField("comment_count", LongType),
    StructField("parent_comment_id", LongType),
    StructField("comment_id", LongType),
    StructField("owner", StringType),
    StructField("likes", LongType),
    StructField("text", StringType)))

  /** `post_images` — 4 cols (ref: InstagramPostScraper.py:359). */
  val postImages: StructType = StructType(Seq(
    StructField("shortcode", StringType),
    StructField("owner_username", StringType),
    StructField("timestamp", TimestampType),
    StructField("image", StringType)))

  /** `ct_posts` — 17 cols (ref: CTExtractors.py:24-49). */
  val ctPosts: StructType = StructType(Seq(
    StructField("account_name", StringType),
    StructField("account_handle", StringType),
    StructField("account_subscriberCount", LongType),
    StructField("account_platformId", StringType),
    StructField("date", TimestampType),
    StructField("description", StringType),
    StructField("id", StringType),
    StructField("platform", StringType),
    StructField("platformId", StringType),
    StructField("postUrl", StringType),
    StructField("score", DoubleType),
    StructField("statistics_actual_favoriteCount", LongType),
    StructField("statistics_actual_commentCount", LongType),
    StructField("statistics_expected_favoriteCount", LongType),
    StructField("statistics_expected_commentCount", LongType),
    StructField("subscriberCount", LongType),
    StructField("type", StringType)))

  /** `scrape_state` — per-item retry/progress state
    * (ref: InstagramImageScraper.py:62-70).
    */
  val scrapeState: StructType = StructType(Seq(
    StructField("item_id", StringType),
    StructField("url", StringType),
    StructField("scraped", IntegerType),
    StructField("attempts", IntegerType)))

  // ------------------------------------------------------------ raw JSON

  /** One feed-response file: `{"collector": [post, ...]}`
    * (ref: InstagramFeedScraper.py:145,192).
    */
  val feedResponse: StructType = StructType(Seq(
    StructField("collector", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("shortcode", StringType),
      StructField("type", StringType),
      StructField("is_video", BooleanType),
      StructField("likes", LongType),
      StructField("comments", LongType),
      StructField("comments_disabled", BooleanType),
      StructField("description", StringType),
      StructField("hashtags", ArrayType(StringType)),
      StructField("mentions", ArrayType(StringType)),
      StructField("display_url", StringType),
      StructField("thumbnail_src", StringType),
      StructField("owner", StructType(Seq(StructField("id", LongType)))),
      StructField("taken_at_timestamp", LongType)))))))

  private def edges(node: StructType): StructType =
    StructType(Seq(StructField("edges", ArrayType(StructType(Seq(
      StructField("node", node)))))))

  private val commentNode: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType),
    StructField("owner", StructType(Seq(StructField("username", StringType)))),
    StructField("edge_liked_by", StructType(Seq(StructField("count", LongType))))))

  /** One GraphQL post-info JSON (ref: InstagramPostScraper.py:287-348 and
    * Scraper/RapidAPI/JsonInfo/PostJsonStructure.txt).
    */
  val postJson: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("shortcode", StringType),
    StructField("display_url", StringType),
    StructField("accessibility_caption", StringType),
    StructField("is_video", BooleanType),
    StructField("caption_is_edited", BooleanType),
    StructField("has_ranked_comments", BooleanType),
    StructField("like_and_view_counts_disabled", BooleanType),
    StructField("comments_disabled", BooleanType),
    StructField("taken_at_timestamp", LongType),
    StructField("is_affiliate", BooleanType),
    StructField("is_paid_partnership", BooleanType),
    StructField("is_ad", BooleanType),
    StructField("location", StructType(Seq(StructField("name", StringType)))),
    StructField("owner", StructType(Seq(
      StructField("id", LongType),
      StructField("username", StringType),
      StructField("edge_followed_by", StructType(Seq(StructField("count", LongType)))),
      StructField("edge_owner_to_timeline_media", StructType(Seq(StructField("count", LongType))))))),
    StructField("edge_media_to_caption",
      edges(StructType(Seq(StructField("text", StringType))))),
    StructField("edge_media_preview_like", StructType(Seq(StructField("count", LongType)))),
    StructField("edge_media_to_parent_comment", StructType(Seq(
      StructField("count", LongType),
      StructField("edges", ArrayType(StructType(Seq(StructField("node", StructType(
        commentNode.fields :+
          StructField("edge_threaded_comments", edges(commentNode))))))))))),
    StructField("edge_media_to_tagged_user",
      edges(StructType(Seq(StructField("user", StructType(Seq(StructField("username", StringType)))))))),
    StructField("edge_sidecar_to_children",
      edges(StructType(Seq(
        StructField("id", LongType),
        StructField("shortcode", StringType)))))))
}
