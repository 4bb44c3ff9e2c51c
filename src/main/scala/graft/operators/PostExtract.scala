package graft.operators

import graft.schema.Schemas
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scrape-JSON extraction operators: feed-response flattening (S2),
  * GraphQL post flattening (U7), comment-thread explosion (U6), image
  * linkage (J4), and the CrowdTangle extractor (P7 analog).
  *
  * The reference builds these tables with per-post Python loops
  * (InstagramFeedScraper.py:188-217, InstagramPostScraper.py:261-348);
  * here each is one declarative plan — schema'd JSON scan, nested-path
  * selects, `explode`s — so Catalyst prunes unread JSON branches and the
  * whole flatten stays in one codegen stage, parallel over files.
  */
object PostExtract {

  /** Read a landing directory of feed-response JSONs (S2). */
  def readFeedResponses(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.feedResponse).json(path)

  /** Read a landing directory of GraphQL post-info JSONs. */
  def readPostJsons(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.postJson).json(path)

  private def postUrl(shortcode: Column): Column =
    concat(lit("https://www.instagram.com/p/"), shortcode, lit("/"))

  /** Feed responses → `posts` table (17 cols): explode the `collector`
    * post array, project fields, epoch→timestamp, dedup by (id, shortcode)
    * keeping the first by a stable order (ref: InstagramFeedScraper.py:
    * 189-220; D2 deterministic variant per SURVEY §4).
    */
  def postsTable(feed: DataFrame, searchMode: String, searchTerm: String): DataFrame = {
    val flat = feed
      .select(explode(col("collector")).as("p"))
      .select(
        col("p.id").as("id"),
        col("p.shortcode").as("shortcode"),
        postUrl(col("p.shortcode")).as("post_url"),
        col("p.type").as("type"),
        col("p.is_video").as("is_video"),
        col("p.likes").as("likes"),
        col("p.comments").as("comment_count"),
        col("p.comments_disabled").as("comments_disabled"),
        lit(searchMode).as("search_mode"),
        lit(searchTerm).as("search_term"),
        col("p.description").as("caption"),
        col("p.hashtags").as("hashtags"),
        col("p.display_url").as("display_url"),
        col("p.owner.id").as("owner_id"),
        Schemas.epochSeconds(col("p.taken_at_timestamp")).as("timestamp"),
        col("p.mentions").as("mentions"),
        col("p.thumbnail_src").as("thumbnail_src"))
    Dedup.dedupFirst(flat, Seq("id", "shortcode"), Seq(col("timestamp"), col("post_url")))
  }

  /** GraphQL post JSON → `post_metadata` flat row (U7): pure nested-path
    * selects, no UDF (ref: InstagramPostScraper.py:287-348). Missing keys
    * surface as nulls; list projections coalesce to empty arrays to match
    * the reference's defaults.
    */
  def flattenPosts(posts: DataFrame, scrapeName: String): DataFrame = {
    // `get` (not getItem): an empty caption-edges array must yield null, not
    // an ANSI out-of-bounds error (ref IndexError path, InstagramPostScraper.py:310)
    val caption = get(col("edge_media_to_caption.edges"), lit(0))
      .getField("node").getField("text")
    val parentEdges = col("edge_media_to_parent_comment.edges")
    val emptyStr = array().cast("array<string>")
    posts.select(
      col("id"),
      col("shortcode"),
      lit(scrapeName).as("source"),
      postUrl(col("shortcode")).as("post_url"),
      col("display_url"),
      col("accessibility_caption"),
      col("is_video"),
      coalesce(transform(col("edge_media_to_tagged_user.edges"),
        e => e.getField("node").getField("user").getField("username")), emptyStr)
        .as("tagged_users"),
      caption.as("caption"),
      coalesce(regexp_extract_all(caption, lit("#(\\w+)"), lit(1)), emptyStr).as("hashtags"),
      col("caption_is_edited"),
      col("has_ranked_comments"),
      col("like_and_view_counts_disabled"),
      col("edge_media_preview_like.count").as("likes"),
      col("edge_media_to_parent_comment.count").as("comment_count"),
      coalesce(flatten(transform(parentEdges, e =>
        concat(
          array(e.getField("node").getField("text")),
          coalesce(transform(e.getField("node").getField("edge_threaded_comments").getField("edges"),
            t => t.getField("node").getField("text")), emptyStr)))), emptyStr)
        .as("comments_flat"),
      col("comments_disabled"),
      Schemas.epochSeconds(col("taken_at_timestamp")).as("timestamp"),
      col("is_affiliate"),
      col("is_paid_partnership"),
      col("location.name").as("location"),
      col("owner.id").as("owner_id"),
      col("owner.username").as("owner_username"),
      col("owner.edge_followed_by.count").as("owner_followercount"),
      col("owner.edge_owner_to_timeline_media.count").as("owner_posts"),
      col("is_ad"),
      coalesce(transform(col("edge_sidecar_to_children.edges"),
        i => concat_ws("_", i.getField("node").getField("id"), i.getField("node").getField("shortcode"))),
        emptyStr).as("album_images"))
  }

  /** GraphQL post JSONs → `post_comments` table (U6): two chained explodes
    * — parent comments, then threaded replies carrying the parent's id —
    * unioned (ref: InstagramPostScraper.py:261-285). The reference's
    * threaded rows set parent_comment_id from a missing dict key (a silent
    * KeyError drops them); here they carry the parent's comment id, the
    * evident intent.
    */
  def commentsTable(posts: DataFrame): DataFrame = {
    val parents = posts.select(
      col("id").as("post_id"),
      col("shortcode").as("post_shortcode"),
      col("edge_media_to_parent_comment.count").as("comment_count"),
      explode(col("edge_media_to_parent_comment.edges")).as("e"))
      .select(col("post_id"), col("post_shortcode"), col("comment_count"),
        col("e.node").as("c"))
    def commentCols(parentId: Column, c: Column): Seq[Column] = Seq(
      col("post_id"), col("post_shortcode"), col("comment_count"),
      parentId.as("parent_comment_id"),
      c.getField("id").as("comment_id"),
      c.getField("owner").getField("username").as("owner"),
      c.getField("edge_liked_by").getField("count").as("likes"),
      c.getField("text").as("text"))
    val parentRows = parents.select(commentCols(lit(null).cast("long"), col("c")): _*)
    val threadedRows = parents
      .select(col("post_id"), col("post_shortcode"), col("comment_count"),
        col("c.id").as("pid"),
        explode(col("c.edge_threaded_comments.edges")).as("t"))
      .select(commentCols(col("pid"), col("t.node")): _*)
    parentRows.unionByName(threadedRows)
  }

  /** `post_images` linkage (J4): candidate filenames (main image +
    * album children) joined against the available-file listing — the
    * existence check as a broadcast-friendly inner equi-join instead of
    * per-row `os.path.exists` (ref: InstagramPostScraper.py:350-359).
    */
  def imagesTable(metadata: DataFrame, fileListing: DataFrame): DataFrame = {
    val candidates = metadata.select(
      col("shortcode"), col("owner_username"), col("timestamp"),
      explode(concat(
        array(concat_ws("_", col("id"), col("shortcode"))),
        col("album_images"))).as("img"))
      .select(col("shortcode"), col("owner_username"), col("timestamp"),
        concat(col("img"), lit(".jpg")).as("image"))
    candidates.join(fileListing.select(col("image")).distinct(), Seq("image"), "inner")
      .select("shortcode", "owner_username", "timestamp", "image")
  }

  /** CrowdTangle post-search responses → `ct_posts` (ref:
    * CTExtractors.py:24-49): nested struct paths with natural null
    * defaults (the defaultdict-NA analog).
    */
  def ctPostsTable(raw: DataFrame): DataFrame =
    raw.select(
      col("account.name").as("account_name"),
      col("account.handle").as("account_handle"),
      col("account.subscriberCount").as("account_subscriberCount"),
      col("account.platformId").as("account_platformId"),
      to_timestamp(col("date")).as("date"),
      col("description"),
      col("id"),
      col("platform"),
      col("platformId"),
      col("postUrl"),
      col("score"),
      col("statistics.actual.favoriteCount").as("statistics_actual_favoriteCount"),
      col("statistics.actual.commentCount").as("statistics_actual_commentCount"),
      col("statistics.expected.favoriteCount").as("statistics_expected_favoriteCount"),
      col("statistics.expected.commentCount").as("statistics_expected_commentCount"),
      col("subscriberCount"),
      col("type"))
}
