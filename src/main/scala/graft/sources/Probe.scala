package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper

/** S6 — single-query REST probe (ref: Scraper/Crowdtangle/one_query.py):
  * a zero-row hit-count request used to size a scrape before launching it
  * (:45-51), and a single-post fetch (:54-58). Driver utilities by design
  * (SURVEY §2.1) — like [[FeedPager]], the HTTP client is a caller
  * closure so the probe itself is deterministic and testable; a request
  * returns Left(error) on transport failure (one_query.py:38-41 returns
  * None on HTTPError).
  */
object Probe {

  /** Named endpoints (one_query.py:11-18). */
  val endpoints: Map[String, String] = Map(
    "/posts" -> "https://api.crowdtangle.com/posts",
    "/posts/search" -> "https://api.crowdtangle.com/posts/search",
    "/leaderboard" -> "https://api.crowdtangle.com/leaderboard",
    "/links" -> "https://api.crowdtangle.com/links",
    "/post" -> "https://api.crowdtangle.com/post/")

  private val mapper = new ObjectMapper()

  /** Hit count for a query: inject count=0 (no rows transferred, only the
    * count — one_query.py:46-48), issue the request, pull
    * `result.hitCount` with the reference's missing-field → 0 fallback
    * (:49-51).
    */
  def hitCount(queryType: String, params: Map[String, String])
              (fetch: (String, Map[String, String]) => Either[String, String]): Either[String, Long] = {
    val url = endpoints.getOrElse(queryType,
      return Left(s"unknown endpoint $queryType"))
    fetch(url, params + ("count" -> "0")).map { body =>
      val result = mapper.readTree(body).path("result")
      if (result.has("hitCount")) result.get("hitCount").asLong() else 0L
    }
  }

  /** Single-post fetch by id: the post endpoint takes the id on the URL
    * path, not as a parameter (one_query.py:54-58). Returns the `result`
    * subtree as JSON.
    */
  def getPost(postId: String)
             (fetch: (String, Map[String, String]) => Either[String, String]): Either[String, String] =
    fetch(endpoints("/post") + postId, Map.empty).map { body =>
      mapper.readTree(body).path("result").toString
    }
}
