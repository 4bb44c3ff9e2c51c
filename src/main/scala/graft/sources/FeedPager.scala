package graft.sources

import java.nio.file.{Files, Paths}

/** S3 — cursor-paginated REST feed source (ref:
  * InstagramFeedScraper.py:87-168): a driver-side page loop writing raw
  * responses into a landing directory that
  * `PostExtract.readFeedResponses` consumes as one schema'd JSON scan.
  *
  * Kept outside Catalyst on purpose (SURVEY §4): the loop is rate-limited
  * and non-idempotent, so it must not live in a task-retryable operator.
  * The cursor history is the resume checkpoint (the reference persists it
  * per page, :152-154); re-running resumes from the last cursor and page
  * index, and the landing files are numbered so re-fetches overwrite
  * idempotently.
  *
  * Pacing/backoff belongs inside the caller's `fetch` closure (the
  * reference sleeps 1 s/page) — this loop only enforces the retry budget.
  */
object FeedPager {

  /** One page: raw response body + the cursor of the next page (None =
    * feed exhausted).
    */
  final case class Page(json: String, nextCursor: Option[String])

  /** Resumable state: every cursor seen (in order) + pages fetched. */
  final case class State(cursors: Vector[String], pagesFetched: Int, exhausted: Boolean)

  def initialState: State = State(Vector.empty, 0, exhausted = false)

  /** Fetch up to `maxPages` pages starting from `state`, persisting each
    * page as `page_<n>.json` under `landingDir`. `fetch(cursor)` returns
    * Left(error) to trigger a retry (up to `maxTries` per page, ref
    * max_tries :16) — a page that exhausts its budget aborts the run with
    * the state so far (resumable).
    */
  def run(landingDir: String, state: State, maxPages: Int, maxTries: Int)
         (fetch: Option[String] => Either[String, Page]): State = {
    Files.createDirectories(Paths.get(landingDir))
    var st = state
    var cursor: Option[String] = st.cursors.lastOption
    while (!st.exhausted && st.pagesFetched < maxPages) {
      var tries = 0
      var page: Option[Page] = None
      while (page.isEmpty && tries < maxTries) {
        tries += 1
        fetch(cursor) match {
          case Right(p) => page = Some(p)
          case Left(_) => ()
        }
      }
      page match {
        case None => return st // budget exhausted — caller resumes later
        case Some(p) =>
          Files.writeString(
            Paths.get(landingDir, f"page_${st.pagesFetched}%05d.json"), p.json)
          st = State(
            st.cursors ++ p.nextCursor,
            st.pagesFetched + 1,
            exhausted = p.nextCursor.isEmpty)
          cursor = p.nextCursor
      }
    }
    st
  }
}
