package graft.model

/** Core data model (see SURVEY.md §1.3 and FIXTURES.md §2).
  *
  * `WResource`/`WArchive` are the recursive JVM-side model used inside
  * extraction (depth-recursive like the format itself,
  * /root/reference/webarchive/webarchive.py:511-514). The Spark-facing
  * schema (`WebArchiveRow`) is the documented depth-2 unroll — Catalyst has
  * no recursive types; deeper frames are counted, never silently dropped.
  */
final case class WResource(
    data: Array[Byte],
    mimeType: String,
    url: String,
    textEncoding: Option[String],
    frameName: Option[String])

final case class WArchive(
    main: WResource,
    subresources: Vector[WResource],
    subframes: Vector[WArchive])

// --- Spark-facing rows (flat encoders, no recursion) -------------------------

final case class WebResourceRow(
    data: Array[Byte],
    mimeType: String,
    url: String,
    textEncoding: Option[String],
    frameName: Option[String])

final case class SubframeRow(
    main: WebResourceRow,
    subresources: Seq[WebResourceRow],
    /** count of frames nested below depth 2 (flattened, not dropped silently) */
    deeperFrameCount: Int)

final case class WebArchiveRow(
    main: WebResourceRow,
    subresources: Seq[WebResourceRow],
    subframes: Seq[SubframeRow])

/** Engine input table row (BASELINE.json input_hint):
  * pages(url, warc_ts, html, text, lang). */
final case class PageRow(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** A frontier candidate URL. */
final case class Candidate(
    url: String,        // canonical form
    host: String,
    priority: Double,
    discoveredEpoch: Int,
    retries: Int)

/** Per-epoch, per-partition lineage row (north rule). */
final case class LineageRow(
    epoch: Int,
    partition: Int,
    hostBucket: Int,
    inRows: Long,
    outRows: Long,
    fetched: Long,
    deduped: Long,
    robotsBlocked: Long,
    retried: Long,
    salt: Int)
