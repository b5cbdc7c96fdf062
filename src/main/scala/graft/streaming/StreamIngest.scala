package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sql.GraftFunctions._

/** Structured Streaming ingest variant (SURVEY.md §2.8).
  *
  * The crawl frontier itself is iterative batch (exact resume + two-size
  * scaling runs demand deterministic epochs), but a continuous pages
  * source — a live fetcher feed — maps onto Structured Streaming directly:
  * readStream -> canonicalize -> watermarked URL dedup -> single-pass
  * extraction -> append sink. State (the seen URLs inside the watermark)
  * lives in the streaming state store; the long-horizon seen set stays in
  * the snapshot tables and is applied by joining the frontier job.
  */
object StreamIngest {

  /** Transform a streaming pages frame (url, warc_ts, html) into extracted
    * rows, deduplicating URLs within the watermark horizon. */
  def transform(pages: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame = {
    pages
      .withColumn("url", url_canonicalize(col("url")))
      .filter(col("url").isNotNull)
      .withWatermark("warc_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("url")
      .withColumn("__x", extract_all(col("html"), col("url")))
      .select(col("url"), col("warc_ts"),
        col("__x.extracted_html").as("extracted_html"),
        col("__x.text").as("text"),
        col("__x.outlinks").as("outlinks"))
  }

  /** Wire a streaming query writing extracted pages to parquet. */
  def start(spark: SparkSession, pages: DataFrame, outDir: String,
            checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    transform(pages)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()

  /** Watermarked tumbling-window per-host ingest stats: pages, bytes,
    * outlinks discovered per (window, host) — the live-crawl monitoring
    * aggregation (append mode: windows emit once the watermark passes). */
  def hostWindowStats(pages: DataFrame, window: String = "1 minute",
                      watermarkDelay: String = "10 minutes"): DataFrame = {
    pages
      .withColumn("url", url_canonicalize(col("url")))
      .filter(col("url").isNotNull)
      .withColumn("host", url_host(col("url")))
      .withWatermark("warc_ts", watermarkDelay)
      .groupBy(org.apache.spark.sql.functions.window(col("warc_ts"), window), col("host"))
      .agg(count(lit(1)).as("pages"),
           sum(length(col("html"))).as("bytes"),
           sum(size(extract_outlinks(col("html"), col("url")))).as("outlinks"))
  }

  final case class HostBudgetState(served: Long, deferred: Long)
  final case class HostBudgetUpdate(host: String, served: Long, deferred: Long,
                                    totalServed: Long, totalDeferred: Long)

  /** Custom streaming state via flatMapGroupsWithState: a per-host
    * politeness budget enforced ACROSS micro-batches — each host serves at
    * most `perBatchBudget` pages per batch and the running served/deferred
    * totals live in the state store (the streaming analog of the batch
    * scheduler's per-host budgets). State cleanup for long-idle hosts is a
    * production concern solved with event-time timeouts against the
    * ingest watermark; a processing-time timeout is deliberately NOT used —
    * it forces Spark to trigger empty micro-batches continuously just to
    * fire timers (and the idle-spin churns state-store checkpoints). */
  def hostBudget(spark: SparkSession, pages: DataFrame, perBatchBudget: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val keyed = pages
      .withColumn("url", url_canonicalize(col("url")))
      .filter(col("url").isNotNull)
      .withColumn("host", url_host(col("url")))
      .select(col("host"), col("url"))
      .as[(String, String)]
      .groupByKey(_._1)
    keyed.flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (host: String, rows: Iterator[(String, String)], state: GroupState[HostBudgetState]) =>
        val n = rows.size.toLong
        val served = math.min(n, perBatchBudget.toLong)
        val deferred = n - served
        val prev = state.getOption.getOrElse(HostBudgetState(0L, 0L))
        val next = HostBudgetState(prev.served + served, prev.deferred + deferred)
        state.update(next)
        Iterator(HostBudgetUpdate(host, served, deferred, next.served, next.deferred))
    }.toDF()
  }
}
