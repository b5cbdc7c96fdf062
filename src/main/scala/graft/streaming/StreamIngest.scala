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
}
