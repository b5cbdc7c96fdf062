package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Structured Streaming ingest: watermarked URL dedup + extraction. */
class StreamIngestSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("stream-spec")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("ERROR")
  override def afterAll(): Unit = spark.stop()

  test("streaming ingest dedups urls and extracts pages") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Array[Byte])]
    val pages = input.toDF().toDF("url", "warc_ts", "html")
    val out = StreamIngest.transform(pages)
    val q = out.writeStream.format("memory").queryName("extracted_stream")
      .outputMode("append").start()
    try {
      val t0 = new Timestamp(1700000000000L)
      val html = "<html><a href='next.html'>n</a>hello world</html>".getBytes("UTF-8")
      input.addData(
        ("https://h.example/a.html", t0, html),
        ("https://H.EXAMPLE/a.html", t0, html),   // same canonical url -> dedup
        ("https://h.example/b.html", t0, html))
      q.processAllAvailable()
      val rows = spark.sql("SELECT url, text, outlinks FROM extracted_stream").collect()
      assert(rows.length == 2, s"expected 2 deduped rows, got ${rows.length}")
      val byUrl = rows.map(r => r.getString(0) -> r).toMap
      assert(byUrl.contains("https://h.example/a.html"))
      assert(byUrl("https://h.example/a.html").getString(1).contains("hello world"))
      assert(byUrl("https://h.example/a.html").getSeq[String](2)
        .contains("https://h.example/next.html"))
    } finally q.stop()
  }

  test("windowed host stats aggregate with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Array[Byte])]
    val pages = input.toDF().toDF("url", "warc_ts", "html")
    val out = StreamIngest.hostWindowStats(pages, window = "1 minute")
    val q = out.writeStream.format("memory").queryName("host_stats")
      .outputMode("append").start()
    try {
      val html = "<html><a href='x.html'>x</a></html>".getBytes("UTF-8")
      val t0 = 1700000000000L
      input.addData(
        ("https://a.example/1.html", new Timestamp(t0), html),
        ("https://a.example/2.html", new Timestamp(t0 + 1000), html),
        ("https://b.example/1.html", new Timestamp(t0 + 2000), html))
      q.processAllAvailable()
      // advance the watermark far enough to close the first window
      input.addData(("https://a.example/3.html", new Timestamp(t0 + 3600L * 1000), html))
      q.processAllAvailable()
      val rows = spark.sql("SELECT host, pages, outlinks FROM host_stats").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(rows("a.example") == ((2L, 2L)), s"got $rows")
      assert(rows("b.example") == ((1L, 1L)))
    } finally q.stop()
  }

  test("per-host budget state persists across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Array[Byte])]
    val pages = input.toDF().toDF("url", "warc_ts", "html")
    val out = StreamIngest.hostBudget(spark, pages, perBatchBudget = 2)
    val q = out.writeStream.format("memory").queryName("host_budget")
      .outputMode("append").start()
    try {
      val html = Array.empty[Byte]
      val t = new Timestamp(1700000000000L)
      input.addData(
        ("https://h.example/1.html", t, html),
        ("https://h.example/2.html", t, html),
        ("https://h.example/3.html", t, html)) // 3 pages, budget 2 -> 1 deferred
      q.processAllAvailable()
      input.addData(("https://h.example/4.html", t, html)) // batch 2: 1 served
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT served, deferred, totalServed, totalDeferred FROM host_budget ORDER BY totalServed")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.length == 2, s"got ${rows.mkString(",")}")
      assert(rows(0) == ((2L, 1L, 2L, 1L)), s"batch1: ${rows(0)}")
      assert(rows(1) == ((1L, 0L, 3L, 1L)), s"batch2 state carried: ${rows(1)}")
    } finally q.stop()
  }
}
