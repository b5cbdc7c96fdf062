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
}
