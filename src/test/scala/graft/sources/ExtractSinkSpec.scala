package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

/** Filesystem extraction sink: reproduces the reference's multi-file
  * layout per archive row, distributed. */
class ExtractSinkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("sink-spec")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("ERROR")
  override def afterAll(): Unit = spark.stop()

  test("writeFiles reproduces the golden extraction tree per row") {
    val wiki = Files.readAllBytes(
      Paths.get(getClass.getResource("/golden/archives/wikipedia.webarchive").toURI))
    val df = spark.createDataFrame(Seq(
      ("https://en.wikipedia.org/wiki/Main_Page", wiki),
      ("https://x.example/bad.html", Array[Byte](1, 2, 3)) // malformed: skipped
    )).toDF("url", "html")
    val out = Files.createTempDirectory("extract-sink").toString
    val n = ExtractSink.writeFiles(df, out)
    assert(n == 2) // plain bytes row extracts as a single-resource page

    // find the wikipedia dir and compare against the golden manifest
    import scala.jdk.CollectionConverters._
    val dirs = Files.walk(Paths.get(out)).iterator().asScala
      .filter(p => Files.isRegularFile(p)).toVector
    assert(dirs.nonEmpty)
    val manifest = Files.readAllLines(
      Paths.get(getClass.getResource("/golden/extract/wikipedia/manifest.tsv").toURI))
      .asScala.filter(_.nonEmpty).map(_.split("\t")).filterNot(_(0) == "manifest.tsv")
      .map(a => a(0) -> a(1)).toMap
    val md = MessageDigest.getInstance("SHA-256")
    val wikiFiles = dirs.filter(_.toString.contains("Main_Page"))
    val got = wikiFiles.map { p =>
      val rel = p.toString.split("Main_Page-[0-9a-f]{12}/").last
      md.reset()
      rel -> md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
    }.toMap
    assert(got == manifest, s"tree mismatch: got ${got.keySet} expected ${manifest.keySet}")
  }

  test("writeFilesCounted surfaces failures instead of swallowing them") {
    // a truncated bplist header parses as NEITHER plist NOR wrappable text
    val bad = "bplist00".getBytes ++ Array[Byte](0, 1, 2)
    val wiki = Files.readAllBytes(
      Paths.get(getClass.getResource("/golden/archives/wikipedia.webarchive").toURI))
    val df = spark.createDataFrame(Seq(
      ("https://ok.example/a.html", wiki),
      ("https://bad.example/b.html", bad),
      (null.asInstanceOf[String], wiki) // null url row
    )).toDF("url", "html")
    val out = Files.createTempDirectory("extract-sink-fail").toString
    val (written, failed) = ExtractSink.writeFilesCounted(df, out)
    assert(written == 1, s"written=$written")
    assert(failed == 2, s"failed=$failed (truncated bplist + null url)")
  }
}
