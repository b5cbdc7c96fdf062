package graft.data

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Deterministic synthetic Common-Crawl-style corpus (SURVEY.md §7.10,
  * FIXTURES.md §4). No external data, no wall clock: everything derives
  * from (seed, index) via splitmix64, so any two runs — and any two
  * parallelism levels — generate byte-identical tables.
  *
  * Host distribution is Zipf (hot-host skew ON PURPOSE: the scheduler's
  * salted two-phase top-k must handle it). Pages are templated HTML with
  * outlinks drawn from the same URL pool plus inline style/srcset cases
  * mirroring the reference's test templates.
  */
object SyntheticCorpus {

  final case class Page(url: String, warc_ts: Timestamp, html: Array[Byte],
                        text: String, lang: String)
  final case class RobotsRow(host: String, disallow: Seq[String],
                             allow: Seq[String], crawl_delay: Option[Double])

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  private def rand01(seed: Long, i: Long, salt: Long): Double =
    ((splitmix64(seed ^ splitmix64(i ^ salt)) >>> 11).toDouble / (1L << 53).toDouble)

  val NumHosts = 101
  /** Zipf(1.1)-ish host pick: hot head by construction. */
  private def hostOf(seed: Long, i: Long, hosts: Int): String = {
    val u = rand01(seed, i, 0x481EADL)
    // inverse-power CDF approximation: rank ~ u^(-1/(s-1)) clamped
    val rank = math.min(hosts - 1, math.max(0, (math.pow(u, 2.2) * hosts).toInt))
    s"host$rank.example"
  }

  def urlOf(seed: Long, i: Long, hosts: Int = NumHosts): String = {
    val host = hostOf(seed, i, hosts)
    val depth = 1 + (splitmix64(seed ^ i ^ 0xD1L).toInt & 3)
    val segs = (0 until depth).map(d => s"p${(splitmix64(seed ^ i ^ (d + 17)).toInt & 0xfff).toHexString}")
    s"https://$host/${segs.mkString("/")}.html"
  }

  /** Page HTML: 6-14 outlinks into the same pool + rewrite-rule variety. */
  def htmlOf(seed: Long, i: Long, poolSize: Long, hosts: Int = NumHosts): String = {
    val nLinks = 6 + (splitmix64(seed ^ i ^ 0x11L).toInt & 7)
    val links = (0 until nLinks).map { k =>
      val j = (splitmix64(seed ^ i ^ (0x1000L + k)) >>> 1) % poolSize
      s"""<a href="${urlOf(seed, j, hosts)}">link $k</a>"""
    }
    val filler = (0 until 8).map { k =>
      val w = splitmix64(seed ^ i ^ (0x2000L + k)) >>> 1
      s"word${w % 5000} lorem ipsum token${w % 997}"
    }
    s"""<!DOCTYPE html>
<html><head><title>Page $i</title>
<link rel="stylesheet" href="style.css">
<style>body { background: url(bg$i.png); }</style>
</head><body>
<img srcset="a$i.png 1x, b$i.png 2x" src="a$i.png">
<p>${filler.mkString(" ")}</p>
${links.mkString("\n")}
<p>Entities &amp; text &#169; stay.</p>
</body></html>
"""
  }

  /** Capture timestamp for row i (exposed so oracles replicate it). */
  def tsOf(seed: Long, i: Long): Long =
    1700000000000L + (splitmix64(seed ^ i) >>> 20)

  /** The pages corpus: `n` rows, url pool = the same n urls (closed world;
    * outlinks resolve within the corpus; hash-collision urls model repeat
    * captures). Distributed generation — one task per range chunk, no
    * driver materialization. */
  def pages(spark: SparkSession, seed: Long, n: Long,
            partitions: Int = 32, hosts: Int = NumHosts): Dataset[Page] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).as[Long].map { i =>
      val url = urlOf(seed, i, hosts)
      val html = htmlOf(seed, i, n, hosts)
      Page(url, new Timestamp(tsOf(seed, i)), html.getBytes("UTF-8"), null,
        if (i % 7 == 0) "de" else "en")
    }
  }

  /** Robots: a third of hosts disallow a path prefix; a few rate-limit. */
  def robots(spark: SparkSession, seed: Long, hosts: Int = NumHosts): Dataset[RobotsRow] = {
    import spark.implicits._
    val rows = (0 until hosts).flatMap { r =>
      if (r % 3 == 0)
        Some(RobotsRow(s"host$r.example", Seq(s"/p${(r % 10).toHexString}"), Seq.empty,
          if (r % 9 == 0) Some(2.0) else None))
      else None
    }
    spark.createDataset(rows)
  }

  /** Degenerate near-boilerplate corpus that makes the dedup HOT-BUCKET
    * machinery fire NATURALLY at the default 4096 threshold (VERDICT r4
    * #1: the sub-banding/refinement branches previously ran only under
    * forced spec thresholds). Construction:
    *
    *  - `clusterN` boilerplate docs = "boiler37" x8 + "boiler204" x8 + 10
    *    per-doc variable tokens. The two dominant tokens' xxhash64 values
    *    (seed 42, the simhash token hash) AGREE on all 16 low bits — found
    *    by deterministic search over the boilerN pool — so on those bits
    *    the vote margin is +-16 and the 10 variable votes can never flip
    *    them: every cluster doc lands in the SAME simhash band-0 bucket
    *    (> 4096 => naturally hot). The 22 bits where the two hashes
    *    DISAGREE have margin 0 and flip per-doc with the variable votes —
    *    spread 6,6,6,4 across band-0's four 12-bit sub-chunks, so the
    *    recall-lossless sub-banding actually splits the hot group, and
    *    typical intra-cluster hamming (~10) keeps the true-pair output
    *    bounded instead of quadratic.
    *  - the remaining docs are unique-token soup: near-uniform signatures,
    *    cold buckets (the realistic diverse background).
    */
  def hotDocs(spark: SparkSession, seed: Long, n: Long, clusterN: Long,
              partitions: Int = 32): DataFrame = {
    import spark.implicits._
    val boiler = (Seq.fill(8)("boiler37") ++ Seq.fill(8)("boiler204")).mkString(" ")
    spark.range(0, n, 1, partitions).map { i =>
      if (i < clusterN) {
        val vts = (0 until 10).map { k =>
          "w" + ((splitmix64(seed ^ i ^ (k * 7919L)) >>> 1) % 1000000L)
        }.mkString(" ")
        (i, boiler + " " + vts)
      } else {
        val toks = (0 until 14).map { k =>
          "u" + ((splitmix64(seed ^ (i * 31) ^ (k * 104729L)) >>> 1) % 100000000L)
        }.mkString(" ")
        (i, toks)
      }
    }.toDF("doc_id", "text")
  }

  /** Embedding corpus for the NATURAL embedding hot-bucket fire: with the
    * default 4-plane bands there are only 16 buckets per band, so any
    * corpus past ~65k rows makes EVERY (band,bucket) group exceed the 4096
    * threshold — no construction needed, volume alone is the 10^10-row
    * analog. `planted` near-identical pairs (ids n+j ~ ids j, tiny
    * perturbation) give the verify stage a non-empty true-pair answer. */
  def hotEmbeddings(spark: SparkSession, seed: Long, n: Long, dim: Int,
                    planted: Int, partitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, n + planted, 1, partitions).map { i =>
      if (i < n) (i, hotVec(seed, dim, i).toSeq)
      else {
        val base = hotVec(seed, dim, i - n)
        val j = (i - n).toInt
        (i, base.zipWithIndex.map { case (x, d) =>
          x * (1.0f + 0.002f * (((d + j) % 7) - 3)) }.toSeq)
      }
    }.toDF("vec_id", "embedding")
  }

  /** Deterministic near-gaussian vector (Irwin-Hall(4) - 2 per component).
    * Module-level (not nested in [[hotEmbeddings]]): a nested def makes
    * the mapper lambda capture the non-serializable module instance. */
  private def hotVec(seed: Long, dim: Int, row: Long): Array[Float] = {
    val a = new Array[Float](dim)
    var d = 0
    while (d < dim) {
      var s = 0.0
      var k = 0
      while (k < 4) { s += rand01(seed, row * dim + d, 0xE3BL + k); k += 1 }
      a(d) = (s - 2.0).toFloat
      d += 1
    }
    a
  }

  /** Seed list: `k` urls from the pool with deterministic priorities. */
  def seeds(spark: SparkSession, seed: Long, n: Long, k: Int,
            hosts: Int = NumHosts): Dataset[(String, Double)] = {
    import spark.implicits._
    spark.range(0, k.toLong, 1, math.min(k, 8)).as[Long].map { s =>
      val j = (splitmix64(seed ^ (0x5EEDL + s)) >>> 1) % n
      (urlOf(seed, j, hosts), 1.0 - (s.toDouble / (2.0 * k)))
    }
  }
}
