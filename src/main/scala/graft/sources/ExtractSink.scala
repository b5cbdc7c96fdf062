package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

import graft.core.{Rewriter, WebArchiveOps}
import graft.sql.ExtractionOps

/** Filesystem extraction sink (S5 in SURVEY.md §2.1): reproduces the
  * reference's multi-file `extract()` layout for every archive row,
  * distributed via foreachPartition. Each archive extracts under
  * `<outDir>/<nn>/<safe-name>/` (two-level fanout so a 10^8-row corpus
  * doesn't create one directory with 10^8 entries); file names inside are
  * exactly the reference's local paths.
  */
object ExtractSink {

  private def safeName(url: String): String = {
    val h = com.google.common.hash.Hashing.murmur3_128()
      .hashString(url, java.nio.charset.StandardCharsets.UTF_8).toString
    val base = url.replaceAll("[^A-Za-z0-9._-]", "_")
    (if (base.length > 80) base.substring(0, 80) else base) + "-" + h.substring(0, 12)
  }

  /** Extract every (url, html) row to disk. Returns rows written. */
  def writeFiles(pages: DataFrame, outDir: String, outName: String = "page.html"): Long =
    writeFilesCounted(pages, outDir, outName)._1

  /** As [[writeFiles]] but also surfaces the failure count: (written,
    * failed). Malformed archives are skipped, never silently — both
    * counters come from Spark accumulators so they hold under retries of
    * successful tasks (accumulator updates from failed tasks are not
    * double-counted for actions). */
  def writeFilesCounted(pages: DataFrame, outDir: String,
                        outName: String = "page.html"): (Long, Long) = {
    val sc = pages.sparkSession.sparkContext
    val counter = sc.longAccumulator("extracted_archives")
    val failures = sc.longAccumulator("extract_failures")
    pages.select(col("url").cast("string"), col("html"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { row =>
          val url = row.getString(0)
          val body = row.getAs[Array[Byte]](1)
          if (url != null && body != null) {
            try {
              val archive = ExtractionOps.archiveOf(body, url)
              val name = safeName(url)
              val dir = Paths.get(outDir, name.substring(name.length - 2), name)
              Files.createDirectories(dir)
              for ((rel, bytes) <- Rewriter.extractFiles(archive, outName)) {
                val p = dir.resolve(rel)
                Files.createDirectories(p.getParent)
                Files.write(p, bytes)
              }
              counter.add(1)
            } catch { case _: Exception => failures.add(1) }
          } else failures.add(1)
        }
      }
    (counter.value, failures.value)
  }
}
