package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Iceberg-shaped snapshot store over parquet (SURVEY.md §7.6).
  *
  * No Iceberg runtime jar exists in this offline sandbox, so the north
  * rule's "checkpoint to Iceberg snapshots" is implemented behind this
  * trait: versioned parquet table dirs + a JSON manifest committed by
  * ATOMIC RENAME. A snapshot is visible iff its manifest rename completed,
  * giving Iceberg-equivalent all-or-nothing semantics; resume reads the
  * highest committed manifest. Swappable for real Iceberg (same call
  * sites: writeTable/commit/latest).
  */
trait FrontierStore {
  def writeTable(name: String, epoch: Long, df: DataFrame, partitionBy: Seq[String] = Nil): String
  def commit(epoch: Long, tables: Map[String, String], counters: Map[String, Long]): Unit
  def latest(): Option[Snapshot]
  def readTable(spark: SparkSession, snap: Snapshot, name: String): DataFrame
}

final case class Snapshot(epoch: Long, tables: Map[String, String], counters: Map[String, Long])

final class ParquetSnapshotStore(root: String) extends FrontierStore {

  /** Snapshot root directory (for resume: open a new store on the same root). */
  def rootDir: String = root

  private val rootPath = Paths.get(root)
  Files.createDirectories(rootPath)

  override def writeTable(name: String, epoch: Long, df: DataFrame,
                          partitionBy: Seq[String] = Nil): String = {
    val path = rootPath.resolve(s"tables/$name/v$epoch").toString
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
    path
  }

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  override def commit(epoch: Long, tables: Map[String, String],
                      counters: Map[String, Long]): Unit = {
    val json =
      s"""{"epoch":$epoch,"tables":{${tables.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString(",")}},""" +
      s""""counters":{${counters.map { case (k, v) => s"${q(k)}:$v" }.mkString(",")}}}"""
    val tmp = rootPath.resolve(s".manifest-$epoch.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, rootPath.resolve(s"manifest-$epoch.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  override def latest(): Option[Snapshot] = {
    if (!Files.isDirectory(rootPath)) return None
    var bestEpoch = Long.MinValue
    var bestFile: java.nio.file.Path = null
    // Files.list holds an open directory handle until closed — this runs
    // at least once per epoch, so an unclosed stream leaks an fd per epoch
    val stream = Files.list(rootPath)
    try {
      val manifests = stream.iterator()
      while (manifests.hasNext) {
        val p = manifests.next()
        val n = p.getFileName.toString
        if (n.startsWith("manifest-") && n.endsWith(".json")) {
          val e = n.stripPrefix("manifest-").stripSuffix(".json").toLong
          if (e > bestEpoch) { bestEpoch = e; bestFile = p }
        }
      }
    } finally stream.close()
    if (bestFile == null) None
    else Some(parseManifest(new String(Files.readAllBytes(bestFile), StandardCharsets.UTF_8)))
  }

  /** Tiny purpose-built JSON reader for our own flat manifests. */
  private def parseManifest(json: String): Snapshot = {
    def section(name: String): Map[String, String] = {
      val i = json.indexOf("\"" + name + "\":{")
      if (i < 0) return Map.empty
      val start = json.indexOf('{', i)
      val end = json.indexOf('}', start)
      val body = json.substring(start + 1, end).trim
      if (body.isEmpty) Map.empty
      else body.split(",").map { kv =>
        val ci = kv.indexOf(':')
        val k = kv.substring(0, ci).trim.stripPrefix("\"").stripSuffix("\"")
        val v = kv.substring(ci + 1).trim.stripPrefix("\"").stripSuffix("\"")
        k -> v
      }.toMap
    }
    val epoch = {
      val i = json.indexOf("\"epoch\":")
      json.substring(i + 8).takeWhile(c => c.isDigit || c == '-').toLong
    }
    Snapshot(epoch, section("tables"), section("counters").map { case (k, v) => k -> v.toLong })
  }

  override def readTable(spark: SparkSession, snap: Snapshot, name: String): DataFrame = {
    // a table may be a ';'-joined list of append segments (e.g. the seen
    // set: each epoch appends a delta instead of rewriting history)
    val paths = snap.tables(name).split(";")
    spark.read.parquet(paths.toIndexedSeq: _*)
  }
}
