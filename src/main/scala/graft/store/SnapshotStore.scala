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

  /** Iceberg `expire_snapshots` analog: keep the newest `retain` committed
    * manifests, delete the older ones, then delete every table-version dir
    * referenced by NO retained manifest. Append-segment tables (seen,
    * blooms, scheduled, lineage, extracted) keep their full history because
    * the retained manifests reference every live segment; only superseded
    * full-rewrite versions (frontier, pre-compaction bloom generations) and
    * crash-orphaned uncommitted dirs are reclaimed. Safe against an
    * in-flight epoch: an uncommitted dir is only reaped when its epoch is
    * <= the latest COMMITTED epoch (an in-progress epoch is strictly
    * newer, so its pre-commit writes are never touched).
    * Returns (manifestsDeleted, tableDirsDeleted). */
  def expire(retain: Int): (Int, Int)
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

  /** All committed manifests as (epoch, file). Files.list holds an open
    * directory handle until closed — this runs at least once per epoch, so
    * an unclosed stream would leak an fd per epoch. */
  private def listManifests(): Vector[(Long, java.nio.file.Path)] = {
    if (!Files.isDirectory(rootPath)) return Vector.empty
    val out = Vector.newBuilder[(Long, java.nio.file.Path)]
    val stream = Files.list(rootPath)
    try {
      val it = stream.iterator()
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (n.startsWith("manifest-") && n.endsWith(".json"))
          out += ((n.stripPrefix("manifest-").stripSuffix(".json").toLong, p))
      }
    } finally stream.close()
    out.result()
  }

  override def latest(): Option[Snapshot] = {
    val ms = listManifests()
    if (ms.isEmpty) None
    else {
      val best = ms.maxBy(_._1)._2
      Some(parseManifest(new String(Files.readAllBytes(best), StandardCharsets.UTF_8)))
    }
  }

  override def expire(retain: Int): (Int, Int) = {
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val ms = listManifests().sortBy(-_._1)
    if (ms.isEmpty) return (0, 0)
    val latestCommitted = ms.head._1
    val (retained, expired) = ms.splitAt(retain)
    // every table-version dir any retained manifest references stays live
    // — including old epochs' append segments (';'-joined lists)
    val referenced = scala.collection.mutable.HashSet.empty[java.nio.file.Path]
    for ((_, mf) <- retained) {
      val snap = parseManifest(new String(Files.readAllBytes(mf), StandardCharsets.UTF_8))
      for ((_, v) <- snap.tables; seg <- v.split(";") if seg.nonEmpty)
        referenced += Paths.get(seg).toAbsolutePath.normalize
    }
    // manifests first: after this point no surviving manifest references a
    // dir the next step deletes (a crash in between only leaves
    // unreferenced dirs, reaped by the next expire)
    expired.foreach { case (_, p) => Files.deleteIfExists(p) }
    // tmp files from crashed commits at committed-or-older epochs
    val tmpStream = Files.list(rootPath)
    try {
      val it = tmpStream.iterator()
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (n.startsWith(".manifest-") && n.endsWith(".json.tmp") &&
            scala.util.Try(n.stripPrefix(".manifest-").stripSuffix(".json.tmp").toLong)
              .toOption.exists(_ <= latestCommitted))
          Files.deleteIfExists(p)
      }
    } finally tmpStream.close()
    // reap unreferenced table-version dirs from committed-or-older epochs
    var dirsDeleted = 0
    val tablesRoot = rootPath.resolve("tables")
    if (Files.isDirectory(tablesRoot)) {
      val tStream = Files.list(tablesRoot)
      try {
        val tIt = tStream.iterator()
        while (tIt.hasNext) {
          val tableDir = tIt.next()
          if (Files.isDirectory(tableDir)) {
            val vStream = Files.list(tableDir)
            try {
              val vIt = vStream.iterator()
              while (vIt.hasNext) {
                val vDir = vIt.next()
                val n = vDir.getFileName.toString
                val epochOpt =
                  if (n.startsWith("v")) scala.util.Try(n.stripPrefix("v").toLong).toOption
                  else None
                epochOpt match {
                  case Some(e) if e <= latestCommitted &&
                      !referenced.contains(vDir.toAbsolutePath.normalize) =>
                    deleteRecursively(vDir)
                    dirsDeleted += 1
                  case _ => ()
                }
              }
            } finally vStream.close()
          }
        }
      } finally tStream.close()
    }
    (expired.size, dirsDeleted)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try {
        val it = s.iterator()
        while (it.hasNext) deleteRecursively(it.next())
      } finally s.close()
    }
    Files.deleteIfExists(p)
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
    // set: each epoch appends a delta instead of rewriting history).
    // Segments are read PER ROOT and unioned: a single multi-root read
    // trips Spark's CONFLICTING_DIRECTORY_STRUCTURES check as soon as one
    // segment is bucket-partitioned (the post-compaction seen table) and
    // others are not (deltas). Filters push through the Union into every
    // branch, so partition pruning on partitioned segments still works.
    snap.tables(name).split(";").toIndexedSeq
      .map(spark.read.parquet(_)).reduce(_ unionByName _)
  }
}
