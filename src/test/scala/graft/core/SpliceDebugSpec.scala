package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Throwaway diagnostic (not committed). */
class SpliceDebugSpec extends AnyFunSuite {
  test("diagnose splice fallbacks with seqBounds on the wikipedia fixture") {
    val wab = Files.readAllBytes(Paths.get(
      "/root/reference/webarchive/sample_data/Wikipedia.webarchive"))
    val arc = WebArchiveOps.parse(wab)
    val ctx = new Rewriter.ArchiveCtx(arc)
    for (res <- arc.subresources.filter(_.mimeType == "text/css")) {
      val content = Rewriter.resourceText(res)
      val m = java.util.regex.Pattern.compile("url\\(([^\\)]+)\\)").matcher(content)
      val matches = Iterator.continually(if (m.find()) Some(m.group(1)) else None)
        .takeWhile(_.isDefined).flatten.toVector
      val firstLocal = scala.collection.mutable.HashMap.empty[String, String]
      val resolved = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      for (m0 <- matches) {
        var mm = m0
        if (mm.startsWith("\"") || mm.startsWith("'")) mm = mm.substring(1)
        if (mm.endsWith("\"") || mm.endsWith("'")) mm = mm.substring(0, mm.length - 1)
        if (mm.nonEmpty) {
          val localUrl = firstLocal.getOrElseUpdate(mm,
            Rewriter.getLocalUrl(ctx, null, mm, res.url, 0))
          if (localUrl != mm) resolved += ((mm, localUrl))
        }
      }
      if (resolved.isEmpty) { println(s"[dbg] ${res.url.takeRight(30)}: no pairs"); }
      else {
        val distinct = resolved.distinct.toIndexedSeq
        val dups = resolved.groupBy(identity).filter(_._2.length > 1).keys.toVector
        println(s"[dbg] ${res.url.takeRight(30)}: resolved=${resolved.length} distinct=${distinct.length} dupPairs=${dups.length}")
        for ((dm, dr) <- dups) {
          println(s"[dbg]   dup '$dm' -> '${dr.take(50)}' rContainsM=${dr.contains(dm)}")
        }
      }
    }
  }
}
