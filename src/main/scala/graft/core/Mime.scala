package graft.core

import scala.io.Source

/** MIME-type predicates and the pinned MIME -> file-extension table.
  *
  * Semantics from /root/reference/webarchive/util.py:224-233 (predicates) and
  * webarchive.py:434-436, 596-603 (guess_extension + add_type overrides).
  * The extension table is a snapshot of CPython 3.11.7 `mimetypes` behavior
  * (after the reference's six add_type overrides) because extracted local
  * file names — and therefore every rewritten URL — depend on it.
  */
object Mime {

  def isHtml(mime: String): Boolean =
    mime == "text/html" || mime == "application/xhtml+xml"

  def isText(mime: String): Boolean =
    mime.startsWith("text/") || isHtml(mime)

  /** mime -> extension (with leading dot), "" when unknown. */
  val extension: Map[String, String] = {
    val in = getClass.getResourceAsStream("/graft/mime_ext.tsv")
    require(in != null, "missing resource graft/mime_ext.tsv")
    Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).map { l =>
      val a = l.split("\t", -1)
      a(0) -> (if (a.length > 1) a(1) else "")
    }.toMap
  }

  def guessExtension(mime: String): String = extension.getOrElse(mime, "")
}
