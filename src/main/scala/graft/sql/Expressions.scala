package graft.sql

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.InternalRow

import graft.core.{WebArchiveOps, Rewriter, PyUrl, HtmlTok}
import graft.model.WArchive

/** Catalyst-native extraction operators (BASELINE.json north_star: "a
  * Catalyst-native extraction operator that mirrors pywebarchive's parsing
  * and main-resource HTML rewriting").
  *
  * All expressions are deterministic, null-intolerant and CodegenFallback:
  * extraction cost dominates by orders of magnitude, so interpreted-call
  * overhead is noise, while keeping them proper `Expression`s preserves
  * column pruning / filter pushdown around them (verified via explain).
  */
object ExtractionOps {

  /** Parse page body bytes into a WArchive: real webarchive plists are
    * decoded; plain HTML bytes become a single-main-resource archive (the
    * Common-Crawl-style case), so one operator serves both row shapes. */
  def archiveOf(body: Array[Byte], url: String): WArchive = {
    val isPlist = body.length >= 8 &&
      (bytesStartWith(body, "bplist".getBytes) ||
       { // xml plist sniff: "<?xml" or "<plist" within leading whitespace
         val head = new String(body, 0, math.min(body.length, 64), "ISO-8859-1")
         val t = head.dropWhile(_.isWhitespace)
         t.startsWith("<?xml") || t.startsWith("<plist")
       })
    if (isPlist) WebArchiveOps.parse(body)
    else WArchive(
      graft.model.WResource(body, "text/html", url, Some("utf-8"), None),
      Vector.empty, Vector.empty)
  }

  private def bytesStartWith(b: Array[Byte], p: Array[Byte]): Boolean =
    b.length >= p.length && java.util.Arrays.equals(java.util.Arrays.copyOf(b, p.length), p)

  def extractHtml(body: Array[Byte], url: String): String =
    Rewriter.toHtml(archiveOf(body, url))

  /** Visible text of the page (post-rewrite, tags stripped) — the `text`
    * output column of the pages table. */
  def extractText(html: String): String = {
    val sb = new StringBuilder
    HtmlTok.tokenize(html, new HtmlTok.Handler {
      private var skip = 0
      override def starttag(tag: String, attrs: List[(String, String)]): Unit =
        if (tag == "script" || tag == "style") skip += 1
      override def startendtag(tag: String, attrs: List[(String, String)]): Unit = ()
      override def endtag(tag: String): Unit =
        if ((tag == "script" || tag == "style") && skip > 0) skip -= 1
      override def data(d: String): Unit = if (skip == 0) sb.append(d)
      override def entityref(name: String): Unit =
        if (skip == 0) sb.append(graft.core.PyHtml.unescape(s"&$name;"))
      override def charref(name: String): Unit =
        if (skip == 0) sb.append(graft.core.PyHtml.unescape(s"&#$name;"))
      override def comment(d: String): Unit = ()
      override def decl(d: String): Unit = ()
    })
    sb.toString
  }

  /** Outlinks for the frontier: a[href], (i)frame[src], area[href],
    * absolutized against the page URL. Deterministic order of appearance,
    * de-duplicated keeping first. */
  def extractOutlinks(body: Array[Byte], url: String): Vector[String] = {
    val archive = archiveOf(body, url)
    if (!graft.core.Mime.isHtml(archive.main.mimeType)) return Vector.empty
    val text = try Rewriter.resourceText(archive.main) catch { case _: Exception => return Vector.empty }
    val base = archive.main.url
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    try {
      HtmlTok.tokenize(text, new HtmlTok.Handler {
        private def add(v: String): Unit = {
          if (v != null && v.nonEmpty) {
            val abs = try PyUrl.urljoin(base, v) catch { case _: Exception => null }
            if (abs != null && (abs.startsWith("http://") || abs.startsWith("https://")))
              seen += abs
          }
        }
        private def scan(tag: String, attrs: List[(String, String)]): Unit =
          for ((a, v) <- attrs) {
            if (((tag == "a" || tag == "area") && a == "href") ||
                ((tag == "frame" || tag == "iframe") && a == "src")) add(v)
          }
        override def starttag(tag: String, attrs: List[(String, String)]): Unit = scan(tag, attrs)
        override def startendtag(tag: String, attrs: List[(String, String)]): Unit = scan(tag, attrs)
        override def endtag(tag: String): Unit = ()
        override def data(d: String): Unit = ()
        override def entityref(name: String): Unit = ()
        override def charref(name: String): Unit = ()
        override def comment(d: String): Unit = ()
        override def decl(d: String): Unit = ()
      })
    } catch { case _: Exception => () }
    seen.toVector
  }
}

/** extract_html(body: binary, url: string) -> string */
case class ExtractHtmlExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects (binary, string)")
  override def dataType: DataType = StringType
  override def prettyName: String = "extract_html"
  override protected def nullSafeEval(body: Any, url: Any): Any = {
    val out = try ExtractionOps.extractHtml(body.asInstanceOf[Array[Byte]],
                                            url.asInstanceOf[UTF8String].toString)
    catch { case _: Exception => null }
    if (out == null) null else UTF8String.fromString(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** extract_text(body: binary, url: string) -> string (visible text) */
case class ExtractTextExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects (binary, string)")
  override def dataType: DataType = StringType
  override def prettyName: String = "extract_text"
  override protected def nullSafeEval(body: Any, url: Any): Any = {
    val out = try ExtractionOps.extractText(
      ExtractionOps.extractHtml(body.asInstanceOf[Array[Byte]],
                                url.asInstanceOf[UTF8String].toString))
    catch { case _: Exception => null }
    if (out == null) null else UTF8String.fromString(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** extract_outlinks(body: binary, url: string) -> array<string> */
case class ExtractOutlinksExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects (binary, string)")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "extract_outlinks"
  override protected def nullSafeEval(body: Any, url: Any): Any = {
    val links = try ExtractionOps.extractOutlinks(
      body.asInstanceOf[Array[Byte]], url.asInstanceOf[UTF8String].toString)
    catch { case _: Exception => Vector.empty[String] }
    new GenericArrayData(links.map(UTF8String.fromString).toArray[Any])
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** url_canonicalize(url) -> string (null when not crawlable) */
case class UrlCanonicalizeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects (string)")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "url_canonicalize"
  override protected def nullSafeEval(url: Any): Any =
    (try PyUrl.canonicalize(url.asInstanceOf[UTF8String].toString)
     catch { case _: Exception => None }) match {
      case Some(c) => UTF8String.fromString(c)
      case None    => null
    }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** url_join(base, rel) -> string (CPython urljoin parity) */
case class UrlJoinExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] && right.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects (string, string)")
  override def dataType: DataType = StringType
  override def prettyName: String = "url_join"
  override protected def nullSafeEval(base: Any, rel: Any): Any =
    UTF8String.fromString(PyUrl.urljoin(base.asInstanceOf[UTF8String].toString,
                                        rel.asInstanceOf[UTF8String].toString))
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** url_host(url) -> string ("" when malformed) */
case class UrlHostExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects (string)")
  override def dataType: DataType = StringType
  override def prettyName: String = "url_host"
  override protected def nullSafeEval(url: Any): Any =
    UTF8String.fromString(PyUrl.hostOf(url.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** resource_count(body: binary) -> int (recursive, webarchive.py:275-291) */
case class ResourceCountExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects (binary)")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "resource_count"
  override protected def nullSafeEval(body: Any): Any =
    try WebArchiveOps.resourceCount(WebArchiveOps.parse(body.asInstanceOf[Array[Byte]]))
    catch { case _: Exception => null }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
