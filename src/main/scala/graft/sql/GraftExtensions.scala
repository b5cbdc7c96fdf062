package graft.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: enables
  * `--conf spark.sql.extensions=graft.sql.GraftExtensions` so every graft
  * operator is SQL-available in any session of the cluster without
  * programmatic registration (the deployment-idiomatic variant of
  * [[GraftFunctions.register]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "extract_html" -> (args => ExtractHtmlExpr(args(0), args(1))),
    "extract_text" -> (args => ExtractTextExpr(args(0), args(1))),
    "extract_outlinks" -> (args => ExtractOutlinksExpr(args(0), args(1))),
    "extract_all" -> (args => ExtractAllExpr(args(0), args(1))),
    "extract_files" -> (args => ExtractFilesExpr(args(0), args(1))),
    "parse_webarchive" -> (args => ParseWebArchiveExpr(args(0))),
    "url_canonicalize" -> (args => UrlCanonicalizeExpr(args(0))),
    "url_join" -> (args => UrlJoinExpr(args(0), args(1))),
    "url_host" -> (args => UrlHostExpr(args(0))),
    "resource_count" -> (args => ResourceCountExpr(args(0))),
    "fingerprint64" -> (args => Fingerprint64Expr(args(0))),
    "is_html_mime" -> (args => IsHtmlMimeExpr(args(0))),
    "is_text_mime" -> (args => IsTextMimeExpr(args(0))))

  override def apply(ext: SparkSessionExtensions): Unit =
    for ((name, builder) <- fns)
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.sql", name), builder))
}
