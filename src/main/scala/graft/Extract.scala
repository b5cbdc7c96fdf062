package graft

import java.nio.file.{Files, Paths}

import graft.core.Rewriter
import graft.sql.ExtractionOps

/** Single-archive extraction CLI — the reference's primary human entry
  * point (reference: extractor.py:16-63).
  *
  *   graft.Extract [-s|--single-file] input.webarchive [output.html]
  *
  * With one path the output derives from the input (`foo.webarchive` ->
  * `foo.html`), exactly like extractor.py:44-47. Default mode extracts the
  * multi-file tree (main html at the output path, subresources in the
  * reference's `<name>_files/` layout next to it); `-s` writes one
  * self-contained html with data-URI subresources (extractor.py's
  * --single-file). No Spark session: one archive is a single-node job by
  * definition — the distributed path is [[graft.sources.ExtractSink]].
  */
object Extract {

  def main(args: Array[String]): Unit = {
    val singleFile = args.exists(a => a == "-s" || a == "--single-file")
    val paths = args.filterNot(a => a == "-s" || a == "--single-file")
    val (inPath, outPath) = paths match {
      case Array(in) =>
        // os.path.splitext semantics (extractor.py:44-47): split the
        // extension within the BASENAME only — dots in parent directories
        // are not split points ('v1.2/archive' -> 'v1.2/archive.html'),
        // and a leading-dot name has no extension ('.webarchive' ->
        // '.webarchive.html'). ADVICE r2.
        val p = Paths.get(in)
        val name = p.getFileName.toString
        val firstNonDot = name.indexWhere(_ != '.')
        val dot = name.lastIndexOf('.')
        val stem = if (firstNonDot >= 0 && dot > firstNonDot) name.substring(0, dot) else name
        val outName = stem + ".html"
        (in, Option(p.getParent).map(_.resolve(outName).toString).getOrElse(outName))
      case Array(in, out) => (in, out)
      case _ =>
        System.err.println("usage: graft.Extract [-s|--single-file] input.webarchive [output.html]")
        sys.exit(1)
    }
    val body = Files.readAllBytes(Paths.get(inPath))
    // the reference derives the fallback base URL from the file path; our
    // parser takes it from the archive's main-resource URL internally
    val archive = ExtractionOps.archiveOf(body, "file://" + Paths.get(inPath).toAbsolutePath)
    val out = Paths.get(outPath).toAbsolutePath
    if (singleFile) {
      Files.write(out, Rewriter.toHtml(archive).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } else {
      val dir = out.getParent
      Files.createDirectories(dir)
      for ((rel, bytes) <- Rewriter.extractFiles(archive, out.getFileName.toString)) {
        val p = dir.resolve(rel)
        if (p.getParent != null) Files.createDirectories(p.getParent)
        Files.write(p, bytes)
      }
    }
  }
}
