package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Static documentation site generator: renders every `.md` under
  * `docs/` to a self-contained `site/` directory (one HTML page per doc
  * + nav + stylesheet, zero external deps) — the site-parity counterpart
  * of the reference's built Docusaurus site (reference: `website/`).
  * Content correctness is enforced elsewhere: DocsSuite compiles and runs
  * every snippet on these pages; this main only makes them navigable.
  *
  * The renderer covers exactly the markdown this repo's docs use:
  * `#`-headings, fenced code blocks, `-` bullet lists (with wrapped
  * continuation lines), `|` tables, inline `code`/**bold**/links, and
  * paragraphs. It is a line-state machine, not a general CommonMark
  * parser — DocsSiteSuite pins the constructs that matter.
  */
object DocsSite {

  /** Preferred nav order; unknown pages append alphabetically. */
  private val navOrder =
    Seq("overview", "example", "bagging", "boosting", "gbm", "stacking",
      "dummy", "pipeline-ops")

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Inline markup over already-escaped text. Code spans are extracted to
    * placeholders FIRST so bold/link syntax inside backticks (e.g. a code
    * span containing `**` or `](`) is never rewritten, then reinserted.
    */
  private def inline(raw: String): String = {
    val spans = scala.collection.mutable.ArrayBuffer.empty[String]
    var s = escape(raw)
    s = "`([^`]+)`".r.replaceAllIn(s, m => {
      spans += m.group(1)
      "\u0000" + (spans.length - 1) + "\u0000"
    })
    s = "\\*\\*([^*]+)\\*\\*".r.replaceAllIn(s, "<b>$1</b>")
    s = "\\[([^\\]]+)\\]\\(([^)]+)\\)".r.replaceAllIn(s, "<a href=\"$2\">$1</a>")
    "\u0000(\\d+)\u0000".r.replaceAllIn(s, m =>
      scala.util.matching.Regex.quoteReplacement(
        s"<code>${spans(m.group(1).toInt)}</code>"))
  }

  private[graft] def render(md: String): String = {
    val out = new StringBuilder
    var inCode = false
    var inTable = false
    var inList = false
    val para = new StringBuilder
    val li = new StringBuilder

    def flushPara(): Unit =
      if (para.nonEmpty) { out ++= s"<p>${inline(para.toString.trim)}</p>\n"; para.clear() }
    def flushLi(): Unit =
      if (li.nonEmpty) { out ++= s"<li>${inline(li.toString.trim)}</li>\n"; li.clear() }
    def closeList(): Unit = if (inList) { flushLi(); out ++= "</ul>\n"; inList = false }
    def closeTable(): Unit = if (inTable) { out ++= "</table>\n"; inTable = false }

    md.linesIterator.foreach { line =>
      if (line.startsWith("```")) {
        flushPara(); closeList(); closeTable()
        out ++= (if (!inCode) "<pre><code>" else "</code></pre>\n")
        inCode = !inCode
      } else if (inCode) {
        out ++= escape(line) + "\n"
      } else if (line.startsWith("#")) {
        flushPara(); closeList(); closeTable()
        val level = math.min(line.takeWhile(_ == '#').length, 4)
        out ++= s"<h$level>${inline(line.dropWhile(_ == '#').trim)}</h$level>\n"
      } else if (line.startsWith("|")) {
        flushPara(); closeList()
        val cells = line.stripPrefix("|").stripSuffix("|").split("\\|", -1).map(_.trim)
        val isSeparator = cells.forall(c => c.nonEmpty && c.forall(ch => ch == '-' || ch == ':'))
        if (!isSeparator) {
          if (!inTable) { out ++= "<table>\n"; inTable = true }
          out ++= cells.map(c => s"<td>${inline(c)}</td>").mkString("<tr>", "", "</tr>\n")
        }
      } else if (line.startsWith("- ")) {
        flushPara(); closeTable()
        if (!inList) { out ++= "<ul>\n"; inList = true } else flushLi()
        li ++= line.drop(2)
      } else if (line.trim.isEmpty) {
        flushPara(); closeList(); closeTable()
      } else if (inList) {
        li ++= " " + line.trim // wrapped bullet continuation
      } else {
        closeTable()
        para ++= line.trim + " "
      }
    }
    flushPara(); closeList(); closeTable()
    if (inCode) out ++= "</code></pre>\n"
    out.toString
  }

  private val css =
    """body{max-width:52rem;margin:2rem auto;padding:0 1rem;
      |  font:16px/1.55 system-ui,sans-serif;color:#1a1a2e}
      |nav{border-bottom:1px solid #ddd;padding-bottom:.6rem;margin-bottom:1.2rem}
      |nav a{margin-right:.7rem;text-decoration:none;color:#2a6}
      |nav b{margin-right:.7rem}
      |pre{background:#f6f8fa;padding:.8rem;overflow-x:auto;border-radius:6px}
      |code{background:#f6f8fa;padding:.1rem .25rem;border-radius:4px;
      |  font:13px/1.45 ui-monospace,monospace}
      |pre code{padding:0}
      |table{border-collapse:collapse;margin:1rem 0}
      |td{border:1px solid #ccc;padding:.3rem .6rem}
      |h1,h2,h3{line-height:1.25}
      |""".stripMargin

  /** Render every `.md` under `docsDir` into `outDir`; returns the page
    * names in nav order. `index.html` redirects to the overview page.
    */
  def generate(docsDir: Path, outDir: Path): Seq[String] = {
    Files.createDirectories(outDir)
    val listing = Files.list(docsDir)
    val mds =
      try listing.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".md")).toList
        .sortBy(_.getFileName.toString)
      finally listing.close()
    require(mds.nonEmpty, s"no .md files under $docsDir")
    val names = mds.map(_.getFileName.toString.stripSuffix(".md"))
    val ordered = names.sortBy { n =>
      val i = navOrder.indexOf(n)
      (if (i < 0) navOrder.length else i, n)
    }
    def nav(current: String): String =
      ordered.map { n =>
        if (n == current) s"<b>$n</b>" else s"""<a href="$n.html">$n</a>"""
      }.mkString("<nav>", " ", "</nav>")
    Files.write(outDir.resolve("style.css"), css.getBytes(StandardCharsets.UTF_8))
    mds.foreach { p =>
      val name = p.getFileName.toString.stripSuffix(".md")
      val body = render(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      val html =
        s"""<!DOCTYPE html><html><head><meta charset="utf-8">
           |<title>graft docs — $name</title>
           |<link rel="stylesheet" href="style.css"></head>
           |<body>${nav(name)}
           |$body</body></html>
           |""".stripMargin
      Files.write(outDir.resolve(s"$name.html"), html.getBytes(StandardCharsets.UTF_8))
    }
    val home = if (ordered.contains("overview")) "overview" else ordered.head
    Files.write(
      outDir.resolve("index.html"),
      s"""<!DOCTYPE html><html><head><meta charset="utf-8">
         |<meta http-equiv="refresh" content="0; url=$home.html">
         |<title>graft docs</title></head>
         |<body><a href="$home.html">graft documentation</a></body></html>
         |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    ordered
  }

  def main(args: Array[String]): Unit = {
    val docsDir = Paths.get(if (args.length > 0) args(0) else "docs")
    val outDir = Paths.get(if (args.length > 1) args(1) else "site")
    val pages = generate(docsDir, outDir)
    println(s"wrote ${pages.length + 1} pages to $outDir: index, ${pages.mkString(", ")}")
  }
}
