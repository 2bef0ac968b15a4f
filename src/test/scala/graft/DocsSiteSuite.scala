package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the markdown constructs the repo's docs actually use — headings,
  * fenced code, bullets with wrapped continuations, tables, inline
  * code/bold/links — and that the generated site is complete (a page per
  * doc, index, nav on every page, stylesheet). No Spark needed.
  */
class DocsSiteSuite extends AnyFunSuite {

  test("renderer covers the docs' markdown constructs") {
    val md =
      """# Title
        |
        |A paragraph with `code`, **bold**, and a [link](other.html).
        |
        |## Section
        |
        |- first bullet
        |- second bullet
        |  wrapped continuation
        |
        || a | b |
        ||---|---|
        || 1 | `x < y` |
        |
        |```scala
        |val x = 1 < 2 // <angle> brackets must escape
        |```
        |""".stripMargin
    val html = DocsSite.render(md)
    assert(html.contains("<h1>Title</h1>"))
    assert(html.contains("<h2>Section</h2>"))
    assert(html.contains("<code>code</code>") && html.contains("<b>bold</b>"))
    assert(html.contains("""<a href="other.html">link</a>"""))
    assert(html.contains("<li>first bullet</li>"))
    assert(html.contains("<li>second bullet wrapped continuation</li>"))
    assert(html.contains("<table>") && html.contains("</table>"))
    // the |---| separator row renders no cells
    assert(!html.contains("<td>---</td>"))
    assert(html.contains("<td><code>x &lt; y</code></td>"))
    assert(html.contains("<pre><code>") && html.contains("1 &lt; 2"))
    assert(html.contains("&lt;angle&gt;"))
  }

  test("generate renders every docs page with nav, index, and stylesheet") {
    val out = Files.createTempDirectory("graft-site")
    val docsDir = Paths.get("docs")
    val pages = DocsSite.generate(docsDir, out)
    val mdCount = Files.list(docsDir).filter(_.toString.endsWith(".md")).count()
    assert(pages.length === mdCount)
    assert(pages.head === "overview") // nav order starts at the overview
    pages.foreach { p =>
      val f = out.resolve(s"$p.html")
      assert(Files.exists(f), s"missing page $p")
      val html = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      assert(html.contains("<nav>") && html.contains("style.css"))
      // every page links every other page exactly once in the nav
      pages.filterNot(_ == p).foreach { other =>
        assert(html.contains(s"""<a href="$other.html">"""), s"$p misses nav link to $other")
      }
    }
    assert(Files.exists(out.resolve("index.html")))
    assert(Files.exists(out.resolve("style.css")))
    val overview = new String(
      Files.readAllBytes(out.resolve("overview.html")), StandardCharsets.UTF_8)
    assert(overview.contains("<pre><code>"), "overview should carry rendered code fences")
  }
}
