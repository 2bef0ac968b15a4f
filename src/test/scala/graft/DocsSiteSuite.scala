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

  test("code spans protect bold/link syntax; prose digits survive") {
    val html = DocsSite.render(
      "Use `a ** b` and `Seq[Double](0.8)` with 0 and 1 in prose.\n")
    assert(html.contains("<code>a ** b</code>"), html)
    assert(html.contains("<code>Seq[Double](0.8)</code>"), html)
    assert(html.contains("with 0 and 1 in prose"), html)
  }

  test("generate renders every docs page with nav, index, and stylesheet") {
    val out = Files.createTempDirectory("graft-site")
    val docsDir = Paths.get("docs")
    val pages = DocsSite.generate(docsDir, out)
    val listing = Files.list(docsDir)
    val mdCount = try listing.filter(_.toString.endsWith(".md")).count() finally listing.close()
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

  test("committed site/ is in sync with docs/ (fresh render byte-equals it)") {
    // site/ is build output checked in for parity with the reference's
    // built website; without this guard a docs/ edit that skips
    // `runMain graft.DocsSite docs site` would ship a silently stale site
    val fresh = Files.createTempDirectory("graft-site-sync")
    val pages = DocsSite.generate(Paths.get("docs"), fresh)
    val committed = Paths.get("site")
    (pages.map(_ + ".html") :+ "index.html" :+ "style.css").foreach { f =>
      assert(Files.exists(committed.resolve(f)), s"site/$f missing — re-run graft.DocsSite")
      assert(
        java.util.Arrays.equals(
          Files.readAllBytes(fresh.resolve(f)),
          Files.readAllBytes(committed.resolve(f))),
        s"site/$f is stale — re-run `runMain graft.DocsSite docs site` and commit")
    }
  }
}
