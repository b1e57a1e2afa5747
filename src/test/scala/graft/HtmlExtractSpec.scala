package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.HtmlExtract

/** HTML text extraction: the script-with-bare-'<' trap, link
  * density, title capture, head/body separation. */
class HtmlExtractSpec extends AnyFunSuite {

  test("scripts with bare '<' in their code are dropped wholesale; " +
    "head text never counts; links count toward both tallies") {
    val d = HtmlExtract.extract(
      "<html><head><title>My Page</title>" +
        "<script>if(a<3&&b<4){x=1}</script></head>" +
        "<body><p>hello</p><script>y=z<9?0:1;</script>" +
        "<a href=\"u\">link</a></body></html>")
    assert(d.title == "My Page")
    assert(d.n_links == 1)
    assert(d.text_chars == 5 + 4) // "hello" + "link"
    assert(d.link_chars == 4)
    assert(d.linkDensityPct == 100L * 4 / 9)
  }

  test("style blocks drop; uppercase close tags match; empty body " +
    "gives zero density; unterminated tag fails by name") {
    val d = HtmlExtract.extract(
      "<html><body><STYLE>p { color: red }</STYLE>abc" +
        "<A HREF=\"u\">xy</A></body></html>")
    assert(d.text_chars == 5 && d.link_chars == 2)
    val e = HtmlExtract.extract("<html><body></body></html>")
    assert(e.text_chars == 0 && e.linkDensityPct == 0)
    val msg = intercept[IllegalArgumentException](
      HtmlExtract.extract("<html><body>x<")).getMessage
    assert(msg.contains("unterminated"), msg)
  }
}
