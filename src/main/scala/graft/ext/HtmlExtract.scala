package graft.ext

/** Lightweight HTML text/boilerplate extraction — the web-corpus
  * curation primitive that precedes every quality filter: strip
  * markup, drop script/style payloads, separate link text from body
  * text (link density is the classic boilerplate signal — Kohlschütter
  * et al.'s boilerpipe features), capture the title. A single linear
  * scan, no regex backtracking, no DOM — the shape that survives
  * 100 TB of crawl shards (O(bytes) per doc, partition-local).
  *
  * Parsing contract (documented, not guessed): tags are `<` … `>`
  * skips; `<script>`/`<style>` bodies are dropped wholesale up to
  * their case-insensitive close tag (script bodies legally contain
  * bare `<`, the classic naive-stripper trap — handled by searching
  * for the close tag, not the next bracket); `<a …>` … `</a>` spans
  * count toward BOTH text and link text; `<title>` captures
  * separately and head text never counts as body text; attribute
  * values are assumed bracket-free (crawler-normalized input).
  */
object HtmlExtract {

  final case class HtmlDoc(title: String, n_links: Long,
                           text_chars: Long, link_chars: Long) {
    def linkDensityPct: Long =
      if (text_chars == 0) 0L else 100L * link_chars / text_chars
  }

  def extract(html: String): HtmlDoc = {
    val s = html
    val lower = html.toLowerCase
    val n = s.length
    var i = 0
    var title = ""
    var inBody = false
    var inTitle = false
    var inLink = false
    var nLinks = 0L
    var textChars = 0L
    var linkChars = 0L
    val titleBuf = new StringBuilder
    def closeOf(tag: String, from: Int): Int = {
      val idx = lower.indexOf(s"</$tag", from)
      if (idx < 0) n else idx
    }
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        val end = s.indexOf('>', i)
        require(end > i, "HTML: unterminated tag")
        val inner = s.substring(i + 1, end)
        // keep a leading '/' (close tags); drop a trailing '/'
        // (self-closing tags)
        val name = inner.takeWhile(_ != ' ').stripSuffix("/")
          .toLowerCase
        name match {
          case "script" | "style" =>
            val stop = closeOf(name, end + 1)
            i = s.indexOf('>', stop)
            i = if (i < 0) n else i + 1
          case "body" => inBody = true; i = end + 1
          case "/body" => inBody = false; i = end + 1
          case "title" => inTitle = true; i = end + 1
          case "/title" => inTitle = false; i = end + 1
          case "a" => inLink = true; nLinks += 1; i = end + 1
          case "/a" => inLink = false; i = end + 1
          case _ => i = end + 1
        }
      } else {
        if (inTitle) titleBuf.append(c)
        else if (inBody) {
          textChars += 1
          if (inLink) linkChars += 1
        }
        i += 1
      }
    }
    title = titleBuf.toString
    HtmlDoc(title, nLinks, textChars, linkChars)
  }
}
