package graft.nlp

import java.nio.charset.StandardCharsets

/**
 * Deterministic, versioned html→text extraction.
 *
 * The north-rule row invariant is "extracted text byte-identical per url vs
 * the reference extractor". The reference side-steps extraction by being
 * handed pre-extracted sentence text (field 8 of its candidate TSV,
 * evaluate/SimpleSlotFiller.java:110-117), so the reference extractor is
 * identity-on-`text`; when `text` is absent we extract from `html` with the
 * fixed rules below. Pure function of the input bytes: no locale, no
 * wall-clock, UTF-8 locked, no trimming beyond the specified trailing-\n rule.
 */
object TextExtractor {

  val Version = "graft-extract-2"

  /** Identity when text is present (the reference contract); else html rules. */
  def extract(text: String, html: Array[Byte]): String =
    if (text != null) text
    else if (html == null) ""
    else extractHtml(new String(html, StandardCharsets.UTF_8))

  // nav added in graft-extract-2: related-links blocks are boilerplate,
  // not content (the link graph is extracted separately, text/Links.scala)
  private val DropBlocks =
    Seq("script", "style", "head", "nav").map { t =>
      (s"(?is)<$t\\b[^>]*>.*?</$t>").r
    }
  private val BlockClose =
    "(?i)</p>|</div>|</li>|</h[1-6]>|</tr>|<br\\s*/?>".r
  private val AnyTag = "(?s)<[^>]*>".r
  private val NumEntity = "&#(x[0-9a-fA-F]+|[0-9]+);".r

  def extractHtml(html: String): String = {
    var s = html
    DropBlocks.foreach(r => s = r.replaceAllIn(s, ""))
    s = BlockClose.replaceAllIn(s, "\n")
    s = AnyTag.replaceAllIn(s, "")
    s = NumEntity.replaceAllIn(s, m => {
      val g = m.group(1)
      val cp = if (g.startsWith("x") || g.startsWith("X"))
        Integer.parseInt(g.substring(1), 16) else Integer.parseInt(g)
      java.util.regex.Matcher.quoteReplacement(new String(Character.toChars(cp)))
    })
    s = s.replace("&nbsp;", " ").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&amp;", "&") // ampersand last, so &amp;lt; decodes to &lt;
    // drop only trailing newlines introduced by the final block close
    var end = s.length
    while (end > 0 && s.charAt(end - 1) == '\n') end -= 1
    s.substring(0, end)
  }

  /** Inverse helper used by fixtures: escape text for embedding in html. */
  def escapeHtml(text: String): String =
    text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
