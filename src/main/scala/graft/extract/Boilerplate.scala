package graft.extract

/** C9 — HTML boilerplate strip (north-rule extension; SURVEY.md §2.2).
  *
  * The reference handles PDF only; the north rule adds HTML
  * main-content extraction. Classification is a deterministic rules
  * tree over the public Boilerpipe/Readability-style features:
  * link density, tag path (nav/footer/header/aside subtrees), and
  * text length. A block is boilerplate iff any of:
  *   - its tag path contains a chrome tag (nav, footer, header, aside,
  *     menu, script, style, form, button),
  *   - link density > 0.5 (link-dominated),
  *   - text shorter than 10 chars AND link density > 0.25
  *     (short link stubs like "next »").
  */
object Boilerplate {

  /** chrome tags, matched per path segment: nav, footer, header,
    * aside, menu, script, style, form, button. The check runs once
    * per block inside the extraction kernel, so segments are matched
    * in place (length dispatch + regionMatches) instead of
    * split("/") + Set probing, which allocated an array and
    * substrings per block.
    */
  def isBoilerplate(b: Block): Boolean =
    b.kind == BlockKind.Html && (
      hasChromeTag(b.tagPath) ||
      b.linkDensity > 0.5 ||
      (b.text.length < 10 && b.linkDensity > 0.25))

  private def hasChromeTag(path: String): Boolean = {
    val n = path.length
    var start = 0
    while (start < n) {
      var end = path.indexOf('/', start)
      if (end < 0) end = n
      if (isChrome(path, start, end)) return true
      start = end + 1
    }
    false
  }

  private def isChrome(p: String, s: Int, e: Int): Boolean = (e - s) match {
    case 3 => p.regionMatches(s, "nav", 0, 3)
    case 4 => p.regionMatches(s, "menu", 0, 4) ||
      p.regionMatches(s, "form", 0, 4)
    case 5 => p.regionMatches(s, "aside", 0, 5) ||
      p.regionMatches(s, "style", 0, 5)
    case 6 => p.regionMatches(s, "header", 0, 6) ||
      p.regionMatches(s, "footer", 0, 6) ||
      p.regionMatches(s, "script", 0, 6) ||
      p.regionMatches(s, "button", 0, 6)
    case _ => false
  }
}
