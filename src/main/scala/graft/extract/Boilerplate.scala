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

  private val ChromeTags: Set[String] =
    Set("nav", "footer", "header", "aside", "menu", "script", "style",
      "form", "button")

  def isBoilerplate(b: Block): Boolean = {
    if (b.kind != BlockKind.Html) false
    else {
      val tags = b.tagPath.split("/")
      tags.exists(ChromeTags.contains) ||
      b.linkDensity > 0.5 ||
      (b.text.length < 10 && b.linkDensity > 0.25)
    }
  }
}
