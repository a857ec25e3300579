package graft.extract

/** C4–C10 — block classification and Markdown emission (SURVEY.md §2.2).
  *
  * Re-expresses the public rendering semantics of pymupdf4llm 0.0.27
  * (the library the reference pins and calls from
  * /root/reference/src/pdf_extractor/converter.py:218):
  *
  *  - C4 table rows → GitHub pipe tables (first row = header, then a
  *    `|---|` separator matching the header's cell count)
  *  - C5 bullet glyphs (`- `, `• `, `* `) → `- ` list items; numbered
  *    `1. ` / `1) ` items normalized to `1. `
  *  - C6 monospaced spans → fenced ``` code blocks (consecutive mono
  *    spans of a page fold into one fence)
  *  - C7 bold/italic span flags → `**…**` / `*…*` / `***…***`
  *  - C8 page separator `-----` after every PDF page
  *  - C9 HTML blocks rendered by tag (headings, li, pre/code,
  *    blockquote, paragraph) after boilerplate stripping
  *  - C10 reassembly: elements joined by one blank line
  *
  * All rules are pure `Seq[Block] → Seq[String]`; Spark's job is only
  * distribution (ExtractPipeline).
  */
object MarkdownEmitter {

  // list-item recognition is on the per-block hot path (called several
  // times per block) — char checks, no regex/Matcher allocation
  private def bulletRest(t: String): String = {
    // "^[-•*]\s+(.*)$"
    if (t.length < 2) return null
    val c = t.charAt(0)
    if (c != '-' && c != '•' && c != '*') return null
    var i = 1
    while (i < t.length && Character.isWhitespace(t.charAt(i))) i += 1
    if (i == 1) null else t.substring(i)
  }

  private def numberedParts(t: String): (String, String) = {
    // "^(\d+)[.)]\s+(.*)$"
    var i = 0
    while (i < t.length && t.charAt(i) >= '0' && t.charAt(i) <= '9') i += 1
    if (i == 0 || i >= t.length) return null
    val sep = t.charAt(i)
    if (sep != '.' && sep != ')') return null
    var j = i + 1
    while (j < t.length && Character.isWhitespace(t.charAt(j))) j += 1
    if (j == i + 1) null else (t.substring(0, i), t.substring(j))
  }

  /** Emit markdown elements (each element = one or more lines) for
    * blocks already in reading order, with headers identified.
    */
  def emit(blocks: Seq[Block], headerMap: Map[Double, Int]): Vector[String] = {
    val kept = blocks.filterNot(Boilerplate.isBoilerplate)
    val out = Vector.newBuilder[String]
    var i = 0
    var lastPdfPage = -1
    var pdfClosed = false
    while (i < kept.length) {
      val b = kept(i)
      // close a PDF page with its separator when the page changes, or
      // when the flow leaves PDF blocks entirely (mixed-kind turns:
      // the separator belongs to the page it closes, not to trailing
      // HTML/plain content)
      if (b.kind == BlockKind.Pdf && lastPdfPage >= 0 && b.page != lastPdfPage)
        out += "-----"
      if (b.kind != BlockKind.Pdf && lastPdfPage >= 0 && !pdfClosed) {
        out += "-----"
        pdfClosed = true
      }
      if (b.kind == BlockKind.Pdf) lastPdfPage = b.page

      b match {
        case t if t.kind == BlockKind.Pdf && t.isTableRow =>
          val rows = Vector.newBuilder[Block]
          var j = i
          while (j < kept.length && kept(j).kind == BlockKind.Pdf &&
            kept(j).isTableRow && kept(j).page == t.page) {
            rows += kept(j); j += 1
          }
          out += pipeTable(rows.result())
          i = j

        case m if m.kind == BlockKind.Pdf && m.isMono =>
          val lines = Vector.newBuilder[String]
          var j = i
          while (j < kept.length && kept(j).kind == BlockKind.Pdf &&
            kept(j).isMono && !kept(j).isTableRow && kept(j).page == m.page) {
            lines += kept(j).text; j += 1
          }
          out += ("```\n" + lines.result().mkString("\n") + "\n```")
          i = j

        case h if Headers.level(headerMap, h) > 0 =>
          out += ("#" * Headers.level(headerMap, h) + " " + h.text.trim)
          i += 1

        case _ if isListItem(b) =>
          val items = Vector.newBuilder[String]
          var j = i
          while (j < kept.length && sameFlow(kept(j), b) && isListItem(kept(j)) &&
            Headers.level(headerMap, kept(j)) == 0) {
            items += listLine(kept(j).text); j += 1
          }
          out += items.result().mkString("\n")
          i = j

        case pre if pre.kind == BlockKind.Html &&
          (pre.lastTag == "pre" || pre.lastTag == "code") =>
          // consecutive pre/code blocks fold into one fence (same rule
          // as C6 mono spans)
          val lines = Vector.newBuilder[String]
          var j = i
          while (j < kept.length && kept(j).kind == BlockKind.Html &&
            (kept(j).lastTag == "pre" || kept(j).lastTag == "code")) {
            lines += kept(j).text; j += 1
          }
          out += ("```\n" + lines.result().mkString("\n") + "\n```")
          i = j

        case html if html.kind == BlockKind.Html =>
          out += htmlElement(html)
          i += 1

        case _ =>
          out += styled(b)
          i += 1
      }
    }
    // terminate the final PDF page (unless already closed at the
    // PDF→non-PDF transition)
    if (lastPdfPage >= 0 && !pdfClosed) out += "-----"
    out.result()
  }

  private def isListItem(b: Block): Boolean =
    if (bulletRest(b.text) != null)
      b.kind != BlockKind.Html || b.lastTag != "pre"
    else if (numberedParts(b.text) != null) true
    else b.kind == BlockKind.Html && b.lastTag == "li"

  private def sameFlow(a: Block, b: Block): Boolean =
    a.kind == b.kind && (a.kind != BlockKind.Pdf || a.page == b.page) &&
      !a.isMono && !a.isTableRow

  private def listLine(text: String): String = {
    val b = bulletRest(text)
    if (b != null) return "- " + b
    val n = numberedParts(text)
    if (n != null) n._1 + ". " + n._2
    else "- " + text.trim
  }

  /** C7 — inline styling from span flags (headings/lists exempt). */
  private def styled(b: Block): String = {
    val t = b.text
    if (b.kind != BlockKind.Pdf || t.trim.isEmpty) t
    else if (b.isBold && b.isItalic) s"***$t***"
    else if (b.isBold) s"**$t**"
    else if (b.isItalic) s"*$t*"
    else t
  }

  /** C4 — pipe table; cells arrive `|`-joined in the row's text. */
  private def pipeTable(rows: Seq[Block]): String = {
    val header = rows.head.text.split("\\|", -1).map(_.trim)
    val sep = header.map(_ => "---").mkString("|", "|", "|")
    val lines = Vector.newBuilder[String]
    lines += header.mkString("|", "|", "|")
    lines += sep
    rows.tail.foreach { r =>
      lines += r.text.split("\\|", -1).map(_.trim).mkString("|", "|", "|")
    }
    lines.result().mkString("\n")
  }

  /** C9 — HTML tag → markdown element (post boilerplate filter). */
  private def htmlElement(b: Block): String = b.lastTag match {
    case "h1" => "# " + b.text.trim
    case "h2" => "## " + b.text.trim
    case "h3" => "### " + b.text.trim
    case "h4" => "#### " + b.text.trim
    case "h5" => "##### " + b.text.trim
    case "h6" => "###### " + b.text.trim
    case "pre" | "code" => "```\n" + b.text + "\n```"
    case "blockquote" => "> " + b.text.trim
    case "li" => listLine(b.text)
    case _ => b.text
  }
}
