package graft.extract

/** C1 — page/block tokenization (SURVEY.md §2.2).
  *
  * The reference delegates span extraction to PyMuPDF
  * (`page.get_text("dict")` inside pymupdf4llm 0.0.27; reference:
  * /root/reference/src/pdf_extractor/converter.py:218). In the
  * transcript table the same information arrives as a serialized
  * block stream — one line per block (FIXTURES.md §2):
  *
  *  - `P<page>\t<x0>,<y0>,<x1>,<y1>\t<fontSize>\t<flags>\t<content>`
  *  - `H\t<tagPath>\t<linkChars>\t<content>`
  *  - anything else → a Plain text block (body paragraph).
  *
  * Parsing is total: malformed structured lines degrade to Plain
  * blocks (mirrors the reference's per-document error tolerance,
  * converter.py:234-242, at line granularity).
  *
  * Lines are parsed IN PLACE over the payload (field scans carry
  * [from,to) bounds): the only substrings taken are the ones that
  * outlive the parse — the block's content (and an HTML block's tag
  * path). The former per-line `substring(start, end)` copied every
  * structured line once more than needed; content dominates line
  * length, so that was nearly half the parser's character traffic.
  */
object BlockParser {

  def parse(payload: String): Vector[Block] = {
    if (payload == null || payload.isEmpty) return Vector.empty
    val out = Vector.newBuilder[Block]
    var seq = 0
    var start = 0
    val n = payload.length
    while (start <= n - 1) {
      var end = payload.indexOf('\n', start)
      if (end < 0) end = n
      if (end > start) {
        out += parseLine(payload, start, end, seq)
        seq += 1
      }
      start = end + 1
    }
    out.result()
  }

  private def parseLine(s: String, from: Int, to: Int, seq: Int): Block = {
    if (to - from >= 2 && s.charAt(from) == 'P' && hasTab(s, from + 1, to)) {
      val b = parsePdf(s, from, to, seq)
      if (b != null) b else plain(s.substring(from, to), seq)
    } else if (to - from >= 2 && s.charAt(from) == 'H' &&
      s.charAt(from + 1) == '\t') {
      val b = parseHtml(s, from, to, seq)
      if (b != null) b else plain(s.substring(from, to), seq)
    } else {
      plain(s.substring(from, to), seq)
    }
  }

  private def plain(text: String, seq: Int): Block =
    Block(BlockKind.Plain, 0, 0, 0, 0, 0, 0.0, 0, "", 0, text, seq)

  // field scans are BOUNDED manual loops, never String.indexOf with a
  // post-check: indexOf has no end bound (pre-JDK-21), so a missing
  // separator would scan to the END OF THE PAYLOAD — O(payload) per
  // 'P'-prefixed tab-free line, O(n²) on adversarial plain prose

  @inline private def hasTab(s: String, from: Int, to: Int): Boolean = {
    var i = from
    while (i < to) {
      if (s.charAt(i) == '\t') return true
      i += 1
    }
    false
  }

  /** next field boundary within [from,to); -1 when missing */
  @inline private def tab(s: String, from: Int, to: Int): Int = {
    var i = from
    while (i < to) {
      if (s.charAt(i) == '\t') return i
      i += 1
    }
    -1
  }

  /** next ',' within [from,to); -1 when missing */
  @inline private def comma(s: String, from: Int, to: Int): Int = {
    var i = from
    while (i < to) {
      if (s.charAt(i) == ',') return i
      i += 1
    }
    -1
  }

  private val Pow10: Array[Double] =
    Array.tabulate(16)(i => math.pow(10, i)) // 10^0..10^15, all exact

  /** Double.parseDouble of line[from,to) with an allocation-free fast
    * path for the dominant coordinate shape `-?d+(.d+)?` at ≤ 15
    * digits: both the mantissa integer and 10^frac are exactly
    * representable, so ONE correctly-rounded division yields the same
    * bits parseDouble's general algorithm produces (the classic
    * Clinger fast path). Anything else — signs, exponents, hex
    * floats, NaN/Infinity, whitespace, > 15 digits — falls back to
    * parseDouble on a substring, preserving exact JDK semantics
    * including its NumberFormatException.
    */
  private def parseDoubleField(line: String, from: Int, to: Int): Double = {
    var i = from
    var neg = false
    if (i < to && line.charAt(i) == '-') { neg = true; i += 1 }
    var m = 0L
    var digits = 0
    var frac = 0
    var seenDot = false
    var simple = i < to
    while (simple && i < to) {
      val c = line.charAt(i)
      if (c >= '0' && c <= '9') {
        m = m * 10 + (c - '0')
        digits += 1
        if (seenDot) frac += 1
        i += 1
      } else if (c == '.' && !seenDot && i + 1 < to) {
        seenDot = true
        i += 1
      } else simple = false
    }
    if (!simple || digits == 0 || digits > 15 || (seenDot && frac == 0))
      return java.lang.Double.parseDouble(line.substring(from, to))
    val v = if (frac == 0) m.toDouble else m.toDouble / Pow10(frac)
    if (neg) -v else v
  }

  /** `P<page>\t<x0>,<y0>,<x1>,<y1>\t<fontSize>\t<flags>\t<content>`
    * parsed in [from,to); null on any malformed field (caller degrades
    * the line to Plain — same totality as the substring-based parse).
    */
  private def parsePdf(s: String, from: Int, to: Int, seq: Int): Block = {
    val t1 = tab(s, from, to); if (t1 < 0) return null
    val t2 = tab(s, t1 + 1, to); if (t2 < 0) return null
    val t3 = tab(s, t2 + 1, to); if (t3 < 0) return null
    val t4 = tab(s, t3 + 1, to); if (t4 < 0) return null
    try {
      val page = Integer.parseInt(s, from + 1, t1, 10)
      val c1 = comma(s, t1 + 1, t2); if (c1 < 0) return null
      val c2 = comma(s, c1 + 1, t2); if (c2 < 0) return null
      val c3 = comma(s, c2 + 1, t2); if (c3 < 0) return null
      val x0 = parseDoubleField(s, t1 + 1, c1)
      val y0 = parseDoubleField(s, c1 + 1, c2)
      val x1 = parseDoubleField(s, c2 + 1, c3)
      val y1 = parseDoubleField(s, c3 + 1, t2)
      val fontSize = parseDoubleField(s, t2 + 1, t3)
      val flags = Integer.parseInt(s, t3 + 1, t4, 10)
      Block(BlockKind.Pdf, page, x0, y0, x1, y1, fontSize, flags,
        "", 0, s.substring(t4 + 1, to), seq)
    } catch { case _: NumberFormatException => null }
  }

  /** `H\t<tagPath>\t<linkChars>\t<content>` parsed in [from,to). */
  private def parseHtml(s: String, from: Int, to: Int, seq: Int): Block = {
    val t1 = from + 1 // line starts with "H\t"
    val t2 = tab(s, t1 + 1, to); if (t2 < 0) return null
    val t3 = tab(s, t2 + 1, to); if (t3 < 0) return null
    try {
      val linkChars = Integer.parseInt(s, t2 + 1, t3, 10)
      Block(BlockKind.Html, 0, 0, 0, 0, 0, 0.0, 0,
        s.substring(t1 + 1, t2), linkChars, s.substring(t3 + 1, to), seq)
    } catch { case _: NumberFormatException => null }
  }
}
