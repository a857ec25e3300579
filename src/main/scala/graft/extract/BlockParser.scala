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
        parseLine(payload.substring(start, end), seq).foreach { b =>
          out += b; seq += 1
        }
      }
      start = end + 1
    }
    out.result()
  }

  private def parseLine(line: String, seq: Int): Option[Block] = {
    if (line.length >= 2 && line.charAt(0) == 'P' && line.indexOf('\t') > 0) {
      parsePdf(line, seq).orElse(Some(plain(line, seq)))
    } else if (line.startsWith("H\t")) {
      parseHtml(line, seq).orElse(Some(plain(line, seq)))
    } else {
      Some(plain(line, seq))
    }
  }

  private def plain(text: String, seq: Int): Block =
    Block(BlockKind.Plain, 0, 0, 0, 0, 0, 0.0, 0, "", 0, text, seq)

  /** next field boundary; returns -1 when the separator is missing */
  @inline private def tab(line: String, from: Int): Int =
    line.indexOf('\t', from)

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
    * (manual field scan — the parser is the kernel's hottest stage;
    * split() allocated two arrays + extra substrings per line)
    */
  private def parsePdf(line: String, seq: Int): Option[Block] = {
    val t1 = tab(line, 0); if (t1 < 0) return None
    val t2 = tab(line, t1 + 1); if (t2 < 0) return None
    val t3 = tab(line, t2 + 1); if (t3 < 0) return None
    val t4 = tab(line, t3 + 1); if (t4 < 0) return None
    try {
      val page = Integer.parseInt(line, 1, t1, 10)
      val c1 = line.indexOf(',', t1 + 1); if (c1 < 0 || c1 > t2) return None
      val c2 = line.indexOf(',', c1 + 1); if (c2 < 0 || c2 > t2) return None
      val c3 = line.indexOf(',', c2 + 1); if (c3 < 0 || c3 > t2) return None
      val x0 = parseDoubleField(line, t1 + 1, c1)
      val y0 = parseDoubleField(line, c1 + 1, c2)
      val x1 = parseDoubleField(line, c2 + 1, c3)
      val y1 = parseDoubleField(line, c3 + 1, t2)
      val fontSize = parseDoubleField(line, t2 + 1, t3)
      val flags = Integer.parseInt(line, t3 + 1, t4, 10)
      Some(Block(BlockKind.Pdf, page, x0, y0, x1, y1, fontSize, flags,
        "", 0, line.substring(t4 + 1), seq))
    } catch { case _: NumberFormatException => None }
  }

  /** `H\t<tagPath>\t<linkChars>\t<content>` */
  private def parseHtml(line: String, seq: Int): Option[Block] = {
    val t1 = 1 // line starts with "H\t"
    val t2 = tab(line, t1 + 1); if (t2 < 0) return None
    val t3 = tab(line, t2 + 1); if (t3 < 0) return None
    try {
      val linkChars = Integer.parseInt(line, t2 + 1, t3, 10)
      Some(Block(BlockKind.Html, 0, 0, 0, 0, 0, 0.0, 0,
        line.substring(t1 + 1, t2), linkChars, line.substring(t3 + 1), seq))
    } catch { case _: NumberFormatException => None }
  }
}
