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
    val lines = payload.split("\n", -1)
    val out = Vector.newBuilder[Block]
    var seq = 0
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      if (line.nonEmpty) {
        parseLine(line, seq).foreach { b => out += b; seq += 1 }
      }
      i += 1
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

  /** `P<page>\t<x0>,<y0>,<x1>,<y1>\t<fontSize>\t<flags>\t<content>` */
  private def parsePdf(line: String, seq: Int): Option[Block] = {
    val parts = line.split("\t", 5)
    if (parts.length != 5) return None
    try {
      val page = parts(0).substring(1).toInt
      val bbox = parts(1).split(",", 4)
      if (bbox.length != 4) return None
      val x0 = bbox(0).toDouble; val y0 = bbox(1).toDouble
      val x1 = bbox(2).toDouble; val y1 = bbox(3).toDouble
      val fontSize = parts(2).toDouble
      val flags = parts(3).toInt
      Some(Block(BlockKind.Pdf, page, x0, y0, x1, y1, fontSize, flags,
        "", 0, parts(4), seq))
    } catch { case _: NumberFormatException => None }
  }

  /** `H\t<tagPath>\t<linkChars>\t<content>` */
  private def parseHtml(line: String, seq: Int): Option[Block] = {
    val parts = line.split("\t", 4)
    if (parts.length != 4) return None
    try {
      val linkChars = parts(2).toInt
      Some(Block(BlockKind.Html, 0, 0, 0, 0, 0, 0.0, 0,
        parts(1), linkChars, parts(3), seq))
    } catch { case _: NumberFormatException => None }
  }
}
