package graft.extract

/** C11 — deterministic markdownlint-fix subset (SURVEY.md §2.2).
  *
  * The reference shells out to `markdownlint --fix` and silently skips
  * it when the binary is missing
  * (/root/reference/src/pdf_extractor/converter.py:147-196,227-230), so
  * its output is environment-dependent. We implement the deterministic
  * subset our golden fixtures exercise (generated on the `--no-lint`
  * path, converter.py:81-85):
  *
  *  - MD012: collapse runs of >1 blank line to exactly one
  *  - MD047: file ends with exactly one trailing newline
  *  - strip trailing whitespace on each line (MD009)
  */
object LintNormalize {

  /** Fused join("\n\n") + normalize: byte-identical to
    * `normalize(elements.mkString("\n\n"))` without materializing and
    * re-splitting the intermediate document (that join/re-split was
    * ~half the whole kernel's time). One pass, one output buffer.
    */
  def normalizeJoin(elements: Seq[String]): String = {
    val out = new java.lang.StringBuilder(256)
    var blanks = 0
    var wroteAny = false
    def handleLine(s: String, from: Int, to: Int): Unit = {
      var e = to
      while (e > from && (s.charAt(e - 1) == ' ' || s.charAt(e - 1) == '\t')) e -= 1
      if (e == from) blanks += 1
      else {
        if (wroteAny) {
          out.append('\n')
          if (blanks > 0) out.append('\n')
        }
        blanks = 0
        wroteAny = true
        out.append(s, from, e)
      }
    }
    var first = true
    elements.foreach { el =>
      if (!first) blanks += 1 // the joining blank line
      first = false
      var start = 0
      var nl = el.indexOf('\n')
      while (nl >= 0) {
        handleLine(el, start, nl)
        start = nl + 1
        nl = el.indexOf('\n', start)
      }
      handleLine(el, start, el.length)
    }
    if (!wroteAny) "" else out.append('\n').toString
  }

  def normalize(md: String): String = {
    if (md.isEmpty) return ""
    val trimmedLines = md.split("\n", -1).map { l =>
      var e = l.length
      while (e > 0 && (l.charAt(e - 1) == ' ' || l.charAt(e - 1) == '\t')) e -= 1
      l.substring(0, e)
    }
    val out = new StringBuilder
    var blanks = 0
    trimmedLines.foreach { l =>
      if (l.isEmpty) blanks += 1
      else {
        if (out.nonEmpty) {
          out.append('\n')
          if (blanks > 0) out.append('\n')
        }
        blanks = 0
        out.append(l)
      }
    }
    if (out.isEmpty) "" else out.append('\n').toString
  }
}
