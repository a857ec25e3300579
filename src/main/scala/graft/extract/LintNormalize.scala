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
