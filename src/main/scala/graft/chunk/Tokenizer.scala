package graft.chunk

import java.util.regex.Pattern

/** Deterministic surrogate tokenizer (SURVEY.md §7.4).
  *
  * The reference counts tokens with tiktoken `cl100k_base`
  * (/root/reference/src/rag_engine/chunking.py:37); no JVM build of
  * that BPE exists in this offline sandbox, so the token basis is a
  * documented substitute — word-or-punct tokens:
  *
  *     [A-Za-z0-9]+ | single non-space non-alnum char
  *
  * chosen to be expressible identically in Spark
  * (`regexp_extract_all`) and DuckDB (oracle side), so token counts
  * stay SQL-checkable. The *operator semantics* that depend on it
  * (split-over-budget at sentence boundary) are unchanged.
  */
object Tokenizer {

  /** Shared with SparkEntry oracles — keep in sync with any SQL use. */
  val TokenRegex = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"

  private val P = Pattern.compile(TokenRegex)

  final case class Token(text: String, start: Int, end: Int)

  def tokenize(text: String): Vector[Token] = {
    if (text == null || text.isEmpty) return Vector.empty
    val m = P.matcher(text)
    val out = Vector.newBuilder[Token]
    while (m.find()) out += Token(m.group(), m.start(), m.end())
    out.result()
  }

  def count(text: String): Int = {
    if (text == null || text.isEmpty) return 0
    val m = P.matcher(text)
    var n = 0
    while (m.find()) n += 1
    n
  }
}
