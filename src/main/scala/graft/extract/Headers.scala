package graft.extract

/** C2 — header identification via font-size histogram (SURVEY.md §2.2).
  *
  * Reimplements the public semantics of pymupdf4llm 0.0.27's
  * `IdentifyHeaders` (the library pinned by the reference at
  * /root/reference/uv.lock:2123-2131 and invoked from
  * /root/reference/src/pdf_extractor/converter.py:218): build a
  * histogram of span font sizes weighted by character count; the most
  * frequent size is body text; every strictly-larger size is ranked
  * descending and mapped to heading levels `#`..`######`.
  *
  * Scope note (SURVEY.md §7.4): the reference computes the histogram per
  * *document*; in the transcript table each turn embeds one document, so
  * the histogram is per turn and computed kernel-locally — zero shuffle.
  */
object Headers {

  /** fontSize → heading level (1..6); sizes not in the map are body. */
  def identify(blocks: Seq[Block]): Map[Double, Int] = {
    // char-count histogram over PDF spans, table rows excluded
    // (find_tables regions are removed from the text flow before
    // header identification in pymupdf4llm)
    val hist = collection.mutable.Map.empty[Double, Long]
    blocks.foreach { b =>
      if (b.kind == BlockKind.Pdf && !b.isTableRow && b.text.nonEmpty)
        hist(b.fontSize) = hist.getOrElse(b.fontSize, 0L) + b.text.length
    }
    if (hist.isEmpty) return Map.empty
    // body = most frequent size; tie-break: smaller size (body text is
    // the smaller of two equally-frequent sizes in practice)
    val body = hist.toSeq.minBy { case (sz, n) => (-n, sz) }._1
    hist.keys.filter(_ > body).toSeq.sorted(Ordering[Double].reverse)
      .zipWithIndex
      .map { case (sz, i) => sz -> math.min(i + 1, 6) }
      .toMap
  }

  def level(headerMap: Map[Double, Int], b: Block): Int =
    if (b.kind == BlockKind.Pdf && !b.isTableRow)
      headerMap.getOrElse(b.fontSize, 0)
    else 0
}
