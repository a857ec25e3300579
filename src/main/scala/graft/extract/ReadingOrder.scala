package graft.extract

/** C3 — reading-order reconstruction with multi-column detection
  * (SURVEY.md §2.2).
  *
  * Public semantics of pymupdf4llm's `multi_column.column_boxes`:
  * cluster blocks of a page into columns by x-interval overlap, then
  * read column-by-column (left to right), top-to-bottom within a
  * column. Input block order is arbitrary (the transcript payload may
  * serialize spans shuffled); output order is fully deterministic:
  * (page, column, y0, x0, seq).
  */
object ReadingOrder {

  /** Sort all blocks of one turn into reading order. */
  def order(blocks: Seq[Block]): Vector[Block] = {
    val (pdf, rest) = blocks.partition(_.kind == BlockKind.Pdf)
    // non-PDF blocks (HTML / plain) keep payload order and follow the
    // document flow — they never interleave with PDF pages in one turn
    // in practice, but a stable global rule is required: PDF pages
    // first (by page), then HTML/plain by seq.
    val orderedPdf = pdf.groupBy(_.page).toSeq.sortBy(_._1).flatMap {
      case (_, pageBlocks) => orderPage(pageBlocks)
    }
    (orderedPdf ++ rest.sortBy(_.seq)).toVector
  }

  /** Column clustering: merge overlapping [x0,x1] intervals into bins;
    * a block belongs to the bin containing its x0.
    */
  private[extract] def orderPage(blocks: Seq[Block]): Seq[Block] = {
    val intervals = mergeIntervals(blocks.map(b => (b.x0, b.x1)))
    def colOf(b: Block): Int = {
      val i = intervals.indexWhere(iv => b.x0 >= iv._1 && b.x0 <= iv._2)
      if (i < 0) intervals.length else i
    }
    blocks.sortBy(b => (colOf(b), b.y0, b.x0, b.seq))
  }

  private def mergeIntervals(ivs: Seq[(Double, Double)]): Vector[(Double, Double)] = {
    if (ivs.isEmpty) return Vector.empty
    val sorted = ivs.sorted
    val out = Vector.newBuilder[(Double, Double)]
    var (lo, hi) = sorted.head
    sorted.tail.foreach { case (a, b) =>
      if (a <= hi) { if (b > hi) hi = b }
      else { out += ((lo, hi)); lo = a; hi = b }
    }
    out += ((lo, hi))
    out.result()
  }
}
