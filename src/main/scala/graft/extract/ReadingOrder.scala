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

  /** Sort all blocks of one turn into reading order.
    *
    * Hot-path note: this runs once per turn inside the extraction
    * kernel (the bench's headline job). The implementation is
    * array-based — one pass to split PDF vs rest, one comparator sort
    * per group, page runs processed in place — because the previous
    * groupBy + tuple-keyed `sortBy` chain allocated a HashMap, key
    * tuples and boxed Double comparisons per turn and was the
    * kernel's single largest phase (~1/3). Ordering semantics are
    * IDENTICAL (golden gate + OrderSpec): PDF pages first ascending,
    * within a page by (column, y0, x0, seq) with IEEE Double.compare
    * (NaN-total like Ordering[Double]), then HTML/plain by seq.
    */
  def order(blocks: Seq[Block]): Vector[Block] = {
    var nPdf = 0
    blocks.foreach(b => if (b.kind == BlockKind.Pdf) nPdf += 1)
    val pdf = new Array[Block](nPdf)
    val rest = new Array[Block](blocks.size - nPdf)
    var pi = 0
    var ri = 0
    blocks.foreach { b =>
      if (b.kind == BlockKind.Pdf) { pdf(pi) = b; pi += 1 }
      else { rest(ri) = b; ri += 1 }
    }
    val out = Vector.newBuilder[Block]
    if (nPdf > 0) {
      // pre-sort by (page, seq): page runs become contiguous; the
      // within-page tie-break is irrelevant to the final order (the
      // per-page sort key is total) but keeps this sort deterministic
      java.util.Arrays.sort(pdf, (a: Block, b: Block) => {
        val c = Integer.compare(a.page, b.page)
        if (c != 0) c else Integer.compare(a.seq, b.seq)
      })
      var i = 0
      while (i < nPdf) {
        var j = i + 1
        while (j < nPdf && pdf(j).page == pdf(i).page) j += 1
        orderPageInPlace(pdf, i, j)
        var k = i
        while (k < j) { out += pdf(k); k += 1 }
        i = j
      }
    }
    java.util.Arrays.sort(rest,
      (a: Block, b: Block) => Integer.compare(a.seq, b.seq))
    rest.foreach(out += _)
    out.result()
  }

  /** Column clustering: merge overlapping [x0,x1] intervals into bins;
    * a block belongs to the bin containing its x0. (Spec entry point —
    * delegates to the in-place hot path.)
    */
  private[extract] def orderPage(blocks: Seq[Block]): Seq[Block] = {
    val a = blocks.toArray
    orderPageInPlace(a, 0, a.length)
    scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
  }

  /** sort a(from until until) into (column, y0, x0, seq) order */
  private def orderPageInPlace(a: Array[Block], from: Int, until: Int): Unit = {
    if (until - from <= 1) return
    val intervals = mergeIntervals(
      (from until until).map(k => (a(k).x0, a(k).x1)))
    val nIv = intervals.length
    def colOf(b: Block): Int = {
      var i = 0
      while (i < nIv) {
        if (b.x0 >= intervals(i)._1 && b.x0 <= intervals(i)._2) return i
        i += 1
      }
      nIv
    }
    // colOf inside the comparator: pages are a handful of blocks over
    // 1-3 merged intervals, so recomputing the linear probe per
    // comparison beats any per-block key materialization
    java.util.Arrays.sort(a, from, until, (p: Block, q: Block) => {
      var c = Integer.compare(colOf(p), colOf(q))
      if (c == 0) c = java.lang.Double.compare(p.y0, q.y0)
      if (c == 0) c = java.lang.Double.compare(p.x0, q.x0)
      if (c == 0) c = Integer.compare(p.seq, q.seq)
      c
    })
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
