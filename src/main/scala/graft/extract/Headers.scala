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

  /** fontSize → heading level lookup for one turn. At most six header
    * sizes exist by construction, so the mapping is two tiny parallel
    * arrays probed linearly with doubleToLongBits equality — exactly
    * the boxed `Double.equals` identity the former `Map[Double, Int]`
    * used (NaN self-equal, -0.0 distinct from 0.0), without boxing a
    * Double per lookup on the emitter's per-block hot path.
    */
  final class HeaderLevels private[Headers] (
      private val bits: Array[Long], private val levels: Array[Int]) {
    def level(b: Block): Int = {
      if (b.kind != BlockKind.Pdf || b.isTableRow) return 0
      val k = java.lang.Double.doubleToLongBits(b.fontSize)
      var i = 0
      while (i < bits.length) {
        if (bits(i) == k) return levels(i)
        i += 1
      }
      0
    }
    /** Map form (specs / golden comparisons) */
    def toMap: Map[Double, Int] =
      bits.indices.map(i =>
        java.lang.Double.longBitsToDouble(bits(i)) -> levels(i)).toMap
  }

  private val EmptyLevels =
    new HeaderLevels(Array.emptyLongArray, Array.emptyIntArray)

  /** fontSize → heading level (1..6); sizes not mapped are body.
    *
    * Hot-path note: runs once per turn; a turn has a handful of
    * distinct sizes, so the histogram lives in two small parallel
    * arrays instead of a boxed-Double-keyed Map (which dominated this
    * phase's time with boxing and tuple churn). Size identity is
    * doubleToLongBits equality — exactly the boxed `Double.equals` the
    * Map used (NaN self-equal, -0.0 distinct from 0.0).
    */
  def identify(blocks: Seq[Block]): HeaderLevels = {
    // char-count histogram over PDF spans, table rows excluded
    // (find_tables regions are removed from the text flow before
    // header identification in pymupdf4llm)
    var sizes = new Array[Double](8)
    var counts = new Array[Long](8)
    var n = 0
    blocks.foreach { b =>
      if (b.kind == BlockKind.Pdf && !b.isTableRow && b.text.nonEmpty) {
        val fs = b.fontSize
        val bits = java.lang.Double.doubleToLongBits(fs)
        var i = 0
        var found = false
        while (i < n && !found) {
          if (java.lang.Double.doubleToLongBits(sizes(i)) == bits) {
            counts(i) += b.text.length
            found = true
          }
          i += 1
        }
        if (!found) {
          if (n == sizes.length) {
            sizes = java.util.Arrays.copyOf(sizes, n * 2)
            counts = java.util.Arrays.copyOf(counts, n * 2)
          }
          sizes(n) = fs
          counts(n) = b.text.length.toLong
          n += 1
        }
      }
    }
    if (n == 0) return EmptyLevels
    // body = most frequent size; tie-break: smaller size (body text is
    // the smaller of two equally-frequent sizes in practice)
    var body = sizes(0)
    var bodyCount = counts(0)
    var i = 1
    while (i < n) {
      if (counts(i) > bodyCount ||
        (counts(i) == bodyCount &&
          java.lang.Double.compare(sizes(i), body) < 0)) {
        body = sizes(i)
        bodyCount = counts(i)
      }
      i += 1
    }
    val above = java.util.Arrays.copyOf(sizes, n).filter(_ > body)
    if (above.isEmpty) return EmptyLevels
    java.util.Arrays.sort(above)
    // descending rank → level, capped at 6
    val bits = new Array[Long](above.length)
    val levels = new Array[Int](above.length)
    i = 0
    while (i < above.length) {
      bits(i) = java.lang.Double.doubleToLongBits(above(above.length - 1 - i))
      levels(i) = math.min(i + 1, 6)
      i += 1
    }
    new HeaderLevels(bits, levels)
  }
}
