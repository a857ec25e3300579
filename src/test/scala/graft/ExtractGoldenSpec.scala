package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract._
import graft.gen.TranscriptGen

/** Per-turn text equality of the extraction kernel vs the golden
  * renderer (FIXTURES.md §3) — the inverse-check core of the
  * north-rule correctness gate, here exercised Spark-free so failures
  * localize to the kernel.
  */
class ExtractGoldenSpec extends AnyFunSuite {

  test("kernel markdown equals golden for 100 seeded conversations") {
    var turns = 0
    var mismatches = 0
    (0L until 100L).foreach { convIdx =>
      val (ts, gs) = TranscriptGen.genConv(42L, convIdx)
      ts.zip(gs).foreach { case (t, g) =>
        turns += 1
        val got = ExtractPipeline.extract(t.text)
        if (got != g.markdown) {
          mismatches += 1
          if (mismatches <= 3) {
            info(s"MISMATCH conv=${t.conv_id} turn=${t.turn_idx} role=${t.role}")
            info("--- payload ---\n" + t.text.take(800))
            info("--- expected ---\n" + g.markdown.take(800))
            info("--- got ---\n" + got.take(800))
          }
        }
      }
    }
    assert(mismatches == 0, s"$mismatches of $turns turns mismatched")
    assert(turns > 500)
  }

  test("fused emitNormalized equals normalizeJoin(emit(...)) on 100 seeded conversations") {
    var turns = 0
    (0L until 100L).foreach { convIdx =>
      val (ts, _) = TranscriptGen.genConv(1042L, convIdx)
      ts.foreach { t =>
        val blocks = BlockParser.parse(t.text)
        if (blocks.nonEmpty) {
          turns += 1
          val hm = Headers.identify(blocks)
          val ordered = ReadingOrder.order(blocks)
          val viaElements =
            LintNormalize.normalizeJoin(MarkdownEmitter.emit(ordered, hm))
          val fused = MarkdownEmitter.emitNormalized(ordered, hm)
          assert(fused == viaElements,
            s"fused/element divergence conv=${t.conv_id} turn=${t.turn_idx}")
        }
      }
    }
    assert(turns > 500)
  }

  test("'P'-prefixed prose without tabs stays Plain (bounded field scans)") {
    // regression guard for the in-place parser: a tab-free line
    // starting with 'P' must degrade to Plain without scanning beyond
    // its own end (the unbounded-indexOf form was O(payload) per line)
    val payload = "Please note there are no tabs here\n" +
      "P6 looks like a header but is prose\n" +
      "P0\t1,2,3,4\t10\t0\treal pdf line"
    val blocks = BlockParser.parse(payload)
    assert(blocks.map(_.kind) ==
      Vector(BlockKind.Plain, BlockKind.Plain, BlockKind.Pdf))
    assert(blocks(0).text == "Please note there are no tabs here")
  }

  test("plain single-line text passes through as one paragraph") {
    assert(ExtractPipeline.extract("hello world") == "hello world\n")
  }

  test("empty payload yields empty markdown") {
    assert(ExtractPipeline.extract("") == "")
  }

  test("error capture never throws") {
    val (s, _, _) = ExtractPipeline.extractSafe(null)
    assert(s == "err")
  }

  test("null and empty payloads report the intended 'empty input' error") {
    assert(ExtractPipeline.extractSafe(null) == ("err", "", "empty input"))
    assert(ExtractPipeline.extractSafe("") == ("err", "", "empty input"))
  }

  test("lint normalize collapses blank runs and trailing space") {
    assert(LintNormalize.normalize("a  \n\n\n\nb\n\n") == "a\n\nb\n")
  }

  test("lint normalize leaves fenced code interiors verbatim (MD012/MD009 exemption)") {
    val md = "a\n\n```\ncode  \n\n\nmore\n```\n\nb"
    assert(LintNormalize.normalize(md) == "a\n\n```\ncode  \n\n\nmore\n```\n\nb\n")
  }

  test("mixed-kind turn: page separator closes the PDF page before trailing plain text") {
    val payload = "P0\t50,50,490,62\t10\t0\tpdf body text here\n" +
      "this line is malformed plain text"
    val md = ExtractPipeline.extract(payload)
    assert(md == "pdf body text here\n\n-----\n\nthis line is malformed plain text\n")
  }

  test("coordinate parsing equals Double.parseDouble across shapes (fast path + fallbacks)") {
    // the parser's fast decimal path must be bit-identical to
    // parseDouble; exotic shapes must fall back to it (or degrade the
    // line to Plain exactly as the strict parse always did)
    val coords = Seq("72.0", "614.3", "0", "-0.0", "3", "-17.25", ".5",
      "-.5", "1.", "007", "123456789012345.5", "12345678901234567.5",
      "1e3", "1E-2", "Infinity", "-Infinity", "NaN", "0x1.8p1", " 1.5")
    coords.foreach { c =>
      val line = s"P0\t$c,$c,$c,$c\t$c\t0\tpayload"
      val parsed = BlockParser.parse(line)
      assert(parsed.size == 1)
      val b = parsed.head
      val expectOk = try { java.lang.Double.parseDouble(c); true }
        catch { case _: NumberFormatException => false }
      if (expectOk) {
        assert(b.kind == BlockKind.Pdf, s"'$c' should parse as PDF")
        val e = java.lang.Double.parseDouble(c)
        assert(java.lang.Double.doubleToLongBits(b.x0) ==
          java.lang.Double.doubleToLongBits(e), s"x0 for '$c'")
        assert(java.lang.Double.doubleToLongBits(b.fontSize) ==
          java.lang.Double.doubleToLongBits(e), s"fontSize for '$c'")
      } else assert(b.kind == BlockKind.Plain, s"'$c' should degrade to Plain")
    }
  }

  test("header histogram ranks sizes above body descending") {
    val blocks = Vector(
      Block(BlockKind.Pdf, 0, 0, 0, 0, 0, 10.0, 0, "", 0, "x" * 100, 0),
      Block(BlockKind.Pdf, 0, 0, 0, 0, 0, 18.0, 0, "", 0, "t1", 1),
      Block(BlockKind.Pdf, 0, 0, 0, 0, 0, 14.0, 0, "", 0, "t2", 2))
    val m = Headers.identify(blocks)
    assert(m.toMap == Map(18.0 -> 1, 14.0 -> 2))
  }

  test("reading order: two columns read left column first") {
    def b(x0: Double, y0: Double, seq: Int, t: String) =
      Block(BlockKind.Pdf, 0, x0, y0, x0 + 100, y0 + 10, 10.0, 0, "", 0, t, seq)
    val blocks = Vector(b(300, 50, 0, "R1"), b(50, 60, 1, "L2"),
      b(50, 50, 2, "L1"), b(300, 60, 3, "R2"))
    val ordered = ReadingOrder.order(blocks).map(_.text)
    assert(ordered == Vector("L1", "L2", "R1", "R2"))
  }

  test("boilerplate: nav/footer and link-dense blocks are dropped") {
    def h(path: String, lc: Int, t: String) =
      Block(BlockKind.Html, 0, 0, 0, 0, 0, 0, 0, path, lc, t, 0)
    assert(Boilerplate.isBoilerplate(h("body/nav/a", 20, "home docs api blog")))
    assert(Boilerplate.isBoilerplate(h("body/div/a", 40, "a" * 60)))
    assert(!Boilerplate.isBoilerplate(h("body/article/p", 0, "real content here")))
  }
}
