package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.multimodal.{Codecs, Multimodal}

/** The real codecs: hand-built reference bytes decoded byte-for-byte
  * (so encoder and decoder can't share a wrong convention), format
  * quirks (PPM comments, BMP padding/bottom-up/BGR/top-down),
  * totality on garbage, a roundtrip property, and the Spark-side
  * decode operators over genuinely encoded payloads.
  */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // 2x2 reference image, row-major top-down RGB:
  //   (255,0,0) (0,255,0)
  //   (0,0,255) (9,8,7)
  private val refRgb: Array[Byte] = Array(
    255, 0, 0, 0, 255, 0,
    0, 0, 255, 9, 8, 7).map(_.toByte)

  test("PPM P6: hand-built header (with comment) decodes byte-for-byte") {
    // header written BY HAND, not by encodePpm — decoding it proves
    // the parser, not a shared convention
    val header = "P6\n# a comment\n2 2\n# another\n255\n".getBytes("US-ASCII")
    val bytes = header ++ refRgb
    val img = Codecs.decode(bytes).get
    assert(img.codec == "ppm" && img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq == refRgb.toSeq)
  }

  test("BMP: hand-built bottom-up BGR padded bytes decode byte-for-byte") {
    // stride for w=2 is 8 (2 bytes padding); file rows BOTTOM-UP and
    // BGR — the file's first pixel row is the IMAGE'S LAST row
    val out = new Array[Byte](54 + 16)
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, out.length); putLe32(10, 54); putLe32(14, 40)
    putLe32(18, 2); putLe32(22, 2); out(26) = 1; out(28) = 24
    // file row 0 = image row 1: (0,0,255)->BGR FF 00 00, (9,8,7)->07 08 09
    val fileRows = Array(
      255, 0, 0, 7, 8, 9, 0, 0, // pad
      0, 0, 255, 0, 255, 0, 0, 0).map(_.toByte)
    System.arraycopy(fileRows, 0, out, 54, 16)
    val img = Codecs.decode(out).get
    assert(img.codec == "bmp" && img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq == refRgb.toSeq)
  }

  test("BMP: negative height = top-down row order") {
    val bottomUp = Codecs.encodeBmp(2, 2, refRgb)
    // flip to top-down: negate height, reverse the two 8-byte rows
    val topDown = bottomUp.clone()
    val hNeg = -2
    topDown(22) = hNeg.toByte; topDown(23) = (hNeg >> 8).toByte
    topDown(24) = (hNeg >> 16).toByte; topDown(25) = (hNeg >> 24).toByte
    System.arraycopy(bottomUp, 54 + 8, topDown, 54, 8)
    System.arraycopy(bottomUp, 54, topDown, 54 + 8, 8)
    assert(Codecs.decode(topDown).get.pixels.toSeq == refRgb.toSeq)
  }

  test("decode is total: garbage, truncation, bad fields -> None") {
    assert(Codecs.decode(null).isEmpty)
    assert(Codecs.decode(Array.empty[Byte]).isEmpty)
    assert(Codecs.decode("not an image at all".getBytes).isEmpty)
    // valid magic, truncated pixel data
    assert(Codecs.decode(Codecs.encodePpm(2, 2, refRgb).dropRight(1)).isEmpty)
    assert(Codecs.decode(Codecs.encodeBmp(2, 2, refRgb).dropRight(9)).isEmpty)
    // PPM maxval > 255 (2-byte samples) is out of scope, not misread
    assert(Codecs.decode("P6\n2 2\n65535\n".getBytes ++ refRgb ++ refRgb).isEmpty)
    // BMP with 32bpp or RLE compression is out of scope
    val b32 = Codecs.encodeBmp(2, 2, refRgb); b32(28) = 32
    assert(Codecs.decode(b32).isEmpty)
    val rle = Codecs.encodeBmp(2, 2, refRgb); rle(30) = 1
    assert(Codecs.decode(rle).isEmpty)
    // absurd dimensions refuse to allocate
    val big = Codecs.encodePpm(2, 2, refRgb)
    val huge = ("P6\n100000 100000\n255\n".getBytes("US-ASCII")) ++ big
    assert(Codecs.decode(huge).isEmpty)
  }

  test("roundtrip property: decode(encode(img)) == img for both codecs") {
    val gen = for {
      w <- Gen.choose(1, 11)
      h <- Gen.choose(1, 7)
      pixels <- Gen.listOfN(w * h * 3, Gen.choose(0, 255))
    } yield (w, h, pixels.map(_.toByte).toArray)
    val prop = Prop.forAll(gen) { case (w, h, rgb) =>
      val p = Codecs.decode(Codecs.encodePpm(w, h, rgb)).get
      val b = Codecs.decode(Codecs.encodeBmp(w, h, rgb)).get
      (p.codec, p.width, p.height) == (("ppm", w, h)) &&
        p.pixels.toSeq == rgb.toSeq &&
        (b.codec, b.width, b.height) == (("bmp", w, h)) &&
        b.pixels.toSeq == rgb.toSeq
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("decodeMeta: real formats report parsed dims, others the stub") {
    import spark.implicits._
    val ppm = Codecs.encodePpm(2, 2, refRgb)
    val bmp = Codecs.encodeBmp(2, 2, refRgb)
    // NOTE: a string column would mangle high bytes through the
    // UTF-8 binary cast — real payloads ride a BINARY column, which
    // is exactly the multimodal-column contract
    val binRows = Seq((1L, ppm), (2L, bmp),
      (3L, "plain text payload".getBytes("UTF-8"))).toDF("doc_id", "text")
    val metas = Multimodal.decodeMeta(binRows).collect()
      .map(m => m.doc_id -> m).toMap
    assert(metas(1L).codec == "ppm" && metas(1L).width == 2 && metas(1L).height == 2)
    assert(metas(2L).codec == "bmp" && metas(2L).width == 2 && metas(2L).height == 2)
    assert(metas(3L).codec == "stub")
    assert(metas(1L).n_frames == 1 && metas(1L).frame_offsets == Seq(0))
  }

  test("decodeImage over syntheticImages matches the generating formula") {
    import spark.implicits._
    val docs = (0L until 40L).toDF("doc_id")
    for (fmt <- Seq("ppm", "bmp")) {
      val stats = Multimodal.decodeImage(Multimodal.syntheticImages(docs, fmt))
        .collect().map(s => s.doc_id -> s).toMap
      assert(stats.size == 40)
      for (id <- 0L until 40L) {
        val w = (4 + id % 5).toInt; val h = (3 + id % 3).toInt
        val s = stats(id)
        assert(s.codec == fmt && s.width == w && s.height == h)
        def sumC(c: Int) =
          (0 until w * h).map(j => (id + j * 3 + c) % 256).sum
        assert((s.sum_r, s.sum_g, s.sum_b) == ((sumC(0), sumC(1), sumC(2))),
          s"channel sums wrong for id=$id fmt=$fmt")
      }
    }
  }
}
