package graft.bench

import graft.extract._
import graft.gen.TranscriptGen

/** Spark-free kernel microbenchmark: per-stage cost of the conversion
  * kernel over a generated turn mix. Run with
  * `sbt "runMain graft.bench.KernelBench"`.
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val payloads = (0L until 600L)
      .flatMap(i => TranscriptGen.genConv(42L, i)._1).map(_.text).toArray
    println(s"[kernel] ${payloads.length} turns, " +
      s"${payloads.map(_.length.toLong).sum / 1e6}%MB total")

    def time(tag: String, reps: Int)(f: String => Any): Unit = {
      (1 to 2).foreach(_ => payloads.foreach(f)) // warm
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => payloads.foreach(f))
      val us = (System.nanoTime() - t0) / 1e3 / (reps * payloads.length)
      println(f"[kernel] $tag%-18s $us%8.2f us/turn")
    }

    time("parse", 3)(BlockParser.parse)
    time("full extract", 3)(ExtractPipeline.extract)

    // isolated stages over pre-materialized blocks
    val parsed = payloads.map(BlockParser.parse)
    val headerMaps = parsed.map(Headers.identify)
    val ordered = parsed.map(ReadingOrder.order)
    val emitted = ordered.zip(headerMaps).map { case (o, h) =>
      MarkdownEmitter.emit(o, h)
    }
    def timeIdx(tag: String, reps: Int)(f: Int => Any): Unit = {
      (1 to 2).foreach(_ => parsed.indices.foreach(f))
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => parsed.indices.foreach(f))
      val us = (System.nanoTime() - t0) / 1e3 / (reps * parsed.length)
      println(f"[kernel] $tag%-18s $us%8.2f us/turn")
    }
    timeIdx("headers", 3)(i => Headers.identify(parsed(i)))
    timeIdx("order", 3)(i => ReadingOrder.order(parsed(i)))
    timeIdx("emit", 3)(i => MarkdownEmitter.emit(ordered(i), headerMaps(i)))
    timeIdx("lint-join", 3)(i => LintNormalize.normalizeJoin(emitted(i)))
    // the pipeline's real path: fused emit + lint + join in one pass
    timeIdx("emit-norm fused", 3)(i =>
      MarkdownEmitter.emitNormalized(ordered(i), headerMaps(i)))
  }
}
