package graft.bench

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the exact n-gram Jaccard join (the suite's
  * most expensive query and the one that inflated 8.7x under host
  * contention in round 3 while the suite median inflated ~3x). Prints
  * per-stage wall/CPU/shuffle/spill so the "is it the exchange or the
  * double kernel pass?" question is answered by measurement:
  *
  *   sbt "runMain graft.bench.NgramProfile /root/testdata/sf0.1"
  *
  * MEASURED (sf0.1, local[32], two windows): wall 2.2-2.3 s; total
  * shuffle 22 MB, spill 0.0 MB — the exchanges are trivially small, so
  * the contended-window inflation is NOT a shuffle/spill pathology.
  * The cost is ~37 s of aggregate task run-time concentrated in five
  * 32-task CPU stages: the two shingle-kernel passes (~11 s — the
  * documented trade against persisting the UNCAPPED exploded index,
  * which at corpus scale is the real anti-pattern), the persisted
  * capped-index consumers (~11 s), and the candidate join + pair agg
  * (~9 s), at cpu/run 0.43-0.62. With ~12x the suite-median CPU demand
  * and ~5 heavy stage barriers, halving the host's effective cores
  * inflates this query proportionally more than any other — that is
  * the whole 8.7x story. Sharing one persisted projection would shave
  * ~13% of task time at bench scale while adding a corpus-sized cache
  * at 100 TB; rejected with data. The banded sketch-then-verify
  * variant (0.7 s) remains the declared production path.
  */
object NgramProfile {

  final case class StageRow(id: Int, name: String, tasks: Int,
      runMs: Long, cpuMs: Long, shufWriteMb: Double, shufReadMb: Double,
      memSpillMb: Double, diskSpillMb: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = scala.collection.mutable.ArrayBuffer[StageRow]()
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        stages.synchronized(stages += StageRow(e.stageInfo.stageId,
          e.stageInfo.name.takeWhile(_ != '\n').take(60),
          e.stageInfo.numTasks,
          m.executorRunTime, m.executorCpuTime / 1000000,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          (m.shuffleReadMetrics.localBytesRead +
            m.shuffleReadMetrics.remoteBytesRead) / 1e6,
          m.memoryBytesSpilled / 1e6, m.diskBytesSpilled / 1e6))
      }
    }

    def run(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("ngram_jaccard")(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    run(); run() // warm: plan + codegen + JIT
    spark.sparkContext.addSparkListener(listener)
    val wall = run()
    // stage-completed events arrive on the async listener-bus thread —
    // count() returning does NOT mean the final (heaviest) stage's
    // event was delivered. Poll until the table stops growing before
    // detaching, or the totals under-count nondeterministically.
    var last = -1; var stable = 0
    while (stable < 6) { // 300 ms of no growth
      val n = stages.synchronized(stages.size)
      if (n == last) stable += 1 else { stable = 0; last = n }
      Thread.sleep(50)
    }
    spark.sparkContext.removeSparkListener(listener)
    val snap = stages.synchronized(stages.toVector)

    println(f"\n[ngram] wall ${wall}%.2f s at local[$cpus], $sfDir")
    println(f"[ngram] ${"stage"}%-62s ${"tasks"}%5s ${"run_ms"}%8s ${"cpu_ms"}%8s ${"shW_MB"}%7s ${"shR_MB"}%7s ${"spill_MB"}%8s")
    snap.sortBy(_.id).foreach { s =>
      println(f"[ngram] ${s.id}%3d ${s.name}%-58s ${s.tasks}%5d ${s.runMs}%8d ${s.cpuMs}%8d ${s.shufWriteMb}%7.1f ${s.shufReadMb}%7.1f ${s.memSpillMb + s.diskSpillMb}%8.1f")
    }
    val totRun = snap.map(_.runMs).sum
    val totCpu = snap.map(_.cpuMs).sum
    println(f"[ngram] total task run ${totRun / 1000.0}%.2f s, cpu ${totCpu / 1000.0}%.2f s, " +
      f"cpu/run ${totCpu.toDouble / totRun}%.2f (low ratio = scheduler/IO wait, " +
      "the contention-sensitivity signal)")
    println(f"[ngram] shuffle write ${snap.map(_.shufWriteMb).sum}%.1f MB, " +
      f"read ${snap.map(_.shufReadMb).sum}%.1f MB, " +
      f"spill ${snap.map(s => s.memSpillMb + s.diskSpillMb).sum}%.1f MB")
    spark.stop()
  }
}
