package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Partition-layout determinism sweep: every registered query must
  * produce the SAME row multiset when the scan splits and shuffle
  * partitioning change. This is the suite-wide check of a claim the
  * operators make individually (integer-micro money instead of float
  * sums, hash-threshold sampling instead of df.sample, rank-pick
  * medians, seeded hyperplanes): at 100 TB the partition layout is
  * never the same twice — input files compact, AQE coalesces, skew
  * splits — so any result that depends on it is a latent flaky
  * production diff, even if today's single-layout oracle gate passes.
  *
  * The kmeans/PQ family is INCLUDED: its training sample is
  * xxhash64-ordered TakeOrdered with a key tiebreak (AnnIvf/AnnPq),
  * which is layout-invariant, so the trained centroids/codebooks must
  * be too (centroid caches are cleared between layouts so training
  * genuinely re-runs).
  */
class DeterminismSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  private def canonAll(names: Seq[String]): Map[String, Seq[String]] =
    names.map { n =>
      n -> SparkEntry.queries(n)(spark, sf).collect()
        .map(_.toString).sorted.toSeq
    }.toMap

  test("every query is invariant to scan splits and shuffle partitioning") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // layout A: many tiny scan splits, small odd shuffle count
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "131072")
    graft.rag.AnnIvf.clearCentroidCache()
    val a = canonAll(names)
    // layout B: default-sized splits, different shuffle count
    spark.conf.set("spark.sql.shuffle.partitions", "17")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
    graft.rag.AnnIvf.clearCentroidCache()
    val b = canonAll(names)
    val diff = names.filter(n => a(n) != b(n))
    assert(diff.isEmpty, s"partition-layout-dependent queries: $diff")
  }
}
