package graft.rag

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate nearest neighbour via random-hyperplane LSH (public
  * algorithm: Charikar, STOC 2002 — SimHash family).
  *
  * Scale path for V4 at 100 TB: brute-force top-k scans everything;
  * bucketing by the sign pattern of `NumPlanes` fixed hyperplanes cuts
  * the candidate set to ~1/2^p of the corpus per probe. The bucket id
  * is a plain integer column → the bucket filter is a pushdown-able
  * predicate, and a bucket-partitioned layout turns a query into a
  * single-partition scan.
  *
  * Hyperplanes are deterministic (splitmix64 of (plane, dim)) and
  * shared verbatim with the DuckDB oracle (sqlPlaneLiteral).
  */
object AnnLsh {

  val NumPlanes = 8
  val Dim = 64

  /** splitmix64 → double in [-1, 1), rounded to 4 decimals so the
    * constant survives any decimal round-trip identically.
    */
  lazy val planes: Array[Array[Double]] = {
    Array.tabulate(NumPlanes, Dim) { (p, d) =>
      var z = (p.toLong * Dim + d) + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      val u = (z >>> 11).toDouble / (1L << 53).toDouble // [0,1)
      math.rint((u * 2 - 1) * 10000) / 10000
    }
  }

  /** bucket = Σ_p [dot(plane_p, v) > 0] · 2^p */
  def bucketCol(emb: Column): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      when(Similarity.dot(typedLit(plane.toSeq), emb) > 0.0, 1 << p)
        .otherwise(0)
    }.reduce(_ + _)

  def bucketOf(v: Array[Double]): Int =
    planes.zipWithIndex.map { case (plane, p) =>
      val d = plane.zip(v).map { case (a, b) => a * b }
        .foldLeft(0.0)(_ + _)
      if (d > 0.0) 1 << p else 0
    }.sum

  /** LSH-restricted top-k: same contract as TopK.search but only the
    * query's bucket is scanned.
    */
  def search(chunks: DataFrame, queryVec: Array[Double], k: Int,
      embeddingCol: String = "embedding", keyCol: String = "vec_id"): DataFrame =
    TopK.search(
      chunks.filter(bucketCol(col(embeddingCol)) === bucketOf(queryVec)),
      queryVec, k, embeddingCol, keyCol)

  // ---- oracle support ----

  def sqlPlaneLiteral(p: Int): String =
    planes(p).mkString("[", ", ", "]::DOUBLE[]")

  /** DuckDB expression computing the same bucket for column `v`
    * (a DOUBLE[] expression).
    */
  def sqlBucketExpr(v: String): String =
    (0 until NumPlanes).map { p =>
      s"(CASE WHEN list_reduce(list_transform(list_zip(${sqlPlaneLiteral(p)}, $v), x -> x[1]*x[2]), (a,b) -> a+b) > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
