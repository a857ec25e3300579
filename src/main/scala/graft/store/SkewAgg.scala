package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-stage aggregation: salt the hot key, partially
  * aggregate per (key, salt), then combine. For a corpus where 1% of
  * conversations carry 50× the median turns (FIXTURES.md §1), a
  * single-stage `groupBy(conv_id)` puts a whole hot conversation in
  * one reducer; salting bounds any reducer's share to 1/salt of it.
  *
  * (Spark's map-side partial aggregation already covers sums/counts;
  * this operator exists for aggregates where partials are large —
  * collect-style — or when AQE skew handling is unavailable. It is the
  * explicit form of the SURVEY §4 salting decision.)
  */
object SkewAgg {

  /** Σ value per key, salted. Exactly equal to
    * `df.groupBy(key).agg(sum, count)` — associative combine.
    */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
      salt: Int = 16): DataFrame = {
    // salt must be DETERMINISTIC per row: with
    // monotonically_increasing_id() a retried/speculated task would
    // re-salt rows differently than the partials other reducers
    // already fetched (SPARK-23207 class) and silently corrupt totals.
    // Hashing (key, value) alone degenerates when the hot key's value
    // column has low cardinality (every ("hot", 1) row lands in ONE
    // bucket — the very skew being mitigated), so the input partition
    // id is mixed in: it is stable under task retry (a re-run recomputes
    // the same split) and spreads identical rows across buckets.
    // Residual limit: low-cardinality values WITHIN one input partition
    // still share a bucket, which is bounded by partition size, not key
    // frequency.
    val salted = df.withColumn("_salt",
      pmod(xxhash64(col(keyCol).cast("string"), col(valueCol).cast("string"),
        spark_partition_id()), lit(salt.toLong)))
    salted.groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).as("total"), sum(col("_pcnt")).as("n"))
  }
}
