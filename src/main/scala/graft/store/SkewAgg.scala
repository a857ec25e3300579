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
    *
    * The salt is a pure function of ROW CONTENT (xxhash64 over every
    * column), never of physical placement: spark_partition_id() or
    * monotonically_increasing_id() would re-salt rows differently when
    * a retried/speculated upstream task re-distributes them (after a
    * round-robin repartition or any nondeterministic shuffle), so some
    * reducers would fetch partials salted one way and others another —
    * the SPARK-23207 silent-corruption class. A content hash is
    * invariant under any re-partitioning, so retries always reproduce
    * the same salt. Residual limit: byte-identical duplicate rows share
    * a bucket — a hot key whose rows are exact duplicates still lands
    * on one reducer. Callers with that shape should include a
    * distinguishing column (an event id, an offset) in the frame; any
    * column that varies across the hot key's rows restores the spread.
    */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
      salt: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(df.columns.map(c => col(c).cast("string")).toIndexedSeq: _*),
        lit(salt.toLong)))
    salted.groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).as("total"), sum(col("_pcnt")).as("n"))
  }
}
