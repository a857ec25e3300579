package graft.store

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table-layer isolation (SURVEY.md §7.1): the north star stores
  * transcripts/chunks/manifest in Iceberg; this sandbox ships no
  * Iceberg runtime, so the contract the engine actually uses —
  * partition-scoped idempotent overwrite, append, snapshot-free
  * truncate — is behind this trait. An Iceberg-backed implementation
  * (`MERGE INTO` / `DELETE FROM` / snapshot rollback) drops in without
  * touching any operator.
  */
trait TranscriptStore {
  def read(spark: SparkSession, table: String): DataFrame
  def append(df: DataFrame, table: String): Unit
  /** overwrite only the partitions present in `df` (dynamic). */
  def overwritePartitions(df: DataFrame, table: String, partitionCol: String): Unit
  def truncate(spark: SparkSession, table: String): Unit
}

/** Partitioned-parquet realization (what this sandbox runs). */
object ParquetStore extends TranscriptStore {

  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(table)

  override def append(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Append).parquet(table)

  override def overwritePartitions(df: DataFrame, table: String,
      partitionCol: String): Unit = {
    df.sparkSession.conf
      .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(table)
  }

  override def truncate(spark: SparkSession, table: String): Unit = {
    val schema = spark.read.parquet(table).schema
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      .write.mode(SaveMode.Overwrite).parquet(table)
  }
}
