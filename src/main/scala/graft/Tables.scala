package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver-provided star schema
  * (`/root/testdata/sf*`). One parquet file per table; schemas are fixed
  * (see TESTDATA.md). Reads stay declarative so Catalyst pushes filters
  * and prunes columns down to the parquet scan.
  *
  * Mirrors the reference's fixed ODM star schema idea
  * (reference: src/GAMUTRawData/odmdata/) — explicit schema, dims
  * small enough to broadcast, one large fact table.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Canonical read of `events.parquet`, normalizing `ts` to
    * session-zone TimestampType (micros) whatever the file encodes.
    * The driver has shipped this column three ways across data
    * generations — parquet TIMESTAMP(NANOS) (readable only as a raw
    * long under `spark.sql.legacy.parquet.nanosAsLong`, truncated here
    * to micros exactly as microsecond engines like DuckDB do),
    * timestamp[us] with isAdjustedToUTC=false (surfacing as
    * TIMESTAMP_NTZ), and plain TimestampType. The session zone is
    * pinned to UTC ([[Sessions.builder]]), so the NTZ→timestamp cast
    * preserves the wall-clock micros bit-for-bit and every downstream
    * consumer (windows, watermarks, epoch arithmetic) sees one type.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    normalizeTs(raw, raw.schema("ts").dataType)
  }

  /** The per-encoding `ts` normalization — ONE definition shared by
    * the batch loader above and the streaming twin
    * ([[graft.streaming.StreamingOps.eventsStream]]), so a future
    * encoding can't be handled in one and silently missed in the
    * other.
    */
  private[graft] def normalizeTs(df: DataFrame,
      onDisk: org.apache.spark.sql.types.DataType): DataFrame =
    onDisk match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
}
