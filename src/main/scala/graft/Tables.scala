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

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * cannot represent natively (TimestampType is microseconds). Read the
    * raw nanos as a long and truncate to microseconds — identical to what
    * microsecond-based engines (e.g. DuckDB) do on read.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, set once at
    * session construction (see [[Sessions.builder]], Verify, Bench, and
    * the test harness) — NOT flipped here, so building this frame has no
    * session-wide side effects and no read-order dependence.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
}
