package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * Every timestamp column is normalized to `TimestampType` in the UTC
  * session timezone: the source parquet carries naive (isAdjustedToUTC=false)
  * microsecond timestamps which Spark 4 reads as TIMESTAMP_NTZ; casting with
  * a UTC session gives identical wall-clock instants to the DuckDB oracle's
  * naive TIMESTAMP semantics.
  *
  * At scale: each table is one parquet path; on a real cluster these would be
  * partitioned directories — the loaders take the directory, so nothing here
  * changes. Column pruning and filter pushdown happen at the scan because all
  * downstream operators are declarative DataFrame ops.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))

  def orders(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))

  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark cannot read natively
    * (PARQUET_TYPE_ILLEGAL); with `nanosAsLong` it arrives as a LongType of
    * epoch nanos and is truncated to microseconds exactly like DuckDB's
    * TIMESTAMP_NS→TIMESTAMP read, keeping oracle parity. Integer `DIV`, not
    * `/`: epoch-ns ≈ 1.7e18 exceeds double's 2^53 exact-integer range. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => timestamp_micros(expr("ts DIV 1000"))
      case _                                   => col("ts").cast("timestamp")
    }
    raw.withColumn("ts", ts)
  }

  /** Session shuffle parallelism — used to re-spread single-file scans
    * before CPU-heavy per-row array work. */
  def shufflePartitions(spark: SparkSession): Int =
    spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
