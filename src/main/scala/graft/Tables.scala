package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-generated parquet corpus (TESTDATA.md).
  *
  * All operators take `dir` (a scale-factor directory such as
  * /root/testdata/sf0.01) and read one parquet file per table. Filters and
  * projections applied by callers push down into the parquet scan via
  * Catalyst, so reading "the whole table" here is free — only the needed
  * columns/row-groups are materialized.
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
  /** events.parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects; read nanos as long and convert to a
    * microsecond timestamp (the data carries no sub-µs precision, so
    * this is lossless and matches DuckDB's TIMESTAMP_NS semantics). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // `div` (integer division) — `/` is double division and int64 nanos
    // exceed a double's 53-bit mantissa, which can shift boundary values
    // by 1µs after the truncating cast.
    table(s, d, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
