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

  /** Round-robin spread for a HEAVY map-side kernel (per-token md5,
    * shingle hashing, per-word DP) placed before the first exchange.
    *
    * The test corpus ships each table as ONE single-row-group parquet
    * file, so its scan is one task and a compute-bound kernel fused
    * into the scan stage runs on one core of the whole cluster. When
    * the table's byte footprint cannot fill the cluster parallelism at
    * the normal split size (bytes / maxPartitionBytes < parallelism),
    * repartition the kernel's input to parallelism first: the
    * shuffled bytes are < parallelism · maxPartitionBytes BY THE GATE,
    * so the added exchange is bounded and cheap next to the kernel it
    * parallelizes. At production scale the scan itself yields ≥
    * parallelism splits, the gate is false, and this is the IDENTITY —
    * no shuffle is added at 100 TB (guide §2.2: derive partitioning
    * from input size; never tune a constant for local mode). */
  def spreadKernel(s: SparkSession, d: String, name: String)(
      df: DataFrame): DataFrame = {
    // Hadoop FS content summary, not java.io.File: on object storage
    // (s3://, hdfs://) a local-File probe stats nothing, reads 0 bytes,
    // and would take the repartition branch — a full extra shuffle of
    // a 100 TB corpus. getContentSummary is scheme-agnostic and
    // recursive (nested layouts sum correctly). On any failure fall
    // back to "huge", i.e. the at-scale identity: never add a shuffle
    // because the probe failed.
    val bytes = try {
      val p = new org.apache.hadoop.fs.Path(s"$d/$name.parquet")
      p.getFileSystem(s.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength
    } catch { case scala.util.control.NonFatal(_) => Long.MaxValue }
    val maxSplit = s.sessionState.conf.filesMaxPartitionBytes
    val par = s.sparkContext.defaultParallelism
    if (bytes / math.max(1L, maxSplit) < par) df.repartition(par) else df
  }

  /** The eager-materialization idiom for ops whose RESULT is tiny by
    * construction but whose plan pins caches (the simAnnIvfIndex
    * pattern): collect the rows, release every cache, and hand back a
    * local relation — so the returned frame holds no lineage over
    * frames the op unpersisted (or files it is about to delete). Only
    * for provably result-bounded ops: queries×k serves, catalog
    * rollups, fixed-level sweeps. */
  private[graft] def materializeAndRelease(
      out: DataFrame, caches: DataFrame*): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = out.collect().toSeq
    caches.foreach(_.unpersist())
    out.sparkSession.createDataFrame(rows.asJava, out.schema)
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** Normalize the events `ts` column to a session-tz TimestampType
    * regardless of the parquet physical type on disk. The testdata
    * generator has shipped `ts` as INT64 TIMESTAMP(NANOS) in some
    * rounds and plain timestamp[us] in others, so the loader adapts
    * to the schema it actually reads instead of assuming one:
    *  - LongType (nanos surfaced via nanosAsLong): integer-divide to
    *    µs — `div`, not `/`, because int64 nanos exceed a double's
    *    53-bit mantissa and float division can shift boundary values
    *    by 1µs after the truncating cast.
    *  - TimestampNTZType (timestamp[us] with isAdjustedToUTC=false):
    *    cast to TimestampType — identity-valued because every graft
    *    entry point pins spark.sql.session.timeZone=UTC.
    *  - TimestampType: pass through.
    * Works on batch and streaming DataFrames alike (schema inspection
    * only), so the Structured Streaming readers share it too.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType           => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType   => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                  => df
    }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    // harmless when ts is already a timestamp; required to read the
    // INT64-nanos variant at all (Spark rejects TIMESTAMP(NANOS)).
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** THE streaming table reader — layout-adaptive (round-16 advice):
    * `<dir>/<name>.parquet` is a single FILE in the driver testdata
    * but a DIRECTORY of part files when Spark wrote it, and
    * FileStreamSource requires its basePath to be a directory while a
    * leaf-name pathGlobFilter matches zero part files in the directory
    * layout. One site decides: stream the directory directly, or the
    * parent filtered to the leaf name. */
  def streamTable(s: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = s.read.parquet(path).schema
    val hPath = new org.apache.hadoop.fs.Path(path)
    val isDir = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      .getFileStatus(hPath).isDirectory
    if (isDir) s.readStream.schema(schema).parquet(path)
    else s.readStream.schema(schema)
      .option("pathGlobFilter", hPath.getName).parquet(dir)
  }
}
