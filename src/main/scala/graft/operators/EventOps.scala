package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream operators over the `events` table: tumbling-window
  * aggregation, JSON property extraction, gap-based sessionization,
  * and the same window aggregation executed as a Structured Streaming
  * query (file source → watermark → windowed agg → memory sink).
  *
  * Batch and streaming share semantics, so one DuckDB oracle checks
  * both: the streaming variant must produce exactly the batch answer
  * once the source is exhausted.
  */
object EventOps {

  /** Tumbling 1-hour window: count + decimal-exact sum per type. */
  def evWindowAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(DecimalType(18, 4))).as("sum_value"))
      .select($"w.start".as("w_start"), $"event_type", $"n", $"sum_value")
      .orderBy($"w_start", $"event_type")
  }
  val evWindowAggSql: String =
    """SELECT date_trunc('hour', ts) AS w_start, event_type,
      |  count(*) AS n,
      |  sum(CAST(value AS DECIMAL(18,4))) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY w_start, event_type""".stripMargin

  /** JSON prop extraction (props is a JSON string column). */
  def evJson(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .select($"event_id",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"k").agg(count(lit(1)).as("n"))
      .orderBy($"k")
  }
  val evJsonSql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS n
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin

  /** Gap-based sessionization (new session after >30 min idle):
    * classic lag + running-sum-of-boundaries, one shuffle on user_id. */
  def evSessionize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val flagged = events(s, d)
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("new_sess",
        when($"prev_ts".isNull ||
          $"ts".cast("double") - $"prev_ts".cast("double") > 1800d, 1L).otherwise(0L))
    flagged.groupBy($"user_id")
      .agg(sum($"new_sess").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }
  val evSessionizeSql: String =
    """WITH flagged AS (
      |  SELECT user_id,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events)
      |SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
      |  count(*) AS n_events
      |FROM flagged GROUP BY user_id ORDER BY user_id""".stripMargin

  /** One event row for typed stateful processing. */
  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long)

  /** Stateful streaming sessionization via flatMapGroupsWithState —
    * the KeyValueGroupedDataset custom-state path. Each micro-batch
    * sorts a user's events and counts >30-min gaps; state carries the
    * last seen timestamp + running count across batches, so the logic
    * is correct under any batch slicing (the file source happens to
    * deliver one batch, which makes the output comparable to the batch
    * sessionizer's oracle). */
  def evStreamSessionize(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = s.read.parquet(s"$d/events.parquet").schema
    val name = "graft_sess_" + math.abs(d.hashCode).toString
    val evs = s.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(d)
      .withColumn("ts", timestamp_micros(($"ts" / 1000L).cast("long")))
      .select($"event_id", $"ts", $"user_id")
      .as[Ev]

    def fn(userId: Long, rows: Iterator[Ev], state: GroupState[(Long, Long, Long)])
        : Iterator[(Long, Long, Long)] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var (sessions, events, lastMs) = state.getOption.getOrElse((0L, 0L, Long.MinValue))
      sorted.foreach { e =>
        if (lastMs == Long.MinValue || e.ts.getTime - lastMs > 1800L * 1000L) sessions += 1
        events += 1
        lastMs = e.ts.getTime
      }
      state.update((sessions, events, lastMs))
      Iterator.single((userId, sessions, events))
    }

    val q = evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
      .toDF("user_id", "n_sessions", "n_events")
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    try q.processAllAvailable()
    finally q.stop()
    s.table(name).orderBy($"user_id")
  }

  /** The SAME tumbling-window agg as a Structured Streaming query:
    * file source replays the parquet as a stream; watermark bounds
    * state; memory sink in complete mode captures the final answer.
    * Matches evWindowAgg's oracle exactly — proving batch/stream
    * semantic parity. */
  def evStreamWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = s.read.parquet(s"$d/events.parquet").schema
    val name = "graft_stream_" + math.abs(d.hashCode).toString
    // file stream source wants a directory: stream the sf dir but only
    // pick up the events file
    val stream = s.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(d)
      .withColumn("ts", timestamp_micros(($"ts" / 1000L).cast("long")))
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(DecimalType(18, 4))).as("sum_value"))
    val q = stream.writeStream
      .format("memory").queryName(name).outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    s.table(name)
      .select($"w.start".as("w_start"), $"event_type", $"n", $"sum_value")
      .orderBy($"w_start", $"event_type")
  }
}
