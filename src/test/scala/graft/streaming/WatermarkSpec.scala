package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Watermark semantics under controlled batches: events arriving more
  * than the watermark delay behind the max seen event time are dropped
  * from append-mode windowed aggregation — the state-bounding behavior
  * a 100 TB streaming deployment relies on.
  */
class WatermarkSpec extends SparkSpec {

  test("late events beyond the watermark are dropped; on-time ones aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(java.sql.Timestamp, Double)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

    val agg = source.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("w_start"), $"n")
    val q = agg.writeStream.format("memory")
      .queryName("wm_test").outputMode(OutputMode.Append).start()
    try {
      source.addData((ts(0), 1.0), (ts(5), 1.0))   // window 10:00
      q.processAllAvailable()
      source.addData((ts(30), 1.0))                 // advances watermark to 10:20
      q.processAllAvailable()
      source.addData((ts(1), 9.0))                  // LATE: before watermark → dropped
      source.addData((ts(35), 1.0))                 // on time, window 10:30
      q.processAllAvailable()
      source.addData((ts(50), 1.0))                 // advances watermark past 10:40
      q.processAllAvailable()
      source.addData((ts(59), 1.0))                 // one more batch flushes 10:30
      q.processAllAvailable()
      val rows = spark.table("wm_test")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
      // 10:00 window emitted with exactly the 2 on-time events — the
      // late ts(1) event did NOT resurrect or grow the closed window
      assert(rows("2024-01-01 10:00:00.0") == 2L)
      assert(rows("2024-01-01 10:30:00.0") == 2L)
    } finally q.stop()
  }
}
