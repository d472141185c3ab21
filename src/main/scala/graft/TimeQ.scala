package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop micro-bench: time named registered queries in one warm
  * session, printing per-rep seconds. Bench.scala is the canonical
  * all-query round bench; this is the iterate-on-one-operator tool
  * (`runMain graft.TimeQ <sfDir> <reps> <query> [query ...]`). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // dev-loop conf experiments: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    // tolerate blank segments (trailing ';') and warn on k-only ones
    // instead of crashing the dev loop with a MatchError (r19 advice)
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => builder.config(k.trim, v)
        case _ => if (kv.trim.nonEmpty)
          System.err.println(s"[timeq] ignoring malformed conf segment: $kv")
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: one base-table scan + the cheapest query, so rep 1
    // doesn't pay session/codegen init
    try Tables.documents(spark, sfDir).count() catch { case _: Throwable => () }
    try SparkEntry.queries("q1_agg")(spark, sfDir).count() catch { case _: Throwable => () }
    spark.catalog.clearCache()
    names.foreach { name =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[timeq] $name: min=${ts.min}%.3f reps=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
