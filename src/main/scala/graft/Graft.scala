package graft

import org.apache.spark.sql.SparkSession

/** User-facing entry point: one call gives a session configured the way
  * the engine expects (UTC, AQE, right-sized shuffle partitions, native
  * functions injected) with the corpus tables registered as SQL views —
  * so a user of the reference can switch to plain `spark.sql`:
  *
  *   val spark = Graft.session()
  *   Graft.registerTables(spark, "/root/testdata/sf0.01")
  *   spark.sql("SELECT simhash(split(text,' ')) FROM documents")
  */
object Graft {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def session(
      master: String = "local[*]",
      shufflePartitions: Int = 32,
      appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    functions.GraftFunctions.register(s)
    s
  }

  /** Register every corpus table in `dir` as a temp view (events gets
    * its ns→µs timestamp normalization). */
  def registerTables(spark: SparkSession, dir: String): Unit =
    TableNames.foreach { t =>
      try {
        val df = if (t == "events") Tables.events(spark, dir)
                 else Tables.table(spark, dir, t)
        df.createOrReplaceTempView(t)
      } catch { case _: Throwable => () } // missing table in this sf dir
    }
}
