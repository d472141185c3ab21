package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-bucketing both fact tables on the join
  * key removes the per-query shuffle entirely — THE technique for a
  * repeatedly-joined 100 TB fact table. Asserted on the plan: the
  * bucketed join has no shuffle exchange; the plain join has two.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    spark.catalog.clearCache()
    val o = Tables.orders(spark, sf0001)
    val l = Tables.lineitem(spark, sf0001)
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
    val bucketedPlan = joined.queryExecution.executedPlan.toString
    assert(!bucketedPlan.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join must not shuffle the fact side:\n$bucketedPlan")

    val plain = l.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
    // same result either way
    assert(joined.collect().toSet == plain.collect().toSet)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }
}
