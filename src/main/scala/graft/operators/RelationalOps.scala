package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Core relational operator surface: scan, filter, project, aggregate,
  * join (broadcast/shuffle/semi/anti), window, sort/limit, set ops,
  * scalar functions, rollup.
  *
  * Every query returns a deterministically ordered result whose columns
  * are aliased identically to the DuckDB oracle SQL in
  * [[graft.OpRegistry]]. Money-like aggregates are cast to DECIMAL before
  * summing so Spark and DuckDB both do exact decimal arithmetic
  * (double-sum order would otherwise diverge between engines); the FINAL
  * output is then cast to DOUBLE on both sides — casting the same exact
  * decimal to double is correctly rounded in both engines, so the values
  * are bit-identical, and a double renders the same everywhere, whereas
  * a decimal's trailing zeros ("257436.00" vs 257436.0) depend on the
  * comparator's reader.
  *
  * Scale notes (100 TB posture):
  *  - dimension tables (region/nation/supplier/customer at TPC-H ratios)
  *    are broadcast explicitly; fact-fact joins shuffle on their keys.
  *  - aggregations are expressed as groupBy/agg so Catalyst plans
  *    partial (map-side) aggregation before the shuffle.
  *  - filters are plain Column predicates on the scan → pushed to
  *    parquet (PushedFilters), and only referenced columns are read.
  */
object RelationalOps {

  private def dec(c: Column, scale: Int = 2): Column =
    c.cast(DecimalType(18, scale))

  /** TPC-H Q1 shape: scan+filter+group+aggregate with map-side combine. */
  def q1Agg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .filter($"l_shipdate" <= lit("1998-09-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(dec($"l_quantity")).cast("double").as("sum_qty"),
        sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** TPC-H Q3 shape: two shuffled fact joins + agg + top-k. */
  def q3TopkJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = customer(s, d).filter($"c_mktsegment" === "BUILDING")
    val o = orders(s, d)
    val l = lineitem(s, d)
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey")
      .agg(sum(dec($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)).cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  /** TPC-H Q5 shape: star join over 6 tables, dims broadcast. */
  def q5MultiJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val r = region(s, d).filter($"r_name" === "ASIA")
    lineitem(s, d)
      .join(orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(customer(s, d)), $"o_custkey" === $"c_custkey")
      .join(broadcast(supplier(s, d)),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nation(s, d)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(sum(dec($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)).cast("double").as("revenue"))
      .orderBy($"n_name")
  }

  /** Window functions: ranking + running aggregate per partition. */
  def qWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("running_spend",
        sum(dec($"o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"rn", $"o_orderkey", $"running_spend")
      .orderBy($"o_custkey", $"rn")
  }

  /** Window frame zoo: RANGE frame, lead/lag, first/last over frames. */
  def qWindowFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val byCust = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
    orders(s, d)
      .withColumn("prev_price", dec(lag($"o_totalprice", 1).over(byCust)).cast("double"))
      .withColumn("next_price", dec(lead($"o_totalprice", 1).over(byCust)).cast("double"))
      .withColumn("first_price", dec(first($"o_totalprice").over(
        byCust.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))).cast("double"))
      .withColumn("neighborhood_sum", dec(sum(dec($"o_totalprice")).over(
        byCust.rowsBetween(-1, 1)), 2).cast("double"))
      .select($"o_custkey", $"o_orderkey", $"prev_price", $"next_price",
        $"first_price", $"neighborhood_sum")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** The rank-function family. Two windows: the COARSE order (order
    * year) has ties, under which rank/dense_rank/percent_rank/
    * cume_dist are still deterministic (tied rows share a value);
    * ntile is NOT tie-stable, so it ranks over the tie-free key
    * instead. percent_rank/cume_dist are IEEE doubles computed from
    * identical integer inputs — bit-equal cross-engine. */
  def qRankFamily(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val coarse = Window.partitionBy($"o_custkey").orderBy(year($"o_orderdate"))
    val exact = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
    orders(s, d)
      .withColumn("rnk", rank().over(coarse).cast("long"))
      .withColumn("drnk", dense_rank().over(coarse).cast("long"))
      .withColumn("prank", percent_rank().over(coarse))
      .withColumn("cdist", cume_dist().over(coarse))
      .withColumn("quartile", ntile(4).over(exact).cast("long"))
      .select($"o_custkey", $"o_orderkey", $"rnk", $"drnk",
        $"prank", $"cdist", $"quartile")
      .orderBy($"o_custkey", $"o_orderkey")
  }
  val qRankFamilySql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(rank() OVER cw AS BIGINT) AS rnk,
      |  CAST(dense_rank() OVER cw AS BIGINT) AS drnk,
      |  percent_rank() OVER cw AS prank,
      |  cume_dist() OVER cw AS cdist,
      |  CAST(ntile(4) OVER ew AS BIGINT) AS quartile
      |FROM orders
      |WINDOW cw AS (PARTITION BY o_custkey ORDER BY EXTRACT(YEAR FROM o_orderdate)),
      |       ew AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Full outer join with null-aware aggregation on both sides. */
  def qFullOuter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = customer(s, d).filter($"c_mktsegment" === "MACHINERY")
      .select($"c_custkey".as("k"), lit(1L).as("is_cust"))
    val o = orders(s, d).filter($"o_orderpriority" === "1-URGENT")
      .groupBy($"o_custkey".as("k")).agg(count(lit(1)).as("n_urgent"))
    c.join(o, Seq("k"), "full_outer")
      .select($"k", coalesce($"is_cust", lit(0L)).as("is_cust"),
        coalesce($"n_urgent", lit(0L)).as("n_urgent"))
      .orderBy($"k")
  }

  /** Global sort + limit (Spark plans TakeOrderedAndProject — no full sort). */
  def qSortLimit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .select($"o_orderkey", $"o_custkey", dec($"o_totalprice").cast("double").as("total"))
      .orderBy($"total".desc, $"o_orderkey")
      .limit(10)
  }

  /** Set operations: INTERSECT and EXCEPT (both set-distinct semantics). */
  def qIntersect(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val building = customer(s, d).filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey".as("custkey"))
    val open = orders(s, d).filter($"o_orderstatus" === "O")
      .select($"o_custkey".as("custkey"))
    building.intersect(open).orderBy($"custkey")
  }

  def qExcept(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val all = orders(s, d).select($"o_orderkey".as("okey"))
    val shipped = lineitem(s, d).select($"l_orderkey".as("okey"))
    all.except(shipped).orderBy($"okey")
  }

  /** Bucketed CO-LOCATED join — the 100 TB shape for a repeated
    * large×large join: both sides are written bucketed (and
    * bucket-sorted) on the join key via `saveAsTable`, so Spark joins
    * bucket-to-bucket with NO exchange on either input — the only
    * shuffle left in the plan is the aggregation above the join. The
    * bucketed write is the amortized cost: pay it once per table, and
    * every downstream join/aggregation on that key is shuffle-free —
    * at 100 TB this is the difference between re-shuffling the fact
    * table per query and never shuffling it at all. ScaleSpec pins the
    * no-exchange-below-the-join shape with broadcast disabled; the
    * result is oracle-identical to the plain join, which is the point:
    * bucketing changes the PLAN, never the answer. */
  def qBucketedJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val nb = 8
    // a managed table's warehouse directory can survive a previous
    // session whose in-memory catalog is gone — saveAsTable then fails
    // on LOCATION_ALREADY_EXISTS even in overwrite mode, so clear both
    // the catalog entry and the orphaned location first
    Seq("graft_orders_bkt", "graft_customer_bkt").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val wh = s.conf.get("spark.sql.warehouse.dir")
      val p = new org.apache.hadoop.fs.Path(s"$wh/$t")
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    orders(s, d).write.mode("overwrite")
      .bucketBy(nb, "o_custkey").sortBy("o_custkey")
      .saveAsTable("graft_orders_bkt")
    customer(s, d).write.mode("overwrite")
      .bucketBy(nb, "c_custkey").sortBy("c_custkey")
      .saveAsTable("graft_customer_bkt")
    s.table("graft_orders_bkt")
      .join(s.table("graft_customer_bkt"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(dec($"o_totalprice")).cast("double").as("total"))
      .orderBy($"c_mktsegment")
  }
  val qBucketedJoinSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Semi join (EXISTS): customers having at least one urgent order. */
  def qSemiJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val urgent = orders(s, d).filter($"o_orderpriority" === "1-URGENT")
    customer(s, d)
      .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Anti join (NOT EXISTS): customers with no urgent order. */
  def qAntiJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val urgent = orders(s, d).filter($"o_orderpriority" === "1-URGENT")
    customer(s, d)
      .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Scalar function surface: string / math / conditional expressions. */
  def qScalarFuncs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    part(s, d)
      .select(
        $"p_partkey",
        upper($"p_type").as("type_up"),
        substring($"p_name", 1, 8).as("name_pfx"),
        length($"p_name").cast("long").as("name_len"),
        dec(round($"p_retailprice" * 0.8, 2)).cast("double").as("discounted"),
        when($"p_size" >= 25, lit("large"))
          .when($"p_size" >= 10, lit("medium"))
          .otherwise(lit("small")).as("size_class"))
      .orderBy($"p_partkey")
  }

  /** Date/time functions over orders. */
  def qDateFuncs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .groupBy(year($"o_orderdate").cast("long").as("yr"),
        month($"o_orderdate").cast("long").as("mo"))
      .agg(count(lit(1)).as("n_orders"), sum(dec($"o_totalprice")).cast("double").as("spend"))
      .orderBy($"yr", $"mo")
  }

  /** DISTINCT aggregation: exact distinct counts per group. */
  def qDistinctAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  /** Aggregate + HAVING: repeat customers. */
  def qHaving(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"))
      .filter($"n_orders" >= 8)
      .orderBy($"o_custkey")
  }

  /** ROLLUP grouping sets (nulls coalesced so ordering is engine-neutral). */
  def qRollup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(sum(dec($"l_quantity")).cast("double").as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("rf"),
        coalesce($"l_linestatus", lit("ALL")).as("ls"),
        $"sum_qty", $"n")
      .orderBy($"rf", $"ls")
  }

  /** CUBE grouping sets: all 4 grouping combinations in one pass
    * (Catalyst expands + partial-aggregates before the shuffle). */
  def qCube(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(sum(dec($"l_quantity")).cast("double").as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("rf"),
        coalesce($"l_linestatus", lit("ALL")).as("ls"),
        $"sum_qty", $"n")
      .orderBy($"rf", $"ls")
  }

  /** Explicit GROUPING SETS — the general form ROLLUP/CUBE specialize:
    * here the two single-column marginals plus the grand total, WITHOUT
    * the (rf, ls) pair cells a cube would add. Same one-pass expansion
    * + partial aggregation as [[qCube]]; Spark 4 exposes it directly on
    * the Dataset API. */
  def qGroupingSets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .groupingSets(
        Seq(Seq($"l_returnflag"), Seq($"l_linestatus"), Seq()),
        $"l_returnflag", $"l_linestatus")
      .agg(sum(dec($"l_quantity")).cast("double").as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("rf"),
        coalesce($"l_linestatus", lit("ALL")).as("ls"),
        $"sum_qty", $"n")
      .orderBy($"rf", $"ls")
  }
  val qGroupingSetsSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY rf, ls""".stripMargin

  /** Skew-safe JOIN via salt replication (the join-side counterpart of
    * [[qSaltedAgg]]): the build side is replicated once per salt value
    * and the probe side picks a uniform salt, so one hot key spreads
    * over 8 reducers instead of stalling one. Results are identical to
    * the plain join — the oracle runs the unsalted equivalent. At
    * 100 TB this is the manual fallback when AQE's skew-join split
    * can't help (e.g. aggregation after the join keyed on the hot
    * column). */
  def qSaltedJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val nSalt = 8
    // Only keys ABOVE this per-key count are salted (round-3 verdict
    // #4): replicating the whole build side ×8 — the pre-round-4
    // version — multiplies the shuffle for the 99% of keys that are
    // not skewed. At 100 TB, set the threshold to the per-key row
    // count one reducer can absorb; here it is low enough (4, vs the
    // fixture's 1–7 lineitems/order) that BOTH the salted and the
    // unsalted path are exercised by every run.
    val hotThreshold = 4L
    val fact = lineitem(s, d)
      .select($"l_orderkey", $"l_extendedprice",
        pmod(hash($"l_linenumber", $"l_partkey"), lit(nSalt)).as("rnd"))
    // hot-key detection is one map-side-combined count; the surviving
    // key list is tiny by definition → broadcast to both sides
    val hot = fact.groupBy($"l_orderkey").agg(count(lit(1)).as("kn"))
      .filter($"kn" > hotThreshold).select($"l_orderkey".as("hk"))
    val factS = fact.join(broadcast(hot), $"l_orderkey" === $"hk", "left")
      .withColumn("salt", when($"hk".isNotNull, $"rnd").otherwise(lit(0)))
      .select($"l_orderkey", $"l_extendedprice", $"salt")
    val dimS = orders(s, d).select($"o_orderkey", $"o_orderpriority")
      .join(broadcast(hot), $"o_orderkey" === $"hk", "left")
      .withColumn("salt", explode(when($"hk".isNotNull,
        array((0 until nSalt).map(lit(_)): _*)).otherwise(array(lit(0)))))
      .select($"o_orderkey", $"o_orderpriority", $"salt")
    factS.join(dimS,
      $"l_orderkey" === $"o_orderkey" && factS("salt") === dimS("salt"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(dec($"l_extendedprice")).cast("double").as("total"))
      .orderBy($"o_orderpriority")
  }

  /** As-of join (each event ↦ the most recent order of that customer
    * at or before the event), composed scalably from built-ins: tag
    * both sides, union, one sort per key, last-non-null propagation.
    * One shuffle on the key; no range explosion — this is the pattern
    * that survives 100 TB, vs. a naive t1 ≤ t2 theta-join. Orders are
    * pre-deduped per (custkey, date) so ties are deterministic. */
  def qAsofJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ord = orders(s, d)
      .groupBy($"o_custkey".as("key"), $"o_orderdate".as("t"))
      .agg(max($"o_orderkey").as("okey"))
      .select($"key", $"t", $"okey", lit(null).cast("long").as("event_id"), lit(0).as("tag"))
    val ev = events(s, d)
      .select($"user_id".as("key"), $"ts".as("t"), lit(null).cast("long").as("okey"),
        $"event_id", lit(1).as("tag"))
    val w = Window.partitionBy($"key").orderBy($"t", $"tag", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    ord.union(ev)
      .withColumn("matched", last($"okey", ignoreNulls = true).over(w))
      .filter($"tag" === 1 && $"matched".isNotNull)
      .select($"event_id", $"key".as("user_id"), $"matched".as("okey"))
      .orderBy($"event_id")
  }

  /** Bucketed RANGE join: count, per probe order, the lineitem
    * shipment windows [l_shipdate, l_shipdate + linenumber×5 days]
    * containing its date. The naive shape is a theta-join (every probe
    * × every interval, then BETWEEN) — quadratic. Here each interval
    * EXPLODES into its ≤6 covering week buckets and the join is an
    * EQUI-join on the bucket, with the exact BETWEEN re-applied after;
    * a (probe, interval) pair meets in exactly one bucket (the probe's
    * own week), so no dedup is needed. Work scales with
    * |intervals|×(width/bucket) + matches, not |probes|×|intervals| —
    * the oracle runs the naive BETWEEN join and must agree exactly. */
  def qRangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // INTEGER week buckets (days-since-a-Monday div 7), not
    // date_trunc('week') timestamps: a timestamp bucket built by
    // stepping a fixed 7-day interval drifts an hour off the truncated
    // values across a DST transition in a non-UTC session, silently
    // dropping matches — integer buckets are timezone-free
    val probes = orders(s, d)
      .filter($"o_orderkey" % 997 === 0)
      .select($"o_orderkey", $"o_orderdate",
        expr("datediff(o_orderdate, DATE'1970-01-05') div 7").as("wk"))
    val intervals = lineitem(s, d)
      .select($"l_orderkey", $"l_linenumber", $"l_shipdate",
        expr("date_add(l_shipdate, l_linenumber * 5)").as("l_until"))
      .withColumn("wk", explode(expr(
        """sequence(datediff(l_shipdate, DATE'1970-01-05') div 7,
          |         datediff(l_until, DATE'1970-01-05') div 7)""".stripMargin)))
    probes.join(intervals, "wk")
      .filter($"o_orderdate".between($"l_shipdate", $"l_until"))
      .groupBy($"o_orderkey", $"o_orderdate")
      .agg(count(lit(1)).as("n_windows"))
      .select($"o_orderkey", $"o_orderdate".cast("string").as("o_date"), $"n_windows")
      .orderBy($"o_orderkey")
  }
  val qRangeJoinSql: String =
    """SELECT o_orderkey, CAST(o_orderdate AS VARCHAR) AS o_date,
      |  count(*) AS n_windows
      |FROM orders o JOIN lineitem l
      |  ON o.o_orderdate BETWEEN l.l_shipdate
      |     AND l.l_shipdate + INTERVAL (l.l_linenumber * 5) DAY
      |WHERE o.o_orderkey % 997 = 0
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY o_orderkey""".stripMargin

  /** Skew-safe aggregation: pre-aggregate on (key, salt) to spread a
    * hot key over 8 reducers, then merge partials. Decimal-exact, so
    * the result is identical to the plain GROUP BY the oracle runs —
    * demonstrating that salting changes the plan, never the answer. */
  def qSaltedAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .withColumn("salt", pmod(hash($"l_orderkey"), lit(8)))
      .groupBy($"l_returnflag", $"salt")
      .agg(sum(dec($"l_quantity")).as("pq"), count(lit(1)).as("pn"))
      .groupBy($"l_returnflag")
      .agg(sum($"pq").cast("double").as("sum_qty"), sum($"pn").as("n"))
      .orderBy($"l_returnflag")
  }

  /** Discrete percentiles (value-picking, so doubles match exactly
    * across engines — interpolating variants would not). */
  def qPercentile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("p50"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)").as("p90"))
      .orderBy($"l_returnflag")
  }

  /** Pivot: linestatus → columns, decimal sums per returnflag. */
  def qPivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .groupBy($"l_returnflag")
      .pivot($"l_linestatus", Seq("F", "O"))
      .agg(sum(dec($"l_quantity")))
      .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")
      .withColumn("qty_f", $"qty_f".cast("double"))
      .withColumn("qty_o", $"qty_o".cast("double"))
      .orderBy($"l_returnflag")
  }

  /** UNPIVOT (the inverse of [[qPivot]]): per-returnflag wide measures
    * melt into (flag, measure, value) rows via `stack` — codegen'd, one
    * pass, no shuffle beyond the source aggregation. The oracle is the
    * portable UNION ALL formulation. */
  def qUnpivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wide = lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(sum(dec($"l_quantity")).cast("double").as("qty"),
        sum(dec($"l_extendedprice")).cast("double").as("price"),
        count(lit(1)).cast("double").as("rows_n"))
    wide.select($"l_returnflag", expr(
        "stack(3, 'qty', qty, 'price', price, 'rows_n', rows_n) AS (measure, value)"))
      .orderBy($"l_returnflag", $"measure")
  }
  val qUnpivotSql: String =
    """WITH wide AS (
      |  SELECT l_returnflag,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price,
      |    CAST(count(*) AS DOUBLE) AS rows_n
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, measure, value FROM (
      |  SELECT l_returnflag, 'qty' AS measure, qty AS value FROM wide
      |  UNION ALL SELECT l_returnflag, 'price', price FROM wide
      |  UNION ALL SELECT l_returnflag, 'rows_n', rows_n FROM wide)
      |ORDER BY l_returnflag, measure""".stripMargin

  /** Ordered string aggregation (deterministic via explicit sort). */
  def qStringAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    nation(s, d).join(broadcast(region(s, d)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(concat_ws(",", sort_array(collect_list($"n_name"))).as("nations"))
      .orderBy($"r_name")
  }

  /** Correlated scalar subquery shape: each customer's max order. */
  def qScalarSubquery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val mx = orders(s, d).groupBy($"o_custkey")
      .agg(max(dec($"o_totalprice")).cast("double").as("max_order"))
    customer(s, d)
      .join(mx, $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey", $"max_order")
      .orderBy($"c_custkey")
  }

  /** NULL semantics: nullif/coalesce + null-aware counts and sort. */
  def qNullHandling(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .select($"l_returnflag", nullif(dec($"l_discount", 2), lit(0).cast(DecimalType(18, 2))).as("disc"))
      .groupBy($"l_returnflag")
      .agg(count($"disc").as("n_nonnull"), count(lit(1)).as("n_all"),
        coalesce(min($"disc"), lit(-1).cast(DecimalType(18, 2))).cast("double").as("min_disc"))
      .orderBy($"l_returnflag")
  }

  /** Explicit cross join (tiny dims). */
  def qCrossJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    region(s, d).select($"r_name").crossJoin(
      nation(s, d).select($"n_name"))
      .orderBy($"r_name", $"n_name")
  }

  /** Approximate distinct (HLL++). The sketch estimate is
    * engine-specific and can never hash-match another engine, so the
    * oracle checks the CONTRACT instead of the estimate: the output
    * carries the exact per-group count(distinct) plus a flag that the
    * HLL estimate landed within 3×rsd of it (rsd = 0.05, so ±15% —
    * deterministic for a fixed input since HLL hashing is
    * deterministic). DuckDB emits the same exact count with flag = 1,
    * making the row value-comparable while the approximate aggregation
    * still runs — and is verified — on the Spark side. At 100 TB the
    * HLL path is the one you'd use (fixed-size sketch, one shuffle of
    * sketches, no distinct expansion); the exact count here is the
    * verification harness, not the production shape. */
  def qApproxDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey", 0.05).as("approx_parts"),
        countDistinct($"l_partkey").as("exact_parts"))
      .select($"l_returnflag", $"exact_parts",
        // envelope = max(3, 15% of exact): the absolute floor keeps a
        // small-cardinality group (exact < ~20, where a deterministic
        // ±2-3 HLL wobble exceeds 15%) from flipping the flag — the
        // relative-only form would fail the hard-coded oracle on a
        // testdata regen with a rare group (round-12 advice)
        when(abs($"approx_parts" - $"exact_parts") <=
          greatest(lit(3.0), lit(0.15) * $"exact_parts"), 1L).otherwise(0L).as("hll_ok"))
      .orderBy($"l_returnflag")
  }
  val qApproxDistinctSql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
      |  CAST(1 AS BIGINT) AS hll_ok
      |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  /** Sketch-based quantiles under the [[qApproxDistinct]] contract:
    * `approx_percentile` (a deterministic mergeable quantile sketch —
    * fixed-size state, one shuffle of sketches, the only quantile
    * shape that survives 100 TB) verified in-query against the exact
    * `percentile_disc`, emitting an `ok` flag the oracle hard-codes
    * to 1. The envelope is RANK-based, not value-based: the approx
    * median must fall between the exact 40th and 60th percentile
    * VALUES of its group — value-space envelopes break on heavy-tailed
    * columns where adjacent ranks are far apart, while a rank
    * envelope is what the sketch's accuracy parameter actually
    * promises. The exact percentiles are the verification harness;
    * the sketch is the production path. Output integer/flag only — no
    * float crosses the comparator. */
  def qApproxPercentile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("apx"),
        expr("percentile_disc(0.4) WITHIN GROUP (ORDER BY o_totalprice)").as("lo"),
        expr("percentile_disc(0.6) WITHIN GROUP (ORDER BY o_totalprice)").as("hi"))
      .select($"o_orderpriority", $"n",
        when($"apx" >= $"lo" && $"apx" <= $"hi", 1L).otherwise(0L).as("pct_ok"))
      .orderBy($"o_orderpriority")
  }
  val qApproxPercentileSql: String =
    """SELECT o_orderpriority, count(*) AS n, CAST(1 AS BIGINT) AS pct_ok
      |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  /** CDC MERGE (upsert) applied as one relational pass: a deterministic
    * changeset (updates for every 7th order, inserts keyed past the
    * base's key space for every 101st) is merged into `orders`. The
    * naive formulation is one FULL OUTER join — but full outer can
    * NEVER broadcast (both sides must stream unmatched rows), forcing
    * a shuffle of the 100 TB base for a megabyte changeset. So the
    * merge decomposes into the broadcast-able equivalent the Delta/
    * Iceberg MERGE INTO planners use: base LEFT JOIN changes (change
    * row wins when present) UNION changes ANTI JOIN base (the genuinely
    * new keys). A LEFT ANTI of changes vs base would put the 100 TB
    * base on the build side, so the insert set is found the way MERGE
    * planners find touched files: a SEMI join of base vs broadcast
    * changes (output is changeset-sized), then changes ANTI the
    * matched-key set — every join in the plan broadcasts changeset-
    * sized data and the base table never shuffles; the only exchange
    * left is the oracle sort. No collect, no driver loop; AQE handles
    * skew if the changeset outgrows the threshold and joins degrade
    * to SMJ. */
  def qMergeUpsert(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = orders(s, d)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus")
    val updates = base.filter($"o_orderkey" % 7 === 0)
      .select($"o_orderkey", $"o_custkey", lit("U").as("o_orderstatus"))
    val inserts = base.filter($"o_orderkey" % 101 === 0)
      .select(($"o_orderkey" + 100000000L).as("o_orderkey"), $"o_custkey",
        lit("N").as("o_orderstatus"))
    val changes = updates.union(inserts)
      .withColumnRenamed("o_custkey", "c_cust")
      .withColumnRenamed("o_orderstatus", "c_status")
    val upserted = base
      .join(broadcast(changes), Seq("o_orderkey"), "left")
      .select($"o_orderkey",
        coalesce($"c_cust", $"o_custkey").as("cust"),
        coalesce($"c_status", $"o_orderstatus").as("status"),
        when($"c_cust".isNull, "keep").otherwise("update").as("action"))
    val matched = base.select($"o_orderkey")
      .join(broadcast(changes.select($"o_orderkey")), Seq("o_orderkey"), "left_semi")
    val fresh = changes
      .join(broadcast(matched), Seq("o_orderkey"), "left_anti")
      .select($"o_orderkey", $"c_cust".as("cust"), $"c_status".as("status"),
        lit("insert").as("action"))
    upserted.union(fresh).orderBy($"o_orderkey")
  }
  val qMergeUpsertSql: String =
    """WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus FROM orders),
      |changes AS (
      |  SELECT o_orderkey, o_custkey AS c_cust, 'U' AS c_status
      |  FROM base WHERE o_orderkey % 7 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey AS c_cust, 'N' AS c_status
      |  FROM base WHERE o_orderkey % 101 = 0)
      |SELECT COALESCE(b.o_orderkey, c.o_orderkey) AS o_orderkey,
      |  COALESCE(c.c_cust, b.o_custkey) AS cust,
      |  COALESCE(c.c_status, b.o_orderstatus) AS status,
      |  CASE WHEN b.o_custkey IS NULL THEN 'insert'
      |       WHEN c.c_cust IS NULL THEN 'keep' ELSE 'update' END AS action
      |FROM base b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
      |ORDER BY o_orderkey""".stripMargin

  /** True RANGE window frames (the VALUE-based frame [[qWindowFrames]]
    * doesn't cover — its frames are ROWS/offset): per customer, spend
    * and order count within ±30 DAYS of each order, ordered by an
    * integer day number so the frame bound is engine-exact. RANGE
    * includes ALL peers of the bound rows, so same-day orders
    * contribute symmetrically regardless of tie order — deterministic
    * without a tiebreak key, unlike ROWS. The aggregation runs in
    * DECIMAL (exact, order-independent) and casts once at the edge
    * (FLOATS.md Class A). One shuffle on o_custkey; the frame scan is
    * a per-partition sliding pass, the at-scale shape for "activity
    * around each event" features. */
  def qRangeFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"day_no")
      .rangeBetween(-30, 30)
    orders(s, d)
      .withColumn("day_no",
        datediff($"o_orderdate".cast("date"), lit("1970-01-01").cast("date")).cast("long"))
      .withColumn("nearby_spend", sum(dec($"o_totalprice")).over(w).cast("double"))
      .withColumn("nearby_n", count(lit(1)).over(w))
      .select($"o_custkey", $"o_orderkey", $"day_no", $"nearby_spend", $"nearby_n")
      .orderBy($"o_custkey", $"o_orderkey")
  }
  val qRangeFramesSql: String =
    """SELECT o_custkey, o_orderkey, day_no,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER rw AS DOUBLE) AS nearby_spend,
      |  count(*) OVER rw AS nearby_n
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_no
      |      FROM orders) t
      |WINDOW rw AS (PARTITION BY o_custkey ORDER BY day_no
      |              RANGE BETWEEN 30 PRECEDING AND 30 FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Positional window values — nth_value / last_value / lead with
    * offset 2 — over the full partition frame, the "compare each order
    * to the customer's second and final order" shape. The explicit
    * UNBOUNDED FOLLOWING frame matters: last_value under the default
    * frame is just the current row, a classic cross-engine silent-bug
    * surface this op pins instead. Order key o_orderkey is unique per
    * partition, so every positional value is deterministic. */
  def qFirstLast(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val seq0 = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
    val full = seq0.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, d)
      .withColumn("second_key", nth_value($"o_orderkey", 2).over(full))
      .withColumn("last_key", last($"o_orderkey").over(full))
      .withColumn("skip2_key", lead($"o_orderkey", 2).over(seq0))
      .select($"o_custkey", $"o_orderkey", $"second_key", $"last_key", $"skip2_key")
      .orderBy($"o_custkey", $"o_orderkey")
  }
  val qFirstLastSql: String =
    """SELECT o_custkey, o_orderkey,
      |  nth_value(o_orderkey, 2) OVER fw AS second_key,
      |  last_value(o_orderkey) OVER fw AS last_key,
      |  lead(o_orderkey, 2) OVER sw AS skip2_key
      |FROM orders
      |WINDOW sw AS (PARTITION BY o_custkey ORDER BY o_orderkey),
      |       fw AS (PARTITION BY o_custkey ORDER BY o_orderkey
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Multi-measure PIVOT ([[qPivot]] carries one measure): per order
    * priority, order COUNT and DECIMAL-exact SPEND for each status —
    * Spark's `{value}_{alias}` pivot column naming, mirrored by FILTER
    * aggregates in the oracle (the portable spelling). Compiles to ONE
    * two-phase aggregate: 6 conditional aggregates in a single pass,
    * no per-status scans. */
  def qPivotMulti(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .groupBy($"o_orderpriority")
      .pivot($"o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("n"),
        sum(dec($"o_totalprice")).cast("double").as("spend"))
      .orderBy($"o_orderpriority")
  }
  val qPivotMultiSql: String =
    """SELECT o_orderpriority,
      |  count(*) FILTER (o_orderstatus = 'F') AS F_n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'F') AS DOUBLE) AS F_spend,
      |  count(*) FILTER (o_orderstatus = 'O') AS O_n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'O') AS DOUBLE) AS O_spend,
      |  count(*) FILTER (o_orderstatus = 'P') AS P_n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'P') AS DOUBLE) AS P_spend
      |FROM orders GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Deduplicate-to-latest (the DISTINCT ON shape): each customer's
    * most recent order, ties broken by the higher order key — the
    * snapshot-from-history primitive behind every "current state"
    * table. Spelled as row_number-over-window = 1 (the ANSI form both
    * engines agree on), which Spark executes with WindowGroupLimit:
    * each partition pre-prunes to its top row BEFORE the rank
    * exchange, so the window stage moves one row per key, not the
    * history. */
  def qLatestPerKey(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_orderstatus")
      .orderBy($"o_custkey")
  }
  val qLatestPerKeySql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |      FROM orders) t
      |WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  /** Incremental aggregate maintenance (the materialized-view update
    * shape): the customer spend table maintained as BASE partial
    * aggregates merged with a DELTA batch's partials by re-aggregation
    * — count merges as sum-of-counts, a DECIMAL sum merges as
    * sum-of-sums (both associative and exact, which is WHY the view
    * never needs the base data again). The oracle recomputes from
    * scratch, so the driver's hash-match IS the proof that
    * merge(partials) ≡ recompute — the invariant that makes
    * incremental 100 TB view refresh sound. */
  def qIncrementalAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def partial(df: DataFrame) = df.groupBy($"o_custkey")
      .agg(count(lit(1)).as("n"), sum(dec($"o_totalprice")).as("spend"))
    val base = partial(orders(s, d).filter($"o_orderkey" % 101 =!= 0))
    val delta = partial(orders(s, d).filter($"o_orderkey" % 101 === 0))
    base.unionByName(delta)
      .groupBy($"o_custkey")
      .agg(sum($"n").as("n_orders"), sum($"spend").cast("double").as("spend"))
      .orderBy($"o_custkey")
  }
  val qIncrementalAggSql: String =
    """SELECT o_custkey, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin
}
