package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the round-13 warehouse/pipeline additions: CDC merge,
  * SCD2 history build, hopping windows, gap stats, Gopher rules. */
class WarehouseOpsSpec extends SparkSpec {

  test("merge upsert: actions partition the keyspace, changes win") {
    import spark.implicits._
    val out = RelationalOps.qMergeUpsert(spark, sf0001).cache()
    val base = graft.Tables.orders(spark, sf0001)
    val nBase = base.count()
    val nIns = base.filter($"o_orderkey" % 101 === 0).count()
    // every base key survives; inserts extend the keyspace disjointly
    assert(out.count() == nBase + nIns)
    assert(out.filter($"action" === "insert").count() == nIns)
    // an updated key carries the change row's status, not the base's
    val upd = out.filter($"action" === "update")
    assert(upd.count() == base.filter($"o_orderkey" % 7 === 0).count())
    assert(upd.filter($"status" =!= "U").count() == 0)
    assert(out.filter($"action" === "insert" && $"status" =!= "N").count() == 0)
    // keys are unique after the merge (it's an upsert, not an append)
    assert(out.select($"o_orderkey").distinct().count() == out.count())
    out.unpersist()
  }

  test("scd2: per-user intervals chain contiguously, exactly one current") {
    import spark.implicits._
    val out = EventOps.evScd2(spark, sf0001).cache()
    // exactly one open (current) interval per user
    val users = out.select($"user_id").distinct().count()
    assert(out.filter($"is_current" === 1L).count() == users)
    // valid_to of row k equals valid_from of row k+1 (no gaps/overlaps)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"valid_from", $"event_id")
    val broken = out
      .withColumn("next_from", lead($"valid_from", 1).over(w))
      .filter($"next_from".isNotNull && $"valid_to" =!= $"next_from")
    assert(broken.count() == 0)
    // consecutive rows never repeat a type (that's the "change" part)
    val rep = out.withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull && $"next_type" === $"event_type")
    assert(rep.count() == 0)
    out.unpersist()
  }

  test("hop window: every event lands in exactly size/slide = 2 windows") {
    import spark.implicits._
    val nEvents = graft.Tables.events(spark, sf0001).count()
    val out = EventOps.evHopWindow(spark, sf0001)
    val total = out.agg(sum($"n")).head.getLong(0)
    assert(total == 2 * nEvents)
    // window starts align to the 15-minute hop grid
    val offGrid = out.filter(unix_micros($"w_start") % 900000000L =!= 0L)
    assert(offGrid.count() == 0)
  }

  test("gap stats: n_gaps = n_events - 1 per user, bounds are consistent") {
    import spark.implicits._
    val out = EventOps.evGapStats(spark, sf0001).cache()
    assert(out.filter($"n_gaps" =!= $"n_events" - 1L).count() == 0)
    assert(out.filter($"n_gaps" > 0 &&
      ($"min_gap_us" > $"max_gap_us" || $"sum_gap_us" < $"max_gap_us")).count() == 0)
    // events are unique per (user, ts, event_id) order, so gaps >= 0
    assert(out.filter($"min_gap_us" < 0L).count() == 0)
    out.unpersist()
  }

  test("gopher rules: keep is the conjunction of the six flags") {
    import spark.implicits._
    val out = TextOps.textGopherRules(spark, sf0001).cache()
    val flags = Seq("f_wordcount", "f_meanlen", "f_alpha", "f_ellipsis",
      "f_symbol", "f_stop")
    flags.foreach { f =>
      assert(out.filter(col(f) =!= 0L && col(f) =!= 1L).count() == 0, f)
    }
    val mismatch = out.filter(
      $"keep" =!= when(flags.map(col(_) === 1L).reduce(_ && _), 1L).otherwise(0L))
    assert(mismatch.count() == 0)
    // the corpus is not degenerate for the rule set: both outcomes occur
    assert(out.filter($"keep" === 1L).count() > 0)
    out.unpersist()
  }

  test("bpe pairs: 2-char pairs only, ranked deterministically") {
    import spark.implicits._
    val out = TextOps.textBpePairs(spark, sf0001).collect()
    assert(out.length <= 50 && out.nonEmpty)
    assert(out.forall(_.getString(0).length == 2))
    val ns = out.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "sorted by n desc")
  }

  test("ngram lm: top-25 per order, gram token count matches its order") {
    import spark.implicits._
    val out = TextOps.textNgramLm(spark, sf0001).cache()
    Seq(2L, 3L).foreach { k =>
      val rows = out.filter($"n_order" === k)
      assert(rows.count() <= 25 && rows.count() > 0, s"order $k")
      assert(rows.filter(size(split($"gram", " ")) =!= k.toInt).count() == 0)
      // ranks are dense 1..count within each order
      val ranks = rows.select($"rank").collect().map(_.getLong(0)).sorted
      assert(ranks.sameElements(1L to ranks.length), s"dense ranks for $k")
    }
    out.unpersist()
  }

  test("pq ann: shortlist+rerank recovers exact neighbors, deterministic") {
    import spark.implicits._
    val pq = MlOps.simAnnPq(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = SimilarityOps.simTopkBrute(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pq.length == brute.length)
    // PQ is approximate; the exact-cosine rerank of the ADC top-64
    // shortlist must put >= 1 of the true top-3 into the PQ top-3 per
    // query on this corpus (measured: the shortlist catches 2-3 of 3)
    val byQ = brute.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    pq.groupBy(_._1).foreach { case (q, rows) =>
      val hit = rows.map(_._3).toSet.intersect(byQ(q)).size
      assert(hit >= 1, s"query $q: PQ top-3 disjoint from exact top-3")
    }
    // deterministic across invocations (codebooks are cached artifacts)
    val again = MlOps.simAnnPq(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sameElements(pq))
  }

  test("tfidf: rank window is dense per doc, df counts docs not tokens") {
    import spark.implicits._
    val out = TextOps.docTfidfTopk(spark, sf0001).cache()
    val nDocs = graft.Tables.documents(spark, sf0001).count()
    assert(out.filter($"rank" === 1L).count() == nDocs)
    assert(out.filter($"rank" < 1L || $"rank" > 5L).count() == 0)
    assert(out.filter($"df" > nDocs || $"df" < 1L).count() == 0)
    assert(out.filter($"score" =!= expr("(1000000L * tf) div df")).count() == 0)
    out.unpersist()
  }

  test("streaming hop window equals the batch hop window's count projection") {
    import spark.implicits._
    val batch = EventOps.evHopWindow(spark, sf0001)
      .select($"w_start", $"event_type", $"n").collect().toSeq
    val streamed = EventOps.evStreamHopWindow(spark, sf0001).collect().toSeq
    assert(streamed == batch)
  }

  test("gopher rules and gap stats are single-pass shapes (no stray shuffles)") {
    // gopher: map-only over the scan — the sole exchange is the oracle sort
    val gp = TextOps.textGopherRules(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(gp).isEmpty, gp)
    // gap stats: groupBy key == window partitionBy key, so the agg reuses
    // the window's hash partitioning — one hash exchange total
    val gs = EventOps.evGapStats(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(gs).size <= 1, gs)
    // scd2: both window passes share one (user_id) shuffle
    val sc = EventOps.evScd2(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(sc).size <= 1, sc)
    // merge upsert: every join broadcasts changeset-sized data — the
    // base table must never hash-shuffle (a full-outer or un-flipped
    // anti join would SMJ it); the only exchange is the oracle sort
    val mu = RelationalOps.qMergeUpsert(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(mu.contains("BroadcastHashJoin"), mu)
    assert(!mu.contains("SortMergeJoin"), mu)
    assert("Exchange hashpartitioning".r.findAllIn(mu).isEmpty, mu)
  }
}
