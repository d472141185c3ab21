package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral pins for the round-18 serve/tokenizer additions. */
class Round18OpsSpec extends SparkSpec {

  test("rag mmr: first pick is the relevance argmax, ranks dense, no duplicate chunks") {
    import spark.implicits._
    val mmr = CurationOps.docRagMmr(spark, sf0001).cache()
    val base = CurationOps.docRagE2e(spark, sf0001).cache()
    // MMR@1 must equal base retrieval@1 — round 1 has no redundancy
    // term, so any drift here is a bug, not a trade-off
    val m1 = mmr.filter($"rank" === 1L)
      .select($"qid", $"doc_id", $"chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b1 = base.filter($"rank" === 1L)
      .select($"qid", $"doc_id", $"chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(m1 == b1, s"MMR@1 must equal base@1: ${m1 -- b1} vs ${b1 -- m1}")
    // ranks dense 1..n per query, no (doc_id, chunk_id) repeated
    val perQ = mmr.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    perQ.foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq,
        s"qid=$q ranks not dense: ${rows.map(_._2).sorted.mkString(",")}")
      assert(rows.map(r => (r._3, r._4)).distinct.length == rows.length,
        s"qid=$q repeats a chunk")
    }
    // the diversity trade must not shrink coverage: across queries the
    // MMR context never cites FEWER distinct documents than the
    // plain top-K it replaces
    val mDocs = mmr.select($"qid", $"doc_id").distinct().count()
    val bDocs = base.select($"qid", $"doc_id").distinct().count()
    assert(mDocs >= bDocs,
      s"MMR must not reduce distinct-doc coverage: $mDocs < $bDocs")
    mmr.unpersist(); base.unpersist()
  }

  test("rag mmr recall meter: ppm-bounded and consistent with its hit counts") {
    import spark.implicits._
    val rec = CurationOps.docRagMmrRecall(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rec.nonEmpty, "recall meter must emit one row per query")
    rec.foreach { case (q, nTrue, nHit, ppm) =>
      assert(nTrue > 0 && nHit >= 0 && nHit <= nTrue, s"qid=$q hits out of range")
      assert(ppm == 1000000L * nHit / nTrue, s"qid=$q ppm drifted from counts")
    }
  }
}
