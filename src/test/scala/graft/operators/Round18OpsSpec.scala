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

  test("unigram train: single-char coverage survives pruning, costs are sane, ranks dense") {
    import spark.implicits._
    val tr = TextOps.textUnigramTrain(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(tr.nonEmpty)
    assert(tr.map(_._1).distinct.length == tr.length, "pieces must be unique")
    tr.foreach { case (p, nc, cnt, cost, _) =>
      assert(nc == p.length.toLong && nc >= 1 && nc <= TextOps.UniMaxPiece)
      assert(cnt >= 1, s"piece '$p' survived with zero count")
      assert(cost >= 0, s"piece '$p' has negative log2-milli cost")
    }
    assert(tr.map(_._5).sorted.toSeq == (1L to tr.length).toSeq, "rank not dense")
    // every character of the corpus dictionary must still be a piece
    // (the +1-smoothing floor exists exactly so coverage never breaks)
    val chars = graft.Tables.documents(spark, sf0001)
      .filter($"text".isNotNull)
      .select(explode(split($"text", " ")).as("w")).filter(length($"w") >= 1)
      .select(explode(split($"w", "")).as("c")).distinct()
      .as[String].collect().toSet
    val pieces = tr.map(_._1).toSet
    assert(chars.subsetOf(pieces), s"missing single chars: ${chars -- pieces}")
    // and the trainer must actually learn multi-char pieces on a
    // repetitive corpus — an all-singles vocabulary is a broken fit
    assert(tr.exists(_._2 >= 2), "no multi-char piece survived EM")
  }

  test("unigram encode: piece counts bounded by words and characters, every doc covered") {
    import spark.implicits._
    val enc = TextOps.textUnigramEncode(spark, sf0001).cache()
    val truth = graft.Tables.documents(spark, sf0001)
      .filter($"text".isNotNull)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .filter(length($"w") >= 1)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("tw"), sum(length($"w")).cast("long").as("tc"))
    val joined = enc.join(truth, "doc_id").collect()
    assert(joined.length == truth.count(),
      "every doc with a non-empty word must be encoded")
    joined.foreach { r =>
      val (nw, np) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_pieces"))
      val (tw, tc) = (r.getAs[Long]("tw"), r.getAs[Long]("tc"))
      assert(nw == tw, s"doc ${r.getAs[Long]("doc_id")}: n_words $nw != $tw")
      assert(np >= nw && np <= tc,
        s"doc ${r.getAs[Long]("doc_id")}: n_pieces $np outside [words=$nw, chars=$tc]")
    }
    enc.unpersist()
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
