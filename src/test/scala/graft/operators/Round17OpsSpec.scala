package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Regression pins for the round-17 advice fixes: the streamed RAG
  * serve path over a directory-layout documents table, NULL-source
  * docs in the append lifecycle, and the dedup-report cache release
  * hook. */
class Round17OpsSpec extends SparkSpec {

  /** A small synthetic corpus written in the DIRECTORY layout (what
    * Spark itself writes — part files under `documents.parquet/`),
    * as opposed to the driver testdata's single-file layout. */
  private def writeDirLayoutDocs(withNullSource: Boolean): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r17docs").toString
    val words = Seq("alpha", "beta", "gamma", "delta", "omega", "kappa")
    val docs = (0L until 40L).map { i =>
      val text = (0 until 24)
        .map(j => words(((i + j) % words.size).toInt)).mkString(" ")
      val src = if (withNullSource && i == 7L) null
                else if (i % 5 == 0) "src0" else s"src${i % 3 + 2}"
      (i, text, src)
    }
    docs.toDF("doc_id", "text", "source")
      .repartition(3) // force multiple part files
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("rag stream serves from a directory-layout documents table") {
    // before the fix, pathGlobFilter 'documents.parquet' matched zero
    // part files in this layout, no batch fired, and the op threw on
    // the never-created serve dir (or silently returned a stale log)
    val dir = writeDirLayoutDocs(withNullSource = false)
    val streamed = CurationOps.docRagStream(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batch = CurationOps.docRagE2e(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("rag index append keeps NULL-source docs in the base corpus") {
    import spark.implicits._
    val dir = writeDirLayoutDocs(withNullSource = true)
    val out = CurationOps.docRagIndexAppend(spark, dir)
    // doc 7 has source = NULL: it is not part of the arriving batch,
    // so it must be indexed with the base corpus — a bare NOT IN on
    // source silently dropped it from both sides of the split
    val nullDocChunks = out.filter($"doc_id" === 7L).count()
    val expected = CurationOps.docChunk(spark, dir)
      .filter($"doc_id" === 7L).count()
    assert(expected > 0L)
    assert(nullDocChunks == expected)
    // and the index still covers every chunk exactly once
    assert(out.count() == CurationOps.docChunk(spark, dir).count())
  }

  test("releaseCaches drops the report's tokenization + generator caches") {
    spark.catalog.clearCache() // isolate from other suites' residue
    val rep = DedupOps.dedupReport(spark, sf0001)
    assert(rep.count() > 0)
    // the shared toks InMemoryRelation (and the generators' capped
    // shingle/signature sets) are resident after consumption — that is
    // the documented contract (lazy for AQE)
    assert(!spark.sharedState.cacheManager.isEmpty)
    DedupOps.releaseCaches()
    assert(spark.sharedState.cacheManager.isEmpty)
    // idempotent
    DedupOps.releaseCaches()
  }
}
