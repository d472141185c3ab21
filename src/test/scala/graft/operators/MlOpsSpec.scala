package graft.operators

import graft.SparkSpec

class MlOpsSpec extends SparkSpec {

  test("MinHashLSH (ml) recovers most exact jaccard pairs") {
    val exact = DedupOps.dedupNgramJaccard(spark, sf0001)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ml = MlOps.dedupMinhashMl(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // approxSimilarityJoin's distance is exact on the hashed-space
    // vectors, so precision is high; recall bounded by hash collisions
    assert((ml intersect exact).size >= (exact.size * 0.8).toInt)
  }

  test("IVF ANN returns ranked neighbors overlapping brute force top-3") {
    val brute = SimilarityOps.simTopkBrute(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = MlOps.simAnnIvf(spark, sf0001).collect()
    assert(ivf.nonEmpty)
    val perQ = ivf.groupBy(_.getLong(0))
    perQ.foreach { case (_, rows) =>
      assert(rows.length <= 3)
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to rows.length))
    }
    val ivfPairs = ivf.map(r => (r.getLong(0), r.getLong(2))).toSet
    // probing 2/16 lists still recovers a meaningful share of true top-3
    assert((ivfPairs intersect brute).nonEmpty)
  }

  test("parquet-partitioned IVF index answers identically to the in-memory probe") {
    // same seed, same k, same probe depth, same ranking contract — the
    // only difference is that the lists live as list_id= partitions on
    // disk, so the results must be row-identical
    val mem = MlOps.simAnnIvf(spark, sf0001).collect().toSeq
    val disk = MlOps.simAnnIvfIndex(spark, sf0001).collect().toSeq
    assert(mem == disk)
  }
}
