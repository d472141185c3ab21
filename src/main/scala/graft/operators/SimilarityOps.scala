package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (128-d float
  * vectors).
  *
  * Brute-force top-k is the correctness baseline (and is exactly what
  * a 100 TB engine runs per-bucket after partition pruning); the LSH
  * variant is the scale path: random-hyperplane signatures bucket the
  * vectors so each query probes one bucket instead of the full table —
  * the crossJoin becomes a bucket-equi-join that shuffles each vector
  * once.
  */
object SimilarityOps {

  /** Brute-force cosine top-3 for query vectors vec_id < 5 (native
    * [[graft.functions.CosineSim]] kernel in the inner loop). */
  def simTopkBrute(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val e = embeddings(s, d).select($"vec_id", $"embedding")
    val q = e.filter($"vec_id" < 5).toDF("qid", "va")
    val c = e.toDF("nid", "vb")
    val scored = q.crossJoin(c).filter($"qid" =!= $"nid")
      .select($"qid", $"nid", expr("cosine_sim(va, vb)").as("cos"))
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"nid")
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"qid", $"rank", $"nid")
      .orderBy($"qid", $"rank")
  }
  val simTopkBruteSql: String =
    """WITH scored AS (
      |  SELECT a.vec_id AS qid, b.vec_id AS nid,
      |    list_cosine_similarity(a.embedding, b.embedding) AS cos
      |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      |  WHERE a.vec_id < 5),
      |ranked AS (
      |  SELECT qid, nid,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
      |  FROM scored)
      |SELECT qid, rank, nid FROM ranked WHERE rank <= 3
      |ORDER BY qid, rank""".stripMargin

  /** Deterministic ±1 hyperplanes: component j of plane i flips on a
    * bit of a splitmix64-style integer mix — reproducible with no RNG
    * state, computable at plan-build time. */
  private def planeSigns(nPlanes: Int, dim: Int): Array[Array[Int]] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.tabulate(nPlanes, dim)((i, j) => if ((mix(i.toLong * 131 + j) & 1L) == 0L) 1 else -1)
  }

  /** LSH-bucketed ANN: 12-bit random-hyperplane signature → bucket;
    * top-3 within the query's bucket. Rows-only check (the signature
    * hash family has no DuckDB equivalent); SimilaritySpec pins
    * recall against the brute-force baseline. */
  def simAnnLsh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val nPlanes = 12
    val signs = planeSigns(nPlanes, 128)
    val sigCols = (0 until nPlanes).map { i =>
      val arr = s"array(${signs(i).mkString(", ")})"
      when(expr(
        s"aggregate(zip_with(v, $arr, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)") > 0,
        lit(1L << i)).otherwise(lit(0L))
    }
    graft.functions.GraftFunctions.register(s)
    val e = embeddings(s, d).select($"vec_id",
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("bucket", sigCols.reduce(_ + _))
      .cache()
    val q = e.filter($"vec_id" < 5).toDF("qid", "va", "bucket")
    val c = e.toDF("nid", "vb", "bucket")
    val scored = q.join(c, "bucket").filter($"qid" =!= $"nid")
      .select($"qid", $"nid", expr("cosine_sim(va, vb)").as("cos"))
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"nid")
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"qid", $"rank", $"nid", round($"cos", 4).as("cos_r"))
      .orderBy($"qid", $"rank")
  }
}
