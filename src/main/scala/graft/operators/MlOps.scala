package graft.operators

import graft.Tables._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.MinHashLSH
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MLlib-backed variants of the dedup / ANN scale paths (SURVEY §7.2
  * step 6): the native implementations in DedupOps/SimilarityOps are
  * the transparent baselines; these show the same operators through
  * spark.ml's fitted-model pipelines. Both are seeded → deterministic,
  * but model internals have no DuckDB equivalent → rows-only checks,
  * with recall pinned against the exact operators in MlOpsSpec.
  */
object MlOps {

  /** Shingle-set MinHashLSH near-dup pairs via approxSimilarityJoin
    * (JaccardDistance ≤ 0.5 ⇔ similarity ≥ 0.5, matching
    * dedup_ngram_jaccard's threshold). */
  def dedupMinhashMl(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sh = documents(s, d)
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", expr(
        """CASE WHEN size(ws) >= 3
          |THEN array_distinct(transform(sequence(0, size(ws) - 3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])))
          |ELSE array() END""".stripMargin)
        .as("gs"))
    // sparse binary vectors over a hashed shingle space
    val dim = 1 << 18
    val toVec = udf { (gs: Seq[String]) =>
      val idx = gs.map(g => math.floorMod(g.hashCode, dim)).distinct.sorted.toArray
      Vectors.sparse(dim, idx, Array.fill(idx.length)(1.0))
    }
    val docs = sh.select($"doc_id", toVec($"gs").as("features")).cache()
    val model = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
      .fit(docs)
    model.approxSimilarityJoin(docs, docs, 0.5, "dist")
      .select(
        col("datasetA.doc_id").as("da"),
        col("datasetB.doc_id").as("db"))
      .filter($"da" < $"db")
      .distinct()
      .orderBy($"da", $"db")
  }

  /** IVF-style ANN: KMeans(16) partitions the vector space; each query
    * probes its 2 nearest centroids and ranks within those lists by
    * exact cosine. At 100 TB the lists are parquet partitions keyed by
    * centroid id — a query touches 2/16ths of the data. */
  def simAnnIvf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val e = embeddings(s, d)
      .select($"vec_id", $"embedding", toVec($"embedding").as("features"))
      .cache()
    // 8 iterations converge on this data (inertia plateaus by ~6); the
    // default 20 just burns fit time — and recall is pinned in MlOpsSpec
    val model = new KMeans().setK(16).setMaxIter(8).setSeed(42L)
      // seeded random init: k-means|| costs several extra job waves to
      // pick 16 starting points, which dwarfs the actual fit here
      .setInitMode("random")
      .setFeaturesCol("features").fit(e)
    val centroids = model.clusterCenters.zipWithIndex
    val assigned = model.transform(e)
      .select($"vec_id", $"embedding", $"prediction".as(("list_id")))

    // queries probe the 2 closest centroids (by exact distance, tiny loop)
    val qProbe = udf { (a: Seq[Float]) =>
      val v = Vectors.dense(a.map(_.toDouble).toArray)
      centroids.map { case (c, i) => (i, Vectors.sqdist(c, v)) }
        .sortBy(x => (x._2, x._1)).take(2).map(_._1)
    }
    val queries = e.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qe"),
        explode(qProbe($"embedding")).as("list_id"))
    val scored = queries.join(assigned, "list_id")
      .filter($"qid" =!= $"vec_id")
      .select($"qid", $"vec_id".as("nid"),
        expr("cosine_sim(qe, embedding)").as("cos"))
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"nid")
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"qid", $"rank", $"nid")
      .orderBy($"qid", $"rank")
  }

  /** The 100 TB shape of [[simAnnIvf]] made literal: the fitted index
    * IS list-partitioned parquet on disk (`list_id=<k>/` directories),
    * and a query reads ONLY its probed list partitions — Spark's
    * partition pruning turns the 2-of-16 probe into 2-of-16 I/O, which
    * is the entire point of IVF at scale. Build cost is paid once per
    * corpus; this op measures build + probe honestly in one call.
    * Same ranking contract as [[simAnnIvf]] (probe depth 2, exact
    * cosine within lists). */
  def simAnnIvfIndex(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val e = embeddings(s, d)
      .select($"vec_id", $"embedding", toVec($"embedding").as("features"))
      .cache()
    val model = new KMeans().setK(16).setMaxIter(8).setSeed(42L)
      // seeded random init: k-means|| costs several extra job waves to
      // pick 16 starting points, which dwarfs the actual fit here
      .setInitMode("random")
      .setFeaturesCol("features").fit(e)
    val centroids = model.clusterCenters.zipWithIndex

    // Index root comes from config so a cluster deployment points it at
    // shared storage (HDFS/S3 URI); the java.io.tmpdir default is only
    // correct for local[k]. All I/O below goes through the Hadoop FS
    // API, so any supported scheme works unchanged.
    val root = s.conf.getOption("spark.graft.indexRoot")
      .getOrElse(System.getProperty("java.io.tmpdir") + "/graft_ivf")
    val dir = s"$root/ivf_${java.util.UUID.randomUUID}"
    model.transform(e)
      .select($"vec_id", $"embedding", $"prediction".as("list_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(dir)

    // probe set: 2 nearest centroids per query, resolved driver-side
    // (the centroid table is tiny — k entries — at any scale)
    val qProbe = udf { (a: Seq[Float]) =>
      val v = Vectors.dense(a.map(_.toDouble).toArray)
      centroids.map { case (c, i) => (i, Vectors.sqdist(c, v)) }
        .sortBy(x => (x._2, x._1)).take(2).map(_._1)
    }
    val queries = e.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qe"),
        explode(qProbe($"embedding")).as("list_id"))
    val probedLists = queries.select("list_id").distinct()
      .collect().map(_.getInt(0)).toSeq
    // partition-pruned scan: only the probed list_id directories are read
    val index = s.read.parquet(dir).filter($"list_id".isin(probedLists: _*))
    val scored = queries.join(index, "list_id")
      .filter($"qid" =!= $"vec_id")
      .select($"qid", $"vec_id".as("nid"),
        expr("cosine_sim(qe, embedding)").as("cos"))
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"nid")
    val out = scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"qid", $"rank", $"nid")
      .orderBy($"qid", $"rank")
    // Materialize the (queries × k — tiny by construction) result so
    // the index directory can be deleted before returning; otherwise
    // the caller would hold a lazy plan over files we remove here, and
    // repeated runs would leak one index tree per call.
    import scala.jdk.CollectionConverters._
    val rows = out.collect().toSeq
    e.unpersist()
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    s.createDataFrame(rows.asJava, out.schema)
  }
}
