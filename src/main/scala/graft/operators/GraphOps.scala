package graft.operators

import graft.store.Dict
import org.apache.spark.graphx.{Edge, Graph => XGraph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics on the triple view via GraphX (BASELINE.json:
  * "GraphX for analytics queries"). Vertex ids come from
  * [[graft.store.Dict.encode]] — dense, deterministic (sorted term
  * order), so results are reproducible and the minimum vertex id of a
  * component is the lexicographically smallest term, which gives
  * connected components a cross-engine-checkable labeling.
  */
object GraphOps {

  /** (vertices (term,id), edges (src,dst,pred)) from the triple view.
    *
    * Partition sizing: iterative GraphX jobs (Pregel) pay per-partition
    * shuffle/task overhead EVERY iteration, so the graph RDDs are
    * coalesced to ~1M edges per partition (capped at the cluster's
    * parallelism). A tiny graph collapses to one partition and the
    * 10-iteration PageRank runs as 10 cheap tasks; a 100 TB triple set
    * still fans out to full parallelism.
    */
  def buildGraph(s: SparkSession, d: String): (DataFrame, XGraph[String, String]) = {
    import s.implicits._
    val t = RdfOps.tripleView(s, d).cache()
    val terms = t.select($"s".as("term")).union(t.select($"o".as("term")))
    val dict = Dict.encode(terms, Seq("term")).cache()
    val edges = t
      .join(dict.toDF("term", "sid"), $"s" === $"term").drop("term")
      .join(dict.toDF("term", "oid"), $"o" === $"term").drop("term")
      .select($"sid", $"oid", $"p")
    // |edges| == |triples|: count the CACHED view, not `edges`, which
    // would execute the dict joins once for the count and again when
    // the RDD materializes
    val nEdges = t.count()
    val parts = math.max(1, math.min(
      s.sparkContext.defaultParallelism, (nEdges / 1000000L).toInt))
    val vRdd = dict.select($"id", $"term").as[(Long, String)].rdd.coalesce(parts)
    val eRdd = edges.select($"sid", $"oid", $"p").as[(Long, Long, String)].rdd
      .map { case (a, b, p) => Edge(a, b, p) }.coalesce(parts)
    (dict, XGraph(vRdd, eRdd))
  }

  /** Vertex degrees — GraphX result joined back to terms; oracle is a
    * plain SQL degree count over the triple view. */
  def graphxDegrees(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (dict, g) = buildGraph(s, d)
    val deg = s.createDataFrame(g.degrees.map(x => (x._1, x._2.toLong)))
      .toDF("id", "degree")
    dict.join(deg, "id").select($"term", $"degree").orderBy($"term")
  }
  val graphxDegreesSql: String =
    s"""${RdfOps.tripleViewSql}
       |SELECT term, count(*) AS degree
       |FROM (SELECT s AS term FROM t UNION ALL SELECT o FROM t) u
       |GROUP BY term ORDER BY term""".stripMargin

  /** Connected components: GraphX result labeled by the smallest term
    * of each component — deterministic because dict ids are
    * sorted-dense, so GraphX's min-vertex-id label IS the
    * lexicographically smallest term. Oracle: reachability closure via
    * a recursive CTE + min per source. */
  def graphxCc(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (dict, g) = buildGraph(s, d)
    val cc = s.createDataFrame(g.connectedComponents().vertices.map(x => (x._1, x._2)))
      .toDF("id", "comp_id")
    cc.join(dict.toDF("term", "id"), "id")
      .join(dict.toDF("comp_term", "comp_id"), "comp_id")
      .select($"term", $"comp_term")
      .orderBy($"term")
  }

  val graphxCcSql: String = {
    val recursiveView = RdfOps.tripleViewSql.replaceFirst("WITH t AS", "WITH RECURSIVE t AS")
    s"""$recursiveView,
       |e AS (SELECT s a, o b FROM t UNION SELECT o, s FROM t),
       |reach(x, y) AS (
       |  SELECT a, a FROM e
       |  UNION
       |  SELECT r.x, e.b FROM reach r JOIN e ON r.y = e.a)
       |SELECT x AS term, min(y) AS comp_term FROM reach GROUP BY x
       |ORDER BY term""".stripMargin
  }

  /** PageRank, 10 static iterations. Oracle-exact despite being
    * float-iterative: both engines run the SAME fixed recurrence —
    * rank₀=1, rankₖ₊₁(v) = 0.15 + 0.85·Σ_{u→v} rankₖ(u)/outdeg(u),
    * final ranks scaled so Σrank = |V| (GraphX's SPARK-18847
    * normalization) — and a 6-decimal round absorbs the ≤1-ulp
    * summation-order wobble. The DuckDB side is a recursive CTE with
    * an iteration counter ([[graphxPagerankSql]]). */
  def graphxPagerank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (dict, g) = buildGraph(s, d)
    val pr = s.createDataFrame(g.staticPageRank(10).vertices.map(x => (x._1, x._2)))
      .toDF("id", "rank")
    dict.join(pr, "id")
      .select($"term", round($"rank", 6).as("rank_r"))
      .orderBy($"rank_r".desc, $"term")
      .limit(20)
  }

  /** The same 10-iteration recurrence as GraphX's staticPageRank, as a
    * DuckDB recursive CTE. Zero-weight self-loop sentinels keep every
    * vertex present each iteration (a vertex with no real in-edges gets
    * 0.15 + 0.85·0, GraphX's `msgSum.getOrElse(0.0)` case); parallel
    * edges each contribute, matching aggregateMessages over the
    * multigraph; the final scan rescales by |V|/Σrank exactly like
    * GraphX's normalizeRankSum. */
  val graphxPagerankSql: String = {
    val recursiveView = RdfOps.tripleViewSql.replaceFirst("WITH t AS", "WITH RECURSIVE t AS")
    s"""$recursiveView,
       |verts AS (SELECT DISTINCT term
       |  FROM (SELECT s AS term FROM t UNION ALL SELECT o FROM t) u),
       |od AS (SELECT s AS src, count(*) AS deg FROM t GROUP BY s),
       |edges2 AS (
       |  SELECT t.s AS src, t.o AS dst, 1.0/od.deg AS w
       |    FROM t JOIN od ON od.src = t.s
       |  UNION ALL
       |  SELECT term, term, 0.0 FROM verts),
       |pr(iter, term, rank) AS (
       |  SELECT 0, term, CAST(1.0 AS DOUBLE) FROM verts
       |  UNION ALL
       |  SELECT pr.iter + 1, e.dst, CAST(0.15 + 0.85 * sum(pr.rank * e.w) AS DOUBLE)
       |  FROM pr JOIN edges2 e ON e.src = pr.term
       |  WHERE pr.iter < 10
       |  GROUP BY pr.iter, e.dst),
       |fin AS (SELECT term, rank FROM pr WHERE iter = 10),
       |tot AS (SELECT sum(rank) AS s, count(*) AS n FROM fin)
       |SELECT term, round(rank * tot.n / tot.s, 6) AS rank_r
       |FROM fin, tot
       |ORDER BY rank_r DESC, term
       |LIMIT 20""".stripMargin
  }

  /** Per-vertex triangle counts over the embedding near-dup graph
    * ([[DedupOps.dedupEmbeddingCosine]] pairs as undirected edges) —
    * triangle density is the standard cohesion measure on a similarity
    * graph (a pair inside a triangle is corroborated by a third
    * neighbor; an isolated pair is not). The RDF triple view is
    * tripartite (customer→nation→region) and has NO triangles, so the
    * similarity graph is the one with signal. Edges arrive canonical
    * (i < j, distinct) from the dedup op. Unlike PageRank
    * (float-iterative, rows-only), triangle counting is exact
    * combinatorics — the DuckDB oracle is the 3-way edge self-join,
    * hash-checked. */
  def graphxTriangles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = DedupOps.dedupEmbeddingCosine(s, d)
    val eRdd = pairs.as[(Long, Long)].rdd
      .map { case (a, b) => Edge(a, b, ()) }
    val g = XGraph.fromEdges(eRdd, ())
      .partitionBy(org.apache.spark.graphx.PartitionStrategy.RandomVertexCut)
    val tri = g.triangleCount().vertices.filter(_._2 > 0)
    s.createDataFrame(tri.map(x => (x._1, x._2.toLong)))
      .toDF("vec_id", "n_tri")
      .orderBy($"vec_id")
  }
  val graphxTrianglesSql: String =
    """WITH und AS (
      |  SELECT a.vec_id AS a, b.vec_id AS b
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |  WHERE list_cosine_similarity(a.embedding, b.embedding) > 0.4),
      |tri AS (
      |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
      |  FROM und e1
      |  JOIN und e2 ON e2.a = e1.b
      |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
      |v AS (SELECT x AS vec_id FROM tri
      |      UNION ALL SELECT y FROM tri
      |      UNION ALL SELECT z FROM tri)
      |SELECT vec_id, count(*) AS n_tri FROM v
      |GROUP BY vec_id ORDER BY vec_id""".stripMargin

  /** Landmark shortest paths (GraphX ShortestPaths): directed hop
    * distance from every vertex to the 5 region landmarks along
    * customer→nation→region edges. Pregel under the hood — each
    * iteration is one message pass along the coalesced edge RDD, the
    * distance map carries only landmark entries (5), and the landmark
    * id set is catalog-scale driver metadata. Exact integer hops, so
    * the DuckDB oracle is a recursive-CTE BFS, hash-checked. */
  def graphxSssp(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (dict, g) = buildGraph(s, d)
    // the landmark set: region names = in_region objects (5 rows —
    // catalog-scale, like the probe-centroid collect in MlOps)
    val regions = RdfOps.tripleView(s, d).filter($"p" === "in_region")
      .select($"o").distinct()
    val lms = dict.join(regions, dict("term") === regions("o"))
      .select($"id").as[Long].collect().toSeq
    val sp = org.apache.spark.graphx.lib.ShortestPaths.run(g, lms)
    val rows = sp.vertices.flatMap { case (vid, m) =>
      m.iterator.map { case (lm, dist) => (vid, lm, dist.toLong) }
    }
    val df = s.createDataFrame(rows).toDF("id", "lm_id", "dist")
    df.join(dict, df("id") === dict("id")).select($"term", $"lm_id", $"dist")
      .join(dict.toDF("lm_term", "lm_id2"), $"lm_id" === $"lm_id2")
      .select($"term", $"lm_term".as("landmark"), $"dist")
      .orderBy($"term", $"landmark")
  }
  val graphxSsspSql: String = {
    val recursiveView = RdfOps.tripleViewSql.replaceFirst("WITH t AS", "WITH RECURSIVE t AS")
    s"""$recursiveView,
       |lms AS (SELECT DISTINCT o AS lm FROM t WHERE p = 'in_region'),
       |reach(term, lm, dist) AS (
       |  SELECT lm, lm, 0 FROM lms
       |  UNION
       |  SELECT t.s, r.lm, r.dist + 1
       |  FROM reach r JOIN t ON t.o = r.term
       |  WHERE r.dist < 8)
       |SELECT term, lm AS landmark, CAST(min(dist) AS BIGINT) AS dist
       |FROM reach GROUP BY term, lm
       |ORDER BY term, landmark""".stripMargin
  }

  /** Rounds for [[graphxLabelProp]] — FIXED, like the pagerank
    * iteration count and the kmeans Lloyd rounds: a convergence loop
    * would make the result depend on float/iteration-order details,
    * while a fixed unrolled count is replayable as SQL CTEs. */
  val LpaRounds = 3

  /** Synchronous majority label propagation over the embedding
    * near-dup graph — community detection that, unlike
    * [[graphxCc]]/[[DedupOps.dedupEmbeddingClusters]], separates
    * DENSELY linked groups instead of merging everything reachable:
    * the near-dup graph's long thin chains (A~B~C where A!~C) collapse
    * to one connected component but to several LPA communities, which
    * is the granularity semantic-dedup keep-one actually wants when a
    * chain drifts topically. Votes are neighbor labels only; the
    * winner is (count DESC, label ASC) — a total order, so the
    * [[LpaRounds]]-round sync state is deterministic and DuckDB
    * replays it CTE-for-CTE. Isolated vectors keep their own label.
    *
    * Shape: each round is one edge⋈label equi-join + two aggregations
    * — 2 shuffles per round over the PAIR graph (dup-volume-sized,
    * not corpus-sized; the brute pair source is the documented
    * baseline with [[DedupOps.dedupEmbeddingLsh]] as the bucketed
    * scale path). A DataFrame loop, not Pregel: 3 unrolled sync
    * rounds need no vertex-program state machine, and each round's
    * aggregate partial-aggregates map-side like any groupBy. */
  def graphxLabelProp(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.Tables.embeddings
    val pairs = DedupOps.dedupEmbeddingCosine(s, d).toDF("a", "b")
    val e = pairs.union(pairs.select($"b", $"a")).toDF("v", "n").cache()
    var lbl = embeddings(s, d)
      .select($"vec_id".as("v"), $"vec_id".cast("long").as("lbl"))
    for (_ <- 1 to LpaRounds) {
      val votes = e.join(lbl.toDF("n", "nl"), "n")
        .groupBy($"v", $"nl").agg(count(lit(1)).as("c"))
        .groupBy($"v").agg(min_by($"nl", struct(-$"c", $"nl")).as("new_lbl"))
      lbl = lbl.join(votes, Seq("v"), "left")
        .select($"v", coalesce($"new_lbl", $"lbl").as("lbl"))
    }
    lbl.select($"v".as("vec_id"), $"lbl".as("community")).orderBy($"vec_id")
  }
  val graphxLabelPropSql: String = {
    val rounds = (1 to LpaRounds).map { r =>
      s"""v$r AS (SELECT e.v, l.lbl AS nl, count(*) AS c
         |        FROM e JOIN l${r - 1} l ON l.v = e.n GROUP BY 1, 2),
         |b$r AS (SELECT v, nl,
         |          row_number() OVER (PARTITION BY v ORDER BY c DESC, nl) AS rn
         |        FROM v$r),
         |l$r AS (SELECT l.v, COALESCE(b.nl, l.lbl) AS lbl
         |        FROM l${r - 1} l LEFT JOIN
         |          (SELECT v, nl FROM b$r WHERE rn = 1) b USING (v))""".stripMargin
    }.mkString(",\n")
    s"""WITH und AS (
       |  SELECT a.vec_id AS a, b.vec_id AS b
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |  WHERE list_cosine_similarity(a.embedding, b.embedding) > 0.4),
       |e AS (SELECT a AS v, b AS n FROM und UNION ALL SELECT b, a FROM und),
       |l0 AS (SELECT vec_id AS v, CAST(vec_id AS BIGINT) AS lbl FROM embeddings),
       |$rounds
       |SELECT v AS vec_id, lbl AS community FROM l$LpaRounds ORDER BY vec_id""".stripMargin
  }
}
