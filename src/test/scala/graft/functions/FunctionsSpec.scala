package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {

  test("cosine_sim matches hand-computed values on float and double arrays") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 0.0f), Array(1.0f, 1.0f), 1.0 / math.sqrt(2)),
      (Array(3.0f, 4.0f), Array(3.0f, 4.0f), 1.0),
      (Array(1.0f, 2.0f), Array(-1.0f, -2.0f), -1.0)
    ).toDF("a", "b", "want")
    val got = df.select(expr("cosine_sim(a, b)").as("got"), $"want").collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
    // zero vector → 0, not NaN
    val z = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
      .select(expr("cosine_sim(a, b)")).head().getDouble(0)
    assert(z == 0.0)
  }

  test("simhash_agg over rows equals scalar simhash of concatenated tokens") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rows = Seq(("g1", "the quick brown"), ("g1", "fox jumps high"),
      ("g2", "completely other words"))
    val grouped = rows.toDF("g", "text")
      .groupBy($"g").agg(expr("simhash_agg(split(text,' '))").as("sig"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val concat = Seq(("g1", "the quick brown fox jumps high"),
      ("g2", "completely other words"))
      .toDF("g", "text")
      .select($"g", expr("simhash(split(text,' '))").as("sig"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(grouped == concat)
  }

  test("dict ids are dense, deterministic, sorted") {
    import spark.implicits._
    val df = Seq("c", "a", "b", "a", "c").toDF("term")
    val enc = graft.store.Dict.encode(df, Seq("term")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    assert(enc.toSeq == Seq(("a", 0L), ("b", 1L), ("c", 2L)))
  }

  test("bgp compiler: patterns with no shared variable cross-join") {
    import spark.implicits._
    val t = Seq(("a", "p1", "x"), ("b", "p2", "y")).toDF("s", "p", "o")
    val q = graft.query.Sparql().select(Seq("$u", "$v"))
      .filter(Seq(Seq("$u", "p1", "x"), Seq("$v", "p2", "y")))
    val rows = graft.query.Bgp.compile(t, q).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet == Set(("a", "b")))
  }

  test("bgp compiler: repeated variable inside one pattern = self equality") {
    import spark.implicits._
    val t = Seq(("a", "likes", "a"), ("a", "likes", "b")).toDF("s", "p", "o")
    val q = graft.query.Sparql().select(Seq("$x"))
      .filter(Seq(Seq("$x", "likes", "$x")))
    assert(graft.query.Bgp.compile(t, q).collect().map(_.getString(0)).toSeq == Seq("a"))
  }

  test("rdf_xml_source fixture parses to the documented VALUES rows") {
    val rows = graft.operators.RdfXmlOps.xmlSource(spark, sf0001).collect()
    assert(rows.length == 5)
    assert(rows.head.getString(0) == "http://g.test/alice")
  }
}
