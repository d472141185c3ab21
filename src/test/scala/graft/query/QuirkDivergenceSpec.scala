package graft.query

import graft.SparkSpec
import graft.rdf.{RdfTerm, Triple}
import graft.store.TripleStore

/** SURVEY §2.3 documents observable quirks of the reference's `get`
  * that are artifacts, not features. The rebuild intentionally diverges
  * to standard conjunctive-query semantics; this spec pins each
  * divergence so the behavior is a documented decision, not an
  * accident.
  */
class QuirkDivergenceSpec extends SparkSpec {

  private def n(v: String) = RdfTerm.named(v)

  test("literals ARE matchable by value (reference coerces them to IRIs, graph.rs:338-344)") {
    val st = TripleStore.fromTriples(spark, Seq(
      Triple(n("doc1"), n("title"), RdfTerm.raw("cool")),
      Triple(n("doc2"), n("title"), n("cool"))))
    val q = Sparql().select(Seq("$d")).filter(Seq(Seq("$d", "title", "cool")))
    // both the literal "cool" and the IRI <cool> match by value
    assert(st.get(q).map(_.value).sorted == Seq("doc1", "doc2"))
  }

  test("TYPED pattern values restrict the term kind (round-3 verdict #9)") {
    val st = TripleStore.fromTriples(spark, Seq(
      Triple(n("doc1"), n("title"), RdfTerm.raw("cool")),
      Triple(n("doc2"), n("title"), n("cool")),
      Triple(n("doc3"), n("title"), RdfTerm.langLit("cool", "en")),
      Triple(n("doc4"), n("title"), RdfTerm.blank("cool"))))
    def ask(pattern: String): Seq[String] =
      st.get(Sparql.parse(s"select $$d where { $$d title $pattern }"))
        .map(_.value).sorted
    assert(ask("\"cool\"") == Seq("doc1", "doc3")) // raw + lang-tagged literals
    assert(ask("<cool>") == Seq("doc2"))           // IRI only
    assert(ask("_:cool") == Seq("doc4"))           // blank only
    assert(ask("cool") == Seq("doc1", "doc2", "doc3", "doc4")) // bare: any kind
  }

  test("multi-variable BGPs join correctly (reference assumes exactly one var, graph.rs:334)") {
    val st = TripleStore.fromTriples(spark, Seq(
      Triple(n("a"), n("in"), n("x")), Triple(n("x"), n("part_of"), n("top")),
      Triple(n("b"), n("in"), n("y")), Triple(n("y"), n("part_of"), n("other"))))
    val q = Sparql().select(Seq("$s", "$g"))
      .filter(Seq(Seq("$s", "in", "$g"), Seq("$g", "part_of", "top")))
    val rows = st.query(q).collect()
      .map(r => (r.getStruct(0).getString(1), r.getStruct(1).getString(1)))
    assert(rows.toSeq == Seq(("a", "x")))
  }

  test("results are set-distinct (reference: bag with first-index-only dedup bug, graph.rs:371-402)") {
    val st = TripleStore.fromTriples(spark, Seq(
      Triple(n("gabe"), n("is"), n("cool")),
      Triple(n("gabe"), n("is"), n("smart")))) // gabe matches twice
    val q = Sparql().select(Seq("$who", "$what"))
      .filter(Seq(Seq("$who", "is", "$what")))
      .copy(vars = Seq("who")) // project only $who → duplicates collapse
    assert(st.get(q).map(_.value) == Seq("gabe"))
  }

  test("empty first pattern yields empty result, no error (graph.rs:366 returns junk positions)") {
    val st = TripleStore.fromTriples(spark, Seq(Triple(n("a"), n("p"), n("b"))))
    val q = Sparql().select(Seq("$x")).filter(Seq(Seq("$x", "nope", "nothing")))
    assert(st.get(q).isEmpty)
  }
}
