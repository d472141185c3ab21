package graft.rdf

import graft.SparkSpec

class NTriplesSpec extends SparkSpec {

  private val nasty: Seq[Triple] = Seq(
    Triple(RdfTerm.named("http://g.test/a"), RdfTerm.named("http://g.test/p"),
      RdfTerm.named("http://g.test/b")),
    Triple(RdfTerm.blank("b1"), RdfTerm.named("http://g.test/p"),
      RdfTerm.raw("say \"hi\"\nline2\ttab\\done")),
    Triple(RdfTerm.named("http://g.test/a"), RdfTerm.named("http://g.test/label"),
      RdfTerm.langLit("héllo wörld", "de-AT")),
    Triple(RdfTerm.named("http://g.test/a"), RdfTerm.named("http://g.test/age"),
      RdfTerm.typedLit("30", "http://www.w3.org/2001/XMLSchema#int")),
    Triple(RdfTerm.named("http://g.test/a"), RdfTerm.named("http://g.test/note"),
      RdfTerm.raw("dot . inside and <angle> and 'quote'")))

  test("line codec round-trips every term kind and escape") {
    nasty.foreach { t =>
      val line = NTriples.serialize(t)
      assert(NTriples.parseLine(line) === Some(t), s"line: $line")
    }
  }

  test("unicode escapes parse (\\u and \\U)") {
    val line = "<http://g.test/a> <http://g.test/p> \"\\u0041\\U0001F600\" ."
    val t = NTriples.parseLine(line).get
    assert(t.o.value === "A😀")
  }

  test("comments and blank lines are skipped; junk is dropped") {
    assert(NTriples.parseLine("# a comment") === None)
    assert(NTriples.parseLine("   ") === None)
    assert(NTriples.parseLine("not a triple at all") === None)
    assert(NTriples.parseLine("<unterminated iri ...") === None)
    // truncated \u/\U escapes hit the parser's fail-fast (round-8
    // advice #2), not a StringIndexOutOfBounds from substring
    assert(NTriples.parseLine("<http://g.test/s> <http://g.test/p> \"a\\u00") === None)
    assert(NTriples.parseLine("<http://g.test/s> <http://g.test/p> \"a\\U0001F6") === None)
  }

  test("terminating dot abutting the final term parses (spec-valid NT)") {
    // round-3 verdict #1c: these externally-producible forms were
    // silently dropped because the blank label / lang tag absorbed the dot
    val b = NTriples.parseLine("<http://g.test/s> <http://g.test/p> _:b1.").get
    assert(b.o === RdfTerm.blank("b1"))
    val l = NTriples.parseLine("<http://g.test/s> <http://g.test/p> \"x\"@en.").get
    assert(l.o === RdfTerm.langLit("x", "en"))
    val l2 = NTriples.parseLine("<http://g.test/s> <http://g.test/p> \"x\"@en-GB.").get
    assert(l2.o === RdfTerm.langLit("x", "en-GB"))
    // the previously-working abutting forms stay working
    assert(NTriples.parseLine("<http://g.test/s> <http://g.test/p> \"x\".").get.o
      === RdfTerm.raw("x"))
    assert(NTriples.parseLine("<http://g.test/s> <http://g.test/p> <http://g.test/o>.").get.o
      === RdfTerm.named("http://g.test/o"))
  }

  test("readCounted surfaces silently-dropped malformed lines") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_nt_count")
    val f = tmp.resolve("part.nt")
    java.nio.file.Files.write(f, java.util.Arrays.asList(
      "<http://g.test/s> <http://g.test/p> _:ok.",
      "# comment lines are not malformed",
      "",
      "this line is junk",
      "<unterminated <http://g.test/p> \"x\" ."))
    val (ds, dropped) = NTriples.readCounted(spark, tmp.toString)
    assert(ds.count() === 1)
    assert(dropped.value === 2)
  }

  test("distributed write/read round-trips through spark.read.text") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_nt_spec").toString
    val ds = spark.createDataset(nasty)
    NTriples.write(ds, tmp)
    val back = NTriples.read(spark, tmp).collect().toSet
    assert(back === nasty.toSet)
  }

  test("n-quads: graph labels parse, default-graph lines stay, round-trip holds") {
    import spark.implicits._
    // named graph, blank graph label, default graph, junk
    val tmp = java.nio.file.Files.createTempDirectory("graft_nq_spec")
    val f = tmp.resolve("q.nq")
    java.nio.file.Files.write(f, java.util.Arrays.asList(
      "<http://g.test/s> <http://g.test/p> \"v\" <http://g.test/G1> .",
      "<http://g.test/s> <http://g.test/p> <http://g.test/o> _:g2 .",
      "<http://g.test/s2> <http://g.test/p> \"dflt\"@en .",
      "not a quad at all"))
    val qs = NQuads.read(spark, tmp.toString).collect()
    assert(qs.length == 3)
    val byO = qs.map(q => q.o.value -> q.g).toMap
    assert(byO("v").contains(RdfTerm.named("http://g.test/G1")))
    assert(byO("http://g.test/o").contains(RdfTerm.blank("g2")))
    assert(byO("dflt").isEmpty)
    // write/read round-trip incl. the default-graph quad
    val out = java.nio.file.Files.createTempDirectory("graft_nq_rt").toString
    NQuads.write(spark.createDataset(qs.toSeq), out)
    assert(NQuads.read(spark, out).collect().toSet == qs.toSet)
  }
}
