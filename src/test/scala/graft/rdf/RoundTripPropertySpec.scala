package graft.rdf

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: serialize(parse) is the identity on triple sets —
  * for arbitrary generated graphs, not just the curated corpus. This is
  * the correctness oracle the reference never had (SURVEY §5: "no query
  * result correctness tests at all"). Deterministic seeds (no
  * scalatest-scalacheck bridge in the offline cache).
  */
class RoundTripPropertySpec extends AnyFunSuite {

  private val word: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).map(_.take(12))

  private val iri: Gen[String] =
    for { a <- word; b <- word } yield s"http://t.example/$a/$b"

  // literal values exercise XML escaping: specials, whitespace, unicode
  private val litVal: Gen[String] = Gen.oneOf(
    word,
    word.map(w => s"<$w> & \"$w\" 'x'"),
    word.map(w => s"$w\n\ttab"),
    word.map(w => s"héllo – $w ✓"))

  private val term: Gen[RdfTerm] = Gen.frequency(
    4 -> iri.map(RdfTerm.named),
    1 -> word.map(w => RdfTerm.blank("b" + w)),
    2 -> litVal.map(RdfTerm.raw),
    1 -> (for { v <- litVal; l <- Gen.oneOf("en", "de", "fr") } yield RdfTerm.langLit(v, l)),
    1 -> (for { v <- litVal; dt <- iri } yield RdfTerm.typedLit(v, dt)))

  private val subject: Gen[RdfTerm] = Gen.frequency(
    4 -> iri.map(RdfTerm.named), 1 -> word.map(w => RdfTerm.blank("b" + w)))

  private val triple: Gen[Triple] =
    for { s <- subject; p <- iri; o <- term } yield Triple(s, RdfTerm.named(p), o)

  test("write ∘ parse = id on arbitrary triple sets (100 seeded cases)") {
    val gen = Gen.listOfN(30, triple)
    var seed = Seed(42L)
    (1 to 100).foreach { i =>
      val ts = gen.pureApply(Gen.Parameters.default, seed).distinct
      seed = seed.next
      val xml = new String(RdfXmlWriter.triplesToRdfXml(ts.iterator), "UTF-8")
      val back = RdfXmlParser.parseString(xml)
      assert(back.toSet == ts.toSet, s"case $i failed")
    }
  }

  test("malformed XML raises a parse error, not silent empty output") {
    intercept[Exception] {
      RdfXmlParser.parseString("<rdf:RDF xmlns:rdf=\"http://www.w3.org/1999/02/22-rdf-syntax-ns#\"><unclosed")
    }
  }

  test("NT line codec: serialize ∘ parseLine = id on arbitrary triples") {
    val gen = Gen.listOfN(30, triple)
    var seed = Seed(7L)
    (1 to 100).foreach { i =>
      val ts = gen.pureApply(Gen.Parameters.default, seed).distinct
      seed = seed.next
      val back = ts.map(t => NTriples.parseLine(NTriples.serialize(t)))
      assert(back.flatten == ts, s"case $i failed")
    }
  }

  test("Turtle grouped blocks: parse ∘ groupBlocks = id on arbitrary triple sets") {
    val gen = Gen.listOfN(30, triple)
    var seed = Seed(11L)
    (1 to 100).foreach { i =>
      val ts = gen.pureApply(Gen.Parameters.default, seed).distinct
      seed = seed.next
      val sorted = ts.sortBy(_.s.render)
      val doc = Turtle.groupBlocks(sorted.iterator).mkString("\n")
      assert(Turtle.parse(doc).toSet == ts.toSet, s"case $i failed:\n$doc")
    }
  }

  private val quad: Gen[Quad] = for {
    t <- triple
    g <- Gen.frequency(
      3 -> iri.map(v => Some(RdfTerm.named(v))),
      1 -> word.map(w => Some(RdfTerm.blank("g" + w))),
      1 -> Gen.const(None))
  } yield Quad(g, t.s, t.p, t.o)

  test("N-Quads line codec: serialize ∘ parseQuadLine = id on arbitrary quads") {
    val gen = Gen.listOfN(30, quad)
    var seed = Seed(13L)
    (1 to 100).foreach { i =>
      val qs = gen.pureApply(Gen.Parameters.default, seed).distinct
      seed = seed.next
      val back = qs.map(q => NTriples.parseQuadLine(NQuads.serialize(q)))
      assert(back.flatten == qs.map(q => (Triple(q.s, q.p, q.o), q.g)), s"case $i failed")
    }
  }

  test("TriG blocks: parseTriG ∘ trigBlocks = id on arbitrary quad sets") {
    val gen = Gen.listOfN(30, quad)
    var seed = Seed(17L)
    (1 to 100).foreach { i =>
      val qs = gen.pureApply(Gen.Parameters.default, seed).distinct
      seed = seed.next
      val sorted = qs.sortBy(q => (q.g.map(_.render).getOrElse(""), q.s.render))
      val doc = Turtle.trigBlocks(sorted.iterator).mkString("\n")
      assert(Turtle.parseTriG(doc).toSet == qs.toSet, s"case $i failed:\n$doc")
    }
  }
}
