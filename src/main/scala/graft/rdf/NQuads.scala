package graft.rdf

import org.apache.spark.sql.{Dataset, SparkSession}

/** One RDF quad: a triple plus its (optional) named graph — the
  * serialization-level counterpart of the query layer's GRAPH groups
  * over a quad (g, s, p, o) view. `g = None` is a default-graph
  * statement. */
final case class Quad(g: Option[RdfTerm], s: RdfTerm, p: RdfTerm, o: RdfTerm)

/** N-Quads source/sink (W3C N-Quads 1.1): [[NTriples]]' line codec
  * with an optional graph label before the dot. Like N-Triples it is
  * one statement per line, so a single 100 TB file splits across the
  * cluster — this is the scale ingest/export path for NAMED-GRAPH
  * data, pairing with the SPARQL front-end's GRAPH support the same
  * way N-Triples pairs with plain BGPs. */
object NQuads {

  /** Distributed read: one task per input split; malformed lines drop
    * (same policy as [[NTriples.read]]). */
  def read(spark: SparkSession, path: String): Dataset[Quad] = {
    import spark.implicits._
    spark.read.textFile(path).flatMap(line =>
      NTriples.parseQuadLine(line).map { case (t, g) => Quad(g, t.s, t.p, t.o) })
  }

  /** Distributed write: one N-Quads line per quad. */
  def write(ds: Dataset[Quad], path: String): Unit = {
    import ds.sparkSession.implicits._
    ds.map(serialize _).write.mode("overwrite").text(path)
  }

  def serialize(q: Quad): String = {
    val base = s"${NTriples.serializeTerm(q.s)} ${NTriples.serializeTerm(q.p)} " +
      NTriples.serializeTerm(q.o)
    q.g match {
      case Some(g) => s"$base ${NTriples.serializeTerm(g)} ."
      case None    => s"$base ."
    }
  }
}
