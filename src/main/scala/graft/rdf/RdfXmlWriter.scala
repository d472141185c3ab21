package graft.rdf

import javax.xml.stream.XMLOutputFactory
import java.io.ByteArrayOutputStream

/** RDF/XML serializer — rebuild of the reference's `RdfBuilder`
  * (reference: src/rdf/builder.rs:11-40) on the JDK's StAX writer.
  *
  * Emits the plain `rdf:Description` form: one Description per subject
  * (grouped over the input iterator), `rdf:about`/`rdf:nodeID` for the
  * subject, `rdf:resource`/`rdf:nodeID` for resource objects, text
  * content with `xml:lang`/`rdf:datatype` for literals. Predicate IRIs
  * are split at the last '#' or '/' into (namespace, local-name) and
  * bound to generated prefixes.
  */
object RdfXmlWriter {

  def triplesToRdfXml(triples: Iterator[Triple]): Array[Byte] = {
    // group by subject preserving first-seen order (small driver-side
    // buffers only; large exports go through TripleStore.toRdfPartitioned)
    val bySubject = new scala.collection.mutable.LinkedHashMap[RdfTerm, scala.collection.mutable.ArrayBuffer[(RdfTerm, RdfTerm)]]()
    triples.foreach { t =>
      bySubject.getOrElseUpdate(t.s, new scala.collection.mutable.ArrayBuffer) += ((t.p, t.o))
    }

    // collect predicate namespaces → prefixes
    val nsMap = new scala.collection.mutable.LinkedHashMap[String, String]()
    def splitIri(iri: String): (String, String) = {
      val cut = math.max(iri.lastIndexOf('#'), iri.lastIndexOf('/'))
      // local name must be a valid NCName start; fall back further left if not
      var c = cut
      while (c > 0 && c < iri.length - 1 && !Character.isLetter(iri.charAt(c + 1)) && iri.charAt(c + 1) != '_')
        c = math.max(iri.lastIndexOf('#', c - 1), iri.lastIndexOf('/', c - 1))
      // no splittable namespace → emit without an XML namespace so the
      // predicate IRI round-trips verbatim (ns "" on re-parse)
      if (c <= 0 || c >= iri.length - 1) ("", iri)
      else (iri.substring(0, c + 1), iri.substring(c + 1))
    }
    bySubject.valuesIterator.flatten.foreach { case (p, _) =>
      val (ns, _) = splitIri(p.value)
      if (ns.nonEmpty && !nsMap.contains(ns)) nsMap(ns) = s"ns${nsMap.size}"
    }

    val bos = new ByteArrayOutputStream()
    val w = XMLOutputFactory.newInstance().createXMLStreamWriter(bos, "UTF-8")
    w.writeStartDocument("UTF-8", "1.0")
    w.writeStartElement("rdf", "RDF", Rdf.RdfNs)
    w.writeNamespace("rdf", Rdf.RdfNs)
    nsMap.foreach { case (ns, pfx) => w.writeNamespace(pfx, ns) }

    bySubject.foreach { case (subj, pos) =>
      w.writeStartElement("rdf", "Description", Rdf.RdfNs)
      subj.kind match {
        case RdfTerm.Blank => w.writeAttribute("rdf", Rdf.RdfNs, "nodeID", subj.value)
        case _             => w.writeAttribute("rdf", Rdf.RdfNs, "about", subj.value)
      }
      pos.foreach { case (p, o) =>
        val (ns, local) = splitIri(p.value)
        if (ns.isEmpty) w.writeStartElement(local)
        else w.writeStartElement(nsMap(ns), local, ns)
        o.kind match {
          case RdfTerm.Named => w.writeAttribute("rdf", Rdf.RdfNs, "resource", o.value)
          case RdfTerm.Blank => w.writeAttribute("rdf", Rdf.RdfNs, "nodeID", o.value)
          case RdfTerm.Lang =>
            w.writeAttribute("xml:lang", o.lang.getOrElse(""))
            w.writeCharacters(o.value)
          case RdfTerm.Typed =>
            w.writeAttribute("rdf", Rdf.RdfNs, "datatype", o.datatype.getOrElse(""))
            w.writeCharacters(o.value)
          case _ => w.writeCharacters(o.value)
        }
        w.writeEndElement()
      }
      w.writeEndElement()
    }
    w.writeEndElement()
    w.writeEndDocument()
    w.close()
    bos.toByteArray
  }
}
