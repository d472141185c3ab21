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

    // collect predicate namespaces → prefixes. Split = longest suffix
    // that is a valid NCName (digits/dots/hyphens may appear but not
    // lead), the standard RDF/XML writer rule; ns may be any string.
    val nsMap = new scala.collection.mutable.LinkedHashMap[String, String]()
    def ncChar(c: Char) = Character.isLetterOrDigit(c) || c == '_' || c == '-' || c == '.'
    def ncStart(c: Char) = Character.isLetter(c) || c == '_'
    def splitIri(iri: String): (String, String) = {
      var i = iri.length
      while (i > 0 && ncChar(iri.charAt(i - 1))) i -= 1
      var j = i
      while (j < iri.length && !ncStart(iri.charAt(j))) j += 1
      if (j >= iri.length)
        throw new IllegalArgumentException(
          s"predicate IRI has no NCName suffix, not serializable as RDF/XML: $iri")
      // ns "" → emit without an XML namespace so the bare predicate
      // round-trips verbatim (reference graphs use bare names like "is")
      (iri.substring(0, j), iri.substring(j))
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
