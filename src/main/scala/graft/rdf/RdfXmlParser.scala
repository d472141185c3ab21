package graft.rdf

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable.ArrayBuffer

/** Streaming RDF/XML parser built on StAX (javax.xml.stream — JDK
  * built-in; the offline environment has no Jena). Re-implements the
  * capability of the reference's rio_xml-based source
  * (reference: src/rdf/parser.rs:88-122) from the RDF/XML spec.
  *
  * Supported constructs (everything appearing in the reference's
  * models/ corpus plus the common remainder of the spec):
  *   - rdf:RDF root, rdf:Description and typed node elements
  *   - rdf:about / rdf:ID / rdf:nodeID / anonymous blank nodes
  *   - property elements with rdf:resource / rdf:nodeID / literal text
  *   - nested node elements, rdf:parseType="Resource" and "Literal"
  *   - rdf:parseType="Collection" (first/rest/nil lists)
  *   - containers: rdf:li → rdf:_1, rdf:_2, … per node element
  *   - xml:lang and xml:base inheritance (relative IRI resolution),
  *     rdf:datatype typed literals
  *   - property attributes on node elements
  *
  * RDF/XML is not line-splittable, so distribution happens per FILE:
  * [[graft.store.TripleStore.fromRdf]] parallelizes a list of files
  * with one parser instance per task via mapPartitions.
  */
object RdfXmlParser {

  private val RdfNs = Rdf.RdfNs
  private val XmlNs = "http://www.w3.org/XML/1998/namespace"

  def parseFile(path: String): Seq[Triple] = {
    val in = new java.io.BufferedInputStream(new java.io.FileInputStream(path))
    try parseStream(in)
    finally in.close()
  }

  def parseString(xml: String): Seq[Triple] =
    parseStream(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))

  def parseStream(in: java.io.InputStream): Seq[Triple] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    val r = f.createXMLStreamReader(in)
    val p = new Parser(r)
    try p.parse()
    finally r.close()
  }

  private final case class Ctx(lang: Option[String], base: Option[String])

  private final class Parser(r: XMLStreamReader) {
    private val out = new ArrayBuffer[Triple]()
    private var blankCounter = 0
    private def freshBlank(): RdfTerm = {
      blankCounter += 1; RdfTerm.blank(s"genid$blankCounter")
    }

    def parse(): Seq[Triple] = {
      // advance to the document element; if it is rdf:RDF, its children
      // are node elements; otherwise the root itself is a node element.
      while (r.hasNext && r.getEventType != XMLStreamConstants.START_ELEMENT) r.next()
      if (!r.hasNext) return out.toSeq
      if (r.getNamespaceURI == RdfNs && r.getLocalName == "RDF") {
        val ctx0 = ctx(Ctx(None, None))
        var depth = 0
        while (r.hasNext && depth >= 0) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT => nodeElement(ctx0)
            case XMLStreamConstants.END_ELEMENT   => depth -= 1
            case _                                => ()
          }
        }
      } else nodeElement(Ctx(None, None))
      out.toSeq
    }

    /** Resolve an IRI reference against the in-scope xml:base. */
    private def resolve(iri: String, base: Option[String]): String =
      base match {
        case Some(b) if !iri.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*") =>
          try new java.net.URI(b).resolve(iri).toString
          catch { case _: Exception => iri }
        case _ => iri
      }

    /** Parse a node element the reader is positioned ON; consumes
      * through its END_ELEMENT. Returns the subject term. */
    private def nodeElement(inherited: Ctx): RdfTerm = {
      val ns = r.getNamespaceURI
      val ln = r.getLocalName
      val c = ctx(inherited)
      val lang = c.lang

      var subject: RdfTerm = null
      val propAttrs = new ArrayBuffer[(String, String)]()
      var i = 0
      while (i < r.getAttributeCount) {
        val ans = Option(r.getAttributeNamespace(i)).getOrElse("")
        val aln = r.getAttributeLocalName(i)
        val av  = r.getAttributeValue(i)
        (ans, aln) match {
          case (RdfNs, "about")  => subject = RdfTerm.named(resolve(av, c.base))
          case (RdfNs, "ID")     => subject = RdfTerm.named(resolve("#" + av, c.base))
          case (RdfNs, "nodeID") => subject = RdfTerm.blank(av)
          case (XmlNs, _)        => () // xml:lang/xml:base handled via ctx
          case (RdfNs, _)        => ()
          case _                 => propAttrs += ((ans + aln, av))
        }
        i += 1
      }
      if (subject == null) subject = freshBlank()

      if (!(ns == RdfNs && ln == "Description"))
        out += Triple(subject, RdfTerm.named(Rdf.TypeIri), RdfTerm.named(ns + ln))
      propAttrs.foreach { case (p, v) =>
        out += Triple(subject, RdfTerm.named(p), literal(v, lang, None))
      }

      var liCounter = 0
      var done = false
      while (!done && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            // spec numbers rdf:li elements only — a non-li property
            // between two li's must not skip an rdf:_n index
            if (r.getNamespaceURI == RdfNs && r.getLocalName == "li") liCounter += 1
            propertyElement(subject, c, liCounter)
          case XMLStreamConstants.END_ELEMENT => done = true
          case _                              => ()
        }
      }
      subject
    }

    /** Parse a property element the reader is positioned ON. */
    private def propertyElement(subject: RdfTerm, inherited: Ctx, liIndex: Int): Unit = {
      val ns = Option(r.getNamespaceURI).getOrElse("")
      val ln = r.getLocalName
      val predIri =
        if (ns == RdfNs && ln == "li") RdfNs + "_" + liIndex else ns + ln
      val pred = RdfTerm.named(predIri)
      val c = ctx(inherited)
      val lang = c.lang

      var resource: RdfTerm = null
      var datatype: Option[String] = None
      var parseType: Option[String] = None
      var reifyIri: Option[String] = None
      val propAttrs = new ArrayBuffer[(String, String)]()
      var i = 0
      while (i < r.getAttributeCount) {
        val ans = Option(r.getAttributeNamespace(i)).getOrElse("")
        val aln = r.getAttributeLocalName(i)
        val av  = r.getAttributeValue(i)
        (ans, aln) match {
          case (RdfNs, "resource")  => resource = RdfTerm.named(resolve(av, c.base))
          case (RdfNs, "nodeID")    => resource = RdfTerm.blank(av)
          case (RdfNs, "datatype")  => datatype = Some(av)
          case (RdfNs, "parseType") => parseType = Some(av)
          case (RdfNs, "ID")        => reifyIri = Some(resolve("#" + av, c.base))
          case (XmlNs, _)           => ()
          case _                    => propAttrs += ((ans + aln, av))
        }
        i += 1
      }

      /** Emit the statement triple; rdf:ID on a property element
        * additionally REIFIES it (spec §2.17): the id names an
        * rdf:Statement with subject/predicate/object triples. */
      def emit(obj: RdfTerm): Unit = {
        out += Triple(subject, pred, obj)
        reifyIri.foreach { id =>
          val stmt = RdfTerm.named(id)
          out += Triple(stmt, RdfTerm.named(Rdf.TypeIri), RdfTerm.named(RdfNs + "Statement"))
          out += Triple(stmt, RdfTerm.named(RdfNs + "subject"), subject)
          out += Triple(stmt, RdfTerm.named(RdfNs + "predicate"), pred)
          out += Triple(stmt, RdfTerm.named(RdfNs + "object"), obj)
        }
      }

      parseType match {
        case Some("Resource") =>
          // object is a fresh blank whose children are property elements
          val obj = freshBlank()
          emit(obj)
          var liCounter = 0
          var done = false
          while (!done && r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT =>
                if (r.getNamespaceURI == RdfNs && r.getLocalName == "li") liCounter += 1
                propertyElement(obj, c, liCounter)
              case XMLStreamConstants.END_ELEMENT => done = true
              case _                              => ()
            }
          }
        case Some("Literal") =>
          val xml = captureXmlLiteral()
          emit(RdfTerm.typedLit(xml, RdfNs + "XMLLiteral"))
        case Some("Collection") =>
          val items = new ArrayBuffer[RdfTerm]()
          var done = false
          while (!done && r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT => items += nodeElement(c)
              case XMLStreamConstants.END_ELEMENT   => done = true
              case _                                => ()
            }
          }
          var tail: RdfTerm = RdfTerm.named(RdfNs + "nil")
          items.reverseIterator.foreach { item =>
            val cell = freshBlank()
            out += Triple(cell, RdfTerm.named(RdfNs + "first"), item)
            out += Triple(cell, RdfTerm.named(RdfNs + "rest"), tail)
            tail = cell
          }
          emit(tail)
        case _ =>
          if (resource != null || propAttrs.nonEmpty) {
            val obj = if (resource != null) resource else freshBlank()
            emit(obj)
            propAttrs.foreach { case (p, v) =>
              out += Triple(obj, RdfTerm.named(p), literal(v, lang, None))
            }
            skipToEnd()
          } else {
            // text literal or nested node element
            val text = new java.lang.StringBuilder()
            var nested: RdfTerm = null
            var done = false
            while (!done && r.hasNext) {
              r.next() match {
                case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
                  text.append(r.getText)
                case XMLStreamConstants.START_ELEMENT =>
                  nested = nodeElement(c)
                case XMLStreamConstants.END_ELEMENT => done = true
                case _                              => ()
              }
            }
            val obj =
              if (nested != null) nested
              else literal(text.toString, lang, datatype)
            emit(obj)
          }
      }
    }

    private def literal(v: String, lang: Option[String], datatype: Option[String]): RdfTerm =
      datatype match {
        case Some(dt) => RdfTerm.typedLit(v, dt)
        case None => lang match {
          case Some(l) => RdfTerm.langLit(v, l)
          case None    => RdfTerm.raw(v)
        }
      }

    /** In-scope xml:lang / xml:base, read from the current element's
      * attributes with inheritance from ancestors. */
    private def ctx(inherited: Ctx): Ctx = {
      // tri-state for xml:lang: absent → inherit; present-empty → RESET
      // to no language (xml:lang="" explicitly clears inheritance);
      // present-nonempty → that language.
      var lang: Option[Option[String]] = None
      var base: Option[String] = None
      var i = 0
      while (i < r.getAttributeCount) {
        if (r.getAttributeNamespace(i) == XmlNs && r.getAttributeLocalName(i) == "lang")
          lang = Some(Some(r.getAttributeValue(i)).filter(_.nonEmpty))
        if (r.getAttributeNamespace(i) == XmlNs && r.getAttributeLocalName(i) == "base")
          base = Some(r.getAttributeValue(i)).filter(_.nonEmpty)
        i += 1
      }
      Ctx(lang.getOrElse(inherited.lang), base.orElse(inherited.base))
    }

    /** Serialize the raw XML content of a parseType="Literal" element,
      * keeping element/attribute prefixes and emitting the namespace
      * declarations present on each element (XMLLiteral values must
      * stay namespace-meaningful when re-serialized). */
    private def captureXmlLiteral(): String = {
      val sb = new java.lang.StringBuilder()
      def qname(prefix: String, local: String): String =
        if (prefix == null || prefix.isEmpty) local else prefix + ":" + local
      var depth = 0
      var done = false
      while (!done && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            depth += 1
            sb.append('<').append(qname(r.getPrefix, r.getLocalName))
            var n = 0
            while (n < r.getNamespaceCount) {
              val p = r.getNamespacePrefix(n)
              sb.append(' ')
                .append(if (p == null || p.isEmpty) "xmlns" else "xmlns:" + p)
                .append("=\"").append(r.getNamespaceURI(n)).append('"')
              n += 1
            }
            var i = 0
            while (i < r.getAttributeCount) {
              sb.append(' ').append(qname(r.getAttributePrefix(i), r.getAttributeLocalName(i)))
                .append("=\"").append(r.getAttributeValue(i)).append('"')
              i += 1
            }
            sb.append('>')
          case XMLStreamConstants.END_ELEMENT =>
            if (depth == 0) done = true
            else {
              depth -= 1
              sb.append("</").append(qname(r.getPrefix, r.getLocalName)).append('>')
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            sb.append(r.getText)
          case _ => ()
        }
      }
      sb.toString
    }

    private def skipToEnd(): Unit = {
      var depth = 0
      var done = false
      while (!done && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => depth += 1
          case XMLStreamConstants.END_ELEMENT =>
            if (depth == 0) done = true else depth -= 1
          case _ => ()
        }
      }
    }
  }
}
