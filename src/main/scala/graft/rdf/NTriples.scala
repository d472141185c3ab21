package graft.rdf

import org.apache.spark.sql.{Dataset, SparkSession}

/** N-Triples source/sink (W3C N-Triples 1.1, the line-oriented RDF
  * serialization). The reference only speaks RDF/XML
  * (reference: src/rdf/parser.rs:88-122), which is NOT splittable — a
  * 100 TB RDF/XML corpus can only parallelize per file. N-Triples is
  * one triple per line, so `spark.read.text` splits a single huge file
  * across the cluster and parsing is embarrassingly parallel; this is
  * the scale ingest/export path, with RDF/XML kept for parity.
  *
  * Supported: IRIs, blank nodes, plain / language-tagged /
  * `^^`-datatyped literals, `\"` `\\` `\n` `\r` `\t` `\uXXXX`
  * `\UXXXXXXXX` escapes, comment and blank lines.
  */
object NTriples {

  /** Distributed read: one task per input split, malformed lines are
    * dropped (use [[readCounted]] to count them). */
  def read(spark: SparkSession, path: String): Dataset[Triple] = {
    import spark.implicits._
    spark.read.textFile(path).flatMap(parseLine _)
  }

  /** [[read]] plus a malformed-line count: silent drops on
    * externally-produced NT are data loss, so the count makes them
    * observable. The accumulator is valid after the dataset's first
    * action (standard Spark accumulator semantics — it can overcount
    * under task retries, which is fine for a data-quality signal). */
  def readCounted(
      spark: SparkSession,
      path: String): (Dataset[Triple], org.apache.spark.util.LongAccumulator) = {
    import spark.implicits._
    val dropped = spark.sparkContext.longAccumulator("nt_malformed_lines")
    val ds = spark.read.textFile(path).flatMap { line =>
      val t = parseLine(line)
      if (t.isEmpty) {
        val trimmed = line.trim
        if (trimmed.nonEmpty && !trimmed.startsWith("#")) dropped.add(1)
      }
      t
    }
    (ds, dropped)
  }

  /** Distributed write: one NT line per triple. */
  def write(ds: Dataset[Triple], path: String): Unit = {
    import ds.sparkSession.implicits._
    ds.map(serialize _).write.mode("overwrite").text(path)
  }

  // ------------------------------------------------------------------ //
  // line codec (pure functions — safe to ship to executors)            //
  // ------------------------------------------------------------------ //

  def serialize(t: Triple): String =
    s"${term(t.s)} ${term(t.p)} ${term(t.o)} ."

  private def term(t: RdfTerm): String = t.kind match {
    case RdfTerm.Named => "<" + t.value + ">"
    case RdfTerm.Blank => "_:" + t.value
    case RdfTerm.Raw   => "\"" + escape(t.value) + "\""
    case RdfTerm.Lang  => "\"" + escape(t.value) + "\"@" + t.lang.getOrElse("")
    case RdfTerm.Typed => "\"" + escape(t.value) + "\"^^<" + t.datatype.getOrElse("") + ">"
    case other         => sys.error(s"unknown term kind: $other")
  }

  private def escape(v: String): String = {
    val sb = new java.lang.StringBuilder(v.length + 8)
    v.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c    => sb.append(c)
    }
    sb.toString
  }

  def parseLine(line: String): Option[Triple] = {
    val s = line.trim
    if (s.isEmpty || s.startsWith("#")) return None
    val p = new LineParser(s)
    try {
      val subj = p.subject()
      p.ws()
      val pred = p.iri()
      p.ws()
      val obj = p.obj()
      p.ws()
      p.expect('.')
      Some(Triple(subj, pred, obj))
    } catch { case _: Exception => None }
  }

  /** N-Quads 1.1 line (`s p o [graph] .`): the same codec with an
    * optional graph label (IRI or blank node) before the dot; a
    * 3-term line is a default-graph statement. Used by [[NQuads]]. */
  private[rdf] def parseQuadLine(line: String): Option[(Triple, Option[RdfTerm])] = {
    val s = line.trim
    if (s.isEmpty || s.startsWith("#")) return None
    val p = new LineParser(s)
    try {
      val subj = p.subject()
      p.ws()
      val pred = p.iri()
      p.ws()
      val obj = p.obj()
      p.ws()
      val g = if (p.peekChar == '.') None else Some(p.subject())
      p.ws()
      p.expect('.')
      Some((Triple(subj, pred, obj), g))
    } catch { case _: Exception => None }
  }

  private[rdf] def serializeTerm(t: RdfTerm): String = term(t)

  private final class LineParser(s: String) {
    private var i = 0
    def peekChar: Char = if (i < s.length) s.charAt(i) else '\u0000'
    def ws(): Unit = while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t')) i += 1
    def expect(c: Char): Unit = {
      if (i >= s.length || s.charAt(i) != c) sys.error(s"expected '$c' at $i")
      i += 1
    }
    def subject(): RdfTerm =
      if (i < s.length && s.charAt(i) == '_') blank() else iri()
    def obj(): RdfTerm =
      if (i >= s.length) sys.error("eof")
      else s.charAt(i) match {
        case '<' => iri()
        case '_' => blank()
        case '"' => literal()
        case c   => sys.error(s"bad object start '$c'")
      }
    def iri(): RdfTerm = {
      expect('<')
      val j = s.indexOf('>', i)
      if (j < 0) sys.error("unterminated IRI")
      val v = s.substring(i, j); i = j + 1
      RdfTerm.named(v)
    }
    def blank(): RdfTerm = {
      expect('_'); expect(':')
      val start = i
      while (i < s.length && !s.charAt(i).isWhitespace) i += 1
      var end = i
      // A blank label may contain dots but cannot END with one
      // (N-Triples 1.1 BLANK_NODE_LABEL), so a trailing '.' is the
      // statement terminator abutting the label — "<s> <p> _:b1." is
      // spec-valid. Back off one char so expect('.') consumes it;
      // pre-round-4 the label absorbed the dot and the line was
      // silently dropped.
      if (end > start && s.charAt(end - 1) == '.') { end -= 1; i -= 1 }
      RdfTerm.blank(s.substring(start, end))
    }
    def literal(): RdfTerm = {
      expect('"')
      val sb = new java.lang.StringBuilder()
      var closed = false
      while (!closed) {
        if (i >= s.length) sys.error("unterminated literal")
        s.charAt(i) match {
          case '"' => closed = true; i += 1
          case '\\' =>
            i += 1
            s.charAt(i) match {
              case '"'  => sb.append('"'); i += 1
              case '\\' => sb.append('\\'); i += 1
              case 'n'  => sb.append('\n'); i += 1
              case 'r'  => sb.append('\r'); i += 1
              case 't'  => sb.append('\t'); i += 1
              case 'b'  => sb.append('\b'); i += 1
              case 'f'  => sb.append('\f'); i += 1
              case 'u' =>
                i += 1
                // bounds-check before substring: a truncated escape must
                // surface as the parser's fail-fast, not an opaque
                // StringIndexOutOfBounds from an executor
                if (i + 4 > s.length) sys.error("truncated \\u escape")
                sb.append(Integer.parseInt(s.substring(i, i + 4), 16).toChar); i += 4
              case 'U' =>
                i += 1
                if (i + 8 > s.length) sys.error("truncated \\U escape")
                sb.appendCodePoint(Integer.parseInt(s.substring(i, i + 8), 16)); i += 8
              case c => sys.error(s"bad escape \\$c")
            }
          case c => sb.append(c); i += 1
        }
      }
      val v = sb.toString
      if (i < s.length && s.charAt(i) == '@') {
        i += 1
        val start = i
        // LANGTAG is [a-zA-Z]+('-'[a-zA-Z0-9]+)* — scan that char class
        // instead of "until whitespace" so the terminating dot of
        // `"x"@en.` (spec-valid, dot abutting the tag) is left for
        // expect('.') rather than absorbed into the tag
        while (i < s.length && {
          val c = s.charAt(i)
          (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
            (c >= '0' && c <= '9') || c == '-'
        }) i += 1
        RdfTerm.langLit(v, s.substring(start, i))
      } else if (i + 1 < s.length && s.charAt(i) == '^' && s.charAt(i + 1) == '^') {
        i += 2
        val dt = iri()
        RdfTerm.typedLit(v, dt.value)
      } else RdfTerm.raw(v)
    }
  }
}
