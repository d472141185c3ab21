package graft.rdf

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Turtle source/sink (W3C Turtle 1.1, the subset real exports use).
  * The reference speaks only RDF/XML (src/rdf/parser.rs:88-122); the
  * rebuild adds N-Triples as the splittable scale path and Turtle as
  * the interchange format RDF users actually write by hand.
  *
  * Supported: `@prefix`/`@base` (and SPARQL-style `PREFIX`/`BASE`),
  * prefixed names, `<iri>` refs (relative refs resolve against the
  * base), the `a` keyword, `_:` blank nodes, plain / `@lang` /
  * `^^`-typed literals with the N-Triples escape set, integer /
  * decimal / boolean shorthand (→ xsd-typed literals), `;` predicate
  * lists, `,` object lists, and `#` comments. NOT supported — fail
  * fast, never misparse: blank-node property lists `[ … ]`,
  * collections `( … )`, and triple-quoted strings.
  *
  * Turtle statements span lines (a `;` list can run pages), so files
  * parse PER FILE like RDF/XML — parallelism comes from the file
  * count. N-Triples stays the line-splittable path for single huge
  * files; Turtle is for interchange.
  */
object Turtle {

  /** Distributed read: one task per matching file via the Hadoop
    * FileSystem + `binaryFile` path ([[RdfFiles]]); blank node ids are
    * prefixed per file. `.txt` is claimed here (not by [[readTriG]])
    * because [[write]] emits through `df.write.text`, whose part files
    * are `.txt` — pass `exts` explicitly to read a different layout. */
  def read(spark: SparkSession, path: String,
           exts: Seq[String] = Seq(".ttl", ".txt")): Dataset[Triple] = {
    import spark.implicits._
    RdfFiles.parsePerFile(spark, path, exts)(parse) { (t, fix) =>
      Triple(fix(t.s), fix(t.p), fix(t.o))
    }
  }

  /** TriG read: one task per .trig file, blank ids (including blank
    * GRAPH labels) prefixed per file like [[read]]. `.txt` part files
    * from [[writeTriG]] need an explicit `exts = Seq(".txt")` — the
    * default deliberately does not overlap with [[read]]'s so a mixed
    * directory is never parsed with the wrong grammar. */
  def readTriG(spark: SparkSession, path: String,
               exts: Seq[String] = Seq(".trig")): Dataset[Quad] = {
    import spark.implicits._
    RdfFiles.parsePerFile(spark, path, exts)(parseTriG) { (q, fix) =>
      Quad(q.g.map(fix), fix(q.s), fix(q.p), fix(q.o))
    }
  }

  /** TriG write: graphs co-locate (repartition on g) and sort, so each
    * emitted block is one `<graph> { … }` with the same `;`/`,`
    * subject grouping as [[write]]; default-graph quads emit bare
    * statements. Output re-parses with [[readTriG]]. */
  def writeTriG(ds: Dataset[Quad], path: String): Unit = {
    import ds.sparkSession.implicits._
    ds.repartition(col("g.value"))
      .sortWithinPartitions("g.value", "s.value", "p.value", "o.value")
      .mapPartitions(trigBlocks _)
      .write.mode("overwrite").text(path)
  }

  private[rdf] def trigBlocks(it: Iterator[Quad]): Iterator[String] = {
    val in = it.buffered
    new Iterator[String] {
      def hasNext: Boolean = in.hasNext
      def next(): String = {
        val g = in.head.g
        val buf = scala.collection.mutable.ArrayBuffer.empty[Triple]
        while (in.hasNext && in.head.g == g) {
          val q = in.next(); buf += Triple(q.s, q.p, q.o)
        }
        val body = groupBlocks(buf.iterator).mkString("\n")
        g match {
          case Some(gt) => s"${term(gt)} {\n$body\n}"
          case None     => body
        }
      }
    }
  }

  /** Distributed write: subjects co-locate (repartition on s) and sort,
    * so each emitted block uses Turtle's `;` predicate and `,` object
    * grouping — one block per subject per partition run. The output is
    * also valid input for [[read]]. */
  def write(ds: Dataset[Triple], path: String): Unit = {
    import ds.sparkSession.implicits._
    ds.repartition(col("s.value"))
      .sortWithinPartitions("s.value", "p.value", "o.value")
      .mapPartitions(groupBlocks _)
      .write.mode("overwrite").text(path)
  }

  // ------------------------------------------------------------------ //
  // serializer (pure — safe on executors)                              //
  // ------------------------------------------------------------------ //

  private[rdf] def groupBlocks(it: Iterator[Triple]): Iterator[String] = {
    // NB: named `in`, not `buffered` — inside the anonymous Iterator,
    // a bare `buffered` resolves to the inherited Iterator.buffered
    // member, silently shadowing an outer local of that name
    val in = it.buffered
    new Iterator[String] {
      def hasNext: Boolean = in.hasNext
      def next(): String = {
        val s = in.head.s
        val block = scala.collection.mutable.ArrayBuffer.empty[Triple]
        while (in.hasNext && in.head.s == s) block += in.next()
        val byPred = block.toSeq.groupBy(_.p.render).toSeq.sortBy(_._1)
        val pol = byPred.map { case (_, ts) =>
          s"${term(ts.head.p)} ${ts.map(t => term(t.o)).mkString(" , ")}"
        }.mkString(" ;\n    ")
        s"${term(s)} $pol ."
      }
    }
  }

  // term rendering and escaping are N-Triples' exactly (Turtle is a
  // superset serialization) — ONE codec, so an escape-set fix can
  // never diverge the two formats' round-trips
  private def term(t: RdfTerm): String = NTriples.serializeTerm(t)

  // ------------------------------------------------------------------ //
  // parser (pure — safe on executors)                                  //
  // ------------------------------------------------------------------ //

  private val XsdInteger = "http://www.w3.org/2001/XMLSchema#integer"
  private val XsdDecimal = "http://www.w3.org/2001/XMLSchema#decimal"
  private val XsdBoolean = "http://www.w3.org/2001/XMLSchema#boolean"

  private val SchemeRe = "^[A-Za-z][A-Za-z0-9+.-]*:.*".r
  private val IntegerRe = "[+-]?[0-9]+".r
  private val DecimalRe = "[+-]?[0-9]*\\.[0-9]+".r

  /** A '.' at this position terminates a statement (vs. a dot inside a
    * prefixed-name local or decimal): when followed by whitespace,
    * EOF, a comment, a graph-block brace, the next subject's `<iri>`
    * opener, or a blank-node `_:` opener. A compact dot before a
    * PREFIXED-NAME subject is inherently ambiguous with a dotted
    * local (`ex:a.b`) and needs a space — documented limitation. */
  private def dotTerminates(s: String, j: Int): Boolean =
    j + 1 >= s.length || s(j + 1).isWhitespace ||
      "#}{<".contains(s(j + 1)) ||
      (s(j + 1) == '_' && j + 2 < s.length && s(j + 2) == ':')

  private sealed trait Tok
  private final case class TIri(v: String) extends Tok
  private final case class TPName(prefix: String, local: String) extends Tok
  private final case class TBlank(id: String) extends Tok
  private final case class TLit(v: String, lang: Option[String],
      dtIri: Option[String], dtPName: Option[(String, String)]) extends Tok
  private final case class TPunct(c: Char) extends Tok
  private final case class TWord(w: String) extends Tok // a, true, false, numbers, @prefix…

  def parse(content: String): Seq[Triple] =
    parseDoc(content, allowGraphs = false).map(q => Triple(q.s, q.p, q.o))

  /** TriG 1.1 (Turtle + named graphs): the same grammar plus
    * `[GRAPH] <label> { …statements… }` blocks and `{ … }` default-
    * graph blocks; statements outside any block are default-graph.
    * The last statement inside a block may omit its trailing dot, per
    * the spec. Pairs with [[NQuads]] the way [[parse]] pairs with
    * [[NTriples]] — TriG for hand-written interchange, N-Quads for
    * line-splittable scale. */
  def parseTriG(content: String): Seq[Quad] = parseDoc(content, allowGraphs = true)

  private def parseDoc(content: String, allowGraphs: Boolean): Seq[Quad] = {
    val toks = tokenize(content)
    val prefixes = scala.collection.mutable.Map.empty[String, String]
    var base = ""
    val out = Vector.newBuilder[Quad]
    var i = 0

    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"turtle: $msg (token $i)")

    // an IRI is absolute iff it carries a SCHEME (RFC 3986) — testing
    // for "://" would wrongly base-prefix urn:/mailto:/did: IRIs
    def resolveIri(v: String): String =
      if (base.isEmpty || Turtle.SchemeRe.matches(v)) v else base + v

    def resolvePName(p: String, l: String): String = prefixes.get(p) match {
      case Some(ns) => ns + l
      case None     => fail(s"undeclared prefix '$p:'")
    }

    def termAt(t: Tok): RdfTerm = t match {
      case TIri(v)         => RdfTerm.named(resolveIri(v))
      case TPName(p, l)    => RdfTerm.named(resolvePName(p, l))
      case TBlank(id)      => RdfTerm.blank(id)
      case TLit(v, Some(lg), _, _) => RdfTerm.langLit(v, lg)
      case TLit(v, _, Some(dt), _) => RdfTerm.typedLit(v, resolveIri(dt))
      case TLit(v, _, _, Some((p, l))) => RdfTerm.typedLit(v, resolvePName(p, l))
      case TLit(v, _, _, _) => RdfTerm.raw(v)
      case TWord("a")      => RdfTerm.named(Rdf.TypeIri)
      case TWord(w @ ("true" | "false")) => RdfTerm.typedLit(w, XsdBoolean)
      case TWord(w) if w.nonEmpty &&
          (w(0).isDigit || w(0) == '+' || w(0) == '-' || w(0) == '.') =>
        // strictly INTEGER / DECIMAL lexical forms; exponent literals
        // (xsd:double in Turtle) are outside the subset → fail fast
        // rather than emit an invalid-lexical xsd:integer term
        if (Turtle.IntegerRe.matches(w)) RdfTerm.typedLit(w, XsdInteger)
        else if (Turtle.DecimalRe.matches(w)) RdfTerm.typedLit(w, XsdDecimal)
        else fail(s"unsupported numeric literal (doubles are not in the subset): $w")
      case other => fail(s"unexpected term: $other")
    }

    // statement: subject (verb objectList (';' verb objectList)*) '.'
    // Inside a TriG block (`inBlock`) the trailing dot of the LAST
    // statement may be omitted — '}' also terminates.
    def statement(g: Option[RdfTerm], inBlock: Boolean): Unit = {
      val subj = termAt(toks(i)); i += 1
      var stop = false
      def atBlockEnd = inBlock && toks.lift(i) == Some(TPunct('}'))
      while (!stop) {
        val pred = termAt(toks.lift(i).getOrElse(fail("statement ends before verb")))
        i += 1
        var more = true
        while (more) {
          val obj = termAt(toks.lift(i).getOrElse(fail("statement ends before object")))
          i += 1
          out += Quad(g, subj, pred, obj)
          toks.lift(i) match {
            case Some(TPunct(',')) => i += 1
            case _                 => more = false
          }
        }
        toks.lift(i) match {
          case Some(TPunct(';')) =>
            i += 1
            // a dangling ';' before the terminator is legal
            if (toks.lift(i) == Some(TPunct('.'))) { i += 1; stop = true }
            else if (atBlockEnd) stop = true
          case Some(TPunct('.')) => i += 1; stop = true
          case _ if atBlockEnd   => stop = true // last-in-block dot omitted
          case other             => fail(s"expected ';' ',' or '.', got $other")
        }
      }
    }

    def block(g: Option[RdfTerm]): Unit = {
      // assumes toks(i) == '{'
      i += 1
      while (toks.lift(i) != Some(TPunct('}'))) {
        if (i >= toks.length) fail("unclosed graph block")
        statement(g, inBlock = true)
      }
      i += 1
      if (toks.lift(i) == Some(TPunct('.'))) i += 1 // optional dot after '}'
    }

    def isTermTok(t: Tok): Boolean = t match {
      case _: TIri | _: TPName | _: TBlank => true
      case _                               => false
    }

    while (i < toks.length) {
      toks(i) match {
        case TWord(d) if d.equalsIgnoreCase("@prefix") || d.equalsIgnoreCase("prefix") =>
          (toks.lift(i + 1), toks.lift(i + 2)) match {
            case (Some(TPName(p, "")), Some(TIri(ns))) =>
              prefixes(p) = ns
              i += 3
              if (toks.lift(i) == Some(TPunct('.'))) i += 1 // @-form ends with '.'
            case _ => fail("malformed prefix directive")
          }
        case TWord(d) if d.equalsIgnoreCase("@base") || d.equalsIgnoreCase("base") =>
          toks.lift(i + 1) match {
            case Some(TIri(b)) =>
              base = b
              i += 2
              if (toks.lift(i) == Some(TPunct('.'))) i += 1
            case _ => fail("malformed base directive")
          }
        case TWord(d) if allowGraphs && d.equalsIgnoreCase("graph") &&
            toks.lift(i + 1).exists(isTermTok) &&
            toks.lift(i + 2) == Some(TPunct('{')) =>
          val g = termAt(toks(i + 1)); i += 2; block(Some(g))
        case t if allowGraphs && isTermTok(t) &&
            toks.lift(i + 1) == Some(TPunct('{')) =>
          val g = termAt(t); i += 1; block(Some(g))
        case TPunct('{') if allowGraphs =>
          block(None) // anonymous default-graph block
        case TPunct(c @ ('{' | '}')) =>
          fail(s"'$c' (graph block) is TriG syntax — use parseTriG")
        case _ =>
          statement(None, inBlock = false)
      }
    }
    out.result()
  }

  private def tokenize(s: String): Vector[Tok] = {
    val toks = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"turtle: $msg (char $i)")
    while (i < n) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '#') { while (i < n && s(i) != '\n') i += 1 }
      else if (c == '[' || c == ']' || c == '(' || c == ')')
        fail("blank-node property lists / collections are unsupported")
      else if (c == '{' || c == '}') { toks += TPunct(c); i += 1 }
      else if (c == '<') {
        val close = s.indexOf('>', i + 1)
        if (close < 0) fail("unclosed <iri>")
        toks += TIri(s.substring(i + 1, close))
        i = close + 1
      } else if (c == '"') {
        if (s.startsWith("\"\"\"", i)) fail("triple-quoted strings are unsupported")
        val sb = new java.lang.StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          s(i) match {
            case '\\' =>
              if (i + 1 >= n) fail("dangling escape")
              s(i + 1) match {
                case '"'  => sb.append('"');  i += 2
                case '\\' => sb.append('\\'); i += 2
                case 'n'  => sb.append('\n'); i += 2
                case 'r'  => sb.append('\r'); i += 2
                case 't'  => sb.append('\t'); i += 2
                case 'u'  =>
                  if (i + 6 > n) fail("truncated \\u escape")
                  sb.appendCodePoint(Integer.parseInt(s.substring(i + 2, i + 6), 16)); i += 6
                case 'U'  =>
                  if (i + 10 > n) fail("truncated \\U escape")
                  sb.appendCodePoint(Integer.parseInt(s.substring(i + 2, i + 10), 16)); i += 10
                case e    => fail(s"unknown escape \\$e")
              }
            case '"' => closed = true; i += 1
            case ch  => sb.append(ch); i += 1
          }
        }
        if (!closed) fail("unclosed string literal")
        // suffix: @lang or ^^<iri> / ^^p:name
        if (i < n && s(i) == '@') {
          val j0 = i + 1
          var j = j0
          while (j < n && (s(j).isLetterOrDigit || s(j) == '-')) j += 1
          toks += TLit(sb.toString, Some(s.substring(j0, j)), None, None)
          i = j
        } else if (i + 1 < n && s(i) == '^' && s(i + 1) == '^') {
          i += 2
          if (i < n && s(i) == '<') {
            val close = s.indexOf('>', i + 1)
            if (close < 0) fail("unclosed datatype <iri>")
            toks += TLit(sb.toString, None, Some(s.substring(i + 1, close)), None)
            i = close + 1
          } else {
            val (p, l, j) = scanPName(s, i).getOrElse(fail("expected datatype"))
            toks += TLit(sb.toString, None, None, Some((p, l)))
            i = j
          }
        } else toks += TLit(sb.toString, None, None, None)
      } else if (c == '_' && i + 1 < n && s(i + 1) == ':') {
        var j = i + 2
        while (j < n && (s(j).isLetterOrDigit || s(j) == '_')) j += 1
        toks += TBlank(s.substring(i + 2, j))
        i = j
      } else if (c == ';' || c == ',') { toks += TPunct(c); i += 1 }
      else if (c == '.' && dotTerminates(s, i)) {
        // '.' only ends a statement at a terminator position — dots
        // inside prefixed-name locals and decimals survive
        toks += TPunct('.'); i += 1
      } else {
        // word: directive, keyword, number, or prefixed name
        scanPName(s, i) match {
          case Some((p, l, j)) => toks += TPName(p, l); i = j
          case None =>
            var j = i
            while (j < n && !s(j).isWhitespace && !";,#".contains(s(j)) &&
                !(s(j) == '.' && dotTerminates(s, j))) j += 1
            if (j == i) fail(s"cannot tokenize at '${s(i)}'")
            toks += TWord(s.substring(i, j))
            i = j
        }
      }
    }
    toks.result()
  }

  /** Scan a prefixed name `p:local` at position i; the prefix part may
    * be empty (`:local`) but the ':' must be present, and the token
    * must not look like a scheme'd IRI or a number. Returns
    * (prefix, local, next index). The local part may contain dots so
    * long as the dot is not statement-terminating. */
  private def scanPName(s: String, i: Int): Option[(String, String, Int)] = {
    val n = s.length
    var j = i
    while (j < n && (s(j).isLetterOrDigit || s(j) == '_' || s(j) == '-')) j += 1
    if (j >= n || s(j) != ':') return None
    val prefix = s.substring(i, j)
    if (j + 2 < n && s(j + 1) == '/' && s(j + 2) == '/') return None // scheme://
    var k = j + 1
    while (k < n && (s(k).isLetterOrDigit || s(k) == '_' || s(k) == '-' ||
        (s(k) == '.' && k + 1 < n && !dotTerminates(s, k) && s(k + 1) != ';' &&
          s(k + 1) != ','))) k += 1
    Some((prefix, s.substring(j + 1, k), k))
  }
}
