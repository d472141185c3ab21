package graft.query

import graft.SparkSpec

/** Property tests for the §17.4 built-in bind functions against
  * driver-side reference implementations on seeded random inputs:
  * the numeric family's algebraic relations (floor ≤ x ≤ ceil, ROUND's
  * ties-toward-+∞ rule), the hash family against java.security digests,
  * and ENCODE_FOR_URI against a character-class reference — so an
  * error in the column-expression formulation (a wrong rounding mode,
  * a missed fixup in the url_encode adaptation) cannot be mirrored by
  * the checker. */
class BuiltinPropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(0x90af7)

  private def run(vals: Seq[String], q: String): Seq[org.apache.spark.sql.Row] = {
    import spark.implicits._
    val df = vals.zipWithIndex
      .map { case (v, i) => (s"s$i", "v", v) }.toDF("s", "p", "o")
    Bgp.compile(df, Sparql.parse(q)).orderBy("x").collect().toSeq
  }

  test("numeric binds satisfy the spec's algebraic relations on random doubles") {
    val xs = Seq.fill(60)((rnd.nextDouble() - 0.5) * 2000)
      .map(v => math.rint(v * 16) / 16) ++ // exact binary fractions
      Seq(-2.5, -0.5, 0.5, 2.5, 0.0) // the ROUND tie cases
    val rows = run(xs.map(_.toString),
      """select $x $v $a $r $u $d where { $x v $v .
        |  bind ( abs ( $v ) as $a ) . bind ( round ( $v ) as $r ) .
        |  bind ( ceil ( $v ) as $u ) . bind ( floor ( $v ) as $d ) }""".stripMargin)
    rows.foreach { row =>
      val x = row.getString(1).toDouble
      val (a, r, u, d) = (row.getString(2).toDouble, row.getString(3).toDouble,
        row.getString(4).toDouble, row.getString(5).toDouble)
      assert(a == math.abs(x), s"abs($x)")
      assert(d <= x && x <= u, s"floor/ceil bracket $x")
      assert(u - d <= 1.0, s"ceil-floor gap at $x")
      // SPARQL ROUND: nearest integer, ties toward +∞ (= floor(x+0.5))
      assert(r == math.floor(x + 0.5), s"round($x) = $r")
    }
  }

  test("hash binds equal java.security digests on random strings") {
    def hex(alg: String, s: String): String =
      java.security.MessageDigest.getInstance(alg)
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val xs = Seq.fill(30)(rnd.alphanumeric.take(1 + rnd.nextInt(24)).mkString)
    val rows = run(xs,
      """select $x $v $m $s1 $s2 $s5 where { $x v $v .
        |  bind ( md5 ( $v ) as $m ) . bind ( sha1 ( $v ) as $s1 ) .
        |  bind ( sha256 ( $v ) as $s2 ) . bind ( sha512 ( $v ) as $s5 ) }""".stripMargin)
    rows.foreach { row =>
      val v = row.getString(1)
      assert(row.getString(2) == hex("MD5", v))
      assert(row.getString(3) == hex("SHA-1", v))
      assert(row.getString(4) == hex("SHA-256", v))
      assert(row.getString(5) == hex("SHA-512", v))
    }
  }

  test("parser fuzz: malformed queries fail fast, never with an opaque error") {
    // the string front-end's contract is IllegalArgumentException on
    // bad input (the fail-fast tests pin specific cases; this pins the
    // CLASS of error on random token soup — an index-out-of-bounds or
    // match error here would surface as an opaque executor crash)
    val kw = Seq("select", "where", "{", "}", "(", ")", "filter", "bind",
      "values", "optional", "minus", "graph", "as", "$x", "$y", "in_nation",
      "&&", "||", "==", "<", ".", ",", "count($x)", "group", "by", "having",
      "order", "limit", "str", "concat", "sameterm", "+", "*")
    val fz = new scala.util.Random(7)
    var parsed = 0
    (1 to 300).foreach { _ =>
      val q = "select $x where { " +
        Seq.fill(2 + fz.nextInt(12))(kw(fz.nextInt(kw.length))).mkString(" ") + " }"
      try { Sparql.parse(q); parsed += 1 }
      catch {
        case _: IllegalArgumentException => () // the documented contract
        case e: Throwable => fail(s"parse('$q') threw ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    info(s"$parsed/300 random queries happened to parse")
  }

  test("update parser fuzz: same fail-fast contract") {
    val kw = Seq("insert", "delete", "data", "where", "{", "}", "graph",
      "<http://g>", "silent", "load", "into", "clear", "drop", "create",
      "copy", "move", "add", "all", "named", "default", "to", "s", "p", "o",
      ".", "\"lit\"", "$x")
    val fz = new scala.util.Random(11)
    var parsed = 0
    (1 to 300).foreach { _ =>
      val q = Seq.fill(1 + fz.nextInt(10))(kw(fz.nextInt(kw.length))).mkString(" ")
      try { Sparql.parseUpdate(q); parsed += 1 }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable => fail(s"parseUpdate('$q') threw ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    info(s"$parsed/300 random updates happened to parse")
  }

  test("encode_for_uri matches the RFC 3986 character-class reference") {
    def ref(s: String): String = s.flatMap { c =>
      if (c.isLetterOrDigit && c < 128 || "-_.~".contains(c)) c.toString
      else c.toString.getBytes("UTF-8").map(b => f"%%${b & 0xff}%02X").mkString
    }
    // printable-ASCII strings with the troublesome chars overrepresented
    val alphabet = "abcXYZ019 +*~%/?#[]@!$&'()=-_.,"
    val xs = Seq.fill(40)(
      Seq.fill(1 + rnd.nextInt(16))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    val rows = run(xs,
      "select $x $v $e where { $x v $v . bind ( encode_for_uri ( $v ) as $e ) }")
    rows.foreach { row =>
      assert(row.getString(2) == ref(row.getString(1)),
        s"encode_for_uri(${row.getString(1)})")
    }
  }
}
