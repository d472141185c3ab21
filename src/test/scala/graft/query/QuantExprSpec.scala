package graft.query

import graft.SparkSpec

/** Round-13 SPARQL surface growth: `{n,m}` path quantifiers, aggregate
  * expression inputs (`sum($x*$y)`), and EXISTS inside FILTER
  * expressions. Each is checked against a driver-side reference (the
  * registered rdf_bgp_* ops add the DuckDB oracle check at the driver
  * gate) plus the grammar rejections that keep malformed queries from
  * silently evaluating as something else. */
class QuantExprSpec extends SparkSpec {

  /** Reference: pairs connected by EXACTLY k hops. */
  private def kHops(edges: Set[(String, String)], k: Int): Set[(String, String)] = {
    var cur = edges
    for (_ <- 2 to k)
      cur = for { (a, m) <- cur; (m2, b) <- edges if m == m2 } yield (a, b)
    cur
  }
  private def rangeHops(edges: Set[(String, String)], n: Int, m: Int): Set[(String, String)] = {
    val hops = (math.max(n, 1) to m).flatMap(kHops(edges, _)).toSet
    if (n == 0) hops ++ edges.flatMap(e => Seq(e._1, e._2)).map(t => (t, t))
    else hops
  }

  test("path quantifier agrees with the reference on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(1313L)
    (1 to 12).foreach { caseNo =>
      val nNodes = 3 + rnd.nextInt(8)
      val nEdges = 1 + rnd.nextInt(2 * nNodes)
      val edges = (1 to nEdges).map { _ =>
        (s"n${rnd.nextInt(nNodes)}", s"n${rnd.nextInt(nNodes)}")
      }.toSet
      val df = edges.toSeq.map { case (a, b) => (a, "next", b) }.toDF("s", "p", "o")
      for ((n, m) <- Seq((1, 3), (2, 2), (0, 2))) {
        val got = Bgp.compile(df,
          Sparql.parse(s"select $$a $$b where { $$a next{$n,$m} $$b }"))
          .collect().map(r => (r.getString(0), r.getString(1))).toSet
        assert(got == rangeHops(edges, n, m),
          s"case $caseNo {$n,$m}: edges=$edges")
      }
      // exact form {k} and both seed-bound dispatches
      val exact2 = Bgp.compile(df,
        Sparql.parse("select $a $b where { $a next{2} $b }"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(exact2 == kHops(edges, 2), s"case $caseNo {2}: edges=$edges")
      val seed = edges.head._1
      val fwd = Bgp.compile(df,
        Sparql.parse(s"select $$b where { $seed next{1,2} $$b }"))
        .collect().map(_.getString(0)).toSet
      assert(fwd == rangeHops(edges, 1, 2).collect { case (a, b) if a == seed => b },
        s"case $caseNo fwd from $seed: edges=$edges")
      val target = edges.head._2
      val bwd = Bgp.compile(df,
        Sparql.parse(s"select $$a where { $$a next{1,2} $target }"))
        .collect().map(_.getString(0)).toSet
      assert(bwd == rangeHops(edges, 1, 2).collect { case (a, b) if b == target => a },
        s"case $caseNo bwd to $target: edges=$edges")
    }
  }

  test("path quantifier rejects inverted bounds; {0} is the zero-length path") {
    import spark.implicits._
    val df = Seq(("a", "next", "b")).toDF("s", "p", "o")
    // n > m has no path meaning; a silent empty result would hide the typo
    intercept[IllegalArgumentException] {
      Bgp.compile(df, Sparql.parse("select $a $b where { $a next{3,2} $b }")).collect()
    }
    // `p{0}` is the zero-length path alone: every graph term → itself
    val zero = Bgp.compile(df,
      Sparql.parse("select $a $b where { $a next{0} $b }"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(zero == Set(("a", "a"), ("b", "b")))
  }

  /** Driver-side reference: naive fixpoint closure (1-or-more hops). */
  private def refClosure(edges: Set[(String, String)]): Set[(String, String)] = {
    var reach = edges
    var grew = true
    while (grew) {
      val next = for { (a, m) <- reach; (m2, b) <- reach if m == m2 } yield (a, b)
      val merged = reach ++ next
      grew = merged.size > reach.size
      reach = merged
    }
    reach
  }

  test("unbounded quantifier {n,} = exact (n-1)-hop prefix into the closure") {
    import spark.implicits._
    val rnd = new scala.util.Random(777L)
    (1 to 8).foreach { caseNo =>
      val nNodes = 3 + rnd.nextInt(7)
      val edges = (1 to (2 + rnd.nextInt(2 * nNodes))).map { _ =>
        (s"n${rnd.nextInt(nNodes)}", s"n${rnd.nextInt(nNodes)}")
      }.toSet
      val df = edges.toSeq.map { case (a, b) => (a, "next", b) }.toDF("s", "p", "o")
      val cl = refClosure(edges)
      val terms = edges.flatMap(e => Seq(e._1, e._2))
      // {2,}: one exact hop, then 1+ closure
      val ref2 = for { (a, m) <- edges; (m2, b) <- cl if m == m2 } yield (a, b)
      val got2 = Bgp.compile(df,
        Sparql.parse("select $a $b where { $a next{2,} $b }"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got2 == ref2, s"case $caseNo {2,}: edges=$edges")
      // {1,} ≡ p+ and {0,} ≡ p*
      val got1 = Bgp.compile(df,
        Sparql.parse("select $a $b where { $a next{1,} $b }"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got1 == cl, s"case $caseNo {1,}: edges=$edges")
      val got0 = Bgp.compile(df,
        Sparql.parse("select $a $b where { $a next{0,} $b }"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got0 == cl ++ terms.map(t => (t, t)), s"case $caseNo {0,}: edges=$edges")
    }
  }

  test("aggregate expressions run over the distinct solution projection") {
    import spark.implicits._
    // d duplicates a's (g1, 2, 3) solution — set semantics must
    // collapse it before the sum, exactly like count($v)'s distinct
    val df = Seq(
      ("a", "grp", "g1"), ("a", "x", "2"), ("a", "y", "3"),
      ("b", "grp", "g1"), ("b", "x", "4"), ("b", "y", "5"),
      ("c", "grp", "g2"), ("c", "x", "10"), ("c", "y", "7"),
      ("d", "grp", "g1"), ("d", "x", "2"), ("d", "y", "3")).toDF("s", "p", "o")
    val rows = Bgp.compile(df, Sparql.parse(
      """select $g sum($x*$y) avg($x+$y) where {
        |  $e grp $g . $e x $x . $e y $y
        |} group by $g order by $g""".stripMargin))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(rows("g1") == ((2.0 * 3 + 4 * 5, (5.0 + 9) / 2)))
    assert(rows("g2") == ((70.0, 17.0)))
  }

  test("aggregate expressions reject non-numeric aggregate functions") {
    import spark.implicits._
    val df = Seq(("a", "x", "1"), ("a", "y", "2")).toDF("s", "p", "o")
    // counting or concatenating an arithmetic term has no defined
    // SPARQL meaning — must fail at parse, not evaluate as something
    intercept[IllegalArgumentException] {
      Bgp.compile(df, Sparql.parse(
        "select count($x*$y) where { $e x $x . $e y $y }")).collect()
    }
  }

  test("exists inside a filter expression composes conjunctively") {
    import spark.implicits._
    val df = Seq(
      ("a", "t", "1"), ("b", "t", "2"), ("c", "t", "3"),
      ("a", "flag", "yes"), ("c", "flag", "yes")).toDF("s", "p", "o")
    val got = Bgp.compile(df, Sparql.parse(
      """select $s $v where { $s t $v .
        |  filter ( exists { $s flag yes } && $v != 3 ) }""".stripMargin))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "1")))
    // and the negative polarity in expression position
    val neg = Bgp.compile(df, Sparql.parse(
      """select $s $v where { $s t $v .
        |  filter ( not exists { $s flag yes } && $v != 3 ) }""".stripMargin))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(neg == Set(("b", "2")))
  }

  test("|| around an exists term is rejected, not misevaluated") {
    import spark.implicits._
    val df = Seq(("a", "t", "1"), ("a", "flag", "yes")).toDF("s", "p", "o")
    intercept[IllegalArgumentException] {
      Bgp.compile(df, Sparql.parse(
        """select $s where { $s t $v .
          |  filter ( exists { $s flag yes } || $v == 2 ) }""".stripMargin)).collect()
    }
  }
}
