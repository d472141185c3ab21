package graft.query

import graft.SparkSpec

/** Property test for the transitive-closure strategies against a
  * driver-side reference closure on seeded random graphs: the var-var
  * delta-restricted pointer doubling, the hop-widened seeded BFS for
  * bound endpoints (both directions), and the reflexive `*` variant —
  * cycles, self-loops, multiple components, and fan-in/fan-out shapes
  * all arise from the generator. The reference implementation is an
  * independent fixpoint over Sets, so an error in the distributed
  * round structure (a lost frontier, an over-eager budget stop, a
  * doubling round that misses odd-length paths) cannot be mirrored. */
class ClosurePropertySpec extends SparkSpec {

  /** Driver-side reference: naive fixpoint closure. */
  private def refClosure(edges: Set[(String, String)]): Set[(String, String)] = {
    var reach = edges
    var grew = true
    while (grew) {
      val next = for {
        (a, m1) <- reach
        (m2, b) <- reach
        if m1 == m2
      } yield (a, b)
      val merged = reach ++ next
      grew = merged.size > reach.size
      reach = merged
    }
    reach
  }

  test("closure strategies agree with the reference on 25 random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242L)
    (1 to 25).foreach { caseNo =>
      val nNodes = 3 + rnd.nextInt(10)
      val nEdges = 1 + rnd.nextInt(2 * nNodes)
      val edges = (1 to nEdges).map { _ =>
        (s"n${rnd.nextInt(nNodes)}", s"n${rnd.nextInt(nNodes)}")
      }.toSet
      val expected = refClosure(edges)
      val df = edges.toSeq.map { case (a, b) => (a, "next", b) }.toDF("s", "p", "o")

      // var-var: delta-restricted pointer doubling
      val varVar = Bgp.compile(df, Sparql.parse("select $a $b where { $a next+ $b }"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(varVar == expected, s"case $caseNo var-var: edges=$edges")

      // bound subject and bound object: hop-widened seeded BFS
      val seed = edges.head._1
      val fwd = Bgp.compile(df, Sparql.parse(s"select $$b where { $seed next+ $$b }"))
        .collect().map(_.getString(0)).toSet
      assert(fwd == expected.collect { case (a, b) if a == seed => b },
        s"case $caseNo fwd from $seed: edges=$edges")
      val target = edges.head._2
      val bwd = Bgp.compile(df, Sparql.parse(s"select $$a where { $$a next+ $target }"))
        .collect().map(_.getString(0)).toSet
      assert(bwd == expected.collect { case (a, b) if b == target => a },
        s"case $caseNo bwd to $target: edges=$edges")

      // reflexive `*`: closure plus every graph term → itself
      val star = Bgp.compile(df, Sparql.parse("select $a $b where { $a next* $b }"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val terms = edges.flatMap(e => Seq(e._1, e._2))
      assert(star == expected ++ terms.map(t => (t, t)),
        s"case $caseNo star: edges=$edges")
    }
  }
}
