package graft

class GraftSessionSpec extends SparkSpec {

  test("Graft.session + registerTables enables plain SQL with native functions") {
    val s = Graft.session(master = "local[4]")
    Graft.registerTables(s, sf0001)
    val n = s.sql("SELECT count(*) FROM lineitem").head().getLong(0)
    assert(n == 6000)
    val sig = s.sql("SELECT simhash(split(text, ' ')) FROM documents LIMIT 1")
      .head().getLong(0)
    assert(sig != 0L)
    val joined = s.sql(
      """SELECT r_name, count(*) n FROM nation JOIN region
        |ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name""".stripMargin)
      .collect()
    assert(joined.length == 5)
    // events view carries the normalized µs timestamp
    val t = s.sql("SELECT max(ts) FROM events").head().getTimestamp(0)
    assert(t != null)
  }
}
