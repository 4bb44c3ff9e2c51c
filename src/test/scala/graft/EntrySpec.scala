package graft

/** The driver contract surface: entry() smoke, registry/oracle coherence. */
class EntrySpec extends SparkSpec {

  test("entry() returns rows at sf0.001 (driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; names are unique operator ids") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    assert(qs.size >= 60)
    // every query builds a plan without running (analysis errors surface here)
    qs.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.columns.nonEmpty, name)
    }
  }
}
