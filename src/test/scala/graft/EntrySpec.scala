package graft

/** The driver's smoke contract: entry(spark) returns rows on sf0.001, and
  * every catalog query has matching name/oracle wiring.
  */
class EntrySpec extends SparkSpec {

  test("entry returns >0 rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql stay consistent") {
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    assert(qs.nonEmpty)
    // every oracle belongs to a query; names are unique in the catalog
    assert(os.keySet.subsetOf(qs.keySet))
    assert(queries.Catalog.all.map(_.name).distinct.size == queries.Catalog.all.size)
    // only the deliberately oracle-free query is rows-only
    assert((qs.keySet -- os.keySet) == Set("q31_sample_seeded"))
  }
}
