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
    // every query carries a full cross-engine oracle (q31's seeded sample
    // became hash-checkable via md5-order sampling; the xxhash64 MinHash
    // family, which DuckDB cannot express, is deliberately NOT a catalog
    // entry — see Catalog.all's scaladoc)
    assert((qs.keySet -- os.keySet).isEmpty)
  }
}
