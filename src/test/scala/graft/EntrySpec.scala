package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract directly: entry must return rows on
  * sf0.001 (the driver's smoke check) and every query name must have
  * either oracle SQL or an intentional rows-only designation.
  */
class EntrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // Every query is oracle-checked as of round 5: d3/d4/v8 graduated in
  // round 4 via SketchSql, v7/v9 in round 5 via IvfSql's unrolled k-means,
  // q22 in round 5 via the bounded-error assertion relation.
  val RowsOnly = Set.empty[String]

  test("entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has oracle SQL unless intentionally rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing === RowsOnly,
      s"unexpected rows-only queries: ${missing -- RowsOnly}; " +
        s"stale RowsOnly entries: ${RowsOnly -- missing}")
    // and no orphan SQL without a query
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  test("every rows-only query produces rows at sf0.001") {
    RowsOnly.foreach { name =>
      assert(SparkEntry.queries(name)(spark, SparkTestSession.sfDir).count() > 0,
        s"$name returned no rows")
    }
  }
}
