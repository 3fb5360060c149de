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

  test("each query pack's defs and sql keys stay aligned; no cross-pack collisions") {
    // SparkEntry merges packs with `++`, so the global keyset check above
    // cannot see (a) a def/sql pair drifting apart INSIDE one pack when
    // another pack happens to fill the hole, or (b) two packs claiming the
    // same name (later pack silently wins). Pin both per pack.
    val packs: Seq[(String, queries.QueryPack)] = Seq(
      "Relational" -> queries.Relational, "Vectors" -> queries.Vectors,
      "Spatial" -> queries.Spatial, "Text" -> queries.Text,
      "Events" -> queries.Events, "Reference" -> queries.Reference)
    packs.foreach { case (name, p) =>
      val defsOnly = p.defs.keySet -- p.sql.keySet -- RowsOnly
      val sqlOnly = p.sql.keySet -- p.defs.keySet
      assert(defsOnly.isEmpty, s"$name defs without sql: $defsOnly")
      assert(sqlOnly.isEmpty, s"$name sql without defs: $sqlOnly")
    }
    val dupes = packs.flatMap(_._2.defs.keySet)
      .groupBy(identity).filter(_._2.size > 1).keySet
    assert(dupes.isEmpty, s"query names defined by more than one pack: $dupes")
  }

  test("every rows-only query produces rows at sf0.001") {
    RowsOnly.foreach { name =>
      assert(SparkEntry.queries(name)(spark, SparkTestSession.sfDir).count() > 0,
        s"$name returned no rows")
    }
  }
}
