package graft

import graft.queries.Registry

/** Smoke: every declared query runs on sf0.001 and returns a sane frame;
  * every oracle key refers to a declared query; the flagship entry
  * returns rows. Value-level correctness is the driver's DuckDB gate
  * (mimicked locally by tools/oracle_check.py). */
class RegistrySpec extends SparkSpec {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }

  test("query names are unique (toMap would silently drop a duplicate)") {
    val dups = Registry.all.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: $dups")
  }

  test("driver-contract closures are self-contained (setup composed in)") {
    // the driver only sees SparkEntry.queries — a query whose inputs need
    // staging must work through that closure alone, from a cold catalog
    spark.sql("DROP TABLE IF EXISTS graft_io04_orders")
    spark.sql("DROP TABLE IF EXISTS graft_io04_lineitem")
    assert(Registry.queries("io04_bucketed_join")(spark, sfTiny).count() > 0)
  }

  for (q <- Registry.all) {
    test(s"${q.name} runs on sf0.001") {
      // setup + run, exactly as the driver-contract closure composes them
      q.setup.foreach(_(spark, sfTiny))
      val df = q.run(spark, sfTiny)
      assert(df.columns.nonEmpty)
      // every declared query must be non-empty on sf0.001 — a zero-row
      // result would silently weaken rows-only checks (ADVICE r1)
      assert(df.count() > 0, s"${q.name} returned 0 rows on sf0.001")
    }
  }
}
