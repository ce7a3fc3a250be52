package graft

/** Driver-contract smoke: entry() returns rows; every query runs at
  * sf0.001; every oracle key has a query.
  */
class EntrySpec extends SparkSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query is hash-checked (no oracle-less entries) and names are unique") {
    val unchecked = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unchecked.isEmpty, s"queries without a DuckDB oracle: $unchecked")
    // the per-family maps merge with ++ — a duplicate name would
    // silently shadow a gate entry
    val families = Seq(
      queries.EventQueries.queries, queries.DocQueries.queries,
      queries.EmbedQueries.queries, queries.TpchQueries.queries,
      queries.MediaQueries.queries, queries.ServingQueries.queries,
      queries.ApiQueries.queries, queries.SqlQueries.queries,
      queries.TemporalQueries.queries, queries.SampleQueries.queries,
      queries.OlapQueries.queries, queries.AnalyticsQueries.queries)
    assert(families.map(_.size).sum === SparkEntry.queries.size,
      "duplicate query name across family maps")
  }

  test("all queries execute and return rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}
