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
    // silently shadow a gate entry. The family list is the single
    // shared Seq in SparkEntry, so it can't go stale.
    assert(SparkEntry.families.map(_._1.size).sum === SparkEntry.queries.size,
      "duplicate query name across family maps")
    assert(SparkEntry.families.map(_._2.size).sum === SparkEntry.oracleSql.size,
      "duplicate oracle name across family maps")
  }

  test("all queries execute and return rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}
