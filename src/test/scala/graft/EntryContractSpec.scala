package graft

/** Driver-contract invariants: every oracle key has a query, the flagship
  * entry returns rows, and query names are unique across core + ext. */
class EntryContractSpec extends SparkSpec {

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query has an oracle — the sketch rows are ε-gated " +
    "(VERDICT r8 #3), so no rows-only exceptions remain") {
    // the former exceptions (e13/e21a/e23a, engine-specific HLL/GK
    // sketches with no DuckDB hash twin) now emit exact values plus
    // asserted error-bound flags, giving them full hash oracles. Any
    // query missing an oracle is a gate hole: register its SQL twin.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"oracle-less queries: $noOracle")
  }

  test("entry() smoke: flagship query yields rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // one NAMED test per query (VERDICT r9 #6): a failing query surfaces
  // as its own test failure carrying the query name and error, instead
  // of one aggregated assertion at the end — the r9 NTZ breakage would
  // have named its six victims in CI output immediately.
  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query runs at sf0.001: $name") {
      try {
        // noop write, NOT count(): count() lets Catalyst prune the
        // top-level projections, so a broken select expression could
        // pass the smoke; the noop sink evaluates every column the
        // way Verify's parquet write does.
        fn(spark, "/root/testdata/sf0.001")
          .write.format("noop").mode("overwrite").save()
      } finally spark.sharedState.cacheManager.clearCache()
    }
  }
}
