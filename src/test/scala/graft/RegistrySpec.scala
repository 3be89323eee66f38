package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract's registry invariants, enforced at unit-test
  * time so a missed registration cannot wait for the round-end gate:
  * every query has an oracle (the driver's correctness gate needs
  * BOTH), and ids are unique across modules (a duplicate key would
  * silently shadow one module's query in the merged map).
  */
class RegistrySpec extends AnyFunSuite {

  test("every registered query has an oracle, and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("query ids are unique across the composed modules") {
    val all = Seq(
      queries.CoreQueries.queries.keys,
      queries.PipelineQueries.queries.keys,
      queries.DataPipelineQueries.queries.keys,
      queries.ValidationQueries.queries.keys,
      queries.StreamingQueries.queries.keys,
      queries.CurationQueries.queries.keys,
      queries.SemanticQueries.queries.keys,
      queries.AnalyticsQueries.queries.keys,
      queries.EngineQueries.queries.keys,
      queries.PlatformQueries.queries.keys).flatten.toSeq
    val dups = all.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    assert(dups.isEmpty, s"duplicate query ids across modules: $dups")
  }
}
