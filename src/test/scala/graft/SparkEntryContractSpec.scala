package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards that need no SparkSession: the queries/oracle
  * maps are merged with `++`, which silently keeps the LAST duplicate —
  * a name collision between two operator objects would shadow one
  * implementation and its oracle with another's, surfacing only as a
  * baffling hash mismatch (or worse, a silent pass against the wrong
  * SQL). Assert disjointness and 1:1 query↔oracle pairing here. */
class SparkEntryContractSpec extends AnyFunSuite {

  private val components: Seq[(String, Set[String])] = Seq(
    "WordCount" -> operators.WordCount.queries.keySet,
    "Relational" -> operators.Relational.queries.keySet,
    "MrQueries" -> operators.MrQueries.queries.keySet,
    "Analytics" -> operators.Analytics.queries.keySet,
    "TpcH2" -> operators.TpcH2.queries.keySet,
    "AdvancedSql" -> operators.AdvancedSql.queries.keySet,
    "EventAnalytics" -> operators.EventAnalytics.queries.keySet,
    "Graph" -> operators.Graph.queries.keySet,
    "Layout" -> operators.Layout.queries.keySet,
    "DataOps" -> operators.DataOps.queries.keySet,
    "Dedup" -> operators.Dedup.queries.keySet,
    "Similarity" -> operators.Similarity.queries.keySet,
    "TextAnalysis" -> operators.TextAnalysis.queries.keySet,
    "Dsir" -> operators.Dsir.queries.keySet,
    "Multimodal" -> operators.Multimodal.queries.keySet,
    "StreamingBridge" -> streaming.StreamingBridge.queries.keySet)

  test("no query name is defined by two operator components") {
    val owners = components.flatMap { case (owner, names) => names.map(_ -> owner) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val dups = owners.filter(_._2.size > 1)
    assert(dups.isEmpty, s"shadowed query names: $dups")
  }

  test("queries and oracleSql are 1:1") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("the merged map count equals the component sum (nothing shadowed)") {
    assert(SparkEntry.queries.size == components.map(_._2.size).sum)
  }
}
