package graft

import graft.queries._

/** Guards on the driver contract itself: the queries map is built by
  * ++ of per-group maps, where a duplicate key would silently drop a
  * query; every oracle entry must reference a registered query; the
  * flagship must return rows on the smoke scale factor. */
class ContractSpec extends SparkSpec {

  private val groups = Seq(
    "TemporalQ" -> (TemporalQ.queries.keySet, TemporalQ.oracle.keySet),
    "ScalarQ" -> (ScalarQ.queries.keySet, ScalarQ.oracle.keySet),
    "AggQ" -> (AggQ.queries.keySet, AggQ.oracle.keySet),
    "TrackingQ" -> (TrackingQ.queries.keySet, TrackingQ.oracle.keySet),
    "LlmQ" -> (LlmQ.queries.keySet, LlmQ.oracle.keySet),
    "MlQ" -> (MlQ.queries.keySet, MlQ.oracle.keySet),
    "PipelineQ" -> (PipelineQ.queries.keySet, PipelineQ.oracle.keySet),
    "IoQ" -> (IoQ.queries.keySet, IoQ.oracle.keySet),
    "FeatureStageQ" -> (FeatureStageQ.queries.keySet, FeatureStageQ.oracle.keySet),
    "CorpusQ" -> (CorpusQ.queries.keySet, CorpusQ.oracle.keySet),
    "EventsQ" -> (EventsQ.queries.keySet, EventsQ.oracle.keySet),
    "GraphQ" -> (GraphQ.queries.keySet, GraphQ.oracle.keySet))

  test("no query-name collisions across groups") {
    val counts = groups.flatMap(_._2._1.toSeq).groupBy(identity).view.mapValues(_.size)
    val dups = counts.filter(_._2 > 1).keys.toList
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(SparkEntry.queries.size == groups.map(_._2._1.size).sum)
  }

  test("every oracle key has a registered query; oracle within group") {
    for ((name, (qs, os)) <- groups)
      assert(os.subsetOf(qs), s"$name oracle keys without queries: ${os -- qs}")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("oracle coverage: only the MLlib-fit queries lack oracle SQL") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("m2_gbt", "e1_tree_ensemble", "m5_ridge",
      "s5_artifacts", "m8_scorer", "s_kmeans_ivf"))
  }

  test("flagship entry returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
