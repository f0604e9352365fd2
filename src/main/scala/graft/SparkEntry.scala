package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Affinity, Audit, BpeTrain, Corpus, Curation, Erp, Governance, Graph, Matching, Multimodal, NorthStar, ParseRoute, Relational, RuntimeFilter, Scalars, SketchRollup, TpchShapes, TrainingData}
import graft.sink.{AvroQueries, BloomManifest, BucketQueries, Compact, CsvQueries, DeleteQueries, FixedWidth, Layout, Manifest, MergeQueries, MvRefresh, StatsDecision, OrcQueries, PartitionedQueries, SchemaEvolution, ShardedExport, SurrogateKeys, Vacuum, ZOrderQueries}
import graft.sources.JsonlIngest
import graft.sources.rfc.RfcQueries
import graft.streaming.{StreamGraded, StreamSinkGraded}

/** Driver contract — see /root/repo/SURVEY.md §2.3 (normative inventory).
  *
  * `queries` maps each declared operator id to a function
  * `(spark, sfDir) => DataFrame`; `oracleSql` carries the DuckDB twin for
  * every oracle-checked op. The remaining no-oracle ops are each
  * ScalaTest-verified against independent evidence — DataContractSpec
  * holds the closed, per-suite-annotated list (sketches with
  * engine-specific internals and binary codecs no SQL engine provides).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q105 — the composed curation pipeline (quality gate → hash-first
    * exact dedup → MinHash near-dup cluster drop → deterministic split →
    * per-(lang, split) stats): one query exercising scan, filter, window
    * dedup, LSH banding, iterative connected components, anti-join, hash
    * bucketing, and partial+final aggregation end to end. */
  def entry(spark: SparkSession): DataFrame =
    Curation.q105CurationPipeline(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TpchShapes.queries ++ ParseRoute.queries ++ Scalars.queries ++
      NorthStar.queries ++ TrainingData.queries ++ Curation.queries ++
      Corpus.queries ++ RuntimeFilter.queries ++ Affinity.queries ++
      Layout.queries ++ ZOrderQueries.queries ++ BucketQueries.queries ++
      PartitionedQueries.queries ++ ShardedExport.queries ++ MvRefresh.queries ++
      OrcQueries.queries ++ CsvQueries.queries ++ AvroQueries.queries ++
      SchemaEvolution.queries ++ Compact.queries ++ Manifest.queries ++
      DeleteQueries.queries ++ MergeQueries.queries ++ StatsDecision.queries ++
      FixedWidth.queries ++ Vacuum.queries ++ BloomManifest.queries ++ SurrogateKeys.queries ++
      Multimodal.queries ++ RfcQueries.queries ++ SketchRollup.queries ++
      JsonlIngest.queries ++ BpeTrain.queries ++ Graph.queries ++ Audit.queries ++
      Governance.queries ++ Matching.queries ++ Erp.queries ++
      StreamGraded.queries ++ StreamSinkGraded.queries

  def oracleSql: Map[String, String] =
    Relational.oracle ++ TpchShapes.oracle ++ ParseRoute.oracle ++ Scalars.oracle ++
      NorthStar.oracle ++ TrainingData.oracle ++ Curation.oracle ++
      Corpus.oracle ++ RuntimeFilter.oracle ++ Affinity.oracle ++
      ZOrderQueries.oracle ++ BucketQueries.oracle ++
      PartitionedQueries.oracle ++ ShardedExport.oracle ++ MvRefresh.oracle ++
      OrcQueries.oracle ++ CsvQueries.oracle ++ AvroQueries.oracle ++
      SchemaEvolution.oracle ++ Compact.oracle ++ Manifest.oracle ++
      DeleteQueries.oracle ++ MergeQueries.oracle ++ StatsDecision.oracle ++
      FixedWidth.oracle ++ Vacuum.oracle ++ BloomManifest.oracle ++ SurrogateKeys.oracle ++
      RfcQueries.oracle ++
      SketchRollup.oracle ++ JsonlIngest.oracle ++ BpeTrain.oracle ++ Graph.oracle ++
      Audit.oracle ++ Governance.oracle ++ Matching.oracle ++ Erp.oracle ++
      StreamGraded.oracle ++ StreamSinkGraded.oracle
}
