package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Design, Filters, Normalize, Reshape}
import graft.stats.{StatTests, Summaries, Volcano}

/** The reference's canonical end-to-end workflows (SURVEY §3) as
  * composable lazy stages. One Catalyst lineage end-to-end: scan →
  * narrow filters/projections → unpivot → broadcast design join →
  * keyed aggregations — shuffles only at the design-keyed aggs.
  */
object Pipelines {

  /** §3.1 Phospho-LFQ timecourse (File S-1 flagship), through the
    * volcano table. `sites` is a MaxQuant site table (io.MaxQuant
    * .readMaxQuant), `design` a (Label, Group, Timepoint, Replicate,
    * Technical) frame.
    */
  def phosphoLfq(
      sites: DataFrame,
      design: DataFrame,
      intensityPrefix: String = "Intensity ",
      minLocalizationProb: Double = 0.75,
      minValidPerGroup: Long = 2,
      control: String = "Control",
      comparison: String = "Treat"): DataFrame = {
    // filters (narrow, pushed to scan)
    val filtered = Filters.filterLocalizationProbability(
      Filters.removeContaminants(Filters.removeReverse(sites)),
      threshold = minLocalizationProb)
    // expand multiplicity columns to rows, then wide→long on intensities
    val expanded = Reshape.expandSideTable(filtered)
    val intensityCols = expanded.columns.filter(_.startsWith(intensityPrefix))
    val long0 = Reshape.unpivot(expanded,
      expanded.columns.filterNot(intensityCols.contains).toSeq,
      intensityCols.toSeq, nameCol = "sample", valueCol = "value")
    // log2 with ±inf→null, median-center per sample
    val long = Normalize.subtractColumnMedian(
      long0.withColumn("value", Reshape.infToNull(log2(col("value")))),
      "sample", "value")
    // design annotation (broadcast) + group-validity gate
    val annotated = Design.buildIndexFromDesign(
      long, design, removePrefixes = Seq(intensityPrefix), keepUnmatched = false)
    val valid = Filters.minimumValidValuesInAnyGroup(
      annotated, Seq("id"), Seq("Group"), "value", minValidPerGroup)
    // technical-replicate collapse (median over Technical, replicates
    // kept — they are the t-test observations), then the volcano table
    val collapsed = Summaries.collapseTechnicalReplicates(
      valid, Seq("id"), Seq("Group", "Replicate"), "value")
    Volcano.twoSample(
      collapsed, Seq("id"), "Group", "value", control, comparison,
      minValidN = minValidPerGroup.toInt, s0 = 0.5, minRatio = 0.5, minP = 0.05)
  }

  /** §3.2 SILAC ratio analysis (File S-2): proteinGroups ratios →
    * one-sample volcano vs 0. */
  def silacRatio(
      proteinGroups: DataFrame,
      design: DataFrame,
      minValid: Long = 2): DataFrame = {
    val filtered = Filters.removeOnlyIdentifiedBySite(
      Filters.removeContaminants(Filters.removeReverse(proteinGroups)))
    val kept = Filters.selectRatioColumns(filtered, keep = Seq("id"))
    val ratioCols = kept.columns.filter(_.startsWith("Ratio"))
    val long = Reshape.unpivot(kept, Seq("id"), ratioCols.toSeq,
        nameCol = "sample", valueCol = "value")
      .withColumn("value", Reshape.infToNull(log2(col("value"))))
    val annotated = Design.buildIndexFromDesign(long, design, keepUnmatched = false)
    val valid = Filters.minimumValidValuesInAnyGroup(
      annotated, Seq("id", "Group"), Seq("Group"), "value", minValid)
    Volcano.oneSample(valid, Seq("id", "Group"), "value",
      minValidN = minValid.toInt, s0 = 0.5, minRatio = 0.5, minP = 0.05)
  }
}
