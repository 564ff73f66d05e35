package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experimental-design join: the reference's column-MultiIndex build
  * re-expressed as a broadcast dimension join on the long form
  * (SURVEY §1.4, §2.4).
  */
object Design {

  /** Label normalization used before the design lookup (ref
    * process.py:7-20 `numeric` + process.py:67-80): strip prefixes,
    * trim, leave numeric coercion to the join key's type. */
  def normalizeLabel(c: Column, removePrefixes: Seq[String]): Column = {
    val stripped = removePrefixes.foldLeft(c) { (acc, p) =>
      regexp_replace(acc, "^" + java.util.regex.Pattern.quote(p), "")
    }
    trim(stripped)
  }

  /** `build_index_from_design` (ref process.py:23-111): attach design
    * attributes (Group/Timepoint/Replicate/...) to each observation by
    * looking its sample label up in the design table.
    *
    * Long-form: `observations LEFT JOIN broadcast(design)` on the
    * normalized label — a broadcast hash join (designs are ≤ a few
    * hundred rows; File S-1 has 106). Rows with null design attrs are
    * the reference's "unmatched columns" — callers keep them as
    * metadata (`keepUnmatched=true`) or drop them (ref
    * process.py:100-105).
    */
  def buildIndexFromDesign(
      observations: DataFrame,
      design: DataFrame,
      sampleCol: String = "sample",
      designLabelCol: String = "Label",
      removePrefixes: Seq[String] = Nil,
      keepUnmatched: Boolean = true): DataFrame = {
    val key = normalizeLabel(col(sampleCol), removePrefixes)
    val joined = observations
      .withColumn("_design_key", key)
      .join(broadcast(design), col("_design_key") === design(designLabelCol), "left")
      .drop("_design_key", designLabelCol)
    if (keepUnmatched) joined
    else joined.filter(design.columns.filterNot(_ == designLabelCol)
      .map(c => col(c).isNotNull).reduce(_ || _))
  }

  /** `build_index_from_labels` (ref process.py:114-165): derive design
    * attributes by regex capture over the sample label — pure
    * projection, no join. `levels` = (outCol, pattern with one capture
    * group, optional cast type). */
  def buildIndexFromLabels(
      df: DataFrame,
      sampleCol: String,
      levels: Seq[(String, String, Option[String])]): DataFrame =
    levels.foldLeft(df) { case (acc, (out, pattern, castTo)) =>
      val extracted = regexp_extract(col(sampleCol), pattern, 1)
      // try_cast: an unmatched label extracts "" — null, not an ANSI error
      acc.withColumn(out, castTo.fold(extracted)(t => extracted.try_cast(t)))
    }

  /** `apply_experimental_design` (ref process.py:280-306): relabel
    * samples via a MaxQuant design lookup (`Experiment` → `Name`) —
    * a broadcast-joined relabel of the sample column. */
  def applyExperimentalDesign(
      df: DataFrame,
      designLookup: DataFrame,
      sampleCol: String = "sample",
      fromCol: String = "Experiment",
      toCol: String = "Name"): DataFrame =
    df.join(broadcast(designLookup), col(sampleCol) === designLookup(fromCol), "left")
      .withColumn(sampleCol, coalesce(col(toCol), col(sampleCol)))
      .drop(fromCol, toCol)
}
