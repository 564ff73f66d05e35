package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reshape / pivot / unpivot operators (ref `padua/process.py`). */
object Reshape {

  /** Generic unpivot: fold `valueCols` into rows `(keyCols..., nameCol, valueCol)`.
    *
    * Uses Spark's native `unpivot` (single narrow pass, no shuffle, one
    * output row per (row, folded column) — the Catalyst `Expand` node),
    * which is the engine's core wide→long converter (SURVEY §1.4).
    */
  def unpivot(
      df: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String],
      nameCol: String = "sample",
      valueCol: String = "value"): DataFrame =
    df.unpivot(keyCols.map(col).toArray, valueCols.map(col).toArray, nameCol, valueCol)

  /** Perseus "expand side table" (ref process.py:221-277): fold
    * multiplicity-suffixed columns `base___1/___2/___3` down into rows,
    * replicating unsuffixed columns, adding a `Multiplicity` column and
    * remapping `id -> id___k` (ref process.py:272).
    *
    * Spark-first: one `Expand` (unpivot) per suffixed base column group
    * is wrong (k scans); instead build k projection branches and
    * `unionByName` — exactly one narrow pass per multiplicity, no
    * shuffle, mirrors the reference's structure with lazy evaluation.
    */
  def expandSideTable(df: DataFrame, suffixes: Seq[String] = Seq("___1", "___2", "___3"),
      idCol: String = "id"): DataFrame = {
    val suffixed = df.columns.filter(c => suffixes.exists(c.endsWith))
    // a plain column whose name equals a suffix-stripped expression
    // column (e.g. `Intensity X` next to `Intensity X___1`) would
    // collide with the ripped column — the reference drops it from the
    // replicated side (process.py:252-254); mirrored here
    val stripped = suffixed.map(c =>
      suffixes.find(c.endsWith).map(c.stripSuffix).getOrElse(c)).toSet
    val base = df.columns.filterNot(suffixed.contains)
      .filterNot(c => c != idCol && stripped.contains(c))
    // every requested multiplicity gets a branch, like the reference
    // (process.py:247-268 always emits ___1/___2/___3): a suffix with
    // no matching columns contributes all-null expression cells
    // (verified against padua itself by tools/parity.py)
    val valueBases = suffixed.map(c =>
      suffixes.find(c.endsWith).map(c.stripSuffix).getOrElse(c)).distinct
    def typeOf(baseName: String) =
      df.schema(df.columns.find(c =>
        suffixes.exists(s => c == baseName + s)).get).dataType
    val branches = suffixes.map { sfx =>
      val renamed = valueBases.map { b =>
        if (df.columns.contains(b + sfx)) col(b + sfx).as(b)
        else lit(null).cast(typeOf(b)).as(b)
      }
      val baseCols = base.map {
        case c if c == idCol => concat(col(idCol).cast("string"), lit(sfx)).as(idCol)
        case c               => col(c)
      }
      df.select(baseCols.toIndexedSeq ++ renamed: _*)
        .withColumn("Multiplicity", lit(sfx.stripPrefix("___").toInt))
    }
    branches.reduce(_ unionByName _)
  }

  /** Apply a Column transformer to expression columns with the
    * reference's `±inf → null` guard (ref process.py:309-327
    * `transform_expression_columns`, default log2). Accepting
    * `Column => Column` keeps user functions inside Catalyst codegen
    * (no opaque UDF). */
  def transformExpressionColumns(
      df: DataFrame,
      columns: Seq[String],
      fn: Column => Column = log2): DataFrame = {
    val exprs = df.columns.map { c =>
      if (columns.contains(c)) nanToNull(infToNull(fn(col(c)))).as(c) else col(c)
    }
    df.select(exprs.toIndexedSeq: _*)
  }

  /** ±Infinity → null (pandas `replace([inf,-inf], nan)` idiom). */
  def infToNull(c: Column): Column =
    when(c === Double.PositiveInfinity || c === Double.NegativeInfinity, lit(null)).otherwise(c)

  /** NaN → null: single missingness policy at math edges (SURVEY §7.4). */
  def nanToNull(c: Column): Column = when(isnan(c), lit(null)).otherwise(c)

  /** Mean of column pairs → combined column, originals dropped
    * (ref process.py:198-218 `combine_expression_columns`). */
  def combineExpressionColumns(df: DataFrame, pairs: Seq[(String, String, String)]): DataFrame = {
    val dropped = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val keep = df.columns.filterNot(dropped.contains).map(col)
    val combined = pairs.map { case (a, b, out) => ((col(a) + col(b)) / 2).as(out) }
    df.select(keep.toIndexedSeq ++ combined: _*)
  }

  /** Long→wide at the presentation edge only: `groupBy(keys).pivot(name)`.
    * Passing `distinctValues` avoids the extra distinct-collection job
    * (at scale the pivot domain must be known/bounded anyway). */
  def pivotWide(
      df: DataFrame,
      keyCols: Seq[String],
      nameCol: String,
      valueCol: String,
      distinctValues: Seq[String] = Nil,
      agg: Column => Column = first(_, ignoreNulls = true)): DataFrame = {
    val g = df.groupBy(keyCols.map(col): _*)
    val p = if (distinctValues.nonEmpty) g.pivot(nameCol, distinctValues) else g.pivot(nameCol)
    p.agg(agg(col(valueCol)))
  }
}
