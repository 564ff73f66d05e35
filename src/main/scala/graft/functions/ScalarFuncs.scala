package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar string/math helpers (ref `padua/utils.py`, `padua/io.py:85`).
  * All composed from built-in codegen'd functions — no UDFs.
  */
object ScalarFuncs {

  /** First protein ID: split on `;`, ` `, `_` and take the head
    * (ref utils.py:108-122 `get_protein_id`). */
  def proteinId(c: Column): Column =
    split(split(split(c, ";").getItem(0), " ").getItem(0), "_").getItem(0)

  /** ID also split on `-` (isoform) — ref io.py:85 `_protein_id`. */
  def proteinIdBase(c: Column): Column =
    split(proteinId(c), "-").getItem(0)

  /** All short IDs as an array (ref utils.py:125-139 `get_protein_ids`). */
  def proteinIds(c: Column): Column =
    transform(split(c, ";"), p => split(split(trim(p), " ").getItem(0), "_").getItem(0))

  /** Text before the first `;` (ref utils.py:165-176 `get_shortstr`). */
  def shortStr(c: Column): Column = split(c, ";").getItem(0)

  /** int → double → string coercion chain (ref process.py:7-20 `numeric`).
    * Returns a struct so all three candidate types survive Catalyst's
    * single-type column rule; consumers pick the field they need.
    * try_cast: failures become null (the reference falls through to
    * the next type) rather than erroring under ANSI mode. */
  def numericCoerce(c: Column): Column =
    struct(
      c.try_cast("long").as("as_long"),
      c.try_cast("double").as("as_double"),
      c.cast("string").as("as_string"))

  /** Join label parts (ref utils.py:191-225 `format_label`). */
  def formatLabel(sep: String, parts: Column*): Column = concat_ws(sep, parts: _*)

  /** Positions of `ms` members within `l`, in `ms` order, skipping
    * absentees (ref utils.py:179-188 `get_index_list`). The reference
    * coerces a scalar to a one-element list; callers pass `Seq(m)`. */
  def indexList[A](l: Seq[A], ms: Seq[A]): Seq[Int] =
    ms.filter(l.contains).map(l.indexOf(_))

  /** Python `%`-style substitution limited to `%s` / `%%` — the only
    * forms the reference feeds `label_format % tuple(shortstr...)`
    * with (string args). Missing args raise, extras are ignored,
    * matching Python only on the forms we accept. */
  private def percentFormat(fmt: String, args: Seq[String]): String = {
    val sb = new StringBuilder
    var i = 0
    var a = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length && fmt.charAt(i + 1) == '%') {
        sb += '%'; i += 2
      } else if (c == '%' && i + 1 < fmt.length && fmt.charAt(i + 1) == 's') {
        require(a < args.length, s"not enough arguments for format string: $fmt")
        sb ++= args(a); a += 1; i += 2
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Combined plot label from indexed parts (ref utils.py:208-225
    * `build_combined_label`): shortstr each selected part, then either
    * join with `sep` or substitute into `labelFormat` (`%s` slots).
    * Driver-side like the reference (plot labelling). */
  def buildCombinedLabel[K](sl: Map[K, String], idxs: Seq[K], sep: String = " ",
      labelFormat: Option[String] = None): String = {
    val parts = idxs.map(n => sl(n).split(";", 2)(0))
    labelFormat match {
      case Some(fmt) => percentFormat(fmt, parts)
      case None      => parts.mkString(sep)
    }
  }

  /** Data-plane twin of `buildCombinedLabel`'s sep path: shortstr each
    * part column, join with sep (codegen'd concat_ws). */
  def combinedLabel(sep: String, parts: Column*): Column =
    concat_ws(sep, parts.map(shortStr): _*)

  /** Data-plane twin of the `label_format` path: `format_string` is
    * printf-style, whose `%s` matches Python's `%s` on string args. */
  def combinedLabelFmt(fmt: String, parts: Column*): Column =
    format_string(fmt, parts.map(shortStr): _*)

  /** Distinct short protein IDs across a frame (ref utils.py:142-162
    * `get_protein_id_list`): explode the per-row ID arrays, distinct. */
  def proteinIdList(df: org.apache.spark.sql.DataFrame, column: String): org.apache.spark.sql.DataFrame =
    df.select(explode(proteinIds(col(column))).as("protein_id")).distinct()

  /** `hierarchical_match` (ref utils.py:228-256): config lookup with
    * progressively truncated tuple keys — driver-side styling/config
    * resolution, not a data-plane operator. */
  def hierarchicalMatch[V](d: Map[Seq[String], V], key: Seq[String], default: V): V = {
    var k = key
    while (k.nonEmpty) {
      d.get(k) match {
        case Some(v) => return v
        case None    => k = k.dropRight(1)
      }
    }
    default
  }

  /** SAM s0 significance curve (ref utils.py:282-317
    * `calculate_s0_curve`): fn(x) = 10^(-s0/(x - minRatio) - mminp)
    * with mminp = -log10(minP), so the curve asymptotes to minP as the
    * ratio grows. Volcano cutoff: significant iff p <= curve(|ratio|)
    * (ref visualize.py:584-598). */
  def s0CurveP(absRatio: Column, s0: Double, minRatio: Double, minP: Double): Column =
    pow(lit(10.0), try_divide(lit(-s0), absRatio - lit(minRatio)) + lit(math.log10(minP)))

  /** Volcano significance classification (ref visualize.py:584-598):
    * point is significant when |ratio| > minRatio and p below the s0
    * curve at that ratio. */
  def s0Significant(p: Column, absRatio: Column, s0: Double, minRatio: Double, minP: Double): Column =
    absRatio > minRatio && p <= s0CurveP(absRatio, s0, minRatio, minP)
}
