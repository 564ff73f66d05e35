package graft

/** Structural plan checks shared by PlanSpec (test gate) and PlanAudit
  * (CLI gate) — ONE definition so the two gates can't drift.
  */
object PlanChecks {

  private val Marker = "windowspecdefinition("
  private val SortSuffixes = Seq(
    "ASC NULLS FIRST", "ASC NULLS LAST", "DESC NULLS FIRST", "DESC NULLS LAST")

  /** Window specs in an explain string whose PARTITION BY list is
    * EMPTY (invariant 6: single-partition global windows are banned in
    * every data plane).
    *
    * In Spark's explain format `windowspecdefinition(part..., sort...,
    * frame)` lists partition expressions first, then sort specs
    * (`expr ASC NULLS FIRST`), then the frame — so an empty partition
    * list means the FIRST argument is a sort spec. The first argument
    * is scanned at paren/bracket depth 0 (a naive `[^(,]*` regex
    * false-negatives when the first sort key contains a call like
    * `lower(x)` or a cast, because it stops at the inner paren before
    * reaching the direction keyword). Returns a context snippet per
    * offending spec. */
  def unpartitionedWindowSpecs(plan: String): List[String] = {
    val out = List.newBuilder[String]
    var idx = plan.indexOf(Marker)
    while (idx >= 0) {
      val start = idx + Marker.length
      var depth = 0
      var i = start
      while (i < plan.length &&
        !(depth == 0 && (plan.charAt(i) == ',' || plan.charAt(i) == ')'))) {
        val c = plan.charAt(i)
        if (c == '(' || c == '[') depth += 1
        else if (c == ')' || c == ']') depth -= 1
        i += 1
      }
      val firstArg = plan.substring(start, i).trim
      if (SortSuffixes.exists(firstArg.endsWith))
        out += plan.substring(idx, math.min(plan.length, i + 1))
      idx = plan.indexOf(Marker, start)
    }
    out.result()
  }
}
