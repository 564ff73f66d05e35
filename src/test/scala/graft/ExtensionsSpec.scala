package graft

/** The SQL-function registration path (SparkSessionExtensions): the
  * shared test session is built withExtensions(new GraftExtensions),
  * so the custom expressions resolve by name in SQL text. */
class ExtensionsSpec extends SparkSpec {

  test("custom p-value expressions are callable from SQL") {
    val p = spark.sql("SELECT t_pvalue_two_sided(-3.484660262186, 5.0) AS p")
      .head().getDouble(0)
    assert(math.abs(p - 0.017570710081) < 1e-9) // scipy golden (StatTestsSpec)
    val fp = spark.sql("SELECT f_pvalue_upper(13.0, 2.0, 6.0) AS p").head().getDouble(0)
    assert(fp > 0.0 && fp < 0.01) // F=13 at (2,6) dof is significant
  }
}
