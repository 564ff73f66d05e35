package graft.io

import graft.SparkSpec

/** Hermetic tests for the driver-side HTTP clients: the gate (no
  * network by default) and the response parsers against canned
  * fixtures shaped exactly like the services' replies (ref
  * utils.py:341-355 tab format; analysis.py:371-376 skiprows=5 TSV). */
class RemoteClientsSpec extends SparkSpec {

  test("HTTP calls are disabled by default (zero-egress) and fail fast") {
    assert(!RemoteClients.httpEnabled)
    val e = intercept[IllegalStateException] {
      RemoteClients.getUniprotIdMappingPairs(spark, "ACC+ID", "KEGG_ID", Seq("P07830"))
    }
    assert(e.getMessage.contains("disabled"))
    intercept[IllegalStateException] {
      RemoteClients.goEnrichmentFetch(spark, Seq("P07830"))
    }
  }

  test("parseUniprotTab: header skipped, pairs deduped, html rejected") {
    val fixture = "From\tTo\nP07830\thsa:71\nP07830\thsa:72\nQ12345\thsa:99\nP07830\thsa:71\n"
    assert(RemoteClients.parseUniprotTab(fixture) ==
      Seq("P07830" -> "hsa:71", "P07830" -> "hsa:72", "Q12345" -> "hsa:99"))
    // the reference's guard: an html error page yields no mapping
    assert(RemoteClients.parseUniprotTab("<!DOCTYPE html><html>err</html>").isEmpty)
    assert(RemoteClients.parseUniprotTab("").isEmpty)
    // malformed rows are skipped, not fatal
    assert(RemoteClients.parseUniprotTab("From\tTo\nonly-one-field\nA\tB\n") ==
      Seq("A" -> "B"))
  }

  test("parseUniprotTab frame feeds apply_id_mapping as a broadcast join") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val mapping = RemoteClients.uniprotMappingFrame(spark,
      RemoteClients.parseUniprotTab("From\tTo\nP1\tKEGG:1\nP2\tKEGG:2\n"))
    val df = Seq(("P1", 10.0), ("P3", 20.0)).toDF("pid", "v")
    val out = graft.Padua.apply_id_mapping(df, mapping, "pid")
      .collect().map(r => (r.getString(0), Option(r.getString(2)))).toSet
    assert(out == Set("P1" -> Some("KEGG:1"), "P3" -> None))
  }

  test("parsePantherEnrichment: 5 preamble lines skipped, numerics coerced, nulls kept") {
    val fixture =
      "PANTHER GO enrichment\nversion 2\nuploaded 2\nmapped 2\n\n" +
      "GO:0003674\tmolecular_function\tP07830\t0.001\t0.01\n" +
      "GO:0008150\tbiological_process\tQ12345\tbroken\t0.2\n" +
      "short\trow\n"
    val rows = RemoteClients.parsePantherEnrichment(fixture)
    assert(rows == Seq(
      ("GO:0003674", "molecular_function", "P07830", Some(0.001), Some(0.01)),
      ("GO:0008150", "biological_process", "Q12345", None, Some(0.2))))
    val frame = RemoteClients.pantherFrame(spark, rows)
    assert(frame.columns.toSeq == Seq("GO", "Name", "Gene ID", "P", "FDR"))
    // the data-plane tail consumes it directly
    val processed = graft.Padua.go_enrichment_process(frame, fdr = 0.05)
    assert(processed.collect().map(_.getString(0)).toSeq == Seq("GO:0003674"))
  }

  test("multipart body carries fields then file parts with the closing boundary") {
    val body = new String(RemoteClients.multipartBody("BBB",
      fields = Seq("organism" -> "Homo sapiens", "type" -> "enrichment"),
      files = Seq(("geneList", "genelist.txt", "P1\nP2"))),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(body.contains("--BBB\r\nContent-Disposition: form-data; name=\"organism\"\r\n\r\nHomo sapiens\r\n"))
    assert(body.contains("name=\"geneList\"; filename=\"genelist.txt\""))
    assert(body.contains("\r\n\r\nP1\nP2\r\n"))
    assert(body.endsWith("--BBB--\r\n"))
  }
}
