package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-side HTTP clients for the reference's two remote-enrichment
  * services: UniProt ID mapping (ref utils.py:332-356
  * `get_uniprot_id_mapping_pairs`) and PantherDB GO enrichment (ref
  * analysis.py:336-384 `go_enrichment`, the POST at analysis.py:361).
  *
  * These are deliberately DRIVER-side: each is one small blocking POST
  * whose response becomes a broadcast-sized mapping table — the
  * data-plane halves (`Padua.apply_id_mapping`,
  * `Padua.go_enrichment_process`) are where Spark does the work.
  *
  * Disabled by default so tests stay hermetic and zero-egress
  * deployments fail fast with a clear message: enable with
  * `-Dgraft.http.enabled=1` (or env `GRAFT_HTTP_ENABLED=1`). Response
  * PARSING is factored out below and fixture-tested offline
  * (RemoteClientsSpec); the JDK's java.net.http client is used, so no
  * extra dependencies.
  */
object RemoteClients {

  def httpEnabled: Boolean =
    sys.props.get("graft.http.enabled").contains("1") ||
      sys.env.get("GRAFT_HTTP_ENABLED").contains("1")

  private def requireEnabled(): Unit =
    if (!httpEnabled) throw new IllegalStateException(
      "remote HTTP clients are disabled (zero-egress default); " +
        "set -Dgraft.http.enabled=1 to allow outbound requests, or " +
        "inject a parsed response frame into the data-plane operator " +
        "(Padua.apply_id_mapping / Padua.go_enrichment_process) instead")

  // ---- response parsing (pure, fixture-tested) ----

  /** UniProt uploadlists `format=tab` response (ref utils.py:341-355):
    * one header line then `from\tto` rows; HTML (error/redirect pages)
    * is rejected exactly like the reference's `'html' not in
    * r.text[:500]` guard. Duplicate pairs collapse (the reference
    * accumulates into per-key sets). */
  def parseUniprotTab(text: String): Seq[(String, String)] =
    if (text == null || text.isEmpty ||
        text.take(500).toLowerCase(java.util.Locale.ROOT).contains("html")) Seq.empty
    else text.linesIterator.drop(1).flatMap { line =>
      line.split("\t", -1) match {
        case Array(k, v) if k.nonEmpty => Some(k -> v)
        case _ => None
      }
    }.toSeq.distinct

  /** PantherDB enrichment response (ref analysis.py:371-376): 5
    * preamble lines, then TSV rows `GO, Name, Gene ID, P, FDR`.
    * Malformed numeric cells parse to null (the frame's P/FDR columns
    * are nullable doubles), matching pandas' NaN coercion. */
  def parsePantherEnrichment(
      text: String): Seq[(String, String, String, Option[Double], Option[Double])] = {
    def num(s: String): Option[Double] =
      try Some(s.trim.toDouble) catch { case _: NumberFormatException => None }
    if (text == null) Seq.empty
    else text.linesIterator.drop(5).flatMap { line =>
      line.split("\t", -1) match {
        case Array(go, name, gene, p, fdr) => Some((go, name, gene, num(p), num(fdr)))
        case _ => None
      }
    }.toSeq
  }

  /** Parsed UniProt pairs as the broadcastable (from_id, to_id) table
    * `Padua.apply_id_mapping` consumes. */
  def uniprotMappingFrame(spark: SparkSession, pairs: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("from_id", "to_id")
  }

  /** Parsed PantherDB rows as the (GO, Name, Gene ID, P, FDR) table
    * `Padua.go_enrichment_process` consumes. */
  def pantherFrame(
      spark: SparkSession,
      rows: Seq[(String, String, String, Option[Double], Option[Double])]): DataFrame = {
    import spark.implicits._
    rows.toDF("GO", "Name", "Gene ID", "P", "FDR")
  }

  // ---- the HTTP calls (flag-gated) ----

  /** ref utils.py:332-356: POST the seqid list to the UniProt mapping
    * service, parse the tab response. Returns the (from_id, to_id)
    * broadcast table. */
  def getUniprotIdMappingPairs(
      spark: SparkSession,
      from: String,
      to: String,
      seqIds: Seq[String],
      endpoint: String = "https://www.uniprot.org/uploadlists/"): DataFrame = {
    requireEnabled()
    val boundary = newBoundary()
    val url = s"$endpoint?from=${enc(from)}&to=${enc(to)}&format=tab"
    val body = multipartBody(boundary,
      fields = Seq.empty,
      files = Seq(("file", "ids.txt", seqIds.mkString(" "))))
    uniprotMappingFrame(spark, parseUniprotTab(post(url, boundary, body)))
  }

  /** ref analysis.py:355-369: POST the gene list to the PantherDB
    * enrichment service, parse the TSV tail. Returns the
    * (GO, Name, Gene ID, P, FDR) table; feed it to
    * `Padua.go_enrichment_process` for the summary/FDR-gate/sort. */
  def goEnrichmentFetch(
      spark: SparkSession,
      proteinIds: Seq[String],
      enrichment: String = "function",
      organism: String = "Homo sapiens",
      endpoint: String =
        "http://www.pantherdb.org/webservices/garuda/tools/enrichment/VER_2/enrichment.jsp")
      : DataFrame = {
    requireEnabled()
    val boundary = newBoundary()
    val body = multipartBody(boundary,
      fields = Seq("organism" -> organism, "type" -> "enrichment",
        "enrichmentType" -> enrichment),
      files = Seq(("geneList", "genelist.txt", proteinIds.mkString("\n"))))
    pantherFrame(spark, parsePantherEnrichment(post(endpoint, boundary, body)))
  }

  // ---- plumbing ----

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)

  private def newBoundary(): String =
    "----graft" + java.util.UUID.randomUUID().toString.replace("-", "")

  /** RFC 2388 multipart/form-data: plain fields then file parts —
    * the same shape `requests` produces for data= + files=. */
  private[io] def multipartBody(
      boundary: String,
      fields: Seq[(String, String)],
      files: Seq[(String, String, String)]): Array[Byte] = {
    val sb = new StringBuilder
    fields.foreach { case (k, v) =>
      sb.append(s"--$boundary\r\n")
        .append(s"""Content-Disposition: form-data; name="$k"""").append("\r\n\r\n")
        .append(v).append("\r\n")
    }
    files.foreach { case (name, fname, content) =>
      sb.append(s"--$boundary\r\n")
        .append(s"""Content-Disposition: form-data; name="$name"; filename="$fname"""")
        .append("\r\nContent-Type: text/plain\r\n\r\n")
        .append(content).append("\r\n")
    }
    sb.append(s"--$boundary--\r\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  private def post(url: String, boundary: String, body: Array[Byte]): String = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30))
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(120))
      .header("Content-Type", s"multipart/form-data; boundary=$boundary")
      .header("User-Agent", "graft-spark / padua-compatible client")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(body))
      .build()
    client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()).body()
  }
}
