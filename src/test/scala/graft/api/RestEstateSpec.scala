package graft.api

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-trips for the round-11 REST estate surface (reference
  * `api/rest.py:325-728`): templates index + single template,
  * supervisory validations, framework comparison, reconcile +
  * recon export, and the run export formats. */
class RestEstateSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def http(
      port: Int, path: String, method: String = "GET",
      body: String = null): (Int, String) = {
    val conn = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    if (body != null) {
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      try os.write(body.getBytes(StandardCharsets.UTF_8)) finally os.close()
    }
    val status = conn.getResponseCode
    val is = if (status >= 400) conn.getErrorStream else conn.getInputStream
    val text = new String(is.readAllBytes(), StandardCharsets.UTF_8)
    (status, text)
  }

  private def httpBytes(port: Int, path: String): (Int, Array[Byte]) = {
    val conn = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    val status = conn.getResponseCode
    val is = if (status >= 400) conn.getErrorStream else conn.getInputStream
    (status, is.readAllBytes())
  }

  private def jsonEscape(s: String): String = s
    .replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  private def calculateRun(port: Int): String = {
    val (cs, cb) = http(port, "/api/calculate", "POST",
      s"""{"dataPath": "$sfDir", "permissionMode": "irb"}""")
    assert(cs == 200 && cb.contains("\"success\":true"), cb)
    "run-\\d+".r.findFirstIn(cb).get
  }

  test("templates index + single sheet + validations + comparison") {
    val srv = new RestServer(spark)
    val port = srv.start()
    try {
      val runId = calculateRun(port)

      // index: every catalog entry listed, family filter narrows
      val (ts, tb) = http(port, s"/api/templates?run_id=$runId")
      assert(ts == 200 && tb.contains("\"C09.01\"") &&
        tb.contains("\"CR5\"") && tb.contains("\"framework\":\"CRR\""), tb.take(300))
      val (fs, fb) = http(port, s"/api/templates?run_id=$runId&family=corep")
      assert(fs == 200 && fb.contains("\"C09.01\"") && !fb.contains("\"CR5\""))

      // one template: rows + the published readable-name banner
      val (s1, b1) = http(port, s"/api/templates/C09.01?run_id=$runId&sheet=ALL")
      assert(s1 == 200 && b1.contains("RWEA after supporting factors") &&
        b1.contains("\"rows\":[{") && b1.contains("\"sheet\":\"ALL\""), b1.take(300))
      // the returned rows are exactly the generated sheet's ALL slice
      val expect = graft.reporting.TemplateCatalog
        .sheet(spark, sfDir, "C09.01").get
        .filter(col("country") === "ALL").count()
      assert(s""""n_rows":$expect""".r.findFirstIn(b1).nonEmpty, b1.take(200))
      assert(http(port, s"/api/templates/NOPE?run_id=$runId")._1 == 404)
      assert(http(port,
        s"/api/templates/C09.01?run_id=$runId&sheet=ATLANTIS")._1 == 404)
      // a sheet selector on an UNSHEETED template is a 404, not a
      // silent full-frame echo
      val flat = graft.reporting.TemplateCatalog.index
        .find(_.sheetCol.isEmpty).get.id
      assert(http(port,
        s"/api/templates/$flat?run_id=$runId&sheet=0001")._1 == 404)
      assert(http(port, "/api/templates")._1 == 404) // no run_id

      // validations: catalogue verdict for the run's framework
      val (vs, vb) = http(port, s"/api/validations?run_id=$runId")
      assert(vs == 200 && vb.contains("\"publisher\":\"EBA\"") &&
        vb.contains("\"is_submittable\":") &&
        vb.contains("\"rules_executed\":") &&
        vb.contains("\"not_evaluated_reasons\""), vb.take(300))
      // the status buckets (incl. not_triggered) sum to rules_executed
      def n(key: String): Long =
        ("\"" + key + "\":(\\d+)").r.findFirstMatchIn(vb).get.group(1).toLong
      assert(n("passed") + n("failed") + n("vacuous") + n("not_triggered") +
        n("not_evaluated") == n("rules_executed"), vb.take(400))

      // comparison: one-pass shadow-regime deltas + per-regime totals
      val (cs2, cb2) = http(port, "/api/comparison", "POST",
        s"""{"dataPath": "$sfDir"}""")
      assert(cs2 == 200 && cb2.contains("\"crr\"") &&
        cb2.contains("\"basel_3_1\"") && cb2.contains("\"delta_rwa\""), cb2.take(300))
      assert(http(port, "/api/comparison", "POST", "{}")._1 == 422)
    } finally srv.stop()
  }

  test("export formats stream back server-built artifacts") {
    val srv = new RestServer(spark)
    val port = srv.start()
    try {
      val runId = calculateRun(port)
      // corep workbook: a zip (xlsx) whose magic bytes check out
      val (ws, wbts) = httpBytes(port, s"/api/export/corep?run_id=$runId")
      assert(ws == 200 && wbts.length > 2000 &&
        wbts(0) == 'P'.toByte && wbts(1) == 'K'.toByte)
      // facts feed: ndjson rows keyed by template/cell
      val (ns, nb) = http(port, s"/api/export/corep_facts_ndjson?run_id=$runId")
      assert(ns == 200 && nb.contains("\"template_id\":\"C09.01\"") &&
        nb.contains("\"row_ref\""), nb.take(200))
      // raw summary excel
      val (es, ebts) = httpBytes(port, s"/api/export/excel?run_id=$runId")
      assert(es == 200 && ebts(0) == 'P'.toByte && ebts(1) == 'K'.toByte)
      // csv zip of ledger + summary
      val (zs, zbts) = httpBytes(port, s"/api/export/csv?run_id=$runId")
      assert(zs == 200 && zbts(0) == 'P'.toByte && zbts(1) == 'K'.toByte)
      assert(http(port, s"/api/export/bogus?run_id=$runId")._1 == 404)
      assert(http(port, "/api/export/corep?run_id=run-999")._1 == 404)
    } finally srv.stop()
  }

  test("reconcile round-trip: inline mapping -> tiers -> excel/csv export") {
    val srv = new RestServer(spark)
    val port = srv.start()
    try {
      val runId = calculateRun(port)

      // fabricate the legacy dump from our own ledger (one key perturbed)
      val calc = new CreditRiskCalc(spark,
        CalcConfig(dataPath = sfDir, permissionMode = "irb"))
      val res = calc.calculate()
      val keyed = res.ledger.get.groupBy(col("exposure_reference"))
        .agg(sum(col("rwa").cast("decimal(38,2)")).cast("double").as("rwa"))
      val firstKey = keyed.select(min(col("exposure_reference"))).first().getString(0)
      val dir = Files.createTempDirectory("graft_rest_recon").toString
      keyed.select(col("exposure_reference").as("EXPOSURE_REF"),
          when(col("exposure_reference") === firstKey, col("rwa") + 1000.0)
            .otherwise(col("rwa")).as("RWA_AMT"))
        .coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(s"$dir/legacy_csv")
      val part = Files.list(Paths.get(s"$dir/legacy_csv")).toArray
        .map(_.toString).filter(_.endsWith(".csv")).head

      val toml =
        s"""legacy_file = "$part"
           |legacy_format = "csv"
           |legacy_keys = ["EXPOSURE_REF"]
           |our_keys = ["exposure_reference"]
           |top_n = 5
           |
           |[components.rwa]
           |legacy_column = "RWA_AMT"
           |tol_kind = "abs"
           |tol = 0.5
           |""".stripMargin
      val (rs, rb) = http(port, "/api/reconcile", "POST",
        s"""{"dataPath": "$sfDir", "runId": "$runId", """ +
          s""""mappingToml": "${jsonEscape(toml)}"}""")
      assert(rs == 200 && rb.contains("\"success\":true") &&
        rb.contains("\"has_breaks\":true") &&
        rb.contains("\"row_bucket\":\"break\"") &&
        rb.contains(firstKey), rb.take(400))
      val reconId = "recon-\\d+".r.findFirstIn(rb).get

      // excel + csv exports stream zips
      val (xs, xbts) = httpBytes(port,
        s"/api/reconcile/export/excel?recon_id=$reconId")
      assert(xs == 200 && xbts(0) == 'P'.toByte && xbts(1) == 'K'.toByte)
      val (cs3, cbts) = httpBytes(port,
        s"/api/reconcile/export/csv?recon_id=$reconId")
      assert(cs3 == 200 && cbts(0) == 'P'.toByte && cbts(1) == 'K'.toByte)

      // error semantics
      // an unknown/evicted runId must 404, never silently reconcile
      // under a fresh default config
      assert(http(port, "/api/reconcile", "POST",
        s"""{"dataPath": "$sfDir", "runId": "run-99999", """ +
          s""""mappingToml": "${jsonEscape(toml)}"}""")._1 == 404)
      assert(http(port, "/api/reconcile/export/excel?recon_id=nope")._1 == 404)
      assert(http(port, "/api/reconcile", "POST",
        s"""{"dataPath": "$sfDir"}""")._1 == 422)
      assert(http(port, "/api/reconcile", "POST",
        s"""{"dataPath": "$sfDir", "mappingToml": "not valid"}""")._1 == 422)
    } finally srv.stop()
  }

  test("dataRoot gates the reconcile mapping's legacy_file") {
    val srv = new RestServer(spark, dataRoot = Some("/root/testdata"))
    val port = srv.start()
    try {
      val toml = "legacy_file = \"/etc/passwd\"\nlegacy_format = \"csv\"\n"
      val (s1, b1) = http(port, "/api/reconcile", "POST",
        s"""{"dataPath": "sf0.001", "mappingToml": "${jsonEscape(toml)}"}""")
      assert(s1 == 422 && b1.contains("legacy_file"), b1)
    } finally srv.stop()
  }
}
