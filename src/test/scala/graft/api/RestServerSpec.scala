package graft.api

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import graft.SparkSpec

class RestServerSpec extends SparkSpec {

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

  test("REST lifecycle: frameworks -> calculate -> results -> summary -> lineage") {
    val srv = new RestServer(spark)
    val port = srv.start()
    try {
      val (fs, fb) = http(port, "/api/frameworks")
      assert(fs == 200 && fb.contains("BASEL_3_1"))

      val (cs, cb) = http(port, "/api/calculate", "POST",
        s"""{"dataPath": "$sfDir", "permissionMode": "irb"}""")
      assert(cs == 200 && cb.contains("\"success\":true"), cb)
      val runId = "run-\\d+".r.findFirstIn(cb).get

      // an identical request reuses the indexed run (nothing on disk
      // changed, so the pre-run fingerprint matches)
      val (cs2, cb2) = http(port, "/api/calculate", "POST",
        s"""{"dataPath": "$sfDir", "permissionMode": "irb"}""")
      assert(cs2 == 200 && cb2.contains("\"reused\":true")
        && cb2.contains("\"" + runId + "\""), cb2)

      val (rs, rb) = http(port, s"/api/results?run_id=$runId&limit=3")
      assert(rs == 200 && rb.contains("exposure_class"), rb)

      val (ss, sb) = http(port, s"/api/results/summary?run_id=$runId&dimension=approach")
      assert(ss == 200 && sb.contains("\"approach\":\"IRB\""), sb)

      val (ls, lb) = http(port, s"/api/lineage?run_id=$runId&exposure=ORD-1")
      assert(ls == 200 && lb.contains("\"exposure_reference\":\"ORD-1\""), lb)

      // cell-keyed drill-down: any published C 07.00 cell id resolves to
      // its predicate slice + re-evaluated value
      val (cls2, clb2) = http(port,
        s"/api/lineage/cell?run_id=$runId&cell=C07%7CR_corporate%7CC0010")
      assert(cls2 == 200 && clb2.contains("\"cell_id\":\"C07|R_corporate|C0010\"")
        && clb2.contains("\"rows\":[") && clb2.contains("\"value\":"), clb2)
      assert(http(port, s"/api/lineage/cell?run_id=$runId&cell=bogus")._1 == 404)
      assert(http(port, s"/api/lineage/cell?run_id=$runId")._1 == 422)

      // C 08 cells dispatch over the leg-derived IRB slice
      val (cls3, clb3) = http(port,
        s"/api/lineage/cell?run_id=$runId&cell=C08%7CR_TOTAL%7CC0255")
      assert(cls3 == 200 && clb3.contains("\"cell_id\":\"C08|R_TOTAL|C0255\""), clb3)

      // error semantics mirror the reference: unknown run 404, bad input 422
      assert(http(port, "/api/results?run_id=run-999")._1 == 404)
      assert(http(port, s"/api/results/summary?run_id=$runId&dimension=bogus")._1 == 422)
      assert(http(port, "/api/calculate", "POST", "{}")._1 == 422)
      assert(http(port, s"/api/results?run_id=$runId&limit=abc")._1 == 422)
      assert(http(port, s"/api/results?run_id=$runId&offset=-5")._1 == 422)
      assert(http(port, "/api/calculate", "POST",
        """{"dataPath": {"nested": "x"}}""")._1 == 422)
    } finally srv.stop()
  }

  test("estate-wide lineage: a cell from every keyed template resolves, " +
    "and the drilled value matches the published sheet cell") {
    import org.apache.spark.sql.functions.col
    val srv = new RestServer(spark)
    val port = srv.start()
    try {
      val (cs, cb) = http(port, "/api/calculate", "POST",
        s"""{"dataPath": "$sfDir", "permissionMode": "irb"}""")
      assert(cs == 200, cb)
      val runId = "run-\\d+".r.findFirstIn(cb).get
      def drilled(cell: String): Double = {
        val enc = java.net.URLEncoder.encode(cell, "UTF-8")
        val (st, b) = http(port, s"/api/lineage/cell?run_id=$runId&cell=$enc")
        assert(st == 200, s"$cell -> $b")
        """"value":(-?[0-9.E]+)""".r.findFirstMatchIn(b)
          .map(_.group(1).toDouble)
          .getOrElse(fail(s"no value in $b"))
      }
      // C 09.01: the ALL sheet's corporates RWEA post-SF cell
      val c09 = graft.queries.Corep09.q158CorepC09.build(spark, sfDir)
        .filter(col("country") === "ALL" && col("row_ref") === "0070")
        .select("c0090").head.getDouble(0)
      assert(drilled("C0901|ALL|0070|c0090") === c09)
      // C 09.02: the ALL sheet's total exposure value (and its laddered
      // provisions cell resolves through the allocated carrier)
      val c0902 = graft.queries.Corep09.q160CorepC0902.build(spark, sfDir)
        .filter(col("country") === "ALL" && col("row_ref") === "0150")
        .select("c0105", "c0055").head
      assert(drilled("C0902|ALL|0150|c0105") === c0902.getDouble(0))
      assert(drilled("C0902|ALL|0150|c0055") === c0902.getDouble(1))
      // C 02.00: the SA corporates class row, CRR regime
      val c02 = graft.queries.Corep08.q140CorepC02.build(spark, sfDir)
        .filter(col("row_ref") === "0130")
        .select("rwea_crr").head.getDouble(0)
      assert(drilled("C02|0130|crr") === c02)
      // CR4: the total row's RWEA
      val cr4 = graft.queries.Domain.q102Pillar3Cr4.build(spark, sfDir)
        .filter(col("row_id") === "total")
        .select("rwea").head.getDouble(0)
      assert(drilled("CR4|total|rwea") === cr4)
      // CR9: the institutions sheet's Total-row distinct obligor count
      val cr9 = graft.queries.Domain.q145Cr9Full.build(spark, sfDir)
        .filter(col("sheet_key") === "foundation_irb - institution" &&
          col("row_ref") === 18)
        .select("n_obligors").head.getLong(0)
      assert(drilled("CR9|institution|18|n_obligors") === cr9.toDouble)
      // C 08.02 band grid: the institutions class total ties the sheet
      val c0802 = graft.queries.Corep08.q128CorepC0802.build(spark, sfDir)
        .filter(col("exposure_class") === "institution" &&
          col("row_ref") === 99)
        .select("orig_exposure").head.getDouble(0)
      assert(drilled("C0802|institution|ALL|orig_exposure") === c0802)
      // CR5: the corporate row's 100% band and the total row's exposure
      // value tie the published band grid
      val cr5 = graft.queries.Pillar3.q161Pillar3Cr5.build(spark, sfDir)
        .collect().map(r => r.getAs[String]("row_id") -> r).toMap
      assert(drilled("CR5|corporate|b100") ===
        cr5("corporate").getAs[Double]("b100"))
      assert(drilled("CR5|total|total_ev") ===
        cr5("total").getAs[Double]("total_ev"))
      // formula cells carry no frame binding -> 404, like unknown cells
      val enc = java.net.URLEncoder.encode("C0902|ALL|0150|c0080", "UTF-8")
      assert(http(port, s"/api/lineage/cell?run_id=$runId&cell=$enc")._1 == 404)
    } finally srv.stop()
  }

  test("results pagination: deep offset pages in-plan and keyset cursor walks the set") {
    val srv = new RestServer(spark)
    val port = srv.start()
    try {
      val (cs, cb) = http(port, "/api/calculate", "POST",
        s"""{"dataPath": "$sfDir", "permissionMode": "irb"}""")
      assert(cs == 200, cb)
      val runId = "run-\\d+".r.findFirstIn(cb).get

      // page 1 via offset, page 2 via deep offset — row_number filter
      // runs inside the plan (no offset-deep driver collect)
      val (s1, b1) = http(port, s"/api/results?run_id=$runId&limit=2&offset=0")
      val (s2, b2) = http(port, s"/api/results?run_id=$runId&limit=2&offset=2")
      assert(s1 == 200 && s2 == 200)
      assert(b1 != b2, "deep-offset page must differ from the first page")

      // keyset walk: page 1's next_after cursor fetches strictly-later
      // rows and the two pages agree with the offset pages
      val cursor = java.net.URLEncoder.encode(
        "\"next_after\":\"([^\"]+)\"".r
          .findFirstMatchIn(b1).map(_.group(1)).get, "UTF-8")
      val (s3, b3) = http(port,
        s"/api/results?run_id=$runId&limit=2&after=$cursor")
      assert(s3 == 200)
      // field order inside a row object is map-order; compare the two
      // key fields independently
      def rows(b: String) = (
        "\"exposure_class\":\"[a-z_]+\"".r.findAllIn(b).toSeq,
        "\"approach\":\"[A-Z]+\"".r.findAllIn(b).toSeq)
      assert(rows(b3) == rows(b2),
        s"keyset page ${rows(b3)} != offset page ${rows(b2)}")
    } finally srv.stop()
  }

  test("dataRoot allowlist: a path outside the configured root is rejected") {
    val srv = new RestServer(spark, dataRoot = Some("/root/testdata"))
    val port = srv.start()
    try {
      // inside the root (relative to it): accepted
      val (okS, okB) = http(port, "/api/calculate", "POST",
        """{"dataPath": "sf0.001", "permissionMode": "irb"}""")
      assert(okS == 200 && okB.contains("\"success\":true"), okB)
      // escape attempts: rejected before the loader sees them
      assert(http(port, "/api/calculate", "POST",
        """{"dataPath": "/etc"}""")._1 == 422)
      assert(http(port, "/api/validate", "POST",
        """{"dataPath": "../repo"}""")._1 == 422)
    } finally srv.stop()
  }
}
