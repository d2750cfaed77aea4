package graft.acceptance

import scala.io.Source

/** Loader for the vendored reporting goldens
  * (`src/test/resources/reporting_goldens/<scenario>/` — engine-independent
  * EXPECTED-OUTPUT DATA copied verbatim from the reference's
  * `tests/expected_outputs/reporting/` by `tools/vendor_reporting_goldens.py`)
  * plus the minimal JSON machinery the NDJSON frames and the manifest need.
  *
  * Comparison contract (reference
  * `tests/acceptance/reporting/test_reporting_golden.py`): structure-exact —
  * column names in manifest order, row refs/names in frame order, exact null
  * positions — and Float64 within rtol=1e-9 / atol=1e-6.
  */
object ReportingGoldens {

  // ---- minimal JSON (objects/arrays/strings/numbers/bools/null) ----------

  sealed trait J
  final case class JObj(fields: Vector[(String, J)]) extends J {
    def apply(k: String): J = fields.find(_._1 == k).map(_._2)
      .getOrElse(sys.error(s"missing key $k"))
    def get(k: String): Option[J] = fields.find(_._1 == k).map(_._2)
    def keys: Vector[String] = fields.map(_._1)
  }
  final case class JArr(items: Vector[J]) extends J
  final case class JStr(s: String) extends J
  final case class JNum(d: Double) extends J
  final case class JBool(b: Boolean) extends J
  case object JNull extends J

  def parseJson(text: String): J = {
    val it = new Parser(text)
    val v = it.value()
    it.skipWs()
    require(it.eof, s"trailing JSON content at ${it.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      skipWs()
      require(!eof && s(pos) == c, s"expected '$c' at $pos")
      pos += 1
    }
    def value(): J = {
      skipWs()
      s(pos) match {
        case '{' =>
          pos += 1; skipWs()
          val fields = Vector.newBuilder[(String, J)]
          if (s(pos) == '}') { pos += 1; return JObj(fields.result()) }
          var done = false
          while (!done) {
            skipWs()
            val k = str()
            expect(':')
            fields += ((k, value()))
            skipWs()
            if (s(pos) == ',') pos += 1 else { expect('}'); done = true }
          }
          JObj(fields.result())
        case '[' =>
          pos += 1; skipWs()
          val items = Vector.newBuilder[J]
          if (s(pos) == ']') { pos += 1; return JArr(items.result()) }
          var done = false
          while (!done) {
            items += value()
            skipWs()
            if (s(pos) == ',') pos += 1 else { expect(']'); done = true }
          }
          JArr(items.result())
        case '"' => JStr(str())
        case 't' => pos += 4; JBool(true)
        case 'f' => pos += 5; JBool(false)
        case 'n' => pos += 4; JNull
        case _ =>
          val start = pos
          while (!eof && "+-0123456789.eE".indexOf(s(pos)) >= 0) pos += 1
          JNum(s.substring(start, pos).toDouble)
      }
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s(pos) != '"') {
        if (s(pos) == '\\') {
          pos += 1
          s(pos) match {
            case 'n' => sb += '\n'
            case 't' => sb += '\t'
            case 'r' => sb += '\r'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'u' =>
              sb += Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar
              pos += 4
            case c => sb += c
          }
        } else sb += s(pos)
        pos += 1
      }
      pos += 1
      sb.toString
    }
  }

  // ---- golden scenario model ---------------------------------------------

  /** One golden frame: ordered column names (from the manifest schema),
    * the String-typed label columns, and ordered rows of (row_ref,
    * row_name, numeric values, string values). */
  final case class GoldenFrame(cols: Vector[String], strCols: Set[String],
      rows: Vector[(String, String, Map[String, Option[Double]], Map[String, Option[String]])])

  final case class GoldenScenario(name: String,
      frames: Map[String, GoldenFrame],
      frameOrder: Vector[String],
      meta: JObj)

  private def resource(path: String): String = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing test resource $path")
    try Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  def load(scenario: String): GoldenScenario = {
    val base = s"/reporting_goldens/$scenario"
    val manifest = parseJson(resource(s"$base/manifest.json")).asInstanceOf[JObj]
    val frameSchemas = manifest("frames").asInstanceOf[JObj]
    val frames = frameSchemas.fields.map { case (frameName, schemaJ) =>
      val schema = schemaJ.asInstanceOf[JObj]
      val cols = schema.keys.filterNot(c => c == "row_ref" || c == "row_name")
      val strCols = cols.filter(c => schema(c) == JStr("String")).toSet
      val rows = resource(s"$base/$frameName.ndjson").linesIterator
        .filter(_.nonEmpty).map { line =>
          val o = parseJson(line).asInstanceOf[JObj]
          val ref = o("row_ref").asInstanceOf[JStr].s
          val name = o("row_name").asInstanceOf[JStr].s
          val vals = cols.filterNot(strCols).map { c =>
            c -> (o.get(c) match {
              case Some(JNum(d)) => Some(d)
              case _ => None
            })
          }.toMap
          val strs = cols.filter(strCols).map { c =>
            c -> (o.get(c) match {
              case Some(JStr(v)) => Some(v)
              case _ => None
            })
          }.toMap
          (ref, name, vals, strs)
        }.toVector
      frameName -> GoldenFrame(cols, strCols, rows)
    }.toMap
    GoldenScenario(scenario, frames, frameSchemas.keys,
      manifest("meta").asInstanceOf[JObj])
  }

  // ---- frame comparison ----------------------------------------------------

  /** Float64 within rtol=1e-9 / atol=1e-6 (the reference gate's `_RTOL` /
    * `_ATOL`); exact null positions. */
  def cellsMatch(expected: Option[Double], actual: Option[Double]): Boolean =
    (expected, actual) match {
      case (None, None) => true
      case (Some(e), Some(a)) =>
        math.abs(a - e) <= math.max(1e-6, 1e-9 * math.abs(e))
      case _ => false
    }

  /** Diff one built frame against its golden; Nil = match. */
  def diff(frameName: String, golden: GoldenFrame,
      built: graft.refbook.RefFrame): List[String] = {
    val issues = List.newBuilder[String]
    if (built.cols != golden.cols)
      issues += s"$frameName: columns ${built.cols.mkString(",")} != golden ${golden.cols.mkString(",")}"
    val builtRows = built.rows
    if (builtRows.map(_._1) != golden.rows.map(_._1))
      issues += s"$frameName: row refs ${builtRows.map(_._1).mkString(",")} != golden ${golden.rows.map(_._1).mkString(",")}"
    else {
      for (((ref, name, vals, strs), (bRef, bName)) <- golden.rows.zip(builtRows)) {
        if (bName != name)
          issues += s"$frameName r$ref: row_name '$bName' != '$name'"
        for (c <- golden.cols if built.cols.contains(c)) {
          if (golden.strCols(c)) {
            val exp = strs(c)
            val act = built.strValue(bRef, c)
            if (exp != act)
              issues += s"$frameName r$ref c$c: built '${act.getOrElse("null")}' != golden '${exp.getOrElse("null")}'"
          } else {
            val exp = vals(c)
            val act = built.value(bRef, c)
            if (!cellsMatch(exp, act))
              issues += s"$frameName r$ref c$c: built ${act.getOrElse("null")} != golden ${exp.getOrElse("null")}"
          }
        }
      }
    }
    issues.result()
  }
}
