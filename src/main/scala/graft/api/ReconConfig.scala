package graft.api

import java.nio.file.{Files, Paths, Path}

/** Reconciliation run settings loaded from a TOML config file (reference
  * `api/reconciliation.py:41-56` `ReconciliationSettings`,
  * `load_reconciliation_config` `:63-76`, `_settings_from_raw` `:179-205`).
  *
  * `legacyFile` given relative in the config resolves against the config
  * file's directory so a config + data bundle stays portable (reference
  * `:66-67`).
  */
final case class ComponentMapping(
    legacyColumn: String,
    scale: Double = 1.0,
    valueMap: Seq[(String, String)] = Nil,
    tolKind: Option[String] = None, // "abs" | "rel"
    tol: Option[Double] = None)

final case class ReconSettings(
    legacyFile: String,
    legacyFormat: String = "csv", // "csv" | "parquet"
    legacyKeys: Seq[String] = Nil,
    ourKeys: Seq[String] = Seq("exposure_reference"),
    components: Seq[(String, ComponentMapping)] = Nil,
    topN: Int = 50)

/** Minimal TOML reader for the reconciliation config shape — the honest
  * Scala analogue of the reference's stdlib-`tomllib` read path (zero-egress
  * build: no TOML library is resolvable, and the config grammar the
  * reference actually emits — `dump_reconciliation_config`,
  * `api/reconciliation.py:92-118` — is flat key/value + `[components.*]`
  * tables + one inline table, which this covers). Supported values:
  * strings, numbers, booleans, string arrays, inline string tables.
  */
object ReconConfig {

  def load(path: String): ReconSettings = {
    val p = Paths.get(path)
    val text = new String(Files.readAllBytes(p), "UTF-8")
    loads(text, Option(p.getParent).getOrElse(Paths.get(".")))
  }

  def loads(text: String, baseDir: Path = Paths.get(".")): ReconSettings = {
    val (top, tables) = parse(text)
    val legacyRaw = top.get("legacy_file") match {
      case Some(s: String) if s.nonEmpty => s
      case _ => throw new IllegalArgumentException(
        "reconciliation config must set 'legacy_file'")
    }
    val legacy =
      if (Paths.get(legacyRaw).isAbsolute) legacyRaw
      else baseDir.resolve(legacyRaw).normalize.toString
    val fmt = top.get("legacy_format").map(_.toString).getOrElse("csv")
    if (fmt != "csv" && fmt != "parquet") throw new IllegalArgumentException(
      s"legacy_format must be 'parquet' or 'csv', got '$fmt'")
    val comps = tables.collect { case (name, kv) if name.startsWith("components.") =>
      val cname = name.stripPrefix("components.")
      val legacyCol = kv.get("legacy_column") match {
        case Some(s: String) => s
        case _ => throw new IllegalArgumentException(
          s"component '$cname' must set 'legacy_column'")
      }
      val tolKind = kv.get("tol_kind").map(_.toString)
      tolKind.foreach { k =>
        if (k != "abs" && k != "rel") throw new IllegalArgumentException(
          s"component '$cname': tol_kind must be 'abs' or 'rel', got '$k'")
      }
      cname -> ComponentMapping(
        legacyColumn = legacyCol,
        scale = kv.get("scale").map(_.toString.toDouble).getOrElse(1.0),
        valueMap = kv.get("value_map") match {
          case Some(m: Seq[_]) =>
            m.collect { case (k: String, v: String) => (k, v) }
          case _ => Nil
        },
        tolKind = tolKind,
        tol = kv.get("tol").map(_.toString.toDouble))
    }
    ReconSettings(
      legacyFile = legacy,
      legacyFormat = fmt,
      legacyKeys = strList(top.get("legacy_keys")),
      ourKeys = top.get("our_keys").map(v => strList(Some(v)))
        .filter(_.nonEmpty).getOrElse(Seq("exposure_reference")),
      components = comps,
      topN = top.get("top_n").map(_.toString.toDouble.toInt).getOrElse(50))
  }

  private def strList(v: Option[Any]): Seq[String] = v match {
    case Some(xs: Seq[_]) => xs.collect { case s: String => s }
    case _ => Nil
  }

  /** Line-oriented parse → (top-level keys, ordered section tables). */
  private def parse(text: String): (Map[String, Any], Seq[(String, Map[String, Any])]) = {
    val header = """^\[([A-Za-z0-9_.\-]+)\]$""".r
    val keyVal = """^([A-Za-z0-9_\-]+)\s*=\s*(.+)$""".r
    var top = Map.empty[String, Any]
    val tables = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, Any]]
    var current: Option[String] = None
    for (raw <- text.linesIterator) {
      val line = stripComment(raw).trim
      if (line.nonEmpty) line match {
        case header(name) =>
          current = Some(name)
          if (!tables.contains(name)) tables(name) = Map.empty
        case keyVal(k, v) =>
          val value = parseValue(v.trim)
          current match {
            case Some(t) => tables(t) = tables(t) + (k -> value)
            case None => top = top + (k -> value)
          }
        case other => throw new IllegalArgumentException(
          s"unsupported TOML line: '$other'")
      }
    }
    (top, tables.toSeq)
  }

  /** Strip a `#` comment that is not inside a double-quoted string. */
  private def stripComment(line: String): String = {
    var inStr = false
    val sb = new StringBuilder
    var i = 0
    var done = false
    while (i < line.length && !done) {
      val c = line.charAt(i)
      if (c == '"' && (i == 0 || line.charAt(i - 1) != '\\')) inStr = !inStr
      if (c == '#' && !inStr) done = true else sb.append(c)
      i += 1
    }
    sb.toString
  }

  private def parseValue(v: String): Any = v match {
    case s if s.startsWith("\"") && s.endsWith("\"") && s.length >= 2 =>
      unquote(s)
    case s if s.startsWith("[") && s.endsWith("]") =>
      splitTopLevel(s.substring(1, s.length - 1)).map(x => parseValue(x.trim))
    case s if s.startsWith("{") && s.endsWith("}") =>
      // inline table of string → string (the value_map shape)
      splitTopLevel(s.substring(1, s.length - 1)).map { entry =>
        entry.split("=", 2) match {
          case Array(k, vv) =>
            (parseValue(k.trim).toString, parseValue(vv.trim).toString)
          case _ => throw new IllegalArgumentException(
            s"bad inline-table entry: '$entry'")
        }
      }
    case "true" => true
    case "false" => false
    case s => s.toDouble // ints parse as doubles; callers .toInt as needed
  }

  private def unquote(s: String): String = {
    val body = s.substring(1, s.length - 1)
    val sb = new StringBuilder
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\\' && i + 1 < body.length) {
        body.charAt(i + 1) match {
          case 'n' => sb.append('\n'); case 't' => sb.append('\t')
          case '"' => sb.append('"'); case '\\' => sb.append('\\')
          case other => sb.append('\\').append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Split on commas not nested in quotes/brackets/braces. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    var inStr = false
    for (c <- s) {
      if (c == '"') inStr = !inStr
      if (!inStr && (c == '[' || c == '{')) depth += 1
      if (!inStr && (c == ']' || c == '}')) depth -= 1
      if (c == ',' && depth == 0 && !inStr) { out += sb.toString; sb.clear() }
      else sb.append(c)
    }
    if (sb.toString.trim.nonEmpty) out += sb.toString
    out.toSeq.filter(_.trim.nonEmpty)
  }

  /** Serialise back to TOML (round-trips with `loads`; reference
    * `dump_reconciliation_config`, `api/reconciliation.py:92-118`). */
  def dump(s: ReconSettings): String = {
    def q(x: String) = "\"" + x.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def lst(xs: Seq[String]) = xs.map(q).mkString("[", ", ", "]")
    val head = Seq(
      s"legacy_file = ${q(s.legacyFile)}",
      s"legacy_format = ${q(s.legacyFormat)}",
      s"legacy_keys = ${lst(s.legacyKeys)}",
      s"our_keys = ${lst(s.ourKeys)}",
      s"top_n = ${s.topN}")
    val comps = s.components.flatMap { case (name, cm) =>
      Seq("", s"[components.$name]",
        s"legacy_column = ${q(cm.legacyColumn)}") ++
        (if (cm.scale != 1.0) Seq(s"scale = ${cm.scale}") else Nil) ++
        (if (cm.valueMap.nonEmpty) Seq("value_map = " + cm.valueMap
          .map { case (k, v) => s"${q(k)} = ${q(v)}" }
          .mkString("{ ", ", ", " }")) else Nil) ++
        cm.tolKind.map(k => s"tol_kind = ${q(k)}").toSeq ++
        cm.tol.map(t => s"tol = $t").toSeq
    }
    (head ++ comps).mkString("", "\n", "\n")
  }
}
