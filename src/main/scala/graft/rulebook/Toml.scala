package graft.rulebook

/** Minimal TOML reader for rule/decision-table documents — the grammar the
  * reference's conformance and reconciliation configs actually use
  * (reference `tests/conformance/table.py` reads via stdlib `tomllib`;
  * zero-egress build: no TOML library is resolvable):
  *
  *   - `[a.b]` tables and `[[a.b]]` array-of-tables headers
  *   - key = string | number | boolean | array | inline table
  *   - `#` comments, blank lines
  *   - triple-quoted multi-line strings (`"""…"""`)
  *
  * Parsed into an untyped tree: tables are `Map[String, Any]`, arrays of
  * tables are `Vector[Map[String, Any]]`, scalars are
  * String/Double/Boolean, arrays are `Vector[Any]`.
  */
object Toml {

  type Table = Map[String, Any]

  def parse(text: String): Table = {
    val root = new Node
    var current = root
    val header = """^\[([A-Za-z0-9_.\-]+)\]$""".r
    val arrayHeader = """^\[\[([A-Za-z0-9_.\-]+)\]\]$""".r
    val keyVal = """^([A-Za-z0-9_\-]+)\s*=\s*(.+)$""".r
    val lines = text.linesIterator.toVector
    var i = 0
    while (i < lines.length) {
      val line = stripComment(lines(i)).trim
      line match {
        case "" => ()
        case arrayHeader(path) =>
          current = root.appendArrayElement(path.split('.').toList)
        case header(path) =>
          current = root.openTable(path.split('.').toList)
        case keyVal(k, v0) =>
          var v = v0.trim
          if (v.startsWith("\"\"\"")) {
            // multi-line string: consume until closing delimiter
            val sb = new StringBuilder(v.stripPrefix("\"\"\""))
            while (!sb.toString.contains("\"\"\"") && i + 1 < lines.length) {
              i += 1; sb.append('\n').append(lines(i))
            }
            val body = sb.toString
            val end = body.indexOf("\"\"\"")
            require(end >= 0, s"unterminated multi-line string at key '$k'")
            current.put(k, body.substring(0, end).stripPrefix("\n"))
          } else current.put(k, parseValue(v))
        case other =>
          throw new IllegalArgumentException(s"unsupported TOML line: '$other'")
      }
      i += 1
    }
    root.freeze
  }

  // mutable build tree -> frozen immutable maps
  private final class Node {
    val scalars = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    val tables = scala.collection.mutable.LinkedHashMap.empty[String, Node]
    val arrays = scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.ArrayBuffer[Node]]

    def put(k: String, v: Any): Unit = scalars(k) = v

    def openTable(path: List[String]): Node = path match {
      case Nil => this
      case last :: Nil =>
        tables.getOrElseUpdate(last, new Node)
      case head :: rest => descend(head).openTable(rest)
    }

    def appendArrayElement(path: List[String]): Node = path match {
      case Nil => this
      case last :: Nil =>
        val buf = arrays.getOrElseUpdate(last, scala.collection.mutable.ArrayBuffer.empty)
        val n = new Node; buf += n; n
      case head :: rest => descend(head).appendArrayElement(rest)
    }

    /** Walk into a child table; a `[a.b]` under `[[a]]` targets the LAST
      * array element (standard TOML). */
    private def descend(name: String): Node =
      arrays.get(name).map(_.last)
        .getOrElse(tables.getOrElseUpdate(name, new Node))

    /** Order-preserving freeze (authoring order is meaningful — e.g.
      * component order drives downstream column order). */
    def freeze: Table = {
      val entries =
        scalars.toSeq ++
          tables.toSeq.map { case (k, n) => k -> (n.freeze: Any) } ++
          arrays.toSeq.map { case (k, buf) => k -> (buf.toVector.map(_.freeze): Any) }
      scala.collection.immutable.ListMap(entries: _*)
    }
  }

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

  private[rulebook] def parseValue(v: String): Any = v match {
    case s if s.startsWith("\"") && s.endsWith("\"") && s.length >= 2 => unquote(s)
    case s if s.startsWith("[") && s.endsWith("]") =>
      splitTopLevel(s.substring(1, s.length - 1)).map(x => parseValue(x.trim)).toVector
    case s if s.startsWith("{") && s.endsWith("}") =>
      scala.collection.immutable.ListMap(
        splitTopLevel(s.substring(1, s.length - 1)).map { entry =>
          entry.split("=", 2) match {
            case Array(k, vv) => parseValue(k.trim).toString -> parseValue(vv.trim)
            case _ => throw new IllegalArgumentException(s"bad inline-table entry: '$entry'")
          }
        }: _*): Table
    case "true" => true
    case "false" => false
    case s => s.toDouble
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

  private def splitTopLevel(s: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      // an escaped quote inside a string does not toggle (same rule as
      // stripComment) — strings containing \" split correctly
      if (c == '"' && (i == 0 || s.charAt(i - 1) != '\\')) inStr = !inStr
      if (!inStr && (c == '[' || c == '{')) depth += 1
      if (!inStr && (c == ']' || c == '}')) depth -= 1
      if (c == ',' && depth == 0 && !inStr) { out += sb.toString; sb.clear() }
      else sb.append(c)
      i += 1
    }
    if (sb.toString.trim.nonEmpty) out += sb.toString
    out.toVector.filter(_.trim.nonEmpty)
  }
}
