package graft.refbook

import graft.rulebook.ValidationCatalogue
import graft.rulebook.ValidationCatalogue.CatRecord

/** The supervisory validation evaluator over a produced template estate —
  * the reference's `reporting/validations/` (rules.py / scope.py /
  * evaluate.py / checker.py) re-expressed over [[RefFrame]] estates.
  *
  * Runs every currently-enforced published rule (the EBA v3.0(3.0.1) and
  * BoE banking v4.0.0 credit-risk extracts, translated in
  * [[graft.rulebook.ValidationCatalogueData]]) against the frames one
  * scenario run generates, with the publisher's own semantics intact:
  *
  *  - a structurally ABSENT cell (row/column/sheet the estate never
  *    emitted) is a skip, never a zero;
  *  - a present-but-null cell follows the rule's missing-value policy
  *    (treat-as-zero vs do-not-run);
  *  - an all-null/zero comparison is VACUOUS, not a PASS;
  *  - `Interval` compares with the golden tolerance (rtol 1e-9 +
  *    atol 1e-6), `Point` exactly;
  *  - every unsupported construct is refused BY NAME as NOT_EVALUATED.
  *
  * This is all driver-side arithmetic over collected presentation-grain
  * frames (a few hundred cells each) — the right division of labour: the
  * heavy lifting happened in the ONE distributed cube pass, the rule
  * estate reads its output tens of thousands of times.
  */
object RefValidations {

  val StatusPass = "PASS"
  val StatusFail = "FAIL"
  val StatusVacuous = "VACUOUS"
  val StatusNotEvaluated = "NOT_EVALUATED"

  private val DefaultRtol = 1e-9
  private val DefaultAtol = 1e-6

  // =======================================================================
  // Sheet (z-axis) index maps — reference `scope.py` SHEET_INDEX_MAPS.
  // code -> our sheet keys; EMPTY = understood but no analogue (a skip,
  // never a zero); ABSENT = meaning not established (sheet_index_map_unknown).
  // =======================================================================

  private val c07Sheets: Map[String, Seq[String]] = Map(
    "0001" -> Nil, // Total
    "0002" -> Seq("central_govt_central_bank"),
    "0003" -> Seq("rgla"),
    "0004" -> Seq("pse"),
    "0005" -> Seq("mdb"),
    "0006" -> Seq("international_organisation"),
    "0007" -> Seq("institution"),
    "0008" -> Seq("corporate", "corporate_sme"),
    "0009" -> Seq("retail_other", "retail_qrre"),
    "0010" -> Seq("retail_mortgage", "residential_mortgage", "commercial_mortgage"),
    "0011" -> Seq("defaulted"),
    "0012" -> Nil, // particularly high risk
    "0013" -> Seq("covered_bond"),
    "0014" -> Nil, // short-term credit assessment
    "0015" -> Nil, // CIU
    "0016" -> Seq("equity"),
    "0017" -> Seq("other"))

  /** PS1/26 withdraws Art. 112(1)(n); no BoE scope ever lists z:0014. */
  private val of07Sheets: Map[String, Seq[String]] = c07Sheets - "0014"

  private val c08Sheets: Map[String, Seq[String]] = Map(
    "0001" -> Nil, "0002" -> Nil, // Totals (F-IRB / A-IRB)
    "0003" -> Seq("central_govt_central_bank"),
    "0004" -> Seq("central_govt_central_bank"),
    "0005" -> Seq("institution"), "0006" -> Seq("institution"),
    "0007" -> Seq("corporate_sme"), "0008" -> Seq("corporate_sme"),
    "0009" -> Seq("specialised_lending"), "0010" -> Seq("specialised_lending"),
    "0011" -> Seq("corporate"), "0012" -> Seq("corporate"),
    "0013" -> Seq("retail_mortgage"), "0014" -> Seq("retail_mortgage"),
    "0015" -> Seq("retail_qrre"),
    "0016" -> Seq("retail_other"), "0017" -> Seq("retail_other"))

  /** The PS1/26 OF 08 axis: only these 17 codes appear in the extract;
    * 0003-0005/0007/0008/0013/0014 are deliberately absent (unknown). */
  private val of08Sheets: Map[String, Seq[String]] = Map(
    "0001" -> Nil, "0002" -> Nil,
    "0006" -> Seq("institution"),
    "0009" -> Seq("specialised_lending"), "0010" -> Seq("specialised_lending"),
    "0011" -> Seq("corporate"), "0012" -> Seq("corporate"),
    "0015" -> Seq("retail_qrre"),
    "0016" -> Seq("retail_other"), "0017" -> Seq("retail_other"),
    "0018" -> Seq("retail_mortgage"), "0019" -> Seq("retail_mortgage"),
    "0020" -> Seq("retail_mortgage"), "0021" -> Seq("retail_mortgage"),
    "0022" -> Seq("corporate"),
    "0023" -> Seq("corporate_sme"), "0024" -> Seq("corporate_sme"))

  private val sheetMaps: Map[String, Map[String, Seq[String]]] = Map(
    "c07" -> c07Sheets, "of07" -> of07Sheets,
    "c08" -> c08Sheets, "of08" -> of08Sheets)

  // =======================================================================
  // Table bindings — publisher table code -> estate attribute
  // =======================================================================

  final case class Binding(attribute: String, perSheet: Boolean,
      sheetMap: Option[String] = None, columns: Option[Set[String]] = None) {
    def ownsColumn(c: String): Boolean = columns.forall(_.contains(c))
  }

  private val crrTables: Map[String, Binding] = Map(
    "C 02.00" -> Binding("c_02_00", perSheet = false),
    "C 07.00.a" -> Binding("c07_00", perSheet = true, Some("c07")),
    "C 07.00.b" -> Binding("c07_00", perSheet = true, Some("c07")),
    "C 07.00.c" -> Binding("c07_00", perSheet = true, Some("c07")),
    "C 07.00.d" -> Binding("c07_00", perSheet = true, Some("c07")),
    "C 08.01.a" -> Binding("c08_01", perSheet = true, Some("c08")),
    "C 08.01.b" -> Binding("c08_01", perSheet = true, Some("c08")),
    "C 08.02" -> Binding("c08_02", perSheet = true, Some("c08")),
    "C 08.03" -> Binding("c08_03", perSheet = true, Some("c08")),
    "C 08.04" -> Binding("c08_04", perSheet = true, Some("c08")),
    "C 08.05" -> Binding("c08_05", perSheet = true, Some("c08")),
    "C 08.06" -> Binding("c08_06", perSheet = true),
    "C 08.07" -> Binding("c08_07", perSheet = false),
    "C 09.01.a" -> Binding("c09_01", perSheet = true),
    "C 09.01.b" -> Binding("c09_01", perSheet = true),
    "C 09.02" -> Binding("c09_02", perSheet = true),
    "C 34.01.a" -> Binding("c34_01", perSheet = false),
    "C 34.01.b" -> Binding("c34_01", perSheet = false),
    "C 34.02" -> Binding("c34_02", perSheet = true),
    "C 34.04" -> Binding("c34_04", perSheet = false),
    "C 34.08.a" -> Binding("c34_08", perSheet = false),
    "C 34.08.b" -> Binding("c34_08", perSheet = false))

  private val b31Tables: Map[String, Binding] = Map(
    "OF02.00.01.01" -> Binding("c_02_00", perSheet = false),
    "OF02.01.01.01" -> Binding("of_02_01", perSheet = false),
    "OF02.01.01.02" -> Binding("of_02_01", perSheet = false),
    "OF02.01.01.03" -> Binding("of_02_01", perSheet = false),
    "OF07.00.01.01" -> Binding("c07_00", perSheet = true, Some("of07")),
    "OF07.00.01.02" -> Binding("c07_00", perSheet = true, Some("of07")),
    "OF07.00.01.03" -> Binding("c07_00", perSheet = true, Some("of07")),
    "OF07.00.01.04" -> Binding("c07_00", perSheet = true, Some("of07")),
    "OF07.00.01.05" -> Binding("c07_00", perSheet = true, Some("of07")),
    "OF08.01.01.01" -> Binding("c08_01", perSheet = true, Some("of08")),
    "OF08.01.01.02" -> Binding("c08_01", perSheet = true, Some("of08")),
    "OF08.02.01.01" -> Binding("c08_02", perSheet = true, Some("of08")),
    "OF08.03.01.01" -> Binding("c08_03", perSheet = true, Some("of08")),
    "C08.04.01.01" -> Binding("c08_04", perSheet = true, Some("of08")),
    "OF08.05.00.01" -> Binding("c08_05", perSheet = true, Some("of08")),
    "OF08.05.01.01" -> Binding("c08_05", perSheet = true, Some("of08")),
    "OF08.06.01.01" -> Binding("c08_06", perSheet = true),
    "OF08.07.01.01" -> Binding("c08_07", perSheet = false),
    "OF09.01.01.01" -> Binding("c09_01", perSheet = true),
    "OF09.02.01.01" -> Binding("c09_02", perSheet = true),
    "C34.01.01.01" -> Binding("c34_01", perSheet = false),
    "C34.02.01.01" -> Binding("c34_02", perSheet = true),
    "C34.04.01.01" -> Binding("c34_04", perSheet = false),
    "C34.08.01.01" -> Binding("c34_08", perSheet = false),
    "C34.08.01.02" -> Binding("c34_08", perSheet = false))

  private def baseBindings(framework: String): Map[String, Binding] =
    if (framework == "BASEL_3_1") b31Tables else crrTables

  // =======================================================================
  // Variant column scoping — derived FROM THE RULE EXTRACT
  // (`scope.py::derive_variant_columns`): a table code owns the columns
  // enforced rules attribute to it; a sibling group is scoped only when
  // the derived sets are non-empty and pairwise disjoint.
  // =======================================================================

  private val QualifiedRef =
    """\{\s*(?:t:\s*)?([A-Za-z][A-Za-z0-9. ]*?)\s*,([^{}]*)\}""".r
  private val ColumnId = """\bc[:\s]*(\d{3,5})\b""".r

  private def enforcedRecords(framework: String): Seq[CatRecord] = {
    val cat = if (framework == "BASEL_3_1") "b31" else "crr"
    ValidationCatalogue.liveRecords.filter(_.catalogue == cat)
  }

  private def attributedColumns(framework: String): Map[String, Set[String]] = {
    val collected = scala.collection.mutable.Map[String, Set[String]]()
    enforcedRecords(framework).foreach { rec =>
      val expr = rec.formula
      QualifiedRef.findAllMatchIn(expr).foreach { m =>
        val (table, body) = (m.group(1).trim, m.group(2))
        if (rec.tables.contains(table))
          collected(table) = collected.getOrElse(table, Set.empty) ++
            ColumnId.findAllMatchIn(body).map(_.group(1))
      }
      if (rec.tables.length == 1) {
        val table = rec.tables.head
        val unqualified = QualifiedRef.replaceAllIn(expr, " ")
        collected(table) = collected.getOrElse(table, Set.empty) ++
          ColumnId.findAllMatchIn(unqualified).map(_.group(1))
        val sc = scopeFor(rec, table)
        if (sc._3 == "list")
          collected(table) = collected.getOrElse(table, Set.empty) ++ sc._4
      }
    }
    collected.toMap
  }

  private def bindingsFor(framework: String): Map[String, Binding] = {
    val base = baseBindings(framework)
    val attributed = attributedColumns(framework)
    val byAttr = base.toSeq.groupBy(_._2.attribute)
    val scoped = scala.collection.mutable.Map[String, Set[String]]()
    byAttr.values.foreach { tables =>
      if (tables.length >= 2) {
        val sets = tables.map { case (t, _) => t -> attributed.getOrElse(t, Set.empty[String]) }
        val nonEmpty = sets.forall(_._2.nonEmpty)
        val disjoint = sets.combinations(2).forall {
          case Seq((_, a), (_, b)) => (a & b).isEmpty
          case _ => true
        }
        if (nonEmpty && disjoint) sets.foreach { case (t, s) => scoped(t) = s }
      }
    }
    base.map { case (t, b) =>
      t -> scoped.get(t).fold(b)(s => b.copy(columns = Some(s)))
    }
  }

  // =======================================================================
  // The template index
  // =======================================================================

  val SingleSheet = "__single__"

  /** One resolved cell: present with a value, present-but-null, or absent
    * (absent is emphatically NOT 0.0). */
  final case class CellValue(present: Boolean, value: Option[Double])
  private val AbsentCell = CellValue(present = false, None)

  final class TemplateIndex(
      val framework: String,
      val frames: Map[String, Map[String, RefFrame]],
      val bindings: Map[String, Binding]) {
    def binding(table: String): Option[Binding] = bindings.get(table)
    def isEmitted(table: String): Boolean =
      binding(table).exists(b => frames.get(b.attribute).exists(_.nonEmpty))
    def sheetKeys(table: String): Seq[String] =
      binding(table).toSeq.flatMap(b =>
        frames.getOrElse(b.attribute, Map.empty).keys.toSeq.sorted)
    def frame(table: String, sheet: String): Option[RefFrame] =
      binding(table).flatMap(b => frames.getOrElse(b.attribute, Map.empty).get(sheet))
    def rowRefs(table: String, sheet: String): Seq[String] =
      frame(table, sheet).toSeq.flatMap(_.rows.map(_._1))
    def columnRefs(table: String, sheet: String): Seq[String] = {
      val b = binding(table)
      frame(table, sheet).toSeq.flatMap(_.cols.filter(c => b.forall(_.ownsColumn(c))))
    }
    def cell(table: String, sheet: String, row: String, column: String): CellValue =
      binding(table) match {
        case Some(b) if b.ownsColumn(column) =>
          frame(table, sheet) match {
            case Some(f) if f.rows.exists(_._1 == row) && f.cols.contains(column) =>
              CellValue(present = true, f.value(row, column))
            case _ => AbsentCell
          }
        case _ => AbsentCell
      }
  }

  def buildIndex(framework: String,
      estate: Map[String, Map[String, RefFrame]]): TemplateIndex =
    new TemplateIndex(framework, estate.filter(_._2.nonEmpty), bindingsFor(framework))

  // =======================================================================
  // Expression AST + parser (reference `evaluate.py`)
  // =======================================================================

  private sealed trait Node
  private final case class RefNode(table: Option[String], rows: Seq[String],
      cols: Seq[String], sheets: Seq[String], geography: Option[String]) extends Node
  private final case class NumNode(value: Double) extends Node
  private case object EmptyNode extends Node
  private final case class CallNode(name: String, args: Seq[Node]) extends Node
  private final case class BinNode(op: Char, lhs: Node, rhs: Node) extends Node
  private final case class CmpNode(op: String, lhs: Node, rhs: Node) extends Node

  private final case class Parsed(root: CmpNode, needsRow: Boolean,
      needsCol: Boolean, needsSheet: Boolean)

  private class Unsupported(val reason: String, val detail: String = "")
    extends Exception(reason)
  private class SkipCoord(val reason: String, val detail: String = "")
    extends Exception(reason)

  private val unsupportedMarkers: Seq[(String, String)] = Seq(
    "if " -> "conditional (if/then) rule",
    "then" -> "conditional (if/then) rule",
    "where(" -> "where(...) row filter",
    "count(" -> "count(...) aggregate",
    "isnull" -> "isNull(...) predicate",
    "true()" -> "boolean literal",
    " and " -> "boolean conjunction",
    " or " -> "boolean disjunction",
    "empty(" -> "empty(...) function form",
    "not(" -> "negated dimensional filter")
  private val openRowWildcard = """\br[Nn]{2,}\b""".r
  private val aggregates = Set("sum", "max", "min")

  private val tokenRe =
    ("""(\{[^{}]*\})""" + "|" +
      """(\d*\.?\d+\s*%?)""" + "|" +
      """([A-Za-z_][A-Za-z_0-9]*)""" + "|" +
      """(==|>=|<=|!=|=|>|<)""" + "|" +
      """([+\-*/(),])""" + "|" +
      """(\s+)""").r

  private val ebaAxis = """^([rcs])(\d{3,5})$""".r
  private val ebaSheetRange = """^\(s(\d{3,4})\s*-\s*s?(\d{3,4})\)$""".r
  private val boeKey = """(?s)^([a-z]+)\s*:\s*(.*)$""".r
  private val boeFilter =
    """^\[eba_dim:([A-Za-z_]+)\]\s*=\s*\[([^]]+)\]$""".r
  private val ebaFilter = """^\[([A-Za-z_]+)\s*=\s*([^]]+)\]$""".r

  private def tokenise(text: String): Vector[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    var pos = 0
    while (pos < text.length) {
      tokenRe.findPrefixMatchOf(text.substring(pos)) match {
        case None => throw new Unsupported("unsupported_grammar",
          s"unparseable at offset $pos")
        case Some(m) =>
          pos += m.end
          val kind =
            if (m.group(1) != null) "ref"
            else if (m.group(2) != null) "number"
            else if (m.group(3) != null) "ident"
            else if (m.group(4) != null) "compare"
            else if (m.group(5) != null) "punct"
            else "space"
          if (kind != "space") out += ((kind, m.matched.trim))
      }
    }
    out.result()
  }

  private def parseFilter(text: String): String = {
    val t = text.trim
    val (dim, member) = t match {
      case boeFilter(d, m) => (d.trim, m.trim)
      case ebaFilter(d, m) => (d.trim, m.trim)
      case _ => throw new Unsupported("unsupported_grammar", s"dimensional filter $t")
    }
    // only the counterparty-geography all-geographies total is understood
    // (the C 09.0x "TOTAL" sheet) — see the reference's three-source
    // corroboration that eba_GA:x1 is the TOTAL member
    if (dim != "CEG" || member != "eba_GA:x1")
      throw new Unsupported("unsupported_grammar", s"dimensional filter [$dim] = [$member]")
    "TOTAL"
  }

  private def splitIds(value: String): Seq[String] =
    value.split(";").map(_.trim).filter(_.nonEmpty).toSeq

  private def parseRef(text: String): RefNode = {
    val body = text.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) throw new Unsupported("unsupported_grammar", "empty reference")
    var table: Option[String] = None
    val rows = Seq.newBuilder[String]; val cols = Seq.newBuilder[String]
    val sheets = Seq.newBuilder[String]; var geography: Option[String] = None
    body.split(",").map(_.trim).filter(_.nonEmpty).foreach { token =>
      token match {
        case boeKey(k, v) if Set("t", "r", "c", "z", "dv", "seq", "id", "f",
            "fv", "filter")(k) =>
          k match {
            case "t" => table = Some(v.trim)
            case "r" => rows ++= splitIds(v)
            case "c" => cols ++= splitIds(v)
            case "z" => sheets ++= splitIds(v)
            case "filter" => geography = Some(parseFilter(v))
            case _ => ()
          }
        case t if t.startsWith("[") => geography = Some(parseFilter(t))
        case ebaAxis(axis, id) => axis match {
          case "r" => rows += id
          case "c" => cols += id
          case "s" => sheets += id
        }
        case ebaSheetRange(start, end) =>
          val width = math.max(start.length, end.length)
          sheets ++= (start.toInt to end.toInt)
            .map(i => i.toString.reverse.padTo(width, '0').reverse)
        case t if table.isEmpty => table = Some(t)
        case t => throw new Unsupported("unsupported_grammar",
          s"unrecognised reference part $t")
      }
    }
    RefNode(table, rows.result(), cols.result(), sheets.result(), geography)
  }

  private class Parser(tokens: Vector[(String, String)]) {
    private var pos = 0
    private def peek: (String, String) =
      if (pos < tokens.length) tokens(pos) else ("", "")
    private def advance(): (String, String) = {
      if (pos >= tokens.length)
        throw new Unsupported("unsupported_grammar", "expression ended early")
      val t = tokens(pos); pos += 1; t
    }
    private def expect(text: String): Unit = {
      val (k, a) = advance()
      if (k != "punct" || a != text)
        throw new Unsupported("unsupported_grammar", s"expected $text, got $a")
    }
    def comparison(): CmpNode = {
      val lhs = sum()
      val (k, op) = peek
      if (k != "compare")
        throw new Unsupported("unsupported_grammar", "no top-level comparison")
      advance()
      val rhs = sum()
      if (pos != tokens.length)
        throw new Unsupported("unsupported_grammar", "trailing tokens after comparison")
      CmpNode(op, lhs, rhs)
    }
    private def sum(): Node = {
      var node = product()
      while (peek == ("punct", "+") || peek == ("punct", "-")) {
        val op = advance()._2.head
        node = BinNode(op, node, product())
      }
      node
    }
    private def product(): Node = {
      var node = unary()
      while (peek == ("punct", "*") || peek == ("punct", "/")) {
        val op = advance()._2.head
        node = BinNode(op, node, unary())
      }
      node
    }
    private def unary(): Node = peek match {
      case ("punct", "+") => advance(); unary()
      case ("punct", "-") => advance(); BinNode('-', NumNode(0.0), unary())
      case _ => atom()
    }
    private def atom(): Node = advance() match {
      case ("ref", t) => parseRef(t)
      case ("number", t) =>
        val body = t.replace(" ", "")
        if (body.endsWith("%")) NumNode(body.dropRight(1).toDouble / 100.0)
        else NumNode(body.toDouble)
      case ("ident", name) => ident(name)
      case ("punct", "(") => val n = sum(); expect(")"); n
      case (_, t) =>
        throw new Unsupported("unsupported_grammar", s"unexpected token $t")
    }
    private def ident(name: String): Node = {
      val lowered = name.toLowerCase
      if (lowered == "empty") return EmptyNode
      if (peek != ("punct", "("))
        throw new Unsupported("unsupported_grammar", s"bare identifier $name")
      advance()
      val args = Seq.newBuilder[Node]
      args += sum()
      while (peek == ("punct", ",")) { advance(); args += sum() }
      expect(")")
      if (!aggregates(lowered) && lowered != "abs")
        throw new Unsupported("unsupported_grammar", s"function $name(...)")
      CallNode(lowered, args.result())
    }
  }

  private def walkRefs(node: Node, aggregated: Boolean): Seq[RefNode] = node match {
    case r: RefNode => if (aggregated) Nil else Seq(r)
    case CallNode(name, args) =>
      val inner = aggregated || aggregates(name)
      args.flatMap(walkRefs(_, inner))
    case BinNode(_, l, r) => walkRefs(l, aggregated) ++ walkRefs(r, aggregated)
    case CmpNode(_, l, r) => walkRefs(l, aggregated) ++ walkRefs(r, aggregated)
    case _ => Nil
  }

  private def parseExpression(text: String): Parsed = {
    if (text == null || text.trim.isEmpty)
      throw new Unsupported("no_expression", "rule carries no formula")
    val lowered = text.toLowerCase
    unsupportedMarkers.foreach { case (marker, detail) =>
      if (lowered.contains(marker)) throw new Unsupported("unsupported_grammar", detail)
    }
    if (openRowWildcard.findFirstIn(text).isDefined)
      throw new Unsupported("unsupported_grammar", "open-row wildcard")
    val root = new Parser(tokenise(text)).comparison()
    val refs = walkRefs(root, aggregated = false)
    Parsed(root,
      needsRow = refs.exists(_.rows.isEmpty),
      needsCol = refs.exists(_.cols.isEmpty),
      needsSheet = refs.exists(r => r.sheets.isEmpty && r.geography.isEmpty))
  }

  // =======================================================================
  // Evaluation at one coordinate
  // =======================================================================

  final case class Coordinate(table: String, sheet: String,
      row: Option[String], column: Option[String],
      sheetRepresentative: Boolean = false) {
    def describe: String = {
      val s = if (sheet == SingleSheet || sheetRepresentative) "" else s"[$sheet]"
      val r = row.fold("")(v => s"[r$v]")
      val c = column.fold("")(v => s"[c$v]")
      s"$table$s$r$c"
    }
  }

  final case class CoordOutcome(coordinate: Coordinate, status: String,
      lhs: Option[Double] = None, rhs: Option[Double] = None,
      reason: String = "", detail: String = "")

  private class Ctx(val index: TemplateIndex, val coordinate: Coordinate,
      val missingZero: Boolean) {
    var vacuous = true
    def observe(v: Double): Unit = if (v != 0.0) vacuous = false
  }

  private def valueOf(node: Node, ctx: Ctx, aggregated: Boolean): Double = node match {
    case NumNode(v) => v
    case r: RefNode => resolveCells(r, ctx, aggregated).sum
    case BinNode(op, l, r) =>
      val lv = valueOf(l, ctx, aggregated); val rv = valueOf(r, ctx, aggregated)
      op match {
        case '+' => lv + rv
        case '-' => lv - rv
        case '*' => lv * rv
        case '/' =>
          if (rv == 0.0) throw new SkipCoord("non_finite_value", "division by zero")
          lv / rv
      }
    case CallNode("abs", args) => math.abs(valueOf(args.head, ctx, aggregated))
    case CallNode("sum", args) => args.map(valueOf(_, ctx, aggregated = true)).sum
    case CallNode(name, args) => // max / min over every individual cell
      val flat = args.flatMap {
        case r: RefNode => resolveCells(r, ctx, aggregated = true)
        case other => Seq(valueOf(other, ctx, aggregated = true))
      }
      if (flat.isEmpty)
        throw new SkipCoord("cell_not_emitted", s"$name(...) over no emitted cell")
      if (name == "max") flat.max else flat.min
    case _ => throw new Unsupported("unsupported_grammar", "cannot evaluate node")
  }

  private def resolveCells(ref: RefNode, ctx: Ctx, aggregated: Boolean): Seq[Double] = {
    val (table, sheets, rows, cols) = referenceAxes(ref, ctx, aggregated)
    for (sheet <- sheets; row <- rows; col <- cols) yield {
      val cell = ctx.index.cell(table, sheet, row, col)
      if (!cell.present) throw absence(ctx, table, sheet, row, col)
      cell.value match {
        case None =>
          if (!ctx.missingZero)
            throw new SkipCoord("missing_value_do_not_run",
              s"$table[$sheet][r$row][c$col] is not reported")
          0.0
        case Some(v) => ctx.observe(v); v
      }
    }
  }

  private def absence(ctx: Ctx, table: String, sheet: String, row: String,
      col: String): SkipCoord = {
    val where = s"$table[$sheet][r$row][c$col]"
    if (!ctx.index.rowRefs(table, sheet).contains(row))
      new SkipCoord("row_not_emitted", s"$where: row $row is not emitted")
    else if (!ctx.index.columnRefs(table, sheet).contains(col))
      new SkipCoord("column_not_emitted", s"$where: column $col is not emitted")
    else new SkipCoord("cell_not_emitted", s"$where not emitted")
  }

  private def referenceAxes(ref: RefNode, ctx: Ctx, aggregated: Boolean)
      : (String, Seq[String], Seq[String], Seq[String]) = {
    val coordinate = ctx.coordinate
    val table = ref.table.getOrElse(coordinate.table)
    val binding = ctx.index.binding(table)
    if (binding.isEmpty || !ctx.index.isEmitted(table))
      throw new SkipCoord("cell_not_emitted", s"$table not emitted")
    val sheets = referenceSheets(ref, table, ctx, binding.get.sheetMap, aggregated)
    val rows = referenceAxis(ref.rows, coordinate.row,
      s => ctx.index.rowRefs(table, s), sheets, aggregated, "row")
    val cols = referenceAxis(ref.cols, coordinate.column,
      s => ctx.index.columnRefs(table, s), sheets, aggregated, "column")
    (table, sheets, rows, cols)
  }

  private def referenceSheets(ref: RefNode, table: String, ctx: Ctx,
      sheetMapName: Option[String], aggregated: Boolean): Seq[String] = {
    val emitted = ctx.index.sheetKeys(table)
    if (emitted.isEmpty)
      throw new SkipCoord("cell_not_emitted", s"$table has no emitted sheet")
    if (emitted == Seq(SingleSheet)) return emitted
    ref.geography match {
      case Some(geo) =>
        if (!emitted.contains(geo))
          throw new SkipCoord("sheet_not_emitted", s"$table has no $geo geography sheet")
        return Seq(geo)
      case None => ()
    }
    if (ref.sheets.nonEmpty) {
      val sheetMap = sheetMapName.flatMap(sheetMaps.get)
      if (sheetMap.isEmpty)
        throw new SkipCoord("ambiguous_axis",
          s"$table sheets are not indexed positionally")
      resolveSheetCodes(ref.sheets, sheetMap.get, emitted) match {
        case Right(sheets) => return sheets
        case Left((reason, detail)) => throw new SkipCoord(reason, detail)
      }
    }
    if (emitted.contains(ctx.coordinate.sheet)) Seq(ctx.coordinate.sheet)
    else if (aggregated) emitted
    else throw new SkipCoord("ambiguous_axis",
      s"$table sheet not fixed by the rule's scope")
  }

  private def referenceAxis(explicit: Seq[String], current: Option[String],
      emittedFor: String => Seq[String], sheets: Seq[String],
      aggregated: Boolean, axis: String): Seq[String] = {
    if (explicit.nonEmpty) return explicit
    current match {
      case Some(c) => Seq(c)
      case None =>
        if (!aggregated)
          throw new SkipCoord("ambiguous_axis", s"$axis not fixed by the rule's scope")
        val values = emittedFor(sheets.head)
        if (values.isEmpty) throw new SkipCoord("cell_not_emitted", s"no $axis emitted")
        values
    }
  }

  /** Map publisher sheet codes onto emitted keys — the CLOSURE test is
    * load-bearing: a coarser sheet (one retail_mortgage frame against the
    * DPM's SME/non-SME pair) is safe only when every code mapping into the
    * selected sheets is itself requested. */
  private def resolveSheetCodes(codes: Seq[String],
      sheetMap: Map[String, Seq[String]], emitted: Seq[String])
      : Either[(String, String), Seq[String]] = {
    val unknown = codes.filterNot(sheetMap.contains)
    if (unknown.nonEmpty)
      return Left(("sheet_index_map_unknown", unknown.distinct.sorted.mkString(", ")))
    val selected = codes.flatMap(sheetMap(_)).distinct
    if (selected.isEmpty)
      return Left(("sheet_not_emitted", codes.mkString(", ")))
    val requested = codes.toSet
    val leaking = sheetMap.collect {
      case (code, keys) if !requested(code) && keys.exists(selected.contains) => code
    }.toSeq.sorted
    if (leaking.nonEmpty)
      return Left(("sheet_scope_not_closed",
        s"our sheet(s) ${selected.mkString(", ")} also carry sheet code(s) ${leaking.mkString(", ")}"))
    val present = selected.filter(emitted.contains)
    if (present.isEmpty) Left(("sheet_not_emitted", selected.mkString(", ")))
    else Right(present)
  }

  private def compare(op: String, lhs0: Double, rhs0: Double, pointExact: Boolean): Boolean = {
    val lhs = lhs0 + 0.0; val rhs = rhs0 + 0.0 // fold -0.0
    val tolerance =
      if (pointExact) 0.0
      else DefaultAtol + DefaultRtol * math.max(math.abs(lhs), math.abs(rhs))
    op match {
      case "=" | "==" => math.abs(lhs - rhs) <= tolerance
      case "!=" => math.abs(lhs - rhs) > tolerance
      case ">=" => lhs >= rhs - tolerance
      case "<=" => lhs <= rhs + tolerance
      case ">" => lhs > rhs - tolerance
      case "<" => lhs < rhs + tolerance
      case other =>
        throw new Unsupported("unsupported_grammar", s"comparison operator $other")
    }
  }

  private def evaluateAt(parsed: Parsed, coordinate: Coordinate,
      index: TemplateIndex, missingZero: Boolean, pointExact: Boolean): CoordOutcome = {
    val ctx = new Ctx(index, coordinate, missingZero)
    val root = parsed.root
    if (root.lhs == EmptyNode || root.rhs == EmptyNode)
      return evaluateEmptiness(root, ctx, coordinate)
    val (lhs, rhs) =
      try (valueOf(root.lhs, ctx, aggregated = false),
        valueOf(root.rhs, ctx, aggregated = false))
      catch {
        case s: SkipCoord =>
          return CoordOutcome(coordinate, StatusNotEvaluated,
            reason = s.reason, detail = s.detail)
      }
    if (!(java.lang.Double.isFinite(lhs) && java.lang.Double.isFinite(rhs)))
      return CoordOutcome(coordinate, StatusNotEvaluated, Some(lhs), Some(rhs),
        "non_finite_value", "NaN/inf operand")
    if (!compare(root.op, lhs, rhs, pointExact))
      CoordOutcome(coordinate, StatusFail, Some(lhs), Some(rhs))
    else if (ctx.vacuous) CoordOutcome(coordinate, StatusVacuous, Some(lhs), Some(rhs))
    else CoordOutcome(coordinate, StatusPass, Some(lhs), Some(rhs))
  }

  /** The `{ref} = empty` nonexistence form: asks whether the cell was
    * REPORTED, so the missing-value policy does not apply. */
  private def evaluateEmptiness(root: CmpNode, ctx: Ctx,
      coordinate: Coordinate): CoordOutcome = {
    val refOpt = (if (root.rhs == EmptyNode) root.lhs else root.rhs) match {
      case r: RefNode => Some(r)
      case _ => None
    }
    if (refOpt.isEmpty)
      return CoordOutcome(coordinate, StatusNotEvaluated,
        reason = "unsupported_grammar", detail = "empty compared to an expression")
    val (table, sheets, rows, cols) =
      try referenceAxes(refOpt.get, ctx, aggregated = true)
      catch {
        case s: SkipCoord =>
          return CoordOutcome(coordinate, StatusNotEvaluated,
            reason = s.reason, detail = s.detail)
      }
    val reported = for {
      sheet <- sheets; row <- rows; col <- cols
      cell = ctx.index.cell(table, sheet, row, col)
      if cell.present && cell.value.isDefined
    } yield cell.value.get
    val isEmpty = reported.isEmpty
    val passed = if (root.op == "=" || root.op == "==") isEmpty else !isEmpty
    if (!passed)
      CoordOutcome(coordinate, StatusFail, Some(reported.length.toDouble), Some(0.0),
        detail = s"${reported.length} cell(s) reported where the rule requires none")
    else CoordOutcome(coordinate, if (isEmpty) StatusVacuous else StatusPass)
  }

  // =======================================================================
  // Rule expansion (reference `scope.py::expand_rule`)
  // =======================================================================

  /** (rowsScope, rows, colsScope, cols, sheetsScope, sheets) for `table` —
    * the EBA's single rule-level scope binds its FIRST table; the BoE's
    * per-table scope(...) groups bind each their own. */
  private def scopeFor(rec: CatRecord, table: String)
      : (String, Seq[String], String, Seq[String], String, Seq[String]) = {
    if (rec.scopeGroups.nonEmpty)
      rec.scopeGroups.find(_._1 == table) match {
        case Some((_, rs, r, cs, c, ss, s)) => (rs, r, cs, c, ss, s)
        case None => ("none", Nil, "none", Nil, "none", Nil)
      }
    else if (rec.tables.headOption.contains(table))
      (rec.rowsScope, rec.rows, rec.colsScope, rec.cols,
        rec.sheetsScope, rec.sheets)
    else ("none", Nil, "none", Nil, "none", Nil)
  }

  private def axisValues(kind: String, ids: Seq[String], emitted: Seq[String],
      iterate: Boolean): Seq[Option[String]] = kind match {
    case "list" => ids.filter(emitted.contains).map(Some(_))
    case "all" => emitted.map(Some(_))
    case _ => if (iterate) emitted.map(Some(_)) else Seq(None)
  }

  private final case class Expansion(home: Option[String],
      coordinates: Seq[Coordinate], skipReason: Option[String] = None,
      detail: String = "")

  private def expandRule(rec: CatRecord, parsed: Parsed,
      index: TemplateIndex): Expansion = {
    val missingPrereq = rec.prereqs.find(t => !index.isEmitted(t))
    if (missingPrereq.isDefined)
      return Expansion(None, Nil, Some("prerequisite_table_absent"), missingPrereq.get)
    val home = rec.tables.find(index.isEmitted)
    if (home.isEmpty)
      return Expansion(None, Nil, Some("table_not_emitted"), rec.tables.mkString(", "))
    val table = home.get
    val binding = index.binding(table).get
    val (rowsScope, rowIds, colsScope, colIds, sheetsScope, sheetIds) =
      scopeFor(rec, table)

    val sheetsResolved: Either[(String, String), Seq[String]] =
      if (!binding.perSheet) Right(Seq(SingleSheet))
      else if (sheetsScope != "list") Right(index.sheetKeys(table))
      else sheetMaps.get(binding.sheetMap.getOrElse("")) match {
        case None => Left(("sheet_index_map_unknown",
          s"$table sheets are not indexed positionally by the publisher"))
        case Some(map) =>
          // RAW ids against the map, exactly as the reference's
          // `resolve_sheet_codes` reads them — an off-width id is
          // `sheet_index_map_unknown`, never silently normalised
          resolveSheetCodes(sheetIds, map, index.sheetKeys(table))
      }
    sheetsResolved match {
      case Left((reason, detail)) => Expansion(home, Nil, Some(reason), detail)
      case Right(allSheets) =>
        val representative = !parsed.needsSheet && allSheets.length > 1
        val sheets = if (representative) allSheets.take(1) else allSheets
        var droppedRows = rowsScope == "list"
        var droppedCols = colsScope == "list"
        val coordinates = sheets.flatMap { sheet =>
          val rows = axisValues(rowsScope, rowIds,
            index.rowRefs(table, sheet), parsed.needsRow)
          val cols = axisValues(colsScope, colIds,
            index.columnRefs(table, sheet), parsed.needsCol)
          droppedRows &&= rows.isEmpty
          droppedCols &&= cols.isEmpty
          for (r <- rows; c <- cols)
            yield Coordinate(table, sheet, r, c, representative)
        }
        if (coordinates.nonEmpty) Expansion(home, coordinates)
        else if (droppedRows)
          Expansion(home, Nil, Some("row_not_emitted"), rowIds.mkString(", "))
        else if (droppedCols)
          Expansion(home, Nil, Some("column_not_emitted"), colIds.mkString(", "))
        else Expansion(home, Nil, Some("no_coordinates"),
          "scope resolved to no emitted cell")
    }
  }

  // =======================================================================
  // Roll-up + report (reference `checker.py`)
  // =======================================================================

  final case class RuleOutcome(ruleId: String, severity: String,
      tables: Seq[String], expression: String, status: String,
      reason: String = "", detail: String = "", evaluated: Int = 0,
      passed: Int = 0, failed: Int = 0, vacuous: Int = 0, skipped: Int = 0,
      failures: Seq[CoordOutcome] = Nil) {
    def coordinates: Seq[String] = failures.map(_.coordinate.describe)
  }

  final case class ValidationReport(framework: String,
      rulesEnforced: Int, outcomes: Seq[RuleOutcome],
      templatesEmitted: Seq[String], templatesCovered: Seq[String]) {
    def rulesExecuted: Int = outcomes.count(_.status != StatusNotEvaluated)
    def templatesUncovered: Seq[String] =
      templatesEmitted.filterNot(templatesCovered.toSet)
    def byStatus(status: String): Seq[RuleOutcome] =
      outcomes.filter(_.status == status)
    def statusCounts: Map[String, Int] = Map(
      StatusPass -> byStatus(StatusPass).length,
      StatusFail -> byStatus(StatusFail).length,
      StatusVacuous -> byStatus(StatusVacuous).length,
      StatusNotEvaluated -> byStatus(StatusNotEvaluated).length)
  }

  val MaxRecordedFailures = 5

  private def notEvaluated(rec: CatRecord, reason: String,
      detail: String = ""): RuleOutcome =
    RuleOutcome(rec.id, rec.severity, rec.tables, rec.formula,
      StatusNotEvaluated, reason, detail)

  private def evaluateRule(rec: CatRecord, index: TemplateIndex): RuleOutcome = {
    if (rec.missing == "W")
      return notEvaluated(rec, "precondition_unsupported")
    val parsed =
      try parseExpression(rec.formula)
      catch {
        case u: Unsupported => return notEvaluated(rec, u.reason, u.detail)
      }
    val expansion = expandRule(rec, parsed, index)
    if (expansion.skipReason.isDefined)
      return notEvaluated(rec, expansion.skipReason.get, expansion.detail)
    val missingZero = rec.missing == "Z"
    val pointExact = rec.arithmetic == "P"
    val outcomes = expansion.coordinates.map(c =>
      evaluateAt(parsed, c, index, missingZero, pointExact))
    rollUp(rec, outcomes)
  }

  private def rollUp(rec: CatRecord, outcomes: Seq[CoordOutcome]): RuleOutcome = {
    val failures = outcomes.filter(_.status == StatusFail)
    val passes = outcomes.count(_.status == StatusPass)
    val vacuous = outcomes.count(_.status == StatusVacuous)
    val skipped = outcomes.filter(_.status == StatusNotEvaluated)
    val evaluated = failures.length + passes + vacuous
    val (status, reason, detail) =
      if (failures.nonEmpty) (StatusFail, "", failures.head.detail)
      else if (evaluated == 0) {
        val commonest = skipped.groupBy(_.reason).toSeq
          .sortBy { case (r, os) => (-os.length, r) }.headOption
        (StatusNotEvaluated, commonest.map(_._1).getOrElse("no_coordinates"),
          commonest.flatMap(_._2.headOption).map(_.detail).getOrElse(""))
      }
      else if (passes == 0) (StatusVacuous, "", "every operand was null or zero")
      else (StatusPass, "", "")
    RuleOutcome(rec.id, rec.severity, rec.tables, rec.formula, status, reason,
      detail, evaluated, passes, failures.length, vacuous, skipped.length,
      failures.take(MaxRecordedFailures))
  }

  /** Evaluate every currently-enforced rule for `framework` over the
    * estate and report — the reference's `evaluate_all`. Coverage counts a
    * template as covered when an EXECUTED rule names it (an executed
    * cross-table rule genuinely exercised both sides). */
  def evaluateAll(framework: String,
      estate: Map[String, Map[String, RefFrame]]): ValidationReport = {
    val index = buildIndex(framework, estate)
    val enforced = enforcedRecords(framework)
    val outcomes = enforced.map(evaluateRule(_, index))
    val emitted = index.frames.keys.toSeq.sorted
    val covered = (for {
      outcome <- outcomes if outcome.status != StatusNotEvaluated
      table <- outcome.tables
      binding <- index.binding(table) if index.frames.contains(binding.attribute)
    } yield binding.attribute).distinct.sorted
    ValidationReport(framework, enforced.length, outcomes, emitted, covered)
  }
}
