package graft.api

import java.nio.file.{Files, Path, Paths}

import graft.rulebook.Toml

/** Reconciliation run settings loaded from a TOML config file (reference
  * `api/reconciliation.py:41-56` `ReconciliationSettings`,
  * `load_reconciliation_config` `:63-76`, `_settings_from_raw` `:179-205`).
  *
  * `legacyFile` given relative in the config resolves against the config
  * file's directory so a config + data bundle stays portable (reference
  * `:66-67`). Parsing delegates to [[graft.rulebook.Toml]] — the same
  * reader the conformance decision tables use.
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
    legacyKeys: Seq[String] = Seq("exposure_reference"),
    ourKeys: Seq[String] = Seq("exposure_reference"),
    components: Seq[(String, ComponentMapping)] = Nil,
    topN: Int = 50)

object ReconConfig {

  def load(path: String): ReconSettings = {
    val p = Paths.get(path)
    val text = new String(Files.readAllBytes(p), "UTF-8")
    loads(text, Option(p.getParent).getOrElse(Paths.get(".")))
  }

  def loads(text: String, baseDir: Path = Paths.get(".")): ReconSettings = {
    val doc = Toml.parse(text)
    val legacyRaw = doc.get("legacy_file") match {
      case Some(s: String) if s.nonEmpty => s
      case _ => throw new IllegalArgumentException(
        "reconciliation config must set 'legacy_file'")
    }
    val legacy =
      if (Paths.get(legacyRaw).isAbsolute) legacyRaw
      else baseDir.resolve(legacyRaw).normalize.toString
    val fmt = doc.get("legacy_format").map(_.toString).getOrElse("csv")
    if (fmt != "csv" && fmt != "parquet") throw new IllegalArgumentException(
      s"legacy_format must be 'parquet' or 'csv', got '$fmt'")
    val comps = doc.get("components") match {
      case Some(m: Map[_, _]) =>
        m.asInstanceOf[Map[String, Any]].toSeq.map {
          case (cname, spec: Map[_, _]) =>
            cname -> component(cname, spec.asInstanceOf[Map[String, Any]])
          case (cname, other) => throw new IllegalArgumentException(
            s"component '$cname' must be a table, got $other")
        }
      case _ => Nil
    }
    val ourKeys = doc.get("our_keys").map(v => strList(Some(v)))
      .filter(_.nonEmpty).getOrElse(Seq("exposure_reference"))
    // omitted legacy_keys default to our_keys (the reference treats the
    // names as normalised-equal); a mismatched explicit list is a config
    // error surfaced here, not an unresolved-column failure at reconcile
    val legacyKeys = strList(doc.get("legacy_keys")) match {
      case Nil => ourKeys
      case xs if xs.length == ourKeys.length => xs
      case xs => throw new IllegalArgumentException(
        s"legacy_keys (${xs.length}) and our_keys (${ourKeys.length}) " +
          "must have the same length")
    }
    ReconSettings(
      legacyFile = legacy,
      legacyFormat = fmt,
      legacyKeys = legacyKeys,
      ourKeys = ourKeys,
      components = comps,
      topN = doc.get("top_n").map(_.toString.toDouble.toInt).getOrElse(50))
  }

  private def component(cname: String, kv: Map[String, Any]): ComponentMapping = {
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
    ComponentMapping(
      legacyColumn = legacyCol,
      scale = kv.get("scale").map(_.toString.toDouble).getOrElse(1.0),
      valueMap = kv.get("value_map") match {
        case Some(m: Map[_, _]) =>
          m.toSeq.collect { case (k: String, v: String) => (k, v) }
        case _ => Nil
      },
      tolKind = tolKind,
      tol = kv.get("tol").map(_.toString.toDouble))
  }

  private def strList(v: Option[Any]): Seq[String] = v match {
    case Some(xs: Vector[_]) => xs.collect { case s: String => s }
    case _ => Nil
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
