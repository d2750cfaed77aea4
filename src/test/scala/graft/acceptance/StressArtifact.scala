package graft.acceptance

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

/** `STRESS_r{N}.json` writer — the scale tiers' telemetry as one JSON
  * artifact beside BENCH/CORRECTNESS so the 100 TB posture is
  * adjudicable from the record alone (r17 verdict item 4), instead of
  * living in ScalaTest `info()` lines a judge must re-run to see.
  *
  * Each tier records as ONE line under `"tiers"`; re-running a tier
  * replaces its line, other tiers survive (read-modify-write keyed on
  * the writer's own line format). Round number: `GRAFT_ROUND` env
  * override, else the round in `VERDICT.md`'s header + 1 — the verdict
  * on disk is always the PREVIOUS round's (the judge writes it at round
  * end, after the stress tiers ran).
  */
object StressArtifact {
  private val TierLine = """^    "([A-Za-z0-9_]+)": (\{.*\}),?$""".r

  def roundNumber(repo: String = "/root/repo"): Int =
    sys.env.get("GRAFT_ROUND").flatMap(_.toIntOption).getOrElse {
      val verdict = new File(s"$repo/VERDICT.md")
      val prev =
        if (!verdict.exists()) 0
        else {
          val src = scala.io.Source.fromFile(verdict, "UTF-8")
          try {
            src.getLines().take(5)
              .flatMap("""round (\d+)""".r.findFirstMatchIn(_))
              .map(_.group(1).toInt).nextOption().getOrElse(0)
          } finally src.close()
        }
      prev + 1
    }

  /** Record `tierJson` (a complete single-line JSON object) under key
    * `tier`; returns the artifact path. Safe against concurrent tiers in
    * one JVM; cross-process races lose a line at worst (tiers run
    * serialized by the round workflow). */
  def record(tier: String, tierJson: String, repo: String = "/root/repo"): String =
    synchronized {
      require(!tierJson.contains('\n'), "tier JSON must be one line")
      val path = s"$repo/STRESS_r${roundNumber(repo)}.json"
      val f = new File(path)
      val existing: Seq[(String, String)] =
        if (!f.exists()) Seq.empty
        else {
          val src = scala.io.Source.fromFile(f, "UTF-8")
          try src.getLines().collect { case TierLine(k, v) => k -> v }.toSeq
          finally src.close()
        }
      val tiers = existing.filterNot(_._1 == tier) :+ (tier -> tierJson)
      val body = tiers.map { case (k, v) => s"""    "$k": $v""" }
        .mkString(",\n")
      val stamp = java.time.ZonedDateTime.now(java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ISO_INSTANT)
      val content =
        s"""{
           |  "round": ${roundNumber(repo)},
           |  "written_utc": "$stamp",
           |  "tiers": {
           |$body
           |  }
           |}
           |""".stripMargin
      val tmp = Paths.get(path + ".tmp")
      Files.writeString(tmp, content)
      Files.move(tmp, Paths.get(path), StandardCopyOption.REPLACE_EXISTING)
      path
    }

  def loadavg(): String =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.trim.split(" ").take(3).mkString(" ")
      finally src.close()
    } catch { case _: Exception => "" }
}
