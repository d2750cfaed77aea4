package graft

import java.io.File

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** The shipped `bench_priors.json` resource must never be LOOSER than
  * the official `BENCH_r*.json` artifacts it is generated from — the
  * r18 failure was exactly a stale (loose) prior map letting contended
  * rows clear their fork thresholds unadjudicated. This spec recomputes
  * the per-query running min from the artifacts independently of
  * `tools/gen_bench_priors.py` (same semantics, second implementation —
  * a generator bug and a spec bug would have to agree to slip through)
  * and fails on any entry above it. Resets beyond the documented
  * semantics-change list are rejected too: an undocumented reset is the
  * other way to loosen a threshold.
  */
class BenchPriorsSpec extends AnyFunSuite {
  private val repo = sys.env.getOrElse("GRAFT_REPO", "/root/repo")
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper

  private def qnum(name: String): String =
    "^q0*([0-9]+)".r.findFirstMatchIn(name).map(_.group(1)).getOrElse(name)

  /** The official total line of one artifact (parsed field, else the
    * last total line of the recorded stdout tail), or None. */
  private def totalLine(f: File): Option[com.fasterxml.jackson.databind.JsonNode] = {
    val root = mapper.readTree(f)
    val parsed = root.get("parsed")
    if (parsed != null && parsed.isObject && parsed.has("queries")) Some(parsed)
    else {
      val tail = Option(root.get("tail")).map(_.asText("")).getOrElse("")
      val idx = tail.lastIndexOf("{\"metric\":\"total\"")
      if (idx < 0) None
      else scala.util.Try(
        mapper.readTree(tail.substring(idx).linesIterator.next()))
        .toOption.filter(n => n.isObject && n.has("queries"))
    }
  }

  test("shipped priors <= artifact running min; resets only from the documented list") {
    val files = Option(new File(repo).listFiles()).toSeq.flatten
      .filter(_.getName.matches("BENCH_r\\d+\\.json"))
      .sortBy(f => "\\d+".r.findFirstIn(f.getName).get.toInt)
    assume(files.nonEmpty, s"no BENCH artifacts under $repo")
    val shipped = BenchPriors.load()
    val resets = BenchPriors.loadResets()
    assert(resets.toSet.subsetOf(BenchPriors.documentedResets.toSet),
      s"undocumented semantics resets in bench_priors.json: " +
        s"${resets.toSet.diff(BenchPriors.documentedResets.toSet)}")
    // the era cutoff is itself a loosening lever — it must be exactly
    // the documented one, not quietly raised to drop inconvenient rounds
    val era = BenchPriors.loadEraStart()
    assert(era == BenchPriors.documentedEraStart,
      s"era_start $era != documented ${BenchPriors.documentedEraStart}")
    val min = scala.collection.mutable.Map.empty[String, Int]
    var parseable = 0
    for (f <- files) {
      val rnd = "\\d+".r.findFirstIn(f.getName).get.toInt
      val root = mapper.readTree(f)
      if (rnd >= era && root.path("sf").asDouble() == 0.1) totalLine(f).foreach { p =>
        parseable += 1
        val failed = Option(p.get("failures")).toSeq
          .flatMap(_.fieldNames().asScala).map(qnum).toSet
        val cs = p.path("q_unit").asText("") == "centisec"
        p.get("queries").fields().asScala.foreach { e =>
          val q = qnum(e.getKey)
          val v = if (cs) e.getValue.asInt
                  else math.round(e.getValue.asDouble * 100).toInt
          if (!failed.contains(q) && rnd >= resets.getOrElse(q, 0)) {
            if (resets.get(q).contains(rnd)) min(q) = v // reset: fresh start
            else min(q) = math.min(min.getOrElse(q, v), v)
          }
        }
      }
    }
    assert(parseable >= 8, s"only $parseable parseable artifacts — parsing regressed?")
    val loose = min.toSeq.collect {
      case (q, m) if shipped.getOrElse(q, Int.MaxValue) > m =>
        s"q$q shipped ${shipped.get(q)} > artifact min $m"
    }
    assert(loose.isEmpty,
      s"bench_priors.json is looser than the artifacts (run " +
        s"tools/gen_bench_priors.py): ${loose.sorted.mkString("; ")}")
    // and it must actually cover the artifact estate — an empty or
    // truncated resource would trivially pass the looseness check
    val uncovered = min.keySet.diff(shipped.keySet)
    assert(uncovered.isEmpty, s"priors missing for: $uncovered")
  }
}
