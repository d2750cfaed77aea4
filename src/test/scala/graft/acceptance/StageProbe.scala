package graft.acceptance

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared per-stage telemetry machinery for the corpus-scale stress
  * tiers (text corpus + similarity/ANN): wall clock, rows, task-metric
  * spill counters, AQE skew splits and exchange counts per stage, each
  * emitted as one JSON fragment for `STRESS_r{N}.json`. Extracted from
  * the round-18 `CorpusStress` so the similarity tier (r18 verdict item
  * 2) measures with the identical discipline and the artifacts stay
  * comparable across tiers.
  */
object StageProbe {
  final case class StageTel(name: String, wallS: Double, rows: Long,
      spillDisk: Long, spillMem: Long, skewSplits: Int, exchanges: Int,
      reusedExchanges: Int, note: String = "") {
    def json: String = {
      val n = if (note.isEmpty) "" else s""", "note": "$note""""
      f""""$name": {"wall_s": $wallS%.2f, "rows": $rows, "spill_disk": $spillDisk, "spill_mem": $spillMem, "aqe_skew_splits": $skewSplits, "exchanges": $exchanges, "reused_exchanges": $reusedExchanges$n}"""
    }
  }
}

final class StageProbe(spark: SparkSession, info: String => Unit,
    tag: String) {
  import StageProbe.StageTel

  private val diskSpilled = new AtomicLong
  private val memSpilled = new AtomicLong
  spark.sparkContext.addSparkListener(
    new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach { m =>
          diskSpilled.addAndGet(m.diskBytesSpilled)
          memSpilled.addAndGet(m.memoryBytesSpilled)
        }
    })

  // == Initial Plan == repeats every node after an AQE action — keep
  // only the final plan before counting (verify-recipe gotcha)
  private def finalPlan(p: String): String = p.split("== Initial Plan ==").head
  private def exchanges(p: String): (Int, Int) = {
    val reused = "ReusedExchange".r.findAllIn(p).size
    val all = "Exchange".r.findAllIn(p).size
    (all - reused, reused)
  }

  private val tels = scala.collection.mutable.ArrayBuffer.empty[StageTel]
  def telemetry: Seq[StageTel] = tels.toSeq

  /** Time `body` (which returns (rows, executedPlan string)) as one
    * stage; records spill deltas / skew splits / exchange counts. */
  def stage(name: String, note: String = "")(body: => (Long, String)): Long =
    stageDynamic(name) { val (rows, p) = body; (rows, p, note) }

  /** [[stage]] whose body also computes the note — for stages whose
    * record-worthy facts (file counts, byte volumes) only exist after
    * the work ran. */
  def stageDynamic(name: String)(body: => (Long, String, String)): Long = {
    val d0 = diskSpilled.get; val m0 = memSpilled.get
    val t0 = System.nanoTime()
    val (rows, planStr, note) = body
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(200) // listener delivery is async
    val p = finalPlan(planStr)
    val skew = "skew=true".r.findAllIn(p).size
    val (ex, rex) = exchanges(p)
    val tel = StageTel(name, wall, rows, diskSpilled.get - d0,
      memSpilled.get - m0, skew, ex, rex, note)
    tels += tel
    info(f"[$tag] $name: $wall%.2f s ($rows rows; spill disk=${tel.spillDisk} mem=${tel.spillMem}; skew=$skew; exchanges=$ex+${rex}R)")
    rows
  }

  /** Full-width materialisation: hash every column so nothing prunes. */
  def fullWidth(df: DataFrame): (Long, String) = {
    val h = df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*))
      .groupBy().count()
    val n = h.collect()(0).getLong(0)
    (n, h.queryExecution.executedPlan.toString)
  }
}
