package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import graft.contracts.CalcError

/** Typed key for a pipeline artifact (reference `contracts/context.py`
  * ArtifactKey[T]). The phantom type documents what the stage hands over.
  */
final case class ArtifactKey[T](name: String)

/** Immutable typed key→artifact map folded through stages (reference
  * `contracts/context.py` PipelineContext; fold
  * `engine/orchestrator.py:126-162`).
  */
final case class PipelineContext(
    artifacts: Map[ArtifactKey[_], Any] = Map.empty,
    errors: Seq[CalcError] = Nil,
    timings: Seq[(String, Long)] = Nil) {

  def get[T](key: ArtifactKey[T]): T = artifacts(key).asInstanceOf[T]
  def getOpt[T](key: ArtifactKey[T]): Option[T] =
    artifacts.get(key).map(_.asInstanceOf[T])
  def put[T](key: ArtifactKey[T], value: T): PipelineContext =
    copy(artifacts = artifacts + (key -> value))
  def addErrors(es: Seq[CalcError]): PipelineContext =
    copy(errors = errors ++ es)
}

/** One pipeline stage. `edgeFrames` names the DataFrame artifacts this
  * stage SEALS at its exit — they get the persist+materialise barrier.
  */
trait Stage {
  def name: String
  def run(ctx: PipelineContext): PipelineContext
  def edgeFrames: Seq[ArtifactKey[DataFrame]] = Nil
}

/** The stage fold with per-edge materialisation (reference
  * `engine/orchestrator.py:194-219` run_stages +
  * `engine/materialise.py:220-243` materialise_sealed_edge).
  *
  * The reference collects EAGERLY at every stage exit because unbounded
  * lazy plan depth crashed Polars and multiple collects re-executed the
  * upstream (reference `engine/materialise.py:18-41`,
  * `docs/perf/baseline-2026-05-22.md:37-65`). Spark's equivalent failure
  * mode is lineage/codegen blow-up plus re-execution across actions, so
  * each sealed edge is persisted (MEMORY_AND_DISK) and materialised with
  * a cheap action; the fold unpersists an edge as soon as a later stage
  * seals its successor, keeping at most `keepEdges` generations pinned —
  * the §7.4 "unpersist each edge when its last consumer completes" rule.
  */
object Orchestrator {

  final case class Options(
      materialiseEdges: Boolean = true,
      keepEdges: Int = 2,
      storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK)

  def runStages(
      stages: Seq[Stage],
      initial: PipelineContext,
      opts: Options = Options()): PipelineContext = {

    var pinned: Vector[(String, DataFrame)] = Vector.empty

    stages.foldLeft(initial) { (ctx, stage) =>
      val t0 = System.nanoTime()
      var out = stage.run(ctx)
      if (opts.materialiseEdges) {
        stage.edgeFrames.foreach { key =>
          out.getOpt(key).foreach { df =>
            val persisted = df.persist(opts.storageLevel)
            persisted.count() // materialise once; later stages reuse the cache
            out = out.put(key, persisted)
            pinned = pinned :+ (s"${stage.name}/${key.name}" -> persisted)
          }
        }
        while (pinned.size > opts.keepEdges) {
          pinned.head._2.unpersist(blocking = false)
          pinned = pinned.tail
        }
      }
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      out.copy(timings = out.timings :+ (stage.name -> elapsedMs))
    }
  }
}
