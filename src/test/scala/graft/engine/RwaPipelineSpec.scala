package graft.engine

import graft.SparkSpec
import graft.queries.Rwa
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integration: the q50 flagship computation composed as an Orchestrator
  * stage pipeline (load → enrich → classify → calculate → aggregate) with
  * persist-materialised edges must produce exactly the same summary as the
  * single-plan query — the stage-fold machinery is pure plumbing, never
  * semantics. Plus the reference's conservation invariant (reference
  * `tests/properties/test_conservation.py`): per-class sums roll up to the
  * portfolio total.
  */
class RwaPipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val enriched = ArtifactKey[DataFrame]("enriched")
  private val classified = ArtifactKey[DataFrame]("classified")
  private val calculated = ArtifactKey[DataFrame]("calculated")
  private val summary = ArtifactKey[DataFrame]("summary")

  private def stages = {
    import spark.implicits._
    val ccfRules = Seq(("O", 0.75), ("F", 1.0), ("P", 0.5))
      .toDF("ccf_status", "ccf")
    val rwRules = Seq(
      ("retail", "small", 0.75), ("retail", "large", 1.00),
      ("corporate", "small", 1.00), ("corporate", "large", 1.50),
      ("sovereign", "small", 0.00), ("sovereign", "large", 0.20)
    ).toDF("rw_class", "rw_band", "risk_weight")

    Seq(
      new Stage {
        def name = "enrich"
        def run(ctx: PipelineContext) = {
          val o = Tables.orders(spark, sfDir)
          val c = Tables.customer(spark, sfDir)
          val n = Tables.nation(spark, sfDir)
          ctx.put(enriched,
            o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
              .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left"))
        }
        override def edgeFrames = Seq(enriched)
      },
      new Stage {
        def name = "classify"
        def run(ctx: PipelineContext) =
          ctx.put(classified, ctx.get(enriched)
            .withColumn("exposure_class",
              when(col("n_name").isin("UNITED STATES", "GERMANY", "CHINA") &&
                   col("c_acctbal") > 9000, "sovereign")
                .when(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE") &&
                      col("o_totalprice") < 50000, "retail")
                .otherwise("corporate"))
            .withColumn("size_band",
              when(col("o_totalprice") < 150000, "small").otherwise("large")))
        override def edgeFrames = Seq(classified)
      },
      new Stage {
        def name = "calculate"
        def run(ctx: PipelineContext) =
          ctx.put(calculated, ctx.get(classified)
            .join(broadcast(ccfRules), col("o_orderstatus") === col("ccf_status"), "left")
            .withColumn("ead", col("o_totalprice") * coalesce(col("ccf"), lit(1.0)))
            .join(broadcast(rwRules),
              col("exposure_class") === col("rw_class") &&
              col("size_band") === col("rw_band"), "left")
            .withColumn("rwa", col("ead") * coalesce(col("risk_weight"), lit(1.0))))
        override def edgeFrames = Seq(calculated)
      },
      new Stage {
        def name = "aggregate"
        def run(ctx: PipelineContext) =
          ctx.put(summary, ctx.get(calculated)
            .groupBy(col("exposure_class"))
            .agg(count(lit(1)).as("n_exposures"),
                 graft.queries.Q.dsum(col("ead"), 6).as("total_ead"),
                 graft.queries.Q.dsum(col("rwa"), 6).as("total_rwa"),
                 (graft.queries.Q.dsum(col("rwa"), 6) /
                  graft.queries.Q.dsum(col("ead"), 6)).as("avg_rw"))
            .orderBy(col("exposure_class")))
      })
  }

  test("staged pipeline equals the single-plan flagship query exactly") {
    val out = Orchestrator.runStages(stages, PipelineContext())
    val staged = out.get(summary).collect().map(_.toSeq).toSeq
    val direct = Rwa.q50SaRwaFlagship.build(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(staged == direct)
    assert(out.timings.map(_._1) == Seq("enrich", "classify", "calculate", "aggregate"))
  }

  test("conservation: class partition sums equal the unpartitioned totals") {
    val out = Orchestrator.runStages(stages, PipelineContext())
    val perClass = out.get(summary)
      .agg(sum("total_rwa"), sum("total_ead"), sum("n_exposures")).first()
    val flat = out.get(calculated)
      .agg(graft.queries.Q.dsum(col("rwa"), 6), graft.queries.Q.dsum(col("ead"), 6),
           count(lit(1))).first()
    // money tolerance 0.005, the reference's conservation discipline
    assert(math.abs(perClass.getDouble(0) - flat.getDouble(0)) < 0.005)
    assert(math.abs(perClass.getDouble(1) - flat.getDouble(1)) < 0.005)
    assert(perClass.getLong(2) == flat.getLong(2))
  }
}
