package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.normal._

/** The custom expressions must run identically through all three paths:
  * interpreted eval, whole-stage codegen, and the SQL registry
  * (GraftExtensions).
  */
class NormalExpressionsSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  test("norm_cdf / norm_ppf via Column API under codegen") {
    import spark.implicits._
    val df = Seq(0.01, 0.1, 0.5, 0.9, 0.99).toDF("p")
      .select(col("p"), norm_ppf(col("p")).as("x"))
      .select(col("p"), norm_cdf(col("x")).as("back"))
    df.collect().foreach { case Row(p: Double, back: Double) =>
      assert(math.abs(p - back) < 1e-8, s"roundtrip $p")
    }
  }

  test("null propagates") {
    import spark.implicits._
    val rows = Seq[Option[Double]](Some(0.5), None).toDF("p")
      .select(norm_ppf(col("p")).as("x")).collect()
    assert(rows(0).getDouble(0) == 0.0)
    assert(rows(1).isNullAt(0))
  }

  test("SQL registration via GraftExtensions") {
    val got = spark.sql("SELECT norm_cdf(0.0) AS c, norm_ppf(0.975) AS p").first()
    assert(math.abs(got.getDouble(0) - 0.5) < 1e-15)
    assert(math.abs(got.getDouble(1) - 1.959963984540054) < 1e-8)
  }

  test("IRB correlation+K formula stays a single codegen stage") {
    // spark.range gives a real physical scan — a local Seq would be
    // constant-folded into a LocalTableScan and never exercise codegen.
    val df = spark.range(1, 1000)
      .withColumn("pd", col("id") / lit(2000.0))
      .withColumn("g", norm_ppf(col("pd")))
      .withColumn("k", norm_cdf((col("g") + lit(2.0)) / lit(0.9)))
    // `*(N)` marks operators fused into WholeStageCodegen stage N; both
    // custom expressions must appear inside a starred Project.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"expected codegen in:\n$plan")
    assert(plan.contains("norm_ppf") && plan.contains("norm_cdf"))
    val rows = df.collect()
    assert(rows.length == 999)
    // spot-check one row against the direct kernel
    val r = rows.find(_.getLong(0) == 500L).get
    assert(math.abs(r.getDouble(3) -
      NormalMath.normCdf((NormalMath.normPpf(0.25) + 2.0) / 0.9)) < 1e-15)
  }
}
