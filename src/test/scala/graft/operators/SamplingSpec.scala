package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The deterministic-split contract: pure function of the key (stable
  * across re-runs and independent of row order/partitioning), correct
  * boundary routing, and a roughly uniform bucket distribution.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("stable bucket is a pure function of the key — rerun and order invariant") {
    val keys = (1 to 500).map(i => s"DOC-$i")
    val a = keys.toDF("k")
      .select(col("k"), Sampling.stableBucket(col("k"), 100).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = scala.util.Random.shuffle(keys).toDF("k").repartition(7)
      .select(col("k"), Sampling.stableBucket(col("k"), 100).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.forall(v => v >= 0 && v < 100))
    // rough uniformity: 500 keys over 100 buckets -> >= 60 distinct
    assert(a.values.toSet.size > 60)
  }

  test("split labels route buckets at the exact boundaries") {
    val got = Seq(0L, 89L, 90L, 94L, 95L, 99L).toDF("b")
      .select(Sampling.splitLabel(col("b"), 90, 5).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("train", "train", "validation", "validation", "test", "test"))
  }
}
