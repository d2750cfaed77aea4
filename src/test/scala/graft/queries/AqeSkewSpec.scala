package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE runtime re-planning — the brief's skew posture: when a join key is
  * pathologically hot, adaptive execution SPLITS the skewed shuffle
  * partition at runtime (OptimizeSkewedJoin) instead of funnelling it
  * through one task. Thresholds are lowered so the behaviour is
  * observable at test scale; at 100 TB the defaults fire on real skew. */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    val keep = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions").map(k =>
      k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      // 90% of the fact rows share one key — the classic hot key
      val fact = spark.range(0, 40000)
        .select(when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
          concat(lit("payload-"), col("id")).as("p"))
      val dim = spark.range(0, 40000).select(col("id").as("k"),
        concat(lit("dim-"), col("id")).as("d"))
      // the join must be the terminal stage: OptimizeSkewedJoin declines
      // when splitting would break a downstream distribution requirement.
      // Keep the wide payload through the join so the hot partition's
      // shuffle bytes actually exceed the (lowered) skew threshold.
      val joined = fact.join(dim, "k").select(col("k"), col("p"), col("d"))
      assert(joined.collect().length == 40000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-split markers in:\n${plan.take(3000)}")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
