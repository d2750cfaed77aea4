package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing — the pre-partitioned co-located join the 100 TB brief calls
  * for: two fact tables bucketed by the join key join WITHOUT a shuffle
  * exchange on either side (the bucketing metadata satisfies the join's
  * distribution requirement at plan time). At cluster scale this is the
  * difference between re-shuffling a 100 TB book per run and shuffling it
  * once at ingest. */
class BucketingSpec extends SparkSpec {

  test("bucketed co-located join plans without shuffle exchanges") {
    // external tables (explicit path), so the static warehouse dir is unused
    val wh = java.nio.file.Files.createTempDirectory("graft_bucket_").toString
    val sfDir = "/root/testdata/sf0.001"
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    try {
      o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/orders_b").mode("overwrite").saveAsTable("orders_b")
      c.withColumnRenamed("c_custkey", "o_custkey")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/customer_b").mode("overwrite").saveAsTable("customer_b")
      // force a sort-merge join so the distribution requirement is real
      val joined = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val df = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
          .groupBy(col("c_mktsegment")).agg(sum(col("o_totalprice")).as("v"))
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
        assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
          s"bucketed join must not re-shuffle its key:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", joined)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
