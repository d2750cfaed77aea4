package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bucketing contract: a join between co-bucketed tables plans with
  * NO Exchange on either side (the shuffle was paid at write time), and
  * the join result matches the plain-parquet join bit for bit.
  */
class BucketingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("co-bucketed fact tables join without a shuffle") {
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice", "l_quantity")
    Bucketing.writeBucketed(
      orders.withColumnRenamed("o_orderkey", "l_orderkey"),
      "orders_bkt", "l_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "lineitem_bkt", "l_orderkey", 8)
    // at sf0.001 both sides fit a broadcast, which would hide the
    // bucketed-SMJ shape this spec pins — disable broadcast to get the
    // plan a 100 TB fact×fact join takes
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.cobucketedJoin(
        spark, "orders_bkt", "lineitem_bkt", "l_orderkey")
      val agg = joined.agg(
        count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      agg.collect() // finalise the adaptive plan
      // assert on the FINAL adaptive plan only (the printed string
      // appends the pre-AQE "Initial Plan", whose own Exchange would
      // false-positive a substring scan)
      val full = agg.queryExecution.executedPlan.toString
      val plan = full.indexOf("== Initial Plan ==") match {
        case -1 => full
        case i => full.substring(0, i)
      }
      // the join itself must be exchange-free: every Exchange in the
      // plan (there is one, for the final single-row aggregate) must sit
      // ABOVE the SortMergeJoin, never below it
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected SortMergeJoin:\n$plan")
      assert(!plan.substring(joinIdx).contains("Exchange"),
        s"bucketed join must not shuffle its inputs:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"scan should be bucket-aware:\n$plan")
      // correctness: identical to the plain-parquet join
      val expected = Tables.orders(spark, sfDir)
        .join(Tables.lineitem(spark, sfDir),
          col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)), sum(col("l_quantity"))).head
      val got = agg.head
      assert(got.getLong(0) == expected.getLong(0))
      assert(got.getDouble(1) == expected.getDouble(1))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }
}
