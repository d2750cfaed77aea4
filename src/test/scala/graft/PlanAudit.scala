package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape diagnostic: executes the named queries (default: all) and
  * prints join/shuffle/scan counters from the FINAL (AQE) physical plan —
  * the `.explain` audit loop as a runnable. Usage:
  *
  *   sbt "Test/runMain graft.PlanAudit <sfDir> [q1,q2,...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").toSet) else None
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, dir)
          df.collect() // AQE: counters only meaningful on the final plan
          val plan = df.queryExecution.executedPlan.toString
          def n(pat: String) = pat.r.findAllIn(plan).size
          val pushed = plan.linesIterator
            .filter(_.contains("PushedFilters: ["))
            .count(!_.contains("PushedFilters: []"))
          println(f"$name%-28s bhj=${n("BroadcastHashJoin")}%2d " +
            f"smj=${n("SortMergeJoin")}%2d shuffle=${n("Exchange hashpartitioning")}%2d " +
            f"codegen=${n("\\*\\(\\d+\\)")}%3d scans=${n("FileScan|Scan parquet")}%2d " +
            f"pushedScans=$pushed%2d")
        } catch {
          case e: Throwable => println(s"$name FAILED: ${e.getMessage.take(120)}")
        }
      }
    spark.stop()
  }
}
