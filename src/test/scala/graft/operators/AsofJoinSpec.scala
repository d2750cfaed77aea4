package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // quotes: (user, ts, seq, price)
  private def quotes = Seq(
    (1L, 100L, 10L, 1.0),
    (1L, 200L, 11L, 2.0),
    (1L, 200L, 12L, 3.0), // same-ts tie: higher seq must win
    (1L, 900L, 13L, 9.0),
    (2L, 500L, 20L, 5.0)
  ).toDF("user_id", "ts", "event_id", "price")

  // trades: (user, ts, seq)
  private def trades = Seq(
    (1L, 150L, 50L), // between quotes 100 and 200 -> matches ts=100
    (1L, 200L, 51L), // exactly at a quote ts -> at-or-before matches ts=200
    (1L, 950L, 52L), // after 900 -> matches 900
    (2L, 400L, 53L), // before user 2's only quote -> unmatched
    (3L, 100L, 54L)  // user with no quotes at all -> unmatched
  ).toDF("user_id", "ts", "event_id")

  private def run(tol: Option[Long]) =
    AsofJoin.backward(trades, quotes, by = "user_id", on = "ts",
        seq = "event_id", payload = Seq("price"), tolerance = tol)
      .select(col("event_id"), col("asof_on"), col("asof_price"))
      .as[(Long, Option[Long], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("backward match, at-or-before semantics, same-ts highest-seq tie") {
    val m = run(None)
    assert(m(50L) == ((Some(100L), Some(1.0))), s"strict-before match: $m")
    assert(m(51L) == ((Some(200L), Some(3.0))),
      s"at-or-before must match the same-ts quote, higher seq wins: $m")
    assert(m(52L) == ((Some(900L), Some(9.0))), s"latest quote carries: $m")
    assert(m(53L) == ((None, None)), s"no prior quote -> null: $m")
    assert(m(54L) == ((None, None)), s"unknown key -> null: $m")
  }

  test("tolerance voids stale matches but keeps fresh ones") {
    val m = run(Some(50L))
    assert(m(50L) == ((Some(100L), Some(1.0))), "lag 50 at tol 50 is fresh")
    assert(m(52L) == ((Some(900L), Some(9.0))), "lag 50 is fresh")
    assert(m(51L) == ((Some(200L), Some(3.0))), "lag 0 is fresh")
    val strict = run(Some(49L))
    assert(strict(50L) == ((None, None)), "lag 50 at tol 49 must void")
  }

  test("left columns pass through unchanged and row count is preserved") {
    val out = AsofJoin.backward(trades, quotes, by = "user_id", on = "ts",
      seq = "event_id", payload = Seq("price"), tolerance = None)
    assert(out.count() == trades.count(), "as-of never drops or duplicates left rows")
    assert(out.columns.toSeq == Seq("user_id", "ts", "event_id", "asof_on", "asof_price"))
  }
}
