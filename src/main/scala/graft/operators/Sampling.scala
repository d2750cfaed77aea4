package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * The train/validation/test split of a 100 TB corpus must be a PURE
  * FUNCTION of the document key: re-runs, backfills and incremental
  * ingests must route every document to the same split with no seed
  * state, no shuffle-order dependence, and no rand() (whose draw order
  * is partition-dependent). The standard construction hashes the key
  * and buckets the hash — here the first 8 hex chars of md5 (engine-
  * portable, so the DuckDB oracle replicates it bit-exactly; xxhash64
  * would be faster but is Spark-internal).
  */
object Sampling {

  /** Stable bucket in [0, buckets) from a string key: md5-prefix → int →
    * mod. Pure column code, identical in any engine with standard md5. */
  def stableBucket(key: Column, buckets: Int): Column =
    pmod(conv(substring(md5(key), 1, 8), 16, 10).cast("long"), lit(buckets))

  /** SQL twin for the DuckDB oracle. */
  def sqlStableBucket(expr: String, buckets: Int): String =
    s"CAST(('0x' || substr(md5($expr), 1, 8)) AS BIGINT) % $buckets"

  /** Split label from a percentage bucket: [0, trainPct) → train,
    * [trainPct, trainPct+validPct) → validation, rest → test. */
  def splitLabel(bucket: Column, trainPct: Int, validPct: Int): Column =
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + validPct, "validation")
      .otherwise("test")
}
