package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins — the third leg of the
  * join-strategy triad this engine uses (broadcast for small dims,
  * salting for skew — q107, bucketing for BIG×BIG equi-joins).
  *
  * The reference is single-node and needs none of this (Polars joins in
  * memory); at 100 TB the dominant cost of a fact×fact join is the
  * shuffle of BOTH sides. Hive-style bucketing (`bucketBy`) pre-hashes
  * each table into a fixed number of buckets ON DISK at write time, so a
  * join on the bucket key reads co-located buckets and Catalyst plans a
  * SortMergeJoin with NO Exchange on either side — the shuffle is paid
  * once at ingest, then amortised over every downstream join/aggregate
  * on that key (exactly the layout a nightly-ingested 100 TB exposure
  * book wants). BucketingSpec asserts the no-Exchange plan shape.
  *
  * Constraints carried by design: both sides must agree on bucket COUNT
  * (or be integer multiples under
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`) and KEY;
  * `bucketBy` requires `saveAsTable` (the bucket metadata lives in the
  * catalog, not the parquet footer).
  */
object Bucketing {

  /** Write `df` as a catalog-managed parquet table bucketed (and
    * sort-prepared) on `key` — one shuffle now, zero on every future
    * equi-join/aggregation on `key`. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their shared bucket key. The plan is
    * the caller's proof obligation: with matching bucket specs the
    * SortMergeJoin has no Exchange child on either side. */
  def cobucketedJoin(
      s: SparkSession, left: String, right: String, key: String): DataFrame =
    s.table(left).join(s.table(right), key)
}
