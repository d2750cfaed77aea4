package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over embedding columns (`array<float>`) — SURVEY.md
  * §7.5 beyond-reference scope.
  *
  *  - brute-force cosine top-k: the exactness baseline. O(P·N) dot
  *    products; fine when the probe set is small or N is partitioned.
  *  - IVF (inverted-file) top-k: k-means coarse quantiser (spark.ml),
  *    each vector assigned to its nearest centroid; a probe only scans
  *    the `nprobe` nearest cells — the standard 10-100× pruning that
  *    makes ANN linear-ish at 100 TB (one broadcast of centroids, one
  *    shuffle on cell id).
  */
object Similarity {

  /** Deterministic cosine: per-element products cast to DECIMAL and summed
    * exactly, so the score is independent of evaluation order (same
    * discipline as [[graft.queries.Q.dsum]]); norms likewise. sqrt and the
    * final divisions are correctly-rounded IEEE ops.
    */
  def cosineExact(a: Column, b: Column): Column = {
    // the merge result is re-cast to the seed's exact decimal type —
    // Spark's decimal addition widens/caps (38,14)+(38,14) → (38,13),
    // and `aggregate` requires merge-type == seed-type; the cast is
    // lossless while |acc| < 10^24
    def dotD(x: Column, y: Column): Column =
      aggregate(
        zip_with(x, y, (p, q) => (p.cast("double") * q.cast("double"))
          .cast(DecimalType(38, 14))),
        lit(0).cast(DecimalType(38, 14)),
        (acc, v) => (acc + v).cast(DecimalType(38, 14))).cast("double")
    dotD(a, b) / (sqrt(dotD(a, a)) * sqrt(dotD(b, b)))
  }

  /** Fast double-precision cosine for internal ranking. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Brute-force cosine top-k: every probe against every candidate.
    * Probes are broadcast (they are the small side by construction);
    * ranking is a per-probe window with id tiebreak for determinism.
    */
  def bruteForceTopK(
      candidates: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int,
      exact: Boolean = true): DataFrame = {
    val cand = candidates.select(col(idCol).as("cand_id"), col(vecCol).as("cand_vec"))
    val prob = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
    val cos = if (exact) cosineExact(col("probe_vec"), col("cand_vec"))
              else cosine(col("probe_vec"), col("cand_vec"))
    val scored = cand.crossJoin(broadcast(prob))
      .filter(col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cand_id"), cos.as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF index: assign every vector to its nearest of `nlist` k-means
    * centroids. Returns (assignments, fitted model). The model's centroid
    * set is the broadcastable "index"; assignments carry `cell`.
    */
  def ivfIndex(df: DataFrame, idCol: String, vecCol: String, nlist: Int, seed: Long = 42L)
      : (DataFrame, org.apache.spark.ml.clustering.KMeansModel) = {
    val feat = df.select(col(idCol), col(vecCol),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("features")
      .fit(feat)
    (model.transform(feat).withColumnRenamed("prediction", "cell"), model)
  }

  /** IVF top-k: each probe scans only its `nprobe` nearest cells. */
  def ivfTopK(
      assignments: DataFrame, model: org.apache.spark.ml.clustering.KMeansModel,
      probes: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int): DataFrame = {
    val spark = assignments.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("cell", "centroid")
    val probCells = probes
      .select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
      .crossJoin(broadcast(centroids))
      .select(col("probe_id"), col("probe_vec"), col("cell"),
        cosine(col("probe_vec"), col("centroid")).as("cell_sim"))
      .withColumn("cell_rank", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("cell_sim").desc, col("cell"))))
      .filter(col("cell_rank") <= nprobe)
      .select(col("probe_id"), col("probe_vec"), col("cell"))
    val cand = assignments.select(col("cell"), col(idCol).as("cand_id"),
      col(vecCol).as("cand_vec"))
    val scored = cand.join(probCells, Seq("cell"))
      .filter(col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cand_id"),
        cosine(col("probe_vec"), col("cand_vec")).as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
