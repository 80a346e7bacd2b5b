package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Data Selection with Importance Resampling (Xie et al., NeurIPS 2023 —
  * DSIR): score every raw document by how much its hashed n-gram feature
  * distribution looks like a TARGET corpus versus the raw corpus, then
  * keep the top slice. The standard cheap alternative to a trained quality
  * classifier when assembling a pretraining mix toward a target domain.
  *
  * Model: unigram features hashed into `buckets` buckets (feature hashing
  * exactly as the paper — collisions are part of the estimator), bag-of-
  * words importance weight
  * `log p_target(doc) − log p_raw(doc) = Σ_f c_f · w_f` with Laplace-
  * smoothed per-bucket log-ratios
  * `w_f = ln( ((t_f+1)/(T+B)) / ((r_f+1)/(R+B)) )`.
  *
  * Determinism: each `w_f` is ONE libm `ln` over ONE IEEE division of
  * exact int64 cross-products (all < 2^53 at in-repo scale — a 100 TB run
  * computes the 256-row weight table from a bounded token sample first),
  * floored to fixed-point (·1e6) BEFORE the per-doc Σ c_f·w_f, which is
  * then exact int64 — the q64/q79 discipline, reproducible in any engine.
  *
  * Scale shape: the weight table is `buckets` rows — broadcast — so
  * scoring is explode → map-side bucket hash → broadcast join → one
  * groupBy(doc) partial-aggregated sum. The corpus text never shuffles;
  * the only exchange carries (doc_id, bucket, count) partial sums.
  */
object Dsir {

  /** Feature hash: first 8 md5 hex digits mod `buckets` (engine-portable,
    * the [[Sampling.hashBucket]] construction with a different modulus).
    */
  def featureBucket(term: Column, buckets: Int): Column =
    conv(substring(md5(term), 1, 8), 16, 10).cast("long") % buckets

  /** The `buckets`-row fixed-point weight table: (bucket, w_fp).
    * `isTarget` marks the target slice WITHIN `docs` (target ⊆ raw, as in
    * the paper's target-vs-raw formulation).
    */
  def importanceWeights(
      docs: DataFrame, textCol: String, isTarget: Column,
      buckets: Int = 256): DataFrame = {
    require(buckets > 0)
    val feats = docs
      .select(isTarget.as("__t"), explode(Text.tokens(col(textCol))).as("term"))
      .select(col("__t"), featureBucket(col("term"), buckets).as("bucket"))
    val perBucket = feats.groupBy("bucket")
      .agg(count_if(col("__t")).as("tf"), count(lit(1)).as("rf"))
    val totals = perBucket.agg(
      sum(col("tf")).as("__tt"), sum(col("rf")).as("__rt"))
    perBucket.crossJoin(broadcast(totals))
      .select(col("bucket"),
        floor(lit(1e6) * log(
          ((col("tf") + 1) * (col("__rt") + buckets)).cast("double") /
            ((col("rf") + 1) * (col("__tt") + buckets)).cast("double")))
          .cast("long").as("w_fp"))
  }

  /** Per-doc importance score Σ c_f · w_f (exact int64) against a
    * [[importanceWeights]] table: (idCol, score_fp).
    */
  def importanceScores(
      docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, buckets: Int = 256): DataFrame =
    docs
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("term"))
      .select(col(idCol), featureBucket(col("term"), buckets).as("bucket"))
      .groupBy(idCol, "bucket").agg(count(lit(1)).as("c"))
      .join(broadcast(weights), "bucket")
      .groupBy(idCol)
      .agg(sum(col("c") * col("w_fp")).as("score_fp"))
}
