package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) hashing — Thaler & Ravishankar 1998:
  * a key's shard among n is the argmax of n independent hash weights. The
  * routing layer a 100 TB corpus wants for sharded artifacts (IVF
  * partitions, BM25 postings shards, upsert buckets): when the shard count
  * grows n → n+1, only keys whose new weight wins move — exactly ~1/(n+1)
  * of them, and ONLY to the new shard — where `hash(key) mod n` reshuffles
  * nearly everything.
  *
  * Determinism: weights are the md5-hex-prefix construction every sampling
  * op here uses ([[Sampling.hashBucket]]); the argmax is a lexicographic
  * struct max (weight, then shard id — a fixed tie-break even at the
  * ~2⁻³³ collision rate), so routing is reproducible across engines,
  * runs, and cluster layouts. Pure per-row codegen'd expression: n md5
  * calls, no shuffle, pushes anywhere a filter does.
  */
object Shard {

  /** The HRW weight of `key` for shard `s`: 32-bit md5-derived. */
  def weight(key: Column, s: Int): Column =
    conv(substring(md5(concat(key.cast("string"), lit(s":$s"))), 1, 8), 16, 10)
      .cast("long")

  /** The winning shard in [0, nShards) for `key`. */
  def rendezvousShard(key: Column, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= 1024, s"bad shard count $nShards")
    array_max(array((0 until nShards).map(s =>
      struct(weight(key, s).as("w"), lit(s.toLong).as("s"))): _*))
      .getField("s")
  }

  /** Sampled range-partitioner bounds + assignment — what Spark's own
    * `RangePartitioner` (and every distributed sort-merge writer) does
    * before a 100 TB global sort, made deterministic and oracle-checkable:
    * a md5-hash sample (no RNG — identical sample in any engine) is cut
    * into `k` ntiles, the k−1 tile maxima become the range boundaries,
    * and every row's range is `count(boundaries < v)` against the
    * broadcast boundary array — a codegen'd array filter, NO shuffle for
    * assignment and no global sort of the input. The per-range counts this
    * returns ARE the skew audit: bounds from a representative sample keep
    * ranges balanced, so the downstream sort's reducers stay even.
    *
    * The only ordered window runs on the SAMPLE (bounded by `sampleCap`
    * per-10k rate by construction); boundary values are deterministic
    * under ties because equal sort keys share one max regardless of which
    * side of a tile cut the copies land on.
    *
    * Returns (range_id, n_rows, min_v, max_v), one row per occupied range.
    */
  def rangePartitionAudit(
      df: org.apache.spark.sql.DataFrame,
      v: Column, key: Column, k: Int, sampleCap: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2 && k <= 1024, s"bad range count $k")
    require(sampleCap >= 1 && sampleCap <= 10000, s"bad sample rate $sampleCap")
    val sample = df.filter(Sampling.hashBucket(key) < sampleCap).select(v.as("__v"))
    val bounds = sample
      .withColumn("__tile", ntile(k).over(Window.orderBy(col("__v"))))
      .filter(col("__tile") < k)
      .groupBy("__tile").agg(max(col("__v")).as("__b"))
      .agg(sort_array(collect_list(col("__b"))).as("__bs"))
    df.select(v.as("__v")).crossJoin(broadcast(bounds))
      .select(size(filter(col("__bs"), b => col("__v") > b)).as("range_id"), col("__v"))
      .groupBy("range_id")
      .agg(count(lit(1)).as("n_rows"), min(col("__v")).as("min_v"), max(col("__v")).as("max_v"))
  }
}
