package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic count-min sketch (Cormode & Muthukrishnan 2005, "An
  * improved data stream summary: the count-min sketch and its
  * applications", J. Algorithms 55(1)) — the frequency-sketch counterpart
  * to q50's engine-specific HLL/KLL sketches, built from md5-derived
  * bucket hashes so the WHOLE sketch (and every estimate read from it) is
  * bit-identical cross-engine and sits under the DuckDB oracle.
  *
  * Scale shape: the sketch is a (depth × width)-key aggregation — constant
  * size regardless of corpus (the point of CMS), fully map-side combined,
  * and MERGEABLE: sketches of partitions/batches/streams add cell-wise,
  * which is exactly what Spark's partial aggregation does here. Estimates
  * are a broadcast join of the tiny sketch against the probe keys.
  * Guarantee: estimate ≥ true count always (only overestimates, from
  * bucket collisions), with error bounded by the corpus size / width per
  * row and the min over `depth` independent rows.
  */
object Sketches {

  /** Row-j bucket of a key: md5-derived uniform hash in [0, width). */
  def cmsBucket(j: Int, key: Column, width: Int): Column =
    conv(substring(md5(concat(lit(j.toString), lit(":"), key)), 1, 8), 16, 10)
      .cast("long") % width

  /** Build the sketch from an items frame: one (j, bucket, c) row per
    * non-empty cell (absent cells are zero). The explode multiplies rows
    * by `depth` but the aggregation output is ≤ depth·width rows.
    */
  def countMin(items: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1)
    items
      .select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"), cmsBucket(j, col(keyCol), width).as("bucket"))): _*))
        .as("__jb"))
      .groupBy(col("__jb.j").as("j"), col("__jb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point estimates for the keys in `keys(keyCol)`: min over the depth
    * rows of each key's bucket counters. The sketch is broadcast (≤
    * depth·width rows by construction).
    */
  def cmsEstimate(
      keys: DataFrame,
      keyCol: String,
      sketch: DataFrame,
      depth: Int,
      width: Int): DataFrame = {
    keys
      .select(col(keyCol), explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"), cmsBucket(j, col(keyCol), width).as("bucket"))): _*))
        .as("__jb"))
      .select(col(keyCol), col("__jb.j").as("j"), col("__jb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy(col(keyCol))
      .agg(min(col("c")).as("cms_n"))
  }
}
