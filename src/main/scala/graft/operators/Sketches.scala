package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Equi-width histogram median estimator with its own exact audit — the
    * constant-memory quantile shape (a KLL/t-digest stand-in that, unlike
    * them, is bit-deterministic cross-engine): per group, values quantize
    * to `bins` equal integer buckets over the group's [min, max], the
    * estimate is the LOWER EDGE of the first bin whose cumulative count
    * reaches the lower-median rank ⌈n/2⌉, and the exact median (the
    * rank-⌈n/2⌉ smallest value — well-defined under ties) rides along
    * with the signed error.
    *
    * Everything after the one float→fixed-point quantization
    * (floor(value·1e6), the shared IEEE step both engines replay) is
    * int64: bin index by cross-multiplied floor division, bin edge back
    * the same way. Scale shape: min/max/count one map-side-combined agg
    * joined back broadcast (|groups| rows); the histogram is ≤
    * groups·bins rows; only the exact-audit rank is a per-group sort —
    * the thing a 100 TB run drops, keeping the estimator (the paired
    * audit is the point of this op at test scale).
    */
  def histogramMedian(
      df: DataFrame, groupCol: String, valueFpCol: String,
      bins: Int = 16): DataFrame = {
    require(bins >= 2)
    val q = df.select(col(groupCol).as("g"), col(valueFpCol).as("v"))
    val stats = q.groupBy("g").agg(
      min(col("v")).as("mn"), max(col("v")).as("mx"), count(lit(1)).as("n"))
    val binned = q.join(broadcast(stats), "g")
      .withColumn("bin", when(col("mx") === col("mn"), lit(0L))
        .otherwise(least(lit(bins - 1L),
          expr(s"((v - mn) * $bins) div (mx - mn + 1)"))))
    val hist = binned.groupBy("g", "bin").agg(count(lit(1)).as("c"))
    val wc = Window.partitionBy("g").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val est = hist
      .withColumn("cum", sum(col("c")).over(wc))
      .join(broadcast(stats), "g")
      .filter(col("cum") >= expr("(n + 1) div 2"))
      .groupBy("g").agg(min(col("bin")).as("p50_bin"))
      .join(broadcast(stats), "g")
      .withColumn("p50_est_fp", expr(s"mn + (p50_bin * (mx - mn + 1)) div $bins"))
    val wr = Window.partitionBy("g").orderBy("v")
    val exact = q
      .withColumn("rn", row_number().over(wr))
      .join(broadcast(stats.select(col("g"), col("n"))), "g")
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("g"), col("v").as("p50_exact_fp"))
    est.join(exact, "g")
      .select(col("g").as(groupCol), col("n"), col("mn"), col("mx"),
        col("p50_bin"), col("p50_est_fp"), col("p50_exact_fp"),
        (col("p50_est_fp") - col("p50_exact_fp")).as("err_fp"))
  }

  /** Point estimates for the keys in `keys(keyCol)`: min over the depth
    * rows of each key's bucket counters. The sketch is broadcast (≤
    * depth·width rows by construction).
    */
  /** Join-size estimation by sketch inner product (Alon–Matias–Szegedy
    * 1996 / Cormode–Muthukrishnan 2005 §4.2): for two relations sketched
    * over the SAME (depth, width, hash) grid, row j's inner product
    * Σ_w a_j[w]·b_j[w] upper-bounds the equi-join cardinality
    * Σ_k f_a(k)·f_b(k); the minimum over rows is the tightest estimate.
    * This is the cardinality statistic a distributed optimizer keeps per
    * join column: constant size, mergeable, computed in one pass per
    * side — no key exchange between the relations at estimation time.
    */
  def cmsInnerProduct(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("j"), col("bucket"), col("c").as("__ca"))
      .join(b.select(col("j"), col("bucket"), col("c").as("__cb")),
        Seq("j", "bucket"))
      .groupBy("j").agg(sum(col("__ca") * col("__cb")).as("est"))

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
