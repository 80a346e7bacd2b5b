package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

/** Count-min sketch invariants the q153 oracle can't see: the estimate
  * dominates the true count for EVERY key (not just the audited top-20),
  * and the sketch is mergeable — sketching a union equals adding the
  * parts' sketches cell-wise (what makes the partial aggregation, and any
  * batch/stream composition, correct).
  */
class SketchesSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val D = 4
  private val W = 16 // tiny width so collisions are guaranteed

  private def items(keys: Seq[String]) = keys.toDF("k")

  test("cms estimate >= exact count for every key; equality without collisions") {
    val keys = (1 to 40).flatMap(i => Seq.fill(i % 5 + 1)(s"key$i"))
    val df = items(keys)
    val sketch = Sketches.countMin(df, "k", D, W)
    val exact = df.groupBy("k").agg(count(lit(1)).as("exact_n"))
    val est = Sketches.cmsEstimate(exact.select("k"), "k", sketch, D, W)
    val joined = exact.join(est, "k")
      .select(col("k"), col("exact_n"), col("cms_n")).collect()
    assert(joined.length == 40)
    assert(joined.forall(r => r.getAs[Long]("cms_n") >= r.getAs[Long]("exact_n")),
      "count-min must never underestimate")
    // a sketch wide enough that every key gets its own buckets is exact
    val wide = Sketches.countMin(df, "k", D, 1 << 20)
    val estWide = Sketches.cmsEstimate(exact.select("k"), "k", wide, D, 1 << 20)
    val diff = exact.join(estWide, "k")
      .filter(col("cms_n") =!= col("exact_n")).count()
    assert(diff == 0, "collision-free sketch must be exact")
  }

  test("cms inner product >= exact join size; exact without collisions") {
    val a = items((1 to 30).flatMap(i => Seq.fill(i % 3 + 1)(s"k$i")))
    val b = items((15 to 45).flatMap(i => Seq.fill(i % 4 + 1)(s"k$i")))
    def exactJoin(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      x.groupBy("k").agg(count(lit(1)).as("na"))
        .join(y.groupBy("k").agg(count(lit(1)).as("nb")), "k")
        .agg(coalesce(sum(col("na") * col("nb")), lit(0L))).head().getLong(0)
    val exact = exactJoin(a, b)
    val ests = Sketches.cmsInnerProduct(
      Sketches.countMin(a, "k", D, W), Sketches.countMin(b, "k", D, W))
      .select("est").as[Long].collect()
    assert(ests.length == D)
    assert(ests.forall(_ >= exact), "inner product must never underestimate")
    // collision-free width → every depth's estimate is exact
    val wide = Sketches.cmsInnerProduct(
      Sketches.countMin(a, "k", D, 1 << 20), Sketches.countMin(b, "k", D, 1 << 20))
      .select("est").as[Long].collect()
    assert(wide.forall(_ == exact), "collision-free inner product must be exact")
  }

  test("sketches merge cell-wise: sketch(a ++ b) == sketch(a) + sketch(b)") {
    val a = items(Seq("x", "y", "x", "z"))
    val b = items(Seq("y", "y", "w"))
    val whole = Sketches.countMin(a.unionByName(b), "k", D, W)
    val merged = Sketches.countMin(a, "k", D, W)
      .unionByName(Sketches.countMin(b, "k", D, W))
      .groupBy("j", "bucket").agg(sum("c").as("c"))
    val mismatch = whole.join(merged, Seq("j", "bucket"), "full")
      .filter(whole("c").isNull || merged("c").isNull || whole("c") =!= merged("c"))
    assert(mismatch.count() == 0)
  }

  test("histogramMedian: known small case and exact-rank audit") {
    // values 1..100: lower median (rank 50) = 50; bin((50-1)*16//100)=7,
    // edge = 1 + (7*100)//16 = 44
    val df = (1 to 100).map(v => ("g1", v.toLong)).toDF("g", "v")
    val r = Sketches.histogramMedian(df, "g", "v", bins = 16).head()
    assert(r.getAs[Long]("p50_exact_fp") == 50L)
    assert(r.getAs[Long]("p50_bin") == 7L)
    assert(r.getAs[Long]("p50_est_fp") == 44L)
    assert(r.getAs[Long]("err_fp") == -6L)
  }

  test("histogramMedian: the exact median always lands in the chosen bin") {
    val df = (1 to 500).map(i => (s"g${i % 3}", (i * i * 2654435761L) % 99991))
      .toDF("g", "v")
    Sketches.histogramMedian(df, "g", "v", bins = 16).collect().foreach { r =>
      val (mn, mx) = (r.getAs[Long]("mn"), r.getAs[Long]("mx"))
      val bin = r.getAs[Long]("p50_bin")
      val exact = r.getAs[Long]("p50_exact_fp")
      val lower = mn + (bin * (mx - mn + 1)) / 16
      val upper = mn + ((bin + 1) * (mx - mn + 1)) / 16
      assert(exact >= lower && exact < upper,
        s"median $exact outside bin [$lower, $upper)")
      assert(r.getAs[Long]("p50_est_fp") == lower)
    }
  }

  test("histogramMedian: a constant group estimates exactly with zero error") {
    val df = (1 to 40).map(_ => ("c", 7L)).toDF("g", "v")
    val r = Sketches.histogramMedian(df, "g", "v", bins = 16).head()
    assert(r.getAs[Long]("p50_bin") == 0L)
    assert(r.getAs[Long]("p50_est_fp") == 7L)
    assert(r.getAs[Long]("err_fp") == 0L)
  }
}
