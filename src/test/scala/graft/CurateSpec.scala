package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curate

/** Corpus-assembly operators (q103/q104/q106/q107): token budgets,
  * deterministic training order, first-seen novelty, prune curve.
  */
class CurateSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def corpus(n: Int) =
    spark.range(n).select(
      col("id"),
      concat(lit("src"), (col("id") % 3).cast("string")).as("src"),
      (col("id") % 50 + 10).as("tok"))

  test("tokenBudget keeps everything when the budget covers the stratum") {
    val d = corpus(300)
    val out = Curate.tokenBudget(d, $"id", $"src", $"tok",
      budgets = Map.empty, default = Long.MaxValue / 20000)
    assert(out.count() === 300)
    assert(out.columns.toSeq === Seq("id", "src", "tok"), "original schema restored")
  }

  test("tokenBudget: smaller budgets keep strict subsets; rate tracks budget") {
    val d = corpus(3000)
    def kept(b: Long) = Curate.tokenBudget(d, $"id", $"src", $"tok",
      budgets = Map.empty, default = b).select("id").as[Long].collect().toSet
    val small = kept(2000)
    val large = kept(8000)
    assert(small.subsetOf(large), "budget threshold must be monotonic")
    // each stratum totals ~34.5k tokens; budget 8000 → keep ~23% of docs
    assert(large.size > 400 && large.size < 1000, s"got ${large.size}")
    // deterministic: same call, same membership
    assert(kept(2000) === small)
  }

  test("tokenBudget enforces the budget within sampling noise") {
    val d = corpus(3000)
    val tokens = Curate.tokenBudget(d, $"id", $"src", $"tok",
        budgets = Map.empty, default = 5000L)
      .groupBy("src").agg(sum("tok").as("t")).select("t").as[Long].collect()
    tokens.foreach(t => assert(t > 3000 && t < 7000, s"kept $t tokens for budget 5000"))
  }

  test("tokenBudget plan: corpus never shuffles — totals broadcast back") {
    val d = corpus(300)
    val out = Curate.tokenBudget(d, $"id", $"src", $"tok",
      budgets = Map("src1" -> 100L), default = 1000L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), "per-stratum totals must broadcast")
  }

  test("trainingOrder: per-shard positions are a contiguous permutation") {
    val d = spark.range(1000).toDF("id")
    val out = Curate.trainingOrder(d, $"id", nShards = 4).cache()
    try {
      assert(out.count() === 1000)
      val perShard = out.groupBy("shard")
        .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
          count_distinct(col("pos")).as("d"))
        .collect()
      assert(perShard.length === 4)
      perShard.foreach { r =>
        assert(r.getAs[Long]("lo") === 1L)
        assert(r.getAs[Long]("hi") === r.getAs[Long]("n"))
        assert(r.getAs[Long]("d") === r.getAs[Long]("n"))
      }
    } finally out.unpersist()
  }

  test("curriculumOrder: phases are contiguous inside every shard") {
    val d = spark.range(800).select(col("id"), (col("id") % 3).as("band"))
    val out = Curate.curriculumOrder(d, $"id", $"band", nShards = 4).cache()
    try {
      assert(out.count() === 800)
      // per shard: positions are a contiguous 1..n permutation
      out.groupBy("shard")
        .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
          count_distinct(col("pos")).as("d"))
        .collect().foreach { r =>
          assert(r.getAs[Long]("lo") === 1L)
          assert(r.getAs[Long]("hi") === r.getAs[Long]("n"))
          assert(r.getAs[Long]("d") === r.getAs[Long]("n"))
        }
      // per shard: phase p's positions all precede phase p+1's
      val spans = out.groupBy("shard", "phase")
        .agg(min("pos").as("lo"), max("pos").as("hi"))
        .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("phase"),
          r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      spans.groupBy(_._1).foreach { case (_, g) =>
        g.sortBy(_._2).sliding(2).foreach {
          case Array((_, _, _, hi0), (_, _, lo1, _)) => assert(hi0 < lo1)
          case _ =>
        }
      }
    } finally out.unpersist()
  }

  test("curriculumOrder with one phase degrades to trainingOrder's shape") {
    val d = spark.range(300).toDF("id")
    val cur = Curate.curriculumOrder(d, $"id", lit(0L), nShards = 4)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().toSet
    // same md5 shard assignment discipline: deterministic, layout-stable
    val again = Curate.curriculumOrder(d.repartition(5), $"id", lit(0L), nShards = 4)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().toSet
    assert(cur === again)
  }

  test("trainingOrder is stable under input partitioning") {
    val d = spark.range(500).toDF("id")
    def digest(df: org.apache.spark.sql.DataFrame) =
      Curate.trainingOrder(df, $"id", nShards = 4)
        .select(concat_ws(":", $"id", $"shard", $"pos").as("s"))
        .as[String].collect().toSet
    assert(digest(d.repartition(7)) === digest(d.coalesce(1)),
      "order assignment must not depend on physical layout")
  }

  test("noveltyScore: exact copy has zero novelty, first doc full novelty") {
    val d = Seq(
      (1L, "a b c d e"),   // first: all grams novel
      (2L, "a b c d e"),   // exact copy: nothing novel
      (3L, "c d e f g")    // shares cde; def/efg new... (cde first in doc1)
    ).toDF("doc_id", "text")
      .withColumn("toks", split(trim(col("text")), "\\s+"))
    val out = Curate.noveltyScore(d, "doc_id", "toks", n = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Double]("novelty") === 1.0)
    assert(out(1).getAs[Double]("novelty") === 0.0)
    // doc3 grams: cde (seen in doc1), def, efg → 2/3 novel
    assert(out(2).getAs[Long]("n_grams") === 3L)
    assert(out(2).getAs[Long]("n_novel") === 2L)
  }

  test("noveltyScore counts distinct grams once per doc") {
    val d = Seq((1L, "x y z x y z x y z")).toDF("doc_id", "text")
      .withColumn("toks", split(trim(col("text")), "\\s+"))
    val out = Curate.noveltyScore(d, "doc_id", "toks", n = 3).collect()
    // distinct grams of xyzxyzxyz: xyz,yzx,zxy → 3, all novel
    assert(out.head.getAs[Long]("n_grams") === 3L)
    assert(out.head.getAs[Double]("novelty") === 1.0)
  }

  test("pruneCurve: totals preserved, buckets ordered by quality") {
    val d = spark.range(10000).select(
      (col("id").cast("double") / 10000.0).as("q"), lit(7L).as("w"))
    val out = Curate.pruneCurve(d, $"q", $"w", buckets = 10, grid = 10000).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum === 10000L)
    assert(out.map(_.getAs[Long]("n_tokens")).sum === 70000L)
    // uniform grid → every decile gets ~1000 docs
    out.foreach(r => assert(math.abs(r.getAs[Long]("n_docs") - 1000L) <= 1))
    // bucket boundaries must not overlap and must ascend
    val bounds = out.sortBy(_.getAs[Long]("bucket"))
      .map(r => (r.getAs[Long]("min_cell"), r.getAs[Long]("max_cell")))
    bounds.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2)
      case _ =>
    }
  }

  test("pruneCurve collapses ties into one bucket (grid-resolution semantics)") {
    // all docs share one quality cell → a single bucket holds everything
    val d = spark.range(100).select(lit(0.5).as("q"), lit(1L).as("w"))
    val out = Curate.pruneCurve(d, $"q", $"w", buckets = 10, grid = 10000).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_docs") === 100L)
    assert(out.head.getAs[Long]("min_cell") === 5000L)
  }

  test("packingManifest: offsets are contiguous, cover the corpus, and straddle cuts") {
    val docs = (1L to 200L).map(i => (i, 10L + (i % 37) * 3L)).toDF("doc_id", "n_tokens")
    val m = Curate.packingManifest(
      docs, col("doc_id"), col("n_tokens"), nShards = 4, seqLen = 64L).collect()
    // global layout: sorted by doc_start, each doc begins where the
    // previous ended — no gaps, no overlaps, starting at zero
    val sorted = m.sortBy(_.getAs[Long]("doc_start"))
    assert(sorted.head.getAs[Long]("doc_start") == 0L)
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("doc_start") + a.getAs[Long]("n_tokens") ==
        b.getAs[Long]("doc_start"))
    }
    val total = m.map(_.getAs[Long]("n_tokens")).sum
    val last = sorted.last
    assert(last.getAs[Long]("doc_start") + last.getAs[Long]("n_tokens") == total)
    // sequence spans: n_seqs matches the boundary arithmetic; docs longer
    // than a sequence straddle at least two
    m.foreach { r =>
      val start = r.getAs[Long]("doc_start"); val n = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("first_seq") == start / 64)
      assert(r.getAs[Long]("last_seq") == (start + n - 1) / 64)
      if (n > 64) assert(r.getAs[Long]("n_seqs") >= 2)
    }
  }
}
