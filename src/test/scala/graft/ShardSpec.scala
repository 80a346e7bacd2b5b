package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Shard

/** Pins the rendezvous-hashing contract behind q171: minimal disruption on
  * shard-count growth (movers go ONLY to the new shard, at ~1/(n+1) rate),
  * full range coverage, and determinism.
  */
class ShardSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val keys = (1L to 3000L).toDF("k")

  test("growing n -> n+1 moves keys ONLY to the new shard") {
    val moved = keys.select(
        Shard.rendezvousShard($"k", 8).as("s8"),
        Shard.rendezvousShard($"k", 9).as("s9"))
      .filter($"s8" =!= $"s9")
    assert(moved.filter($"s9" =!= 8).count() == 0)
    val m = moved.count().toDouble / 3000
    assert(m > 0.05 && m < 0.20, s"move rate $m far from 1/9")
  }

  test("every shard in range is hit, none outside") {
    val shards = keys.select(Shard.rendezvousShard($"k", 8).as("s"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(shards == (0L to 7L).toSet)
  }

  test("shrinking is the exact inverse of growing") {
    // keys that DIDN'T move when going 8->9 keep their shard going 9->8
    val df = keys.select($"k",
      Shard.rendezvousShard($"k", 8).as("s8"),
      Shard.rendezvousShard($"k", 9).as("s9"))
    assert(df.filter($"s9" =!= 8 && $"s8" =!= $"s9").count() == 0)
  }

  test("deterministic across evaluations") {
    val a = keys.select($"k", Shard.rendezvousShard($"k", 5).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = keys.select($"k", Shard.rendezvousShard($"k", 5).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  // -- sampled range-partitioner bounds --------------------------------------

  test("range audit covers every row in contiguous non-overlapping ranges") {
    import org.apache.spark.sql.functions._
    val df = spark.range(5000).select($"id".as("k"), ($"id" * 37 % 4999).as("v"))
    val audit = Shard.rangePartitionAudit(df, col("v"), col("k"), k = 8, sampleCap = 1000)
      .orderBy("range_id").collect()
    assert(audit.map(_.getAs[Long]("n_rows")).sum == 5000L)
    assert(audit.map(_.getAs[Int]("range_id")).toSeq == (0 until audit.length))
    // ranges are ordered and disjoint: each range's min exceeds the previous max
    audit.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("max_v") < hi.getAs[Long]("min_v"))
    case _ => ()
    }
    // bounds from a 10% sample keep ranges roughly even (within 3x of ideal)
    val counts = audit.map(_.getAs[Long]("n_rows"))
    assert(counts.max < 3 * (5000 / 8) && counts.min > (5000 / 8) / 3)
  }
}
