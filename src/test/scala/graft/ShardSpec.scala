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
}
