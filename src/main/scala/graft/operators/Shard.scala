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
}
