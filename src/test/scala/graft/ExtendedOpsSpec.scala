package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Quality, Similarity, TextDedup}
import graft.functions.Text

/** Extended-surface operators: analytics windows, text analysis, content
  * dedup, similarity search.
  */
class ExtendedOpsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // -- analytics -------------------------------------------------------------

  test("topKPerGroup keeps k deterministic rows per group") {
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
    val out = Analytics.topKPerGroup(df, Seq("g"), Seq(col("v").desc), 2)
      .orderBy("g", "v").as[(String, Int)].collect().toSeq
    assert(out == Seq(("a", 2), ("a", 3), ("b", 9)))
  }

  test("sessionize: 30-min gap starts a new session") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:10:00"), 2L),
      (1L, ts("2024-01-01 11:30:00"), 3L), // 80-min gap → new session
      (2L, ts("2024-01-01 09:00:00"), 4L))
      .toDF("user_id", "ts", "event_id")
    val out = Analytics.sessionize(df, "user_id", "ts", "event_id", 1800L)
      .select("user_id", "event_id", "session_id")
      .orderBy("user_id", "event_id").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 0L), (1L, 2L, 0L), (1L, 3L, 1L), (2L, 4L, 0L)))
  }

  test("skewSplitJoin is row-identical to the plain join, heavy and light") {
    import org.apache.spark.sql.functions._
    // key 1 is hot (100 rows), keys 2..20 light; key 99 only in dim
    val big = ((1 to 100).map(_ => (1L, "x")) ++ (2L to 20L).map(k => (k, s"v$k")))
      .toDF("k", "payload")
    val dim = ((1L to 20L) :+ 99L).map(k => (k, k * 10)).toDF("k", "attr")
    val fast = Analytics.skewSplitJoin(big, dim, "k", heavyThreshold = 50L)
    val plain = big.join(dim, Seq("k"))
    assert(fast.exceptAll(plain).count() == 0 && plain.exceptAll(fast).count() == 0)
  }

  test("deadLetterTag: first violated rule wins; clean rows read ok") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "", Double.NaN), (2L, "t", Double.NaN), (3L, "t", 1.0))
      .toDF("id", "s", "v")
    val out = Quality.deadLetterTag(df, Seq(
      "empty_s" -> (length(col("s")) === 0),
      "nan_v" -> isnan(col("v"))))
      .select("id", "dl_reason").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "empty_s", 2L -> "nan_v", 3L -> "ok"))
  }

  test("saltedJoin is row-identical to the plain join on skewed keys") {
    val big = (1 to 500).map(i => (if (i <= 450) 1L else i.toLong % 7, i))
      .toDF("k", "v") // 90% of rows share key 1
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "tag")
    val plain = big.join(small, Seq("k")).orderBy("k", "v", "tag").collect().toSeq
    val salted = Analytics.saltedJoin(big, small, "k", salts = 4)
      .orderBy("k", "v", "tag").collect().toSeq
    assert(salted == plain)
  }

  test("asofJoin matches latest right row at or before each left row per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 09:00:00"), 102L)) // before any right row → null
      .toDF("k", "lts", "lid")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 7L),
      (1L, ts("2024-01-01 10:00:00"), 8L), // equal ts counts (<=)
      (1L, ts("2024-01-01 11:00:00"), 9L),
      (2L, ts("2024-01-01 10:00:00"), 5L))
      .toDF("k", "rts", "rid")
    val out = Analytics.asofJoin(left, right, "k", "lts", "rts", Seq("rid"), "rid")
      .orderBy("lid").select("lid", "asof_rid")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(out == Seq((100L, 8L), (101L, 9L), (102L, -1L)))
  }

  // -- text ------------------------------------------------------------------

  test("tokens + wordNgrams; fewer-than-n tokens yield empty array") {
    val df = Seq("the quick brown fox", "hi").toDF("text")
    val out = df.select(Text.wordNgrams(Text.tokens(col("text")), 3).as("g"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("the quick brown", "quick brown fox"))
    assert(out(1).isEmpty)
  }

  test("quality score is 1.0 for long stopword-free text, lower with stopwords") {
    val df = Seq(
      ("x " * 250).trim, // 499 chars, no stopwords
      ("the " * 125).trim // all stopwords
    ).toDF("text")
    val out = df.select(
      Text.qualityScore(col("text"), Text.tokens(col("text"))).as("q"))
      .as[Double].collect()
    assert(out(0) == 1.0)
    assert(out(1) < 0.6)
  }

  test("langId picks the marker-dominant language deterministically") {
    val df = Seq("le la et bonjour", "der die und das", "xyzzy qqq").toDF("text")
    val out = df.select(Text.langId(col("text"), Text.tokens(col("text"))))
      .as[String].collect().toSeq
    assert(out == Seq("fr", "de", "und"))
  }

  test("minShingleFingerprint is stable and equal for equal text") {
    val df = Seq("abcdefghij", "abcdefghij", "zzzyyyxxxwww").toDF("text")
    val out = df.select(Text.minShingleFingerprint(col("text"), 8)).as[String].collect()
    assert(out(0) == out(1))
    assert(out(0) != out(2)) // disjoint shingle sets → different fingerprints
  }

  // -- content dedup ---------------------------------------------------------

  test("exactCanonical maps duplicates to the smallest doc_id") {
    val df = Seq((10L, "same"), (3L, "same"), (7L, "other")).toDF("doc_id", "text")
    val out = TextDedup.exactCanonical(df, "doc_id", "text")
      .select("doc_id", "canonical_id", "is_dup")
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((3L, 3L, false), (7L, 7L, false), (10L, 3L, true)))
  }

  test("minhash LSH finds identical and near-identical docs, skips unrelated") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "beta gamma delta epsilon zeta eta theta iota kappa" // 1 word dropped
    val other = "one two three four five six seven eight nine ten"
    val df = Seq((1L, base), (2L, base), (3L, near), (4L, other)).toDF("doc_id", "text")
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("shingles", TextDedup.shingles(col("toks"), 3))
      .withColumn("shash", TextDedup.shingleHashes("toks", 3))
    val pairs = TextDedup.minhashLshPairs(df, "doc_id", "shash", 8, 2, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash60: identical docs at hamming 0; near docs close; jaccardPairs exact") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "one two three four five six seven eight nine ten"
    val df = Seq((1L, base), (2L, base), (3L, near), (4L, other)).toDF("doc_id", "text")
      .withColumn("simhash", TextDedup.simhash60("split(trim(text), '\\\\s+')"))
    val pairs = TextDedup.simhashPairs(df, "doc_id", "simhash", 6)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(pairs((1L, 2L)) == 0L)

    // scalar fold and explode-agg formulations must agree bit-for-bit
    val viaAgg = TextDedup.simhashAgg(df, "doc_id", "split(trim(text), '\\\\s+')")
      .orderBy("doc_id").select("simhash").as[Long].collect().toSeq
    val viaFold = df.orderBy("doc_id").select("simhash").as[Long].collect().toSeq
    assert(viaAgg == viaFold)

    val withSh = df.withColumn("shingles", TextDedup.shingles(Text.tokens(col("text")), 3))
    val jp = TextDedup.jaccardPairs(withSh, "doc_id", "shingles", 0.5)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(jp((1L, 2L)) == 1.0)
    assert(jp((1L, 3L)) == 7.0 / 8.0) // 7 shared trigrams of 8 total
  }

  // -- similarity ------------------------------------------------------------

  test("cosine: parallel=1, orthogonal=0, antiparallel=-1") {
    val df = Seq(
      (Array(1f, 0f), Array(2f, 0f)),
      (Array(1f, 0f), Array(0f, 3f)),
      (Array(1f, 0f), Array(-1f, 0f))).toDF("a", "b")
    val out = df.select(Similarity.cosine(col("a"), col("b"))).as[Double].collect()
    assert(out(0) == 1.0 && out(1) == 0.0 && out(2) == -1.0)
  }

  test("bruteForceTopK returns k nearest by cosine") {
    val vecs = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 1f)), (4L, Array(-1f, 0f))).toDF("vec_id", "embedding")
    val probe = Seq(Tuple1(Array(1f, 0f))).toDF("probe_emb")
    val out = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", probe, "probe_emb", 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L))
  }

  test("stableSlice: correct page, and plans top-k merge not a global sort") {
    val df = (1L to 10000L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(8) // unordered input across partitions
    val page = Analytics.stableSlice(df, Seq(col("id")), start = 100, end = 110)
    assert(page.orderBy("id").as[(Long, String)].collect().toSeq ==
      (101L to 110L).map(i => (i, s"v$i")))
    // the full input must never be globally sorted: the limit plans as
    // TakeOrderedAndProject (per-partition top-k + single bounded merge)
    val plan = page.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan, got:\n$plan")
    // empty page and page past the end
    assert(Analytics.stableSlice(df, Seq(col("id")), 50, 50).count() == 0)
    assert(Analytics.stableSlice(df, Seq(col("id")), 9990, 10050).count() == 10)
  }

  test("jaccardPairs maxShingleDf drops ubiquitous-shingle pairs, keeps real near-dups") {
    // docs 1/2 are genuine near-dups; docs 3/4 share ONLY the boilerplate
    // trigram present in every doc ("standard legal disclaimer")
    val docs = Seq(
      (1L, "standard legal disclaimer alpha beta gamma delta"),
      (2L, "standard legal disclaimer alpha beta gamma epsilon"),
      (3L, "standard legal disclaimer one two three four five"),
      (4L, "standard legal disclaimer six seven eight nine ten"))
      .toDF("doc_id", "text")
      .withColumn("sh", TextDedup.shingles(expr("split(trim(text), '\\\\s+')"), 3))
    def pairs(cap: Long) =
      TextDedup.jaccardPairs(docs, "doc_id", "sh", threshold = 0.2, maxShingleDf = cap)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // uncapped: boilerplate makes even 3-4 candidates (but below threshold);
    // 1-2 passes on real overlap
    assert(pairs(0L).contains((1L, 2L)))
    // cap above the true max df changes nothing
    assert(pairs(100L) == pairs(0L))
    // cap at 2: the every-doc boilerplate shingles leave the universe;
    // 1-2 still found (their overlap is non-ubiquitous), 3-4 can no longer
    // even become a candidate
    val capped = pairs(2L)
    assert(capped.contains((1L, 2L)) && !capped.contains((3L, 4L)))
  }

  test("hashSample: rate-accurate, deterministic, stable under corpus growth") {
    import graft.operators.Sampling
    val ids = (1L to 20000L).toDF("id")
    val kept = Sampling.hashSample(ids, col("id"), 0.3).as[Long].collect().toSet
    // rate accuracy: binomial(20000, 0.3) stays within ±3σ ≈ ±195
    assert(math.abs(kept.size - 6000) < 300, s"got ${kept.size} of expected ~6000")
    // deterministic: identical on re-evaluation
    assert(Sampling.hashSample(ids, col("id"), 0.3).as[Long].collect().toSet == kept)
    // membership stable under growth: the first 20k keep identical fates
    // inside a 40k corpus (incremental reprocessing invariant)
    val bigger = Sampling.hashSample((1L to 40000L).toDF("id"), col("id"), 0.3)
      .as[Long].collect().toSet
    assert(bigger.filter(_ <= 20000L) == kept)
    // nested rates: a 0.1 sample is a subset of a 0.3 sample (same buckets)
    val tighter = Sampling.hashSample(ids, col("id"), 0.1).as[Long].collect().toSet
    assert(tighter.subsetOf(kept))
  }

  test("connectedComponents labels clusters with the min id, incl. long chains") {
    // components: chain 1-2-3-4-5 (diameter 4 forces several propagation
    // rounds), clique 10-11-12, pair 20-21; 30 is a singleton (no pair)
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L))
      .toDF("doc_a", "doc_b")
    val out = TextDedup.connectedComponents(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponentsStar matches label propagation on mixed topologies") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L))
      .toDF("doc_a", "doc_b")
    val out = TextDedup.connectedComponentsStar(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponentsIncremental: batch edges merge, bridge, and add clusters without corpus re-runs") {
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("doc_a", "doc_b")
    val labels0 = TextDedup.connectedComponentsStar(base, "doc_a", "doc_b")
    // batch: an intra-cluster no-op edge, a bridge merging clusters 1 and 10,
    // a brand-new two-node cluster, and a new node attaching to cluster 20
    val batch = Seq((1L, 3L), (3L, 10L), (30L, 31L), (22L, 21L)).toDF("doc_a", "doc_b")
    val out = TextDedup.connectedComponentsIncremental(labels0, batch, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    val scratch = TextDedup.connectedComponentsStar(
      base.unionByName(batch), "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(out == scratch)
    assert(out(11L) == 1L && out(31L) == 30L && out(22L) == 20L)
  }

  test("connectedComponentsIncremental with an all-intra-cluster batch is the identity") {
    val base = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val labels0 = TextDedup.connectedComponentsStar(base, "doc_a", "doc_b")
    val out = TextDedup.connectedComponentsIncremental(
      labels0, Seq((1L, 3L)).toDF("doc_a", "doc_b"), "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("connectedComponentsStar converges in O(log n) rounds on a 1000-node chain") {
    // label propagation moves the min label ONE hop per round — a
    // 1000-node path needs ~999 rounds (maxIters=20 would stop far short);
    // alternating large-star/small-star collapses it in ~log2(n) rounds.
    val chain = (1L until 1000L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val before = spark.sparkContext.getPersistentRDDs.size
    val (labels, rounds) =
      TextDedup.connectedComponentsStarWithRounds(chain, "doc_a", "doc_b", maxRounds = 15)
    val out = labels.as[(Long, Long)].collect()
    assert(out.length == 1000 && out.forall(_._2 == 1L), "all nodes label to the chain min")
    assert(rounds <= 12, s"expected O(log n) ≈ 10 rounds, took $rounds")
    // release discipline: the per-round caches are gone; only the
    // local-checkpointed result frame itself may remain persisted
    assert(spark.sparkContext.getPersistentRDDs.size <= before + 1,
      "loop caches must be released before returning")
    // an exhausted round budget fails loudly — a partial star forest would
    // otherwise emit duplicate labels
    intercept[IllegalStateException] {
      TextDedup.connectedComponentsStarWithRounds(chain, "doc_a", "doc_b", maxRounds = 2)
    }
  }

  test("kmeansFp deep-iteration path: constant plans, fixed point, no leaks") {
    // two well-separated blobs; init (first k ids) lands one seed in each,
    // so Lloyd reaches its fixed point by iteration 2 — every later
    // iteration must reproduce the same centroids exactly
    val pts = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(100.0f, 100.0f)),
      (2L, Array(0.5f, 0.2f)), (3L, Array(99.5f, 100.2f)),
      (4L, Array(0.1f, 0.4f)), (5L, Array(100.3f, 99.8f)),
      (6L, Array(0.3f, 0.1f)), (7L, Array(99.9f, 100.1f)))
      .toDF("vec_id", "embedding")
    val before = spark.sparkContext.getPersistentRDDs.size
    val r6 = Similarity.kmeansFp(pts, "vec_id", "embedding", k = 2, iters = 6)
    val c6 = r6.as[(Long, Int, Long, Long)].collect().toSeq
    // lazy (iters<=2) and truncated (iters>2) paths agree at the fixed point
    val c2 = Similarity.kmeansFp(pts, "vec_id", "embedding", k = 2, iters = 2)
      .as[(Long, Int, Long, Long)].collect().toSeq
    val c7 = Similarity.kmeansFp(pts, "vec_id", "embedding", k = 2, iters = 7)
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(c6 == c7 && c6 == c2)
    // the deep-iteration result plan is local-backed and constant-size —
    // NOT six nested assignment/update rounds (which grow geometrically)
    assert(r6.queryExecution.analyzed.toString.length < 5000,
      "iters=6 plan must not nest previous iterations")
    // <= because ContextCleaner may concurrently reclaim OTHER tests'
    // leftovers between the two reads; the point is kmeansFp adds nothing
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      "the quantized-frame persist must be released")
  }

  test("contaminationPairs finds n-gram overlap with the eval set, distinct-counted") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // contains the eval trigrams
      (2L, "alpha beta gamma unrelated words here"), // one shared trigram only
      (3L, "totally different content no overlap at all"),
      (4L, "alpha beta gamma alpha beta gamma repeated phrase")) // repetition must not inflate
      .toDF("doc_id", "text")
    val test = Seq((100L, "alpha beta gamma delta epsilon tail")).toDF("doc_id", "text")
    val out = TextDedup.contaminationPairs(train, test, "doc_id", "text", n = 3, minShared = 2)
      .orderBy("train_id")
      .as[(Long, Long, Long)].collect().toSeq
    // doc 1 shares 3 distinct trigrams (abc, bcd, cde); doc 4 shares only 1
    // distinct trigram (abc — its repetition counts once); docs 2/3 below threshold
    assert(out == Seq((1L, 100L, 3L)))
    val all = TextDedup.contaminationPairs(train, test, "doc_id", "text", n = 3, minShared = 1)
      .orderBy("train_id").as[(Long, Long, Long)].collect().toSeq
    assert(all == Seq((1L, 100L, 3L), (2L, 100L, 1L), (4L, 100L, 1L)))
    // hashed-gram mode (long join keys for a broadcast-sized wire format)
    // produces identical overlap counts
    val hashed = TextDedup.contaminationPairs(
      train, test, "doc_id", "text", n = 3, minShared = 1, hashGrams = true)
      .orderBy("train_id").as[(Long, Long, Long)].collect().toSeq
    assert(hashed == all)
  }

  test("ivfAssign picks the nearest centroid with no shuffle of the data side") {
    val vecs = Seq(
      (10L, Array(0.1f, 0.2f)), (11L, Array(5.1f, 4.9f)),
      (12L, Array(0.0f, 0.1f)), (13L, Array(4.8f, 5.2f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(0f, 0f)), (1L, Array(5f, 5f)))
      .toDF("centroid_id", "centroid_emb")
    val assigned = Similarity.ivfAssign(vecs, "vec_id", "embedding", cents)
    assert(assigned.select("vec_id", "centroid_id").as[(Long, Long)]
      .collect().toMap == Map(10L -> 0L, 11L -> 1L, 12L -> 0L, 13L -> 1L))
    // assignment is a broadcast + projection: the data side must not shuffle
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free assignment, got:\n$plan")
    // equidistant vector: tie broken to the smaller centroid id
    val tie = Seq((20L, Array(2.5f, 2.5f))).toDF("vec_id", "embedding")
    assert(Similarity.ivfAssign(tie, "vec_id", "embedding", cents)
      .select("centroid_id").as[Long].head() == 0L)
  }

  test("centroid-partitioned ANN layout: probe opens only the probed buckets (q111)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_layout").toString + "/ivf"
    spark.range(160)
      .select(col("id").as("vec_id"), (col("id") % 16).as("centroid_id"))
      .write.partitionBy("centroid_id").parquet(dir)
    val probed = spark.read.parquet(dir)
      .filter(col("centroid_id").isin(1L, 3L, 5L, 7L))
    val scans = probed.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "expected a file scan")
    assert(scans.head.selectedPartitions.partitionCount === 4,
      "directory-level pruning must restrict the scan to the probe buckets")
    assert(probed.count() === 40)
  }

  test("minhashLshPairsIncremental: finds cross-side dups, broadcasts the batch side") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"),
      (101L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of 1
      (102L, "totally different incoming content with no overlap at all"))
      .toDF("doc_id", "text")
      .withColumn("toks", graft.functions.Text.tokens(col("text")))
      .withColumn("shash", TextDedup.shingleHashes("toks", 3))
    val out = TextDedup.minhashLshPairsIncremental(
      docs.filter(col("doc_id") < 100), docs.filter(col("doc_id") >= 100),
      "doc_id", "shash", k = 8, bandRows = 2, threshold = 0.5)
    val rows = out.as[(Long, Long, Double)].collect()
    assert(rows.map(r => (r._1, r._2)).toSet == Set((1L, 101L)))
    assert(rows.head._3 == 1.0) // identical shingle sets
    // candidate generation joins the corpus band index against a BROADCAST
    // of the batch's bands — the corpus side must not shuffle for the join
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"expected the incoming band side broadcast, got:\n$plan")
  }

  test("nearDupPairsIncremental: corpus side joins with zero exchange") {
    val mk = (seed: Int) => Array.tabulate(16)(i => ((i * seed) % 7 - 3).toFloat)
    val vecs = Seq(
      (1L, mk(1)), (2L, mk(2)),
      (101L, mk(1).map(_ * 2f)), // scaled copy of 1: same LSH bucket, cosine 1
      (102L, mk(5)))
      .toDF("vec_id", "embedding")
      .withColumn("sig", Similarity.lshSignature("embedding", bits = 8, dim = 16))
    val out = Similarity.nearDupPairsIncremental(
      vecs.filter(col("vec_id") < 100), vecs.filter(col("vec_id") >= 100),
      "vec_id", "embedding", "sig", threshold = 0.999)
    val rows = out.as[(Long, Long, Double)].collect()
    assert(rows.map(r => (r._1, r._2)).toSet == Set((1L, 101L)))
    // the batch side broadcasts; the corpus side must have NO exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") && !plan.contains("Exchange hashpartitioning"),
      s"expected broadcast-only join, got:\n$plan")
  }

  test("LSH signature is scale-invariant (v and 2v share all buckets)") {
    val df = Seq(
      (1L, Array.tabulate(64)(i => (i % 7 - 3).toFloat)),
      (2L, Array.tabulate(64)(i => 2f * (i % 7 - 3))))
      .toDF("vec_id", "embedding")
    val sigs = df.withColumn("sig", Similarity.lshSignature("embedding", 8, 64))
      .select("sig").as[Long].collect()
    assert(sigs(0) == sigs(1))
  }

  // -- cross-engine division convention --------------------------------------

  test("sign-safe ppm division matches DuckDB floor-// on negative sums") {
    // Spark `div` truncates toward zero; DuckDB `//` floors. The repo's
    // tzDiv convention (q222/q234/q235) divides MAGNITUDES and re-applies
    // the sign, making both engines compute sign(num)·(|num| div den).
    // This frame has negative numerators — exactly where bare div would
    // silently diverge from the oracle.
    val df = Seq((-7L, 2L), (7L, 2L), (-1000001L, 3L), (0L, 5L), (-5L, 5L))
      .toDF("num", "den")
    val safe = df.selectExpr(
      "CASE WHEN (num) < 0 THEN -((-(num)) div (den)) ELSE (num) div (den) END AS q")
      .as[Long].collect().toSeq
    // expected = what DuckDB computes for the SAME CASE written with `//`:
    // floor on non-negative magnitudes == truncation, so both engines agree.
    def duckSafe(num: Long, den: Long): Long =
      if (num < 0) -Math.floorDiv(-num, den) else Math.floorDiv(num, den)
    assert(safe == Seq((-7L, 2L), (7L, 2L), (-1000001L, 3L), (0L, 5L), (-5L, 5L))
      .map { case (n, d) => duckSafe(n, d) })
    assert(safe == Seq(-3L, 3L, -333333L, 0L, -1L))
    // and the divergence the convention kills: bare Spark div (trunc) vs
    // DuckDB // (floor) differ on every negative non-exact quotient
    val bare = df.selectExpr("num div den AS q").as[Long].collect().toSeq
    assert(bare == Seq(-3L, 3L, -333333L, 0L, -1L)) // Spark truncates
    assert(Math.floorDiv(-7L, 2L) == -4L)           // DuckDB would floor
    assert(bare(0) != Math.floorDiv(-7L, 2L))
  }
}
