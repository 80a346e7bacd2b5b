package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: scaling probe for the dedup pipeline — replicates the sf0.1
  * corpus `mult`× with shifted ids (each replica's text perturbed by a
  * replica-tag token so replicas are not exact dups of each other) and runs
  * shingle→minhash→LSH pairs→star connected components end-to-end, timing
  * each stage. Usage: tools/run.sh graft.tools.ScaleProbe [sfDir] [mult]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_probe_wh").toString)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // storage-partitioned joins on from session start (not flipped
      // mid-sweep by the first SPJ query): Tx scans report their bucket
      // layout, and same-layout joins/aggs plan shuffle-free
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional single-family mode: a 3rd arg names one family to run alone
    if (args.lift(2).contains("bktjoin")) {
      bucketedJoinFamily(spark, sfDir, mult)
      spark.stop()
      return
    }
    if (args.lift(2).contains("mv")) {
      mvFamily(spark, sfDir, mult)
      spark.stop()
      return
    }
    if (args.lift(2).contains("tx")) {
      txFamily(spark, sfDir, mult)
      spark.stop()
      return
    }
    if (args.lift(2).contains("sread")) {
      streamReadFamily(spark, sfDir, mult)
      spark.stop()
      return
    }
    if (args.lift(2).contains("spj")) {
      spjFamily(spark, sfDir, mult)
      spark.stop()
      return
    }

    val base = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val big = (0 until mult).map { r =>
      base.select((col("doc_id") + lit(r * 1000000L)).as("doc_id"),
        concat(col("text"), lit(s" replica$r")).as("text"))
    }.reduce(_ unionByName _)
      // near-dup planted pairs across replicas: every 7th doc keeps replica 0's text
      .unionByName(base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + lit(mult * 1000000L)).as("doc_id"),
          expr("substring(text, 15)").as("text")))

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // Rule 14, applied BETWEEN EVERY FAMILY: unpersist everything
    // (including the CC labels' localCheckpoint once its family is done),
    // clear the plan cache, nudge GC. Measured consequence of skipping it:
    // the assembly family after the release family read novelty 173.6 s /
    // token budget 95.1 s / training order 80.0 s at 8× — 30–130× their
    // clean-session costs (2.9/0.8/0.6 s) — because they were timing the
    // previous families' debris, at ~5/32 cores busy (GC thrash).
    def reap(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
    }

    val hashed = big
      .withColumn("toks", graft.functions.Text.tokens(col("text")))
      .withColumn("shash", graft.operators.TextDedup.shingleHashes("toks", 3))
      .select("doc_id", "shash")
    val nDocs = time("corpus materialize")(big.count())
    println(s"[scale] docs = $nDocs")
    val pairs = graft.operators.TextDedup.minhashLshPairs(
      hashed, "doc_id", "shash", k = 8, bandRows = 2, threshold = 0.5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPairs = time("minhash LSH pairs")(pairs.count())
    println(s"[scale] pairs = $nPairs")
    // q150's shape: the O(L²) levenshtein verify runs only on the LSH
    // candidate pairs. On THIS corpus the candidate count itself grows
    // quadratically in mult (every base doc's mult near-dup replicas form
    // a C(mult,2) candidate family — measured 169k pairs at 8×, 91.7 s
    // for the full verify), so the probe measures the cost that matters
    // at scale — seconds per candidate — on a fixed-target md5 sample of
    // candidates (the q118 audit discipline: fixed absolute work under
    // corpus growth). Expect: sampled verify time flat across mults while
    // the candidate census grows ~mult².
    val cand150 = graft.operators.TextDedup.minhashLshCandidates(
      hashed, "doc_id", "shash", k = 8, bandRows = 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCand = time("editdist candidate census")(cand150.count())
    val target = 20000L
    val rate = math.min(1.0, target.toDouble / math.max(nCand, 1L))
    val rateGrid = math.floor(rate * 10000).toLong // q118's 10⁴ grid
    val sampled = cand150.filter(
      graft.operators.Sampling.hashBucket(
        concat_ws(":", col("doc_a"), col("doc_b"))) < lit(rateGrid))
    val lev = sampled
      .join(big.select(col("doc_id").as("doc_a"), col("text").as("__ta")), "doc_a")
      .join(big.select(col("doc_id").as("doc_b"), col("text").as("__tb")), "doc_b")
      .withColumn("lev", levenshtein(col("__ta"), col("__tb")).cast("long"))
      .withColumn("near", col("lev") * 100 <=
        greatest(length(col("__ta")), length(col("__tb"))).cast("long") * 30)
    val nLev = time("editdist verify, sampled (q150 shape)")(
      lev.agg(count(lit(1)), count(when(col("near"), 1))).head())
    println(s"[scale] editdist candidates = $nCand, sampled verify (rate ${rateGrid}e-4) = $nLev")
    cand150.unpersist(blocking = false)
    // q155's shape: BM25 for a fixed query — only the query terms'
    // postings leave the scan; df/avgdl are broadcast. Expect linear in
    // corpus (the postings volume), with the join shuffling only the
    // matching docs.
    val bm = graft.operators.Search.bm25(big, Seq("table", "join", "stream"))
    val nBm = time("bm25 search (q155 shape)")(bm.count())
    println(s"[scale] bm25 matching docs = $nBm")
    val (labels, rounds) = graft.operators.TextDedup
      .connectedComponentsStarWithRounds(pairs, "doc_a", "doc_b", maxRounds = 30)
    val nClusters = time("star CC")(labels.select("cluster_id").distinct().count())
    println(s"[scale] clustered docs = ${labels.count()}, clusters = $nClusters, rounds = $rounds")
    // r4: release-pipeline stages over the same replicated corpus —
    // dedup-apply, corpus-global funnel signals (vocab + bigram LM
    // rebuilt on survivors), split assignment.
    // The drop DECISION is materialized once, exactly as q101's release
    // pipeline commits it (there: through the partitioned sink; here: a
    // checkpoint suffices for a probe). Without this, funnelFlags' ~7
    // survivor references each re-derive the drop set, and once the set
    // outgrows the broadcast threshold (76k ids at 16×) every reference
    // re-shuffles the full-text corpus for its anti join — measured
    // 67 s at 16× vs 3.8 s at 8×, a cliff the committed shape removes.
    val drop = labels.filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id").localCheckpoint(true)
    val survivors = big.join(broadcast(drop), Seq("doc_id"), "left_anti")
    val nSurv = time("dedup apply")(survivors.count())
    val flags = graft.operators.QualitySignals.funnelFlags(survivors)
    val nKept = time("funnel flags")(
      flags.filter(col("k1") && col("k2") && col("k3") && col("k4")).count())
    val manifest = graft.operators.QualitySignals.funnelFlags(survivors)
      .filter(col("k1") && col("k2") && col("k3") && col("k4"))
      .withColumn("split", graft.operators.Sampling.assignSplit(
        col("doc_id"), Seq("train" -> 0.90, "val" -> 0.05), last = "test"))
    val splits = time("manifest + split")(
      manifest.groupBy("split").count().collect().sortBy(_.getString(0)).toSeq)
    println(s"[scale] survivors = $nSurv, funnel kept = $nKept, splits = $splits")
    reap() // dedup+release families done: labels checkpoint + pairs released
    // r4 continuation: corpus-assembly ops over the same replicated corpus —
    // first-seen novelty (inverted-index pair of passes), token-budget mix,
    // and the training-order window at write-shard granularity.
    val toks = big.withColumn("toks", graft.functions.Text.tokens(col("text")))
    val novel = graft.operators.Curate.noveltyScore(toks, "doc_id", "toks", n = 3)
    val nNovel = time("novelty score")(novel.count())
    val lowNovel = novel.filter(col("novelty") < 0.5).count()
    println(s"[scale] novelty rows = $nNovel, low-novelty docs = $lowNovel")
    val budgeted = graft.operators.Curate.tokenBudget(
      big.withColumn("n_tokens", size(graft.functions.Text.tokens(col("text"))).cast("long")),
      col("doc_id"), col("doc_id") % 20, col("n_tokens"),
      budgets = Map.empty, default = 40000L)
    val nBudget = time("token budget")(budgeted.count())
    val ordered = graft.operators.Curate.trainingOrder(big, col("doc_id"), nShards = 64)
    val nOrd = time("training order")(
      ordered.groupBy("shard").agg(max("pos")).count())
    println(s"[scale] budget kept = $nBudget, shards = $nOrd")
    // Stage hygiene before the timed semantic ops (r4's original lesson:
    // semDedup 16x measured 78 s in-sweep vs 10 s clean-session).
    reap()
    // r4 continuation 2: the semantic ops — SemDeDup over replicated
    // embeddings (replicas are exact semantic dups, so within-cluster
    // candidate volume grows mult^2 per vector — the worst case the
    // cluster-bounded join must absorb) and bloom-prefiltered
    // decontamination of the replicated corpus against a FIXED eval slice
    // (the realistic shape: the corpus grows, the eval set doesn't).
    val embBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val embBig = (0 until mult).map(r =>
      embBase.select((col("vec_id") + lit(r * 1000000L)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    val cents = embBase.filter(col("vec_id") < 16)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_emb"))
    val sd = graft.operators.Similarity.semDedup(
      embBig, "vec_id", "embedding", cents, threshold = 0.999)
    val nDrop = time("semantic dedup")(sd.filter(!col("keep")).count())
    println(s"[scale] semdedup dropped = $nDrop")
    val contam = graft.operators.TextDedup.contaminationPairsBloom(
      big, base.filter(col("doc_id") % 37 === 0), "doc_id", "text",
      n = 3, minShared = 2, expectedTestGrams = 1000000L)
    val nContam = time("bloom decontaminate")(contam.count())
    println(s"[scale] contaminated pairs = $nContam")
    // r5: the funnel families. Inter-stage reaping first (same hygiene as
    // above) so the agg chains measure themselves, not the decontamination
    // family's leftovers.
    reap()
    // q97's shape: funnelFlags (token/repetition/oov signals — the vocab
    // and bigram model are corpus-global aggregates rebuilt on `big`)
    // followed by the single-pass 10-aggregate funnel rollup.
    val fl = graft.operators.QualitySignals.funnelFlags(big)
    val funnelRow = time("funnel agg chain (q97 shape)")(fl.agg(
      count(lit(1)).as("d0"),
      count(when(col("k1"), 1)).as("d1"),
      count(when(col("k1") && col("k2"), 1)).as("d2"),
      count(when(col("k1") && col("k2") && col("k3"), 1)).as("d3"),
      count(when(col("k1") && col("k2") && col("k3") && col("k4"), 1)).as("d4")).head())
    println(s"[scale] funnel stages = $funnelRow")
    // q130's shape: the order- and deadline-sensitive event funnel —
    // three stage-aggregations chained by user_id joins. Events replicated
    // with SHIFTED user ids, so funnels never cross replicas and the true
    // funnel volume grows exactly mult×; per-user event cardinality (the
    // join fan-in) stays constant — the property the chain must track.
    val evRaw = spark.read.parquet(s"$sfDir/events.parquet")
    // ts → µs-since-epoch long under either testdata layout (ns-as-long
    // for the TIMESTAMP(NANOS) rounds, native timestamp for MICROS).
    val tsUs = evRaw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => (col("ts") / 1000L).cast("long")
      case _ => expr("unix_micros(cast(ts as timestamp))")
    }
    val evBase = evRaw.select(col("user_id"), col("event_type"), tsUs.as("ts"))
    val evBig = (0 until mult).map(r =>
      evBase.select((col("user_id") + lit(r * 10000000L)).as("user_id"),
        col("event_type"), col("ts")))
      .reduce(_ unionByName _)
    val v = evBig.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val c = evBig.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") > col("t_view") && col("ts") <= col("t_view") + 86400L * 1000000L)
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val p = evBig.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts") > col("t_click") && col("ts") <= col("t_click") + 86400L * 1000000L)
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    val funnel = time("event funnel (q130 shape)")(
      v.agg(count(lit(1))).crossJoin(c.agg(count(lit(1))))
        .crossJoin(p.agg(count(lit(1)))).head())
    println(s"[scale] event funnel = $funnel")
    // r5: the capped containment family (q127's production dial), LAST and
    // reap-isolated — the replicated corpus is the dial's adversarial
    // worst case (every replica-set shingle sits at df = mult, i.e.
    // exactly AT an 8× cap), so this stage is expected to be the probe's
    // heaviest and must not contaminate any other family's numbers.
    reap()
    val contCapped = graft.operators.TextDedup.containmentPairs(
      hashed, "doc_id", "shash", threshold = 0.9, maxShingleDf = 8L)
    val nCont = time("containment capped(df<=8)")(contCapped.count())
    println(s"[scale] capped containment pairs = $nCont")
    // r6: the fixed-TARGET sampled LSH audit (q118's new shape). The
    // sample is pinned at 400 docs regardless of corpus size, so the
    // exact-truth join's Σdf² term — and the whole audit — must cost the
    // SAME at 8×/16×/32× (the fixed-fraction variant it replaced grew
    // quadratically). The timed block includes the 1-row corpus count the
    // rate is derived from (one scan — the only corpus-sized term, linear).
    reap()
    val auditN = time("fixed-target LSH audit (400 docs)") {
      val samp = graft.operators.Sampling.hashSampleTarget(big, col("doc_id"), 400L)
        .withColumn("toks", graft.functions.Text.tokens(col("text")))
        .withColumn("shash", graft.operators.TextDedup.shingleHashes("toks", 3))
        .select("doc_id", "shash")
      val cand = graft.operators.TextDedup.minhashLshCandidates(
        samp, "doc_id", "shash", k = 8, bandRows = 2)
      val truth = graft.operators.TextDedup.jaccardPairs(
        samp, "doc_id", "shash", threshold = 0.5)
      cand.count() + truth.count()
    }
    println(s"[scale] audit candidate+truth rows = $auditN")
    // r6: BPE batched learning — the per-round cost must be FLAT in the
    // round number (the rolling localCheckpoint truncates the replace
    // chain; only round 1 pays the corpus-sized wordTable build). 12
    // rounds should cost ~3× 4 rounds, never more.
    reap()
    val bpe4 = time("bpe batched 4 rounds (m=8)")(graft.operators.Bpe
      .learnMergesBatched(big.select("text"), "text",
        rounds = 4, batchSize = 8, candidateCap = 32, checkpointEvery = 4).count())
    reap()
    val bpe12 = time("bpe batched 12 rounds (m=8)")(graft.operators.Bpe
      .learnMergesBatched(big.select("text"), "text",
        rounds = 12, batchSize = 8, candidateCap = 32, checkpointEvery = 4).count())
    println(s"[scale] bpe merges learned = $bpe4 / $bpe12")
    // r6: multimodal family — payload-bearing media table at mult×. The
    // metadata rollup must NOT scale with payload bytes (column pruning:
    // the binary column is never read — q42's shape), while decode+feature
    // extraction is the linear, shuffle-free mapPartitions pass.
    reap()
    locally {
      import spark.implicits._
      val media = graft.multimodal.Multimodal.mediaFromDocuments(spark,
        big.withColumn("n_chars", length(col("text")).cast("long")))
      val mediaPath = java.nio.file.Files
        .createTempDirectory("graft_scale_media").toString + "/media"
      time("media table write")(
        media.write.mode("overwrite").parquet(mediaPath))
      val tbl = spark.read.parquet(mediaPath)
      val nKinds = time("media metadata agg (payload never read)")(
        tbl.groupBy("kind").agg(count(lit(1)).as("n"), sum("duration_ms").as("dur"))
          .collect().length)
      val nFeat = time("media decode + features")(
        graft.multimodal.Multimodal.extractFeatures(
          tbl.as[graft.multimodal.Multimodal.MediaRow]).count())
      println(s"[scale] media kinds = $nKinds, features = $nFeat")
    }
    // r6: sink compaction — rewrite cost must track the FRAGMENTED buckets
    // only, not the sink size. Base sink: one file per bucket (repartition
    // on the partition column); one un-repartitioned merge then fans small
    // files into exactly nFrag buckets. Compacting 16 fragmented buckets
    // should cost ~4× compacting 4, on the same-size sink.
    reap()
    for (nFrag <- Seq(4, 16)) {
      val sink = java.nio.file.Files
        .createTempDirectory(s"graft_scale_compact$nFrag").toString + "/sink"
      val baseT = big.withColumn("p_bucket", (col("doc_id") % 64).cast("int"))
        .repartition(col("p_bucket"))
      graft.sources.Merge.upsertPartitionedBy(
        spark, baseT, sink, Seq("doc_id"), "p_bucket")
      val batch = big.filter(col("doc_id") % 64 < nFrag)
        .withColumn("p_bucket", (col("doc_id") % 64).cast("int"))
      graft.sources.Merge.upsertPartitionedBy(
        spark, batch, sink, Seq("doc_id"), "p_bucket") // fans files into nFrag buckets
      val compacted = time(s"compact $nFrag fragmented buckets (of 64)")(
        graft.sources.Merge.compactPartitioned(spark, sink, 2, "p_bucket"))
      println(s"[scale] compacted buckets = ${compacted.size} (expected $nFrag)")
    }
    // r6b: product quantization — training and encoding must be linear in
    // the corpus (one broadcast-fold assignment pass per Lloyd round, zero
    // data-side shuffle), and the ADC scan's corpus side carries only
    // (id, sub, code) against a broadcast k×m lookup table, so scan cost
    // is linear with no corpus-sized exchange.
    reap()
    locally {
      val cb = time("pq train (m=4, k=8, 1 round)")(
        graft.operators.Pq.localized(graft.operators.Pq.trainCodebooks(
          embBig, "vec_id", "embedding", m = 4, dimTotal = 64, k = 8, iters = 1)))
      val codes = graft.operators.Pq.encode(
        embBig, "vec_id", "embedding", cb, 4, 64)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nCodes = time("pq encode")(codes.count())
      val probeSv = graft.operators.Pq.subVectorsFp(
        embBase.filter(col("vec_id") === 0), "vec_id", "embedding", 4, 64)
        .select("sub", "v")
      val top = time("pq adc scan (top-10)")(
        graft.operators.Pq.adcTopK(codes, "vec_id", cb, probeSv, 10).collect())
      println(s"[scale] pq codes = $nCodes, top1 adc_d = ${top.head.getAs[Long]("adc_d")}")
      codes.unpersist(blocking = true)
    }
    // r6d: prefix-filtered exact similarity join (q176 shape). The
    // candidate term is Σ df² over PREFIX postings only (each doc's
    // rarest shingles), so candidates should grow ~mult² on the
    // replicated corpus (replicas share planted texts) while staying a
    // small fraction of the share-any-token volume; verification joins
    // full postings only for candidates.
    reap()
    locally {
      val pp = graft.operators.TextDedup.prefixFilterJaccardPairs(
        big.withColumn("toks", graft.functions.Text.tokens(col("text")))
          .withColumn("shash", graft.operators.TextDedup.shingleHashes("toks", 3)),
        "doc_id", "shash", tNum = 7, tDen = 10)
      val nPp = time("prefix join (q176 shape)")(pp.count())
      println(s"[scale] prefix-join pairs = $nPp")
    }
    // r6d: layout family — the z-order audit is one scan + one aggregate
    // (linear, trivially); range-partitioner bounds are a 5% sample
    // window + a broadcast boundary-array assignment, so cost tracks the
    // corpus scan with NO global sort.
    reap()
    locally {
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      val evBig = (0 until mult).map { r =>
        ev.select((col("event_id") + lit(r * 10000000L)).as("event_id"), col("ts"))
      }.reduce(_ unionByName _)
      val rb = graft.operators.Shard.rangePartitionAudit(
        evBig, col("ts"), col("event_id"), k = 8, sampleCap = 500)
      val counts = time("range bounds + assignment (q177 shape)")(
        rb.agg(max(col("n_rows")), min(col("n_rows"))).head())
      println(s"[scale] range balance max/min = ${counts.getLong(0)}/${counts.getLong(1)}")
    }
    // r7: winnow family — native-gram fingerprints + df-capped overlap
    // join. Gram volume is corpus-linear (one window sort per doc);
    // overlap pairs are bounded by df² per hash, so pair count should
    // track the replica multiplicity like the LSH family does.
    reap()
    locally {
      val fp = graft.operators.Winnow.fingerprints(big, "doc_id", "text", k = 5, w = 4)
      val nFp = time("winnow fingerprints")(fp.count())
      val nOv = time("winnow overlap (df<=8, >=2 shared)")(
        graft.operators.Winnow.overlapPairs(fp, "doc_id", maxDf = 8)
          .filter(col("n_shared") >= 2).count())
      println(s"[scale] winnow fp = $nFp, overlap pairs = $nOv")
    }
    // r7: k-core family — peeling cost is per-round semi-joins over the
    // staged pair list; pair volume doubles per corpus doubling on the
    // replicated corpus, and rounds are fixed, so cost should track the
    // pair list linearly.
    reap()
    locally {
      val pr = graft.sources.Stage.through(
        graft.operators.TextDedup.minhashLshPairs(
          big.withColumn("toks", graft.functions.Text.tokens(col("text")))
            .withColumn("shash", graft.operators.TextDedup.shingleHashes("toks", 3)),
          "doc_id", "shash", k = 8, bandRows = 2, threshold = 0.5)
          .select("doc_a", "doc_b"))
      val n2 = time("k-core peel (k=2, 4 rounds)")(
        graft.operators.TextDedup.kCore(pr, "doc_a", "doc_b", k = 2, rounds = 4,
          commit = graft.sources.Stage.through).count())
      println(s"[scale] 2-core size = $n2")
    }
    // r7: KMV family — per-source bottom-k sketch build is one distinct +
    // bounded-heap top-k over the gram table (corpus-linear); the
    // pairwise sketch compare is sources²·k rows, INDEPENDENT of corpus
    // size — the property that makes the sketch the 100 TB shape.
    reap()
    locally {
      import org.apache.spark.sql.expressions.Window
      val k = 256
      val g = big.select(col("doc_id") % 20 as "source",
          explode(graft.functions.Text.wordNgramsFromText(col("text"), 3)).as("gram"))
        .distinct()
      val h = g.select(col("source"),
        conv(substring(md5(concat(lit("kmv:"), col("gram"))), 1, 8), 16, 10)
          .cast("long").as("h")).distinct()
      // Stage.through is EAGER — keep it inside the timed block so the
      // build cost (gram distinct + bounded-heap top-k) is measured, not
      // just the staged read-back.
      var sk: org.apache.spark.sql.DataFrame = null
      val nSk = time("kmv sketch build (20 sources, k=256)") {
        sk = graft.sources.Stage.through(graft.operators.Analytics
          .topKPerGroupNative(h, Seq("source"), Seq(("h", false)), k))
        sk.count()
      }
      val nPairs = time("kmv pairwise compare")(
        sk.select(col("source").as("sa"), col("h"))
          .join(sk.select(col("source").as("sb"), col("h")), "h")
          .filter(col("sa") < col("sb"))
          .groupBy("sa", "sb").agg(count(lit(1)).as("rho")).count())
      println(s"[scale] kmv sketch rows = $nSk, source pairs = $nPairs")
    }
    // r9: storage-partitioned join family — q240's bucketed fact⋈fact
    // layout probed for GROWTH, not just correctness: both replicated
    // facts land bucketBy+sortBy on the join key once, then the
    // exchange-free SMJ (runtime-asserted, same require as q240) races
    // the plain shuffle join reading the SAME staged parquet. The number
    // that matters at 100 TB is the amortization ratio: layout-write
    // seconds ÷ per-join seconds saved = how many downstream joins pay
    // off the landing, while the bucketed join itself should track the
    // scan (no exchange to grow super-linearly).
    reap()
    bucketedJoinFamily(spark, sfDir, mult)
    spark.stop()
  }

  /** MV maintenance probe — runnable ALONE via
    * `tools/run.sh graft.tools.ScaleProbe <sfDir> <mult> mv` (not part of
    * the default sweep). Refresh-vs-rescan as history grows. History =
    * `mult` replicas of events, each shifted 370 days (so the hourly
    * bucket count grows linearly with history — a real MV's shape);
    * batch = one more replica. Scratch re-aggregates history+batch from
    * raw (O(history)); incremental aggregates the batch and merges it
    * into the PRE-BUILT staged state (O(batch + buckets) — the state
    * build itself is untimed because in production it already sits on
    * disk). The gap between the two lines at growing mult IS the MV
    * claim; equal bucket counts are require()d so the cheap path is
    * proven to compute the same view.
    */
  /** STORAGE-PARTITIONED JOIN growth probe: two Tx facts landed at
    * `mult`× (fixed 32 buckets, like a cluster whose per-bucket volume
    * grows with data), joined twice — once storage-partitioned (zero
    * Exchange require()d on the plan) and once with V2 bucketing off
    * (the both-sides-shuffle plan) — so SCALE.md records the win and
    * its growth, not a one-off. Usage:
    * `tools/run.sh graft.tools.ScaleProbe <sfDir> <mult> spj`.
    */
  private def spjFamily(spark: SparkSession, sfDir: String, mult: Int): Unit = {
    import graft.sources.Tx
    val nb = 32
    val shift = 100000000L
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val evBig = graft.sources.Stage.through {
      (0 until mult).map(r => ev.select(
        (col("event_id") + lit(r * shift)).as("event_id"),
        col("user_id"), col("value"), col("event_type")))
        .reduce(_ unionByName _)
    }
    val base = java.nio.file.Files
      .createTempDirectory("graft_spj_probe").toString
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scale] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    timed(s"spj: land both Tx facts, file-sorted ($mult×)") {
      Tx.commitMerge(spark, s"$base/fa",
        evBig.select("event_id", "user_id", "value"),
        Seq("event_id"), nBuckets = nb,
        fileSortCols = Seq("event_id"), maxRowsPerFile = 1000000L)
      Tx.commitMerge(spark, s"$base/fb",
        evBig.select("event_id", "event_type"),
        Seq("event_id"), nBuckets = nb,
        fileSortCols = Seq("event_id"), maxRowsPerFile = 1000000L)
      evBig.count()
    }
    val cat = "spjp"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.tx.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", base)
    def joinOnly() = spark.table(s"$cat.fa").hint("merge")
      .join(spark.table(s"$cat.fb"), Seq("event_id"))
    def joined() = joinOnly()
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set(
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    // the assert is on the BARE join: the rollup above it re-groups on
    // a non-bucket column, whose Exchange is the query's, not the join's
    val plan = joinOnly().queryExecution.executedPlan.toString
    require(plan.contains("SortMergeJoin") && !plan.contains("Exchange") &&
      !plan.contains("Sort ["),
      s"spj probe must plan scan -> merge-join with no Exchange and " +
        s"no Sort, got:\n$plan")
    timed(s"spj: storage-partitioned join (no Exchange/Sort asserted, $mult×)")(
      joined().count())
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    timed(s"spj: same join, V2 bucketing OFF (both sides shuffle, $mult×)")(
      joined().count())
    // probe hygiene: drop the staged tables (same walk as Tx.vacuum's)
    val walked = java.nio.file.Files.walk(java.nio.file.Paths.get(base))
    try walked.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(f => java.nio.file.Files.delete(f))
    finally walked.close()
  }

  private def mvFamily(spark: SparkSession, sfDir: String, mult: Int): Unit = {
    val base = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"),
        floor(col("value") * 1e6).cast("long").as("v6"))
    def shifted(r: Int) = base.select(
      (col("event_id") + lit(r * 1000000000L)).as("event_id"),
      (col("ts") + expr(s"INTERVAL ${r * 370} DAYS")).as("ts"), col("v6"))
    val hist = graft.sources.Stage.through(
      (0 until mult).map(shifted).reduce(_ unionByName _))
    val batch = graft.sources.Stage.through(shifted(mult))
    def state(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(date_trunc("hour", col("ts")).as("bucket_h"))
        .agg(count(lit(1)).as("n_rows"), sum("v6").as("sum_v6"),
          min("v6").as("min_v6"), max("v6").as("max_v6"))
    val st0 = graft.sources.Stage.through(state(hist)) // the MV on disk
    println(s"[scale] state size: ${st0.count()} hourly buckets over " +
      s"${mult}× history (${hist.count()} rows); batch = ${batch.count()} rows")
    def timed(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scale] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); n
    }
    val nScratch = timed(s"scratch re-aggregation of history+batch ($mult×)")(
      state(hist.unionByName(batch)).count())
    val nMerge = timed("incremental refresh (batch agg + state merge)")(
      graft.operators.Mv.mergeState(st0, state(batch), Seq("bucket_h"),
        adds = Seq("n_rows", "sum_v6"),
        mins = Seq("min_v6"), maxs = Seq("max_v6")).count())
    require(nScratch == nMerge,
      s"merged state bucket count must equal scratch: $nMerge vs $nScratch")

    // PERSISTED-state variant (q246's operator): state on disk partitioned
    // by day (30·mult day dirs); the batch touches only ITS replica's ~30
    // days. Full-state rewrite = mergeState over everything + rewrite all
    // partitions (the atomic-swap streaming shape) — grows with state
    // depth. Pruned refresh reads + rewrites ONLY touched days — should
    // stay flat as mult grows. Both paths then hold the same row count.
    def statePd(df: org.apache.spark.sql.DataFrame) =
      state(df).withColumn("p_day",
        date_format(col("bucket_h"), "yyyyMMdd").cast("long"))
    val keys = Seq("p_day", "bucket_h")
    val accs = (Seq("n_rows", "sum_v6"), Seq("min_v6"), Seq("max_v6"))
    def freshStatePath(tag: String) = {
      val p = java.nio.file.Files
        .createTempDirectory(s"graft_probe_mvp_$tag").toString + "/state"
      graft.operators.Mv.refreshPartitioned(spark, p, statePd(hist),
        "p_day", keys, accs._1, accs._2, accs._3)
      p
    }
    val pFull = freshStatePath("full")
    val pPruned = freshStatePath("pruned")
    // verification counts run OUTSIDE the timed blocks — listing every
    // partition to count buckets is a probe artifact, not refresh work
    timed("full-state rewrite (merge all + rewrite every partition)") {
      val out = pFull + ".next" // write aside: sources its own input
      graft.operators.Mv.mergeState(spark.read.parquet(pFull),
          statePd(batch), keys, accs._1, accs._2, accs._3)
        .write.partitionBy("p_day")
        .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
      1L
    }
    timed("pruned refresh (touched days only)") {
      graft.operators.Mv.refreshPartitioned(spark, pPruned, statePd(batch),
        "p_day", keys, accs._1, accs._2, accs._3)
      1L
    }
    val nPruned = spark.read.parquet(pPruned).count()
    require(nPruned == nMerge,
      s"pruned-refresh bucket count must equal the merge: $nPruned vs $nMerge")

    // r10: the Tx-table path (q251's operator) under the same state
    // depth — refreshTx folds the batch into only its touched buckets
    // and commits via one manifest CAS, so like the pruned hive refresh
    // it should stay FLAT as state depth grows, while ALSO being atomic
    // and replay-detectable (what the in-place overwrite gives up).
    // bucketed on the DAY alone: the batch's ~30 days prune to ≤30 of
    // 256 buckets; hashing the full (day, hour) key would scatter the
    // batch over every bucket and re-read ALL state
    val pTx = java.nio.file.Files
      .createTempDirectory("graft_probe_mvtx").toString + "/t"
    graft.operators.Mv.refreshTx(spark, pTx, statePd(hist), keys,
      accs._1, accs._2, accs._3, nBuckets = 256, batchId = Some(1L),
      bucketKeys = Seq("p_day"))
    timed("Tx refresh (touched day-buckets + manifest CAS)") {
      graft.operators.Mv.refreshTx(spark, pTx, statePd(batch), keys,
        accs._1, accs._2, accs._3, nBuckets = 256, batchId = Some(2L),
        bucketKeys = Seq("p_day"))
    }
    val nTx = graft.sources.Tx.read(spark, pTx).count()
    require(nTx == nMerge,
      s"Tx-refresh bucket count must equal the merge: $nTx vs $nMerge")
  }

  /** TxTable commit probe — runnable ALONE via
    * `tools/run.sh graft.tools.ScaleProbe <sfDir> <mult> tx`. The base
    * table = `mult` shifted replicas of events in ONE commit (untimed —
    * it sits on disk in production). The measured op: merging a 32-key
    * update batch. With nBuckets=256 the batch touches ≤32 buckets, so
    * the Tx commit reads and rewrites ≤ 32/256 ≈ 12% of the table; the
    * baseline is the reference-shaped full rewrite (anti-join ∪ + write
    * everything, `Merge.upsertToPath`'s IO). Both lines grow with table
    * size (a bucket holds table/256), but the Tx line at ~an eighth the
    * slope — and on a cluster the untouched 224+ buckets cross no
    * network at all. Row-count equality of the two results is require()d.
    */
  /** r12 session 2: the PLAIN streaming read's per-trigger cost must be
    * O(churn) — the snapshot batch is paid ONCE at bootstrap, every
    * later trigger diffs only the span's changed buckets — and the
    * pushed min/max/count(*) must be effectively CONSTANT (manifest +
    * footers, zero column-data IO) while the raw-scan aggregate grows
    * with the table. `tools/run.sh graft.tools.ScaleProbe <sfDir>
    * <mult> sread`.
    */
  private def streamReadFamily(
      spark: SparkSession, sfDir: String, mult: Int): Unit = {
    import spark.implicits._
    val nb = 256
    val base = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        floor(col("value") * 1e6).cast("long").as("v6"))
    val big = graft.sources.Stage.through(
      (0 until mult).map(r => base.select(
        (col("event_id") + lit(r * 1000000000L)).as("event_id"),
        col("user_id"), col("v6"))).reduce(_ unionByName _))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_probe_sr").toString
    val tablePath = s"$dir/t"
    graft.sources.Tx.commitMerge(spark, tablePath, big, Seq("event_id"), nb,
      statsCols = Seq("event_id"))
    println(s"[scale] table: ${big.count()} rows ($mult×), $nb buckets")
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scale] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val drained = new java.util.concurrent.atomic.AtomicLong()
    def drain(): Long = {
      drained.set(0L)
      val q = spark.readStream.format("graft-tx").load(tablePath)
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          drained.addAndGet(df.count())
          ()
        }.start()
      q.awaitTermination()
      drained.get()
    }
    val total = big.count()
    timed("stream bootstrap drain (the snapshot batch, O(table), once)") {
      require(drain() == total, "bootstrap must emit the whole snapshot")
    }
    // one tiny insert commit: the incremental trigger's honest shape
    val tiny = (1L to 4L).map(i => (-i, i, i)).toDF("event_id", "user_id", "v6")
    graft.sources.Tx.commitMerge(spark, tablePath, tiny, Seq("event_id"), nb)
    timed("stream incremental drain (one 4-row insert commit, O(churn))") {
      require(drain() == 4L, "the trigger must emit exactly the inserts")
    }
    // aggregate pushdown: metadata answer vs the raw-scan baseline
    graft.sources.tx.TxReadCounters.reset()
    timed("pushed min/max/count (manifest + footers, zero column IO)") {
      val r = spark.read.format("graft-tx").load(tablePath)
        .agg(min(col("event_id")), max(col("event_id")), count(lit(1)))
        .collect()(0)
      require(r.getLong(2) == total + 4L, s"pushed count: ${r.getLong(2)}")
    }
    require(graft.sources.tx.TxReadCounters.filesOpened() == 0L,
      "the pushed aggregate must not read column data")
    timed("raw-scan aggregate baseline (min/max/count over parquet)") {
      val r = big.agg(min(col("event_id")), max(col("event_id")),
        count(lit(1))).collect()(0)
      require(r.getLong(2) == total)
    }
    // r13 hash pruning: a point lookup on the bucket key computes its
    // ONE bucket from the manifest — cost flat in table size (1/256 of
    // the data read, whatever the mult); the baseline pays the scan
    val probeTag = s"probe-pl-$mult"
    timed("hash-pruned point lookup (= on the bucket key, one bucket)") {
      val r = spark.read.format("graft-tx").option("scanTag", probeTag)
        .load(tablePath).filter(col("event_id") === 77L).collect()
      require(r.length == 1, s"expected the one id-77 row, got ${r.length}")
    }
    val (keptPl, totalPl) = graft.sources.tx.TxScan.lastPlanned(probeTag).get
    require(keptPl == 1,
      s"point lookup must plan ONE of the $totalPl buckets, got $keptPl")
    timed("full-scan lookup baseline (same predicate over raw parquet)") {
      require(big.filter(col("event_id") === 77L).count() == 1L)
    }
  }

  private def txFamily(spark: SparkSession, sfDir: String, mult: Int): Unit = {
    val nb = 256
    val base = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        floor(col("value") * 1e6).cast("long").as("v6"))
    val big = graft.sources.Stage.through(
      (0 until mult).map(r => base.select(
        (col("event_id") + lit(r * 1000000000L)).as("event_id"),
        col("user_id"), col("v6"))).reduce(_ unionByName _))
    val batch = big.filter(col("event_id") % 25013 === 0).limit(32)
      .select(col("event_id"), col("user_id"), (col("v6") + 1).as("v6"))
    val nBatch = batch.count()
    val tablePath = java.nio.file.Files
      .createTempDirectory("graft_probe_tx").toString + "/t"
    graft.sources.Tx.commitMerge(spark, tablePath, big, Seq("event_id"), nb)
    println(s"[scale] table: ${big.count()} rows ($mult×), " +
      s"batch: $nBatch keys over ≤$nBatch of $nb buckets")
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scale] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    timed("Tx commitMerge (touched-bucket rewrite + CAS manifest)") {
      graft.sources.Tx.commitMerge(spark, tablePath, batch, Seq("event_id"), nb)
    }
    val fullPath = java.nio.file.Files
      .createTempDirectory("graft_probe_txf").toString + "/t"
    timed("full rewrite baseline (anti-join ∪ + write ALL rows)") {
      graft.sources.Merge.upsert(big, batch, Seq("event_id"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(fullPath)
    }
    // verification OUTSIDE the timed blocks (listing all dirs is probe
    // artifact, not commit work)
    val nTx = graft.sources.Tx.read(spark, tablePath).count()
    val nFull = spark.read.parquet(fullPath).count()
    require(nTx == nFull, s"row counts must match: $nTx vs $nFull")

    // r10: CHANGE FEED at scale — the incremental consumer's read. A
    // small commit (4 keys → ≤4 of 256 buckets) is the realistic shape;
    // changes(v2, v3) must cost O(those buckets' data), while the
    // no-format baseline (diff the two snapshots end to end) pays a
    // full-table full-outer join that grows with mult. Both must agree
    // on the change count.
    // materialize the four rows ONCE (ordered take) — an unordered
    // limit re-executed for the count and the commit could pick
    // different rows each time
    val tinyRows = big.filter(col("event_id") % 50021 === 0)
      .select(col("event_id"), col("user_id"), (col("v6") + 2).as("v6"))
      .orderBy("event_id").limit(4).collect().toSeq
    val tiny = spark.createDataFrame(
      spark.sparkContext.parallelize(tinyRows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("v6",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val nTiny = tinyRows.size.toLong
    graft.sources.Tx.commitMerge(spark, tablePath, tiny, Seq("event_id"), nb)
    timed(s"Tx.changes v2→v3 (manifest-pruned diff, ≤$nTiny buckets)") {
      val n = graft.sources.Tx.changes(spark, tablePath, 2L, 3L).count()
      require(n == nTiny, s"feed must carry exactly the tiny batch: $n")
    }
    timed("full-diff baseline (full-outer join of both snapshots)") {
      val a = graft.sources.Tx.read(spark, tablePath, 2L)
        .select(col("event_id"), col("user_id").as("u_a"), col("v6").as("v6_a"))
      val b = graft.sources.Tx.read(spark, tablePath, 3L)
        .select(col("event_id"), col("user_id").as("u_b"), col("v6").as("v6_b"))
      val n = a.join(b, Seq("event_id"), "full_outer")
        .filter(!(col("v6_a") <=> col("v6_b")) || !(col("u_a") <=> col("u_b")))
        .count()
      require(n == nTiny, s"baseline diff must match the feed: $n")
    }

    // r12: BIG-churn feed — the columnar bucket-local diff vs the
    // join-based Tx.changes when ~half the table changed (every bucket
    // touched, so manifest pruning is no help and the diff itself is
    // the cost). The DSv2 feed pays one vectorized scan stage with
    // zero exchange; changes() pays a full-outer shuffle of both
    // sides. Both must agree on the change count.
    val halfChurn = big.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("user_id"), (col("v6") + 7).as("v6"))
    graft.sources.Tx.commitMerge(spark, tablePath, halfChurn,
      Seq("event_id"), nb)
    var nFeed = 0L; var nJoin = 0L
    timed("BIG churn v3→v4: DSv2 columnar bucket-local feed") {
      nFeed = spark.read.format("graft-tx")
        .option("readChangeFeed", true)
        .option("fromVersion", 3L).option("toVersion", 4L)
        .load(tablePath).count()
    }
    timed("BIG churn v3→v4: Tx.changes full-outer join diff") {
      nJoin = graft.sources.Tx.changes(spark, tablePath, 3L, 4L).count()
    }
    require(nFeed == nJoin && nFeed > 0,
      s"the two diffs must agree at scale: $nFeed vs $nJoin")

    // r10: ZONE-MAP SKIP READ at growing per-day volume — 32 fixed days,
    // rows per day grow with mult. The pruning decision is O(manifest)
    // (no file listing, no footer reads) and the read touches only the
    // matching days' buckets, so the skip read stays ~days/range cheaper
    // than the full scan at every table size.
    val zDays = 32
    val zPath = java.nio.file.Files
      .createTempDirectory("graft_probe_txz").toString + "/t"
    val zBig = big.select(
      pmod(col("event_id"), lit(zDays)).cast("long").as("day"),
      col("event_id"), col("v6"))
    timed(s"land day-bucketed table w/ zone maps ($mult× rows, $zDays days)") {
      graft.sources.Tx.commitMerge(spark, zPath, zBig,
        Seq("day", "event_id"), 64, bucketKeys = Seq("day"),
        statsCols = Seq("day"))
    }
    val (zKept, zTotal) = graft.sources.Tx.pruneInfo(zPath, "day", 10L, 13L)
    println(s"[scale] zone maps keep ${zKept.size}/${zTotal.size} buckets " +
      s"for a 4/$zDays-day range")
    var nSkip = 0L; var nScan = 0L
    timed("skip read: 4-day range via readRange") {
      nSkip = graft.sources.Tx.readRange(spark, zPath, "day", 10L, 13L).count()
    }
    timed("full-scan baseline: read every bucket + filter") {
      nScan = graft.sources.Tx.read(spark, zPath)
        .filter(col("day").between(10L, 13L)).count()
    }
    require(nSkip == nScan && nSkip > 0,
      s"skip read must equal the full-scan filter: $nSkip vs $nScan")
    // r11: the SAME pruned read through the standard DSv2 surface — a
    // plain filter over spark.read.format("graft-tx") must plan exactly
    // the kept buckets and return the same rows, at every table size
    var nV2 = 0L
    timed("skip read: 4-day range via DSv2 pushdown (graft-tx)") {
      val scan = spark.read.format("graft-tx").load(zPath)
        .filter(col("day").between(10L, 13L))
      require(scan.rdd.getNumPartitions == zKept.size,
        s"DSv2 must plan one partition per kept bucket: " +
          s"${scan.rdd.getNumPartitions} vs ${zKept.size}")
      nV2 = scan.count()
    }
    require(nV2 == nScan,
      s"DSv2 pruned read must equal the full-scan filter: $nV2 vs $nScan")

    // r12: PER-FILE zone maps inside DEEP buckets — the shape bucket
    // pruning can't help: nBuckets=4, so every bucket holds ~8 of the
    // 32 days and a 2-day probe keeps ALL buckets. The sorted layout
    // (fileSortCols=day, ~1/32 of the table per file) records per-file
    // day ranges in .zones; the same probe then opens only the files
    // whose zone intersects. Both reads must agree; the opened-file
    // counts are printed as the IO observable.
    val fzSorted = java.nio.file.Files
      .createTempDirectory("graft_probe_fzs").toString + "/t"
    val fzPlain = java.nio.file.Files
      .createTempDirectory("graft_probe_fzp").toString + "/t"
    val fzRows = zBig.count()
    timed(s"land DEEP-bucket table, sorted layout ($mult× rows, 4 buckets)") {
      graft.sources.Tx.commitMerge(spark, fzSorted, zBig,
        Seq("day", "event_id"), 4, bucketKeys = Seq("day"),
        statsCols = Seq("day"), fileSortCols = Seq("day"),
        maxRowsPerFile = math.max(fzRows / 32L, 1L))
    }
    graft.sources.Tx.commitMerge(spark, fzPlain, zBig,
      Seq("day", "event_id"), 4, bucketKeys = Seq("day"),
      statsCols = Seq("day"))
    var nFz = 0L; var nFzBase = 0L
    graft.sources.tx.TxReadCounters.reset()
    timed("2-day probe, sorted layout (per-file .zones skipping)") {
      nFz = spark.read.format("graft-tx").load(fzSorted)
        .filter(col("day").between(10L, 11L)).count()
    }
    val fzOpened = graft.sources.tx.TxReadCounters.filesOpened()
    graft.sources.tx.TxReadCounters.reset()
    timed("2-day probe, one-file buckets (kept buckets read whole)") {
      nFzBase = spark.read.format("graft-tx").load(fzPlain)
        .filter(col("day").between(10L, 11L)).count()
    }
    val fzBaseOpened = graft.sources.tx.TxReadCounters.filesOpened()
    require(nFz == nFzBase && nFz > 0,
      s"file skipping must not change results: $nFz vs $nFzBase")
    // the honest IO metric is BYTES: the plain layout's 4 files ARE the
    // whole table, the sorted layout's opened files are day slices
    def tableBytes(p: String, opened: Long, label: String): Unit = {
      val snap = graft.sources.Tx.latest(p).get
      val sizes = snap.dirs.values.toSeq.flatMap { rel =>
        val fs = new java.io.File(s"$p/$rel").listFiles()
        if (fs == null) Nil
        else fs.toSeq.filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .map(_.length())
      }.sorted
      val total = sizes.sum
      // opened files are the smallest `opened` slices at worst for the
      // sorted layout (uniform chunks), the whole table for plain
      val avg = if (sizes.nonEmpty) total / sizes.length else 0L
      println(s"[scale] $label: opened $opened of ${sizes.length} files " +
        f"(~${avg * opened * 100.0 / math.max(total, 1)}%.0f%% of " +
        s"$total bytes)")
    }
    tableBytes(fzSorted, fzOpened, "per-file zones, sorted layout")
    tableBytes(fzPlain, fzBaseOpened, "one-file buckets baseline")

    // r10: vacuum + time travel at DEPTH — a long-lived table accretes
    // one manifest + one commit dir per batch; retention has to retire
    // them in time O(history) listing + O(retired files) deletes, and a
    // PINNED read within the kept window must be byte-stable across the
    // vacuum. Depth scales with mult (4×mult commits — 32/128/512 at
    // 8×/32×/128×), each commit a small batch on a small table so the
    // probe times the FORMAT's bookkeeping, not parquet IO.
    val deepPath = java.nio.file.Files
      .createTempDirectory("graft_probe_txd").toString + "/t"
    val depth = 4 * mult
    val t0 = System.nanoTime()
    for (i <- 1 to depth) {
      val b = spark.range(1).select(
        lit(i % 64).cast("long").as("event_id"),
        lit(i).cast("long").as("user_id"),
        lit(i).cast("long").as("v6"))
      graft.sources.Tx.commitMerge(spark, deepPath, b, Seq("event_id"), 16)
    }
    println(f"[scale] deep history: $depth commits in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
      f"(${(System.nanoTime() - t0) / 1e6 / depth}%.0f ms/commit)")
    val pinned = depth - 3L // inside the keep=8 window
    def pinnedRows() = graft.sources.Tx.read(spark, deepPath, pinned)
      .orderBy("event_id").collect().toSeq
    val beforeVac = pinnedRows()
    timed(s"resolve versions at depth $depth") {
      require(graft.sources.Tx.versions(deepPath).size == depth)
    }
    timed(s"vacuum keep=8 over $depth versions") {
      graft.sources.Tx.vacuum(deepPath, keepVersions = 8,
        minOrphanAgeMs = 0L)
    }
    require(graft.sources.Tx.versions(deepPath).size == 8)
    require(pinnedRows() == beforeVac,
      "a pinned read inside the kept window must be stable across vacuum")
    println(s"[scale] pinned v$pinned stable across vacuum " +
      s"(${beforeVac.size} rows)")
  }

  /** See the r9 comment in main — runnable ALONE (skipping every earlier
    * family) via `tools/run.sh graft.tools.ScaleProbe <sfDir> <mult> bktjoin`.
    */
  private def bucketedJoinFamily(spark: SparkSession, sfDir: String, mult: Int): Unit = {
    locally {
      val nb = 32 // thousands on a cluster; fixed across mults so the
                  // per-bucket volume, like a real cluster's, grows with data
      val shift = 100000000L
      val liBig = graft.sources.Stage.through {
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select("l_orderkey", "l_extendedprice", "l_discount")
        (0 until mult).map(r => li.select(
          (col("l_orderkey") + lit(r * shift)).as("l_orderkey"),
          col("l_extendedprice"), col("l_discount"))).reduce(_ unionByName _)
      }
      val orBig = graft.sources.Stage.through {
        val o = spark.read.parquet(s"$sfDir/orders.parquet")
          .select("o_orderkey", "o_orderpriority")
        (0 until mult).map(r => o.select(
          (col("o_orderkey") + lit(r * shift)).as("o_orderkey"),
          col("o_orderpriority"))).reduce(_ unionByName _)
      }
      for (t <- Seq("graft_sp_lineitem", "graft_sp_orders"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
      // ONE file per bucket: repartition on the bucket key (same murmur3
      // hash mod nb as the bucket assignment) so each writer task owns
      // exactly one bucket. Without this, every writer task emits a file
      // per bucket it sees (tasks × buckets small files — the classic
      // bucketed-write mistake) and the read side must merge several
      // sorted files per bucket, paying a per-bucket Sort that erases the
      // sortBy. This is the layout discipline a 100 TB landing needs too.
      val tWrite = {
        val t0 = System.nanoTime()
        liBig.repartition(nb, col("l_orderkey"))
          .write.mode("overwrite").bucketBy(nb, "l_orderkey")
          .sortBy("l_orderkey").saveAsTable("graft_sp_lineitem")
        orBig.repartition(nb, col("o_orderkey"))
          .write.mode("overwrite").bucketBy(nb, "o_orderkey")
          .sortBy("o_orderkey").saveAsTable("graft_sp_orders")
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scale] bucketed layout write (both facts): $tWrite%.1f s")
      def agg(j: org.apache.spark.sql.DataFrame) = j
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      def timed(name: String)(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime(); val n = f
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[scale] $name: $t%.1f s"); (t, n)
      }
      // With ONE file per bucket the sortBy order is the scan order, and
      // this legacy flag lets the scan REPORT it so the per-bucket Sort
      // above each FileScan is elided (Spark default-disables it because
      // multi-file buckets would need a merge; our write discipline
      // guarantees single files). The true storage-partitioned join:
      // scan → merge-join, no Sort, no Exchange.
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val bktJoin = spark.table("graft_sp_lineitem").hint("merge")
        .join(spark.table("graft_sp_orders"), col("l_orderkey") === col("o_orderkey"))
      val plan = bktJoin.queryExecution.executedPlan.toString
      require(plan.contains("SortMergeJoin"),
        s"bucketed probe join must sort-merge, got:\n$plan")
      require(!plan.contains("Exchange"),
        s"bucketed probe layout must elide every exchange, got:\n$plan")
      // "Sort [" matches only Sort operators (SortMergeJoin prints with
      // no space) — single-file sorted buckets + the reported ordering
      // must elide the per-bucket sorts too: scan → merge-join, nothing
      // between.
      require(!plan.contains("Sort ["),
        s"bucketed probe layout must elide every sort, got:\n$plan")
      val (tBkt, nBkt) = timed(s"bucketed SMJ (zero exchange asserted, $mult×)")(
        agg(bktJoin).count())
      if (sys.env.contains("GRAFT_PROBE_PLANS")) {
        println("[scale] bucketed plan:\n" + agg(bktJoin).queryExecution.executedPlan)
        println("[scale] shuffle plan:\n" + agg(liBig.hint("merge")
          .join(orBig, col("l_orderkey") === col("o_orderkey")))
          .queryExecution.executedPlan)
      }
      val (tShf, nShf) = timed(s"shuffle SMJ baseline ($mult×)")(
        agg(liBig.hint("merge")
          .join(orBig, col("l_orderkey") === col("o_orderkey"))).count())
      require(nBkt == nShf, s"bucketed vs shuffle group counts differ: $nBkt vs $nShf")
      val saved = tShf - tBkt
      println(f"[scale] bucketed join amortization: write $tWrite%.1f s / "
        + f"saved $saved%.1f s per join ⇒ breakeven ≈ "
        + (if (saved > 0) f"${tWrite / saved}%.1f joins" else "n/a (no saving at this SF)"))
    }
  }
}
