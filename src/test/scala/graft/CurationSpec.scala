package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Text
import graft.operators.{QualitySignals, Sampling, Scrub, TextDedup}

/** Curation operators: PII scrub, containment pairs, epoch mixing, and the
  * chunking invariants behind q89–q93.
  */
class CurationSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("redactPii replaces emails, urls and phones; counts match") {
    val df = Seq(
      (1L, "mail me at jo.do+x@ex-amp.le.org or visit https://a.b/c_d now"),
      (2L, "call +1-555-0199 or +44-202-7946 plain text"),
      (3L, "no pii here at all")).toDF("id", "text")
    val out = df.select($"id",
      Scrub.countMatches($"text", Scrub.EmailRe).as("ne"),
      Scrub.countMatches($"text", Scrub.UrlRe).as("nu"),
      Scrub.countMatches($"text", Scrub.PhoneRe).as("np"),
      Scrub.redactPii($"text").as("red")).orderBy("id").collect()
    assert(out(0) === Row(1L, 1L, 1L, 0L, "mail me at <EMAIL> or visit <URL> now"))
    assert(out(1) === Row(2L, 0L, 0L, 2L, "call <PHONE> or <PHONE> plain text"))
    assert(out(2) === Row(3L, 0L, 0L, 0L, "no pii here at all"))
  }

  test("q101: decision tables are committed sink scans, not persisted frames") {
    // funnelFlags references the released corpus ~7×; if the decision
    // frames' lineage were not truncated, every reference would re-run the
    // CC loop / gram join (measured q101 5.4 → 12 s when the stage first
    // landed). A release run COMMITS its decisions between stages, so both
    // frames now come back from the partitioned sink: the plan's leaves
    // must include the dedup_decisions and contamination_decisions parquet
    // relations, no LogicalRDD checkpoint leaves remain, and after
    // building the plan the query holds NO persisted RDDs.
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    // other suites share this session and may legitimately hold persisted
    // frames — assert q101 adds none of its OWN, not that the session is
    // globally clean
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val df = SparkEntry.queries("q101_release_manifest")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan
    val scanPaths = plan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.mkString(",")
        case _ => ""
      }
    }
    assert(scanPaths.exists(_.contains("dedup_decisions")),
      s"dedup (CC label) decisions must be read back from the committed sink; scans: $scanPaths")
    assert(scanPaths.exists(_.contains("contamination_decisions")),
      s"contamination decisions must be read back from the committed sink; scans: $scanPaths")
    assert(!plan.toString.contains("LogicalRDD"),
      "no checkpoint leaf should remain in the release pipeline plan")
    val added = spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore
    assert(added.isEmpty,
      s"release pipeline must not leave persisted RDDs behind; added ids: $added")
  }

  test("redaction leaves no residual matches") {
    val df = Seq("a@b.co sees https://x.y/z and +1-123-4567").toDF("text")
    val red = df.select(Scrub.redactPii($"text").as("t"))
    val counts = red.select(
      Scrub.countMatches($"t", Scrub.EmailRe) +
        Scrub.countMatches($"t", Scrub.UrlRe) +
        Scrub.countMatches($"t", Scrub.PhoneRe)).as[Long].head()
    assert(counts === 0L)
  }

  test("containmentPairs flags subset docs that Jaccard misses") {
    // b's shingles ⊂ a's (containment 1.0) but Jaccard = 3/7 < 0.5.
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"), // 7 trigram shingles
      (2L, "w1 w2 w3 w4 w5"), //              3 shingles, all in doc 1
      (3L, "x1 x2 x3 x4 x5")).toDF("doc_id", "text")
      .withColumn("toks", Text.tokens($"text"))
      .withColumn("shash", TextDedup.shingleHashes("toks", 3))
    val cont = TextDedup.containmentPairs(docs, "doc_id", "shash", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.toSeq === Seq((1L, 2L, 1.0)))
    val jac = TextDedup.jaccardPairs(docs, "doc_id", "shash", 0.5)
    assert(jac.count() === 0L)
  }

  test("epochMix: integer weights repeat exactly, zero drops, fraction is deterministic") {
    val df = (0L until 400L).map(i => (i, if (i % 4 == 0) "a" else if (i % 4 == 1) "b" else if (i % 4 == 2) "z" else "d"))
      .toDF("id", "src")
    val out = Sampling.epochMix(df, $"id", $"src",
      weights = Map("a" -> 2.0, "b" -> 0.0, "z" -> 0.5), default = 1.0)
    val bySrc = out.groupBy("src").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("a") === 200L) //                  exactly 2 copies each
    assert(!bySrc.contains("b")) //                 weight 0 = dropped
    assert(bySrc("d") === 100L) //                  default 1.0 = identity
    assert(bySrc("z") > 20L && bySrc("z") < 80L) // ~half kept, hash-decided
    // determinism: same input → byte-identical sample
    val again = Sampling.epochMix(df, $"id", $"src",
      weights = Map("a" -> 2.0, "b" -> 0.0, "z" -> 0.5), default = 1.0)
    assert(out.exceptAll(again).count() === 0L && again.exceptAll(out).count() === 0L)
  }

  test("epochMix fractional copies are a subset rule: w=2.5 contains every w=2.0 row") {
    val df = (0L until 100L).map(i => (i, "a")).toDF("id", "src")
    val base = Sampling.epochMix(df, $"id", $"src", Map("a" -> 2.0), 1.0)
    val more = Sampling.epochMix(df, $"id", $"src", Map("a" -> 2.5), 1.0)
    assert(base.exceptAll(more).count() === 0L)
    assert(more.count() > base.count())
  }

  test("weightedHashSample: rate tracks the per-row weight; edges exact") {
    val d = (0L until 4000L).toDF("id")
    def kept(w: Int) = Sampling.weightedHashSample(
      d.withColumn("w", lit(w.toLong)), $"id", $"w").count().toDouble / 4000
    assert(kept(0) === 0.0, "weight 0 keeps nothing")
    assert(kept(10000) === 1.0, "weight 10000 keeps everything")
    assert(math.abs(kept(2500) - 0.25) < 0.03 && math.abs(kept(7500) - 0.75) < 0.03)
    // monotone per row: raising the weight never evicts a kept row
    val lo = Sampling.weightedHashSample(
      d.withColumn("w", lit(3000L)), $"id", $"w").select("id").as[Long].collect().toSet
    val hi = Sampling.weightedHashSample(
      d.withColumn("w", lit(8000L)), $"id", $"w").select("id").as[Long].collect().toSet
    assert(lo.subsetOf(hi))
    // salted draw is independent of the split draw: fates decorrelated
    val both = d
      .withColumn("split", Sampling.assignSplit($"id", Seq("train" -> 0.5), "rest"))
      .withColumn("w", lit(5000L))
    val keptBySplit = Sampling.weightedHashSample(both, $"id", $"w")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    keptBySplit.values.foreach(n =>
      assert(math.abs(n.toDouble / 1000 - 1.0) < 0.2, s"correlated draws: $keptBySplit"))
  }

  test("hashSampleTarget pins the sample size as the corpus grows") {
    def sample(n: Long) = Sampling.hashSampleTarget(
      (0L until n).toDF("id"), $"id", targetRows = 400L)
    val small = sample(1000L).count()
    val big = sample(16000L).count()
    assert(math.abs(small - 400L) <= 60L, s"small-corpus sample $small far from target")
    assert(math.abs(big - 400L) <= 60L, s"big-corpus sample $big far from target")
    // corpus below the target: keep everything (threshold saturates at 10⁴)
    assert(sample(300L).count() === 300L)
    // the kept set is always a hashSample slice: membership is the same
    // md5 bucket, only the derived threshold moves
    val derived = sample(16000L).select("id").as[Long].collect().toSet
    val explicit = Sampling.hashSample((0L until 16000L).toDF("id"), $"id", 0.025)
      .select("id").as[Long].collect().toSet
    assert(derived === explicit, "derived rate must equal the 10⁻⁴-grid explicit rate")
  }

  test("auditWeightRange surfaces out-of-contract weights the sample itself hides") {
    val rows = Seq[(Long, java.lang.Long)](
      (1L, 5000L), (2L, null), (3L, -20L), (4L, 10001L), (5L, 10000L))
      .toDF("id", "w")
    val audit = Sampling.auditWeightRange(rows, $"w").collect()(0)
    assert(audit.getLong(0) === 5L) //  n_rows
    assert(audit.getLong(1) === 1L) //  null
    assert(audit.getLong(2) === 1L) //  negative
    assert(audit.getLong(3) === 1L) //  above grid (10000 itself is in contract)
  }

  test("assignSplit partitions every row exactly once and is growth-stable") {
    val small = (0L until 500L).toDF("id")
      .withColumn("split", Sampling.assignSplit($"id", Seq("train" -> 0.9, "val" -> 0.05), "test"))
    // total partition: every row gets exactly one label
    assert(small.filter(!$"split".isin("train", "val", "test")).count() === 0L)
    val frac = small.filter($"split" === "train").count().toDouble / 500
    assert(frac > 0.8 && frac < 0.97) // ~90% hash-decided
    // growth stability: the first 500 ids keep their splits inside a 5000-row corpus
    val big = (0L until 5000L).toDF("id")
      .withColumn("split2", Sampling.assignSplit($"id", Seq("train" -> 0.9, "val" -> 0.05), "test"))
    val moved = small.join(big, "id").filter($"split" =!= $"split2")
    assert(moved.count() === 0L)
  }

  test("curation operators are shuffle-free projections (scale shape)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val docs = SparkFixture.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      var n = 0
      df.queryExecution.executedPlan.foreach {
        case _: ShuffleExchangeExec => n += 1
        case p: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          p.executedPlan.foreach { case _: ShuffleExchangeExec => n += 1; case _ => }
        case _ => ()
      }
      n
    }
    // PII scrub: pure projection over the scan
    assert(shuffles(docs.select($"doc_id", Scrub.redactPii($"text"))) === 0)
    // chunking: HOF projection + generate, still no exchange
    val W = 64
    assert(shuffles(docs.select($"doc_id",
      posexplode(transform(
        sequence(lit(0), floor((size(Text.tokens($"text")) - 1) / W).cast("int")),
        i => lit(1))))) === 0)
    // epoch mixing: explode + codegen'd filter, map-side row multiplication
    assert(shuffles(Sampling.epochMix(
      docs.select("doc_id", "source"), $"doc_id", $"source",
      Map("src0" -> 2.5), 1.0)) === 0)
  }

  test("repetitionSignals: planted repetition flips keep; clean text passes") {
    // doc 1: 25 distinct words — top 2-gram appears once, no dup 5-grams.
    // doc 2: the same 5-word phrase ×6 — every gram duplicated, fails both.
    // doc 3: one word — no grams at all, zero signals, trivially kept.
    val clean = (1 to 25).map(i => s"w$i").mkString(" ")
    val loop = Seq.fill(6)("alpha beta gamma delta eps").mkString(" ")
    val df = Seq((1L, clean), (2L, loop), (3L, "solo")).toDF("doc_id", "text")
    val out = QualitySignals.repetitionSignals(df).orderBy("doc_id").collect()
    val clean2 = out(0)
    assert(clean2.getAs[Boolean]("keep"))
    assert(clean2.getAs[Long]("dup5_chars") === 0L)
    val loopy = out(1)
    assert(!loopy.getAs[Boolean]("keep"))
    // "alpha beta" ×6 at 10 chars = 60 > 20% of the 161-char text
    assert(loopy.getAs[Long]("top2_chars") === 60L)
    assert(loopy.getAs[Long]("dup5_chars") > loopy.getAs[Long]("text_chars"))
    val solo = out(2)
    assert(solo.getAs[Boolean]("keep") &&
      solo.getAs[Long]("top2_chars") === 0L && solo.getAs[Long]("dup5_chars") === 0L)
  }

  test("repetitionSignals top-2gram tie-break is deterministic (count desc, gram asc)") {
    // two 2-grams both ×2: "b c" and "c b" — winner must be "b c" (asc)
    val df = Seq((1L, "b c b c b")).toDF("doc_id", "text")
    val out = QualitySignals.repetitionSignals(df).collect().head
    // "b c" ×2 → 2 × 3 chars = 6
    assert(out.getAs[Long]("top2_chars") === 6L)
  }

  test("chunking reassembles to the original token stream") {
    val W = 64
    val docs = SparkFixture.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", Text.tokens($"text").as("toks"))
    val chunks = docs.select($"doc_id", $"toks",
        posexplode(transform(
          sequence(lit(0), floor((size($"toks") - 1) / W).cast("int")),
          i => concat_ws(" ", slice($"toks", i * W + lit(1), lit(W)))))
          .as(Seq("chunk_idx", "chunk")))
    // collect_list order is not guaranteed across a shuffle — sort the
    // (idx, chunk) structs before joining the text back together.
    val rejoined = chunks.groupBy("doc_id")
      .agg(array_sort(collect_list(struct($"chunk_idx", $"chunk"))).as("cs"))
      .select($"doc_id",
        concat_ws(" ", transform($"cs", c => c.getField("chunk"))).as("rebuilt"))
    val diff = docs.select($"doc_id", concat_ws(" ", $"toks").as("orig"))
      .join(rejoined, "doc_id")
      .filter($"orig" =!= $"rebuilt")
    assert(diff.count() === 0L)
    // every chunk holds at most W tokens, and only the last may hold fewer
    val bad = chunks
      .withColumn("n", size(split($"chunk", " ")))
      .withColumn("nch", ceil(size($"toks") / lit(W.toDouble)))
      .filter($"n" > W || ($"n" < W && $"chunk_idx" < $"nch" - 1))
    assert(bad.count() === 0L)
  }

  test("balancedSampleByGroup: small groups keep everything, big groups cut to target") {
    import graft.operators.Sampling
    val df = ((1 to 1000).map(i => (i.toLong, "big")) ++
      (2001 to 2005).map(i => (i.toLong, "small"))).toDF("id", "g")
    val out = Sampling.balancedSampleByGroup(df, $"g", $"id", targetRows = 10L)
      .collect().groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    // a group at-or-under target keeps every row (threshold caps at 10000)
    assert(out("small") == (2001L to 2005L).toSet)
    // the big group is cut to ~target (md5-uniform: 1% of 1000)
    assert(out("big").size < 50 && out("big").nonEmpty)
    // membership is the hashBucket predicate, not RNG
    val th = 10000L * 10 / 1000
    val expected = (1 to 1000).filter { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 10000 < th
    }.map(_.toLong).toSet
    assert(out("big") == expected)
  }

  test("balancedSampleByGroup: one group's sample is unchanged when another grows") {
    import graft.operators.Sampling
    val base = (1 to 400).map(i => (i.toLong, if (i <= 200) "a" else "b"))
    val grown = base ++ (401 to 800).map(i => (i.toLong, "b"))
    def sampleA(rows: Seq[(Long, String)]) =
      Sampling.balancedSampleByGroup(rows.toDF("id", "g"), $"g", $"id", 20L)
        .filter($"g" === "a").collect().map(_.getLong(0)).toSet
    assert(sampleA(base) == sampleA(grown))
  }

  test("isqrt is exact floor(sqrt) across perfect-square boundaries") {
    import graft.operators.Sampling
    val xs = ((0L to 2000L) ++
      Seq(25L, 26L, 10000000000L, 10000000001L, 9999999999L,
        (1L << 26) * (1L << 26), (1L << 26) * (1L << 26) - 1)).distinct
    val out = xs.toDF("x").select($"x", Sampling.isqrt($"x").as("r")).collect()
    out.foreach { row =>
      val (x, r) = (row.getLong(0), row.getLong(1))
      assert(r * r <= x && (r + 1) * (r + 1) > x, s"isqrt($x) = $r wrong")
    }
  }

  test("temperatureTargets flattens the head and lifts the tail") {
    import graft.operators.Sampling
    // strata: big=900 rows, small=100 rows (raw shares 90% / 10%)
    val df = ((1 to 900).map(i => (i.toLong, "big")) ++
      (901 to 1000).map(i => (i.toLong, "small"))).toDF("id", "stratum")
    val t = Sampling.temperatureTargets(df, $"stratum", targetRows = 100L)
      .collect().map(r => r.getAs[String]("stratum") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("w_fp"),
          r.getAs[Long]("target_rows"), r.getAs[Long]("threshold"))).toMap
    // sqrt weights: 30000 vs 10000 -> shares 75% / 25% (raw was 90/10)
    assert(t("big")._2 == 30000L && t("small")._2 == 10000L)
    assert(t("big")._3 == 75L && t("small")._3 == 25L)
    // small stratum's target share (25%) exceeds its raw share (10%)
    assert(t("small")._3 * 1000 > 100L * t("small")._1)
    // thresholds on the integer grid, capped
    assert(t.values.forall(v => v._4 >= 0 && v._4 <= 10000))
    // floor allocation never over-fills
    assert(t.values.map(_._3).sum <= 100L)
  }
}
