package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.operators.TextDedup
import graft.sources.Tables

/** Content-based deduplication over `documents` (builder contract: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard). The sf0.01 corpus has no exact
  * duplicates, so each query runs on a deterministically augmented corpus —
  * perturbed copies (`doc_id+100000`, first 14 chars dropped) and exact
  * copies (`doc_id+200000`) — constructed identically in the oracle SQL.
  */
object DedupQueries {

  type Q = (SparkSession, String) => DataFrame

  /** documents ∪ near-copies (doc_id%7==0) ∪ exact copies (doc_id%13==0). */
  private def augmented(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    d.unionByName(
        d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), expr("substring(text, 15)").as("text")))
      .unionByName(
        d.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 200000).as("doc_id"), col("text")))
  }

  private val AugSql =
    """aug AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 100000, substr(text, 15) FROM documents WHERE doc_id % 7 = 0
        UNION ALL SELECT doc_id + 200000, text FROM documents WHERE doc_id % 13 = 0)"""

  /** Distinct word-trigram shingles per doc (both engines drop docs with
    * fewer than 3 tokens — none exist in this corpus). Parameterized on the
    * source CTE so q118 can shingle a hash-sampled slice of `aug`.
    */
  private def shinglesSqlFrom(src: String): String =
    s"""sh AS (SELECT doc_id, toks,
         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                        for i in range(1, greatest(len(toks) - 1, 1))]) AS shingles
       FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM $src))"""

  private val ShinglesSql = shinglesSqlFrom("aug")

  /** DuckDB twin of [[graft.operators.Sampling.hashBucket]]. */
  private def bucketSql(key: String): String =
    s"('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 8))::BIGINT % 10000"

  private def withShingles(df: DataFrame): DataFrame =
    df.withColumn("toks", Text.tokens(col("text")))
      .withColumn("shingles", TextDedup.shingles(col("toks"), 3))
      .withColumn("shash", TextDedup.shingleHashes("toks", 3))

  /** Distinct 32-bit shingle hashes from per-token md5 hashes (mirrors
    * [[TextDedup.shingleHashes]]: fold h·8191 + H32(token), mod 2³²).
    */
  private val HashesSql =
    """hashed AS (SELECT doc_id, shingles,
         list_distinct([((th[i]*8191 + th[i+1]) % 4294967296 * 8191 + th[i+2]) % 4294967296
                        for i in range(1, greatest(len(th) - 1, 1))]) AS hs
       FROM (SELECT doc_id, shingles,
               [('0x' || substr(md5(t), 1, 8))::BIGINT for t in toks] AS th
             FROM sh))"""

  /** The q176 prefix-filter join pipeline as a reusable CTE chain ending
    * in `ppairs` (doc_a, doc_b, common, na, nb): global rarest-first rank,
    * per-doc prefix p = n−⌈0.7n⌉+1, prefix-postings candidates, exact
    * integer verify at J ≥ 7/10.
    */
  private val PrefixPairsSql =
    """docs AS (SELECT doc_id AS doc, hs FROM hashed WHERE len(hs) > 0),
       ex AS (SELECT doc, len(hs) AS n, unnest(hs) AS h FROM docs),
       rk AS (SELECT h, row_number() OVER (ORDER BY count(*), h) AS rank
              FROM ex GROUP BY h),
       pre AS (SELECT doc, h FROM (SELECT ex.doc, ex.h, ex.n, rk.rank
                 FROM ex JOIN rk USING (h))
               QUALIFY row_number() OVER (PARTITION BY doc ORDER BY rank)
                 <= n - (7 * n + 9) // 10 + 1),
       cand AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
                FROM pre a JOIN pre b ON a.h = b.h AND a.doc < b.doc),
       ver AS (SELECT c.doc_a, c.doc_b, ea.n AS na, eb.n AS nb,
                 count(*) AS common
               FROM cand c
               JOIN ex ea ON ea.doc = c.doc_a
               JOIN ex eb ON eb.doc = c.doc_b AND eb.h = ea.h
               GROUP BY c.doc_a, c.doc_b, ea.n, eb.n),
       ppairs AS (SELECT doc_a, doc_b, common, na, nb FROM ver
                  WHERE 10 * common >= 7 * (na + nb - common))"""

  /** MinHash signature from base hashes: k=8 universal-hash permutations. */
  private val SigSql =
    """[list_min([(h * (2*i + 1) + i * 2654435761) % 4294967296 for h in hs])
       for i in range(0, 8)]"""

  val queries: Map[String, Q] = Map(
    // Exact dedup: normalize (lowercase / strip punctuation / collapse
    // whitespace) then content-hash canonical mapping, listed dups only.
    // Contamination HALO: decontamination (q68) flags train docs that
    // share eval n-grams — but a train doc that is a NEAR-DUP of a
    // flagged doc is just as suspect even with zero direct gram overlap.
    // Two BFS rounds over the train-side near-dup graph from the flagged
    // seeds: hop 0 = direct hits, hop 1/2 = transitively suspect. Each
    // frontier is a distinct + anti-join on the staged edge list —
    // bounded rounds, no recursive driver loop.
    "q210_contamination_halo" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      // train = the augmented corpus (originals + planted near/exact
      // copies) minus eval-fold originals — so a COPY of a flagged doc
      // can sit in the halo without being flagged itself
      val train = augmented(s, dir).filter((col("doc_id") % 100000L) % 37 =!= 0)
      // the seed set (gram join) and the near-dup edge list (prefix join)
      // are independent decision tables — stage them CONCURRENTLY (guide
      // §2.6: overlap independent jobs so the shorter staging back-fills
      // cores the longer one leaves idle in its tail)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val seedsF = Future(graft.sources.Stage.through(
        TextDedup.contaminationPairs(train, docs.filter(col("doc_id") % 37 === 0),
          "doc_id", "text", n = 3, minShared = 2)
          .select(col("train_id").as("doc_id")).distinct()))
      val pairsF = Future(graft.sources.Stage.through(
        TextDedup.prefixFilterJaccardPairs(
          withShingles(train), "doc_id", "shash", tNum = 7, tDen = 10)
          .select("doc_a", "doc_b")))
      val seeds = Await.result(seedsF, Duration.Inf)
      val pairs = Await.result(pairsF, Duration.Inf)
      val und = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
        .unionByName(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      val h1 = und.join(seeds.withColumnRenamed("doc_id", "a"), "a")
        .select(col("b").as("doc_id")).distinct()
        .join(seeds, Seq("doc_id"), "left_anti")
      val f1 = graft.sources.Stage.through(seeds.unionByName(h1))
      val h2 = und.join(f1.withColumnRenamed("doc_id", "a"), "a")
        .select(col("b").as("doc_id")).distinct()
        .join(f1, Seq("doc_id"), "left_anti")
      def hopRow(df: DataFrame, hop: Int) =
        df.agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
          .select(lit(hop).as("hop"), col("n_docs"), col("min_doc"))
      hopRow(seeds, 0).unionByName(hopRow(h1, 1)).unionByName(hopRow(h2, 2))
        .orderBy("hop")
    }),
    // Cross-source duplication matrix: every exact/near pair mapped back
    // to its ORIGINAL documents' sources (planted copies fold to their
    // origin via doc_id mod 100000) and rolled up per unordered source
    // pair, self-copies split out — the provenance-overlap table that
    // tells a curator WHICH feeds plagiarize each other vs merely
    // re-publish themselves.
    "q204_cross_source_pairs" -> ((s, dir) => {
      val pairs = TextDedup.prefixFilterJaccardPairs(
        withShingles(augmented(s, dir)), "doc_id", "shash", tNum = 7, tDen = 10)
      val src = Tables.documents(s, dir).select(col("doc_id").as("__o"), col("source"))
      pairs
        .withColumn("oa", col("doc_a") % 100000L)
        .withColumn("ob", col("doc_b") % 100000L)
        .join(src.select(col("__o").as("oa"), col("source").as("source_a")), "oa")
        .join(src.select(col("__o").as("ob"), col("source").as("source_b")), "ob")
        .select(
          least(col("source_a"), col("source_b")).as("source_lo"),
          greatest(col("source_a"), col("source_b")).as("source_hi"),
          (col("oa") === col("ob")).as("self_copy"))
        .groupBy("source_lo", "source_hi")
        .agg(count(lit(1)).as("n_pairs"), count_if(col("self_copy")).as("n_self_copies"))
        .orderBy("source_lo", "source_hi")
    }),
    // Cascade-dedup funnel: the production three-stage pipeline measured
    // stage-by-stage ON EACH STAGE'S SURVIVORS — length floor → exact
    // content dedup → near-dup CC canonicalization (prefix-join pairs
    // computed only over what exact dedup kept). The per-stage
    // (n_in, n_removed, n_out) rows are the curation dashboard's funnel;
    // ordering stages cheap-to-expensive is what makes the cascade
    // affordable — each stage shrinks the next one's input.
    "q202_dedup_cascade" -> ((s, dir) => {
      val aug = augmented(s, dir)
      val s0 = aug.filter(length(col("text")) >= 120)
      // staged: s1 feeds the shingle pipeline, two stage counters, and
      // the final anti-join — one exact-dedup window pass, four scans
      val s1 = graft.sources.Stage.through(
        TextDedup.exactCanonical(
          s0.withColumn("__norm", Text.normalize(col("text")))
            .withColumnRenamed("text", "__orig").withColumnRenamed("__norm", "text"),
          "doc_id", "text")
          .filter(!col("is_dup"))
          .select(col("doc_id"), col("__orig").as("text")))
      val pairs = TextDedup.prefixFilterJaccardPairs(
        withShingles(s1), "doc_id", "shash", tNum = 7, tDen = 10)
      val labels = TextDedup.connectedComponentsStar(pairs, "doc_a", "doc_b")
      val s2drop = labels.filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
      def stage(name: String, nIn: DataFrame, nOut: DataFrame): DataFrame =
        nIn.agg(count(lit(1)).as("n_in"))
          .crossJoin(nOut.agg(count(lit(1)).as("n_out")))
          .select(lit(name).as("stage"), col("n_in"),
            (col("n_in") - col("n_out")).as("n_removed"), col("n_out"))
      stage("s0_length", aug, s0)
        .unionByName(stage("s1_exact", s0, s1))
        .unionByName(stage("s2_neardup", s1,
          s1.join(broadcast(s2drop), Seq("doc_id"), "left_anti")))
        .orderBy("stage")
    }),
    // Cross-language duplicate contamination: content-identical docs
    // tagged with DIFFERENT lang values — mislabeled copies that corrupt
    // per-language stats and mixing weights (a lang-stratified sampler
    // double-counts them). Planted copies (every 17th doc under lang
    // 'xx') make the audit demonstrably fire; one content-hash groupBy.
    "q195_cross_lang_dups" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "lang", "text")
      val aug = d.unionByName(
        d.filter(col("doc_id") % 17 === 0)
          .select((col("doc_id") + 300000).as("doc_id"), lit("xx").as("lang"), col("text")))
      aug.withColumn("__h", md5(Text.normalize(col("text"))))
        .groupBy("__h")
        .agg(count(lit(1)).as("n_docs"), countDistinct(col("lang")).as("n_langs"),
          min(col("doc_id")).as("min_doc"))
        .filter(col("n_docs") > 1 && col("n_langs") > 1)
        .select("min_doc", "n_docs", "n_langs")
        .orderBy("min_doc")
    }),
    "q32_dedup_exact" -> ((s, dir) => {
      TextDedup.exactCanonical(
        augmented(s, dir).withColumn("text", Text.normalize(col("text"))),
        "doc_id", "text")
        .filter(col("is_dup"))
        .select("doc_id", "canonical_id")
        .orderBy("doc_id")
    }),
    // Split-hygiene audit: exact-content duplicate groups whose members
    // land in DIFFERENT train/val/test splits — leakage an id-keyed split
    // cannot see (copies carry new ids, so the md5(id) assignment scatters
    // them across splits). One row per (content group, split); groups
    // entirely inside one split are silent. Composes q32's normalization,
    // q96's split assignment, and one groupBy + same-key window. The
    // explicit repartition on content_hash alone is what makes them share
    // ONE exchange: HashPartitioning(content_hash) satisfies both the
    // aggregate's ClusteredDistribution(content_hash, split) — a subset
    // partitioning co-locates every group — and the window's
    // ClusteredDistribution(content_hash); grouping by (content_hash,
    // split) directly would hash-partition on the PAIR, which the window
    // cannot reuse, inserting a second exchange.
    "q116_split_leakage" -> ((s, dir) => {
      val withSplit = augmented(s, dir)
        .withColumn("text", Text.normalize(col("text")))
        .withColumn("split", graft.operators.Sampling.assignSplit(
          col("doc_id"), Seq("train" -> 0.90, "val" -> 0.05), last = "test"))
      val grouped = withSplit
        .select(md5(col("text")).as("content_hash"), col("split"), col("doc_id"))
        .repartition(col("content_hash"))
        .groupBy("content_hash", "split")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("content_hash")
      grouped.withColumn("__ns", count(lit(1)).over(w))
        .filter(col("__ns") > 1).drop("__ns")
        .orderBy("content_hash", "split")
    }),
    // Leakage REPAIR — q116 detects dup groups spanning splits; this
    // closes the loop: every member of a content-dup group is REASSIGNED
    // to the canonical member's (min doc_id's) split, a deterministic
    // group-atomic rule. Output: per-split doc counts before/after, rows
    // moved, and the residual leaking-group count — which the repair
    // provably drives to ZERO (and the hash gate checks).
    "q197_leak_repair" -> ((s, dir) => {
      val withSplit = augmented(s, dir)
        .withColumn("text", Text.normalize(col("text")))
        .withColumn("split", graft.operators.Sampling.assignSplit(
          col("doc_id"), Seq("train" -> 0.90, "val" -> 0.05), last = "test"))
        .select(md5(col("text")).as("content_hash"), col("doc_id"), col("split"))
        .repartition(col("content_hash"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("content_hash")
      val repaired = withSplit
        .withColumn("split_fixed",
          first(col("split")).over(w.orderBy(col("doc_id"))))
      val residual = repaired
        .groupBy("content_hash")
        .agg(countDistinct(col("split_fixed")).as("__ns"))
        .agg(count_if(col("__ns") > 1).as("n_leaking_groups"))
      repaired
        .groupBy(col("split_fixed").as("split"))
        .agg(count(lit(1)).as("n_docs"),
          count_if(col("split") =!= col("split_fixed")).as("n_moved_in"))
        .crossJoin(broadcast(residual))
        .orderBy("split")
    }),
    // MinHash signature materialization (k=8) — the per-doc scale-out stage
    // of LSH dedup, observable on its own.
    "q33_minhash_signature" -> ((s, dir) => {
      withShingles(augmented(s, dir))
        .select(col("doc_id"),
          concat_ws("|",
            transform(TextDedup.minhashSignature("shash", 8), x => x.cast("string")))
            .as("signature"))
        .orderBy("doc_id")
    }),
    // MinHash LSH near-dup pairs: 4 bands × 2 rows, Jaccard >= 0.5 verify.
    "q34_minhash_lsh_pairs" -> ((s, dir) => {
      TextDedup.minhashLshPairs(
        withShingles(augmented(s, dir)), "doc_id", "shash",
        k = 8, bandRows = 2, threshold = 0.5)
        .orderBy("doc_a", "doc_b")
    }),
    // Dedup-graph observability: the near-dup DEGREE histogram a dataset
    // card quotes ("how entangled is the corpus") — per-doc degree over
    // the VERIFIED LSH pairs, rolled into (degree → doc count). Two
    // map-side-combined aggregations over the pair list; the histogram
    // is at most max-degree rows.
    "q159_dedup_degree_hist" -> ((s, dir) => {
      val pairs = TextDedup.minhashLshPairs(
        withShingles(augmented(s, dir)), "doc_id", "shash",
        k = 8, bandRows = 2, threshold = 0.5)
      pairs.select(col("doc_a").as("doc_id"))
        .unionByName(pairs.select(col("doc_b").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("degree"))
        .groupBy("degree")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
        .orderBy("degree")
    }),
    // Robust winnowing (Schleimer et al. 2003, the MOSS fingerprinter):
    // word-5-gram hashes → window-min selection (w=4, rightmost tie-break
    // via the packed int64 key) → position-aware fingerprint sets →
    // overlap pairs on shared hashes under a df≤8 common-gram cap, kept at
    // ≥2 shared fingerprints. The LOCAL guarantee MinHash lacks: any run
    // of ≥ w+k−1 = 8 shared tokens surfaces the pair — which is how it
    // catches the prefix-dropped near-copies q99's fixed 64-token grid
    // misaligns on. One per-doc window sort + one fingerprint equi-join;
    // text never leaves the scan.
    "q161_winnow_overlap" -> ((s, dir) => {
      val fp = graft.operators.Winnow.fingerprints(
        augmented(s, dir), "doc_id", "text", k = 5, w = 4)
      graft.operators.Winnow.overlapPairs(fp, "doc_id", maxDf = 8)
        .filter(col("n_shared") >= 2)
        .orderBy("doc_a", "doc_b")
    }),
    // Near-dup graph centrality by exact-integer PageRank (3 rounds,
    // d=85/100 by cross-multiplication): which docs ANCHOR a duplication
    // cluster vs ride its fringe — a canonical-selection signal built on
    // the same verified pair list as q159's degree histogram, but global
    // (degree is round-1 PageRank; rounds 2–3 see through neighbors).
    // Iterative graph float ML made oracle-checkable, like q71's k-means.
    "q172_pagerank_fp" -> ((s, dir) => {
      // staged: each PageRank iteration references the rank frame twice,
      // so an unstaged pair list would re-run the LSH pipeline ~2^iters
      // times (the q221 peeling lesson).
      val pairs = graft.sources.Stage.through(TextDedup.minhashLshPairs(
        withShingles(augmented(s, dir)), "doc_id", "shash",
        k = 8, bandRows = 2, threshold = 0.5).select("doc_a", "doc_b"))
      TextDedup.pageRankFp(pairs, "doc_a", "doc_b", iters = 3)
        .orderBy("doc_id")
    }),
    // Duplicated-SPAN measurement per candidate pair (Lee et al. 2022's
    // unit of work, on LSH candidates instead of a corpus suffix array):
    // matching word-5-gram positions → diagonal gaps-and-islands → the
    // longest shared token run and total matching grams. The prefix-
    // dropped near-copies surface with runs spanning nearly the whole
    // doc; q150's edit-distance verdict says HOW different, this says
    // WHERE and HOW LONG the copy is.
    "q168_dup_spans" -> ((s, dir) => {
      val aug = augmented(s, dir)
      val cand = TextDedup.minhashLshCandidates(
        withShingles(aug), "doc_id", "shash", k = 8, bandRows = 2)
      graft.operators.Winnow.longestSharedRuns(aug, "doc_id", "text", cand, k = 5)
        .orderBy("doc_a", "doc_b")
    }),
    // Candidate verification by edit distance — the cheap-candidates →
    // expensive-verify production pattern: LSH banding proposes pairs from
    // signatures alone, then the O(L²) levenshtein DP runs ONLY on the
    // candidate pairs (never corpus²), with a normalized near-dup decision
    // by integer cross-multiplication (100·lev ≤ 30·max_len — edit
    // distance within 30% of the longer text). The text join happens after
    // candidate pruning, so full text crosses the wire only for pairs.
    "q150_editdist_verify" -> ((s, dir) => {
      val aug = augmented(s, dir)
      val cand = TextDedup.minhashLshCandidates(
        withShingles(aug), "doc_id", "shash", k = 8, bandRows = 2)
      cand
        .join(aug.select(col("doc_id").as("doc_a"), col("text").as("__ta")), "doc_a")
        .join(aug.select(col("doc_id").as("doc_b"), col("text").as("__tb")), "doc_b")
        .withColumn("lev", levenshtein(col("__ta"), col("__tb")).cast("long"))
        .withColumn("max_len",
          greatest(length(col("__ta")), length(col("__tb"))).cast("long"))
        .withColumn("near_dup", col("lev") * 100 <= col("max_len") * 30)
        .select("doc_a", "doc_b", "lev", "max_len", "near_dup")
        .orderBy("doc_a", "doc_b")
    }),
    // SimHash near-dup pairs: 60-bit fingerprint, 6-bit bands, hamming <= 6.
    // The fingerprint is the native codegen'd expression (one md5+counter
    // loop per row); simhashPairs' repartition barrier materializes it once
    // below the band join. ExpressionsSpec pins bit-parity against the HOF
    // fold and the explode+agg formulation.
    "q35_simhash_pairs" -> ((s, dir) => {
      val sim = augmented(s, dir).select(col("doc_id"),
        graft.expressions.GraftExtensions.simhash60Native(
          expr("split(trim(text), '\\\\s+')")).as("simhash"))
      TextDedup.simhashPairs(sim, "doc_id", "simhash", maxHamming = 6)
        .orderBy("doc_a", "doc_b")
    }),
    // Exact n-gram Jaccard pairs via shingle inverted index (no LSH
    // approximation): ground truth for q34 at the same threshold, run with
    // a LOOSE df cap (64 — vs q110's production dial of 8). Fully uncapped,
    // the inverted-index join's worst term is Σ_shingle df² — a quadratic
    // scale-killer on a boilerplate-heavy corpus; capped at 64 no single
    // shingle contributes more than 64² candidate pairs while on this
    // corpus no shingle reaches the cap, so the output IS the uncapped
    // truth — a premise now ENFORCED IN THE PLAN at every scale factor the
    // query runs (assertCapIsNoop: a 1-row max-df aggregate on the index's
    // reused exchange fails the query via assert_true if any shingle ever
    // reaches the cap, instead of silently diverging while the
    // identically-capped oracle still matches). The truly uncapped
    // configuration is an sf≤0.01-only ground-truth check
    // (JaccardGroundTruthSpec), never a sweep query.
    // Prefix-filtered EXACT similarity join (PPJoin family): candidates
    // come only from each doc's p = n−⌈0.7n⌉+1 RAREST shingles under a
    // global df-order — a provably lossless filter for J ≥ 0.7 (no LSH
    // false negatives), with the quadratic candidate term pushed to the
    // lowest-df postings. PrefixJoinSpec pins equality with brute-force
    // all-pairs Jaccard; here the full pipeline (rank → prefix →
    // candidates → exact verify, all integer) is DuckDB-replayed.
    "q176_prefix_join" -> ((s, dir) => {
      TextDedup.prefixFilterJaccardPairs(
        withShingles(augmented(s, dir)), "doc_id", "shash", tNum = 7, tDen = 10)
        .orderBy("doc_a", "doc_b")
    }),
    // Partition-quality audit: Newman MODULARITY of the strict-threshold
    // clustering (CC over J≥0.8 edges) evaluated on the LOOSE J≥0.7
    // near-dup graph, as the exact rational q_num/q_den with
    // q_num = Σ_c (4m·e_c − d_c²), q_den = 4m² — "do the tight clusters
    // explain the loose graph's edges?" is the dial-setting question
    // between the two thresholds. Tightening is free (q176's verified
    // pairs carry common/na/nb), and every term is int64.
    "q196_modularity" -> ((s, dir) => {
      // staged once: consumed by the strict-CC subgraph AND the loose
      // edge evaluation (and CC itself iterates)
      val pairs7 = graft.sources.Stage.through(
        TextDedup.prefixFilterJaccardPairs(
          withShingles(augmented(s, dir)), "doc_id", "shash", tNum = 7, tDen = 10))
      val pairs8 = pairs7.filter(
        lit(10) * col("common") >= lit(8) * (col("na") + col("nb") - col("common")))
      val labels = TextDedup.connectedComponentsStar(pairs8, "doc_a", "doc_b")
      val la = labels.select(col("doc_id").as("doc_a"), col("cluster_id").as("ca"))
      val lb = labels.select(col("doc_id").as("doc_b"), col("cluster_id").as("cb"))
      val e = pairs7.select("doc_a", "doc_b")
        .join(la, Seq("doc_a"), "left").join(lb, Seq("doc_b"), "left")
        .select(coalesce(col("ca"), col("doc_a")).as("ca"),
          coalesce(col("cb"), col("doc_b")).as("cb"))
      val m = e.agg(count(lit(1)).as("m"))
      val intra = e.filter(col("ca") === col("cb"))
        .groupBy(col("ca").as("c")).agg(count(lit(1)).as("e_in"))
      val deg = e.select(col("ca").as("c")).unionByName(e.select(col("cb").as("c")))
        .groupBy("c").agg(count(lit(1)).as("d"))
      deg.join(intra, Seq("c"), "left")
        .select(col("c"), col("d"), coalesce(col("e_in"), lit(0L)).as("e_in"))
        .crossJoin(broadcast(m))
        .agg(
          min(col("m")).as("m"),
          count(lit(1)).as("n_clusters"),
          sum(lit(4L) * col("m") * col("e_in") - col("d") * col("d")).as("q_num"),
          min(lit(4L) * col("m") * col("m")).as("q_den"))
    }),
    // INCREMENTAL connected components: cluster the base corpus's exact
    // near-dup pairs, then fold the augmented batch's pairs in through
    // the contracted label graph — the star loop re-runs only over
    // AFFECTED clusters (batch-sized, never corpus-sized). The result
    // runs against the FROM-SCRATCH recursive-CTE oracle over the full
    // pair set, so incremental == scratch is the hash gate itself.
    "q182_cc_incremental" -> ((s, dir) => {
      // the pair list feeds base-CC, the contracted batch, and the
      // new-node scan — stage it once (parquet, not cache) so all three
      // consumers read a scan instead of re-running the prefix join
      val pairs = graft.sources.Stage.through(
        TextDedup.prefixFilterJaccardPairs(
          withShingles(augmented(s, dir)), "doc_id", "shash", tNum = 7, tDen = 10)
          .select("doc_a", "doc_b"))
      val labels0 = TextDedup.connectedComponentsStar(
        pairs.filter(col("doc_b") < 100000L), "doc_a", "doc_b")
      TextDedup.connectedComponentsIncremental(
        labels0, pairs.filter(col("doc_b") >= 100000L), "doc_a", "doc_b")
        .orderBy("doc_id")
    }),
    // Triangle census of the prefix-join near-dup graph: closed triangles
    // vs open wedges (global clustering coefficient as the exact rational
    // 3T/W) — the transitivity audit run BEFORE connected components
    // fuses pairwise decisions into clusters. Two equi-joins on the edge
    // list + one degree pass, all int64.
    "q178_triangle_census" -> ((s, dir) => {
      // staged: the census reads the edge list three times (two triangle
      // joins + the wedge degree pass)
      TextDedup.triangleStats(
        graft.sources.Stage.through(TextDedup.prefixFilterJaccardPairs(
          withShingles(augmented(s, dir)), "doc_id", "shash", tNum = 7, tDen = 10)
          .select("doc_a", "doc_b")),
        "doc_a", "doc_b")
    }),
    // Degree assortativity of the near-dup graph (Newman 2002): the exact
    // fixed-point Pearson correlation of endpoint degrees over every
    // directed edge — positive r = duplication communities (hubs link to
    // hubs, CC produces dense same-size clusters), negative r = hub-and-
    // spoke (templates with one-off copies, where canonical selection
    // matters most). Reuses the q179 Gram-pass + exact-isqrt machinery;
    // edges ride the staged pair list, degrees broadcast back.
    "q239_assortativity" -> ((s, dir) => {
      val pairs = graft.sources.Stage.through(TextDedup.minhashLshPairs(
        withShingles(augmented(s, dir)), "doc_id", "shash",
        k = 8, bandRows = 2, threshold = 0.5).select("doc_a", "doc_b"))
      val und = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
      val xy = und
        .join(deg.select(col("src"), col("deg").as("dxv")), "src")
        .join(deg.select(col("src").as("dst"), col("deg").as("dyv")), "dst")
      graft.operators.Regress.pearsonPairsFp(xy,
        Seq("deg_src" -> col("dxv"), "deg_dst" -> col("dyv")))
        .orderBy("x_name", "y_name")
    }),
    // Single-linkage dendrogram LEVELS: near-dup clustering at a Jaccard
    // threshold ladder (0.7 / 0.8 / 0.9) — connected components at
    // threshold t are exactly the t-level cut of the single-linkage
    // hierarchy, and the loosest level's verified pair list CONTAINS the
    // stricter ones (J>=0.8 pairs are a filter on the staged J>=0.7
    // pairs, with common/na/nb already attached — one candidate
    // generation for all three levels). Per level: pair count, clustered
    // docs, cluster count, largest cluster — the dial a curator reads to
    // pick a dedup threshold (q196 scores ONE such cut; this shows the
    // ladder).
    "q237_threshold_dendrogram" -> ((s, dir) => {
      val pairs7 = graft.sources.Stage.through(TextDedup.prefixFilterJaccardPairs(
        withShingles(augmented(s, dir)), "doc_id", "shash", tNum = 7, tDen = 10))
      val lvls = Seq(7, 8, 9)
      def pl(t: Int): DataFrame = pairs7.filter(
        col("common") * 10 >= lit(t) * (col("na") + col("nb") - col("common")))
      // ONE CC run for all three levels: node ids offset by level·10⁷, so
      // components cannot cross levels and the label table partitions by
      // level afterwards — a third of three CC runs' materialization cost.
      val edges = lvls.map(t => pl(t).select(
        (col("doc_a") + lit(t * 10000000L)).as("a"),
        (col("doc_b") + lit(t * 10000000L)).as("b")))
        .reduce(_ unionByName _)
      val lab = TextDedup.connectedComponentsStar(edges, "a", "b")
        .select(expr("doc_id div 10000000").as("lvl"), col("cluster_id"))
      val cs = lab.groupBy("lvl", "cluster_id").agg(count(lit(1)).as("csz"))
      val perLvl = lab.groupBy("lvl").agg(count(lit(1)).as("n_docs"))
        .join(cs.groupBy("lvl").agg(count(lit(1)).as("n_clusters"),
          max(col("csz")).as("max_cluster")), "lvl")
      val nPairs = lvls.map(t => pl(t).agg(count(lit(1)).as("n_pairs"))
          .select(lit(t.toLong).as("lvl"), col("n_pairs")))
        .reduce(_ unionByName _)
      nPairs.join(perLvl, "lvl")
        .select((col("lvl") * 10).as("thr_pct"), col("n_pairs"),
          col("n_docs"), col("n_clusters"), col("max_cluster"))
        .orderBy("thr_pct")
    }),
    // LOCAL clustering coefficient per node — q178's global census broken
    // down to where it acts: per doc, its degree, the triangles through
    // it, and its wedge count (the exact rational lcc = tri/wedges without
    // the division). A doc with high degree but zero triangles is a CHAIN
    // hub CC will fuse dissimilar docs through; a doc whose neighbors
    // interlink is safely inside a clique. Same staged edge list as the
    // census; canonical a<b<c triangles credit each corner once.
    "q232_local_clustering" -> ((s, dir) => {
      val pairs = graft.sources.Stage.through(TextDedup.prefixFilterJaccardPairs(
        withShingles(augmented(s, dir)), "doc_id", "shash", tNum = 7, tDen = 10)
        .select("doc_a", "doc_b"))
      val e = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      val tri = e.as("ab").join(e.as("bc"), col("ab.v") === col("bc.u"))
        .join(e.as("ac"),
          col("ac.u") === col("ab.u") && col("ac.v") === col("bc.v"))
        .select(col("ab.u").as("a"), col("ab.v").as("b"), col("bc.v").as("c"))
      val tpn = tri.select(col("a").as("doc_id"))
        .unionByName(tri.select(col("b").as("doc_id")))
        .unionByName(tri.select(col("c").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
      e.select(col("u").as("doc_id")).unionByName(e.select(col("v").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("degree"))
        .join(tpn, Seq("doc_id"), "left")
        .select(col("doc_id"), col("degree"),
          coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
          expr("degree * (degree - 1) div 2").as("n_wedges"))
        .orderBy("doc_id")
    }),
    // k-core decomposition of the verified near-dup graph (bulk-synchronous
    // peeling, fixpoint asserted IN the plan): 2-core and 3-core membership
    // next to raw degree. Degree alone can't separate docs embedded in
    // DENSE duplication communities from fringe riders — a hub with k
    // one-off neighbors has high degree but an empty 2-core — so the core
    // number is the canonical-selection/cluster-mining signal the degree
    // histogram (q159) lacks. Peeling is two semi-joins + a degree agg per
    // round over a shrinking survivor set; 4 rounds suffice here and the
    // plan PROVES it (one extra peel must remove nothing, assert_true).
    "q221_kcore" -> ((s, dir) => {
      // Staged: the pair list feeds degree + two peeling towers (the
      // q182/q196/q202 multi-consumer discipline), and each peel round
      // commits through parquet so the round tower stays linear work.
      val pairs = graft.sources.Stage.through(TextDedup.minhashLshPairs(
        withShingles(augmented(s, dir)), "doc_id", "shash",
        k = 8, bandRows = 2, threshold = 0.5))
      val e = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      val deg = e.select(col("src").as("doc_id"))
        .unionByName(e.select(col("dst").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("degree"))
      // The two peeling towers are INDEPENDENT — overlap them (guide
      // §2.6: submit independent jobs from driver threads so one tower's
      // tiny per-round jobs back-fill the cores the other leaves idle);
      // stopWhenStable skips committed rounds past the provable fixpoint
      // (monotone survivor sets: equal count ⟹ equal set ⟹ identity peel)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      def tower(k: Int) = Future(TextDedup.kCore(
        pairs, "doc_a", "doc_b", k = k, rounds = 4, assertFixpoint = true,
        commit = graft.sources.Stage.through, stopWhenStable = true))
      val (f2, f3) = (tower(2), tower(3))
      val c2 = Await.result(f2, Duration.Inf)
      val c3 = Await.result(f3, Duration.Inf)
      deg
        .join(c2.select(col("id").as("doc_id"), lit(1L).as("in_2core")),
          Seq("doc_id"), "left")
        .join(c3.select(col("id").as("doc_id"), lit(1L).as("in_3core")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), col("degree"),
          coalesce(col("in_2core"), lit(0L)).as("in_2core"),
          coalesce(col("in_3core"), lit(0L)).as("in_3core"))
        .orderBy("doc_id")
    }),
    // Entity resolution / record linkage (the Fellegi–Sunter pipeline made
    // deterministic): golden-record consolidation of the clean part catalog
    // with a dirty feed whose names carry injected typos (drop-first-char
    // for partkey%9, drop-last-char for partkey%13 — the augmented-corpus
    // discipline). Shape: (1) dedupe the DISTINCT NAME VALUES, never the
    // record table — names are domain-bounded, so pairing cost is
    // independent of record volume and the records only ever broadcast-join
    // the name→cluster decision table; (2) TWO blocking passes (noun token;
    // 3-char prefix) unioned — each catches the variant class the other
    // structurally misses (a dropped first char changes the prefix but not
    // the noun; a dropped last char the reverse); (3) pairwise verify
    // levenshtein <= 1 on candidates only; (4) O(log n) star CC over the
    // verified name graph; (5) survivorship per cluster: canonical name
    // (the min rep id's name), record/name-variant counts, modal brand
    // (ties -> min brand), exact price bounds in cents.
    "q220_entity_resolution" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val p = Tables.part(s, dir)
        .select(col("p_partkey").as("rec_id"), col("p_name").as("name"),
          col("p_brand").as("brand"),
          floor(col("p_retailprice") * 100).cast("long").as("price_c"))
      val recs = p
        .unionByName(p.filter(col("rec_id") % 9 === 0)
          .select((col("rec_id") + 1000000L).as("rec_id"),
            expr("substring(name, 2)").as("name"), col("brand"), col("price_c")))
        .unionByName(p.filter(col("rec_id") % 13 === 0)
          .select((col("rec_id") + 2000000L).as("rec_id"),
            expr("substring(name, 1, length(name) - 1)").as("name"),
            col("brand"), col("price_c")))
      val names = recs.groupBy("name").agg(min(col("rec_id")).as("rep"))
      val withKeys = names
        .withColumn("k_noun", element_at(split(col("name"), " "), 2))
        .withColumn("k_pre", substring(col("name"), 1, 3))
      def pass(key: String) = withKeys
        .select(col(key).as("__k"), col("name").as("name_a"), col("rep").as("rep_a"))
        .join(withKeys.select(col(key).as("__k"), col("name").as("name_b"),
          col("rep").as("rep_b")), "__k")
        .filter(col("rep_a") < col("rep_b"))
        .select("name_a", "rep_a", "name_b", "rep_b")
      val cand = pass("k_noun").unionByName(pass("k_pre")).distinct()
      val verified = cand.filter(levenshtein(col("name_a"), col("name_b")) <= 1)
      val cc = TextDedup.connectedComponentsStar(verified, "rep_a", "rep_b")
        .select(col("doc_id").as("rep"), col("cluster_id"))
      val labeled = names.join(cc, Seq("rep"), "left")
        .select(col("name"), col("rep"),
          coalesce(col("cluster_id"), col("rep")).as("cluster_id"))
      val canon = labeled.filter(col("rep") === col("cluster_id"))
        .select(col("cluster_id"), col("name").as("canonical_name"))
      val rl = recs.join(labeled.select("name", "cluster_id"), "name")
      val brandTop = rl.groupBy("cluster_id", "brand")
        .agg(count(lit(1)).as("__bc"))
        .withColumn("__rn", row_number().over(Window.partitionBy("cluster_id")
          .orderBy(col("__bc").desc, col("brand").asc)))
        .filter(col("__rn") === 1)
        .select(col("cluster_id"), col("brand").as("modal_brand"))
      rl.groupBy("cluster_id")
        .agg(count(lit(1)).as("n_records"),
          countDistinct(col("name")).as("n_names"),
          min(col("price_c")).as("min_price_c"),
          max(col("price_c")).as("max_price_c"))
        .join(canon, "cluster_id")
        .join(brandTop, "cluster_id")
        .select("cluster_id", "canonical_name", "n_records", "n_names",
          "modal_brand", "min_price_c", "max_price_c")
        .orderBy("cluster_id")
    }),
    "q36_jaccard_pairs" -> ((s, dir) => {
      TextDedup.jaccardPairs(
        withShingles(augmented(s, dir)), "doc_id", "shash",
        threshold = 0.5, maxShingleDf = 64L, assertCapIsNoop = true)
        .orderBy("doc_a", "doc_b")
    }),
    // The PRODUCTION configuration of exact Jaccard: shingles appearing in
    // more than maxShingleDf docs are dropped from the universe before
    // indexing, bounding the join's worst term at df² (the dial that makes
    // ground-truth verification affordable at 100 TB). q36 verifies the
    // uncapped semantics; this puts the capped semantics themselves —
    // per-doc set sizes recomputed over survivors included — under the
    // hash gate.
    "q110_jaccard_capped" -> ((s, dir) => {
      TextDedup.jaccardPairs(
        withShingles(augmented(s, dir)), "doc_id", "shash",
        threshold = 0.5, maxShingleDf = 8L)
        .orderBy("doc_a", "doc_b")
    }),
    // LSH configuration self-audit: the (k=8, bandRows=2) banding measured
    // against exact ground truth on the SAME shingle-hash universe —
    // raw candidate volume, true near-dup pairs (Jaccard >= 0.5), and
    // their intersection. recall = n_hits/n_truth, precision =
    // n_hits/n_candidates, both integer-exact under the oracle. This is
    // the audit a production dedup runs ON A SAMPLE before committing band
    // params — and it does: the corpus is hash-sampled to a FIXED ABSOLUTE
    // target of 400 docs (rate = 10000·400/n on the 10⁻⁴ grid, one bounded
    // 1-row count; deterministic md5 membership so the audited slice is
    // identical across runs/engines). A fixed-size sample pins the
    // exact-truth join's Σdf² term CONSTANT under corpus growth — a fixed
    // FRACTION would keep it quadratic (p²·N²) — so the audit costs the
    // same at 32× as at 1× (measured in ScaleProbe).
    // Content-defined chunking: rolling-hash (trigram ≡ 0 mod 16) chunk
    // boundaries + md5 chunk fingerprints — the SHIFT-ROBUST complement to
    // q99's fixed-window passages (a prefix insertion moves every fixed
    // window but re-aligns CDC chunks after one boundary; CdcSpec pins
    // that property). Boundaries, indices, and fingerprints are all
    // md5/int64 modular arithmetic, so the entire chunking is under the
    // hash gate.
    "q138_cdc_chunks" -> ((s, dir) =>
      TextDedup.cdcChunks(Tables.documents(s, dir), "doc_id", "text", divisor = 16)
        .orderBy("doc_id", "chunk_idx")),
    // CDC chunking APPLIED as dedup: doc pairs ranked by shared chunk
    // fingerprints over the augmented corpus — whose +100000 near-copies
    // (first 14 chars dropped) are EXACTLY the shifted-copy case CDC
    // exists for: the prefix edit moves every fixed window, but chunk
    // boundaries re-align and the interior fingerprints match. Candidate
    // generation is an equi-join on chunk_md5 (never all-pairs; a
    // ubiquitous boilerplate chunk behaves like a capped-df shingle and
    // the same dial applies at scale), aggregated to (pair, n_shared).
    "q139_cdc_pairs" -> ((s, dir) => {
      val chunks = TextDedup.cdcChunks(augmented(s, dir), "doc_id", "text", divisor = 16)
        .select(col("doc_id"), col("chunk_md5"))
        .repartition(col("chunk_md5")) // computed once below the self-join exchange
      chunks.as("a").join(chunks.as("b"),
          col("a.chunk_md5") === col("b.chunk_md5") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 3)
        .orderBy("doc_a", "doc_b")
    }),
    "q118_lsh_audit" -> ((s, dir) => {
      val withSh = withShingles(
        graft.operators.Sampling.hashSampleTarget(augmented(s, dir), col("doc_id"), 400L))
      val cand = TextDedup.minhashLshCandidates(withSh, "doc_id", "shash",
        k = 8, bandRows = 2)
      val truth = TextDedup.jaccardPairs(withSh, "doc_id", "shash", threshold = 0.5)
        .select("doc_a", "doc_b")
      val hits = cand.join(truth, Seq("doc_a", "doc_b"))
      cand.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
        .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
    }),
    // The PRODUCTION configuration of containment (the q110 pattern): the
    // df-capped universe bounds the join's worst term AND fixes the
    // semantic failure where a short boilerplate-heavy doc reads as
    // "contained" in everything sharing the boilerplate — capped,
    // containment means containment of distinctive content. Set sizes
    // recomputed over survivors; the capped semantics hash-verified.
    "q127_containment_capped" -> ((s, dir) => {
      TextDedup.containmentPairs(
        withShingles(augmented(s, dir)), "doc_id", "shash",
        threshold = 0.9, maxShingleDf = 8L)
        .orderBy("doc_a", "doc_b")
    }),
    // Asymmetric containment — |A∩B| / min(|A|,|B|): catches a doc whose
    // shingles are a near-subset of another's (truncated re-posts, quoted
    // wrappers) that Jaccard dilutes away. The augmented corpus's suffix
    // copies are exactly this shape. Loose df cap of 64 (vs q127's
    // production 8) for the same Σdf² reason as q36: worst candidate term
    // bounded, output unchanged on this corpus where no shingle reaches
    // the cap — enforced in the plan at every scale factor via
    // assertCapIsNoop (see q36); truly uncapped lives in
    // JaccardGroundTruthSpec at sf0.001.
    "q90_containment_pairs" -> ((s, dir) => {
      TextDedup.containmentPairs(
        withShingles(augmented(s, dir)), "doc_id", "shash",
        threshold = 0.9, maxShingleDf = 64L, assertCapIsNoop = true)
        .orderBy("doc_a", "doc_b")
    }),
    // Pairs → dedup DECISIONS: connected components over the q34 near-dup
    // pairs; every doc in a cluster labeled with the component's min id
    // (its canonical representative). Iterative min-label propagation on
    // the Spark side, recursive CTE in the oracle — both exact.
    "q73_dedup_clusters" -> ((s, dir) => {
      val pairs = TextDedup.minhashLshPairs(
        withShingles(augmented(s, dir)), "doc_id", "shash",
        k = 8, bandRows = 2, threshold = 0.5)
      TextDedup.connectedComponents(pairs, "doc_a", "doc_b")
        .orderBy("doc_id")
    }),
    // Same clusters via alternating large-star/small-star rounds — the
    // O(log n)-round CC variant for chain-shaped components and 10⁹-edge
    // graphs, hash-checked against the identical recursive-CTE oracle.
    "q77_dedup_clusters_star" -> ((s, dir) => {
      val pairs = TextDedup.minhashLshPairs(
        withShingles(augmented(s, dir)), "doc_id", "shash",
        k = 8, bandRows = 2, threshold = 0.5)
      TextDedup.connectedComponentsStar(pairs, "doc_a", "doc_b")
        .orderBy("doc_id")
    }),
    // Incremental ingest dedup: the synthetic copies (ids >= 100000) play
    // an incoming hourly batch checked against the base corpus — candidate
    // generation joins the batch's (broadcast) band values against the
    // corpus band index; corpus text never shuffles. Same data as q34, so
    // the result is exactly q34's cross-side pairs.
    "q84_dedup_incremental" -> ((s, dir) => {
      val aug = withShingles(augmented(s, dir))
      TextDedup.minhashLshPairsIncremental(
        aug.filter(col("doc_id") < 100000),
        aug.filter(col("doc_id") >= 100000),
        "doc_id", "shash", k = 8, bandRows = 2, threshold = 0.5)
        .orderBy("corpus_id", "incoming_id")
    }),
    // The hourly loop at 100 TB in one artifact: a NEW batch processed
    // against the RELEASED corpus without reprocessing it — near-dup vs
    // the corpus band index (batch side broadcast, corpus never
    // shuffles), exact dedup WITHIN the batch, hashed-gram
    // decontamination vs the corpus's eval slice, OOV quality vs the
    // CORPUS vocabulary (broadcast-small model — the stream-static
    // shape), growth-stable split assignment for the accepted docs. One
    // decision row per incoming doc: the audit table an ingest run
    // commits. Composes q84 + q32 + q75 + q83 + q96 incrementally.
    "q129_incremental_release" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val incoming = docs.filter(col("doc_id") % 5 === 0)
      val nearDup = TextDedup.minhashLshPairsIncremental(
          withShingles(corpus), withShingles(incoming),
          "doc_id", "shash", k = 8, bandRows = 2, threshold = 0.5)
        .select(col("incoming_id").as("doc_id")).distinct()
        .withColumn("near_dup", lit(true))
      val exactDup = TextDedup.exactCanonical(
          incoming.withColumn("__t", Text.normalize(col("text"))), "doc_id", "__t")
        .filter(col("is_dup")).select("doc_id").withColumn("exact_dup", lit(true))
      val contaminated = TextDedup.contaminationPairs(
          incoming, corpus.filter(col("doc_id") % 37 === 0),
          "doc_id", "text", n = 3, minShared = 2, hashGrams = true)
        .select(col("train_id").as("doc_id")).distinct()
        .withColumn("contaminated", lit(true))
      val corpusTok = corpus.select(explode(Text.tokens(col("text"))).as("tok"))
      val vocab = corpusTok.groupBy("tok").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok").asc).limit(20)
        .select(col("tok"), lit(1).as("__in"))
      val oov = incoming
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
        .join(broadcast(vocab), Seq("tok"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      // the three flag frames are DECISION sets (ids that hit) — orders
      // of magnitude smaller than the batch, so they broadcast; only the
      // per-doc oov frame is batch-sized and joins batch-to-batch
      incoming.select("doc_id")
        .join(broadcast(nearDup), Seq("doc_id"), "left")
        .join(broadcast(exactDup), Seq("doc_id"), "left")
        .join(broadcast(contaminated), Seq("doc_id"), "left")
        .join(oov, Seq("doc_id"))
        .na.fill(false, Seq("near_dup", "exact_dup", "contaminated"))
        .withColumn("k_len", col("n_tokens") >= 40L)
        // oov_rate <= 0.4, integer cross-multiplied (determinism rule 13)
        .withColumn("k_oov", col("n_oov") * 10L <= col("n_tokens") * 4L)
        .withColumn("keep", !col("near_dup") && !col("exact_dup") &&
          !col("contaminated") && col("k_len") && col("k_oov"))
        .withColumn("split", when(col("keep"), graft.operators.Sampling.assignSplit(
          col("doc_id"), Seq("train" -> 0.90, "val" -> 0.05), last = "test")))
        .select("doc_id", "near_dup", "exact_dup", "contaminated",
          "n_tokens", "k_len", "k_oov", "keep", "split")
        .orderBy("doc_id")
    }),
    // Repeated-passage detection (boilerplate removal's unit of work):
    // 64-token chunk fingerprints shared across >= 2 docs. Exact copies
    // share every chunk; the suffix near-copies misalign the 64-token
    // grid and drop out — exactly the chunk-level-vs-shingle-level
    // tradeoff this op demonstrates next to q36's shingle ground truth.
    // One codegen'd HOF projection + one count-distinct shuffle.
    "q99_repeated_passages" -> ((s, dir) => {
      val W = 64
      augmented(s, dir)
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          explode(transform(
            sequence(lit(0), floor((size(col("toks")) - 1) / W).cast("int")),
            i => md5(concat_ws(" ", slice(col("toks"), i * W + lit(1), lit(W))))))
            .as("chunk_md5"))
        .groupBy("chunk_md5")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy("chunk_md5")
    }),
    // Dedup audit: the cluster-size histogram a dataset card quotes ("N
    // pairs, M triples, ... largest cluster K") — two map-side-combinable
    // aggregations over the CC labels.
    // Star CC (q77's algorithm): same labels as label propagation — q73/q77
    // hash-match the identical oracle — at roughly half the sweep cost.
    "q88_dedup_stats" -> ((s, dir) => {
      val pairs = TextDedup.minhashLshPairs(
        withShingles(augmented(s, dir)), "doc_id", "shash",
        k = 8, bandRows = 2, threshold = 0.5)
      TextDedup.connectedComponentsStar(pairs, "doc_a", "doc_b")
        .groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
        .orderBy("cluster_size")
    }),
    // Canonical selection by QUALITY, not min-id: each near-dup cluster
    // keeps its highest-quality member (ties → lower id; the exact-copy
    // clusters exercise the tie-break). The choice runs through the custom
    // Catalyst top-k-per-group operator (k=1) — the exchange carries one
    // row per cluster, not every member behind a window sort — composing
    // the q94 operator tier into the dedup pipeline.
    "q105_cluster_canonical" -> ((s, dir) => {
      val docs = augmented(s, dir)
      val pairs = TextDedup.minhashLshPairs(
        withShingles(docs), "doc_id", "shash",
        k = 8, bandRows = 2, threshold = 0.5)
      val labels = TextDedup.connectedComponentsStar(pairs, "doc_a", "doc_b")
      val quality = docs
        .withColumn("toks", Text.tokens(col("text")))
        .select(col("doc_id"),
          Text.qualityScore(col("text"), col("toks")).as("quality"))
      val sizes = labels.groupBy("cluster_id")
        .agg(count(lit(1)).as("cluster_size"))
      graft.operators.Analytics.topKPerGroupNative(
          labels.join(quality, "doc_id"),
          Seq("cluster_id"), Seq(("quality", true), ("doc_id", false)), k = 1)
        .select(col("cluster_id"), col("doc_id").as("canonical_id"), col("quality"))
        .join(sizes, "cluster_id")
        .orderBy("cluster_id")
    }),
    // The release pipeline end-to-end: near-dup clusters → keep canonical
    // members → quality-filter the survivors (signals rebuilt on the
    // POST-dedup corpus, the order a real release runs) → deterministic
    // train/val/test assignment. Output is the release MANIFEST a
    // training job consumes. Every stage is an operator that is also
    // oracle-verified standalone (q80, q97, q96) — this query pins the
    // COMPOSITION.
    "q101_release_manifest" -> ((s, dir) =>
      releaseManifest(s, dir).orderBy("doc_id")),
    // The manifest EXPORTED: written through the hash-bucket-partitioned
    // sink, compacted (the nightly maintenance pass), and read back — the
    // oracle checks the post-compaction on-disk contents via the
    // per-split release totals, putting write + compaction + read-back
    // under the correctness gate the way q67 does for the events sink.
    "q102_release_export" -> ((s, dir) => {
      // staging is scaffolding (Scratch/tmpfs), but the SINK stays on the
      // real filesystem: this query's contract IS the durable export —
      // land + merge + compaction + read-back priced as disk IO (the one
      // query of the lifecycle family deliberately left exposed to the
      // host's storage band; the rest re-derive from raw and moved to
      // Scratch in r15)
      val work = graft.sources.Scratch.dir("graft_q102")
      val sinkRoot = java.nio.file.Files
        .createTempDirectory("graft_q102_sink").toString
      val sink = sinkRoot + "/sink"
      // stage the manifest once, then merge the staged table — same
      // land-then-merge shape (and single-execution rationale) as
      // releaseManifest's decision tables
      releaseManifest(s, dir).write.mode("overwrite").parquet(work + "/staged")
      graft.sources.Merge.upsertPartitioned(
        s, s.read.parquet(work + "/staged"), sink, Seq("doc_id"), numBuckets = 8)
      graft.sources.Merge.compactPartitioned(s, sink)
      s.read.parquet(sink)
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy("split")
    }),
    // The dedup DECISION applied: the cleaned corpus — every cluster keeps
    // only its canonical (min-id) member; singletons pass through. The drop
    // set is tiny relative to the corpus, so the anti join broadcasts at
    // scale (AQE); the big side never shuffles.
    "q80_dedup_apply" -> ((s, dir) => {
      val docs = augmented(s, dir)
      val pairs = TextDedup.minhashLshPairs(
        withShingles(docs), "doc_id", "shash",
        k = 8, bandRows = 2, threshold = 0.5)
      val drop = TextDedup.connectedComponentsStar(pairs, "doc_a", "doc_b")
        .filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
      docs.join(drop, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), length(col("text")).as("n_chars"))
        .orderBy("doc_id")
    })
  )

  /** q101's frame (unordered) — the complete release: star-CC dedup keeps
    * canonical members; the held-out eval slice (doc_id % 37 = 0) is
    * excluded and train docs sharing >= 2 hashed trigrams with it are
    * decontaminated away (the q81 production config); funnel signals are
    * rebuilt on the released corpus; splits assigned deterministically.
    */
  private def releaseManifest(s: SparkSession, dir: String): DataFrame = {
    // A release run COMMITS its decision tables between stages — they are
    // real tables, not in-execution persists. Both decision frames here go
    // through the hash-bucket-partitioned sink and are read BACK, so every
    // downstream stage's lineage starts at a parquet scan (nothing ever
    // re-runs the CC loop or the gram join — the r4 regression where
    // funnelFlags' ~7 references re-executed decontamination is now
    // structurally impossible, not just checkpointed away) and the query
    // leaves zero persisted RDDs behind. At 100 TB these are exactly the
    // dedup-decisions / contamination-decisions tables an audit reads.
    val work = graft.sources.Scratch.dir("graft_release")
    def committed(name: String, buckets: Int)(df: DataFrame): DataFrame = {
      val path = s"$work/$name"
      // Land the batch as a STAGED table first (one execution of the
      // decision plan), then merge the staged table into the sink.
      // Without staging, upsertPartitioned's empty-batch no-op probe
      // (isEmpty) executes the full decision plan once and the write
      // executes it again — for the contamination set that is the whole
      // gram join twice (measured ~2-4 s extra per q101 run at sf0.1).
      // This is also the production shape: an hourly batch lands, then
      // merges.
      val stage = s"$work/${name}_staged"
      df.write.mode("overwrite").parquet(stage)
      val staged = s.read.parquet(stage)
      graft.sources.Merge.upsertPartitioned(s, staged, path, Seq("doc_id"), buckets)
      // empty decision set → the sink (correctly) no-ops; keep the schema
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
        s.read.parquet(path).drop("p_bucket")
      else staged.limit(0)
    }
    val docs = augmented(s, dir)
    val pairs = TextDedup.minhashLshPairs(
      withShingles(docs), "doc_id", "shash",
      k = 8, bandRows = 2, threshold = 0.5)
    val drop = TextDedup.connectedComponentsStarCommitted(
        pairs, "doc_a", "doc_b", commit = committed("dedup_decisions", 8))
      .filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
    val survivors = docs.join(drop, Seq("doc_id"), "left_anti")
    val contaminated = committed("contamination_decisions", 4)(
      TextDedup.contaminationPairs(
        survivors.filter(col("doc_id") % 37 =!= 0),
        survivors.filter(col("doc_id") % 37 === 0),
        "doc_id", "text", n = 3, minShared = 2, hashGrams = true)
        .select(col("train_id").as("doc_id")).distinct())
    val released = survivors.filter(col("doc_id") % 37 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
    graft.operators.QualitySignals.funnelFlags(released)
      .filter(col("k1") && col("k2") && col("k3") && col("k4"))
      .withColumn("split", graft.operators.Sampling.assignSplit(
        col("doc_id"), Seq("train" -> 0.90, "val" -> 0.05), last = "test"))
      .select("doc_id", "n_tokens", "split")
  }

  private val oracleSqlBase: Map[String, String] = Map(
    "q172_pagerank_fp" -> {
      def round(i: Int) =
        s"""c$i AS (SELECT e.t AS id, CAST(sum(r${i - 1}.r // d.deg) AS BIGINT) AS cs
               FROM edges e JOIN deg d ON d.s = e.s JOIN r${i - 1} ON r${i - 1}.id = e.s
               GROUP BY e.t),
            r$i AS (SELECT r${i - 1}.id,
                 CAST(150000000 AS BIGINT) + (85 * coalesce(cs, 0)) // 100 AS r
               FROM r${i - 1} LEFT JOIN c$i USING (id))"""
      s"""WITH $AugSql, $ShinglesSql, $HashesSql,
          sig AS (SELECT doc_id, hs, $SigSql AS mh
                  FROM hashed WHERE len(hs) > 0),
          bands AS (SELECT doc_id, b, mh[2*b+1]::VARCHAR || ',' || mh[2*b+2]::VARCHAR AS bv
                    FROM sig, unnest(range(0, 4)) AS u(b)),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id),
          vp AS (SELECT doc_a, doc_b
                 FROM cand JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b
                 WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                     / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.5),
          edges AS (SELECT doc_a AS s, doc_b AS t FROM vp
                    UNION ALL SELECT doc_b, doc_a FROM vp),
          deg AS (SELECT s, count(*) AS deg FROM edges GROUP BY s),
          r0 AS (SELECT s AS id, CAST(1000000000 AS BIGINT) AS r FROM deg),
          ${round(1)}, ${round(2)}, ${round(3)}
          SELECT id AS doc_id, r AS pr_fp FROM r3 ORDER BY doc_id""".replaceAll("\\s+", " ")
    },
    "q168_dup_spans" ->
      s"""WITH $AugSql, $ShinglesSql, $HashesSql,
          sig AS (SELECT doc_id, hs, $SigSql AS mh
                  FROM hashed WHERE len(hs) > 0),
          bands AS (SELECT doc_id, b, mh[2*b+1]::VARCHAR || ',' || mh[2*b+2]::VARCHAR AS bv
                    FROM sig, unnest(range(0, 4)) AS u(b)),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id),
          g AS (SELECT doc_id, i - 1 AS pos,
                  ('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                    || ' ' || toks[i+3] || ' ' || toks[i+4]), 1, 8))::BIGINT AS h
                FROM sh, unnest(range(1, greatest(len(toks) - 3, 1))) AS u(i)),
          m AS (SELECT c.doc_a, c.doc_b, ga.pos AS ap, gb.pos AS bp
                FROM cand c
                JOIN g ga ON ga.doc_id = c.doc_a
                JOIN g gb ON gb.doc_id = c.doc_b AND ga.h = gb.h),
          r AS (SELECT doc_a, doc_b, ap - bp AS dg, ap,
                  ap - row_number() OVER (PARTITION BY doc_a, doc_b, ap - bp ORDER BY ap) AS grp
                FROM m),
          runs AS (SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS len
                   FROM r GROUP BY doc_a, doc_b, dg, grp)
          SELECT doc_a, doc_b, max(len) + 4 AS longest_run_tokens,
                 CAST(sum(len) AS BIGINT) AS n_matching_grams
          FROM runs GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b""".replaceAll("\\s+", " "),
    "q161_winnow_overlap" ->
      raw"""WITH $AugSql,
          tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM aug),
          grams AS (SELECT doc_id, i - 1 AS pos,
              toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4] AS gram
            FROM tk, unnest(range(1, greatest(len(toks) - 3, 1))) AS u(i)),
          keys AS (SELECT doc_id, pos,
              ('0x' || substr(md5(gram), 1, 8))::BIGINT * 2097152 + (2097151 - pos) AS key
            FROM grams),
          sel AS (SELECT doc_id, pos,
              min(key) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sel_key,
              max(pos) OVER (PARTITION BY doc_id) AS max_pos
            FROM keys),
          fp AS (SELECT DISTINCT doc_id, sel_key // 2097152 AS fp_hash
                 FROM sel WHERE pos >= 3 OR pos = max_pos),
          keep AS (SELECT fp_hash FROM fp GROUP BY fp_hash HAVING count(*) <= 8),
          kept AS (SELECT f.doc_id, f.fp_hash FROM fp f JOIN keep USING (fp_hash))
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
          FROM kept a JOIN kept b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
          GROUP BY 1, 2 HAVING count(*) >= 2
          ORDER BY doc_a, doc_b""".replaceAll("\\s+", " "),
    "q195_cross_lang_dups" ->
      raw"""WITH aug AS (
            SELECT doc_id, lang, text FROM documents
            UNION ALL SELECT doc_id + 300000, 'xx', text FROM documents WHERE doc_id % 17 = 0),
          n AS (SELECT doc_id, lang,
            md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g'))) AS h
            FROM aug),
          g AS (SELECT h, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
              min(doc_id) AS min_doc
            FROM n GROUP BY h)
          SELECT min_doc, n_docs, n_langs FROM g
          WHERE n_docs > 1 AND n_langs > 1 ORDER BY min_doc""".replaceAll("\\s+", " "),
    "q32_dedup_exact" ->
      raw"""WITH $AugSql,
          norm AS (SELECT doc_id,
            trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')) AS text
            FROM aug),
          c AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id FROM norm)
          SELECT doc_id, canonical_id FROM c WHERE doc_id <> canonical_id
          ORDER BY doc_id""".replaceAll("\\s+", " "),
    "q116_split_leakage" ->
      raw"""WITH $AugSql,
          norm AS (SELECT doc_id,
            trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')) AS text
            FROM aug),
          s AS (SELECT doc_id, md5(text) AS content_hash,
            CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < 9000 THEN 'train'
                 WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < 9500 THEN 'val'
                 ELSE 'test' END AS split
            FROM norm),
          g AS (SELECT content_hash, split, count(*) AS n_docs, min(doc_id) AS min_doc
                FROM s GROUP BY 1, 2)
          SELECT content_hash, split, n_docs, min_doc
          FROM (SELECT *, count(*) OVER (PARTITION BY content_hash) AS ns FROM g)
          WHERE ns > 1 ORDER BY content_hash, split""".replaceAll("\\s+", " "),
    "q33_minhash_signature" ->
      s"""WITH $AugSql, $ShinglesSql, $HashesSql
          SELECT doc_id, array_to_string($SigSql, '|') AS signature
          FROM hashed ORDER BY doc_id""".replaceAll("\\s+", " "),
    "q129_incremental_release" ->
      raw"""WITH sh AS (SELECT doc_id, toks,
            list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                           for i in range(1, greatest(len(toks) - 1, 1))]) AS shingles
            FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents)),
          hashed AS (SELECT doc_id,
            list_distinct([((th[i]*8191 + th[i+1]) % 4294967296 * 8191 + th[i+2]) % 4294967296
                           for i in range(1, greatest(len(th) - 1, 1))]) AS hs
            FROM (SELECT doc_id, [('0x' || substr(md5(t), 1, 8))::BIGINT for t in toks] AS th
                  FROM sh)),
          sig AS (SELECT doc_id, hs,
            [list_min([(h * (2*i + 1) + i * 2654435761) % 4294967296 for h in hs])
             for i in range(0, 8)] AS mh
            FROM hashed WHERE len(hs) > 0),
          bands AS (SELECT doc_id, b, mh[2*b+1]::VARCHAR || ',' || mh[2*b+2]::VARCHAR AS bv
                    FROM sig, unnest(range(0, 4)) AS u(b)),
          cand AS (SELECT DISTINCT a.doc_id AS corpus_id, b.doc_id AS incoming_id
                   FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv
                   WHERE a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0),
          nd AS (SELECT DISTINCT incoming_id AS doc_id
                 FROM cand JOIN sig sa ON sa.doc_id = corpus_id
                 JOIN sig sb ON sb.doc_id = incoming_id
                 WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                   / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.5),
          norm AS (SELECT doc_id,
            trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')) AS t
            FROM documents WHERE doc_id % 5 = 0),
          ed AS (SELECT doc_id FROM (
                   SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(t)) AS can FROM norm)
                 WHERE doc_id <> can),
          tt AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
          g AS (SELECT doc_id, unnest(list_distinct(
                  [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks) - 1)])) AS g
                FROM tt),
          h AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS hg FROM g),
          cp AS (SELECT tr.doc_id AS train_id, te.doc_id AS test_id, count(*) AS ns
                 FROM h tr JOIN h te ON tr.hg = te.hg
                 WHERE tr.doc_id % 5 = 0 AND te.doc_id % 5 <> 0 AND te.doc_id % 37 = 0
                 GROUP BY 1, 2 HAVING count(*) >= 2),
          ct AS (SELECT DISTINCT train_id AS doc_id FROM cp),
          tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
                  FROM documents),
          v AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM tok
                                 WHERE doc_id % 5 <> 0 GROUP BY tok
                                 ORDER BY c DESC, tok ASC LIMIT 20)),
          ov AS (SELECT t.doc_id, count(*) AS n_tokens,
                   CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
                 FROM tok t LEFT JOIN v ON t.tok = v.tok
                 WHERE t.doc_id % 5 = 0 GROUP BY 1)
          SELECT i.doc_id,
            nd.doc_id IS NOT NULL AS near_dup,
            ed.doc_id IS NOT NULL AS exact_dup,
            ct.doc_id IS NOT NULL AS contaminated,
            ov.n_tokens,
            ov.n_tokens >= 40 AS k_len,
            ov.n_oov * 10 <= ov.n_tokens * 4 AS k_oov,
            (nd.doc_id IS NULL AND ed.doc_id IS NULL AND ct.doc_id IS NULL
             AND ov.n_tokens >= 40 AND ov.n_oov * 10 <= ov.n_tokens * 4) AS keep,
            CASE WHEN (nd.doc_id IS NULL AND ed.doc_id IS NULL AND ct.doc_id IS NULL
                       AND ov.n_tokens >= 40 AND ov.n_oov * 10 <= ov.n_tokens * 4)
              THEN CASE
                WHEN ('0x' || substr(md5(CAST(i.doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < 9000 THEN 'train'
                WHEN ('0x' || substr(md5(CAST(i.doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < 9500 THEN 'val'
                ELSE 'test' END
            END AS split
          FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) i
          LEFT JOIN nd ON i.doc_id = nd.doc_id
          LEFT JOIN ed ON i.doc_id = ed.doc_id
          LEFT JOIN ct ON i.doc_id = ct.doc_id
          JOIN ov ON i.doc_id = ov.doc_id
          ORDER BY i.doc_id""".replaceAll("\\s+", " "),
    "q139_cdc_pairs" ->
      raw"""WITH $AugSql,
          t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                FROM aug),
          th AS (SELECT doc_id, toks,
                   [('0x' || substr(md5(tok), 1, 8))::BIGINT for tok in toks] AS th
                 FROM t),
          sh AS (SELECT doc_id, toks,
                   [((th[i]*8191 + th[i+1]) % 4294967296 * 8191 + th[i+2]) % 4294967296
                    for i in range(1, greatest(len(th) - 1, 1))] AS sh
                 FROM th),
          e AS (SELECT doc_id, sh, u.pos AS pos, toks[u.pos] AS tok
                FROM sh, unnest(range(1, len(toks) + 1)) AS u(pos)),
          f AS (SELECT doc_id, pos, tok,
                  CASE WHEN pos >= 4 AND sh[pos-3] % 16 = 0 THEN 1 ELSE 0 END AS flag
                FROM e),
          c AS (SELECT doc_id, pos, tok,
                  CAST(sum(flag) OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT)
                    AS chunk_idx
                FROM f),
          ch AS (SELECT doc_id, md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5
                 FROM c GROUP BY doc_id, chunk_idx)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
          FROM ch a JOIN ch b ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
          GROUP BY 1, 2 HAVING count(*) >= 3
          ORDER BY doc_a, doc_b""".replaceAll("\\s+", " "),
    "q138_cdc_chunks" ->
      raw"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                      FROM documents),
          th AS (SELECT doc_id, toks,
                   [('0x' || substr(md5(tok), 1, 8))::BIGINT for tok in toks] AS th
                 FROM t),
          sh AS (SELECT doc_id, toks,
                   [((th[i]*8191 + th[i+1]) % 4294967296 * 8191 + th[i+2]) % 4294967296
                    for i in range(1, greatest(len(th) - 1, 1))] AS sh
                 FROM th),
          e AS (SELECT doc_id, sh, u.pos AS pos, toks[u.pos] AS tok
                FROM sh, unnest(range(1, len(toks) + 1)) AS u(pos)),
          f AS (SELECT doc_id, pos, tok,
                  CASE WHEN pos >= 4 AND sh[pos-3] % 16 = 0 THEN 1 ELSE 0 END AS flag
                FROM e),
          c AS (SELECT doc_id, pos, tok,
                  CAST(sum(flag) OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT)
                    AS chunk_idx
                FROM f)
          SELECT doc_id, chunk_idx, count(*) AS n_tokens,
            md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5
          FROM c GROUP BY doc_id, chunk_idx
          ORDER BY doc_id, chunk_idx""".replaceAll("\\s+", " "),
    "q118_lsh_audit" ->
      s"""WITH $AugSql,
          samp AS (SELECT doc_id, text FROM aug
                   WHERE ${bucketSql("doc_id")} <
                     least(10000, 4000000 // (SELECT count(*) FROM aug))),
          ${shinglesSqlFrom("samp")}, $HashesSql,
          sig AS (SELECT doc_id, hs, $SigSql AS mh FROM hashed WHERE len(hs) > 0),
          bands AS (SELECT doc_id, b, mh[2*b+1]::VARCHAR || ',' || mh[2*b+2]::VARCHAR AS bv
                    FROM sig, unnest(range(0, 4)) AS u(b)),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id),
          truth AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
                    WHERE CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
                      / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) >= 0.5),
          hits AS (SELECT doc_a, doc_b FROM cand INTERSECT SELECT doc_a, doc_b FROM truth)
          SELECT (SELECT count(*) FROM cand) AS n_candidates,
                 (SELECT count(*) FROM truth) AS n_truth,
                 (SELECT count(*) FROM hits) AS n_hits""".replaceAll("\\s+", " "),
    "q159_dedup_degree_hist" ->
      s"""WITH $AugSql, $ShinglesSql, $HashesSql,
          sig AS (SELECT doc_id, hs, $SigSql AS mh
                  FROM hashed WHERE len(hs) > 0),
          bands AS (SELECT doc_id, b, mh[2*b+1]::VARCHAR || ',' || mh[2*b+2]::VARCHAR AS bv
                    FROM sig, unnest(range(0, 4)) AS u(b)),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id),
          vp AS (SELECT doc_a, doc_b
                 FROM cand JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b
                 WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                     / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.5),
          deg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS degree FROM
                    (SELECT doc_a AS doc_id FROM vp
                     UNION ALL SELECT doc_b AS doc_id FROM vp)
                  GROUP BY doc_id)
          SELECT degree, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS min_doc
          FROM deg GROUP BY degree ORDER BY degree""".replaceAll("\\s+", " "),
    "q150_editdist_verify" ->
      s"""WITH $AugSql, $ShinglesSql, $HashesSql,
          sig AS (SELECT doc_id, hs, $SigSql AS mh
                  FROM hashed WHERE len(hs) > 0),
          bands AS (SELECT doc_id, b, mh[2*b+1]::VARCHAR || ',' || mh[2*b+2]::VARCHAR AS bv
                    FROM sig, unnest(range(0, 4)) AS u(b)),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id)
          SELECT c.doc_a, c.doc_b,
            CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS lev,
            CAST(greatest(length(ta.text), length(tb.text)) AS BIGINT) AS max_len,
            (CAST(levenshtein(ta.text, tb.text) AS BIGINT) * 100
             <= CAST(greatest(length(ta.text), length(tb.text)) AS BIGINT) * 30) AS near_dup
          FROM cand c
          JOIN aug ta ON c.doc_a = ta.doc_id
          JOIN aug tb ON c.doc_b = tb.doc_id
          ORDER BY doc_a, doc_b""".replaceAll("\\s+", " "),
    "q34_minhash_lsh_pairs" ->
      s"""WITH $AugSql, $ShinglesSql, $HashesSql,
          sig AS (SELECT doc_id, hs, $SigSql AS mh
                  FROM hashed WHERE len(hs) > 0),
          bands AS (SELECT doc_id, b, mh[2*b+1]::VARCHAR || ',' || mh[2*b+2]::VARCHAR AS bv
                    FROM sig, unnest(range(0, 4)) AS u(b)),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id)
          SELECT doc_a, doc_b,
            CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
              / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) AS jaccard
          FROM cand JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b
          WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
              / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.5
          ORDER BY doc_a, doc_b""".replaceAll("\\s+", " "),
    "q35_simhash_pairs" ->
      raw"""WITH $AugSql,
          tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM aug),
          bs AS (SELECT doc_id,
                   [list_sum(list_transform(toks,
                      t -> CASE WHEN ((('0x' || substr(md5(t), 1, 15))::BIGINT >> j) & 1) = 1
                                THEN 1 ELSE -1 END))
                    for j in range(0, 60)] AS sums
                 FROM tok),
          sim AS (SELECT doc_id,
                    list_sum([CASE WHEN sums[j+1] > 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END
                              for j in range(0, 60)]) AS simhash
                  FROM bs),
          bands AS (SELECT doc_id, simhash, p, (simhash >> (p*8)) & 255 AS nib
                    FROM sim, unnest(range(0, 7)) AS u(p)),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.simhash AS ha, b.simhash AS hb
                   FROM bands a JOIN bands b ON a.p = b.p AND a.nib = b.nib AND a.doc_id < b.doc_id)
          SELECT doc_a, doc_b, bit_count(xor(ha, hb)) AS hamming
          FROM cand WHERE bit_count(xor(ha, hb)) <= 6
          ORDER BY doc_a, doc_b""".replaceAll("\\s+", " "),
    "q176_prefix_join" ->
      s"""WITH $AugSql, $ShinglesSql, $HashesSql, $PrefixPairsSql
          SELECT doc_a, doc_b, common, na, nb FROM ppairs
          ORDER BY doc_a, doc_b""".replaceAll("\\s+", " "),
    "q210_contamination_halo" ->
      s"""WITH $AugSql,
          tr AS (SELECT doc_id, text FROM aug WHERE (doc_id % 100000) % 37 <> 0),
          ${shinglesSqlFrom("tr")}, $HashesSql, $PrefixPairsSql,
          t2 AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM tr),
          gtr AS (SELECT doc_id, unnest(list_distinct(
                    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                     for i in range(1, len(toks) - 1)])) AS g
                  FROM t2),
          t3 AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
                 FROM documents WHERE doc_id % 37 = 0),
          gte AS (SELECT doc_id, unnest(list_distinct(
                    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                     for i in range(1, len(toks) - 1)])) AS g
                  FROM t3),
          cp AS (SELECT a.doc_id AS train_id
                 FROM gtr a JOIN gte b ON a.g = b.g
                 GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2),
          s0 AS (SELECT DISTINCT train_id AS doc_id FROM cp),
          und AS (SELECT doc_a AS a, doc_b AS b FROM ppairs
                  UNION ALL SELECT doc_b, doc_a FROM ppairs),
          n1 AS (SELECT DISTINCT e.b AS doc_id FROM und e
                 JOIN s0 ON e.a = s0.doc_id
                 WHERE e.b NOT IN (SELECT doc_id FROM s0)),
          f1 AS (SELECT doc_id FROM s0 UNION SELECT doc_id FROM n1),
          n2 AS (SELECT DISTINCT e.b AS doc_id FROM und e
                 JOIN f1 ON e.a = f1.doc_id
                 WHERE e.b NOT IN (SELECT doc_id FROM f1))
          SELECT * FROM (
            SELECT 0 AS hop, (SELECT CAST(count(*) AS BIGINT) FROM s0) AS n_docs,
              (SELECT min(doc_id) FROM s0) AS min_doc
            UNION ALL SELECT 1, (SELECT CAST(count(*) AS BIGINT) FROM n1),
              (SELECT min(doc_id) FROM n1)
            UNION ALL SELECT 2, (SELECT CAST(count(*) AS BIGINT) FROM n2),
              (SELECT min(doc_id) FROM n2))
          ORDER BY hop""".replaceAll("\\s+", " "),
    "q204_cross_source_pairs" ->
      s"""WITH $AugSql, $ShinglesSql, $HashesSql, $PrefixPairsSql,
          srcmap AS (SELECT doc_id AS o, source FROM documents),
          e AS (SELECT p.doc_a % 100000 AS oa, p.doc_b % 100000 AS ob FROM ppairs p),
          j AS (SELECT sa.source AS source_a, sb.source AS source_b, e.oa = e.ob AS self_copy
                FROM e JOIN srcmap sa ON sa.o = e.oa JOIN srcmap sb ON sb.o = e.ob)
          SELECT least(source_a, source_b) AS source_lo,
            greatest(source_a, source_b) AS source_hi,
            CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(count(*) FILTER (self_copy) AS BIGINT) AS n_self_copies
          FROM j GROUP BY 1, 2 ORDER BY source_lo, source_hi""".replaceAll("\\s+", " "),
    "q202_dedup_cascade" ->
      s"""WITH RECURSIVE $AugSql,
          s0 AS (SELECT doc_id, text FROM aug WHERE length(text) >= 120),
          nrm AS (SELECT doc_id, text,
              md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g'))) AS h
            FROM s0),
          s1 AS (SELECT doc_id, text FROM nrm
                 QUALIFY min(doc_id) OVER (PARTITION BY h) = doc_id),
          ${shinglesSqlFrom("s1")}, $HashesSql, $PrefixPairsSql,
          edges AS (SELECT doc_a AS a, doc_b AS b FROM ppairs
                    UNION SELECT doc_b, doc_a FROM ppairs),
          nodes AS (SELECT DISTINCT a AS id FROM edges),
          reach(id, lbl) AS (SELECT id, id FROM nodes
                             UNION
                             SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.id),
          lab AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
          drop2 AS (SELECT doc_id FROM lab WHERE doc_id <> cluster_id)
          SELECT * FROM (
            SELECT 's0_length' AS stage,
              (SELECT CAST(count(*) AS BIGINT) FROM aug) AS n_in,
              (SELECT CAST(count(*) AS BIGINT) FROM aug)
                - (SELECT CAST(count(*) AS BIGINT) FROM s0) AS n_removed,
              (SELECT CAST(count(*) AS BIGINT) FROM s0) AS n_out
            UNION ALL SELECT 's1_exact',
              (SELECT CAST(count(*) AS BIGINT) FROM s0),
              (SELECT CAST(count(*) AS BIGINT) FROM s0)
                - (SELECT CAST(count(*) AS BIGINT) FROM s1),
              (SELECT CAST(count(*) AS BIGINT) FROM s1)
            UNION ALL SELECT 's2_neardup',
              (SELECT CAST(count(*) AS BIGINT) FROM s1),
              (SELECT CAST(count(*) AS BIGINT) FROM drop2),
              (SELECT CAST(count(*) AS BIGINT) FROM s1)
                - (SELECT CAST(count(*) AS BIGINT) FROM drop2))
          ORDER BY stage""".replaceAll("\\s+", " "),
    "q197_leak_repair" ->
      s"""WITH $AugSql,
          n AS (SELECT doc_id,
              md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g'))) AS content_hash,
              CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < 9000 THEN 'train'
                   WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < 9500 THEN 'val'
                   ELSE 'test' END AS split
            FROM aug),
          r AS (SELECT doc_id, content_hash, split,
              first_value(split) OVER (PARTITION BY content_hash ORDER BY doc_id) AS split_fixed
            FROM n),
          res AS (SELECT CAST(count(*) FILTER (ns > 1) AS BIGINT) AS n_leaking_groups
                  FROM (SELECT count(DISTINCT split_fixed) AS ns FROM r GROUP BY content_hash))
          SELECT split_fixed AS split, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(count(*) FILTER (split <> split_fixed) AS BIGINT) AS n_moved_in,
            res.n_leaking_groups
          FROM r, res GROUP BY split_fixed, res.n_leaking_groups
          ORDER BY split""".replaceAll("\\s+", " "),
    "q196_modularity" ->
      s"""WITH RECURSIVE $AugSql, $ShinglesSql, $HashesSql, $PrefixPairsSql,
          p8 AS (SELECT doc_a, doc_b FROM ppairs
                 WHERE 10 * common >= 8 * (na + nb - common)),
          edges8 AS (SELECT doc_a AS a, doc_b AS b FROM p8
                     UNION SELECT doc_b, doc_a FROM p8),
          nodes8 AS (SELECT DISTINCT a AS id FROM edges8),
          reach(id, lbl) AS (SELECT id, id FROM nodes8
                             UNION
                             SELECT e.b, r.lbl FROM reach r JOIN edges8 e ON e.a = r.id),
          lab AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
          ev AS (SELECT coalesce(la.cluster_id, p.doc_a) AS ca,
                   coalesce(lb.cluster_id, p.doc_b) AS cb
                 FROM ppairs p
                 LEFT JOIN lab la ON la.doc_id = p.doc_a
                 LEFT JOIN lab lb ON lb.doc_id = p.doc_b),
          mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ev),
          intra AS (SELECT ca AS c, CAST(count(*) AS BIGINT) AS e_in FROM ev
                    WHERE ca = cb GROUP BY ca),
          deg AS (SELECT c, CAST(count(*) AS BIGINT) AS d FROM
                    (SELECT ca AS c FROM ev UNION ALL SELECT cb FROM ev)
                  GROUP BY c),
          per AS (SELECT deg.c, deg.d, coalesce(intra.e_in, 0) AS e_in
                  FROM deg LEFT JOIN intra USING (c))
          SELECT min(mm.m) AS m, CAST(count(*) AS BIGINT) AS n_clusters,
            CAST(sum(4 * mm.m * per.e_in - per.d * per.d) AS BIGINT) AS q_num,
            CAST(min(4 * mm.m * mm.m) AS BIGINT) AS q_den
          FROM per, mm""".replaceAll("\\s+", " "),
    "q182_cc_incremental" ->
      s"""WITH RECURSIVE $AugSql, $ShinglesSql, $HashesSql, $PrefixPairsSql,
          edges AS (SELECT doc_a AS a, doc_b AS b FROM ppairs
                    UNION SELECT doc_b, doc_a FROM ppairs),
          nodes AS (SELECT DISTINCT a AS id FROM edges),
          reach(id, lbl) AS (SELECT id, id FROM nodes
                             UNION
                             SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.id)
          SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach
          GROUP BY id ORDER BY doc_id""".replaceAll("\\s+", " "),
    "q178_triangle_census" ->
      s"""WITH $AugSql, $ShinglesSql, $HashesSql, $PrefixPairsSql,
          e AS (SELECT doc_a AS u, doc_b AS v FROM ppairs),
          tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
                  FROM e ab JOIN e bc ON ab.v = bc.u
                  JOIN e ac ON ac.u = ab.u AND ac.v = bc.v),
          deg AS (SELECT x, count(*) AS dg FROM
                    (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
                  GROUP BY x),
          w AS (SELECT CAST(sum(dg * (dg - 1) // 2) AS BIGINT) AS n_wedges FROM deg)
          SELECT tri.n_triangles, w.n_wedges FROM tri, w""".replaceAll("\\s+", " "),
    "q239_assortativity" ->
      s"""WITH $AugSql, $ShinglesSql, $HashesSql,
          sig AS (SELECT doc_id, hs, $SigSql AS mh
                  FROM hashed WHERE len(hs) > 0),
          bands AS (SELECT doc_id, b, mh[2*b+1]::VARCHAR || ',' || mh[2*b+2]::VARCHAR AS bv
                    FROM sig, unnest(range(0, 4)) AS u(b)),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b
                   ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id),
          vp AS (SELECT doc_a, doc_b
                 FROM cand JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b
                 WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                     / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.5),
          und AS (SELECT doc_a AS src, doc_b AS dst FROM vp
                  UNION ALL SELECT doc_b, doc_a FROM vp),
          deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY src),
          xy AS (SELECT da.deg AS x, db.deg AS y
                 FROM und JOIN deg da ON da.src = und.src
                 JOIN deg db ON db.src = und.dst),
          g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  sum(x) AS s_x, sum(y) AS s_y,
                  sum(x*x) AS s_xx, sum(y*y) AS s_yy, sum(x*y) AS s_xy FROM xy),
          p AS (SELECT 'deg_src' AS x_name, 'deg_dst' AS y_name, n,
                  n*s_xy - s_x*s_y AS num,
                  n*s_xx - s_x*s_x AS dx, n*s_yy - s_y*s_y AS dy FROM g),
          p2 AS (SELECT *, CAST(floor(sqrt(CAST(dx AS DOUBLE))) AS BIGINT) AS rx,
                  CAST(floor(sqrt(CAST(dy AS DOUBLE))) AS BIGINT) AS ry FROM p),
          i AS (SELECT x_name, y_name, n, num,
                  rx + (CASE WHEN (rx+1)*(rx+1) <= dx THEN 1 ELSE 0 END)
                     - (CASE WHEN rx*rx > dx THEN 1 ELSE 0 END) AS sx,
                  ry + (CASE WHEN (ry+1)*(ry+1) <= dy THEN 1 ELSE 0 END)
                     - (CASE WHEN ry*ry > dy THEN 1 ELSE 0 END) AS sy FROM p2)
          SELECT x_name, y_name, n, CAST(num AS BIGINT) AS num,
            CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
            CAST(CASE WHEN sx * sy = 0 THEN NULL
                 WHEN num < 0 THEN -least((10000 * (-num)) // (sx * sy), 10000)
                 ELSE least((10000 * num) // (sx * sy), 10000) END AS BIGINT) AS r_fp
          FROM i ORDER BY x_name, y_name""".replaceAll("\\s+", " "),
    "q237_threshold_dendrogram" -> {
      def lvl(t: Int): String =
        s"""p$t AS (SELECT doc_a, doc_b FROM ppairs
              WHERE 10 * common >= $t * (na + nb - common)),
            e$t AS (SELECT doc_a AS a, doc_b AS b FROM p$t
                    UNION SELECT doc_b, doc_a FROM p$t),
            n$t AS (SELECT DISTINCT a AS id FROM e$t),
            reach$t(id, lbl) AS (SELECT id, id FROM n$t
                                 UNION
                                 SELECT e.b, r.lbl FROM reach$t r
                                 JOIN e$t e ON e.a = r.id),
            lab$t AS (SELECT id, min(lbl) AS cluster_id FROM reach$t GROUP BY id),
            c$t AS (SELECT cluster_id, count(*) AS csz FROM lab$t GROUP BY 1),
            s$t AS (SELECT CAST(${t}0 AS BIGINT) AS thr_pct,
              (SELECT CAST(count(*) AS BIGINT) FROM p$t) AS n_pairs,
              (SELECT CAST(count(*) AS BIGINT) FROM lab$t) AS n_docs,
              (SELECT CAST(count(*) AS BIGINT) FROM c$t) AS n_clusters,
              (SELECT CAST(max(csz) AS BIGINT) FROM c$t) AS max_cluster)"""
      s"""WITH RECURSIVE $AugSql, $ShinglesSql, $HashesSql, $PrefixPairsSql,
          ${lvl(7)}, ${lvl(8)}, ${lvl(9)}
          SELECT * FROM s7 UNION ALL SELECT * FROM s8 UNION ALL SELECT * FROM s9
          ORDER BY thr_pct""".replaceAll("\\s+", " ")
    },
    "q232_local_clustering" ->
      s"""WITH $AugSql, $ShinglesSql, $HashesSql, $PrefixPairsSql,
          e AS (SELECT doc_a AS u, doc_b AS v FROM ppairs),
          tri AS (SELECT ab.u AS a, ab.v AS b, bc.v AS c
                  FROM e ab JOIN e bc ON ab.v = bc.u
                  JOIN e ac ON ac.u = ab.u AND ac.v = bc.v),
          tpn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles FROM (
                    SELECT a AS doc_id FROM tri
                    UNION ALL SELECT b FROM tri
                    UNION ALL SELECT c FROM tri)
                  GROUP BY doc_id),
          deg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS degree FROM
                    (SELECT u AS doc_id FROM e UNION ALL SELECT v FROM e)
                  GROUP BY doc_id)
          SELECT d.doc_id, d.degree,
            CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
            CAST(d.degree * (d.degree - 1) // 2 AS BIGINT) AS n_wedges
          FROM deg d LEFT JOIN tpn t USING (doc_id)
          ORDER BY d.doc_id""".replaceAll("\\s+", " "),
    "q221_kcore" -> {
      def peel(k: Int, rounds: Int): String = {
        val init = s"s${k}_0 AS (SELECT DISTINCT src AS id FROM und)"
        val rs = (1 to rounds).map { r =>
          s"""s${k}_$r AS (SELECT src AS id FROM (
                SELECT e.src, count(*) AS d FROM und e
                JOIN s${k}_${r - 1} a ON a.id = e.src
                JOIN s${k}_${r - 1} b ON b.id = e.dst
                GROUP BY e.src) WHERE d >= $k)"""
        }
        (init +: rs).mkString(", ")
      }
      s"""WITH $AugSql, $ShinglesSql, $HashesSql,
          sig AS (SELECT doc_id, hs, $SigSql AS mh
                  FROM hashed WHERE len(hs) > 0),
          bands AS (SELECT doc_id, b, mh[2*b+1]::VARCHAR || ',' || mh[2*b+2]::VARCHAR AS bv
                    FROM sig, unnest(range(0, 4)) AS u(b)),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b
                   ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id),
          vp AS (SELECT doc_a, doc_b
                 FROM cand JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b
                 WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                     / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.5),
          und AS (SELECT doc_a AS src, doc_b AS dst FROM vp
                  UNION SELECT doc_b, doc_a FROM vp),
          ${peel(2, 4)}, ${peel(3, 4)},
          deg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS degree FROM
                    (SELECT doc_a AS doc_id FROM vp
                     UNION ALL SELECT doc_b AS doc_id FROM vp)
                  GROUP BY doc_id)
          SELECT d.doc_id, d.degree,
            CAST(CASE WHEN c2.id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS in_2core,
            CAST(CASE WHEN c3.id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS in_3core
          FROM deg d
          LEFT JOIN s2_4 c2 ON c2.id = d.doc_id
          LEFT JOIN s3_4 c3 ON c3.id = d.doc_id
          ORDER BY d.doc_id""".replaceAll("\\s+", " ")
    },
    "q220_entity_resolution" ->
      """WITH RECURSIVE
          p0 AS (SELECT p_partkey AS rec_id, p_name AS name, p_brand AS brand,
                   CAST(floor(p_retailprice * 100) AS BIGINT) AS price_c FROM part),
          recs AS (SELECT * FROM p0
            UNION ALL SELECT rec_id + 1000000, substr(name, 2), brand, price_c
              FROM p0 WHERE rec_id % 9 = 0
            UNION ALL SELECT rec_id + 2000000, substr(name, 1, length(name) - 1),
                brand, price_c
              FROM p0 WHERE rec_id % 13 = 0),
          names AS (SELECT name, min(rec_id) AS rep FROM recs GROUP BY name),
          wk AS (SELECT name, rep, split_part(name, ' ', 2) AS k_noun,
                   substr(name, 1, 3) AS k_pre FROM names),
          cand AS (
            SELECT a.name AS name_a, a.rep AS rep_a, b.name AS name_b, b.rep AS rep_b
            FROM wk a JOIN wk b ON a.k_noun = b.k_noun AND a.rep < b.rep
            UNION
            SELECT a.name, a.rep, b.name, b.rep
            FROM wk a JOIN wk b ON a.k_pre = b.k_pre AND a.rep < b.rep),
          ver AS (SELECT rep_a, rep_b FROM cand WHERE levenshtein(name_a, name_b) <= 1),
          edges AS (SELECT rep_a AS a, rep_b AS b FROM ver
                    UNION SELECT rep_b, rep_a FROM ver),
          nodes AS (SELECT DISTINCT a AS id FROM edges),
          reach(id, lbl) AS (SELECT id, id FROM nodes
                             UNION
                             SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.id),
          lab AS (SELECT id AS rep, min(lbl) AS cluster_id FROM reach GROUP BY id),
          labeled AS (SELECT n.name, n.rep, coalesce(l.cluster_id, n.rep) AS cluster_id
                      FROM names n LEFT JOIN lab l ON l.rep = n.rep),
          canon AS (SELECT cluster_id, name AS canonical_name FROM labeled
                    WHERE rep = cluster_id),
          rl AS (SELECT r.rec_id, r.name, r.brand, r.price_c, lb.cluster_id
                 FROM recs r JOIN labeled lb ON lb.name = r.name),
          bt AS (SELECT cluster_id, brand AS modal_brand FROM (
                   SELECT cluster_id, brand,
                     row_number() OVER (PARTITION BY cluster_id
                       ORDER BY count(*) DESC, brand) AS rn
                   FROM rl GROUP BY cluster_id, brand) WHERE rn = 1),
          ag AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_records,
                   CAST(count(DISTINCT name) AS BIGINT) AS n_names,
                   min(price_c) AS min_price_c, max(price_c) AS max_price_c
                 FROM rl GROUP BY cluster_id)
          SELECT ag.cluster_id, canon.canonical_name, ag.n_records, ag.n_names,
            bt.modal_brand, ag.min_price_c, ag.max_price_c
          FROM ag JOIN canon USING (cluster_id) JOIN bt USING (cluster_id)
          ORDER BY cluster_id""".replaceAll("\\s+", " "),
    "q36_jaccard_pairs" ->
      s"""WITH $AugSql, $ShinglesSql, $HashesSql,
          inv0 AS (SELECT doc_id, unnest(hs) AS s FROM hashed),
          keepsh AS (SELECT s FROM inv0 GROUP BY s HAVING count(*) <= 64),
          kept AS (SELECT inv0.doc_id, inv0.s FROM inv0 JOIN keepsh USING (s)),
          sized AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
          pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      sa.n AS na, sb.n AS nb, count(*) AS common
                    FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
                    JOIN sized sa ON sa.doc_id = a.doc_id
                    JOIN sized sb ON sb.doc_id = b.doc_id
                    GROUP BY 1, 2, 3, 4)
          SELECT doc_a, doc_b, CAST(common AS DOUBLE) / (na + nb - common) AS jaccard
          FROM pairs WHERE CAST(common AS DOUBLE) / (na + nb - common) >= 0.5
          ORDER BY doc_a, doc_b""".replaceAll("\\s+", " "),
    "q110_jaccard_capped" ->
      s"""WITH $AugSql, $ShinglesSql, $HashesSql,
          inv0 AS (SELECT doc_id, unnest(hs) AS s FROM hashed),
          keepsh AS (SELECT s FROM inv0 GROUP BY s HAVING count(*) <= 8),
          kept AS (SELECT inv0.doc_id, inv0.s FROM inv0 JOIN keepsh USING (s)),
          sized AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
          pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      sa.n AS na, sb.n AS nb, count(*) AS common
                    FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
                    JOIN sized sa ON sa.doc_id = a.doc_id
                    JOIN sized sb ON sb.doc_id = b.doc_id
                    GROUP BY 1, 2, 3, 4)
          SELECT doc_a, doc_b, CAST(common AS DOUBLE) / (na + nb - common) AS jaccard
          FROM pairs WHERE CAST(common AS DOUBLE) / (na + nb - common) >= 0.5
          ORDER BY doc_a, doc_b""".replaceAll("\\s+", " "),
    "q99_repeated_passages" ->
      raw"""WITH $AugSql,
          tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM aug),
          n AS (SELECT doc_id, toks, ((len(toks) - 1) // 64) + 1 AS nch FROM tok),
          ch AS (SELECT doc_id,
                   unnest([md5(array_to_string(toks[i*64+1 : least((i+1)*64, len(toks))], ' '))
                           for i in range(0, nch)]) AS chunk_md5
                 FROM n)
          SELECT chunk_md5, count(DISTINCT doc_id) AS n_docs, min(doc_id) AS first_doc
          FROM ch GROUP BY chunk_md5 HAVING count(DISTINCT doc_id) >= 2
          ORDER BY chunk_md5""".replaceAll("\\s+", " "),
    "q127_containment_capped" ->
      s"""WITH $AugSql, $ShinglesSql, $HashesSql,
          inv0 AS (SELECT doc_id, unnest(hs) AS s FROM hashed),
          keepsh AS (SELECT s FROM inv0 GROUP BY s HAVING count(*) <= 8),
          kept AS (SELECT inv0.doc_id, inv0.s FROM inv0 JOIN keepsh USING (s)),
          sized AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
          pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      sa.n AS na, sb.n AS nb, count(*) AS common
                    FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
                    JOIN sized sa ON sa.doc_id = a.doc_id
                    JOIN sized sb ON sb.doc_id = b.doc_id
                    GROUP BY 1, 2, 3, 4)
          SELECT doc_a, doc_b, CAST(common AS DOUBLE) / least(na, nb) AS containment
          FROM pairs WHERE CAST(common AS DOUBLE) / least(na, nb) >= 0.9
          ORDER BY doc_a, doc_b""".replaceAll("\\s+", " "),
    "q90_containment_pairs" ->
      s"""WITH $AugSql, $ShinglesSql, $HashesSql,
          inv0 AS (SELECT doc_id, unnest(hs) AS s FROM hashed),
          keepsh AS (SELECT s FROM inv0 GROUP BY s HAVING count(*) <= 64),
          kept AS (SELECT inv0.doc_id, inv0.s FROM inv0 JOIN keepsh USING (s)),
          sized AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
          pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      sa.n AS na, sb.n AS nb, count(*) AS common
                    FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
                    JOIN sized sa ON sa.doc_id = a.doc_id
                    JOIN sized sb ON sb.doc_id = b.doc_id
                    GROUP BY 1, 2, 3, 4)
          SELECT doc_a, doc_b, CAST(common AS DOUBLE) / least(na, nb) AS containment
          FROM pairs WHERE CAST(common AS DOUBLE) / least(na, nb) >= 0.9
          ORDER BY doc_a, doc_b""".replaceAll("\\s+", " "),
    "q73_dedup_clusters" ->
      s"""WITH RECURSIVE $AugSql, $ShinglesSql, $HashesSql,
          sig AS (SELECT doc_id, hs, $SigSql AS mh
                  FROM hashed WHERE len(hs) > 0),
          bands AS (SELECT doc_id, b, mh[2*b+1]::VARCHAR || ',' || mh[2*b+2]::VARCHAR AS bv
                    FROM sig, unnest(range(0, 4)) AS u(b)),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id),
          pairs AS (SELECT doc_a, doc_b
                    FROM cand JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b
                    WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                        / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.5),
          edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                    UNION SELECT doc_b, doc_a FROM pairs),
          nodes AS (SELECT DISTINCT a AS id FROM edges),
          reach(id, lbl) AS (SELECT id, id FROM nodes
                             UNION
                             SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.id)
          SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach
          GROUP BY id ORDER BY doc_id""".replaceAll("\\s+", " ")
  )

  /** q77 computes the same clusters with a different algorithm, so its
    * oracle is the identical recursive-CTE reachability query; q80 extends
    * the same CTE chain with the keep-canonical anti join.
    */
  val oracleSql: Map[String, String] =
    oracleSqlBase +
      ("q77_dedup_clusters_star" -> oracleSqlBase("q73_dedup_clusters")) +
      ("q84_dedup_incremental" ->
        s"""WITH $AugSql, $ShinglesSql, $HashesSql,
            sig AS (SELECT doc_id, hs, $SigSql AS mh
                    FROM hashed WHERE len(hs) > 0),
            bands AS (SELECT doc_id, b, mh[2*b+1]::VARCHAR || ',' || mh[2*b+2]::VARCHAR AS bv
                      FROM sig, unnest(range(0, 4)) AS u(b)),
            cand AS (SELECT DISTINCT a.doc_id AS corpus_id, b.doc_id AS incoming_id
                     FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv
                     WHERE a.doc_id < 100000 AND b.doc_id >= 100000)
            SELECT corpus_id, incoming_id,
              CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) AS jaccard
            FROM cand JOIN sig sa ON sa.doc_id = corpus_id JOIN sig sb ON sb.doc_id = incoming_id
            WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.5
            ORDER BY corpus_id, incoming_id""".replaceAll("\\s+", " ")) +
      ("q101_release_manifest" -> q101OracleSql) +
      ("q102_release_export" -> {
        val base = q101OracleSql
        val tail = " ORDER BY doc_id"
        require(base.endsWith(tail), "q101 oracle tail changed; update q102")
        s"""SELECT split, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
            min(doc_id) AS min_id, max(doc_id) AS max_id
            FROM (${base.stripSuffix(tail)}) m
            GROUP BY split ORDER BY split""".replaceAll("\\s+", " ")
      }) +
      ("q88_dedup_stats" -> q88OracleSqlEntry) +
      ("q80_dedup_apply" -> q80OracleSqlEntry) +
      ("q105_cluster_canonical" -> q105OracleSql)

  /** q105: the q73 cluster CTE extended with per-member quality (the q28
    * formula on the augmented corpus) and a QUALIFY top-1 per cluster.
    */
  private lazy val q105OracleSql: String = {
    val q73 = oracleSqlBase("q73_dedup_clusters")
    val labelsTail =
      """SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach
         GROUP BY id ORDER BY doc_id""".replaceAll("\\s+", " ")
    require(q73.endsWith(labelsTail), "q73 oracle tail changed; update q105")
    q73.stripSuffix(labelsTail).trim + "," +
      raw""" labels AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
        qt AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS toks FROM aug),
        qual AS (SELECT doc_id,
          least(len(text), 400) / 400.0 * 0.5
            + (1.0 - CAST(len(list_filter(toks,
                x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS DOUBLE)
              / len(toks)) * 0.5 AS quality
          FROM qt),
        sz AS (SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY cluster_id),
        best AS (SELECT l.cluster_id, l.doc_id AS canonical_id, q.quality
                 FROM labels l JOIN qual q USING (doc_id)
                 QUALIFY row_number() OVER (
                   PARTITION BY l.cluster_id ORDER BY q.quality DESC, l.doc_id) = 1)
        SELECT b.cluster_id, b.canonical_id, b.quality, sz.cluster_size
        FROM best b JOIN sz USING (cluster_id) ORDER BY cluster_id""".replaceAll("\\s+", " ")
  }

  private lazy val q101OracleSql: String = {
        val q73 = oracleSqlBase("q73_dedup_clusters")
        val labelsTail =
          """SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach
             GROUP BY id ORDER BY doc_id""".replaceAll("\\s+", " ")
        require(q73.endsWith(labelsTail), "q73 oracle tail changed; update q101")
        q73.stripSuffix(labelsTail).trim + "," +
          raw""" labels AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
             surv AS (SELECT a.doc_id, a.text FROM aug a LEFT JOIN labels l ON a.doc_id = l.doc_id
                      WHERE l.doc_id IS NULL OR l.cluster_id = a.doc_id),
             tp AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tks FROM surv),
             g3 AS (SELECT doc_id, unnest(list_distinct(
                      [tks[i] || ' ' || tks[i+1] || ' ' || tks[i+2] for i in range(1, len(tks) - 1)])) AS g
                    FROM tp),
             h3 AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS hg FROM g3),
             tr3 AS (SELECT * FROM h3 WHERE doc_id % 37 <> 0),
             ev3 AS (SELECT * FROM h3 WHERE doc_id % 37 = 0),
             bad3 AS (SELECT tr3.doc_id AS train_id
                      FROM tr3 JOIN ev3 ON tr3.hg = ev3.hg
                      GROUP BY tr3.doc_id, ev3.doc_id HAVING count(*) >= 2),
             rel AS (SELECT s.doc_id, s.text FROM surv s WHERE s.doc_id % 37 <> 0
                     AND s.doc_id NOT IN (SELECT train_id FROM bad3)),
             t2 AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks2 FROM rel),
             base2 AS (SELECT doc_id, len(toks2) AS n_tokens,
                         len(list_distinct(toks2)) AS n_distinct FROM t2),
             tc2 AS (SELECT doc_id, unnest(toks2) AS tok FROM t2),
             top2 AS (SELECT doc_id, max(c) AS top_cnt
                      FROM (SELECT doc_id, tok, count(*) AS c FROM tc2 GROUP BY 1, 2)
                      GROUP BY doc_id),
             v2 AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM tc2 GROUP BY tok
                                     ORDER BY c DESC, tok ASC LIMIT 20)),
             oov2 AS (SELECT tc2.doc_id,
                        CAST(sum(CASE WHEN v2.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS oov_rate
                      FROM tc2 LEFT JOIN v2 ON tc2.tok = v2.tok GROUP BY tc2.doc_id),
             b2 AS (SELECT doc_id, unnest([toks2[i] || ' ' || toks2[i+1] for i in range(1, len(toks2))]) AS bg FROM t2),
             w2 AS (SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1 FROM b2),
             cb2 AS (SELECT bg, count(*) AS c2 FROM w2 GROUP BY bg),
             cu2 AS (SELECT w1, count(*) AS c1 FROM w2 GROUP BY w1),
             lm2 AS (SELECT w2.doc_id,
                       CAST(floor(CAST(sum(CAST(floor(-ln(CAST(cb2.c2 AS DOUBLE) / cu2.c1) * 1000000.0) AS BIGINT)) AS DOUBLE)
                         / count(*)) AS BIGINT) AS avg_nll_fp
                     FROM w2 JOIN cb2 ON w2.bg = cb2.bg JOIN cu2 ON w2.w1 = cu2.w1 GROUP BY w2.doc_id),
             sel2 AS (SELECT base2.doc_id, CAST(base2.n_tokens AS BIGINT) AS n_tokens,
                        base2.n_tokens >= 24 AS k1,
                        (CAST(base2.n_tokens - base2.n_distinct AS DOUBLE) / base2.n_tokens <= 0.65
                          AND CAST(top2.top_cnt AS DOUBLE) / base2.n_tokens <= 0.12) AS k2,
                        oov2.oov_rate <= 0.40 AS k3,
                        lm2.avg_nll_fp <= 3420000 AS k4
                      FROM base2 JOIN top2 ON base2.doc_id = top2.doc_id
                        JOIN oov2 ON base2.doc_id = oov2.doc_id
                        JOIN lm2 ON base2.doc_id = lm2.doc_id)
             SELECT doc_id, n_tokens,
               CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < 9000 THEN 'train'
                    WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < 9500 THEN 'val'
                    ELSE 'test' END AS split
             FROM sel2 WHERE k1 AND k2 AND k3 AND k4 ORDER BY doc_id""".replaceAll("\\s+", " ")
  }

  private lazy val q88OracleSqlEntry: String = {
    val q73 = oracleSqlBase("q73_dedup_clusters")
    val labelsTail =
      """SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach
         GROUP BY id ORDER BY doc_id""".replaceAll("\\s+", " ")
    require(q73.endsWith(labelsTail), "q73 oracle tail changed; update q88")
    q73.stripSuffix(labelsTail).trim + "," +
      """ labels AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY cluster_id)
         SELECT cluster_size, count(*) AS n_clusters
         FROM sizes GROUP BY cluster_size ORDER BY cluster_size""".replaceAll("\\s+", " ")
  }

  private lazy val q80OracleSqlEntry: String = {
    val q73 = oracleSqlBase("q73_dedup_clusters")
    val labelsTail =
      """SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach
         GROUP BY id ORDER BY doc_id""".replaceAll("\\s+", " ")
    require(q73.endsWith(labelsTail), "q73 oracle tail changed; update q80")
    q73.stripSuffix(labelsTail).trim + "," +
      """ labels AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id)
         SELECT a.doc_id, len(a.text) AS n_chars
         FROM aug a LEFT JOIN labels l ON a.doc_id = l.doc_id
         WHERE l.doc_id IS NULL OR l.cluster_id = a.doc_id
         ORDER BY a.doc_id""".replaceAll("\\s+", " ")
  }
}
