package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.operators.QualitySignals
import graft.sources.Tables

/** Text-analysis queries over `documents` (builder contract: token counting,
  * quality scoring, language-ID, fingerprinting). Oracle SQL mirrors every
  * expression step-for-step in DuckDB's list dialect; all ratios are single
  * IEEE divisions of exact integers so values hash-match.
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Index-size planning: what would delta + varint encoding save on
    // the gram inverted index, BEFORE building it — per df bucket:
    // terms, postings, raw 8-byte cost vs gap-varint cost, savings ppm.
    // Gaps come from one per-term window (parallel across terms; the
    // first posting encodes doc_id+1 as its gap from −1); varint bytes
    // are a 5-branch CASE ladder, exact int64 everywhere. The skew
    // story this table quantifies: high-df (boilerplate) terms have
    // dense, small-gap postings that compress hardest — the same terms
    // a df-cap would drop, so the planner and the cap read one table.
    "q238_postings_compression" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val post = Tables.documents(s, dir)
        .select(col("doc_id"), explode(Text.wordNgramsFromText(col("text"), 3)).as("gram"))
        .distinct()
      val gaps = post
        .withColumn("prev", lag(col("doc_id"), 1).over(
          Window.partitionBy("gram").orderBy("doc_id")))
        .withColumn("gap", when(col("prev").isNull, col("doc_id") + 1)
          .otherwise(col("doc_id") - col("prev")))
        .withColumn("vbytes",
          when(col("gap") < 128L, 1L).when(col("gap") < 16384L, 2L)
            .when(col("gap") < 2097152L, 3L)
            .when(col("gap") < 268435456L, 4L).otherwise(5L))
      gaps.groupBy("gram")
        .agg(count(lit(1)).as("df"), sum(col("vbytes")).as("vb"))
        .withColumn("df_bucket",
          when(col("df") <= 1, 1L).when(col("df") <= 2, 2L)
            .when(col("df") <= 4, 4L).when(col("df") <= 8, 8L)
            .when(col("df") <= 16, 16L).when(col("df") <= 32, 32L)
            .when(col("df") <= 64, 64L).when(col("df") <= 128, 128L)
            .when(col("df") <= 256, 256L).when(col("df") <= 512, 512L)
            .otherwise(1024L))
        .groupBy("df_bucket")
        .agg(count(lit(1)).as("n_terms"), sum(col("df")).as("n_postings"),
          (sum(col("df")) * 8).as("raw_bytes"), sum(col("vb")).as("varint_bytes"))
        .withColumn("savings_ppm",
          expr("((raw_bytes - varint_bytes) * 1000000) div raw_bytes"))
        .orderBy("df_bucket")
    }),
    // Linear quality probe: exact least-squares fit of token count on
    // character count per source — one map-side-combined pass carrying
    // five Gram sums per group, results as exact int64 rationals plus
    // the isqrt fixed-point Pearson r (10⁻⁴ grid — the exact R² rational
    // needs 128 bits and a typed cross-engine hash can't digest
    // decimal128), no iterative solver, no floats.
    "q175_linear_probe" -> ((s, dir) => {
      graft.operators.Regress.linearFitExact(
        Tables.documents(s, dir),
        col("source"), col("n_chars"), size(Text.tokens(col("text"))))
        .withColumnRenamed("grp", "source")
        .orderBy("source")
    }),
    // Calibration deciles for the q175 linear probe: fit on the fixed
    // 400-doc sample, score every sampled doc with the exact rational
    // prediction (pred_num over the shared determinant), cut into
    // ntile(10) deciles by predicted value, and report per-decile actual
    // vs predicted sums — monotone sum_y across deciles IS the
    // calibration check. The one ordered window runs on the 400-row
    // sample; everything is int64.
    "q192_probe_calibration" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir)
        .withColumn("y", size(Text.tokens(col("text"))).cast("long"))
        .select(col("doc_id"), col("n_chars").cast("long").as("x"), col("y"))
      val sample = graft.operators.Sampling.hashSampleTarget(d, col("doc_id"), 400L)
      val fit = sample
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
        .select(
          (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("den"),
          (col("sy") * col("sxx") - col("sx") * col("sxy")).as("intercept_num"))
      sample.crossJoin(broadcast(fit))
        .withColumn("pred_num",
          col("slope_num") * col("x") + col("intercept_num"))
        .withColumn("decile",
          ntile(10).over(Window.orderBy(col("pred_num"), col("doc_id"))))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"), sum(col("y")).as("sum_y"),
          sum(col("pred_num")).as("sum_pred_num"), min(col("den")).as("den"))
        .orderBy("decile")
    }),
    // Signal-redundancy audit: pairwise fixed-point Pearson correlation of
    // three quality signals (chars, tokens, distinct tokens) on a FIXED
    // 400-doc md5 sample (derived-rate — audit cost constant under corpus
    // growth, the q118 discipline). Highly-correlated signals gate the
    // same docs; a filter stack wants to know. One map-side-combined
    // Gram pass; r on the 10⁻⁴ grid via exact isqrt, no floats.
    "q179_signal_corr" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("toks", Text.tokens(col("text")))
      graft.operators.Regress.pearsonPairsFp(
        graft.operators.Sampling.hashSampleTarget(d, col("doc_id"), 400L),
        Seq(
          "chars" -> col("n_chars"),
          "dtoks" -> size(array_distinct(col("toks"))),
          "tokens" -> size(col("toks"))))
        .orderBy("x_name", "y_name")
    }),
    // Token statistics: whitespace tokens, BPE-ish tokens, distinct tokens,
    // mean token length. Pure per-row map — no shuffle except the final sort.
    "q27_token_stats" -> ((s, dir) => {
      val t = Text.tokens(col("text"))
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(t).as("n_tokens"),
        Text.bpeTokenCount(col("text")).as("n_bpe_tokens"),
        size(array_distinct(t)).as("n_distinct"),
        (Text.nonSpaceChars(col("text")).cast("double") / size(t)).as("mean_tok_len"))
        .orderBy("doc_id")
    }),
    // Quality scoring: length saturation + stopword density, rational only.
    "q28_quality_score" -> ((s, dir) => {
      val t = Text.tokens(col("text"))
      Tables.documents(s, dir).select(
        col("doc_id"),
        Text.tokenHits(t, Text.Stopwords).as("n_stopwords"),
        Text.qualityScore(col("text"), t).as("quality"))
        .orderBy("doc_id")
    }),
    // Language-ID heuristic: marker-token argmax with deterministic
    // tiebreak; accuracy summarized against the corpus label.
    "q29_lang_id" -> ((s, dir) => {
      val t = Text.tokens(col("text"))
      Tables.documents(s, dir)
        .select(col("lang"), Text.langId(col("text"), t).as("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_pred")
    }),
    // Winnowing-lite fingerprint: min md5'd char-8-shingle per doc, plus
    // collision groups (docs sharing a fingerprint = near-dup candidates).
    "q30_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        Text.minShingleFingerprint(col("text"), 8).as("fingerprint"))
        .orderBy("doc_id")
    }),
    // Corpus-level n-gram mining: top-20 word bigrams. Explode → two-phase
    // count (map-side partial agg) → global top-k with tiebreak. Bigram
    // construction is the native single-pass expression.
    "q31_top_bigrams" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(explode(Text.wordNgramsFromText(col("text"), 2)).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram").asc)
        .limit(20)
    })
    ,
    // TF-IDF: tf = term count / doc length, idf = ln(N / df), top-3 terms
    // per doc. Scores emitted fixed-point (floor·1e6): ln is libm-computed
    // in both engines and can differ in the last ulp, but distinct (tf, df)
    // pairs are separated far beyond an ulp so ranking and the fixed-point
    // values are stable; exact ties break on the term.
    "q64_tfidf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val terms = docs.select(col("doc_id"),
        explode(Text.tokens(col("text"))).as("term"))
      // corpus size rides in as a broadcast 1-row aggregate instead of a
      // plan-build-time count() — one job per execution, not two
      val n1 = docs.agg(count(lit(1)).cast("double").as("__n"))
      val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tc"))
        .join(terms.groupBy("doc_id").agg(count(lit(1)).as("dl")), "doc_id")
      val df = terms.select("doc_id", "term").distinct()
        .groupBy("term").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term").asc)
      tf.join(df, "term").crossJoin(broadcast(n1))
        .withColumn("score",
          (col("tc").cast("double") / col("dl")) * log(col("__n") / col("df")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("term"),
          floor(col("score") * 1e6).cast("long").as("score_fp"))
        .orderBy("doc_id", "rn")
    }),
    // BM25 keyword search (Robertson et al.; the Lucene idf variant):
    // top-15 docs for a fixed 3-term query, k1=1.2, b=0.75. Per-term
    // scores are floored to fixed-point BEFORE the per-doc sum (q79's
    // discipline — int64 addition commutes where raw doubles wouldn't),
    // and every float op is one IEEE step on exact-int inputs except ln,
    // which follows q64's ulp-separation argument. Scale shape: only the
    // query terms' postings ever leave the scan (the isin filter is the
    // inverted-index probe), df/avgdl are broadcast 1-row/3-row frames,
    // and the top-15 is a TakeOrderedAndProject.
    // PMI collocation mining (Church & Hanks 1990) — the statistic phrase
    // extraction ranks by, where q31's raw bigram counts only rank
    // frequency: pmi = ln(p(ab) / (p(a)·p(b))) over MLE estimates, as ONE
    // libm ln of ONE IEEE division of exact int64 cross-products (the
    // q64/q79 discipline), floored to fixed point. Support floor c(ab) ≥ 5
    // (PMI's low-count pathology), top-30 by (pmi, bigram). Three map-side-
    // combined count tables + two broadcast 1-row totals; at 100 TB the
    // cross-products move to log space — here they stay < 2^53.
    "q173_pmi_collocations" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val uni = docs.select(explode(Text.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      val bi = docs.select(explode(Text.wordNgramsFromText(col("text"), 2)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 5)
      val nUni = uni.agg(sum(col("c")).as("__nu"))
      val nBi = docs.select(explode(Text.wordNgramsFromText(col("text"), 2)).as("b"))
        .agg(count(lit(1)).as("__nb"))
      bi
        .withColumn("w1", substring_index(col("bigram"), " ", 1))
        .withColumn("w2", substring_index(col("bigram"), " ", -1))
        .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
        .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
        .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
        .withColumn("pmi_fp",
          floor(lit(1e6) * log(
            (col("c_ab") * col("__nu") * col("__nu")).cast("double") /
              (col("__nb") * col("c1") * col("c2")).cast("double")))
            .cast("long"))
        .select("bigram", "c_ab", "pmi_fp")
        .orderBy(col("pmi_fp").desc, col("bigram").asc)
        .limit(30)
    }),
    // Positional phrase search: exact-adjacency occurrences of the 2-term
    // phrase "part filter" via the positional postings join (the way
    // Lucene-style positional indexes evaluate phrase queries; q155's BM25
    // is the bag-of-words ranking this complements). Per-doc match count
    // + first occurrence position; only the two query terms' postings
    // leave the scan.
    "q164_phrase_search" -> ((s, dir) => {
      graft.operators.Search.phraseMatches(
        Tables.documents(s, dir), Seq("part", "filter"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_matches"), min(col("pos")).as("first_pos"))
        .orderBy("doc_id")
    }),
    // Source concentration (Pareto) table: per-source token mass ranked
    // largest-first with cumulative share — "how few feeds carry 80% of
    // the corpus" is the dependency-risk number a data-sourcing review
    // asks for. Shares stay exact integer cross-multiplications
    // (5·cum ≥ 4·total ⟺ ≥80%); the window runs over the source
    // DIMENSION frame.
    "q211_source_pareto" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val per = Tables.documents(s, dir)
        .withColumn("tok", size(Text.tokens(col("text"))).cast("long"))
        .groupBy("source").agg(sum(col("tok")).as("toks"))
      val tot = per.agg(sum(col("toks")).as("total"))
      per.crossJoin(broadcast(tot))
        .withColumn("rank",
          row_number().over(Window.orderBy(col("toks").desc, col("source"))))
        .withColumn("cum_toks",
          sum(col("toks")).over(Window.orderBy(col("toks").desc, col("source"))))
        .withColumn("in_top80", lit(5L) * (col("cum_toks") - col("toks")) < lit(4L) * col("total"))
        .select("rank", "source", "toks", "cum_toks", "total", "in_top80")
        .orderBy("rank")
    }),
    // Distribution-drift monitor: population stability index of the
    // doc-length distribution, corpus vs incoming batch (the augmented
    // near/exact copies — a genuinely shifted length profile). Fixed
    // 100-char bins, Laplace-smoothed exact-integer shares, one ln per
    // bin (the q79 discipline), psi contribution floored to 1e-6 grid;
    // psi_total repeated per row from a bounded window. PSI > 0.2 is the
    // standard "retrain/re-examine" alarm.
    "q209_length_psi" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val aug = Tables.documents(s, dir).select(length(col("text")).as("len"))
        .withColumn("side", lit("base"))
        .unionByName(Tables.documents(s, dir)
          .filter(col("doc_id") % 7 === 0)
          .select((length(col("text")) - 14).as("len"))
          .withColumn("side", lit("inc")))
      // sign-safe bin (the q235 convention): the -14 shift can push a
      // hypothetical sub-14-char doc negative, where Spark's div and
      // DuckDB's // disagree; current corpus min length is 44, so the
      // branch is dead on real data and the hash is unchanged
      val binned = aug.withColumn("bin",
        expr("CASE WHEN len < 0 THEN -((-len) div 100) ELSE len div 100 END"))
        .groupBy("bin")
        .agg(count_if(col("side") === "base").as("n_base"),
          count_if(col("side") === "inc").as("n_inc"))
      val tot = binned.agg(sum(col("n_base")).as("tb"), sum(col("n_inc")).as("ti"),
        count(lit(1)).as("nbins"))
      binned.crossJoin(broadcast(tot))
        .withColumn("p", (col("n_base") + 1).cast("double") / (col("tb") + col("nbins")))
        .withColumn("q", (col("n_inc") + 1).cast("double") / (col("ti") + col("nbins")))
        .withColumn("psi_fp",
          floor(lit(1e6) * (col("p") - col("q")) * log(col("p") / col("q"))).cast("long"))
        .withColumn("psi_total_fp", sum(col("psi_fp")).over(Window.partitionBy()))
        .select("bin", "n_base", "n_inc", "psi_fp", "psi_total_fp")
        .orderBy("bin")
    }),
    // Deterministic eval-set construction: per language, the 10 docs
    // with the LOWEST md5 buckets (hash order ⇒ unbiased, stable under
    // corpus growth; doc_id tie-break) selected by the native
    // TopKPerGroup plan — groups×k rows cross the wire, never a full
    // sort. The per-stratum floor a benchmark suite needs even for rare
    // languages; coverage shortfall is visible as n_docs < 10.
    "q208_eval_set" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"),
          graft.operators.Sampling.hashBucket(col("doc_id")).as("bucket"))
      graft.operators.Analytics.topKPerGroupNative(
        d, Seq("lang"), Seq(("bucket", false), ("doc_id", false)), k = 10)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"),
          max(col("bucket")).as("max_bucket"))
        .orderBy("lang")
    }),
    // Diversity-return curve: distinct word-trigram coverage of the
    // corpus slices above quality-score thresholds (q75/q50/q25/all) —
    // "how much lexical diversity does each quality cut retain" is the
    // number that arbitrates aggressive quality filtering vs coverage.
    // Fixed thresholds (no global percentile window); one exploded pass
    // with four conditional count-distincts.
    "q200_diversity_curve" -> ((s, dir) => {
      // "distinct grams among docs with qfp ≥ t" ≡ "grams whose MAX doc
      // qfp ≥ t": one per-gram max aggregation + plain conditional
      // counts, instead of 8 countDistincts (whose Expand rewrite
      // multiplies the exploded frame 8×). Doc counts need no distinct
      // at all (doc_id is unique pre-explode).
      val t = Text.tokens(col("text"))
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          floor(Text.qualityScore(col("text"), t) * 1e4).cast("long").as("qfp"),
          Text.wordNgramsFromText(col("text"), 3).as("grams"))
      val docCounts = docs.agg(
        count_if(col("qfp") >= 7500).as("docs_q75"),
        count_if(col("qfp") >= 5000).as("docs_q50"),
        count_if(col("qfp") >= 2500).as("docs_q25"),
        count(lit(1)).as("docs_all"))
      val gramCounts = docs
        .select(col("qfp"), explode(col("grams")).as("g"))
        .groupBy("g").agg(max(col("qfp")).as("mq"))
        .agg(
          count_if(col("mq") >= 7500).as("grams_q75"),
          count_if(col("mq") >= 5000).as("grams_q50"),
          count_if(col("mq") >= 2500).as("grams_q25"),
          count(lit(1)).as("grams_all"))
      docCounts.crossJoin(gramCounts)
        .select("docs_q75", "grams_q75", "docs_q50", "grams_q50",
          "docs_q25", "grams_q25", "docs_all", "grams_all")
    }),
    // Sparse tf-idf cosine pairs: docs as tf·idf vectors over word
    // TRIGRAMS (the 31-word vocab makes unigram df useless; the trigram
    // space is where df discriminates), dot products through the shared-
    // term postings join under the df≤8 production dial, cosine in fixed
    // point via exact isqrt. The weighted companion of q36's Jaccard:
    // shared boilerplate scores low, shared RARE content scores high.
    "q189_tfidf_cosine" -> ((s, dir) => {
      graft.operators.TextDedup.tfidfCosinePairs(
        Tables.documents(s, dir), "doc_id",
        Text.wordNgramsFromText(col("text"), 3), maxDf = 8L)
        .orderBy(col("cos_fp").desc, col("doc_a").asc, col("doc_b").asc)
        .limit(20)
    }),
    // PMI query expansion → BM25: each seed term ("table", "join") pulls
    // in its strongest collocate from the q173 PMI table (in-plan, no
    // driver trip), and q155's BM25 scores the expanded term set (the
    // term frame broadcasts as the index probe). Wrong expansion ⇒ wrong
    // scores ⇒ hash mismatch, so the expansion rule itself is gated.
    "q184_query_expansion" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val terms = graft.operators.Search.pmiExpand(docs, Seq("table", "join"))
      graft.operators.Search.bm25Terms(docs, terms)
        .orderBy(col("bm25_fp").desc, col("doc_id").asc)
        .limit(15)
    }),
    "q155_bm25_search" -> ((s, dir) => {
      graft.operators.Search.bm25(
        Tables.documents(s, dir), Seq("table", "join", "stream"))
        .orderBy(col("bm25_fp").desc, col("doc_id").asc)
        .limit(15)
    }),
    // q155 with INCREMENTALLY-MAINTAINED index stats: the corpus's df /
    // doc-length / total tables merge with a batch's by exact-integer
    // addition (a batch append costs one pass over the BATCH, never a
    // corpus recount) and scoring runs on the merged stats — byte-
    // identical to the one-shot build by construction, so it runs under
    // q155's oracle and the hash gate itself proves incremental == batch
    // (the q132/q137 discipline).
    "q157_bm25_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.Search.bm25Incremental(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        Seq("table", "join", "stream"))
        .orderBy(col("bm25_fp").desc, col("doc_id").asc)
        .limit(15)
    }),
    // Train/test decontamination: docs sharing >= 2 distinct word trigrams
    // with the held-out slice (doc_id % 37 = 0 stands in for the eval set).
    // Test-side n-gram index broadcast; train side never shuffles raw text.
    "q68_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.TextDedup.contaminationPairs(
        docs.filter(col("doc_id") % 37 =!= 0),
        docs.filter(col("doc_id") % 37 === 0),
        "doc_id", "text", n = 3, minShared = 2)
        .orderBy("train_id", "test_id")
    }),
    // Production-configuration decontamination: identical semantics to q68
    // but joining on 60-bit md5-prefix keys — one long per n-gram instead
    // of tens of bytes of text, the wire format a production-sized eval
    // index broadcasts with. The oracle performs the same hashed join, so
    // this configuration is hash-verified rather than only spec-matched to
    // string mode.
    "q75_decontaminate_hashed" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.TextDedup.contaminationPairs(
        docs.filter(col("doc_id") % 37 =!= 0),
        docs.filter(col("doc_id") % 37 === 0),
        "doc_id", "text", n = 3, minShared = 2, hashGrams = true)
        .orderBy("train_id", "test_id")
    }),
    // The eval-set-too-big-to-broadcast configuration: identical semantics
    // to q75, but the join is a shuffle join and the train side is pruned
    // MAP-SIDE by a Bloom filter over the eval grams (Spark's own
    // BloomFilterAggregate/BloomFilterMightContain, applied explicitly) —
    // the shuffle carries only probable hits, false positives die in the
    // exact equi-join, so the oracle is q75's verbatim.
    "q113_decontaminate_bloom" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.TextDedup.contaminationPairsBloom(
        docs.filter(col("doc_id") % 37 =!= 0),
        docs.filter(col("doc_id") % 37 === 0),
        "doc_id", "text", n = 3, minShared = 2, expectedTestGrams = 100000L)
        .orderBy("train_id", "test_id")
    }),
    // WHO leaks: the q75 pair frame rolled up to a (train source × eval
    // source) matrix — pairs, distinct offending train docs, distinct eval
    // docs hit, total shared grams. The audit that points at a supplier
    // rather than a document; q109 is the per-doc drilldown.
    "q122_contamination_matrix" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = graft.operators.TextDedup.contaminationPairs(
        docs.filter(col("doc_id") % 37 =!= 0),
        docs.filter(col("doc_id") % 37 === 0),
        "doc_id", "text", n = 3, minShared = 2, hashGrams = true)
      pairs
        .join(docs.select(col("doc_id").as("train_id"),
          col("source").as("train_source")), "train_id")
        .join(broadcast(docs.filter(col("doc_id") % 37 === 0)
          .select(col("doc_id").as("test_id"),
            col("source").as("eval_source"))), "test_id")
        .groupBy("train_source", "eval_source")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct("train_id").as("n_train_docs"),
          countDistinct("test_id").as("n_eval_docs"),
          sum("n_shared").as("total_shared"))
        .orderBy("train_source", "eval_source")
    }),
    // The audit REPORT side of decontamination: one row per eval doc —
    // how many train docs hit it, the worst overlap, total shared grams —
    // with clean docs present at zero (an eval-integrity review needs to
    // see the zeros, not just the hits). Rollup of the q75 pair frame;
    // the eval slice is tiny, so the completing left join broadcasts.
    "q109_contamination_report" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = graft.operators.TextDedup.contaminationPairs(
        docs.filter(col("doc_id") % 37 =!= 0),
        docs.filter(col("doc_id") % 37 === 0),
        "doc_id", "text", n = 3, minShared = 2, hashGrams = true)
      val perEval = pairs.groupBy("test_id")
        .agg(count(lit(1)).as("n_train_hits"),
          max("n_shared").as("max_shared"),
          sum("n_shared").as("total_shared"))
      docs.filter(col("doc_id") % 37 === 0)
        .select(col("doc_id").as("test_id"))
        .join(perEval, Seq("test_id"), "left")
        .na.fill(0L, Seq("n_train_hits", "max_shared", "total_shared"))
        .orderBy("test_id")
    }),
    // Gopher/C4-style repetition quality filters: duplicate-token fraction
    // and most-common-token dominance, plus the keep decision. The top-token
    // count is a real two-level aggregation (doc×token → doc), both with
    // map-side combine — the 100 TB shape, not a per-row O(L²) fold.
    "q69_quality_filters" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val t = Text.tokens(col("text"))
      val base = docs.select(
        col("doc_id"), size(t).as("n_tokens"), size(array_distinct(t)).as("n_distinct"))
      val top = docs.select(col("doc_id"), explode(t).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max(col("c")).as("top_cnt"))
      base.join(top, "doc_id")
        .select(
          col("doc_id"), col("n_tokens"), col("n_distinct"), col("top_cnt"),
          ((col("n_tokens") - col("n_distinct")).cast("double") / col("n_tokens"))
            .as("dup_frac"),
          (col("top_cnt").cast("double") / col("n_tokens")).as("top_frac"))
        .withColumn("keep",
          col("n_tokens") >= 40 && col("dup_frac") <= 0.65 && col("top_frac") <= 0.12)
        .orderBy("doc_id")
    }),
    // Gopher's n-gram repetition rules (Rae et al. 2021 Table A1 — the
    // 2-gram/5-gram char-fraction pair q69's unigram signals don't see):
    // most-common-2gram char coverage + duplicated-5gram char coverage,
    // keep decided by integer cross-multiplication. Every 13th doc is
    // augmented with its own first-10-word passage twice — planted
    // WITHIN-doc repetition (the raw synthetic corpus has zero duplicate
    // 5-grams, so the dup rule would otherwise never fire and the oracle
    // would be vacuous).
    "q148_repetition_filters" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val rep = concat_ws(" ", slice(Text.tokens(col("text")), 1, 10))
      val aug = d.withColumn("text",
        when(col("doc_id") % 13 === 0,
          concat(col("text"), lit(" "), rep, lit(" "), rep))
          .otherwise(col("text")))
      QualitySignals.repetitionSignals(aug).orderBy("doc_id")
    }),
    // Token-entropy quality signal: H = -Σ (c/n)·ln(c/n) over the doc's
    // token distribution (low entropy = repetitive/template text). Each
    // TERM is floored to fixed-point BEFORE summing — int64 addition is
    // associative, so the nondeterministic aggregation order cannot move
    // the result the way summing raw libm doubles could.
    "q72_token_entropy" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val counts = docs.select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val n = counts.groupBy("doc_id").agg(sum(col("c")).as("n"))
      counts.join(n, "doc_id")
        .withColumn("p", col("c").cast("double") / col("n"))
        .withColumn("term_fp", floor(-col("p") * log(col("p")) * 1e6).cast("long"))
        .groupBy("doc_id")
        .agg(sum(col("term_fp")).as("entropy_fp"),
          count(lit(1)).as("n_distinct_tokens"))
        .orderBy("doc_id")
    }),
    // Corpus snapshot diff (data versioning): v2 drops every 11th doc,
    // rewrites every 17th surviving doc, and adds the perturbed copies —
    // the diff classifies ids as added/removed/changed/unchanged by
    // comparing content hashes across a full outer join on the id. One
    // shuffle per side on the id; at 100 TB both snapshots would be
    // bucketed by id and the join co-locates. The md5 comparison never
    // moves text, only 128-bit digests.
    "q86_corpus_diff" -> ((s, dir) => {
      val v1 = Tables.documents(s, dir).select("doc_id", "text")
      val v2 = v1.filter(col("doc_id") % 11 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 17 === 0, expr("substring(text, 8)")).otherwise(col("text")))
        .unionByName(v1.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      v1.select(col("doc_id"), md5(col("text")).as("h1"))
        .join(v2.select(col("doc_id"), md5(col("text")).as("h2")), Seq("doc_id"), "full_outer")
        .withColumn("status",
          when(col("h1").isNull, "added")
            .when(col("h2").isNull, "removed")
            .when(col("h1") === col("h2"), "unchanged")
            .otherwise("changed"))
        .groupBy("status")
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy("status")
    }),
    // Length-outlier trimming: keep docs inside their LANGUAGE's exact
    // [p5, p95] token-count band (per-stratum outlier removal, the
    // length-filter step of a C4-style cleanup). Exact sort-based
    // percentile per group (the q61/q50 exact-vs-sketch tradeoff); the
    // 5-row bounds table broadcasts, so the probe side never shuffles.
    "q82_length_trim" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val sized = docs.select(col("doc_id"), col("lang"),
        size(Text.tokens(col("text"))).as("n_tokens"))
      val bounds = sized.groupBy("lang").agg(
        expr("percentile(n_tokens, 0.05)").as("p05"),
        expr("percentile(n_tokens, 0.95)").as("p95"))
      sized.join(broadcast(bounds), "lang")
        .filter(col("n_tokens") >= col("p05") && col("n_tokens") <= col("p95"))
        .select("doc_id", "lang", "n_tokens")
        .orderBy("doc_id")
    }),
    // Vocabulary coverage / OOV-rate: fraction of each doc's tokens outside
    // the corpus top-20 vocabulary (deterministic top-k: count desc, token
    // asc). The vocab is broadcast — the token stream is scored map-side,
    // the shape a fixed-tokenizer coverage check has at 100 TB.
    "q83_oov_rate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = docs.select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok").asc).limit(20)
        .select(col("tok"), lit(1).as("__in"))
      toks.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_tokens"),
          sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))
        .orderBy("doc_id")
    }),
    // Corpus-LM quality signal (CCNet-style): score every doc by the mean
    // negative log-likelihood of its bigrams under the corpus's own MLE
    // bigram model, P(w2|w1) = c(w1 w2)/c(w1 ·). High avg NLL = surprising
    // text (noise, boilerplate-free junk); low = templated. Each -ln term
    // is floored to fixed-point BEFORE summing (the q72 rule: int64 adds
    // commute, raw libm doubles don't). Shapes: the two count tables are
    // map-side-combinable aggs; the scoring joins shuffle on bigram / w1
    // (at 100 TB the LM tables are precomputed + bucketed artifacts).
    "q79_lm_score" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val bi = docs.select(col("doc_id"),
        explode(Text.wordNgramsFromText(col("text"), 2)).as("bg"))
        .withColumn("w1", substring_index(col("bg"), " ", 1))
      val c2 = bi.groupBy("bg").agg(count(lit(1)).as("c2"))
      val c1 = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
      bi.join(c2, "bg").join(c1, "w1")
        .withColumn("term_fp",
          floor(-log(col("c2").cast("double") / col("c1")) * 1e6).cast("long"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum(col("term_fp")).as("nll_fp"))
        .withColumn("avg_nll_fp",
          floor(col("nll_fp").cast("double") / col("n_bigrams")).cast("long"))
        .orderBy("doc_id")
    }),
    // The shipped filter cascade: min-length → repetition → OOV → corpus-
    // LM, reported as the attrition funnel (docs and tokens surviving
    // each stage) that a dataset card publishes. Signal formulas are the
    // oracle-proven q69/q83/q79 shapes; the funnel itself is one 1-row
    // aggregation over the doc-level booleans plus a literal 5-row
    // unpivot — nothing per-doc leaves the executors.
    "q97_filter_funnel" -> ((s, dir) => {
      val sel = graft.operators.QualitySignals.funnelFlags(Tables.documents(s, dir))
      val a = sel.agg(
        count(lit(1)).as("d0"), sum(col("n_tokens")).as("t0"),
        count(when(col("k1"), 1)).as("d1"),
        sum(when(col("k1"), col("n_tokens"))).as("t1"),
        count(when(col("k1") && col("k2"), 1)).as("d2"),
        sum(when(col("k1") && col("k2"), col("n_tokens"))).as("t2"),
        count(when(col("k1") && col("k2") && col("k3"), 1)).as("d3"),
        sum(when(col("k1") && col("k2") && col("k3"), col("n_tokens"))).as("t3"),
        count(when(col("k1") && col("k2") && col("k3") && col("k4"), 1)).as("d4"),
        sum(when(col("k1") && col("k2") && col("k3") && col("k4"), col("n_tokens"))).as("t4"))
      a.select(explode(array(
          struct(lit(0).as("stage_idx"), lit("all").as("stage"),
            col("d0").as("n_docs"), col("t0").as("n_tokens")),
          struct(lit(1).as("stage_idx"), lit("min_length").as("stage"),
            col("d1").as("n_docs"), col("t1").as("n_tokens")),
          struct(lit(2).as("stage_idx"), lit("repetition").as("stage"),
            col("d2").as("n_docs"), col("t2").as("n_tokens")),
          struct(lit(3).as("stage_idx"), lit("oov").as("stage"),
            col("d3").as("n_docs"), col("t3").as("n_tokens")),
          struct(lit(4).as("stage_idx"), lit("lm").as("stage"),
            col("d4").as("n_docs"), col("t4").as("n_tokens")))).as("f"))
        .select("f.*").orderBy("stage_idx")
    }),
    // The contamination DECISION applied: the releasable training corpus —
    // train docs sharing >= 2 trigrams with the eval set are dropped via a
    // left-anti join on the (tiny, broadcastable) contaminated-id set.
    // Uses the hashed-gram production configuration end-to-end.
    "q81_decontaminate_apply" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val train = docs.filter(col("doc_id") % 37 =!= 0)
      val contaminated = graft.operators.TextDedup.contaminationPairs(
        train, docs.filter(col("doc_id") % 37 === 0),
        "doc_id", "text", n = 3, minShared = 2, hashGrams = true)
        .select(col("train_id").as("doc_id")).distinct()
      train.join(contaminated, Seq("doc_id"), "left_anti")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),
    // Sequence packing for training: docs fill context windows of 2048
    // tokens in doc_id order within each language — streaming first-fit,
    // the shape TPU/GPU input pipelines use. bin = floor(fill-before/cap)
    // via a running-total window; cap = 2^11 so the double division is
    // exact for any int64 < 2^53. Window is per-language (parallel across
    // strata; at 100 TB you pack within (shard, lang) partitions), and the
    // rollup aggregates bins with map-side combine.
    "q78_pack_sequences" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val sized = docs.select(col("lang"), col("doc_id"),
        size(Text.tokens(col("text"))).as("n_tokens"))
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sized.withColumn("cum", sum(col("n_tokens")).over(w))
        .withColumn("bin",
          floor((col("cum") - col("n_tokens")).cast("double") / 2048.0).cast("long"))
        .groupBy("lang", "bin")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens").cast("long")).as("total_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy("lang", "bin")
    }),
    // Data-mix rebalancing: deterministic stratified downsampling by
    // language (keep 80% en, 30% zh, 50% otherwise) via md5-bucket
    // membership — reproducible across engines/runs/cluster sizes, which
    // is why it can sit under the oracle gate while RNG sampling cannot.
    "q74_stratified_sample" -> ((s, dir) => {
      graft.operators.Sampling.stratifiedHashSample(
        Tables.documents(s, dir).select("doc_id", "lang", "n_chars"),
        key = col("doc_id"), stratum = col("lang"),
        rates = Map("en" -> 0.8, "zh" -> 0.3), default = 0.5)
        .orderBy("doc_id")
    }),
    // Dataset card: the per-(source, lang) corpus summary a dataset owner
    // publishes — doc/token volumes, length spread, and the survival rate
    // of a repetition filter (dup-token fraction + min length; q69 adds
    // top-token dominance, which needs its own agg level). One pass + one
    // rollup, all map-side combinable; single exact divisions only.
    "q70_dataset_card" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val t = Text.tokens(col("text"))
      val perDoc = docs.select(
        col("source"), col("lang"), col("n_chars"),
        size(t).as("n_tokens"), size(array_distinct(t)).as("n_distinct"))
        .withColumn("keep",
          col("n_tokens") >= 40 &&
            ((col("n_tokens") - col("n_distinct")).cast("double") / col("n_tokens")) <= 0.65)
      perDoc.groupBy("source", "lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens").cast("long")).as("total_tokens"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          sum(col("keep").cast("long")).as("n_kept"))
        .withColumn("keep_rate", col("n_kept").cast("double") / col("n_docs"))
        .orderBy("source", "lang")
    })
  )

  private val oracleSqlBase: Map[String, String] = Map(
    "q238_postings_compression" ->
      raw"""WITH post AS (SELECT DISTINCT doc_id, gram FROM (
              SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                     for i in range(1, greatest(len(toks) - 1, 1))]) AS gram
              FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                    FROM documents))),
          g AS (SELECT gram, doc_id,
              coalesce(doc_id - lag(doc_id) OVER (PARTITION BY gram ORDER BY doc_id),
                doc_id + 1) AS gap
            FROM post),
          v AS (SELECT gram, CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2
                  WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4
                  ELSE 5 END AS vbytes
                FROM g),
          t AS (SELECT gram, CAST(count(*) AS BIGINT) AS df,
                  CAST(sum(vbytes) AS BIGINT) AS vb
                FROM v GROUP BY gram),
          b AS (SELECT CASE WHEN df <= 1 THEN 1 WHEN df <= 2 THEN 2
                  WHEN df <= 4 THEN 4 WHEN df <= 8 THEN 8 WHEN df <= 16 THEN 16
                  WHEN df <= 32 THEN 32 WHEN df <= 64 THEN 64
                  WHEN df <= 128 THEN 128 WHEN df <= 256 THEN 256
                  WHEN df <= 512 THEN 512 ELSE 1024 END AS df_bucket, df, vb
                FROM t)
          SELECT CAST(df_bucket AS BIGINT) AS df_bucket,
            CAST(count(*) AS BIGINT) AS n_terms,
            CAST(sum(df) AS BIGINT) AS n_postings,
            CAST(sum(df) * 8 AS BIGINT) AS raw_bytes,
            CAST(sum(vb) AS BIGINT) AS varint_bytes,
            CAST(((sum(df) * 8 - sum(vb)) * 1000000) // (sum(df) * 8) AS BIGINT)
              AS savings_ppm
          FROM b GROUP BY df_bucket ORDER BY df_bucket""".replaceAll("\\s+", " "),
    "q175_linear_probe" ->
      raw"""WITH pts AS (SELECT source,
              CAST(n_chars AS BIGINT) AS x,
              CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS y
            FROM documents),
          g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              CAST(sum(x * x) AS BIGINT) AS sxx,
              CAST(sum(x * y) AS BIGINT) AS sxy,
              CAST(sum(y * y) AS BIGINT) AS syy
            FROM pts GROUP BY source),
          fit AS (SELECT source, n,
              n * sxy - sx * sy AS slope_num,
              n * sxx - sx * sx AS den,
              sy * sxx - sx * sxy AS intercept_num,
              n * syy - sy * sy AS syy_c
            FROM g),
          r0 AS (SELECT *,
              CAST(floor(sqrt(CAST(den AS DOUBLE))) AS BIGINT) AS ra,
              CAST(floor(sqrt(CAST(syy_c AS DOUBLE))) AS BIGINT) AS rb
            FROM fit),
          r1 AS (SELECT *,
              ra + (CASE WHEN (ra+1)*(ra+1) <= den THEN 1 ELSE 0 END)
                 - (CASE WHEN ra*ra > den THEN 1 ELSE 0 END) AS sa,
              rb + (CASE WHEN (rb+1)*(rb+1) <= syy_c THEN 1 ELSE 0 END)
                 - (CASE WHEN rb*rb > syy_c THEN 1 ELSE 0 END) AS sb
            FROM r0)
          SELECT source, n, slope_num, den, intercept_num,
            CASE WHEN sa * sb = 0 THEN NULL
                 WHEN slope_num < 0
                   THEN -least(10000, (10000 * (-slope_num)) // (sa * sb))
                 ELSE least(10000, (10000 * slope_num) // (sa * sb)) END AS r_fp
          FROM r1 ORDER BY source""".replaceAll("\\s+", " "),
    "q192_probe_calibration" ->
      raw"""WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
              CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS y
            FROM documents),
          th AS (SELECT least(10000, (10000 * 400) // count(*)) AS t FROM d),
          s AS (SELECT doc_id, x, y FROM d, th
                WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < t),
          g AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
            FROM s),
          f AS (SELECT n * sxy - sx * sy AS slope_num,
              n * sxx - sx * sx AS den,
              sy * sxx - sx * sxy AS intercept_num FROM g),
          sc AS (SELECT s.doc_id, s.y,
              f.slope_num * s.x + f.intercept_num AS pred_num, f.den
            FROM s, f),
          dec AS (SELECT *, ntile(10) OVER (ORDER BY pred_num, doc_id) AS decile FROM sc)
          SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(y) AS BIGINT) AS sum_y,
            CAST(sum(pred_num) AS BIGINT) AS sum_pred_num, min(den) AS den
          FROM dec GROUP BY decile ORDER BY decile""".replaceAll("\\s+", " "),
    "q179_signal_corr" ->
      raw"""WITH d AS (SELECT doc_id, n_chars AS chars,
              len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS dtoks,
              len(regexp_split_to_array(trim(text), '\s+')) AS tokens
            FROM documents),
          th AS (SELECT least(10000, (10000 * 400) // count(*)) AS t FROM d),
          s AS (SELECT chars, dtoks, tokens FROM d, th
                WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < t),
          g AS (SELECT CAST(count(*) AS BIGINT) AS n,
              sum(chars) AS s_c, sum(dtoks) AS s_d, sum(tokens) AS s_t,
              sum(chars*chars) AS s_cc, sum(dtoks*dtoks) AS s_dd, sum(tokens*tokens) AS s_tt,
              sum(chars*dtoks) AS s_cd, sum(chars*tokens) AS s_ct, sum(dtoks*tokens) AS s_dt
            FROM s),
          p AS (
            SELECT 'chars' AS x_name, 'dtoks' AS y_name, n,
              n*s_cd - s_c*s_d AS num, n*s_cc - s_c*s_c AS dx, n*s_dd - s_d*s_d AS dy FROM g
            UNION ALL SELECT 'chars', 'tokens', n,
              n*s_ct - s_c*s_t, n*s_cc - s_c*s_c, n*s_tt - s_t*s_t FROM g
            UNION ALL SELECT 'dtoks', 'tokens', n,
              n*s_dt - s_d*s_t, n*s_dd - s_d*s_d, n*s_tt - s_t*s_t FROM g),
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
    "q148_repetition_filters" ->
      raw"""WITH d0 AS (SELECT doc_id, text,
              regexp_split_to_array(trim(text), '\s+') AS ws0 FROM documents),
          d1 AS (SELECT doc_id,
              CASE WHEN doc_id % 13 = 0
                THEN text || ' ' || array_to_string(ws0[1:10], ' ')
                          || ' ' || array_to_string(ws0[1:10], ' ')
                ELSE text END AS text FROM d0),
          d AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS text_chars,
              regexp_split_to_array(trim(text), '\s+') AS ws FROM d1),
          g2 AS (SELECT doc_id,
              unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS gram
            FROM d),
          c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2),
          t2 AS (SELECT doc_id, CAST(cnt * length(gram) AS BIGINT) AS top2_chars
            FROM c2
            QUALIFY row_number() OVER (PARTITION BY doc_id
              ORDER BY cnt DESC, gram ASC) = 1),
          g5 AS (SELECT doc_id,
              unnest([array_to_string(ws[i:i+4], ' ') for i in range(1, len(ws) - 3)]) AS gram
            FROM d),
          c5 AS (SELECT doc_id, gram, count(*) AS cnt FROM g5 GROUP BY 1, 2),
          d5 AS (SELECT doc_id, CAST(sum(cnt * length(gram)) AS BIGINT) AS dup5_chars
            FROM c5 WHERE cnt >= 2 GROUP BY 1)
          SELECT d.doc_id, d.text_chars,
            coalesce(t2.top2_chars, 0) AS top2_chars,
            coalesce(d5.dup5_chars, 0) AS dup5_chars,
            (coalesce(t2.top2_chars, 0) * 100 <= d.text_chars * 20
             AND coalesce(d5.dup5_chars, 0) * 100 <= d.text_chars * 50) AS keep
          FROM d LEFT JOIN t2 USING (doc_id) LEFT JOIN d5 USING (doc_id)
          ORDER BY doc_id""".replaceAll("\\s+", " "),
    "q211_source_pareto" ->
      raw"""WITH per AS (SELECT source,
              CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS toks
            FROM documents GROUP BY source),
          t AS (SELECT CAST(sum(toks) AS BIGINT) AS total FROM per),
          r AS (SELECT source, toks,
              row_number() OVER (ORDER BY toks DESC, source) AS rank,
              CAST(sum(toks) OVER (ORDER BY toks DESC, source
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_toks
            FROM per)
          SELECT rank, source, toks, cum_toks, t.total,
            5 * (cum_toks - toks) < 4 * t.total AS in_top80
          FROM r, t ORDER BY rank""".replaceAll("\\s+", " "),
    "q209_length_psi" ->
      """WITH a AS (SELECT length(text) AS len, 'base' AS side FROM documents
            UNION ALL SELECT length(text) - 14, 'inc' FROM documents WHERE doc_id % 7 = 0),
          b AS (SELECT CASE WHEN len < 0 THEN -((-len) // 100) ELSE len // 100 END AS bin,
              CAST(count(*) FILTER (side = 'base') AS BIGINT) AS n_base,
              CAST(count(*) FILTER (side = 'inc') AS BIGINT) AS n_inc
            FROM a GROUP BY 1),
          t AS (SELECT CAST(sum(n_base) AS BIGINT) AS tb,
              CAST(sum(n_inc) AS BIGINT) AS ti,
              CAST(count(*) AS BIGINT) AS nbins FROM b),
          c AS (SELECT bin, n_base, n_inc,
              CAST(n_base + 1 AS DOUBLE) / (tb + nbins) AS p,
              CAST(n_inc + 1 AS DOUBLE) / (ti + nbins) AS q
            FROM b, t),
          d AS (SELECT bin, n_base, n_inc,
              CAST(floor(1e6 * (p - q) * ln(p / q)) AS BIGINT) AS psi_fp FROM c)
          SELECT bin, n_base, n_inc, psi_fp,
            CAST(sum(psi_fp) OVER () AS BIGINT) AS psi_total_fp
          FROM d ORDER BY bin""".replaceAll("\\s+", " "),
    "q208_eval_set" ->
      """WITH d AS (SELECT lang, doc_id,
              ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 AS bucket
            FROM documents),
          t AS (SELECT * FROM d
                QUALIFY row_number() OVER (PARTITION BY lang ORDER BY bucket, doc_id) <= 10)
          SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
            min(doc_id) AS first_doc, max(bucket) AS max_bucket
          FROM t GROUP BY lang ORDER BY lang""".replaceAll("\\s+", " "),
    "q200_diversity_curve" ->
      raw"""WITH t AS (SELECT doc_id, text,
              regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
          q AS (SELECT doc_id, toks,
              CAST(floor((least(len(text), 400) / 400.0 * 0.5
                + (1.0 - CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS DOUBLE) / len(toks)) * 0.5) * 1e4) AS BIGINT) AS qfp
            FROM t),
          ex AS (SELECT doc_id, qfp,
              toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
            FROM q, unnest(range(1, greatest(len(toks) - 1, 1))) AS u(i)
            WHERE i < len(toks) - 1)
          SELECT
            count(DISTINCT CASE WHEN qfp >= 7500 THEN doc_id END) AS docs_q75,
            count(DISTINCT CASE WHEN qfp >= 7500 THEN g END) AS grams_q75,
            count(DISTINCT CASE WHEN qfp >= 5000 THEN doc_id END) AS docs_q50,
            count(DISTINCT CASE WHEN qfp >= 5000 THEN g END) AS grams_q50,
            count(DISTINCT CASE WHEN qfp >= 2500 THEN doc_id END) AS docs_q25,
            count(DISTINCT CASE WHEN qfp >= 2500 THEN g END) AS grams_q25,
            count(DISTINCT doc_id) AS docs_all,
            count(DISTINCT g) AS grams_all
          FROM ex""".replaceAll("\\s+", " "),
    "q189_tfidf_cosine" ->
      raw"""WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                      FROM documents),
          tr AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS term
                 FROM tk, unnest(range(1, greatest(len(toks) - 1, 1))) AS u(i)
                 WHERE i < len(toks) - 1),
          tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tr GROUP BY 1, 2),
          nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
          dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
                  HAVING count(*) <= 8),
          w AS (SELECT tf.doc_id, tf.term,
                  tf.tf * CAST(floor(1e4 * ln(nd.n / dft.df)) AS BIGINT) AS w
                FROM tf JOIN dft USING (term), nd),
          norms AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS n2 FROM w GROUP BY doc_id),
          dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     CAST(sum(a.w * b.w) AS BIGINT) AS dot
                   FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
          i0 AS (SELECT d.doc_a, d.doc_b, d.dot, na.n2 AS na2, nb.n2 AS nb2,
                   CAST(floor(sqrt(CAST(na.n2 AS DOUBLE))) AS BIGINT) AS ra,
                   CAST(floor(sqrt(CAST(nb.n2 AS DOUBLE))) AS BIGINT) AS rb
                 FROM dots d JOIN norms na ON na.doc_id = d.doc_a
                 JOIN norms nb ON nb.doc_id = d.doc_b),
          i1 AS (SELECT doc_a, doc_b, dot,
                   ra + (CASE WHEN (ra+1)*(ra+1) <= na2 THEN 1 ELSE 0 END)
                      - (CASE WHEN ra*ra > na2 THEN 1 ELSE 0 END) AS sa,
                   rb + (CASE WHEN (rb+1)*(rb+1) <= nb2 THEN 1 ELSE 0 END)
                      - (CASE WHEN rb*rb > nb2 THEN 1 ELSE 0 END) AS sb
                 FROM i0)
          SELECT doc_a, doc_b, dot,
            CAST((dot * 10000) // greatest(1, sa * sb) AS BIGINT) AS cos_fp
          FROM i1 ORDER BY cos_fp DESC, doc_a ASC, doc_b ASC LIMIT 20""".replaceAll("\\s+", " "),
    "q184_query_expansion" ->
      raw"""WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                      FROM documents),
          uc AS (SELECT w, count(*) AS c FROM
                   (SELECT unnest(toks) AS w FROM tk) GROUP BY w),
          big AS (SELECT toks[i] || ' ' || toks[i+1] AS bigram
                  FROM tk, unnest(range(1, greatest(len(toks), 1))) AS u(i)
                  WHERE i < len(toks)),
          nu AS (SELECT sum(c) AS nu FROM uc),
          nb AS (SELECT count(*) AS nb FROM big),
          pm AS (SELECT b.bigram, split_part(b.bigram, ' ', 1) AS w1,
                   split_part(b.bigram, ' ', 2) AS w2,
                   CAST(floor(1e6 * ln(CAST(b.c_ab * nu * nu AS DOUBLE)
                       / CAST(nb * u1.c * u2.c AS DOUBLE))) AS BIGINT) AS pmi_fp
                 FROM (SELECT bigram, count(*) AS c_ab FROM big GROUP BY bigram
                       HAVING count(*) >= 5) b
                 JOIN uc u1 ON u1.w = split_part(b.bigram, ' ', 1)
                 JOIN uc u2 ON u2.w = split_part(b.bigram, ' ', 2)
                 CROSS JOIN nu CROSS JOIN nb),
          cand AS (SELECT w1 AS seed, w2 AS partner, pmi_fp, bigram FROM pm
                     WHERE w1 IN ('table', 'join')
                   UNION ALL
                   SELECT w2, w1, pmi_fp, bigram FROM pm
                     WHERE w2 IN ('table', 'join')),
          part AS (SELECT partner AS term FROM cand
                   QUALIFY row_number() OVER (PARTITION BY seed
                     ORDER BY pmi_fp DESC, bigram ASC) = 1),
          qterms AS (SELECT DISTINCT term FROM
                       (SELECT unnest(['table', 'join']) AS term
                        UNION ALL SELECT term FROM part)),
          dterms AS (SELECT doc_id, unnest(toks) AS term FROM tk),
          dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM dterms GROUP BY doc_id),
          st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
          tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tc FROM dterms
                 WHERE term IN (SELECT term FROM qterms) GROUP BY 1, 2),
          dft AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM dterms
                  WHERE term IN (SELECT term FROM qterms) GROUP BY term),
          sc AS (SELECT tf.doc_id,
                   CAST(floor(ln((st.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                     * ((tf.tc * 2.2)
                        / (tf.tc + 1.2 * (0.25 + 0.75 * (dl.dl / st.avgdl))))
                     * 1000000.0) AS BIGINT) AS term_fp
                 FROM tf JOIN dft USING (term)
                 JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st)
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
            CAST(sum(term_fp) AS BIGINT) AS bm25_fp
          FROM sc GROUP BY doc_id
          ORDER BY bm25_fp DESC, doc_id ASC LIMIT 15""".replaceAll("\\s+", " "),
    "q155_bm25_search" ->
      raw"""WITH terms AS (SELECT doc_id,
              unnest(regexp_split_to_array(trim(text), '\s+')) AS term FROM documents),
          dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM terms GROUP BY doc_id),
          st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
          tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tc FROM terms
                 WHERE term IN ('table', 'join', 'stream') GROUP BY 1, 2),
          dft AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM terms
                  WHERE term IN ('table', 'join', 'stream') GROUP BY term),
          sc AS (SELECT tf.doc_id,
                   CAST(floor(ln((st.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                     * ((tf.tc * 2.2)
                        / (tf.tc + 1.2 * (0.25 + 0.75 * (dl.dl / st.avgdl))))
                     * 1000000.0) AS BIGINT) AS term_fp
                 FROM tf JOIN dft USING (term)
                 JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st)
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
            CAST(sum(term_fp) AS BIGINT) AS bm25_fp
          FROM sc GROUP BY doc_id
          ORDER BY bm25_fp DESC, doc_id ASC LIMIT 15""".replaceAll("\\s+", " "),
    "q27_token_stats" ->
      """SELECT doc_id,
          len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
          len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe_tokens,
          len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS n_distinct,
          CAST(len(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
            / len(regexp_split_to_array(trim(text), '\s+')) AS mean_tok_len
          FROM documents ORDER BY doc_id""".replaceAll("\\s+", " "),
    "q28_quality_score" ->
      """WITH t AS (SELECT doc_id, text,
            regexp_split_to_array(trim(text), '\s+') AS toks FROM documents)
          SELECT doc_id,
            len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS n_stopwords,
            least(len(text), 400) / 400.0 * 0.5
              + (1.0 - CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS DOUBLE) / len(toks)) * 0.5 AS quality
          FROM t ORDER BY doc_id""".replaceAll("\\s+", " "),
    "q29_lang_id" ->
      """WITH t AS (SELECT lang, text,
            regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
          s AS (SELECT lang,
            CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and'], x))) AS DOUBLE) AS s_en,
            CAST(len(list_filter(toks, x -> list_contains(['le','la','et','les'], x))) AS DOUBLE) AS s_fr,
            CAST(len(list_filter(toks, x -> list_contains(['el','los','y','una'], x))) AS DOUBLE) AS s_es,
            CAST(len(list_filter(toks, x -> list_contains(['der','die','und','das'], x))) AS DOUBLE) AS s_de,
            CAST(len(text) - len(regexp_replace(text, '[一-鿿]', '', 'g')) AS DOUBLE)
              / greatest(len(text), 1) * len(toks) AS s_zh
          FROM t),
          p AS (SELECT lang, greatest(s_en, s_fr, s_es, s_de, s_zh) AS best,
            CASE WHEN greatest(s_en, s_fr, s_es, s_de, s_zh) <= 0 THEN 'und'
                 WHEN s_en = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'en'
                 WHEN s_fr = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'fr'
                 WHEN s_es = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'es'
                 WHEN s_de = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'de'
                 ELSE 'zh' END AS lang_pred FROM s)
          SELECT lang, lang_pred, count(*) AS n FROM p
          GROUP BY lang, lang_pred ORDER BY lang, lang_pred""".replaceAll("\\s+", " "),
    "q173_pmi_collocations" ->
      raw"""WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                      FROM documents),
          uni AS (SELECT unnest(toks) AS w FROM tk),
          uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
          big AS (SELECT toks[i] || ' ' || toks[i+1] AS bigram
                  FROM tk, unnest(range(1, greatest(len(toks), 1))) AS u(i)
                  WHERE i < len(toks)),
          bc AS (SELECT bigram, count(*) AS c_ab FROM big GROUP BY bigram
                 HAVING count(*) >= 5),
          nu AS (SELECT sum(c) AS nu FROM uc),
          nb AS (SELECT count(*) AS nb FROM big),
          j AS (SELECT b.bigram, b.c_ab,
                  u1.c AS c1, u2.c AS c2
                FROM bc b
                JOIN uc u1 ON u1.w = split_part(b.bigram, ' ', 1)
                JOIN uc u2 ON u2.w = split_part(b.bigram, ' ', 2))
          SELECT bigram, c_ab,
            CAST(floor(1e6 * ln(CAST(c_ab * nu * nu AS DOUBLE)
                                / CAST(nb * c1 * c2 AS DOUBLE))) AS BIGINT) AS pmi_fp
          FROM j, nu, nb
          ORDER BY pmi_fp DESC, bigram ASC LIMIT 30""".replaceAll("\\s+", " "),
    "q164_phrase_search" ->
      raw"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                     FROM documents),
          p AS (SELECT doc_id, i - 1 AS pos, toks[i] AS term
                FROM t, unnest(range(1, len(toks) + 1)) AS u(i)
                WHERE toks[i] IN ('part', 'filter')),
          m AS (SELECT a.doc_id, a.pos
                FROM p a JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                WHERE a.term = 'part' AND b.term = 'filter')
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches, min(pos) AS first_pos
          FROM m GROUP BY doc_id ORDER BY doc_id""".replaceAll("\\s+", " "),
    "q30_fingerprint" ->
      """SELECT doc_id,
          list_min([md5(text[i:i+7]) for i in range(1, greatest(len(text)-7, 1) + 1)]) AS fingerprint
          FROM documents ORDER BY doc_id""".replaceAll("\\s+", " "),
    "q64_tfidf" ->
      """WITH terms AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
                        FROM documents),
          tf AS (SELECT doc_id, term, count(*) AS tc FROM terms GROUP BY 1, 2),
          dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY 1),
          df AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY 1),
          n AS (SELECT count(*) AS n FROM documents),
          scored AS (SELECT tf.doc_id, tf.term,
              (CAST(tc AS DOUBLE) / dl.dl) * ln(CAST(n.n AS DOUBLE) / df.df) AS score
            FROM tf JOIN dl ON tf.doc_id = dl.doc_id
            JOIN df ON tf.term = df.term, n)
          SELECT doc_id,
            row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rn,
            term, CAST(floor(score * 1000000.0) AS BIGINT) AS score_fp
          FROM scored
          QUALIFY rn <= 3
          ORDER BY doc_id, rn""".replaceAll("\\s+", " "),
    "q31_top_bigrams" ->
      """WITH t AS (SELECT regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
          b AS (SELECT unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS bigram FROM t)
          SELECT bigram, count(*) AS n FROM b GROUP BY bigram
          ORDER BY n DESC, bigram ASC LIMIT 20""".replaceAll("\\s+", " "),
    "q68_decontaminate" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
          g AS (SELECT doc_id, unnest(list_distinct(
                  [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks) - 1)])) AS g
                FROM t),
          train AS (SELECT * FROM g WHERE doc_id % 37 <> 0),
          test AS (SELECT * FROM g WHERE doc_id % 37 = 0)
          SELECT train.doc_id AS train_id, test.doc_id AS test_id, count(*) AS n_shared
          FROM train JOIN test ON train.g = test.g
          GROUP BY 1, 2 HAVING count(*) >= 2
          ORDER BY train_id, test_id""".replaceAll("\\s+", " "),
    "q75_decontaminate_hashed" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
          g AS (SELECT doc_id, unnest(list_distinct(
                  [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks) - 1)])) AS g
                FROM t),
          h AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS hg FROM g),
          train AS (SELECT * FROM h WHERE doc_id % 37 <> 0),
          test AS (SELECT * FROM h WHERE doc_id % 37 = 0)
          SELECT train.doc_id AS train_id, test.doc_id AS test_id, count(*) AS n_shared
          FROM train JOIN test ON train.hg = test.hg
          GROUP BY 1, 2 HAVING count(*) >= 2
          ORDER BY train_id, test_id""".replaceAll("\\s+", " "),
    "q122_contamination_matrix" ->
      raw"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
          g AS (SELECT doc_id, unnest(list_distinct(
                  [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks) - 1)])) AS g
                FROM t),
          h AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS hg FROM g),
          train AS (SELECT * FROM h WHERE doc_id % 37 <> 0),
          test AS (SELECT * FROM h WHERE doc_id % 37 = 0),
          p AS (SELECT train.doc_id AS train_id, test.doc_id AS test_id, count(*) AS n_shared
                FROM train JOIN test ON train.hg = test.hg
                GROUP BY 1, 2 HAVING count(*) >= 2)
          SELECT dtr.source AS train_source, dte.source AS eval_source,
            count(*) AS n_pairs,
            count(DISTINCT p.train_id) AS n_train_docs,
            count(DISTINCT p.test_id) AS n_eval_docs,
            CAST(sum(p.n_shared) AS BIGINT) AS total_shared
          FROM p JOIN documents dtr ON p.train_id = dtr.doc_id
                 JOIN documents dte ON p.test_id = dte.doc_id
          GROUP BY 1, 2 ORDER BY 1, 2""".replaceAll("\\s+", " "),
    "q109_contamination_report" ->
      raw"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
          g AS (SELECT doc_id, unnest(list_distinct(
                  [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks) - 1)])) AS g
                FROM t),
          h AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS hg FROM g),
          train AS (SELECT * FROM h WHERE doc_id % 37 <> 0),
          test AS (SELECT * FROM h WHERE doc_id % 37 = 0),
          p AS (SELECT train.doc_id AS train_id, test.doc_id AS test_id, count(*) AS n_shared
                FROM train JOIN test ON train.hg = test.hg
                GROUP BY 1, 2 HAVING count(*) >= 2),
          r AS (SELECT test_id, count(*) AS n_train_hits,
                  max(n_shared) AS max_shared,
                  CAST(sum(n_shared) AS BIGINT) AS total_shared
                FROM p GROUP BY test_id),
          e AS (SELECT doc_id AS test_id FROM documents WHERE doc_id % 37 = 0)
          SELECT e.test_id, coalesce(n_train_hits, 0) AS n_train_hits,
            coalesce(max_shared, 0) AS max_shared,
            coalesce(total_shared, 0) AS total_shared
          FROM e LEFT JOIN r USING (test_id) ORDER BY test_id""".replaceAll("\\s+", " "),
    "q69_quality_filters" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
          base AS (SELECT doc_id, len(toks) AS n_tokens,
                     len(list_distinct(toks)) AS n_distinct FROM t),
          tc AS (SELECT doc_id, unnest(toks) AS tok FROM t),
          top AS (SELECT doc_id, max(c) AS top_cnt
                  FROM (SELECT doc_id, tok, count(*) AS c FROM tc GROUP BY 1, 2)
                  GROUP BY doc_id)
          SELECT base.doc_id, n_tokens, n_distinct, top_cnt,
            CAST(n_tokens - n_distinct AS DOUBLE) / n_tokens AS dup_frac,
            CAST(top_cnt AS DOUBLE) / n_tokens AS top_frac,
            (n_tokens >= 40 AND CAST(n_tokens - n_distinct AS DOUBLE) / n_tokens <= 0.65
              AND CAST(top_cnt AS DOUBLE) / n_tokens <= 0.12) AS keep
          FROM base JOIN top ON base.doc_id = top.doc_id
          ORDER BY base.doc_id""".replaceAll("\\s+", " "),
    "q86_corpus_diff" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents),
          v2 AS (SELECT doc_id,
                   CASE WHEN doc_id % 17 = 0 THEN substr(text, 8) ELSE text END AS text
                 FROM v1 WHERE doc_id % 11 <> 0
                 UNION ALL
                 SELECT doc_id + 100000, text FROM v1 WHERE doc_id % 7 = 0),
          j AS (SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
                  md5(a.text) AS h1, md5(b.text) AS h2
                FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id),
          c AS (SELECT doc_id,
                  CASE WHEN h1 IS NULL THEN 'added'
                       WHEN h2 IS NULL THEN 'removed'
                       WHEN h1 = h2 THEN 'unchanged'
                       ELSE 'changed' END AS status FROM j)
          SELECT status, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
          FROM c GROUP BY status ORDER BY status""".replaceAll("\\s+", " "),
    "q82_length_trim" ->
      """WITH t AS (SELECT doc_id, lang,
            len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens FROM documents),
          b AS (SELECT lang, quantile_cont(n_tokens, 0.05) AS p05,
                  quantile_cont(n_tokens, 0.95) AS p95 FROM t GROUP BY lang)
          SELECT t.doc_id, t.lang, t.n_tokens FROM t JOIN b ON t.lang = b.lang
          WHERE t.n_tokens >= b.p05 AND t.n_tokens <= b.p95
          ORDER BY t.doc_id""".replaceAll("\\s+", " "),
    "q83_oov_rate" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
                      FROM documents),
          v AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM tok GROUP BY tok
                                 ORDER BY c DESC, tok ASC LIMIT 20))
          SELECT t.doc_id, count(*) AS n_tokens,
            CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
            CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS oov_rate
          FROM tok t LEFT JOIN v ON t.tok = v.tok
          GROUP BY t.doc_id ORDER BY t.doc_id""".replaceAll("\\s+", " "),
    "q79_lm_score" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
          b AS (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS bg FROM t),
          w AS (SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1 FROM b),
          c2 AS (SELECT bg, count(*) AS c2 FROM w GROUP BY bg),
          c1 AS (SELECT w1, count(*) AS c1 FROM w GROUP BY w1),
          s AS (SELECT w.doc_id,
                  CAST(floor(-ln(CAST(c2.c2 AS DOUBLE) / c1.c1) * 1000000.0) AS BIGINT) AS term_fp
                FROM w JOIN c2 ON w.bg = c2.bg JOIN c1 ON w.w1 = c1.w1)
          SELECT doc_id, count(*) AS n_bigrams,
            CAST(sum(term_fp) AS BIGINT) AS nll_fp,
            CAST(floor(CAST(sum(term_fp) AS DOUBLE) / count(*)) AS BIGINT) AS avg_nll_fp
          FROM s GROUP BY doc_id ORDER BY doc_id""".replaceAll("\\s+", " "),
    "q97_filter_funnel" ->
      raw"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
          base AS (SELECT doc_id, len(toks) AS n_tokens,
                     len(list_distinct(toks)) AS n_distinct FROM t),
          tc AS (SELECT doc_id, unnest(toks) AS tok FROM t),
          top AS (SELECT doc_id, max(c) AS top_cnt
                  FROM (SELECT doc_id, tok, count(*) AS c FROM tc GROUP BY 1, 2)
                  GROUP BY doc_id),
          v AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM tc GROUP BY tok
                                 ORDER BY c DESC, tok ASC LIMIT 20)),
          oov AS (SELECT tc.doc_id,
                    CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS oov_rate
                  FROM tc LEFT JOIN v ON tc.tok = v.tok GROUP BY tc.doc_id),
          b AS (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS bg FROM t),
          w AS (SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1 FROM b),
          cb AS (SELECT bg, count(*) AS c2 FROM w GROUP BY bg),
          cu AS (SELECT w1, count(*) AS c1 FROM w GROUP BY w1),
          lm AS (SELECT w.doc_id,
                   CAST(floor(CAST(sum(CAST(floor(-ln(CAST(cb.c2 AS DOUBLE) / cu.c1) * 1000000.0) AS BIGINT)) AS DOUBLE)
                     / count(*)) AS BIGINT) AS avg_nll_fp
                 FROM w JOIN cb ON w.bg = cb.bg JOIN cu ON w.w1 = cu.w1 GROUP BY w.doc_id),
          sel AS (SELECT CAST(base.n_tokens AS BIGINT) AS n_tokens,
                    base.n_tokens >= 24 AS k1,
                    (CAST(base.n_tokens - base.n_distinct AS DOUBLE) / base.n_tokens <= 0.65
                      AND CAST(top.top_cnt AS DOUBLE) / base.n_tokens <= 0.12) AS k2,
                    oov.oov_rate <= 0.40 AS k3,
                    lm.avg_nll_fp <= 3420000 AS k4
                  FROM base JOIN top ON base.doc_id = top.doc_id
                    JOIN oov ON base.doc_id = oov.doc_id
                    JOIN lm ON base.doc_id = lm.doc_id)
          SELECT 0 AS stage_idx, 'all' AS stage, count(*) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM sel
          UNION ALL SELECT 1, 'min_length', count(*), CAST(sum(n_tokens) AS BIGINT) FROM sel WHERE k1
          UNION ALL SELECT 2, 'repetition', count(*), CAST(sum(n_tokens) AS BIGINT) FROM sel WHERE k1 AND k2
          UNION ALL SELECT 3, 'oov', count(*), CAST(sum(n_tokens) AS BIGINT) FROM sel WHERE k1 AND k2 AND k3
          UNION ALL SELECT 4, 'lm', count(*), CAST(sum(n_tokens) AS BIGINT) FROM sel WHERE k1 AND k2 AND k3 AND k4
          ORDER BY stage_idx""".replaceAll("\\s+", " "),
    "q81_decontaminate_apply" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
          g AS (SELECT doc_id, unnest(list_distinct(
                  [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks) - 1)])) AS g
                FROM t),
          h AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS hg FROM g),
          train AS (SELECT * FROM h WHERE doc_id % 37 <> 0),
          test AS (SELECT * FROM h WHERE doc_id % 37 = 0),
          bad AS (SELECT train.doc_id AS train_id
                  FROM train JOIN test ON train.hg = test.hg
                  GROUP BY train.doc_id, test.doc_id HAVING count(*) >= 2)
          SELECT d.doc_id, d.lang, d.n_chars FROM documents d
          WHERE d.doc_id % 37 <> 0
            AND d.doc_id NOT IN (SELECT train_id FROM bad)
          ORDER BY doc_id""".replaceAll("\\s+", " "),
    "q78_pack_sequences" ->
      """WITH t AS (SELECT lang, doc_id,
            len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens FROM documents),
          c AS (SELECT lang, doc_id, n_tokens,
            sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum FROM t),
          b AS (SELECT lang, doc_id, n_tokens,
            CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 2048.0) AS BIGINT) AS bin FROM c)
          SELECT lang, bin, count(*) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
            min(doc_id) AS first_doc, max(doc_id) AS last_doc
          FROM b GROUP BY lang, bin ORDER BY lang, bin""".replaceAll("\\s+", " "),
    "q74_stratified_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
          WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000
            < CASE WHEN lang = 'zh' THEN 3000 WHEN lang = 'en' THEN 8000 ELSE 5000 END
          ORDER BY doc_id""".replaceAll("\\s+", " "),
    "q72_token_entropy" ->
      """WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
                    FROM documents),
          c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
          n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1)
          SELECT c.doc_id,
            CAST(sum(CAST(floor(-(CAST(c.c AS DOUBLE) / n.n)
              * ln(CAST(c.c AS DOUBLE) / n.n) * 1000000.0) AS BIGINT)) AS BIGINT) AS entropy_fp,
            count(*) AS n_distinct_tokens
          FROM c JOIN n ON c.doc_id = n.doc_id
          GROUP BY c.doc_id ORDER BY c.doc_id""".replaceAll("\\s+", " "),
    "q70_dataset_card" ->
      """WITH t AS (SELECT source, lang, n_chars,
            regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
          d AS (SELECT source, lang, n_chars, len(toks) AS n_tokens,
            len(list_distinct(toks)) AS n_distinct FROM t),
          k AS (SELECT *, (n_tokens >= 40 AND
            CAST(n_tokens - n_distinct AS DOUBLE) / n_tokens <= 0.65) AS keep FROM d)
          SELECT source, lang, count(*) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
            min(n_chars) AS min_chars, max(n_chars) AS max_chars,
            CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
            CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS keep_rate
          FROM k GROUP BY source, lang ORDER BY source, lang""".replaceAll("\\s+", " ")
  )

  /** q113 = q75's semantics exactly (the bloom is a pre-filter whose false
    * positives the exact join removes), so its oracle is q75's verbatim.
    */
  /** q157 = q155's semantics with incrementally-merged index stats —
    * byte-identical by construction, so both run under ONE oracle and the
    * hash gate itself proves incremental == batch.
    */
  val oracleSql: Map[String, String] =
    oracleSqlBase +
      ("q113_decontaminate_bloom" -> oracleSqlBase("q75_decontaminate_hashed")) +
      ("q157_bm25_incremental" -> oracleSqlBase("q155_bm25_search"))
}
