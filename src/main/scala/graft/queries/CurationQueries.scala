package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.operators.{Bpe, Curate, Sampling, Scrub}
import graft.sources.Tables

/** Corpus-curation surface: PII scrubbing, vocabulary coverage, context-
  * window chunking, and repeat-factor mix assembly over `documents`. The
  * sf corpora contain no natural PII, so q89 runs on a deterministically
  * decorated corpus — emails/URLs/phones appended by doc_id modulus,
  * constructed identically in the oracle SQL (same device as
  * [[DedupQueries]]' augmented corpus).
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  private def decorated(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select("doc_id", "text")
      .withColumn("text", when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com now"))).otherwise(col("text")))
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" see https://site"), (col("doc_id") % 9).cast("string"),
          lit(".example.org/p/"), col("doc_id").cast("string"), lit(" today")))
        .otherwise(col("text")))
      .withColumn("text", when(col("doc_id") % 11 === 0,
        concat(col("text"), lit(" call +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" now")))
        .otherwise(col("text")))

  private val DecSql =
    """d1 AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0
         THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com now'
         ELSE text END AS text FROM documents),
       d2 AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0
         THEN text || ' see https://site' || CAST(doc_id % 9 AS VARCHAR)
              || '.example.org/p/' || CAST(doc_id AS VARCHAR) || ' today'
         ELSE text END AS text FROM d1),
       dec AS (SELECT doc_id, CASE WHEN doc_id % 11 = 0
         THEN text || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now'
         ELSE text END AS text FROM d2)"""

  /** URL-host extractor shared by q108 and its oracle (RE2∩Java subset). */
  private val DomainRe = "https://([a-z0-9.-]+)/"

  /** The q131 BPE learn chain (3 merge rounds) as DuckDB CTEs ending in
    * the per-round decisions t1/t2/t3 — shared by q131's merge-list oracle
    * and q133's encode oracle, which replays the same learned merges over
    * the per-doc word stream. Mirrors [[graft.operators.Bpe]]: chr(31)
    * sentinel wrapping, greedy left-to-right `replace`, (n DESC, a, b)
    * tie-break.
    */
  private val BpeChainSql =
    raw"""words AS (SELECT w, count(*) AS wn
            FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
                  FROM documents) GROUP BY w),
          e0 AS (SELECT wn,
                   array_to_string([chr(31) || w[i] || chr(31)
                                    for i in range(1, len(w) + 1)], '') AS enc
                 FROM words),
          s1 AS (SELECT wn, string_split(substr(enc, 2, length(enc) - 2),
                                         chr(31) || chr(31)) AS s FROM e0),
          p1 AS (SELECT p.a AS a, p.b AS b, CAST(sum(wn) AS BIGINT) AS n
                 FROM (SELECT wn, unnest([{'a': s[i], 'b': s[i+1]}
                                          for i in range(1, len(s))]) AS p FROM s1)
                 GROUP BY 1, 2),
          t1 AS (SELECT a, b, n FROM p1 ORDER BY n DESC, a, b LIMIT 1),
          e1 AS (SELECT wn, replace(enc,
                   chr(31) || t1.a || chr(31) || chr(31) || t1.b || chr(31),
                   chr(31) || t1.a || t1.b || chr(31)) AS enc
                 FROM e0 CROSS JOIN t1),
          s2 AS (SELECT wn, string_split(substr(enc, 2, length(enc) - 2),
                                         chr(31) || chr(31)) AS s FROM e1),
          p2 AS (SELECT p.a AS a, p.b AS b, CAST(sum(wn) AS BIGINT) AS n
                 FROM (SELECT wn, unnest([{'a': s[i], 'b': s[i+1]}
                                          for i in range(1, len(s))]) AS p FROM s2)
                 GROUP BY 1, 2),
          t2 AS (SELECT a, b, n FROM p2 ORDER BY n DESC, a, b LIMIT 1),
          e2 AS (SELECT wn, replace(enc,
                   chr(31) || t2.a || chr(31) || chr(31) || t2.b || chr(31),
                   chr(31) || t2.a || t2.b || chr(31)) AS enc
                 FROM e1 CROSS JOIN t2),
          s3 AS (SELECT wn, string_split(substr(enc, 2, length(enc) - 2),
                                         chr(31) || chr(31)) AS s FROM e2),
          p3 AS (SELECT p.a AS a, p.b AS b, CAST(sum(wn) AS BIGINT) AS n
                 FROM (SELECT wn, unnest([{'a': s[i], 'b': s[i+1]}
                                          for i in range(1, len(s))]) AS p FROM s3)
                 GROUP BY 1, 2),
          t3 AS (SELECT a, b, n FROM p3 ORDER BY n DESC, a, b LIMIT 1)"""

  /** q135's batched-BPE oracle chain: per round, rank pair counts
    * (n DESC, a, b) → top-12 candidate window → dominance filter (accept iff
    * no higher-RANKED candidate shares a symbol — NOT EXISTS, non-recursive
    * by construction, see [[graft.operators.Bpe.learnMergesBatched]]) →
    * first 4 accepted applied as nested conditional replaces (a missing
    * j-th merge degrades to a never-matching chr(30) pattern).
    */
  private def bpeBatchRoundSql(i: Int, m: Int, cap: Int): String =
    s"""s$i AS (SELECT wn, string_split(substr(enc, 2, length(enc) - 2),
                                        chr(31) || chr(31)) AS s FROM e${i - 1}),
        p$i AS (SELECT p.a AS a, p.b AS b, CAST(sum(wn) AS BIGINT) AS n
                FROM (SELECT wn, unnest([{'a': s[i], 'b': s[i+1]}
                                         for i in range(1, len(s))]) AS p FROM s$i)
                GROUP BY 1, 2),
        r$i AS (SELECT a, b, n, row_number() OVER (ORDER BY n DESC, a, b) AS rk
                FROM p$i QUALIFY rk <= $cap),
        acc$i AS (SELECT a, b, n, rk FROM r$i t WHERE NOT EXISTS (
                  SELECT 1 FROM r$i h WHERE h.rk < t.rk
                    AND (h.a = t.a OR h.a = t.b OR h.b = t.a OR h.b = t.b))),
        sel$i AS (SELECT a, b, n, CAST(row_number() OVER (ORDER BY rk) AS BIGINT) AS j
                  FROM acc$i QUALIFY j <= $m)"""

  /** Nested conditional replaces applying round `i`'s batch (j = 1..m). */
  private def bpeBatchApplySql(i: Int, m: Int): String = {
    val enc = (1 to m).foldLeft("enc") { (src, j) =>
      s"""replace($src,
            coalesce((SELECT chr(31)||a||chr(31)||chr(31)||b||chr(31)
                      FROM sel$i WHERE j=$j), chr(30)),
            coalesce((SELECT chr(31)||a||b||chr(31) FROM sel$i WHERE j=$j), ''))"""
    }
    s"e$i AS (SELECT wn, $enc AS enc FROM e${i - 1})"
  }

  val queries: Map[String, Q] = Map(
    // Temperature (α=1/2) mixture calibration — multilingual α-sampling
    // (Conneau & Lample 2019): per-language √-scaled targets for a
    // 200-doc mix, with the exact-isqrt weight, floor allocation, derived
    // integer threshold, and the REALIZED deterministic sample count per
    // language. Head languages flatten, tail languages lift, and every
    // number is int64 — the whole calibration is oracle-replayed.
    "q167_temperature_mix" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val t = Sampling.temperatureTargets(docs, col("lang"), targetRows = 200L)
      val sampled = docs.join(broadcast(t), col("lang") === col("stratum"))
        .filter(Sampling.hashBucket(col("doc_id")) < col("threshold"))
        .groupBy("stratum").agg(count(lit(1)).as("n_sampled"))
      t.join(sampled, Seq("stratum"), "left")
        .select(col("stratum").as("lang"), col("n_rows"), col("w_fp"),
          col("target_rows"), coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
        .orderBy("lang")
    }),
    // DSIR importance resampling (Xie et al. 2023): hashed-unigram
    // importance of every doc toward the English slice (target = lang
    // 'en', raw = whole corpus), Laplace-smoothed fixed-point log-ratio
    // weights (256 broadcast rows), per-doc Σ c_f·w_f exact in int64, and
    // the top-100 keep decision from a broadcast 1-row threshold (ties at
    // the boundary keep — deterministic). The cheap quality-classifier
    // alternative for steering a pretraining mix toward a domain.
    "q162_dsir_importance" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val w = graft.operators.Dsir.importanceWeights(
        docs, "text", col("lang") === "en", buckets = 256)
      val scores = graft.operators.Dsir.importanceScores(
        docs, "doc_id", "text", w, buckets = 256)
      val th = scores.orderBy(col("score_fp").desc, col("doc_id"))
        .limit(100).agg(min(col("score_fp")).as("__th"))
      scores.crossJoin(broadcast(th))
        .select(col("doc_id"), col("score_fp"),
          (col("score_fp") >= col("__th")).as("selected"))
        .orderBy("doc_id")
    }),
    // PII scrub before release: per-doc detection counts plus the md5 of
    // the redacted text itself — the redaction OUTPUT is hash-verified
    // against the oracle performing the same RE2-subset replacements.
    "q89_pii_scrub" -> ((s, dir) => {
      val d = decorated(s, dir)
      d.select(col("doc_id"),
          Scrub.countMatches(col("text"), Scrub.EmailRe).as("n_emails"),
          Scrub.countMatches(col("text"), Scrub.UrlRe).as("n_urls"),
          Scrub.countMatches(col("text"), Scrub.PhoneRe).as("n_phones"),
          md5(Scrub.redactPii(col("text"))).as("redacted_md5"))
        .orderBy("doc_id")
    }),
    // Tokenizer-design input: top-100 corpus vocabulary with cumulative
    // coverage — "how much of the corpus do the k most frequent words
    // explain". Counts shuffle once (map-side combined); the top-k is a
    // TakeOrderedAndProject, and the window runs over 100 rows, not the
    // vocabulary. Coverage = exact-int cumsum / exact-int total, so the
    // doubles are bit-identical cross-engine.
    "q91_vocab_coverage" -> ((s, dir) => {
      val counts = Tables.documents(s, dir)
        .select(explode(Text.tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
      val total = counts.agg(sum("n").as("total"))
      val ord = Seq(col("n").desc, col("word").asc)
      val cum = Window.orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      counts.orderBy(ord: _*).limit(100)
        .crossJoin(broadcast(total))
        .withColumn("rank", row_number().over(Window.orderBy(ord: _*)).cast("long"))
        .withColumn("coverage", sum(col("n")).over(cum).cast("double") / col("total"))
        .select("rank", "word", "n", "coverage")
        .orderBy("rank")
    }),
    // Context-window chunking: split every doc's token stream into
    // 64-token windows (the shard-prep step before packing/tokenizing).
    // Chunks are built inside one codegen'd HOF projection — no explode
    // of tokens, no shuffle; posexplode emits (chunk_idx, chunk) rows.
    "q92_chunk_split" -> ((s, dir) => {
      val W = 64
      Tables.documents(s, dir)
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          posexplode(transform(
            sequence(lit(0), floor((size(col("toks")) - 1) / W).cast("int")),
            i => struct(
              least(lit(W), size(col("toks")) - i * W).cast("long").as("n_tokens"),
              md5(concat_ws(" ", slice(col("toks"), i * W + lit(1), lit(W))))
                .as("chunk_md5")))).as(Seq("chunk_idx", "c")))
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          col("c.n_tokens").as("n_tokens"), col("c.chunk_md5").as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    }),
    // Tokenizer bootstrap: corpus-frequency-weighted adjacent character
    // pairs — the first BPE merge iteration's candidate table. Pairs are
    // built inside a codegen'd HOF over each word (no per-character
    // explode); one map-side-combined count shuffle; top-50 via
    // TakeOrderedAndProject.
    "q95_bpe_pairs" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(explode(Text.tokens(col("text"))).as("w"))
        .filter(length(col("w")) >= 2)
        .select(explode(transform(
          sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(50)
    }),
    // Iterated BPE: q95 stops at the FIRST merge candidate table; this
    // runs the actual loop — pick the top pair, merge it everywhere
    // (greedy left-to-right, the real BPE application step), recount on
    // the merged symbol sequences, three rounds deep. Output is the
    // learned merge list (round, pair, count-at-selection) — the artifact
    // a tokenizer trainer commits. Rounds 2 and 3 count pairs over
    // MERGED sequences, so the oracle must replay the identical
    // merge+recount chain (CTE per round) — the loop semantics
    // themselves are what's hash-verified. See [[graft.operators.Bpe]]
    // for the sentinel-string encoding that makes each merge one
    // codegen'd replace in both engines.
    "q131_bpe_merges" -> ((s, dir) =>
      Bpe.learnMerges(Tables.documents(s, dir).select("text"), "text", rounds = 3)),
    // The tokenizer APPLIED: encode every doc with q131's learned merge
    // list (replayed in learned order — application order is part of the
    // tokenizer contract) and report per-doc word/symbol counts — the
    // compression table a tokenizer change is evaluated by. The learn
    // step runs inside the query (its three 1-row decisions are the
    // frozen artifact the encode inlines as literals); the oracle replays
    // the identical chain and re-encodes in SQL, so learn AND apply are
    // both under the hash gate.
    // The merge-vs-compression curve: corpus-total symbol counts at round
    // 0 (characters) and after each of the three learned merges — the
    // table a vocabulary-size decision reads (marginal compression per
    // added merge). Shares the q131/q133 chain; each point is an exact
    // integer under the oracle.
    "q134_bpe_curve" -> ((s, dir) =>
      Bpe.compressionCurve(Tables.documents(s, dir).select("text"), "text", rounds = 3)),
    // BATCHED BPE learning — the production-scale loop shape: one pass per
    // round learns up to 4 merges (top-12 candidates, dominance-filtered to
    // a mutually-symbol-disjoint set whose replaces provably commute), so a
    // 10k-merge tokenizer costs 10k/batchSize driver round trips instead of
    // 10k. Two rounds under the hash gate — the oracle reproduces the rank →
    // dominance-filter → batch-apply chain per round (NOT EXISTS over
    // higher-ranked candidates + nested conditional replaces); ScaleProbe
    // carries the flat-per-round-cost evidence at depth.
    "q135_bpe_batched" -> ((s, dir) =>
      Bpe.learnMergesBatched(Tables.documents(s, dir).select("text"), "text",
        rounds = 2, batchSize = 4, candidateCap = 12)),
    // Weighted percentiles by TOKEN MASS, rank-exact: the smallest doc
    // length (chars) such that docs up to it hold ≥50/90/99% of corpus
    // tokens — the stat a sequence-length / truncation budget actually
    // needs (an unweighted length percentile over-counts short docs).
    // Prefix sums run over the distinct-length DIMENSION frame (bounded),
    // thresholds are integer cross-multiplications; no interpolation.
    "q188_weighted_percentile" -> ((s, dir) => {
      val per = Tables.documents(s, dir)
        .withColumn("tok", size(Text.tokens(col("text"))).cast("long"))
        .groupBy("n_chars").agg(sum(col("tok")).as("w"))
      val cum = per.withColumn("cumw", sum(col("w")).over(Window.orderBy("n_chars")))
      val tot = per.agg(sum(col("w")).as("tw"))
      import s.implicits._
      Seq(50, 90, 99).toDF("pct")
        .crossJoin(cum).crossJoin(broadcast(tot))
        .filter(lit(100L) * col("cumw") >= col("pct") * col("tw"))
        .withColumn("__rn",
          row_number().over(Window.partitionBy(col("pct")).orderBy(col("n_chars"))))
        .filter(col("__rn") === 1)
        .select(col("pct"), col("n_chars").as("threshold_chars"),
          col("cumw").as("cum_tokens"), col("tw").as("total_tokens"))
        .orderBy("pct")
    }),
    // Tokenizer vocab pruning: realized USAGE of each learned merge's
    // output symbol in the final encoding, the scale-free keep rule
    // (2·usage ≥ max usage), and corpus symbol totals under full vs
    // pruned merge lists. One extra aggregation pass + one vocab-sized
    // replace chain on top of the learn loop; the oracle replays the
    // prune as per-round CONDITIONAL replaces.
    "q181_bpe_prune" -> ((s, dir) =>
      Bpe.pruneAudit(Tables.documents(s, dir).select("text"), "text", rounds = 3)),
    "q133_bpe_encode" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val merges = Bpe.learnMerges(docs.select("text"), "text", rounds = 3)
        .orderBy("round")
        .select("pair_a", "pair_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      Bpe.encode(docs, "doc_id", "text", merges).orderBy("doc_id")
    }),
    // q133's encode at the 10⁴-merge scale shape: the replace chain runs
    // ONCE over the distinct-word vocabulary (the table learning already
    // builds) and the corpus equi-joins its exploded words against it —
    // corpus-sized work drops from merges×scan to explode + one join.
    // Byte-identical to q133 by construction (same chain, same words), so
    // it runs under q133's oracle — the hash gate itself proves the two
    // formulations equal.
    "q137_bpe_encode_vocab" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val merges = Bpe.learnMerges(docs.select("text"), "text", rounds = 3)
        .orderBy("round")
        .select("pair_a", "pair_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      Bpe.encodeViaVocab(docs, "doc_id", "text", merges).orderBy("doc_id")
    }),
    // Tokenizer fertility by source — the standard tokenizer-eval metric
    // (symbols emitted per word; SentencePiece/BPE papers report it per
    // language/domain to spot under-served segments). Reuses the learned
    // q131 merge chain and the distinct-vocab encode path with `source` as
    // the aggregation key — one vocab-sized replace chain, one corpus
    // explode+join, a 20-row rollup. Fertility is one IEEE division of two
    // exact int64s, so it hash-matches cross-engine.
    "q149_tokenizer_fertility" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "source", "text")
      val merges = Bpe.learnMerges(docs.select("text"), "text", rounds = 3)
        .orderBy("round")
        .select("pair_a", "pair_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      Bpe.encodeViaVocab(docs, "source", "text", merges)
        .withColumn("fertility", col("n_symbols").cast("double") / col("n_words"))
        .orderBy("source")
    }),
    // Train/val/test assignment: cumulative md5-bucket thresholds (90/5/5)
    // — a doc's split never changes as the corpus grows. Reported as the
    // per-(split, lang) audit table an eval-leakage review reads.
    "q96_split_assign" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("split", Sampling.assignSplit(
          col("doc_id"), Seq("train" -> 0.90, "val" -> 0.05), last = "test"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("long")).as("n_chars"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy("split", "lang")
    }),
    // Temporal train/test split with an EMBARGO window (the purged-split
    // discipline from de Prado's purged K-fold, one fold): q96 splits by
    // hash — correct for i.i.d. docs, leaky for time series, where a
    // model can read the future through events adjacent to the boundary.
    // Train < T, embargo [T, T+2d) dropped, test >= T+2d; the audit
    // PROVES the gap — the minimum same-user (test − train) distance in
    // exact microseconds must be >= the embargo width. Three partition
    // scans + one per-user min/max join; no windows over raw events.
    "q226_temporal_split" -> ((s, dir) => {
      val b0 = lit("2024-01-20 00:00:00").cast("timestamp")
      val b1 = lit("2024-01-22 00:00:00").cast("timestamp")
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
      val train = ev.filter(col("ts") < b0)
      val emb = ev.filter(col("ts") >= b0 && col("ts") < b1)
      val test = ev.filter(col("ts") >= b1)
      val gap = train.groupBy("user_id").agg(max(unix_micros(col("ts"))).as("t_max"))
        .join(test.groupBy("user_id").agg(min(unix_micros(col("ts"))).as("t_min")),
          "user_id")
        .agg(count(lit(1)).as("n_users_both"),
          min(col("t_min") - col("t_max")).as("min_cross_gap_us"))
      train.agg(count(lit(1)).as("n_train"),
          countDistinct(col("user_id")).as("n_users_train"))
        .crossJoin(broadcast(emb.agg(count(lit(1)).as("n_embargo"))))
        .crossJoin(broadcast(test.agg(count(lit(1)).as("n_test"),
          countDistinct(col("user_id")).as("n_users_test"))))
        .crossJoin(broadcast(gap))
        .withColumn("embargo_ok", col("min_cross_gap_us") >= lit(172800000000L))
    }),
    // The SQL surface end-to-end: a user who only speaks SQL runs the
    // library's native codegen'd expressions through the session's
    // function registry (`graft_simhash60` here) — registered at runtime
    // for plain sessions, or via withExtensions/spark.sql.extensions.
    // Bit-parity of the SQL path against the DuckDB reconstruction.
    "q98_sql_surface" -> ((s, dir) => {
      graft.expressions.GraftExtensions.registerAll(s)
      Tables.documents(s, dir).createOrReplaceTempView("graft_docs_sql")
      s.sql(
        """SELECT doc_id, graft_simhash60(split(trim(text), '\\s+')) AS simhash
           FROM graft_docs_sql ORDER BY doc_id""")
    }),
    // Mix assembly with repeat factors: src0 seen 2.5x per epoch, src3
    // downsampled to a quarter, src7 1.75x, everything else once —
    // deterministic md5(key:copy) fractional membership, integer
    // thresholds fixed driver-side.
    "q93_epoch_mix" -> ((s, dir) => {
      Sampling.epochMix(
        Tables.documents(s, dir).select("doc_id", "source", "lang"),
        key = col("doc_id"), stratum = col("source"),
        weights = Map("src0" -> 2.5, "src3" -> 0.25, "src7" -> 1.75),
        default = 1.0)
        .select("doc_id", "copy_idx", "source", "lang")
        .orderBy("doc_id", "copy_idx")
    }),
    // Token-budgeted mix assembly: every source capped at a token budget
    // (src0 squeezed, src5 uncapped, 400 tokens for the rest) by the
    // integer cross-multiplication membership test — the "N tokens of
    // web, M of code" primitive. Output is the per-source audit a mix
    // designer reads: corpus totals never shuffle, only the tiny
    // per-source totals broadcast.
    "q103_token_budget" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("n_tokens", size(Text.tokens(col("text"))).cast("long"))
      Curate.tokenBudget(d, col("doc_id"), col("source"), col("n_tokens"),
        budgets = Map("src0" -> 200L, "src5" -> 1000000L), default = 400L)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("tokens_kept"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("source")
    }),
    // Deterministic training order: md5-ordered global shuffle into 8
    // shards; the per-shard digest pins the EXACT order (checksum =
    // Σ pos·doc_id is order-sensitive) plus the first doc each data
    // loader would read. The window is the write plan itself — hash
    // exchange on shard, sort within.
    "q104_training_order" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("n_tokens", size(Text.tokens(col("text"))).cast("long"))
      Curate.trainingOrder(d, col("doc_id"), nShards = 8)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("n_tokens"),
          sum(col("pos") * col("doc_id")).as("order_checksum"),
          min(when(col("pos") === 1, col("doc_id"))).as("first_doc"))
        .orderBy("shard")
    }),
    // Soft quality sampling: keep probability = the doc's own quality
    // score (distinct-token fraction on the 10^4 integer grid, integer
    // division so the threshold is engine-exact), decided by a salted md5
    // bucket — deterministic, growth-stable, independent of the split
    // draw. The FineWeb-style "sample by quality instead of hard filter";
    // membership itself is hash-verified.
    "q126_weighted_sample" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("__toks", Text.tokens(col("text")))
        .withColumn("__n", size(col("__toks")).cast("long"))
        .withColumn("__nd", size(array_distinct(col("__toks"))).cast("long"))
        .withColumn("qfp", expr("(10000 * __nd) div __n"))
      Sampling.weightedHashSample(d, col("doc_id"), col("qfp"))
        .select("doc_id", "qfp")
        .orderBy("doc_id")
    }),
    // Curriculum order: documents phased by repetition quality (4 fixed-
    // width duplicate-token-fraction bands, cleanest first — computed with
    // INTEGER division so band edges are engine-exact), md5-shuffled
    // within a phase, sharded. The per-(shard, phase) min/max positions
    // prove phase contiguity inside every shard; the checksum pins the
    // exact order. Same window-is-the-shard-write plan as q104.
    "q117_curriculum_order" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("__toks", Text.tokens(col("text")))
        .withColumn("__n", size(col("__toks")).cast("long"))
        .withColumn("__nd", size(array_distinct(col("__toks"))).cast("long"))
      val phase = least(expr("(4 * (__n - __nd)) div __n"), lit(3L))
      Curate.curriculumOrder(d, col("doc_id"), phase, nShards = 8)
        .groupBy("shard", "phase")
        .agg(count(lit(1)).as("n_docs"),
          min("pos").as("min_pos"), max("pos").as("max_pos"),
          sum(col("pos") * col("doc_id")).as("order_checksum"))
        .orderBy("shard", "phase")
    }),
    // First-seen trigram novelty: how much of each doc is new relative to
    // every lower-id doc — the contribution score behind "prune documents
    // that add nothing". Inverted-index shape; shuffles carry 8-byte gram
    // hashes only.
    "q106_ngram_novelty" -> ((s, dir) => {
      Curate.noveltyScore(
        Tables.documents(s, dir).withColumn("toks", Text.tokens(col("text"))),
        "doc_id", "toks", n = 3)
        .orderBy("doc_id")
    }),
    // Per-DOMAIN token caps (the "no single site dominates the corpus"
    // rule): domain extracted from the decorated corpus's URLs (RE2∩Java
    // regex, '' → "(none)"), then the same integer-cross-multiplication
    // budget as q103 with the extracted domain as the stratum. Docs
    // without a URL pool into one heavily-downsampled stratum.
    "q108_domain_cap" -> ((s, dir) => {
      val domain = regexp_extract(col("text"), DomainRe, 1)
      val d = decorated(s, dir)
        .withColumn("n_tokens", size(Text.tokens(col("text"))).cast("long"))
        .withColumn("domain", when(domain === "", "(none)").otherwise(domain))
      Curate.tokenBudget(d, col("doc_id"), col("domain"), col("n_tokens"),
        budgets = Map.empty, default = 300L)
        .groupBy("domain")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens_kept"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("domain")
    }),
    // Quality-prune curve: docs/tokens per quality decile at grid
    // resolution — "what do we lose cutting the bottom k/10" — computed
    // without a global sort (one agg to ≤10001 cells, window over cells).
    "q107_prune_curve" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("toks", Text.tokens(col("text")))
      Curate.pruneCurve(
        d.withColumn("quality", Text.qualityScore(col("text"), col("toks")))
          .withColumn("n_tokens", size(col("toks")).cast("long")),
        col("quality"), col("n_tokens"), buckets = 10, grid = 10000)
    }),
    // Sequence packing (GPT-style concat-and-chunk): the full per-doc
    // manifest — global token offset in q104's deterministic order, and
    // the fixed 512-token training sequences each doc lands in. The
    // global running total is computed WITHOUT a global window (within-
    // shard prefix + broadcast #shards-row offsets), the single-partition
    // cliff a naive cumsum would hit.
    "q146_sequence_packing" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .withColumn("n_tokens", size(Text.tokens(col("text"))).cast("long"))
      Curate.packingManifest(d, col("doc_id"), col("n_tokens"),
        nShards = 8, seqLen = 512L)
        .select("doc_id", "shard", "pos", "n_tokens",
          "doc_start", "first_seq", "last_seq", "n_seqs")
        .orderBy("shard", "pos")
    }),
    // Packing-efficiency audit — the numbers that justify q146's packing:
    // sequences and padding waste under concat-and-chunk (waste = only the
    // final sequence's slack) vs the naive doc-aligned loader (every doc
    // padded to its own seqLen multiple), plus how many docs straddle a
    // sequence boundary (the price packing pays — those docs train with a
    // mid-document attention break). One manifest pass, one 1-row
    // aggregate; all integer floor-div arithmetic.
    "q151_packing_efficiency" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .withColumn("n_tokens", size(Text.tokens(col("text"))).cast("long"))
      Curate.packingManifest(d, col("doc_id"), col("n_tokens"),
        nShards = 8, seqLen = 512L)
        .agg(
          sum("n_tokens").as("total_tokens"),
          expr("(sum(n_tokens) + 511) div 512").as("packed_seqs"),
          expr("((sum(n_tokens) + 511) div 512) * 512 - sum(n_tokens)")
            .as("packed_waste"),
          expr("sum((n_tokens + 511) div 512)").as("padded_seqs"),
          expr("sum((n_tokens + 511) div 512) * 512 - sum(n_tokens)")
            .as("padded_waste"),
          sum(when(col("n_seqs") > 1, 1L).otherwise(0L)).as("n_straddle"))
    })
  )

  /** q137 = q133's semantics computed via the distinct-vocab join —
    * byte-identical output by construction, so both formulations run under
    * ONE oracle and the hash gate itself proves them equal.
    */
  lazy val oracleSql: Map[String, String] =
    oracleSqlBase + ("q137_bpe_encode_vocab" -> oracleSqlBase("q133_bpe_encode"))

  private val oracleSqlBase: Map[String, String] = Map(
    "q167_temperature_mix" ->
      """WITH c AS (SELECT lang, count(*) AS n_rows FROM documents GROUP BY lang),
          r0 AS (SELECT lang, n_rows, n_rows * 1000000 AS x,
                 CAST(floor(sqrt(CAST(n_rows * 1000000 AS DOUBLE))) AS BIGINT) AS r FROM c),
          w AS (SELECT lang, n_rows,
                 r + (CASE WHEN (r+1)*(r+1) <= x THEN 1 ELSE 0 END)
                   - (CASE WHEN r*r > x THEN 1 ELSE 0 END) AS w_fp FROM r0),
          tw AS (SELECT sum(w_fp) AS sw FROM w),
          t AS (SELECT lang, n_rows, w_fp,
                 CAST((200 * w_fp) // sw AS BIGINT) AS target_rows FROM w, tw),
          t2 AS (SELECT *, least(10000, (10000 * target_rows) // n_rows) AS th FROM t),
          s AS (SELECT d.lang, count(*) AS n_sampled
                FROM documents d JOIN t2 USING (lang)
                WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < th
                GROUP BY d.lang)
          SELECT t2.lang, n_rows, w_fp, target_rows, coalesce(n_sampled, 0) AS n_sampled
          FROM t2 LEFT JOIN s ON t2.lang = s.lang ORDER BY t2.lang""".replaceAll("\\s+", " "),
    "q162_dsir_importance" ->
      raw"""WITH tk AS (SELECT doc_id, lang,
              unnest(regexp_split_to_array(trim(text), '\s+')) AS term FROM documents),
          f AS (SELECT doc_id, lang,
              ('0x' || substr(md5(term), 1, 8))::BIGINT % 256 AS bucket FROM tk),
          bc AS (SELECT bucket, count(*) FILTER (lang = 'en') AS tf, count(*) AS rf
                 FROM f GROUP BY bucket),
          tot AS (SELECT sum(tf) AS tt, sum(rf) AS rt FROM bc),
          w AS (SELECT bucket,
              CAST(floor(1e6 * ln(CAST((tf + 1) * (rt + 256) AS DOUBLE)
                                  / CAST((rf + 1) * (tt + 256) AS DOUBLE))) AS BIGINT) AS w_fp
            FROM bc, tot),
          dc AS (SELECT doc_id, bucket, count(*) AS c FROM f GROUP BY 1, 2),
          sc AS (SELECT doc_id, CAST(sum(c * w_fp) AS BIGINT) AS score_fp
                 FROM dc JOIN w USING (bucket) GROUP BY doc_id),
          th AS (SELECT min(score_fp) AS th FROM
                 (SELECT score_fp FROM sc ORDER BY score_fp DESC, doc_id LIMIT 100))
          SELECT doc_id, score_fp, (score_fp >= th) AS selected
          FROM sc, th ORDER BY doc_id""".replaceAll("\\s+", " "),
    "q89_pii_scrub" ->
      raw"""WITH $DecSql
          SELECT doc_id,
            CAST(len(regexp_extract_all(text, '${Scrub.EmailRe}')) AS BIGINT) AS n_emails,
            CAST(len(regexp_extract_all(text, '${Scrub.UrlRe}')) AS BIGINT) AS n_urls,
            CAST(len(regexp_extract_all(text, '${Scrub.PhoneRe}')) AS BIGINT) AS n_phones,
            md5(regexp_replace(regexp_replace(regexp_replace(text,
              '${Scrub.EmailRe}', '<EMAIL>', 'g'),
              '${Scrub.UrlRe}', '<URL>', 'g'),
              '${Scrub.PhoneRe}', '<PHONE>', 'g')) AS redacted_md5
          FROM dec ORDER BY doc_id""".replaceAll("\\s+", " "),
    "q91_vocab_coverage" ->
      raw"""WITH t AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
                      FROM documents),
          c AS (SELECT word, count(*) AS n FROM t GROUP BY word),
          tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
          top AS (SELECT word, n FROM c ORDER BY n DESC, word LIMIT 100)
          SELECT CAST(row_number() OVER (ORDER BY n DESC, word) AS BIGINT) AS rank,
            word, n,
            CAST(CAST(sum(n) OVER (ORDER BY n DESC, word
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS DOUBLE) / total AS coverage
          FROM top, tot ORDER BY rank""".replaceAll("\\s+", " "),
    "q92_chunk_split" ->
      raw"""WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                        FROM documents),
          n AS (SELECT doc_id, toks, ((len(toks) - 1) // 64) + 1 AS nch FROM tok)
          SELECT doc_id,
            unnest(range(0, nch)) AS chunk_idx,
            unnest([least(64, len(toks) - i*64) for i in range(0, nch)]) AS n_tokens,
            unnest([md5(array_to_string(toks[i*64+1 : least((i+1)*64, len(toks))], ' '))
                    for i in range(0, nch)]) AS chunk_md5
          FROM n ORDER BY doc_id, chunk_idx""".replaceAll("\\s+", " "),
    "q188_weighted_percentile" ->
      raw"""WITH per AS (SELECT n_chars,
              CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS w
            FROM documents GROUP BY n_chars),
          c AS (SELECT n_chars, w,
              CAST(sum(w) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw
            FROM per),
          t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM per),
          p AS (SELECT unnest([50, 90, 99]) AS pct)
          SELECT pct, n_chars AS threshold_chars, cumw AS cum_tokens, tw AS total_tokens
          FROM (SELECT p.pct, c.n_chars, c.cumw, t.tw,
                  row_number() OVER (PARTITION BY p.pct ORDER BY c.n_chars) AS rn
                FROM p, c, t WHERE 100 * c.cumw >= p.pct * t.tw)
          WHERE rn = 1 ORDER BY pct""".replaceAll("\\s+", " "),
    "q181_bpe_prune" ->
      s"""WITH $BpeChainSql,
          e3 AS (SELECT wn, replace(enc,
                   chr(31) || t3.a || chr(31) || chr(31) || t3.b || chr(31),
                   chr(31) || t3.a || t3.b || chr(31)) AS enc
                 FROM e2 CROSS JOIN t3),
          s4 AS (SELECT wn, string_split(substr(enc, 2, length(enc) - 2),
                                         chr(31) || chr(31)) AS s FROM e3),
          ms AS (SELECT (SELECT a || b FROM t1) AS m1,
                        (SELECT a || b FROM t2) AS m2,
                        (SELECT a || b FROM t3) AS m3),
          u AS (SELECT
              CAST(sum(wn * len(list_filter(s, x -> x = m1))) AS BIGINT) AS u1,
              CAST(sum(wn * len(list_filter(s, x -> x = m2))) AS BIGINT) AS u2,
              CAST(sum(wn * len(list_filter(s, x -> x = m3))) AS BIGINT) AS u3,
              CAST(sum(wn * len(s)) AS BIGINT) AS full_total
            FROM s4 CROSS JOIN ms),
          k AS (SELECT u1, u2, u3, full_total,
              2 * u1 >= greatest(u1, u2, u3) AS k1,
              2 * u2 >= greatest(u1, u2, u3) AS k2,
              2 * u3 >= greatest(u1, u2, u3) AS k3 FROM u),
          pe1 AS (SELECT wn, CASE WHEN (SELECT k1 FROM k) THEN replace(enc,
                    chr(31) || t1.a || chr(31) || chr(31) || t1.b || chr(31),
                    chr(31) || t1.a || t1.b || chr(31)) ELSE enc END AS enc
                  FROM e0 CROSS JOIN t1),
          pe2 AS (SELECT wn, CASE WHEN (SELECT k2 FROM k) THEN replace(enc,
                    chr(31) || t2.a || chr(31) || chr(31) || t2.b || chr(31),
                    chr(31) || t2.a || t2.b || chr(31)) ELSE enc END AS enc
                  FROM pe1 CROSS JOIN t2),
          pe3 AS (SELECT wn, CASE WHEN (SELECT k3 FROM k) THEN replace(enc,
                    chr(31) || t3.a || chr(31) || chr(31) || t3.b || chr(31),
                    chr(31) || t3.a || t3.b || chr(31)) ELSE enc END AS enc
                  FROM pe2 CROSS JOIN t3),
          pt AS (SELECT CAST(sum(wn * len(string_split(substr(enc, 2, length(enc) - 2),
                                         chr(31) || chr(31)))) AS BIGINT) AS pruned_total
                 FROM pe3)
          SELECT * FROM (
            SELECT CAST(1 AS BIGINT) AS round, (SELECT a || b FROM t1) AS merged,
                   u1 AS usage, k1 AS kept, full_total AS n_symbols_full,
                   (SELECT pruned_total FROM pt) AS n_symbols_pruned FROM k
            UNION ALL SELECT CAST(2 AS BIGINT), (SELECT a || b FROM t2), u2, k2,
                   full_total, (SELECT pruned_total FROM pt) FROM k
            UNION ALL SELECT CAST(3 AS BIGINT), (SELECT a || b FROM t3), u3, k3,
                   full_total, (SELECT pruned_total FROM pt) FROM k)
          ORDER BY round""".replaceAll("\\s+", " "),
    "q134_bpe_curve" ->
      s"""WITH $BpeChainSql,
          e3 AS (SELECT wn, replace(enc,
                   chr(31) || t3.a || chr(31) || chr(31) || t3.b || chr(31),
                   chr(31) || t3.a || t3.b || chr(31)) AS enc
                 FROM e2 CROSS JOIN t3),
          s4 AS (SELECT wn, string_split(substr(enc, 2, length(enc) - 2),
                                         chr(31) || chr(31)) AS s FROM e3)
          SELECT * FROM (
            SELECT CAST(0 AS BIGINT) AS round, '' AS merged,
                   (SELECT CAST(sum(wn * len(s)) AS BIGINT) FROM s1) AS n_symbols
            UNION ALL SELECT CAST(1 AS BIGINT), (SELECT a || b FROM t1),
                   (SELECT CAST(sum(wn * len(s)) AS BIGINT) FROM s2)
            UNION ALL SELECT CAST(2 AS BIGINT), (SELECT a || b FROM t2),
                   (SELECT CAST(sum(wn * len(s)) AS BIGINT) FROM s3)
            UNION ALL SELECT CAST(3 AS BIGINT), (SELECT a || b FROM t3),
                   (SELECT CAST(sum(wn * len(s)) AS BIGINT) FROM s4))
          ORDER BY round""".replaceAll("\\s+", " "),
    "q133_bpe_encode" ->
      s"""WITH $BpeChainSql,
          dw AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
                 FROM documents),
          de0 AS (SELECT doc_id,
                    array_to_string([chr(31) || w[i] || chr(31)
                                     for i in range(1, len(w) + 1)], '') AS enc
                  FROM dw),
          de1 AS (SELECT doc_id, replace(enc,
                    chr(31) || t1.a || chr(31) || chr(31) || t1.b || chr(31),
                    chr(31) || t1.a || t1.b || chr(31)) AS enc
                  FROM de0 CROSS JOIN t1),
          de2 AS (SELECT doc_id, replace(enc,
                    chr(31) || t2.a || chr(31) || chr(31) || t2.b || chr(31),
                    chr(31) || t2.a || t2.b || chr(31)) AS enc
                  FROM de1 CROSS JOIN t2),
          de3 AS (SELECT doc_id, replace(enc,
                    chr(31) || t3.a || chr(31) || chr(31) || t3.b || chr(31),
                    chr(31) || t3.a || t3.b || chr(31)) AS enc
                  FROM de2 CROSS JOIN t3)
          SELECT doc_id, count(*) AS n_words,
            CAST(sum(len(string_split(substr(enc, 2, length(enc) - 2),
                                      chr(31) || chr(31)))) AS BIGINT) AS n_symbols
          FROM de3 GROUP BY doc_id ORDER BY doc_id""".replaceAll("\\s+", " "),
    "q149_tokenizer_fertility" ->
      s"""WITH $BpeChainSql,
          dw AS (SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
                 FROM documents),
          de0 AS (SELECT source,
                    array_to_string([chr(31) || w[i] || chr(31)
                                     for i in range(1, len(w) + 1)], '') AS enc
                  FROM dw),
          de1 AS (SELECT source, replace(enc,
                    chr(31) || t1.a || chr(31) || chr(31) || t1.b || chr(31),
                    chr(31) || t1.a || t1.b || chr(31)) AS enc
                  FROM de0 CROSS JOIN t1),
          de2 AS (SELECT source, replace(enc,
                    chr(31) || t2.a || chr(31) || chr(31) || t2.b || chr(31),
                    chr(31) || t2.a || t2.b || chr(31)) AS enc
                  FROM de1 CROSS JOIN t2),
          de3 AS (SELECT source, replace(enc,
                    chr(31) || t3.a || chr(31) || chr(31) || t3.b || chr(31),
                    chr(31) || t3.a || t3.b || chr(31)) AS enc
                  FROM de2 CROSS JOIN t3),
          agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_words,
                    CAST(sum(len(string_split(substr(enc, 2, length(enc) - 2),
                                              chr(31) || chr(31)))) AS BIGINT) AS n_symbols
                  FROM de3 GROUP BY source)
          SELECT source, n_words, n_symbols,
            CAST(n_symbols AS DOUBLE) / n_words AS fertility
          FROM agg ORDER BY source""".replaceAll("\\s+", " "),
    "q131_bpe_merges" ->
      s"""WITH $BpeChainSql
          SELECT * FROM (
            SELECT CAST(1 AS BIGINT) AS round, a AS pair_a, b AS pair_b,
                   a || b AS merged, n FROM t1
            UNION ALL SELECT CAST(2 AS BIGINT), a, b, a || b, n FROM t2
            UNION ALL SELECT CAST(3 AS BIGINT), a, b, a || b, n FROM t3)
          ORDER BY round""".replaceAll("\\s+", " "),
    "q135_bpe_batched" ->
      raw"""WITH words AS (SELECT w, count(*) AS wn
            FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
                  FROM documents) GROUP BY w),
          e0 AS (SELECT wn,
                   array_to_string([chr(31) || w[i] || chr(31)
                                    for i in range(1, len(w) + 1)], '') AS enc
                 FROM words),
          ${bpeBatchRoundSql(1, 4, 12)},
          ${bpeBatchApplySql(1, 4)},
          ${bpeBatchRoundSql(2, 4, 12)}
          SELECT * FROM (
            SELECT CAST(1 AS BIGINT) AS round, j, a AS pair_a, b AS pair_b,
                   a || b AS merged, n FROM sel1
            UNION ALL SELECT CAST(2 AS BIGINT), j, a, b, a || b, n FROM sel2)
          ORDER BY round, j""".replaceAll("\\s+", " "),
    "q95_bpe_pairs" ->
      raw"""WITH t AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
                      FROM documents),
          p AS (SELECT unnest([w[i:i+1] for i in range(1, len(w))]) AS pair
                FROM t WHERE len(w) >= 2)
          SELECT pair, count(*) AS n FROM p GROUP BY pair
          ORDER BY n DESC, pair LIMIT 50""".replaceAll("\\s+", " "),
    "q96_split_assign" ->
      """WITH s AS (SELECT lang, n_chars, doc_id,
            CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < 9000 THEN 'train'
                 WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < 9500 THEN 'val'
                 ELSE 'test' END AS split
          FROM documents)
          SELECT split, lang, count(*) AS n_docs,
            CAST(sum(n_chars) AS BIGINT) AS n_chars,
            min(doc_id) AS min_id, max(doc_id) AS max_id
          FROM s GROUP BY split, lang ORDER BY split, lang""".replaceAll("\\s+", " "),
    "q226_temporal_split" ->
      """WITH tr AS (SELECT user_id, ts FROM events
                     WHERE ts < TIMESTAMP '2024-01-20 00:00:00'),
          em AS (SELECT user_id FROM events
                 WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
                   AND ts < TIMESTAMP '2024-01-22 00:00:00'),
          te AS (SELECT user_id, ts FROM events
                 WHERE ts >= TIMESTAMP '2024-01-22 00:00:00'),
          g AS (SELECT CAST(count(*) AS BIGINT) AS n_users_both,
                  CAST(min(tmin - tmax) AS BIGINT) AS min_cross_gap_us
                FROM (SELECT user_id, max(epoch_us(ts)) AS tmax FROM tr GROUP BY 1) a
                JOIN (SELECT user_id, min(epoch_us(ts)) AS tmin FROM te GROUP BY 1) b
                USING (user_id)),
          ta AS (SELECT CAST(count(*) AS BIGINT) AS n_train,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_train FROM tr),
          ea AS (SELECT CAST(count(*) AS BIGINT) AS n_embargo FROM em),
          sa AS (SELECT CAST(count(*) AS BIGINT) AS n_test,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_test FROM te)
          SELECT ta.n_train, ta.n_users_train, ea.n_embargo, sa.n_test,
            sa.n_users_test, g.n_users_both, g.min_cross_gap_us,
            g.min_cross_gap_us >= 172800000000 AS embargo_ok
          FROM ta, ea, sa, g""".replaceAll("\\s+", " "),
    "q98_sql_surface" ->
      raw"""WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                        FROM documents),
          bs AS (SELECT doc_id,
                   [list_sum(list_transform(toks,
                      t -> CASE WHEN ((('0x' || substr(md5(t), 1, 15))::BIGINT >> j) & 1) = 1
                                THEN 1 ELSE -1 END))
                    for j in range(0, 60)] AS sums
                 FROM tok)
          SELECT doc_id,
            CAST(list_sum([CASE WHEN sums[j+1] > 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END
                           for j in range(0, 60)]) AS BIGINT) AS simhash
          FROM bs ORDER BY doc_id""".replaceAll("\\s+", " "),
    "q93_epoch_mix" ->
      """WITH w AS (SELECT doc_id, source, lang,
            CASE source WHEN 'src0' THEN 2 WHEN 'src3' THEN 0 WHEN 'src7' THEN 1 ELSE 1 END AS nfull,
            CASE source WHEN 'src0' THEN 3 WHEN 'src3' THEN 1 WHEN 'src7' THEN 2 ELSE 1 END AS ntot,
            CASE source WHEN 'src0' THEN 5000 WHEN 'src3' THEN 2500 WHEN 'src7' THEN 7500 ELSE 0 END AS thr
          FROM documents),
          e AS (SELECT doc_id, source, lang, nfull, thr,
                  unnest(range(0, ntot)) AS copy_idx FROM w)
          SELECT doc_id, copy_idx, source, lang FROM e
          WHERE copy_idx < nfull OR
            ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(copy_idx AS VARCHAR)), 1, 8))::BIGINT % 10000 < thr
          ORDER BY doc_id, copy_idx""".replaceAll("\\s+", " "),
    "q103_token_budget" ->
      raw"""WITH d AS (SELECT doc_id, source,
            len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens FROM documents),
          t AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS total FROM d GROUP BY source),
          k AS (SELECT d.* FROM d JOIN t USING (source)
                WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000) * total
                      < 10000::BIGINT * (CASE source WHEN 'src0' THEN 200 WHEN 'src5' THEN 1000000 ELSE 400 END))
          SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tokens_kept,
            min(doc_id) AS min_id, max(doc_id) AS max_id
          FROM k GROUP BY source ORDER BY source""".replaceAll("\\s+", " "),
    "q104_training_order" ->
      raw"""WITH d AS (SELECT doc_id,
            len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
            md5('ord:' || CAST(doc_id AS VARCHAR)) AS okey FROM documents),
          r AS (SELECT doc_id, n_tokens,
                  ('0x' || substr(okey, 1, 8))::BIGINT % 8 AS shard,
                  CAST(row_number() OVER (
                    PARTITION BY ('0x' || substr(okey, 1, 8))::BIGINT % 8
                    ORDER BY okey, doc_id) AS BIGINT) AS pos
                FROM d)
          SELECT shard, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
            CAST(sum(pos * doc_id) AS BIGINT) AS order_checksum,
            min(CASE WHEN pos = 1 THEN doc_id END) AS first_doc
          FROM r GROUP BY shard ORDER BY shard""".replaceAll("\\s+", " "),
    "q126_weighted_sample" ->
      raw"""WITH t AS (SELECT doc_id,
            len(regexp_split_to_array(trim(text), '\s+')) AS n,
            len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS nd
            FROM documents),
          q AS (SELECT doc_id, (10000 * nd) // n AS qfp FROM t)
          SELECT doc_id, qfp FROM q
          WHERE ('0x' || substr(md5('wq:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < qfp
          ORDER BY doc_id""".replaceAll("\\s+", " "),
    "q117_curriculum_order" ->
      raw"""WITH t AS (SELECT doc_id,
            len(regexp_split_to_array(trim(text), '\s+')) AS n,
            len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS nd
            FROM documents),
          d AS (SELECT doc_id,
            least((4 * (n - nd)) // n, 3) AS phase,
            md5('cur:' || CAST(doc_id AS VARCHAR)) AS okey FROM t),
          r AS (SELECT doc_id, phase,
                  ('0x' || substr(okey, 1, 8))::BIGINT % 8 AS shard,
                  CAST(row_number() OVER (
                    PARTITION BY ('0x' || substr(okey, 1, 8))::BIGINT % 8
                    ORDER BY phase, okey, doc_id) AS BIGINT) AS pos
                FROM d)
          SELECT shard, CAST(phase AS BIGINT) AS phase, count(*) AS n_docs,
            min(pos) AS min_pos, max(pos) AS max_pos,
            CAST(sum(pos * doc_id) AS BIGINT) AS order_checksum
          FROM r GROUP BY shard, phase ORDER BY shard, phase""".replaceAll("\\s+", " "),
    "q106_ngram_novelty" ->
      raw"""WITH tp AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                       FROM documents),
          h AS (SELECT doc_id, unnest(list_distinct(
                  [((th[i]*8191 + th[i+1]) % 4294967296 * 8191 + th[i+2]) % 4294967296
                   for i in range(1, greatest(len(th) - 1, 1))])) AS g
                FROM (SELECT doc_id,
                        [('0x' || substr(md5(t), 1, 8))::BIGINT for t in toks] AS th
                      FROM tp)),
          f AS (SELECT g, min(doc_id) AS first_id FROM h GROUP BY g),
          agg AS (SELECT h.doc_id, count(*) AS n_grams,
                    CAST(sum(CASE WHEN f.first_id = h.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
                  FROM h JOIN f USING (g) GROUP BY h.doc_id)
          SELECT doc_id, n_grams, n_novel,
            CAST(n_novel AS DOUBLE) / n_grams AS novelty
          FROM agg ORDER BY doc_id""".replaceAll("\\s+", " "),
    "q108_domain_cap" ->
      raw"""WITH $DecSql,
          d AS (SELECT doc_id,
                  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
                  CASE WHEN regexp_extract(text, '$DomainRe', 1) = '' THEN '(none)'
                       ELSE regexp_extract(text, '$DomainRe', 1) END AS domain
                FROM dec),
          t AS (SELECT domain, CAST(sum(n_tokens) AS BIGINT) AS total FROM d GROUP BY domain),
          k AS (SELECT d.* FROM d JOIN t USING (domain)
                WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000) * total
                      < 10000::BIGINT * 300)
          SELECT domain, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tokens_kept,
            min(doc_id) AS min_id, max(doc_id) AS max_id
          FROM k GROUP BY domain ORDER BY domain""".replaceAll("\\s+", " "),
    "q107_prune_curve" ->
      raw"""WITH t AS (SELECT text, regexp_split_to_array(trim(text), '\s+') AS toks
                      FROM documents),
          q AS (SELECT CAST(len(toks) AS BIGINT) AS n_tokens,
                  least(len(text), 400) / 400.0 * 0.5
                    + (1.0 - CAST(len(list_filter(toks,
                        x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS DOUBLE)
                      / len(toks)) * 0.5 AS quality
                FROM t),
          c AS (SELECT CAST(floor(quality * 10000) AS BIGINT) AS cell,
                  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
                FROM q GROUP BY 1),
          tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM c),
          b AS (SELECT cell, n_docs, n_tokens,
                  CAST(least(CAST(floor(
                    CAST(sum(n_docs) OVER (ORDER BY cell ROWS UNBOUNDED PRECEDING) - n_docs AS DOUBLE)
                    * 10 / total) AS BIGINT) + 1, 10) AS BIGINT) AS bucket
                FROM c, tot)
          SELECT bucket, CAST(sum(n_docs) AS BIGINT) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
            min(cell) AS min_cell, max(cell) AS max_cell
          FROM b GROUP BY bucket ORDER BY bucket""".replaceAll("\\s+", " "),
    "q146_sequence_packing" ->
      raw"""WITH d AS (SELECT doc_id,
            CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
            md5('ord:' || CAST(doc_id AS VARCHAR)) AS okey FROM documents),
          r AS (SELECT doc_id, n_tokens,
                  ('0x' || substr(okey, 1, 8))::BIGINT % 8 AS shard,
                  CAST(row_number() OVER (
                    PARTITION BY ('0x' || substr(okey, 1, 8))::BIGINT % 8
                    ORDER BY okey, doc_id) AS BIGINT) AS pos
                FROM d),
          p AS (SELECT doc_id, shard, pos, n_tokens,
                  CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY pos
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                FROM r),
          o AS (SELECT shard, COALESCE(CAST(sum(t) OVER (ORDER BY shard
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS soff
                FROM (SELECT shard, sum(n_tokens) AS t FROM r GROUP BY shard)),
          m AS (SELECT p.doc_id, p.shard, p.pos, p.n_tokens,
                  o.soff + p.cum - p.n_tokens AS doc_start
                FROM p JOIN o ON p.shard = o.shard)
          SELECT doc_id, shard, pos, n_tokens, doc_start,
            CAST(floor(CAST(doc_start AS DOUBLE) / 512.0) AS BIGINT) AS first_seq,
            CAST(floor(CAST(doc_start + greatest(n_tokens, 1) - 1 AS DOUBLE) / 512.0)
              AS BIGINT) AS last_seq,
            CAST(floor(CAST(doc_start + greatest(n_tokens, 1) - 1 AS DOUBLE) / 512.0)
              AS BIGINT)
              - CAST(floor(CAST(doc_start AS DOUBLE) / 512.0) AS BIGINT) + 1 AS n_seqs
          FROM m ORDER BY shard, pos""".replaceAll("\\s+", " "),
    "q151_packing_efficiency" ->
      raw"""WITH d AS (SELECT doc_id,
            CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
            md5('ord:' || CAST(doc_id AS VARCHAR)) AS okey FROM documents),
          r AS (SELECT doc_id, n_tokens,
                  ('0x' || substr(okey, 1, 8))::BIGINT % 8 AS shard,
                  CAST(row_number() OVER (
                    PARTITION BY ('0x' || substr(okey, 1, 8))::BIGINT % 8
                    ORDER BY okey, doc_id) AS BIGINT) AS pos
                FROM d),
          p AS (SELECT doc_id, shard, pos, n_tokens,
                  CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY pos
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                FROM r),
          o AS (SELECT shard, COALESCE(CAST(sum(t) OVER (ORDER BY shard
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS soff
                FROM (SELECT shard, sum(n_tokens) AS t FROM r GROUP BY shard)),
          m AS (SELECT p.n_tokens, o.soff + p.cum - p.n_tokens AS doc_start
                FROM p JOIN o ON p.shard = o.shard),
          mm AS (SELECT n_tokens,
                  CAST(floor(CAST(doc_start + greatest(n_tokens, 1) - 1 AS DOUBLE) / 512.0)
                    AS BIGINT)
                    - CAST(floor(CAST(doc_start AS DOUBLE) / 512.0) AS BIGINT) + 1 AS n_seqs
                FROM m)
          SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
            CAST((sum(n_tokens) + 511) // 512 AS BIGINT) AS packed_seqs,
            CAST(((sum(n_tokens) + 511) // 512) * 512 - sum(n_tokens) AS BIGINT)
              AS packed_waste,
            CAST(sum((n_tokens + 511) // 512) AS BIGINT) AS padded_seqs,
            CAST(sum((n_tokens + 511) // 512) * 512 - sum(n_tokens) AS BIGINT)
              AS padded_waste,
            CAST(sum(CASE WHEN n_seqs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle
          FROM mm""".replaceAll("\\s+", " ")
  )
}
