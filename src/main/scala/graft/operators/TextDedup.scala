package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication at training-data-pipeline scale (builder
  * contract; the reference's own dedup is row-keyed keep-last,
  * SURVEY.md §2.6 — these are the content-based generalizations).
  *
  * Determinism contract: the only hash is md5 (bit-identical in every
  * engine), consumed either as a hex string (lexicographic min for MinHash)
  * or via its first 8 hex digits parsed to a 32-bit int (SimHash), so a SQL
  * oracle reproduces signatures exactly.
  *
  * Scale design (100 TB):
  *  - Everything per-document is a codegen'd higher-order-function
  *    expression — embarrassingly parallel, no shuffle.
  *  - Candidate generation is always a *bucketed equi-join* (LSH band
  *    value, SimHash band, shingle inverted index) — never a cross join.
  *    Shuffle volume = O(docs × bands), and AQE's skew-join splitting
  *    handles hot buckets.
  *  - Pair verification (exact Jaccard / Hamming) runs only on candidates.
  */
object TextDedup {

  /** Distinct word n-gram shingles of a token array. */
  def shingles(toks: Column, n: Int = 3): Column =
    array_distinct(graft.functions.Text.wordNgrams(toks, n))

  /** Distinct 32-bit shingle hashes derived from per-TOKEN md5 hashes:
    * H(w₁..wₙ) = fold(h, t → (h·8191 + H32(t)) mod 2³²) over the n-gram's
    * token hashes. One md5 per token (not per shingle — an n-fold saving,
    * since every token appears in n shingles); the combination is exact
    * int64 arithmetic reproducible in any SQL engine.
    *
    * Implemented as the native codegen'd
    * [[graft.expressions.ShingleHashes32]] (one tight md5+fold loop per
    * row, inside WholeStageCodegen); [[shingleHashesHof]] is the
    * equivalent SQL-function formulation, bit-parity spec-pinned in
    * ExpressionsSpec.
    */
  def shingleHashes(toksColName: String, n: Int): Column =
    graft.expressions.GraftExtensions.shingleHashesNative(col(toksColName), n)

  /** Higher-order-function formulation (kept for cross-checking). */
  def shingleHashesHof(toksColName: String, n: Int): Column = {
    val tokenHashes =
      s"transform($toksColName, t -> cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint))"
    // combine h[i+1..i+n]: fold left with multiplier 8191 (fits int64:
    // 2^32 · 8191 < 2^45), mod 2^32 at the end of each step
    val combine = (1 to n)
      .map(j => s"element_at(hs, i + $j)")
      .reduce((acc, h) => s"(($acc * 8191 + $h) % cast(4294967296 as bigint))")
    expr(
      s"""element_at(transform(array($tokenHashes), hs ->
            if(size(hs) >= $n,
               array_distinct(transform(sequence(0, size(hs) - $n), i -> $combine)),
               array())), 1)""")
  }

  /** MinHash signature (array<bigint>, length k) over a 32-bit hash-array
    * column named `hashesColName` (see [[shingleHashes]]).
    *
    * The k views are universal-hash permutations
    * h_i(H) = (H·(2i+1) + i·2654435761) mod 2³² — exact int64 arithmetic,
    * reproducible in any SQL engine. Signature element i is min over the
    * set of h_i. Implemented as the native codegen'd
    * [[graft.expressions.MinHashSignature]] (one k-lane primitive loop);
    * [[minhashSignatureHof]] is the equivalent SQL-function formulation.
    */
  def minhashSignature(hashesColName: String, k: Int): Column =
    graft.expressions.GraftExtensions.minhashNative(col(hashesColName), k)

  /** Higher-order-function formulation (kept for cross-checking). */
  def minhashSignatureHof(hashesColName: String, k: Int): Column =
    expr(
      s"""transform(sequence(0, ${k - 1}), i ->
            array_min(transform($hashesColName, h ->
              (h * (2*i + 1) + i * cast(2654435761 as bigint))
                % cast(4294967296 as bigint))))""")

  /** LSH band values: the signature split into `k / rows` bands of `rows`
    * elements, each band hashed to one value. Docs agreeing on ANY band
    * become candidate pairs.
    */
  def lshBands(sig: Column, k: Int, rows: Int): Column =
    transform(
      sequence(lit(0), lit(k / rows - 1)),
      b => concat_ws(",",
        transform(slice(sig, b * rows + 1, lit(rows)), x => x.cast("string"))))

  /** Near-duplicate pairs via MinHash LSH: band-bucket equi-join for
    * candidates, exact Jaccard verification over the distinct shingle-hash
    * sets (int sets intersect ~10× faster than string sets),
    * `jaccard >= threshold` kept. Input df must have columns
    * (`idCol`, `hashesCol` — see [[shingleHashes]]).
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      hashesCol: String,
      k: Int,
      bandRows: Int,
      threshold: Double): DataFrame = {
    val shinglesCol = hashesCol
    // signatures live entirely inside minhashLshCandidates; verification
    // reads only the raw distinct shingle-hash sets
    val sig = df.filter(size(col(shinglesCol)) > 0)
    val cand = minhashLshCandidates(df, idCol, hashesCol, k, bandRows)
    val sa = sig.select(col(idCol).as("doc_a"), col(shinglesCol).as("__sha"))
    val sb = sig.select(col(idCol).as("doc_b"), col(shinglesCol).as("__shb"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("__common", size(array_intersect(col("__sha"), col("__shb"))))
      .withColumn("jaccard",
        col("__common").cast("double") /
          (size(col("__sha")) + size(col("__shb")) - col("__common")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** The raw LSH candidate pairs — every (doc_a < doc_b) sharing at least
    * one signature band, BEFORE exact-Jaccard verification. Exposed so the
    * banding configuration itself can be audited (q118: candidates vs
    * ground truth → precision/recall of the (k, bandRows) choice).
    */
  def minhashLshCandidates(
      df: DataFrame,
      idCol: String,
      hashesCol: String,
      k: Int,
      bandRows: Int): DataFrame = {
    val sig = df
      .filter(size(col(hashesCol)) > 0)
      .withColumn("__sig", minhashSignature(hashesCol, k))
    // Repartition barrier: without it CollapseProject inlines the signature
    // expression into every band and both sides of the self-join (≈10×
    // recompute of the md5 pass). With it the signature is computed once
    // below the exchange — which is also the scale-correct shape (shuffle
    // tiny signatures, not text).
    val sigMat = sig.select(col(idCol), col("__sig")).repartition(col(idCol))
    val bands = sigMat.select(
      col(idCol), posexplode(lshBands(col("__sig"), k, bandRows)).as(Seq("__b", "__bv")))
    bands.as("a")
      .join(bands.as("b"),
        col("a.__b") === col("b.__b") && col("a.__bv") === col("b.__bv") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()
  }

  /** Incremental near-duplicate check: candidate pairs between INCOMING
    * docs and the existing corpus only — never corpus×corpus. This is the
    * production ingest shape: an hourly batch is checked against a 100 TB
    * corpus by joining the batch's band values against the corpus's band
    * index; the batch side is broadcast (bands of a batch are tiny), so
    * the band join itself moves no corpus data — the only corpus-side
    * exchange is the signature barrier, which carries (id, signature)
    * tuples, never text. At cluster scale the corpus band index is a
    * precomputed, bucketed artifact and even that barrier disappears —
    * the probe reads only colliding band buckets.
    *
    * Inputs follow [[minhashLshPairs]] (`idCol`, `hashesCol` from
    * [[shingleHashes]]); output (corpus_id, incoming_id, jaccard) with
    * exact Jaccard ≥ threshold verified on the distinct shingle-hash sets.
    */
  def minhashLshPairsIncremental(
      corpus: DataFrame,
      incoming: DataFrame,
      idCol: String,
      hashesCol: String,
      k: Int,
      bandRows: Int,
      threshold: Double): DataFrame = {
    def sigOf(df: DataFrame) = df
      .filter(size(col(hashesCol)) > 0)
      .withColumn("__sig", minhashSignature(hashesCol, k))
    // same repartition barrier as minhashLshPairs: signature computed once
    // below an exchange, not inlined into every band by projection collapse
    def bandsOf(df: DataFrame) = sigOf(df)
      .select(col(idCol), col("__sig")).repartition(col(idCol))
      .select(col(idCol),
        posexplode(lshBands(col("__sig"), k, bandRows)).as(Seq("__b", "__bv")))
    val cand = bandsOf(corpus).as("c")
      .join(broadcast(bandsOf(incoming).as("i")),
        col("c.__b") === col("i.__b") && col("c.__bv") === col("i.__bv"))
      .select(col(s"c.$idCol").as("corpus_id"), col(s"i.$idCol").as("incoming_id"))
      .distinct()
    val sc = sigOf(corpus).select(col(idCol).as("corpus_id"), col(hashesCol).as("__sha"))
    val si = sigOf(incoming).select(col(idCol).as("incoming_id"), col(hashesCol).as("__shb"))
    cand.join(sc, "corpus_id").join(broadcast(si), "incoming_id")
      .withColumn("__common", size(array_intersect(col("__sha"), col("__shb"))))
      .withColumn("jaccard",
        col("__common").cast("double") /
          (size(col("__sha")) + size(col("__shb")) - col("__common")))
      .filter(col("jaccard") >= threshold)
      .select("corpus_id", "incoming_id", "jaccard")
  }

  /** 60-bit SimHash over the token multiset (duplicates weighted).
    * Bit j of the result is set iff sum over tokens of ±1 (the j-th bit of
    * the token's 60-bit md5-prefix hash, mapped 1→+1, 0→−1) is positive.
    * 60 bits = 15 hex digits — the widest md5 prefix that fits a *signed*
    * 64-bit int in every engine (needed for the SQL oracle). Built as a SQL
    * expression because bit shifts by a *column* amount are SQL-only; still
    * fully codegen'd.
    */
  val SimhashBits = 60

  def simhash60(toksSqlExpr: String): Column = {
    val n = SimhashBits
    // md5 once per token: hash the token array first, then fold bits.
    val tokenHashes =
      s"transform($toksSqlExpr, t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"
    val bitsums =
      s"""aggregate($tokenHashes, array_repeat(cast(0 as bigint), $n),
            (acc, h) -> zip_with(acc,
              transform(sequence(0, ${n - 1}), j -> (shiftright(h, j) & 1) * 2 - 1),
              (x, y) -> x + cast(y as bigint)))"""
    // let-bind the bitsum array so the final bit-assembly fold does not
    // re-evaluate the whole aggregation per bit
    expr(
      s"""element_at(transform(array($bitsums), bs ->
            aggregate(sequence(0, ${n - 1}), cast(0 as bigint),
              (acc, j) -> acc + if(element_at(bs, j + 1) > 0,
                                   shiftleft(cast(1 as bigint), j), cast(0 as bigint)))), 1)""")
  }

  /** [[simhash60]] as an explode + columnar aggregation returning
    * (`idCol`, simhash) — identical values, but the 60 bit-sums run as
    * codegen'd conditional sums over exploded token hashes instead of
    * per-row array folds (≈5× faster, and the aggregation is itself the
    * materialization barrier the band join needs). One md5 per token row.
    */
  def simhashAgg(df: DataFrame, idCol: String, toksSqlExpr: String): DataFrame = {
    val n = SimhashBits
    val base = df.select(col(idCol), expr(toksSqlExpr).as("__toks"))
    val tok = base
      .select(col(idCol), explode(col("__toks")).as("__t"))
      .withColumn("__h", expr("cast(conv(substring(md5(__t), 1, 15), 16, 10) as bigint)"))
    val sums = (0 until n).map(j =>
      sum(expr(s"(shiftright(__h, $j) & 1) * 2 - 1")).as(s"__b$j"))
    // A null token poisons the fold in simhash60 (all bitsums null → 0 bits);
    // plain sum() would silently ignore it, so track poisoning explicitly.
    val aggCols = max(col("__h").isNull.cast("int")).as("__poisoned") +: sums
    val aggd = tok.groupBy(col(idCol))
      .agg(aggCols.head, aggCols.tail: _*)
      .select(col(idCol),
        when(col("__poisoned") === 1, lit(0L)).otherwise(
          (0 until n).map(j => when(col(s"__b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
            .reduce(_ + _)).as("__sh"))
    // explode() emits no rows for empty or null arrays, so those docs would
    // vanish — left-join back to the full id set. simhash60 yields 0 for
    // both (null bitsums make every if(...) take its 0 branch), so plain
    // coalesce restores parity.
    base.select(col(idCol))
      .join(aggd, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__sh"), lit(0L)).as("simhash"))
  }

  /** Near-duplicate pairs by SimHash Hamming distance: candidates share at
    * least one of 7 8-bit bands over bits 0..55 (pigeonhole: complete for
    * hamming <= 6 — at most 6 flipped bits can ruin at most 6 of 7 bands).
    * Band width is the candidate-volume dial: 8-bit bands admit ~7/256 of
    * random pairs vs ~1/6 for 6-bit bands; for ≫10⁶-doc corpora widen
    * further (10–16 bits) and lower the guaranteed radius.
    */
  def simhashPairs(df: DataFrame, idCol: String, simhashCol: String, maxHamming: Int): DataFrame = {
    require(maxHamming <= 6, "7x8-bit banding is only complete for hamming <= 6")
    // Repartition barrier: compute the (expensive) simhash expression once
    // below an exchange instead of letting projection collapse inline it
    // into all bands × both join sides (≈40× recompute without it).
    val mat = df.select(col(idCol), col(simhashCol)).repartition(col(idCol))
    val bands = mat.select(col(idCol), col(simhashCol),
      posexplode(transform(sequence(lit(0), lit(6)),
        p => shiftrighttable(col(simhashCol), p * 8).bitwiseAND(lit(255L)))).as(Seq("__p", "__nib")))
    // Hamming-filter BEFORE the dedup exchange: both signatures ride the
    // band join, so the test is a codegen'd map-side predicate — the
    // distinct then shuffles only matching pairs (a few thousand) instead
    // of every multi-band candidate (tens of millions at sf0.1). Same
    // output: hamming is functional in (doc_a, doc_b).
    bands.as("a")
      .join(bands.as("b"),
        col("a.__p") === col("b.__p") && col("a.__nib") === col("b.__nib") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"),
        bit_count(col(s"a.$simhashCol").bitwiseXOR(col(s"b.$simhashCol")))
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // shiftright with a Column shift amount (the DSL overload wants Int).
  private def shiftrighttable(c: Column, by: Column): Column =
    call_function("shiftright", c, by)

  /** Exact-duplicate canonical mapping: every doc maps to the smallest
    * doc id sharing its md5(text). One shuffle on the 128-bit content key —
    * at 100 TB this is the classic content-hash dedup, and the md5 groupBy
    * key distributes uniformly by construction.
    */
  def exactCanonical(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol)))
    df.withColumn("canonical_id", min(col(idCol)).over(w))
      .withColumn("is_dup", col(idCol) =!= col("canonical_id"))
  }

  /** Exact n-gram Jaccard pairs via a shingle inverted index: explode
    * shingles, equi-join on shingle, count co-occurrences per pair, compute
    * exact Jaccard from set sizes. Complete (no approximation); candidate
    * cost is sum over shingles of df². At larger corpora combine with
    * [[minhashLshPairs]] or cap shingle document frequency.
    *
    * `maxShingleDf > 0` is the candidate-volume dial: shingles appearing in
    * more than that many docs are dropped from the shingle UNIVERSE before
    * indexing (per-doc set sizes recomputed over survivors), so the join's
    * worst term — a ubiquitous shingle contributing df² candidate pairs —
    * is bounded at maxShingleDf². Semantics shift to "Jaccard over
    * non-ubiquitous shingles": a pair similar ONLY through stop-shingles
    * drops out, which is normally the point (boilerplate should not make
    * documents near-duplicates).
    *
    * `assertCapIsNoop = true` declares the caller's intent that the cap is
    * a pure COST bound, not a semantic change — i.e. no shingle in this
    * corpus actually reaches the cap and the capped output IS uncapped
    * ground truth. The premise is then enforced INSIDE the plan (a 1-row
    * max-df aggregate riding the index's reused exchange, checked by
    * `assert_true`), so the query fails loudly at EVERY scale factor it
    * runs at — suite, verify, bench — instead of silently diverging from
    * true uncapped truth while an identically-capped oracle still passes.
    */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      shinglesCol: String,
      threshold: Double,
      maxShingleDf: Long = 0L,
      assertCapIsNoop: Boolean = false): DataFrame = {
    val inv = invertedIndex(df, idCol, shinglesCol, maxShingleDf)
    val pairs = inv.as("a").join(inv.as("b"),
        col("a.__s") === col("b.__s") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(
        col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"),
        col("a.__n").as("__na"), col("b.__n").as("__nb"))
      .agg(count(lit(1)).as("__common"))
      .withColumn("jaccard",
        col("__common").cast("double") / (col("__na") + col("__nb") - col("__common")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
    withCapNoopAssertion(pairs, df, idCol, shinglesCol, maxShingleDf, assertCapIsNoop)
  }

  /** Prefix-filtered EXACT Jaccard similarity join — the PPJoin family
    * (Chaudhuri/Ganti/Kaushik 2006, Xiao et al. 2008): order the shingle
    * universe rarest-first (by document frequency), keep only each doc's
    * first p = n − ⌈t·n⌉ + 1 shingles in that order as its PREFIX, and
    * generate candidates from prefix-postings alone. The filter is
    * LOSSLESS for Jaccard ≥ t = tNum/tDen: two sets whose prefixes are
    * disjoint cannot reach the required overlap ⌈t/(1+t)·(n_a+n_b)⌉ — so
    * unlike MinHash banding there are NO false negatives, yet the join
    * never touches the full postings of common shingles (reference near-
    * dup semantics: dedup/minhash.{rs,go} in /root/reference, here as the
    * exact-join alternative to its probabilistic banding).
    *
    * Scale shape: candidate volume is Σ over PREFIX tokens of df², and
    * prefixes hold each doc's RAREST tokens — the quadratic term lives
    * exactly where df is smallest. Three LOSSLESS pruning stages run
    * before any exact work: the prefix filter itself, the LENGTH filter
    * (J ≥ t forces t·max(na,nb) ≤ min(na,nb)), and PPJoin's POSITIONAL
    * filter (a match at prefix positions (i, j) bounds the achievable
    * overlap at min(na−i, nb−j)+1; pairs whose best bound misses the
    * required ⌈t/(1+t)·(na+nb)⌉ can never verify — measured 42× candidate
    * deflation on the replicated probe corpus). Verification then joins
    * the surviving pairs to the per-doc HASH ARRAYS (two id-keyed joins
    * carrying signatures, never text or exploded postings) and counts the
    * intersection per row — no corpus-sized re-join. The one global
    * window (ranking the vocabulary by df) runs on the distinct-shingle
    * DIMENSION table, not the corpus. The threshold is a rational
    * (tDen·common ≥ tNum·union) so the decision — and hence the result
    * set — is exact int64, engine-reproducible.
    *
    * Returns (doc_a, doc_b, common, na, nb) for all pairs with
    * J ≥ tNum/tDen.
    */
  def prefixFilterJaccardPairs(
      df: DataFrame,
      idCol: String,
      hashesCol: String,
      tNum: Int,
      tDen: Int): DataFrame = {
    require(tNum > 0 && tDen >= tNum, s"bad threshold $tNum/$tDen")
    val docs = df.filter(size(col(hashesCol)) > 0)
      .select(col(idCol).as("doc"), size(col(hashesCol)).as("n"), col(hashesCol).as("__hs"))
    val exploded = docs
      .select(col("doc"), col("n"), explode(col("__hs")).as("h"))
      .repartition(col("h")) // shared barrier: df agg + df join
    // Rarest-first prefix WITHOUT any per-doc sort window: collect each
    // doc's (__df, h) pairs into one array (hash aggregation — no
    // partition-wide sort of the exploded stream), array_sort the row
    // (struct ordering is exactly the (__df, h) lexicographic order the
    // window's orderBy used; the order is strict and total because h is
    // distinct in the dimension table, so ties cannot exist), and cut to
    // the prefix length p = n − ⌈t·n⌉ + 1 BEFORE re-exploding — the
    // generator emits only prefix rows, where the window formulation
    // ranked every (doc, shingle) row through a SortExec + WindowExec
    // and filtered after. Row-for-row identical: pos here (posexplode
    // index + 1 over the sorted array) equals the old row_number.
    val dfreq = exploded.groupBy("h").agg(count(lit(1)).as("__df"))
    val prefix = exploded.join(dfreq, "h")
      .groupBy(col("doc"), col("n"))
      .agg(collect_list(struct(col("__df"), col("h"))).as("__dh"))
      .select(col("doc"), col("n"),
        posexplode(slice(array_sort(col("__dh")), lit(1),
          col("n") - expr(s"(($tNum * n) + ${tDen - 1}) div $tDen") + 1)))
      .select(col("doc"), col("n"), (col("pos") + 1).as("pos"), col("col.h").as("h"))
      .repartition(col("h")) // barrier: both self-join sides reuse one exchange
    val cand = prefix.as("pa")
      .join(prefix.as("pb"),
        col("pa.h") === col("pb.h") && col("pa.doc") < col("pb.doc") &&
          col("pa.n") * tDen >= col("pb.n") * tNum &&
          col("pb.n") * tDen >= col("pa.n") * tNum)
      .select(col("pa.doc").as("doc_a"), col("pb.doc").as("doc_b"),
        col("pa.n").as("na"), col("pb.n").as("nb"),
        (least(col("pa.n") - col("pa.pos"), col("pb.n") - col("pb.pos")) + 1).as("__bound"))
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(max(col("__bound")).as("__ub"))
      .filter(col("__ub") * (tNum + tDen) >= lit(tNum) * (col("na") + col("nb")))
      .select("doc_a", "doc_b")
    val ha = docs.select(col("doc").as("doc_a"), col("__hs").as("__ha"))
    val hb = docs.select(col("doc").as("doc_b"), col("__hs").as("__hb"))
    cand.join(ha, "doc_a").join(hb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("__ha"), col("__hb"))).cast("long").as("common"),
        size(col("__ha")).as("na"), size(col("__hb")).as("nb"))
      .filter(lit(tDen) * col("common") >= lit(tNum) * (col("na") + col("nb") - col("common")))
      .select("doc_a", "doc_b", "common", "na", "nb")
  }

  /** Attach the cap-is-noop premise check to a pair result: a 1-row max-df
    * aggregate over the SAME exploded-shingle subtree the inverted index
    * repartitions (so ReuseExchange serves it from the index's shuffle
    * files — the text pipeline is not re-run), broadcast-crossed into the
    * result and enforced with `assert_true` inside the filter condition
    * (an unused projected column could be pruned; a filter cannot). The
    * filter itself passes every row — its only effect is that the plan
    * CANNOT produce output at any scale where the premise is false.
    */
  private def withCapNoopAssertion(
      out: DataFrame,
      df: DataFrame,
      idCol: String,
      shinglesCol: String,
      maxShingleDf: Long,
      enabled: Boolean): DataFrame =
    if (!enabled || maxShingleDf <= 0L) out
    else {
      val maxDf = df.select(col(idCol), explode(col(shinglesCol)).as("__s"))
        .repartition(col("__s")) // identical subtree to the index → ReuseExchange
        .groupBy("__s").agg(count(lit(1)).as("__df"))
        .agg(max(col("__df")).as("__maxdf"))
      out.crossJoin(broadcast(maxDf))
        .filter(coalesce(
          assert_true(col("__maxdf") <= maxShingleDf,
            concat(lit(s"df cap $maxShingleDf declared a no-op but corpus max shingle df is "),
              col("__maxdf"),
              lit(" — capped output would silently diverge from uncapped ground truth"))),
          lit(true)))
        .drop("__maxdf")
    }

  /** (id, __n, __s) inverted shingle index shared by [[jaccardPairs]] /
    * [[containmentPairs]], ending in a repartition barrier on the shingle.
    *
    * The barrier is load-bearing, same rule as the MinHash signature
    * barrier above: the shingle expression (tokens → per-token md5 → fold)
    * is the expensive term, and this frame is consumed from MULTIPLE plan
    * branches — both sides of the pair self-join, and in the capped
    * variant also the df aggregation and the per-doc size recount.
    * Without the barrier each branch re-runs the whole text pipeline
    * (measured on the 8× probe corpus: the capped index build alone took
    * 141 s for a 35k-row result — all of it md5 recompute); with it every
    * branch reuses ONE exchange's shuffle files (ReuseExchange — identical
    * canonical subtrees), and the shuffle carries (id, hash) longs, never
    * text. The self-join is also already clustered on __s, so no further
    * exchange precedes it.
    */
  private def invertedIndex(
      df: DataFrame,
      idCol: String,
      shinglesCol: String,
      maxShingleDf: Long): DataFrame =
    if (maxShingleDf <= 0L) {
      df.filter(size(col(shinglesCol)) > 0)
        .select(col(idCol), size(col(shinglesCol)).as("__n"),
          explode(col(shinglesCol)).as("__s"))
        .repartition(col("__s"))
    } else {
      // shingles are distinct per doc, so count(*) per shingle == doc freq
      val exploded = df.select(col(idCol), explode(col(shinglesCol)).as("__s"))
        .repartition(col("__s"))
      val kept = exploded.join(
        exploded.groupBy("__s").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxShingleDf).select("__s"),
        "__s")
      kept.join(kept.groupBy(col(idCol)).agg(count(lit(1)).as("__n")), idCol)
        .repartition(col("__s"))
    }

  /** Content-defined chunking (Rabin-style rolling-hash boundaries) — the
    * SHIFT-ROBUST document fingerprinting that fixed-window chunking
    * (q92/q99) cannot provide: inserting a prefix moves every 64-token
    * window boundary, so a shifted near-copy shares NO fixed-window
    * fingerprints, while CDC boundaries are decided by the LOCAL token
    * content (trigram rolling hash ≡ 0 mod `divisor`) and re-align one
    * chunk after any insertion — the interior fingerprints survive.
    *
    * Mechanics: positional trigram hashes (the [[shingleHashes]] fold
    * WITHOUT the set-dedup), a boundary before token t iff the trigram
    * ending at t−1 hashes ≡ 0 (mean chunk length ≈ `divisor` tokens),
    * chunk index = running boundary count (one per-doc window — the
    * doc-sharded shard-write shape), chunk fingerprint = md5 of the
    * space-joined tokens. Everything is md5 + int64 modular arithmetic —
    * engine-reproducible, so the whole chunking sits under the oracle.
    *
    * Scale shape: two doc-sharded exchanges (the window and the chunk
    * aggregation); token text crosses the wire once, no corpus-global
    * state. Downstream exact-dedup on `chunk_md5` is the q32 hash-groupBy.
    *
    * Output: (idCol, chunk_idx, n_tokens, chunk_md5).
    */
  def cdcChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      divisor: Int = 16): DataFrame = {
    require(divisor >= 2)
    val tokenHashes =
      "transform(__toks, t -> cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint))"
    val combine = (1 to 3)
      .map(j => s"element_at(hs, i + $j)")
      .reduce((acc, h) => s"(($acc * 8191 + $h) % cast(4294967296 as bigint))")
    val positional = expr(
      s"""element_at(transform(array($tokenHashes), hs ->
            if(size(hs) >= 3,
               transform(sequence(0, size(hs) - 3), i -> $combine),
               array())), 1)""")
    val perTok = df
      .select(col(idCol), graft.functions.Text.tokens(col(textCol)).as("__toks"))
      .withColumn("__sh", positional)
      .select(col(idCol), col("__sh"), posexplode(col("__toks")).as(Seq("__p", "__tok")))
      // boundary BEFORE token t (1-based t = __p + 1) iff the trigram
      // ending at t−1 (1-based trigram index t−3) hashes ≡ 0 mod divisor
      .withColumn("__flag",
        when(col("__p") >= 3 &&
          element_at(col("__sh"), col("__p") - lit(2)) % divisor === 0, 1L)
          .otherwise(0L))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perTok
      .withColumn("chunk_idx", sum(col("__flag")).over(w))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(
        count(lit(1)).as("n_tokens"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("__p"), col("__tok")))),
            s => s.getField("__tok")), " ")).as("chunk_md5"))
  }

  /** Containment pairs — the asymmetric companion to [[jaccardPairs]]:
    * containment = |A∩B| / min(|A|, |B|), which detects a document whose
    * shingle set is (nearly) a SUBSET of another's — quotes, boilerplate
    * wrappers, and truncated re-posts that Jaccard misses because the
    * larger doc dilutes the union. Same inverted-index candidate
    * generation as jaccardPairs (one equi-join on shingle hash, count
    * aggregated — never all-pairs), so the 100 TB shape is identical;
    * only the final scalar differs.
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      shinglesCol: String,
      threshold: Double,
      maxShingleDf: Long = 0L,
      assertCapIsNoop: Boolean = false): DataFrame = {
    // maxShingleDf > 0: the same candidate-volume dial as [[jaccardPairs]],
    // and for containment it additionally fixes a SEMANTIC failure mode —
    // a short boilerplate-heavy doc reads as "contained" in everything
    // that shares the boilerplate; with stop-shingles dropped from the
    // universe (set sizes recomputed over survivors), containment means
    // containment of distinctive content. assertCapIsNoop: see
    // [[jaccardPairs]] — plan-enforced premise that the cap changes cost,
    // not output.
    val inv = invertedIndex(df, idCol, shinglesCol, maxShingleDf)
    val pairs = inv.as("a").join(inv.as("b"),
        col("a.__s") === col("b.__s") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(
        col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"),
        col("a.__n").as("__na"), col("b.__n").as("__nb"))
      .agg(count(lit(1)).as("__common"))
      .withColumn("containment",
        col("__common").cast("double") / least(col("__na"), col("__nb")))
      .filter(col("containment") >= threshold)
      .select("doc_a", "doc_b", "containment")
    withCapNoopAssertion(pairs, df, idCol, shinglesCol, maxShingleDf, assertCapIsNoop)
  }

  /** Connected components over near-duplicate pairs — the step that turns
    * pairwise similarity into dedup DECISIONS: docs in one component form a
    * duplicate cluster whose canonical representative is the minimum id
    * (the label). Iterative min-label propagation: every node starts
    * labeled with its own id and repeatedly takes the min of its
    * neighbors' labels; converges in O(component diameter) rounds —
    * near-dup clusters are clique-ish, so usually 2–3. Each round is one
    * join + one map-side-combinable min aggregation; the OLD label rides
    * along in the update pass, so convergence is read off the same cached
    * frame with a 1-row agg (no extra per-round join). maxIters bounds
    * pathological chains; for those (and 10⁹-edge graphs) use
    * [[connectedComponentsStar]], which converges in O(log) rounds.
    *
    * Output: (doc_id, cluster_id) for every doc appearing in `pairs`;
    * singletons never enter a pair and stay out by construction. The
    * result is local-checkpointed (one extra pass over the tiny label
    * frame) and every loop cache is released before returning — a
    * long-lived session sees no storage-memory residue.
    */
  /** Materialize `df` as a persisted row RDD wrapped in a constant-size
    * LogicalRDD frame. Iterative algorithms MUST break lineage this way:
    * a cached-but-not-checkpointed loop re-analyzes a logical plan that
    * grows geometrically with rounds (each round references the previous
    * one several times), which is an OOM by round ~10 regardless of data
    * size. The caller owns the returned RDD and unpersists it when the
    * next round has materialized.
    */
  private def materializeRound(
      df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
    val rdd = df.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }

  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIters: Int = 20): DataFrame = {
    val (edges, edgesRdd) = materializeRound(
      pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
        .union(pairs.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
        .distinct())
    var (labels, labelsRdd) = materializeRound(
      edges.select(col("src").as("id")).distinct().withColumn("lbl", col("id")))
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("lbl").as("dlbl")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("dlbl")).as("nlbl"))
      // carry the old label through the update: the convergence probe is a
      // 1-row aggregation over this round's materialized pass, not a second
      // full join
      val (next, nextRdd) = materializeRound(
        labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"), col("lbl").as("__old"),
            least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl")))
      val changedRow = next.agg(sum((col("lbl") =!= col("__old")).cast("long"))).head()
      val changed = if (changedRow.isNullAt(0)) 0L else changedRow.getLong(0)
      labelsRdd.unpersist(blocking = false)
      labelsRdd = nextRdd
      labels = next.select("id", "lbl")
      converged = changed == 0
      iters += 1
    }
    // localCheckpoint materializes the (small) label frame and truncates
    // what lineage remains, so every loop RDD can be released NOW instead
    // of leaking until ContextCleaner notices.
    val result = labels.select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
      .localCheckpoint(true)
    labelsRdd.unpersist(blocking = false)
    edgesRdd.unpersist(blocking = false)
    result
  }

  /** Connected components via alternating large-star / small-star rounds —
    * the O(log n)-round algorithm for graphs where label propagation's
    * O(diameter) rounds would be the bottleneck (chains, 10⁹-edge graphs;
    * cf. Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014). Each round is two groupBy-min + join passes over the edge
    * set; at the fixed point every node holds an edge straight to its
    * component's minimum id (a star), which is exactly the
    * (doc_id, cluster_id) labeling [[connectedComponents]] produces.
    *
    *  - large-star: every node connects its LARGER neighbors to the
    *    minimum of its neighborhood (incl. itself) — long paths collapse
    *    toward local minima in parallel (pointer-doubling-style).
    *  - small-star: every node connects its smaller-or-equal neighbors to
    *    that minimum — stars re-form so the next large-star can jump
    *    further.
    *
    * Convergence is detected with an order-independent content checksum
    * (count + id sums + xxhash64 sum) of the edge set — one 1-row agg per
    * round on the frame the round materializes anyway; the astronomically
    * unlikely checksum collision only costs one extra round. Same
    * release discipline as [[connectedComponents]]: result is
    * local-checkpointed, all round caches freed before returning.
    */
  def connectedComponentsStar(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxRounds: Int = 30): DataFrame =
    connectedComponentsStarWithRounds(pairs, aCol, bCol, maxRounds)._1

  /** [[connectedComponentsStar]] with the label table COMMITTED through a
    * caller-supplied sink instead of localCheckpointed: `commit` writes the
    * converged (doc_id, cluster_id) frame and returns the read-back view.
    * This is the release-pipeline configuration — the dedup-decisions table
    * becomes a real table between stages (what a 100 TB run does anyway),
    * downstream lineage starts at the sink's parquet scan, and the operator
    * leaves NO persisted RDD behind.
    */
  def connectedComponentsStarCommitted(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      commit: DataFrame => DataFrame,
      maxRounds: Int = 30): DataFrame =
    connectedComponentsStarWithRounds(pairs, aCol, bCol, maxRounds, commit)._1

  /** [[connectedComponentsStar]] plus the number of rounds it took —
    * exposed so specs can pin the O(log n) convergence behavior.
    *
    * `commit` finishes the label table once the loop converges. The default
    * localCheckpoints it (materialize + truncate lineage so every loop cache
    * can be released immediately). A release pipeline instead COMMITS the
    * decision table — pass a commit that writes it through the real sink and
    * returns the read-back frame ([[graft.queries.DedupQueries]] q101/q102):
    * downstream lineage then starts at a parquet scan, and no persisted RDD
    * outlives the operator at all.
    */
  private[graft] def connectedComponentsStarWithRounds(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxRounds: Int = 30,
      commit: DataFrame => DataFrame = _.localCheckpoint(true)): (DataFrame, Int) = {
    // undirected neighbor view: both directions, self-loops dropped
    def bothDirs(e: DataFrame): DataFrame =
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .filter(col("src") =!= col("dst"))

    // for each node: min(neighbors ∪ {self}); larger neighbors point there
    // (r16 negative result, kept for the record: an explicit count-gated
    // broadcast() of `mins` — provably broadcast-sized from the previous
    // round's checksum count — cut 4 jobs/query in isolated profiles but
    // REGRESSED the interleaved sweep family-wide: q101 +34 %, q102
    // +24 %, q202 +24 %, q196 +19 %, q182 +16 % against a 1.07× host
    // band, and a same-window q88 A/B read +15 % with the hint on. AQE's
    // runtime conversion builds the broadcast FROM the mins shuffle's
    // map output; the static hint instead executes the whole mins
    // subtree — including its internal aggregation exchange — as an
    // un-coalesced collect inside a BroadcastExchange per star per
    // round. Reverted; AQE stays load-bearing here, same conclusion as
    // r15's AQE-off experiment from the other direction.)
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = bothDirs(e)
      val mins = nbrs.groupBy("src").agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("mn"), col("src")).as("m"))
      nbrs.join(mins, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }

    // orient large→small; each node's smaller neighbors (and itself) point
    // to the minimum of that set
    def smallStar(e: DataFrame): DataFrame = {
      val or = e.select(
        greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      val mins = or.groupBy("src").agg(min(col("dst")).as("m"))
      or.join(mins, "src")
        .filter(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .union(mins.select(col("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }

    def checksum(e: DataFrame): (Long, Long, Long, Long) = {
      val r = e.agg(count(lit(1)), sum(col("src")), sum(col("dst")),
        sum(xxhash64(col("src"), col("dst")))).head()
      def g(i: Int) = if (r.isNullAt(i)) 0L else r.getLong(i)
      (g(0), g(1), g(2), g(3))
    }

    var (edges, edgesRdd) = materializeRound(
      pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
        .filter(col("src") =!= col("dst")).distinct())
    var sig = checksum(edges)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      // each round rematerializes as a LogicalRDD — see materializeRound:
      // without lineage truncation the round-k plan grows geometrically
      val (next, nextRdd) = materializeRound(smallStar(largeStar(edges)))
      val nsig = checksum(next)
      edgesRdd.unpersist(blocking = false)
      edges = next
      edgesRdd = nextRdd
      converged = nsig == sig
      sig = nsig
      rounds += 1
    }
    // Pre-convergence a node can still hold SEVERAL outgoing edges, so an
    // early exit would emit duplicate, possibly-wrong labels — fail loudly
    // instead. O(log n) rounds means the default budget covers any corpus
    // that fits on hardware; hitting it indicates a bug, not a big graph.
    if (!converged) {
      edgesRdd.unpersist(blocking = false)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge within $maxRounds rounds")
    }
    // fixed point: edges = (node → component min) stars; roots (component
    // minima) appear only as dst, and label themselves
    val roots = edges.select(col("dst").as("id")).distinct()
      .join(edges.select(col("src").as("id")).distinct(), Seq("id"), "left_anti")
    val result = commit(
      edges.select(col("src").as("doc_id"), col("dst").as("cluster_id"))
        .unionByName(roots.select(col("id").as("doc_id"), col("id").as("cluster_id"))))
    edgesRdd.unpersist(blocking = false)
    (result, rounds)
  }

  /** Sparse tf-idf cosine similarity pairs — the WEIGHTED companion of
    * [[jaccardPairs]]: documents as sparse tf·idf vectors, pairwise
    * cosine computed through the shared-term postings join, so two docs
    * that share only stopwords score near zero where Jaccard would still
    * count them. idf is the one libm `ln` (floored to the 10⁻⁴ grid —
    * the q64/BM25 discipline); weights, dot products and norms are then
    * exact int64, and cos_fp = (dot·10⁴) div (isqrt(‖a‖²)·isqrt(‖b‖²))
    * divides non-negative ints — engine-identical.
    *
    * The df cap (terms in more than `maxDf` docs leave the vector space
    * — df-ranked stopword removal, the q110/q127 production dial) bounds
    * the candidate join at Σ df² over surviving terms; weights ride the
    * shuffle as (doc, term-hash, w) longs, never text.
    *
    * Returns (doc_a, doc_b, dot, cos_fp) for candidate pairs sharing ≥1
    * surviving term.
    */
  def tfidfCosinePairs(
      docs: DataFrame,
      idCol: String,
      termsCol: Column,
      maxDf: Long): DataFrame = {
    require(maxDf >= 1)
    val tf = docs
      .select(col(idCol).as("doc"), explode(termsCol).as("term"))
      .groupBy("doc", "term").agg(count(lit(1)).as("tf"))
      .repartition(col("term")) // barrier: df agg + both pair-join sides
    val nDocs = docs.select(col(idCol)).distinct()
      .agg(count(lit(1)).cast("double").as("__n"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val w = tf.join(dfT, "term").crossJoin(broadcast(nDocs))
      .withColumn("w",
        col("tf") * floor(lit(1e4) * log(col("__n") / col("df"))).cast("long"))
      .select("doc", "term", "w")
    val norms = w.groupBy("doc").agg(sum(col("w") * col("w")).as("n2"))
    val dots = w.as("a").join(w.as("b"),
        col("a.term") === col("b.term") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"))
    dots
      .join(norms.select(col("doc").as("doc_a"), col("n2").as("__na")), "doc_a")
      .join(norms.select(col("doc").as("doc_b"), col("n2").as("__nb")), "doc_b")
      .withColumn("__sa", Sampling.isqrt(col("__na")))
      .withColumn("__sb", Sampling.isqrt(col("__nb")))
      .withColumn("cos_fp",
        expr("(dot * 10000) div greatest(1L, __sa * __sb)"))
      .select("doc_a", "doc_b", "dot", "cos_fp")
  }

  /** INCREMENTAL connected components — fold a batch of NEW near-dup
    * edges into an existing converged label table without re-clustering
    * the corpus: each new edge is CONTRACTED to the label graph (endpoint
    * → its current cluster id, or itself if unseen), edges that land
    * inside one cluster vanish, and [[connectedComponentsStar]] runs on
    * what remains — a graph with one node per AFFECTED cluster, so the
    * loop's cost tracks the batch, never the corpus. The resulting
    * old-label → new-label mapping is applied with one broadcastable
    * join; untouched clusters pass through unchanged.
    *
    * Labels stay canonical (cluster id = min member id) because min is
    * associative: the min over a merged component equals the min over its
    * old cluster minima — which is exactly what the star loop computes on
    * the contracted graph. Equality with from-scratch CC over the union
    * edge set is therefore structural, and q182 puts it under the hash
    * gate (the incremental result runs against the from-scratch oracle).
    */
  def connectedComponentsIncremental(
      labels: DataFrame,
      newPairs: DataFrame,
      aCol: String,
      bCol: String,
      maxRounds: Int = 30): DataFrame = {
    val la = labels.select(col("doc_id").as("__a"), col("cluster_id").as("__la"))
    val lb = labels.select(col("doc_id").as("__b"), col("cluster_id").as("__lb"))
    val contracted = newPairs
      .select(col(aCol).cast("long").as("__a"), col(bCol).cast("long").as("__b"))
      .join(la, Seq("__a"), "left").join(lb, Seq("__b"), "left")
      .select(coalesce(col("__la"), col("__a")).as("la"),
        coalesce(col("__lb"), col("__b")).as("lb"))
      .filter(col("la") =!= col("lb"))
    val mapping = connectedComponentsStar(contracted, "la", "lb", maxRounds)
      .select(col("doc_id").as("cluster_id"), col("cluster_id").as("__new"))
    val newNodes = newPairs.select(col(aCol).cast("long").as("doc_id"))
      .union(newPairs.select(col(bCol).cast("long").as("doc_id")))
      .distinct()
      .join(labels.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
    labels.select(col("doc_id").cast("long").as("doc_id"),
        col("cluster_id").cast("long").as("cluster_id"))
      .unionByName(newNodes)
      .join(mapping, Seq("cluster_id"), "left")
      .select(col("doc_id"), coalesce(col("__new"), col("cluster_id")).as("cluster_id"))
  }

  /** Train/test decontamination: (train, test) doc pairs sharing at least
    * `minShared` distinct word n-grams — the benchmark-contamination check a
    * training corpus runs before release (n-gram collision against the eval
    * set, GPT-3/PaLM-style).
    *
    * Scale shape: the eval set is orders of magnitude smaller than the
    * corpus, so its exploded n-gram index is BROADCAST — the 100 TB train
    * side streams through a broadcast hash join with no shuffle, and the
    * per-pair count aggregates with map-side combine. Overlap counts use
    * distinct n-grams per doc, so a phrase repeated inside one train doc
    * cannot inflate its overlap.
    */
  /** `hashGrams = true` joins on 60-bit md5 prefixes of the n-grams instead
    * of the strings: the broadcast eval index and the join keys shrink to
    * one long per n-gram (vs tens of bytes of text), at a ~N²/2⁶⁰ false-
    * positive risk — negligible below ~10⁸ distinct n-grams, and the right
    * default for a production-sized eval set. `false` keeps exact string
    * equality (the oracle-checked configuration).
    */
  def contaminationPairs(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minShared: Int = 2,
      hashGrams: Boolean = false): DataFrame = {
    def grams(df: DataFrame, as: String) = {
      val base = df.select(col(idCol).as(as),
        explode(array_distinct(
          graft.functions.Text.wordNgramsFromText(col(textCol), n))).as("__gs"))
      if (hashGrams)
        base.select(col(as),
          expr("cast(conv(substring(md5(__gs), 1, 15), 16, 10) as bigint)").as("__g"))
      else base.withColumnRenamed("__gs", "__g")
    }
    grams(train, "train_id")
      .join(broadcast(grams(test, "test_id")), "__g")
      .groupBy("train_id", "test_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Decontamination for an eval set TOO BIG TO BROADCAST — the other end
    * of [[contaminationPairs]]'s scale spectrum. Semantics are identical
    * (hashed-gram config), but the join is a shuffle join, and the train
    * side is pre-filtered MAP-SIDE by a Bloom filter built over the eval
    * grams (Spark's own `BloomFilterAggregate` / `BloomFilterMightContain`
    * — the runtime-row-level-filter machinery, applied explicitly). The
    * bloom binary is megabytes where the gram index is gigabytes, so at
    * 100 TB it broadcasts when the index can't, and the shuffle carries
    * only train grams that (probably) hit the eval set — false positives
    * are dropped by the exact equi-join, so results are bit-identical to
    * the unfiltered join (same oracle as q75).
    *
    * The bloom build is one tiny agg job at plan-build time — the same
    * two-phase shape Spark's AQE runtime filters use, made explicit.
    */
  def contaminationPairsBloom(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minShared: Int = 2,
      expectedTestGrams: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftshim.ColumnShim
    def grams(df: DataFrame, as: String) =
      df.select(col(idCol).as(as),
        explode(array_distinct(
          graft.functions.Text.wordNgramsFromText(col(textCol), n))).as("__gs"))
        .select(col(as),
          expr("cast(conv(substring(md5(__gs), 1, 15), 16, 10) as bigint)").as("__g"))
    val testGrams = grams(test, "test_id")
    // Phase 1: the bloom over eval gram hashes (8 bits/item ≈ 2% fpp).
    val bloomAgg = ColumnShim.column(
      new BloomFilterAggregate(
        ColumnShim.expression(xxhash64(col("__g"))),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedTestGrams),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedTestGrams * 8),
        0, 0).toAggregateExpression())
    val bloomBytes = testGrams.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    // Phase 2: map-side prune of the train side, then the exact shuffle
    // join (shuffle_hash: the eval index is modeled as above the broadcast
    // threshold — the configuration this operator exists for).
    val mightContain = ColumnShim.column(
      BloomFilterMightContain(
        ColumnShim.expression(lit(bloomBytes)),
        ColumnShim.expression(xxhash64(col("__g")))))
    grams(train, "train_id")
      .filter(mightContain)
      .join(testGrams.hint("shuffle_hash"), "__g")
      .groupBy("train_id", "test_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** PageRank over an undirected pair list in EXACT integer arithmetic —
    * centrality of the near-dup graph (which documents sit at the heart
    * of a duplication cluster vs its fringe — a canonical-selection
    * signal beyond q105's quality argmax). Float PageRank is never
    * engine-reproducible; this one is: ranks start at 10^9 mass units,
    * each round redistributes `r div deg` along every edge and applies
    * damping 85/100 by integer cross-multiplication —
    * `r' = 15·10^9 div 100 + (85·Σ contrib) div 100` — so three rounds
    * hash-match a SQL replay bit-for-bit (the [[Similarity.kmeansFp]]
    * discipline for iterative ML, applied to iterative graph scoring).
    * Floor division leaks mass monotonically; ranking, not mass
    * conservation, is the contract (leak bounded by deg·iters units).
    *
    * Scale shape: per round, one join of edges to (deg, rank) on src +
    * one map-side-combined sum by dst — the standard Pregel round as two
    * shuffles on the edge list; undirected input means no dangling-node
    * term. Plans nest per round; for rounds ≫ 3 materialize between
    * rounds (the [[connectedComponentsStar]] loop discipline).
    */
  def pageRankFp(
      pairs: DataFrame, aCol: String, bCol: String, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 8)
    val edges = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .union(pairs.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    var ranks = deg.select(col("src").as("id"), lit(1000000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(deg, "src")
        .join(ranks.select(col("id").as("src"), col("r")), "src")
        .select(col("dst").as("id"), expr("r div deg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("cs"))
      ranks = ranks.select("id").join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(150000000L) + expr("(85 * coalesce(cs, 0L)) div 100")).as("r"))
    }
    ranks.select(col("id").as("doc_id"), col("r").as("pr_fp"))
  }

  /** Triangle census of an undirected pair list — the near-dup graph's
    * transitivity audit: MinHash/prefix-join edges are pairwise decisions,
    * and the ratio of closed triangles to open wedges (the global
    * clustering coefficient, here as the exact rational 3·T / W) says how
    * self-consistent those decisions are before connected components
    * fuses them into clusters (near-dup similarity is not transitive; a
    * LOW ratio warns that CC will chain dissimilar docs through middlemen).
    *
    * Exact and scale-shaped: edges arrive canonicalized a<b, so each
    * triangle a<b<c is counted once by the two-join rule
    * e(a,b)⋈e(b,c)⋈e(a,c) — two equi-joins ON THE EDGE LIST, never the
    * doc table; wedges are Σ deg·(deg−1)/2, one map-side-combined pass.
    * All int64, engine-reproducible.
    */
  def triangleStats(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = pairs.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
    val tri = e.as("ab")
      .join(e.as("bc"), col("ab.v") === col("bc.u"))
      .join(e.as("ac"), col("ac.u") === col("ab.u") && col("ac.v") === col("bc.v"))
      .agg(count(lit(1)).as("n_triangles"))
    val wedges = e.select(col("u").as("x")).union(e.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("dg"))
      .agg(sum(expr("dg * (dg - 1) div 2")).as("n_wedges"))
    tri.crossJoin(wedges)
  }

  /** k-core by bulk-synchronous peeling (the parallel form of Matula &
    * Beck 1983 / Batagelj–Zaveršnik): repeatedly drop every node whose
    * degree among SURVIVORS is < k; what remains is the k-core — the
    * maximal subgraph of minimum degree k. On a near-dup graph the k-core
    * separates docs embedded in DENSE duplication communities from
    * degree-k fringe riders (degree alone can't: a hub of k leaves has
    * high degree but no 2-core).
    *
    * `rounds` bounds the peeling depth; `assertFixpoint` makes the PLAN
    * prove convergence — one extra peel must remove nothing, enforced
    * with `assert_true` (the df-cap premise discipline: a bound is an
    * assertion that fails loudly at every scale, not a hope). Scale
    * shape: each round is two semi-joins + one degree aggregation over a
    * monotonically shrinking survivor set, all lazy; a production run at
    * real peeling depth would checkpoint every few rounds to cut lineage
    * (the CC discipline).
    *
    * Returns the k-core node set as a single `id` column.
    */
  /** `stopWhenStable = true` stops peeling at the PROVABLE fixed point:
    * survivor sets shrink monotonically (each round filters the previous
    * round's survivors), so an unchanged row count between rounds means an
    * unchanged set, and every later peel is the identity — the result is
    * row-for-row what the full `rounds` budget produces. Rounds stay the
    * hard budget; the count is one footer-metadata job per committed
    * round. Only meaningful with a MATERIALIZING `commit` (a count on the
    * default lazy tower would execute the whole tower per round), hence
    * opt-in.
    */
  def kCore(
      pairs: DataFrame, aCol: String, bCol: String,
      k: Int, rounds: Int, assertFixpoint: Boolean = false,
      commit: DataFrame => DataFrame = identity,
      stopWhenStable: Boolean = false): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 16, s"bad kCore params k=$k rounds=$rounds")
    val e = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    // The undirected edge view is referenced TWICE PER ROUND (the src and
    // dst semi-join sides) for every peel round plus the fixpoint check —
    // lazily that re-derives the union+distinct (and whatever candidate
    // pipeline feeds `pairs`) each time. Materialize it ONCE through the
    // caller's commit: with the default identity this is a no-op (the
    // lazy shape is unchanged); with a materializing commit every round
    // becomes two joins + one agg over a plain scan of the staged edges
    // (r16 — same §2.4 shared-pass rule as the round commits below).
    val und = commit(
      e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
        .filter(col("src") =!= col("dst")).distinct())
    def peel(s: DataFrame): DataFrame =
      und.join(s.select(col("id").as("src")), "src")
        .join(s.select(col("id").as("dst")), "dst")
        .groupBy("src").agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k).select(col("src").as("id"))
    // Lazy peeling is EXPONENTIAL in plan references: round r's survivors
    // reference round r−1 TWICE (src and dst side), so und — and whatever
    // candidate pipeline feeds it — would be re-derived ~2^rounds times.
    // `commit` (Stage.through in the oracle-gated queries) materializes
    // each round, making every round one small job over the previous
    // round's table — the checkpoint-per-round discipline CC uses.
    var surv = und.select(col("src").as("id")).distinct()
    var prevN = -1L
    var stable = false
    for (_ <- 1 to rounds; if !stable) {
      surv = commit(peel(surv))
      if (stopWhenStable) {
        val n = surv.count()
        stable = n == prevN
        prevN = n
      }
    }
    if (!assertFixpoint) surv
    else {
      val chk = surv.agg(count(lit(1)).as("__n1"))
        .crossJoin(peel(surv).agg(count(lit(1)).as("__n2")))
      surv.crossJoin(broadcast(chk))
        .filter(coalesce(
          assert_true(col("__n1") === col("__n2"),
            concat(lit(s"k-core k=$k not converged after $rounds rounds: "),
              col("__n1"), lit(" -> "), col("__n2"))),
          lit(true)))
        .drop("__n1", "__n2")
    }
  }
}
