package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Retrieval scoring: BM25 keyword search and reciprocal-rank fusion —
  * the lexical half of a hybrid (keyword + embedding) retrieval stack
  * over the corpus, and the standard scale-free way to combine the two
  * rankings.
  */
object Search {

  /** BM25 (Robertson et al.; the Lucene idf variant
    * ln((N − df + 0.5)/(df + 0.5) + 1)) for a fixed term set:
    * (doc_id, n_terms_hit, bm25_fp), every matching doc scored.
    *
    * Determinism: per-term scores floor to fixed-point (1e6) BEFORE the
    * per-doc sum — int64 addition commutes where raw doubles wouldn't —
    * and every float op is one IEEE step on exact-int inputs except ln
    * (the q64 ulp-separation argument). Scale shape: only the query
    * terms' postings survive the scan (the isin filter is the
    * inverted-index probe), df and the corpus stats are broadcast
    * 1-row/|terms|-row frames, and the doc-length join shuffles on
    * doc_id only for docs that matched.
    */
  def bm25(
      docs: DataFrame,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty)
    val toks = toksOf(docs)
    val dl = dlOf(toks)
    val st = dl.agg(count(lit(1)).cast("double").as("__n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    score(tfOf(toks, terms), dfOf(toks, terms), dl, st, k1, b)
  }

  /** BM25 with INCREMENTALLY-MAINTAINED index statistics: the corpus's
    * stats tables (doc lengths, per-term df, corpus totals) are merged
    * with the incoming batch's — exact-integer additions per term/total,
    * never a recount of the corpus — and scoring runs on the merged
    * stats. Byte-identical to [[bm25]] over the union BY CONSTRUCTION
    * (the merged counts are the same integers, avgdl is the same single
    * division of the same exact totals), so both formulations run under
    * ONE oracle — the q132/q137 incremental-equals-batch discipline. At
    * scale the corpus-side stats are a maintained artifact: a batch
    * append costs one pass over the BATCH, not the corpus.
    */
  def bm25Incremental(
      corpus: DataFrame,
      incoming: DataFrame,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty)
    val (tc, ti) = (toksOf(corpus), toksOf(incoming))
    val (dlc, dli) = (dlOf(tc), dlOf(ti))
    val dl = dlc.unionByName(dli)
    val st = dlc.agg(count(lit(1)).as("nd"), sum(col("dl")).as("sd"))
      .unionByName(dli.agg(count(lit(1)).as("nd"), sum(col("dl")).as("sd")))
      .agg(sum(col("nd")).cast("double").as("__n"),
        (sum(col("sd")).cast("double") / sum(col("nd"))).as("avgdl"))
    val dfm = dfOf(tc, terms).unionByName(dfOf(ti, terms))
      .groupBy("term").agg(sum(col("df")).as("df"))
    score(tfOf(tc, terms).unionByName(tfOf(ti, terms)), dfm, dl, st, k1, b)
  }

  /** PMI query expansion — each seed term pulls in its strongest
    * collocate (argmax PMI over bigrams containing the seed, the q173
    * statistic; ties → lexicographic bigram), and BM25 runs over
    * seeds ∪ partners. The classic thesaurus-free recall lever: a query
    * for "table join" also surfaces docs phrased with the collocates the
    * corpus itself pairs those words with.
    *
    * Scale shape: the PMI table is vocabulary²-bounded (bigram counts
    * with a support floor, three map-side-combined count tables); the
    * per-seed argmax is a window over each seed's candidate bigrams
    * only. Returns a 1-column `term` frame — the expansion stays IN-PLAN
    * (no driver round-trip), feeding [[bm25Terms]] as a broadcast probe.
    */
  def pmiExpand(docs: DataFrame, seeds: Seq[String], minCount: Long = 5L): DataFrame = {
    require(seeds.nonEmpty)
    import org.apache.spark.sql.expressions.Window
    val uni = docs.select(explode(Text.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val bigrams = docs.select(explode(Text.wordNgramsFromText(col("text"), 2)).as("bigram"))
    val nUni = uni.agg(sum(col("c")).as("__nu"))
    val nBi = bigrams.agg(count(lit(1)).as("__nb"))
    val pmi = bigrams.groupBy("bigram").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      .withColumn("pmi_fp", floor(lit(1e6) * log(
        (col("c_ab") * col("__nu") * col("__nu")).cast("double") /
          (col("__nb") * col("c1") * col("c2")).cast("double"))).cast("long"))
    val cand = pmi.filter(col("w1").isin(seeds: _*))
      .select(col("w1").as("seed"), col("w2").as("partner"), col("pmi_fp"), col("bigram"))
      .unionByName(pmi.filter(col("w2").isin(seeds: _*))
        .select(col("w2").as("seed"), col("w1").as("partner"), col("pmi_fp"), col("bigram")))
    val partners = cand
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("seed")).orderBy(col("pmi_fp").desc, col("bigram").asc)))
      .filter(col("__rn") === 1)
      .select(col("partner").as("term"))
    import docs.sparkSession.implicits._
    seeds.toDF("term").unionByName(partners).distinct()
  }

  /** [[bm25]] with the term set as a FRAME instead of literals — the
    * shape query-expansion needs (the expansion is computed in-plan).
    * The term frame broadcasts as the inverted-index probe on both the
    * tf and df sides; scoring is byte-identical to [[bm25]] for the same
    * term set.
    */
  def bm25Terms(
      docs: DataFrame,
      termsDf: DataFrame,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val toks = toksOf(docs)
    val dl = dlOf(toks)
    val st = dl.agg(count(lit(1)).cast("double").as("__n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val t = broadcast(termsDf.select(col("term")).distinct())
    val tf = toks.join(t, "term")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tc"))
    val dfm = toks.select("doc_id", "term").distinct().join(t, "term")
      .groupBy("term").agg(count(lit(1)).as("df"))
    score(tf, dfm, dl, st, k1, b)
  }

  private def toksOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(Text.tokens(col("text"))).as("term"))

  private def dlOf(toks: DataFrame): DataFrame =
    toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))

  private def tfOf(toks: DataFrame, terms: Seq[String]): DataFrame =
    toks.filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tc"))

  private def dfOf(toks: DataFrame, terms: Seq[String]): DataFrame =
    toks.select("doc_id", "term").distinct()
      .filter(col("term").isin(terms: _*))
      .groupBy("term").agg(count(lit(1)).as("df"))

  private def score(
      tf: DataFrame, dft: DataFrame, dl: DataFrame, st: DataFrame,
      k1: Double, b: Double): DataFrame =
    tf.join(broadcast(dft), "term").join(dl, "doc_id").crossJoin(broadcast(st))
      .withColumn("idf",
        log((col("__n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("term_fp", floor(
        col("idf")
          * ((col("tc") * lit(k1 + 1)) /
             (col("tc") + lit(k1) * (lit(1 - b) + lit(b) * (col("dl") / col("avgdl")))))
          * lit(1e6)).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("term_fp")).as("bm25_fp"))

  /** Positional phrase search: occurrences of an exact n-term phrase via
    * the positional inverted index — postings are (doc_id, pos) rows for
    * the QUERY terms only (the `isin` filter is the index probe, pushed
    * into the scan), and an n-term phrase is the (n−1)-fold equi-join on
    * (doc_id, pos + i). Returns one row per match: (doc_id, pos of the
    * phrase's first token).
    *
    * Scale shape: nothing corpus-sized shuffles — only the query terms'
    * postings leave the scan, and each join key (doc_id, pos) is unique
    * per posting so the join never fans out. The adjacency join is how
    * positional indexes (Lucene, Trino's full-text connectors) evaluate
    * phrases; repeated terms in the phrase are handled naturally because
    * each leg re-filters the postings by ITS term before the offset join.
    */
  def phraseMatches(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "phrase needs at least two terms")
    val pos = docs.select(col("doc_id"),
        posexplode(Text.tokens(col("text"))).as(Seq("pos", "term")))
      .filter(col("term").isin(phrase.distinct: _*))
    val base = pos.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos").cast("long").as("pos"))
    phrase.zipWithIndex.tail.foldLeft(base) { case (acc, (t, i)) =>
      acc.join(
        pos.filter(col("term") === t)
          .select(col("doc_id"), (col("pos").cast("long") - i).as("pos")),
        Seq("doc_id", "pos"))
    }
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of two
    * top-k rank lists: rrf = Σ_list 1/(kConst + rank), absent docs
    * contribute 0. Each term is ONE IEEE division of exact integers and
    * the fusion of two lists is ONE addition, so the fused score is
    * bit-deterministic. `a`/`b`: (idCol, rank) frames — RANKED TOP-K
    * LISTS, not whole corpora (fusion operates on candidate lists by
    * construction; the windows that produce the ranks run over ≤ k rows).
    */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, kConst: Int = 60): DataFrame = {
    a.select(col(idCol), col("rank").as("__ra"))
      .join(b.select(col(idCol), col("rank").as("__rb")), Seq(idCol), "full_outer")
      .select(col(idCol), col("__ra").as("rank_a"), col("__rb").as("rank_b"),
        (coalesce(lit(1.0) / (lit(kConst) + col("__ra")), lit(0.0))
          + coalesce(lit(1.0) / (lit(kConst) + col("__rb")), lit(0.0))).as("rrf"))
  }
}
