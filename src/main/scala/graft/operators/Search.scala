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
