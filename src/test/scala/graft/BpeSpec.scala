package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** Pins the BPE merge-application semantics that the q131 oracle replays:
  * greedy left-to-right non-overlapping merges, symbol-boundary safety of
  * the sentinel encoding, and frequency-weighted argmax with lexicographic
  * tie-break.
  */
class BpeSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def docs(texts: String*) = texts.toDF("text")

  test("learnMerges picks the weighted top pair and merges greedily") {
    // "abab abab ax" ×1: pairs ab:4(per word 2×2... ) — spell it out:
    // words: "abab" wn=2, "ax" wn=1
    // round 1 pairs: (a,b)=2·2=4, (b,a)=2·1=2, (a,x)=1 → merge "ab"
    val out = Bpe.learnMerges(docs("abab abab ax"), "text", rounds = 2).collect()
    assert(out(0).getString(1) == "a" && out(0).getString(2) == "b")
    assert(out(0).getString(3) == "ab" && out(0).getLong(4) == 4L)
    // round 2: "abab" is now [ab, ab] → (ab,ab)=2; "ax" → [a, x] → (a,x)=1
    assert(out(1).getString(3) == "abab" && out(1).getLong(4) == 2L)
  }

  test("merge of a repeated symbol is left-to-right non-overlapping") {
    // "aaaa": round-1 top pair is (a,a) with count 3 (three adjacencies);
    // applying it greedily gives [aa, aa], NOT [aa, a, a]-with-overlap —
    // so round 2's top pair is (aa, aa)
    val out = Bpe.learnMerges(docs("aaaa"), "text", rounds = 2).collect()
    assert(out(0).getString(3) == "aa" && out(0).getLong(4) == 3L)
    assert(out(1).getString(1) == "aa" && out(1).getString(2) == "aa" &&
      out(1).getLong(4) == 1L)
    // odd length: "aaaaa" → [aa, aa, a]; (aa,aa)=1 ties (aa,a)=1 and the
    // lexicographic tie-break on b picks "a" < "aa" → winner (aa, a)
    val odd = Bpe.learnMerges(docs("aaaaa"), "text", rounds = 2).collect()
    assert(odd(1).getString(1) == "aa" && odd(1).getString(2) == "a")
  }

  test("merged symbols never match across their boundary") {
    // after merging (a,b) in "xab cab", the sequences are [x, ab] and
    // [c, ab]; a later pair (b, c) must never match inside/across the
    // merged "ab" symbol. Round 2 top must be (x, ab) or (c, ab) — both
    // count 1 — never anything involving a bare "b".
    val out = Bpe.learnMerges(docs("ab ab xab cab"), "text", rounds = 2).collect()
    assert(out(0).getString(3) == "ab")
    val (a2, b2) = (out(1).getString(1), out(1).getString(2))
    assert(Set("x", "c").contains(a2) && b2 == "ab", s"got ($a2, $b2)")
  }

  test("encode applies merges in learned order and counts symbols per doc") {
    // merges [(a,b), (ab,c)]: "abc" → [ab, c] → [abc] = 1 symbol;
    // "ab" → [ab] = 1; "ba c" → [b,a] + [c] = 3 symbols over 2 words.
    // Order matters: applying (ab,c) before (a,b) would find no "ab"
    // symbol and leave "abc" at 2 symbols — the test pins the order.
    val docs = Seq((1L, "abc ab"), (2L, "ba c")).toDF("doc_id", "text")
    val out = Bpe.encode(docs, "doc_id", "text",
        Seq(("a", "b"), ("ab", "c")))
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 2L && out(0).getLong(2) == 2L) // abc→1, ab→1
    assert(out(1).getLong(1) == 2L && out(1).getLong(2) == 3L) // b,a + c
  }

  test("encodeViaVocab equals encode (vocab-join formulation, repeated words)") {
    // repeated words across docs exercise the join fan-out; the learned-
    // order dependency pins that the vocab side replays the same chain
    val docs = Seq((1L, "abc ab abc"), (2L, "ba c ab"), (3L, "abc")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"), ("ab", "c"))
    val direct = Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().toSeq
    val viaVocab = Bpe.encodeViaVocab(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().toSeq
    assert(viaVocab == direct)
  }

  test("learnMerges returns early when no mergeable pair remains") {
    // every word is a single character: zero adjacent pairs from round 1
    assert(Bpe.learnMerges(docs("a b c a"), "text", rounds = 3).count() == 0L)
    // one merge exhausts the corpus; rounds 2-3 must not throw
    val one = Bpe.learnMerges(docs("ab ab"), "text", rounds = 3).collect()
    assert(one.length == 1 && one(0).getString(3) == "ab")
    assert(Bpe.compressionCurve(docs("ab ab"), "text", rounds = 3).count() == 2L)
  }

  test("pruneAudit: low-usage merges are dropped; ancestor pruning disables descendants") {
    // 10x "abc", 2x "ab", 4x "xy": learns ab, abc, xy. In the final
    // encoding "ab" survives only in the 2 bare "ab" words (usage 2),
    // "abc" has usage 10, "xy" usage 4 -> rule 2u >= 10 keeps only "abc".
    val corpus = docs(
      (Seq.fill(10)("abc") ++ Seq.fill(2)("ab") ++ Seq.fill(4)("xy")).mkString(" "))
    val rows = Bpe.pruneAudit(corpus, "text", rounds = 3).collect()
    assert(rows.map(r => (r.getString(1), r.getLong(2), r.getBoolean(3))).toSeq ==
      Seq(("ab", 2L, false), ("abc", 10L, true), ("xy", 4L, false)))
    assert(rows.head.getLong(4) == 16L) // full: every word one symbol
    // pruning "ab" (the ancestor) leaves "abc"'s pattern unmatchable: the
    // pruned encode degrades to characters — the audit SURFACES that cost
    // (30 + 4 + 8 = 42) instead of pretending merges are independent.
    assert(rows.head.getLong(5) == 42L)
  }

  test("pairCounts ignores single-symbol words") {
    val words = Bpe.wordTable(docs("a a a bc"), "text")
    val pairs = Bpe.pairCounts(words).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getString(0) == "b" && pairs(0).getString(1) == "c" &&
      pairs(0).getLong(2) == 1L)
  }
}
