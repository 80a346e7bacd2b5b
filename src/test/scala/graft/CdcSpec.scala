package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextDedup

/** Pins the property content-defined chunking exists for: boundaries are
  * decided by LOCAL content, so an insertion re-aligns the chunking after
  * one boundary and interior fingerprints survive — where fixed-window
  * chunking (q92/q99) loses every window.
  */
class CdcSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val toks = (0 until 200).map(i => s"w$i")
  private val original = toks.mkString(" ")
  private val shifted = "inserted prefix here " + original

  test("chunks partition the token stream and are deterministic") {
    val df = Seq((1L, original)).toDF("doc_id", "text")
    val chunks = TextDedup.cdcChunks(df, "doc_id", "text")
      .orderBy("chunk_idx").collect()
    assert(chunks.map(_.getLong(2)).sum == 200L, "chunks must partition the tokens")
    assert(chunks.length > 3, "divisor 16 over 200 tokens should cut several chunks")
    val again = TextDedup.cdcChunks(df, "doc_id", "text")
      .orderBy("chunk_idx").collect()
    assert(chunks.map(_.getString(3)).toSeq == again.map(_.getString(3)).toSeq)
  }

  test("a prefix insertion re-aligns CDC chunks; fixed windows lose everything") {
    val df = Seq((1L, original), (2L, shifted)).toDF("doc_id", "text")
    val chunks = TextDedup.cdcChunks(df, "doc_id", "text")
      .select("doc_id", "chunk_md5").as[(Long, String)].collect()
    val a = chunks.filter(_._1 == 1L).map(_._2).toSet
    val b = chunks.filter(_._1 == 2L).map(_._2).toSet
    val sharedFrac = (a intersect b).size.toDouble / a.size
    assert(sharedFrac >= 0.5,
      s"CDC must keep most interior chunks across a 3-token shift, got $sharedFrac")
    // the fixed-window contrast: 64-token windows of the two docs share
    // NOTHING because every window content shifted by three tokens
    def windows(ts: Seq[String]) = ts.grouped(64).map(_.mkString(" ")).toSet
    val fixedShared = windows(toks) intersect windows("inserted" +: "prefix" +: "here" +: toks)
    assert(fixedShared.isEmpty, "fixed windows should all shift — that is the point")
  }
}
