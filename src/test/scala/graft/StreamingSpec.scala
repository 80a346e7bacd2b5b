package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streaming
import graft.streaming.Streaming.SessionEvent

/** Structured Streaming semantics via MemoryStream micro-batches. */
class StreamingSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("tumblingMeans maintains windowed means incrementally") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val df = mem.toDF().toDF("ts", "value")
    val q = Streaming.tumblingMeans(df, "ts", "30 minutes", "10 minutes", Seq("value"))
      .writeStream.format("memory").queryName("tumbling").outputMode("complete").start()
    try {
      mem.addData(
        (ts("2024-01-01 10:05:00"), 10.0),
        (ts("2024-01-01 10:25:00"), 20.0),
        (ts("2024-01-01 10:35:00"), 30.0))
      q.processAllAvailable()
      val out = spark.table("tumbling").orderBy("bucket")
        .select("bucket", "n", "avg_value")
        .as[(java.sql.Timestamp, Long, Double)].collect().toSeq
      assert(out == Seq(
        (ts("2024-01-01 10:00:00"), 2L, 15.0),
        (ts("2024-01-01 10:30:00"), 1L, 30.0)))
    } finally q.stop()
  }

  test("dedupStream drops duplicate keys within the watermark horizon") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val df = mem.toDF().toDF("id", "ts")
    val q = Streaming.dedupStream(df, "ts", "1 hour", Seq("id"))
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:05:00")),
        (2L, ts("2024-01-01 10:06:00")))
      q.processAllAvailable()
      mem.addData((1L, ts("2024-01-01 10:10:00"))) // still a dup
      q.processAllAvailable()
      val out = spark.table("dedup").select("id").as[Long].collect().sorted.toSeq
      assert(out == Seq(1L, 2L))
    } finally q.stop()
  }

  test("streamed corpus growth keeps BM25 == batch over the union (index maintenance)") {
    // micro-batched doc arrivals accumulate in a sink via foreachBatch;
    // after each batch, bm25Incremental(corpus-so-far, batch) must equal
    // bm25 over the full union — the maintained-index contract under
    // streaming ingest.
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_bm25").toString
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = docs.writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val corpusPath = s"$dir/corpus"
        val corpusExists = new java.io.File(corpusPath).exists()
        if (corpusExists) {
          val corpus = spark.read.parquet(corpusPath)
          val inc = graft.operators.Search
            .bm25Incremental(corpus, batch, Seq("spark", "stream"))
            .orderBy("doc_id").collect().toSeq
          val full = graft.operators.Search
            .bm25(corpus.unionByName(batch), Seq("spark", "stream"))
            .orderBy("doc_id").collect().toSeq
          assert(inc == full, s"batch $id: incremental != batch-over-union")
        }
        batch.write.mode("append").parquet(corpusPath)
        ()
      }
      .start()
    try {
      mem.addData((1L, "spark joins the stream"), (2L, "a table of streams"))
      q.processAllAvailable()
      mem.addData((3L, "spark spark stream"), (4L, "nothing relevant here"))
      q.processAllAvailable()
      mem.addData((5L, "stream stream stream spark"))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$dir/corpus").count() == 5)
    } finally q.stop()
  }

  test("intervalJoinStream attributes clicks to impressions within the horizon only") {
    implicit val sc = spark.sqlContext
    val imps = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = Streaming.intervalJoinStream(
      imps.toDF().toDF("user_id", "imp_ts"),
      clicks.toDF().toDF("user_id", "click_ts"),
      key = "user_id", leftTs = "imp_ts", rightTs = "click_ts",
      horizonSeconds = 600L, watermark = "10 minutes")
      .select(col("l.user_id").as("user_id"), col("imp_ts"), col("click_ts"))
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      imps.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00")),
        (3L, ts("2024-01-01 10:00:00")))
      clicks.addData(
        (1L, ts("2024-01-01 10:05:00")),  // in horizon -> attributed
        (2L, ts("2024-01-01 10:20:00")),  // past the 10-min horizon -> dropped
        (3L, ts("2024-01-01 09:55:00")))  // click BEFORE impression -> dropped
      q.processAllAvailable()
      val out = spark.table("attrib").select("user_id").as[Long].collect().toSeq
      assert(out == Seq(1L))
    } finally q.stop()
  }

  test("sessionizeStream closes a session on gap and emits it") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val q = Streaming.sessionizeStream(mem.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      mem.addData(
        SessionEvent(1L, ts("2024-01-01 10:00:00"), 1L),
        SessionEvent(1L, ts("2024-01-01 10:10:00"), 2L))
      q.processAllAvailable()
      // 80-minute gap closes the first session in-batch
      mem.addData(SessionEvent(1L, ts("2024-01-01 11:30:00"), 3L))
      q.processAllAvailable()
      val out = spark.table("sessions")
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Int)].collect().toSeq
      assert(out == Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2)))
    } finally q.stop()
  }

  test("attributionStream matches the batch last-touch window across batch splits") {
    import graft.streaming.Streaming.{AttrEvent, AttrOut}
    implicit val sc = spark.sqlContext
    val events = Seq(
      AttrEvent(1L, ts("2024-01-01 10:00:00"), 1L, "click", "ch1", 0L),
      AttrEvent(1L, ts("2024-01-01 10:05:00"), 2L, "purchase", "", 500L),
      AttrEvent(1L, ts("2024-01-01 10:10:00"), 3L, "click", "ch2", 0L),
      AttrEvent(2L, ts("2024-01-01 10:12:00"), 4L, "purchase", "", 300L), // no click ever
      AttrEvent(1L, ts("2024-01-01 10:20:00"), 5L, "purchase", "", 700L),
      AttrEvent(1L, ts("2024-01-01 10:25:00"), 6L, "purchase", "", 900L))
    val mem = MemoryStream[AttrEvent]
    val q = Streaming.attributionStream(mem.toDS())
      .writeStream.format("memory").queryName("attr_lt").outputMode("append").start()
    try {
      // the click that decides purchases 5/6 arrives in an EARLIER batch
      mem.addData(events.take(3): _*)
      q.processAllAvailable()
      mem.addData(events.drop(3): _*)
      q.processAllAvailable()
      val got = spark.table("attr_lt").as[AttrOut].collect()
        .map(a => (a.event_id, a.cents, a.channel)).sortBy(_._1).toSeq
      assert(got == Seq((2L, 500L, "ch1"), (4L, 300L, "none"),
        (5L, 700L, "ch2"), (6L, 900L, "ch2")))
      // batch twin: the q229 window formulation over the same rows
      val df = events.toDF()
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val batch = df.withColumn("last_ch",
          last(when(col("event_type") === "click", col("channel")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"),
          coalesce(col("last_ch"), lit("none")).as("channel"))
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(got.map(g => (g._1, g._3)) == batch)
    } finally q.stop()
  }

  test("attributionStream: a late out-of-order click cannot regress the state") {
    import graft.streaming.Streaming.{AttrEvent, AttrOut}
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[AttrEvent]
    val q = Streaming.attributionStream(mem.toDS())
      .writeStream.format("memory").queryName("attr_ooo").outputMode("append").start()
    try {
      // batch 1: the NEWER click arrives first
      mem.addData(AttrEvent(1L, ts("2024-01-01 10:10:00"), 3L, "click", "ch2", 0L))
      q.processAllAvailable()
      // batch 2: a STALE click (older event time) straggles in afterwards,
      // then a purchase — last-touch by event time is still ch2
      mem.addData(
        AttrEvent(1L, ts("2024-01-01 10:00:00"), 1L, "click", "ch1", 0L),
        AttrEvent(1L, ts("2024-01-01 10:20:00"), 5L, "purchase", "", 700L))
      q.processAllAvailable()
      val got = spark.table("attr_ooo").as[AttrOut].collect()
        .map(a => (a.event_id, a.channel)).toSeq
      assert(got == Seq((5L, "ch2")),
        "the stale ch1 click must not overwrite the newer ch2 state")
    } finally q.stop()
  }

  test("curationScoreStream: stateless stream-static scoring against a static vocab") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val vocab = Seq("the", "a", "row", "table").toDF("tok")
    val out = Streaming.curationScoreStream(
      mem.toDF().toDF("doc_id", "text"), vocab,
      minTokens = 4, maxDupFrac = 0.5, maxOovRate = 0.5)
    val sink = out.writeStream.format("memory").queryName("curation_scores")
      .outputMode("append").start()
    mem.addData(
      (1L, "the a row table the a"), //    6 toks, dup 2/6, all in vocab
      (2L, "x x x x x x"), //              dup 5/6 -> fails k_rep; oov 1.0 -> fails k_oov
      (3L, "too short")) //                2 toks -> fails k_len
    sink.processAllAvailable()
    sink.stop()
    val rows = spark.table("curation_scores")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))
    assert(rows.toSeq === Seq(
      (1L, 6L, true, true, true),
      (2L, 6L, true, false, false),
      (3L, 2L, false, true, false)))
  }

  test("count-min sketch accumulates across micro-batches (mergeable, bounded state)") {
    // the streaming use the q153 sketch's mergeability enables: each
    // micro-batch contributes its own sketch, merged cell-wise into a
    // bounded driver-side table (≤ depth·width cells — the sketch IS the
    // state), and the accumulated sketch equals the batch sketch over the
    // whole stream.
    implicit val sc = spark.sqlContext
    import graft.operators.Sketches
    val (d, w) = (4, 16)
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long].withDefaultValue(0L)
    val mem = MemoryStream[String]
    val sink = mem.toDF().toDF("k").writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        Sketches.countMin(batch, "k", d, w).collect().foreach { r =>
          cells((r.getAs[Int]("j"), r.getAs[Long]("bucket"))) += r.getAs[Long]("c")
        }
    }.start()
    val batches = Seq(
      Seq("x", "y", "x", "z", "q1", "q2"),
      Seq("y", "y", "w", "q3"),
      Seq("x", "w", "q4", "q5", "q5"))
    batches.foreach { b => mem.addData(b: _*); sink.processAllAvailable() }
    sink.stop()
    val whole = Sketches.countMin(batches.flatten.toDF("k"), "k", d, w)
      .collect()
      .map(r => (r.getAs[Int]("j"), r.getAs[Long]("bucket")) -> r.getAs[Long]("c"))
      .toMap
    assert(cells.toMap == whole, s"accumulated $cells != batch $whole")
    assert(cells.size <= d * w)
  }

  test("ingestDedupStream: micro-batched ingest equals the batch operator") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    def text(i: Long) = (i until i + 12).map(j => s"w$j").mkString(" ")
    val corpus = (0L until 10L).map(i => (i, text(i))).toDF("doc_id", "text")
    def hashed(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("toks", graft.functions.Text.tokens(col("text")))
      .withColumn("shash", graft.operators.TextDedup.shingleHashes("toks", 3))
      .select("doc_id", "shash")
    val corpusHashed = hashed(corpus)
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    // batch 0: an exact copy of corpus doc 2 + a novel doc
    mem.addData((100L, text(2)), (101L, "totally different content entirely novel here"))
    Streaming.ingestDedupStream(stream, corpusHashed,
      s"$dir/hits", s"$dir/ckpt").awaitTermination()
    // batch 1 (checkpoint continues): an exact copy of corpus doc 5
    mem.addData((102L, text(5)))
    Streaming.ingestDedupStream(stream, corpusHashed,
      s"$dir/hits", s"$dir/ckpt").awaitTermination()
    val hits = spark.read.parquet(s"$dir/hits")
    val got = hits.select("corpus_id", "incoming_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    // one code path: the stream's accumulated hits equal the batch operator
    // run over the union of all micro-batches
    val allIncoming = Seq((100L, text(2)),
      (101L, "totally different content entirely novel here"), (102L, text(5)))
      .toDF("doc_id", "text")
    val want = graft.operators.TextDedup.minhashLshPairsIncremental(
        corpusHashed, hashed(allIncoming), "doc_id", "shash",
        k = 8, bandRows = 2, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(got === want)
    // the exact copies certainly collide (J = 1.0 in every band)
    assert(got.contains((2L, 100L, 1.0)) && got.contains((5L, 102L, 1.0)))
    assert(!got.exists(_._2 == 101L), "novel doc must not hit")
    // batch ids advanced across restarts of the checkpointed stream
    val ids = hits.select("batch_id").distinct().as[Long].collect().toSet
    assert(ids.size === 2)
  }

  test("ingestDedupStream: batch replay after a mid-append crash leaves no duplicates") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_crash").toString
    def text(i: Long) = (i until i + 12).map(j => s"w$j").mkString(" ")
    val corpus = (0L until 10L).map(i => (i, text(i))).toDF("doc_id", "text")
    def hashed(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("toks", graft.functions.Text.tokens(col("text")))
      .withColumn("shash", graft.operators.TextDedup.shingleHashes("toks", 3))
      .select("doc_id", "shash")
    // Simulate an attempt of batch 0 that died mid-append: its partition
    // directory already holds a file with one row the retry will also emit
    // and one bogus row only the dead attempt produced. At-least-once
    // append would keep both beside the retry's output; the exactly-once
    // dynamic-overwrite commit must REPLACE the partition wholesale.
    Seq((2L, 100L, 1.0), (9L, 999L, 0.9))
      .toDF("corpus_id", "incoming_id", "jaccard")
      .write.parquet(s"$dir/hits/batch_id=0")
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    mem.addData((100L, text(2)), (101L, "totally different content entirely novel here"))
    Streaming.ingestDedupStream(stream, hashed(corpus),
      s"$dir/hits", s"$dir/ckpt").awaitTermination()
    val rows = spark.read.parquet(s"$dir/hits")
      .select("batch_id", "corpus_id", "incoming_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.distinct.size === rows.size, s"duplicate hit rows after replay: $rows")
    assert(rows.count(r => r._2 == 2L && r._3 == 100L) === 1,
      "replayed hit must appear exactly once")
    assert(!rows.exists(_._3 == 999L),
      "the dead attempt's partial output must be replaced, not merged")
  }

  test("incrementalMergeSink: dedup + idempotent merge + metrics per micro-batch") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = mem.toDF().toDF("_id", "DATETIME", "value")
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 11:00:00"), 2.0), // same key: keep-last wins
      (2L, ts("2024-01-01 10:00:00"), 3.0))
    val q1 = Streaming.incrementalMergeSink(df, "_id", "DATETIME",
      s"$dir/sink", s"$dir/metrics", s"$dir/ckpt")
    q1.awaitTermination()
    // second incremental run: update key 2, add key 3
    mem.addData((2L, ts("2024-01-01 12:00:00"), 30.0), (3L, ts("2024-01-01 12:00:00"), 9.0))
    val q2 = Streaming.incrementalMergeSink(df, "_id", "DATETIME",
      s"$dir/sink", s"$dir/metrics", s"$dir/ckpt")
    q2.awaitTermination()
    val out = spark.read.parquet(s"$dir/sink").orderBy("_id")
      .select("_id", "value").as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2.0), (2L, 30.0), (3L, 9.0)))
    val metrics = spark.read.parquet(s"$dir/metrics")
    assert(metrics.count() == 2)
    assert(metrics.agg(sum("rows_upserted")).head().getLong(0) == 4L)
  }

  test("incrementalMergeSink: metrics commit is exactly-once under batch replay") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_metrics").toString
    // a dead attempt of batch 0 left a bogus metrics row behind
    Seq((999L, ts("2024-01-01 00:00:00")))
      .toDF("rows_upserted", "committed_at")
      .write.parquet(s"$dir/metrics/batch_id=0")
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = mem.toDF().toDF("_id", "DATETIME", "value")
    mem.addData((1L, ts("2024-01-01 10:00:00"), 1.0), (2L, ts("2024-01-01 10:00:00"), 2.0))
    Streaming.incrementalMergeSink(df, "_id", "DATETIME",
      s"$dir/sink", s"$dir/metrics", s"$dir/ckpt").awaitTermination()
    val metrics = spark.read.parquet(s"$dir/metrics")
    assert(metrics.count() === 1, "replay must replace the partial metrics row")
    assert(metrics.select("rows_upserted").as[Long].head() === 2L,
      "the dead attempt's bogus count must not survive")
  }

  test("mvMaintainStream: streamed state == batch state, and replay is a no-op") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_mv").toString
    val mem = MemoryStream[(Long, Long, Long)] // (id, bucket, v)
    val df = mem.toDF().toDF("id", "bucket", "v")
    def stateOf(b: org.apache.spark.sql.DataFrame) =
      b.groupBy("bucket").agg(
        count(lit(1)).as("n"), sum("v").as("s"),
        min("v").as("mn"), max("v").as("mx"))
    def run() = Streaming.mvMaintainStream(df, stateOf, Seq("bucket"),
      adds = Seq("n", "s"), mins = Seq("mn"), maxs = Seq("mx"),
      statePath = s"$dir/state", checkpointDir = s"$dir/ckpt")
      .awaitTermination()
    // trigger 1: buckets 1+2; trigger 2: bucket 2 grows, bucket 3 appears
    mem.addData((1L, 1L, 5L), (2L, 1L, -3L), (3L, 2L, 7L))
    run()
    mem.addData((4L, 2L, 100L), (5L, 3L, -50L))
    run()
    val all = Seq((1L, 1L, 5L), (2L, 1L, -3L), (3L, 2L, 7L),
      (4L, 2L, 100L), (5L, 3L, -50L))
    val batchState = stateOf(all.toDF("id", "bucket", "v"))
      .orderBy("bucket").collect().toSeq
    def readState() = spark.read.parquet(s"$dir/state")
      .orderBy("bucket").collect().toSeq
    assert(readState() == batchState,
      "incrementally merged stream state must equal batch aggregation")
    // replay protection: re-running batch 1's merge must be a no-op (the
    // additive state would otherwise double-count). Simulate a replay by
    // calling the foreachBatch body again via a fresh query over a marker
    // that says batch 1 is already committed: the committed marker in the
    // state dir gates it.
    val markers = new java.io.File(s"$dir/state").listFiles()
      .map(_.getName).filter(_.startsWith("_graft_committed_"))
    assert(markers.nonEmpty, "state must carry its committed-batch marker")
    // wipe the checkpoint so the SAME data replays under the same batch ids
    val ck = java.nio.file.Paths.get(s"$dir/ckpt")
    val st = java.nio.file.Files.walk(ck)
    try st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(f => java.nio.file.Files.delete(f))
    finally st.close()
    run() // replays all data as batch 0 — id 0 <= committed marker, no-op?
    // batch 0 replays BELOW the committed id, so state must be unchanged
    assert(readState() == batchState,
      "a replayed batch id <= the committed marker must not re-merge")
  }

  test("mvMaintainStream on composite (bucket, user) grain derives exact distinct") {
    // the q245 state shape as a stream: hit counts merge additively at
    // (bucket, user) grain across micro-batches; distinct-per-bucket is
    // derived from the final state and must equal the batch answer even
    // when a user's hits span triggers
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_mvd").toString
    val mem = MemoryStream[(Long, Long)] // (bucket, user)
    val df = mem.toDF().toDF("bucket", "user")
    def stateOf(b: org.apache.spark.sql.DataFrame) =
      b.groupBy("bucket", "user").agg(count(lit(1)).as("n_hits"))
    def run() = Streaming.mvMaintainStream(df, stateOf, Seq("bucket", "user"),
      adds = Seq("n_hits"),
      statePath = s"$dir/state", checkpointDir = s"$dir/ckpt")
      .awaitTermination()
    mem.addData((1L, 7L), (1L, 7L), (1L, 8L))
    run()
    mem.addData((1L, 7L), (2L, 7L)) // user 7 recurs in bucket 1, new bucket 2
    run()
    val view = spark.read.parquet(s"$dir/state")
      .groupBy("bucket")
      .agg(count(lit(1)).as("du"), sum("n_hits").as("n"))
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(view == Seq((1L, 2L, 4L), (2L, 1L, 1L)),
      "streamed composite-grain state must derive the exact distinct view")
  }

  test("txMergeSink: micro-batches become atomic table commits, replay-safe") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_tx").toString
    val table = s"$dir/table"
    val mem = MemoryStream[(Long, Long)] // (id, v)
    val df = mem.toDF().toDF("id", "v")
    def run() = Streaming.txMergeSink(df, Seq("id"), table,
      s"$dir/ckpt", nBuckets = 4).awaitTermination()
    mem.addData((1L, 10L), (2L, 20L))
    run()
    mem.addData((2L, 99L), (3L, 30L)) // update 2, insert 3
    run()
    def tableRows() = graft.sources.Tx.read(spark, table)
      .select("id", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(tableRows() == Map(1L -> 10L, 2L -> 99L, 3L -> 30L))
    val vBefore = graft.sources.Tx.versions(table).max
    // an interleaved NON-stream commit must not reset the replay guard
    graft.sources.Tx.commitMerge(spark, table,
      Seq((7L, 70L)).toDF("id", "v"), Seq("id"), nBuckets = 4)
    // wipe the checkpoint: the SAME data replays under the same batch ids
    val ck = java.nio.file.Paths.get(s"$dir/ckpt")
    val st = java.nio.file.Files.walk(ck)
    try st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(f => java.nio.file.Files.delete(f))
    finally st.close()
    run()
    assert(graft.sources.Tx.versions(table).max == vBefore + 1,
      "replayed batch ids <= the stamped marker must commit nothing")
    assert(tableRows() == Map(1L -> 10L, 2L -> 99L, 3L -> 30L, 7L -> 70L))
  }

  test("streamed ingest + followChanges downstream: the full CDF loop") {
    // upstream: micro-batches land as stamped Tx commits (txMergeSink);
    // downstream: an additive MV follows the CHANGE FEED with its cursor
    // committed atomically with the state (Mv.followChanges). A GDPR
    // delete interleaves as a non-stream commit and must flow through
    // the feed as retractions; a final follow with nothing new must
    // commit nothing.
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_cdf_e2e").toString
    val up = s"$dir/up"
    val st = s"$dir/state"
    val mem = MemoryStream[(Long, Long)] // (id, v)
    val df = mem.toDF().toDF("id", "v")
    def ingest() = Streaming.txMergeSink(df, Seq("id"), up,
      s"$dir/ckpt", nBuckets = 4).awaitTermination()
    def follow() = graft.operators.Mv.followChanges(spark, up, st, Seq("g"),
      adds = Seq("n_rows" -> lit(1L), "sum_v" -> col("v")),
      support = "n_rows",
      project = d => d.select((col("id") % 2).cast("string").as("g"),
        col("v"), col("_change")),
      nBuckets = 4)
    def state() = graft.sources.Tx.read(spark, st)
      .select("g", "n_rows", "sum_v").orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    mem.addData((1L, 10L), (2L, 20L), (3L, 30L))
    ingest(); follow() // bootstrap: g0={2}, g1={1,3}
    assert(state() == Seq(("0", 1L, 20L), ("1", 2L, 40L)))
    mem.addData((2L, 25L), (4L, 5L)) // update 2 (20->25), insert 4
    ingest(); follow()
    assert(state() == Seq(("0", 2L, 30L), ("1", 2L, 40L)))
    // right-to-be-forgotten: a NON-stream delete interleaves upstream
    graft.sources.Tx.commitDelete(spark, up, Seq(3L).toDF("id"),
      Seq("id"), nBuckets = 4)
    follow()
    val expect = Seq(("0", 2L, 30L), ("1", 1L, 10L))
    assert(state() == expect,
      "the delete must flow through the feed as a retraction")
    // caught up: a further follow must publish NO downstream version
    val v = graft.sources.Tx.latest(st).get.version
    follow()
    assert(graft.sources.Tx.latest(st).get.version == v && state() == expect)
    // end to end the state equals a scratch aggregation of what is
    // actually upstream — the property every link preserved
    val scratch = graft.sources.Tx.read(spark, up)
      .select((col("id") % 2).cast("string").as("g"), col("v"))
      .groupBy("g").agg(count(lit(1)).as("n_rows"), sum("v").as("sum_v"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(state() == scratch)
  }

  test("mvMaintainTxStream: pruned per-batch folds == batch state, replay-safe " +
      "without the whole-dir swap") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_mvtx").toString
    val table = s"$dir/state"
    val mem = MemoryStream[(Long, Long, Long)] // (id, bucket, v)
    val df = mem.toDF().toDF("id", "bucket", "v")
    def stateOf(b: org.apache.spark.sql.DataFrame) =
      b.groupBy("bucket").agg(
        count(lit(1)).as("n"), sum("v").as("s"),
        min("v").as("mn"), max("v").as("mx"))
    def run() = Streaming.mvMaintainTxStream(df, stateOf, Seq("bucket"),
      adds = Seq("n", "s"), mins = Seq("mn"), maxs = Seq("mx"),
      tablePath = table, checkpointDir = s"$dir/ckpt", nBuckets = 4)
      .awaitTermination()
    mem.addData((1L, 1L, 5L), (2L, 1L, -3L), (3L, 2L, 7L))
    run()
    mem.addData((4L, 2L, 100L), (5L, 3L, -50L))
    run()
    val all = Seq((1L, 1L, 5L), (2L, 1L, -3L), (3L, 2L, 7L),
      (4L, 2L, 100L), (5L, 3L, -50L))
    val batchState = stateOf(all.toDF("id", "bucket", "v"))
      .orderBy("bucket").collect().toSeq
    def readState() = graft.sources.Tx.read(spark, table)
      .select("bucket", "n", "s", "mn", "mx").orderBy("bucket").collect().toSeq
    assert(readState() == batchState,
      "per-trigger Tx folds must equal the batch aggregation")
    val vBefore = graft.sources.Tx.versions(table).max
    // wipe the checkpoint: the SAME data replays under the same batch ids
    val ck = java.nio.file.Paths.get(s"$dir/ckpt")
    val st = java.nio.file.Files.walk(ck)
    try st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(f => java.nio.file.Files.delete(f))
    finally st.close()
    run()
    assert(graft.sources.Tx.versions(table).max == vBefore,
      "replayed batch ids must commit no new version")
    assert(readState() == batchState,
      "replayed additive folds must not double-count")
  }

  test("mvMaintainStream: a crash between the two swap renames recovers") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_mvc").toString
    val mem = MemoryStream[(Long, Long, Long)]
    val df = mem.toDF().toDF("id", "bucket", "v")
    def stateOf(b: org.apache.spark.sql.DataFrame) =
      b.groupBy("bucket").agg(count(lit(1)).as("n"), sum("v").as("s"))
    def run() = Streaming.mvMaintainStream(df, stateOf, Seq("bucket"),
      adds = Seq("n", "s"),
      statePath = s"$dir/state", checkpointDir = s"$dir/ckpt")
      .awaitTermination()
    mem.addData((1L, 1L, 5L), (2L, 2L, 7L))
    run()
    val committed = spark.read.parquet(s"$dir/state")
      .orderBy("bucket").collect().toSeq
    // simulate dying AFTER `state -> bak` but BEFORE `tmp -> state`: the
    // state dir is gone, only the bak (carrying its committed marker)
    // remains. Without recovery the next batch would see no state, treat
    // itself as the first, and rebuild from its own delta alone.
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$dir/state"),
      java.nio.file.Paths.get(s"$dir/state.__graft_bak"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    mem.addData((3L, 2L, 100L))
    run()
    val after = spark.read.parquet(s"$dir/state")
      .orderBy("bucket").collect().toSeq
    val scratch = stateOf(Seq((1L, 1L, 5L), (2L, 2L, 7L), (3L, 2L, 100L))
      .toDF("id", "bucket", "v")).orderBy("bucket").collect().toSeq
    assert(after == scratch,
      s"bak recovery must restore pre-crash state before merging; " +
        s"pre-crash was $committed")
  }

  test("incrementalMergeSink with sinkBuckets writes the partition-pruned sink") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_part").toString
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = mem.toDF().toDF("_id", "DATETIME", "value")
    mem.addData((1L to 20L).map(i => (i, ts("2024-01-01 10:00:00"), i * 1.0)): _*)
    Streaming.incrementalMergeSink(df, "_id", "DATETIME",
      s"$dir/sink", s"$dir/metrics", s"$dir/ckpt", sinkBuckets = 4).awaitTermination()
    // incremental micro-batch updates one key, adds one
    mem.addData((7L, ts("2024-01-01 12:00:00"), 700.0), (21L, ts("2024-01-01 12:00:00"), 21.0))
    Streaming.incrementalMergeSink(df, "_id", "DATETIME",
      s"$dir/sink", s"$dir/metrics", s"$dir/ckpt", sinkBuckets = 4).awaitTermination()
    val sink = spark.read.parquet(s"$dir/sink")
    assert(sink.columns.contains("p_bucket"), "expected the partitioned layout")
    val out = sink.orderBy("_id").select("_id", "value").as[(Long, Double)].collect().toSeq
    val expected = (1L to 21L).map(i => (i, if (i == 7L) 700.0 else i * 1.0))
    assert(out == expected)
  }

  test("followChangesStream: version-offset ticks, cursor beats checkpoint") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fcs2").toString
    val up = s"$dir/up"
    val stStream = s"$dir/st_stream"
    val stBatch = s"$dir/st_batch"
    val adds = Seq("n_rows" -> lit(1L), "sum_v" -> col("v"))
    val project = (df: org.apache.spark.sql.DataFrame) => df.select(
      (col("id") % 2).cast("string").as("g"), col("v"), col("_change"))
    def runStream() = Streaming.followChangesStream(spark, up, stStream,
      Seq("g"), adds, support = "n_rows", project = project,
      checkpointDir = s"$dir/ckpt", nBuckets = 4).awaitTermination()
    def batchFollow() = graft.operators.Mv.followChanges(spark, up, stBatch,
      Seq("g"), adds, support = "n_rows", project = project, nBuckets = 4)
    def state(path: String) = graft.sources.Tx.read(spark, path)
      .select("g", "n_rows", "sum_v").orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // v1: bootstrap through the stream
    graft.sources.Tx.commitMerge(spark, up,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v"),
      Seq("id"), nBuckets = 4)
    runStream(); batchFollow()
    assert(state(stStream) == state(stBatch))
    // a SPLIT commit sequence: merge then delete, one stream run each
    graft.sources.Tx.commitMerge(spark, up,
      Seq((2L, 25L), (4L, 5L)).toDF("id", "v"), Seq("id"), nBuckets = 4)
    runStream()
    graft.sources.Tx.commitDelete(spark, up, Seq(3L).toDF("id"),
      Seq("id"), nBuckets = 4)
    runStream()
    batchFollow() // batch twin catches up v1 -> v3 in one fold
    assert(state(stStream) == state(stBatch),
      "split stream follows must equal the batch follows' final state")
    assert(state(stStream) == Seq(("0", 2L, 30L), ("1", 1L, 10L)))
    // no upstream movement: an idle trigger commits nothing
    val vIdle = graft.sources.Tx.latest(stStream).get.version
    runStream()
    assert(graft.sources.Tx.latest(stStream).get.version == vIdle)
    // WIPE the checkpoint: the tick replays the whole (0, latest] span,
    // but the CURSOR in the state manifest is the truth — nothing folds
    val ck = java.nio.file.Paths.get(s"$dir/ckpt")
    val walked = java.nio.file.Files.walk(ck)
    try walked.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(f => java.nio.file.Files.delete(f))
    finally walked.close()
    runStream()
    assert(graft.sources.Tx.latest(stStream).get.version == vIdle &&
      state(stStream) == Seq(("0", 2L, 30L), ("1", 1L, 10L)),
      "a wiped checkpoint must not re-fold anything — the cursor is " +
        "the truth, not the checkpoint")
    // and the stream keeps working after the wipe
    graft.sources.Tx.commitMerge(spark, up, Seq((5L, 100L)).toDF("id", "v"),
      Seq("id"), nBuckets = 4)
    runStream(); batchFollow()
    assert(state(stStream) == state(stBatch))
  }

  test("graft-tx change stream: rows == changesStamped at any batching") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cds").toString
    val up = s"$dir/up"
    import graft.sources.Tx
    Tx.commitMerge(spark, up, (1L to 20L).map(i => (i, i * 10)).toDF("id", "v"),
      Seq("id"), nBuckets = 4) //                          v1
    Tx.commitMerge(spark, up, Seq((2L, 222L), (30L, 300L), (3L, 30L))
      .toDF("id", "v"), Seq("id"), nBuckets = 4) //        v2 (3 unchanged)
    Tx.commitDelete(spark, up, Seq(5L, 30L).toDF("id"),
      Seq("id"), nBuckets = 4) //                          v3
    Tx.commitMerge(spark, up, Seq((40L, 400L)).toDF("id", "v"),
      Seq("id"), nBuckets = 4) //                          v4
    def drain(ckpt: String, emitPre: Boolean = false,
        extra: Map[String, String] = Map.empty) = {
      val buf = collection.mutable.ArrayBuffer[(Long, Long, String, Long)]()
      var reader = spark.readStream.format("graft-tx")
        .option("readChangeFeed", true).option("emitPre", emitPre)
      extra.foreach { case (k, v) => reader = reader.option(k, v) }
      val q = reader.load(up).writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          buf.synchronized {
            buf ++= df.collect().map(r => (r.getLong(0),
              if (r.isNullAt(1)) -1L else r.getLong(1),
              r.getString(2), r.getLong(3)))
          }
          ()
        }.start()
      q.awaitTermination()
      buf.toSeq
    }
    def stamped(fromV: Long, toV: Long, emitPre: Boolean = false) =
      Tx.changesStamped(spark, up, fromV, toV, emitPre).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
          r.getString(2), r.getLong(3))).toSet
    // one trigger covering the whole span == changesStamped(1, 4)
    assert(drain(s"$dir/ck1").toSet == stamped(1L, 4L))
    // one version per trigger: SAME rows, three triggers
    assert(drain(s"$dir/ck2",
      extra = Map("maxVersionsPerTrigger" -> "1")).toSet == stamped(1L, 4L))
    // retraction pairs ride too
    assert(drain(s"$dir/ck3", emitPre = true).toSet ==
      stamped(1L, 4L, emitPre = true))
    // startingVersion is INCLUSIVE (Delta's contract): 3 emits the
    // changes OF commits 3 and 4
    assert(drain(s"$dir/ck4",
      extra = Map("startingVersion" -> "3")).toSet == stamped(2L, 4L))
    // startingVersion=1 serves the FIRST commit's rows too — inserts
    // diffed against the synthetic empty base, stamped v1
    assert(drain(s"$dir/ck4b",
      extra = Map("startingVersion" -> "1")).toSet ==
      (1L to 20L).map(i => (i, i * 10, "insert", 1L)).toSet ++
        stamped(1L, 4L))
    // checkpoint continuation: a restart on the same checkpoint emits
    // ONLY the new commits — no replays into the buffer
    assert(drain(s"$dir/ck5").toSet == stamped(1L, 4L))
    Tx.commitMerge(spark, up, Seq((50L, 500L)).toDF("id", "v"),
      Seq("id"), nBuckets = 4) //                          v5
    assert(drain(s"$dir/ck5").toSet == stamped(4L, 5L),
      "a checkpointed restart must resume at the stored version offset")
    // a dead startingVersion is a named error at stream start
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      drain(s"$dir/ck6", extra = Map("startingVersion" -> "99")))
    assert(e.getMessage.contains("startingVersion") ||
      Option(e.getCause).exists(_.getMessage.contains("startingVersion")))
    // startingTimestamp: Delta's inclusive round-UP — a probe just
    // before v3's stamp resolves to v3 and emits commits 3..5's changes
    def stampOf(v: Long) =
      Tx.snapshot(up, v).meta(Tx.CommitTsKey).toLong
    assert(drain(s"$dir/ck7", extra =
      Map("startingTimestamp" -> (stampOf(3L) - 1L).toString)).toSet ==
      stamped(2L, 5L),
      "startingTimestamp must round up to the next commit, inclusively")
    // exactly at a stamp includes that commit too
    assert(drain(s"$dir/ck7b", extra =
      Map("startingTimestamp" -> stampOf(4L).toString)).toSet ==
      stamped(3L, 5L))
    // after the latest commit: named error, never a silent empty feed
    val e2 = intercept[Exception](drain(s"$dir/ck8", extra =
      Map("startingTimestamp" -> (stampOf(5L) + 60000L).toString)))
    assert((e2.getMessage +
      Option(e2.getCause).map(_.getMessage).getOrElse(""))
      .contains("at or after"))
    // both pins at once is a caller bug
    val e3 = intercept[Exception](drain(s"$dir/ck9", extra = Map(
      "startingVersion" -> "3",
      "startingTimestamp" -> stampOf(3L).toString)))
    assert((e3.getMessage +
      Option(e3.getCause).map(_.getMessage).getOrElse(""))
      .contains("exclusive"))
  }

  test("writeStream into graft-tx: epoch-stamped atomic merges, replay-safe") {
    // the txMergeSink discipline behind the STANDARD API: no
    // foreachBatch — every micro-batch is one stamped manifest commit
    val dir = java.nio.file.Files.createTempDirectory("graft_sws").toString
    val table = s"$dir/t"
    import graft.sources.Tx
    Tx.createTable(table,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType))),
      keys = Seq("id"), nBuckets = 4)
    val in = MemoryStream[(Long, Long)](spark)
    def run() = {
      val q = in.toDF().toDF("id", "v").writeStream
        .format("graft-tx")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(table)
      q.awaitTermination()
    }
    in.addData((1L, 10L), (2L, 20L))
    run()
    def state() = Tx.read(spark, table).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(state() == Seq((1L, 10L), (2L, 20L)))
    in.addData((2L, 99L), (3L, 30L)) // update 2, insert 3
    run()
    assert(state() == Seq((1L, 10L), (2L, 99L), (3L, 30L)),
      "micro-batches must land as the format's MERGE")
    // every stream commit is epoch-stamped, keyed by the QUERY lineage
    val snap = Tx.latest(table).get
    val stamp = snap.meta.keys.find(_.startsWith("stream_epoch_")).get
    assert(snap.meta(stamp) == "1")
    // an idle re-run on the SAME checkpoint commits nothing
    val vIdle = Tx.latest(table).get.version
    run()
    assert(Tx.latest(table).get.version == vIdle)
    // the exactly-once core, unit-level: the SAME epoch delivered twice
    // (crash between data commit and checkpoint commit) must no-op the
    // second time — the stamp is re-checked inside the CAS loop
    val sw = new graft.sources.tx.TxStreamingWrite(table,
      Tx.schemaOf(table).get,
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty(),
      stamp.stripPrefix("stream_epoch_"))
    var taskId = 77L
    def stagedMsg(rows: Seq[(Long, Long)], epoch: Long) = {
      taskId += 1 // duplicate deliveries come from distinct attempts
      val w = graft.sources.tx.TxStreamingWriterFactory(
        s"$dir/manual", Tx.schemaOf(table).get.json)
        .createWriter(0, taskId, epoch)
      rows.foreach { case (i, v) =>
        w.write(org.apache.spark.sql.catalyst.InternalRow(i, v)) }
      w.commit()
    }
    sw.commit(2L, Array(stagedMsg(Seq((9L, 90L)), 2L)))
    assert(state().toMap.get(9L).contains(90L), "epoch 2 lands once")
    val vDup = Tx.latest(table).get.version
    sw.commit(2L, Array(stagedMsg(Seq((9L, 91L)), 2L))) // duplicate epoch
    assert(Tx.latest(table).get.version == vDup &&
      state().toMap.get(9L).contains(90L),
      "a replayed epoch must commit NOTHING — the stamp is the truth")
    // WIPE the checkpoint: a NEW lineage re-merges what it replays
    // (content-idempotent — a MERGE of identical rows changes nothing
    // observable) and, crucially, its new data still LANDS — a
    // lineage-blind global stamp would silently drop it forever
    val contentBefore = state()
    val ck = java.nio.file.Paths.get(s"$dir/ckpt")
    val walked = java.nio.file.Files.walk(ck)
    try walked.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(f => java.nio.file.Files.delete(f))
    finally walked.close()
    in.addData((4L, 40L))
    run() // fresh lineage: replays everything + the new row
    val after = state()
    assert(after.toMap.get(4L).contains(40L),
      "new data after a checkpoint wipe must not be lost")
    assert(after.filterNot(_._1 == 4L) == contentBefore,
      "the re-merged replay must be content-invisible")
  }

  test("TxVersionOffset: malformed checkpoint offsets fail loudly") {
    import graft.sources.tx.TxVersionOffset
    assert(TxVersionOffset.parse("""{"version":7}""", "t") == 7L)
    assert(TxVersionOffset.parse(""" { "version" : 12 } """, "t") == 12L)
    val e = intercept[IllegalArgumentException](
      TxVersionOffset.parse("""{"verison":7}""", "t"))
    assert(e.getMessage.contains("corrupted"))
    intercept[IllegalArgumentException](TxVersionOffset.parse("", "t"))
    intercept[IllegalArgumentException](TxVersionOffset.parse("7abc", "t"))
  }

  test("graft-tx table stream: snapshot then appended inserts, change guard") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ts").toString
    val up = s"$dir/up"
    import graft.sources.Tx
    Tx.commitMerge(spark, up, (1L to 10L).map(i => (i, i * 10)).toDF("id", "v"),
      Seq("id"), nBuckets = 4) //                               v1
    def drain(ckpt: String, extra: Map[String, String] = Map.empty) = {
      val buf = collection.mutable.ArrayBuffer[(Long, Long)]()
      var reader = spark.readStream.format("graft-tx")
      extra.foreach { case (k, v) => reader = reader.option(k, v) }
      val q = reader.load(up).writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$dir/$ckpt")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          buf.synchronized {
            buf ++= df.collect().map(r => (r.getLong(0), r.getLong(1)))
          }
          ()
        }.start()
      q.awaitTermination()
      buf.toSeq
    }
    // first run: the FULL snapshot as the first batch
    assert(drain("ck1").toSet == (1L to 10L).map(i => (i, i * 10)).toSet)
    // append-only commits stream incrementally on the same checkpoint
    Tx.commitMerge(spark, up, Seq((11L, 110L), (12L, 120L)).toDF("id", "v"),
      Seq("id"), nBuckets = 4) //                               v2
    assert(drain("ck1").toSet == Set((11L, 110L), (12L, 120L)),
      "a checkpointed restart must emit ONLY the new inserts")
    // an unchanged re-landed row is compared out: nothing to emit
    Tx.commitMerge(spark, up, Seq((11L, 110L)).toDF("id", "v"),
      Seq("id"), nBuckets = 4) //                               v3
    assert(drain("ck1").isEmpty)
    // fresh checkpoint, version-per-trigger batching: same content
    assert(drain("ck2", Map("maxVersionsPerTrigger" -> "1")).toSet ==
      (1L to 12L).map(i => (i, i * 10)).toSet)
    // an UPDATE in the span is a NAMED error by default...
    Tx.commitMerge(spark, up, Seq((1L, 999L)).toDF("id", "v"),
      Seq("id"), nBuckets = 4) //                               v4 (update)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      drain("ck1"))
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("append-only"))
    // ...ignoreChanges re-emits the post row (re-delivery contract)
    assert(drain("ck1", Map("ignoreChanges" -> "true")).toSet ==
      Set((1L, 999L)))
    // deletes drop silently under ignoreChanges
    Tx.commitDelete(spark, up, Seq(2L).toDF("id"), Seq("id"), nBuckets = 4)
    assert(drain("ck1", Map("ignoreChanges" -> "true")).isEmpty)
    // startingVersion skips the snapshot and is INCLUSIVE (Delta's
    // contract): 2 emits commits 2..5's inserts/re-deliveries only
    assert(drain("ck3", Map("startingVersion" -> "2",
      "ignoreChanges" -> "true")).toSet ==
      Set((11L, 110L), (12L, 120L), (1L, 999L)))
    // startingVersion=1 includes the first commit's own rows, diffed
    // against the synthetic empty base (id 2's later delete only drops
    // the v5 delete event — its v1 insert was already delivered)
    assert(drain("ck3b", Map("startingVersion" -> "1",
      "ignoreChanges" -> "true")).toSet ==
      ((1L to 10L).map(i => (i, i * 10)).toSet ++
        Set((11L, 110L), (12L, 120L), (1L, 999L))))
    // startingTimestamp resolves through the SAME inclusive contract:
    // a probe just before v2's stamp == startingVersion=2 (Delta's
    // round-up rule); after-latest is a named error
    def stampOf(v: Long) = Tx.snapshot(up, v).meta(Tx.CommitTsKey).toLong
    assert(drain("ck3c", Map(
      "startingTimestamp" -> (stampOf(2L) - 1L).toString,
      "ignoreChanges" -> "true")).toSet ==
      Set((11L, 110L), (12L, 120L), (1L, 999L)))
    val e2 = intercept[Exception](drain("ck3d", Map(
      "startingTimestamp" -> (stampOf(5L) + 60000L).toString)))
    assert((e2.getMessage +
      Option(e2.getCause).map(_.getMessage).getOrElse(""))
      .contains("at or after"))
    // a fresh full drain = the current content (snapshot at latest)
    val current = Tx.read(spark, up).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(drain("ck4").toSet == current)
    // offsets parse strictly, like every Tx stream offset
    import graft.sources.tx.TxTableOffset
    assert(TxTableOffset.parse("""{"version":3,"snapshot":true}""", "t") ==
      TxTableOffset(3L, snapshotDone = true))
    intercept[IllegalArgumentException](
      TxTableOffset.parse("""{"version":3}""", "t"))
  }
}
