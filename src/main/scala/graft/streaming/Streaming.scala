package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import scala.jdk.CollectionConverters._

/** Structured Streaming surface — the reference's incremental semantics
  * (SURVEY.md §2.10) re-expressed stream-natively.
  *
  * Reference mapping:
  *  - hourly APScheduler run (scheduler/job.py) → `Trigger.AvailableNow` per
  *    scheduled submit, or `Trigger.ProcessingTime` for a resident stream
  *  - `last_id = max(_id)` resume probe (pipeline/run.py:20-22) → the
  *    checkpointed source offset (exactly-once without the self-probe)
  *  - keep-last dedup + upsert (transform.py:206-220, serve/load.py) →
  *    per-micro-batch dedup inside `foreachBatch` + idempotent MERGE sink
  *  - read-time resample (helpers.py:31-46) → watermarked tumbling windows
  *    maintained incrementally
  *
  * Scale notes: watermarks bound all state; the windowed-agg state is
  * O(windows × groups), dedup state O(keys inside watermark horizon).
  * `foreachBatch` gives the sink the same batch DataFrame the batch engine
  * uses — one code path for both (the micro-batch IS a DataFrame).
  */
object Streaming {

  /** A4 as a stream: tumbling mean per window, incrementally maintained.
    * Late rows beyond `watermark` are dropped (the batch pipeline's
    * keep-last dedup handles them on re-ingest instead).
    */
  def tumblingMeans(
      events: DataFrame,
      tsCol: String,
      interval: String,
      watermark: String,
      valueCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), interval))
      .agg(
        count(lit(1)).as("n"),
        valueCols.map(c => avg(col(c)).as(s"avg_$c")): _*)
      .select((col("window.start").as("bucket") +: col("n") +:
        valueCols.map(c => col(s"avg_$c"))): _*)

  /** Streaming keep-first dedup by key with bounded state: duplicates
    * arriving within the watermark horizon are dropped, state for older
    * keys is reclaimed.
    */
  def dedupStream(events: DataFrame, tsCol: String, watermark: String, keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keys)

  /** Stream-stream INTERVAL join — the attribution shape (impression ⋈
    * click on the same key where the click lands within `horizonSeconds`
    * AFTER the impression). Both sides carry watermarks and the join
    * condition is a bounded event-time range, which is exactly what lets
    * Structured Streaming reclaim buffered state: an unmatched left row
    * is droppable once the right watermark passes its horizon end, so
    * state is O(rows in horizon), never the full history.
    *
    * Inner by default; `leftOuter = true` additionally emits
    * never-matched left rows (right columns NULL) after the horizon
    * closes — how a feed reports definitively-unattributed impressions.
    */
  def intervalJoinStream(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      horizonSeconds: Long,
      watermark: String = "10 minutes",
      leftOuter: Boolean = false): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    val cond = col(s"l.$key") === col(s"r.$key") &&
      col(s"r.$rightTs") >= col(s"l.$leftTs") &&
      col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"interval $horizonSeconds seconds")
    l.join(r, cond, if (leftOuter) "leftOuter" else "inner")
  }

  // ---- Gap sessionization with explicit state (flatMapGroupsWithState) ----

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  case class SessionState(start: Long, lastTs: Long, n: Int)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int)

  /** Custom-state sessionization: emits a session row when a gap >
    * `gapSeconds` closes it (plus on state timeout). The streaming
    * counterpart of [[graft.operators.Analytics.sessionize]] — state is one
    * (start, lastTs, n) triple per live user, bounded by the event-time
    * timeout.
    */
  def sessionizeStream(
      events: Dataset[SessionEvent],
      gapSeconds: Long,
      watermark: String = "1 hour"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[SessionState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed: close and emit the open session
            val out = state.getOption.map(s =>
              SessionOut(user, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.lastTs), s.n))
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapSeconds * 1000 =>
                  cur = Some(s.copy(lastTs = t, n = s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(user, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.lastTs), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the open session once event time passes last + gap
              state.setTimeoutTimestamp(s.lastTs + gapSeconds * 1000)
            }
            closed.reverseIterator
          }
      }
  }

  // ---- Last-touch attribution with explicit per-user state ----

  case class AttrEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
      event_type: String, channel: String, cents: Long)
  case class AttrState(lastClickCh: String, lastClickTs: Long, lastClickId: Long)
  case class AttrOut(user_id: Long, event_id: Long, cents: Long, channel: String)

  /** Streaming last-touch attribution — the stateful twin of q229's batch
    * window (`last(click_ch, ignoreNulls) OVER user-ordered rows`): one
    * (last click channel) cell per live user, written by clicks, read by
    * purchases, so a purchase attributes at arrival without ever joining
    * the click history. Rows are applied in (ts, event_id) order inside
    * each micro-batch, AND a click only overwrites the state when it is
    * event-time NEWER than the stored one — so a late click straggling
    * into a later micro-batch with an older timestamp cannot regress the
    * state, and batch boundaries don't change which click a FUTURE
    * purchase attributes to (spec-pinned against the batch formulation
    * across a split feed, including an out-of-order split). The inherent
    * streaming limit remains: a purchase already emitted is not
    * retroactively re-attributed when an older click arrives afterwards —
    * within-watermark reordering is the guard's job; past-watermark
    * history rewrites belong to the batch twin (q229).
    * State is one tiny tuple per live user, bounded by the event-time
    * timeout: a user idle past the horizon is dropped and their next
    * purchase attributes to 'none' — the documented staleness bound of a
    * TTL'd serving cache.
    */
  def attributionStream(
      events: Dataset[AttrEvent],
      watermark: String = "1 hour",
      idleTimeoutMs: Long = 30L * 24 * 3600 * 1000): Dataset[AttrOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrState, AttrOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[AttrState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = scala.collection.mutable.ListBuffer.empty[AttrOut]
            var st = state.getOption
            sorted.foreach { e =>
              if (e.event_type == "click") {
                val newer = st.forall(s => Ordering[(Long, Long)].gt(
                  (e.ts.getTime, e.event_id), (s.lastClickTs, s.lastClickId)))
                if (newer) st = Some(AttrState(e.channel, e.ts.getTime, e.event_id))
              } else if (e.event_type == "purchase")
                out += AttrOut(user, e.event_id, e.cents,
                  st.map(_.lastClickCh).getOrElse("none"))
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastClickTs + idleTimeoutMs)
            }
            out.iterator
          }
      }
  }

  /** Streaming curation scoring: incoming documents scored against
    * PRECOMPUTED corpus models via a stream-static broadcast join — the
    * production shape for filtering an ingest stream, where global
    * signals (vocabulary, thresholds) come from the last batch release
    * and scoring itself is stateless (append mode, no watermark, no
    * state store).
    *
    * The static side collapses to one broadcast row carrying the vocab
    * array; per-doc flags are codegen'd HOFs over the token array
    * (length, dup-token fraction, OOV rate) — nothing global is computed
    * on the stream. Mirrors [[graft.operators.QualitySignals]]'s k1–k3
    * definitions.
    */
  def curationScoreStream(
      docs: DataFrame,
      vocabStatic: DataFrame,
      vocabCol: String = "tok",
      minTokens: Int = 24,
      maxDupFrac: Double = 0.65,
      maxOovRate: Double = 0.40): DataFrame = {
    val v = vocabStatic.agg(collect_list(col(vocabCol)).as("__vocab"))
      .withColumn("__k", lit(1))
    val toks = graft.functions.Text.tokens(col("text"))
    docs.withColumn("__k", lit(1))
      .join(broadcast(v), "__k") //                 stream-static broadcast join
      .withColumn("toks", toks)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("dup_frac",
        (col("n_tokens") - size(array_distinct(col("toks")))).cast("double") /
          col("n_tokens"))
      .withColumn("oov_rate",
        (col("n_tokens") - size(expr("filter(toks, t -> array_contains(__vocab, t))")))
          .cast("double") / col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") >= minTokens).as("k_len"),
        (col("dup_frac") <= maxDupFrac).as("k_rep"),
        (col("oov_rate") <= maxOovRate).as("k_oov"))
  }

  /** §3.1 as a stream: micro-batch → keep-last dedup → idempotent MERGE →
    * metrics commit, all inside `foreachBatch` (same operators as the batch
    * pipeline). Exactly-once END TO END: the data sink converges because
    * the MERGE is per-key idempotent, and the metrics table commits by
    * dynamic overwrite of the batch's own `batch_id` partition — a
    * replayed batch REPLACES its metrics row instead of appending a
    * duplicate beside it (the [[ingestDedupStream]] commit discipline;
    * a bare append here would double-count rows_upserted on every crash
    * retry).
    */
  def incrementalMergeSink(
      events: DataFrame,
      keyCol: String,
      orderCol: String,
      sinkPath: String,
      metricsPath: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      sinkBuckets: Int = 0): StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val deduped = graft.operators.Dedup.keepFirstBy(
          batch, Seq(keyCol), Seq(col(orderCol).desc, col(keyCol).desc))
        // sinkBuckets > 0: partition-pruned MERGE — each micro-batch
        // rewrites only the hash-bucket partitions its keys touch, so a
        // long-running stream never pays a full-sink rewrite per batch.
        if (sinkBuckets > 0)
          graft.sources.Merge.upsertPartitioned(
            spark, deduped, sinkPath, Seq(keyCol), numBuckets = sinkBuckets)
        else
          graft.sources.Merge.upsertToPath(spark, deduped, sinkPath, Seq(keyCol))
        val n = deduped.count()
        Seq((batchId, n, new java.sql.Timestamp(System.currentTimeMillis())))
          .toDF("batch_id", "rows_upserted", "committed_at")
          .write.partitionBy("batch_id")
          .mode(org.apache.spark.sql.SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic") // replace ONLY this batch's row
          .parquet(metricsPath)
      }
      .start()

  /** The MV refresh as a stream: every micro-batch is aggregated to the
    * state shape (batch-sized work) and folded into the persisted state
    * table with [[graft.operators.Mv.mergeState]] — O(batch + buckets)
    * per trigger, never a history rescan. The batch path (q242) and this
    * stream share the same merge operator, so backfill and live ingest
    * produce bit-identical state.
    *
    * Exactly-once under replay — the part that is NOT free here: additive
    * state is not idempotent (a replayed batch would double-count), so
    * each commit writes a `_graft_committed_<batchId>` marker INTO the new
    * state directory and publishes marker+data together with one atomic
    * rename (parquet readers skip `_`-prefixed files). A replayed batch id
    * ≤ the committed marker is a no-op; a crash before the swap leaves the
    * old state+marker intact and the retry redoes the whole merge. The
    * swap itself is two renames (state→bak, tmp→state), so a crash
    * BETWEEN them leaves no state dir — each batch therefore first
    * restores a dangling `.__graft_bak` before reading the committed
    * marker, closing the window where a replay would rebuild state from
    * the delta alone and silently drop history.
    * Single-writer, like every sink in this module.
    */
  def mvMaintainStream(
      events: DataFrame,
      stateOf: DataFrame => DataFrame,
      keys: Seq[String],
      adds: Seq[String],
      mins: Seq[String] = Nil,
      maxs: Seq[String] = Nil,
      statePath: String = null,
      checkpointDir: String = null,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(statePath != null && checkpointDir != null)
    import java.nio.file.{Files, Paths, StandardCopyOption}
    events.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val target = Paths.get(statePath)
        // crash recovery: a dangling bak with no state dir means the
        // previous run died between the two swap renames — the bak IS
        // the last committed state (its marker rode along), restore it
        val bak0 = Paths.get(statePath.stripSuffix("/") + ".__graft_bak")
        if (!Files.exists(target) && Files.exists(bak0))
          Files.move(bak0, target, StandardCopyOption.ATOMIC_MOVE)
        val committed: Long =
          if (!Files.exists(target)) -1L
          else {
            val st = Files.list(target)
            try st.iterator().asScala
              .map(_.getFileName.toString)
              .collect { case s if s.startsWith("_graft_committed_") =>
                s.stripPrefix("_graft_committed_").toLong }
              .foldLeft(-1L)(math.max)
            finally st.close()
          }
        if (batchId > committed) {
          val deltaAgg = stateOf(batch)
          val merged =
            if (Files.exists(target))
              graft.operators.Mv.mergeState(
                spark.read.parquet(statePath), deltaAgg, keys, adds, mins, maxs)
            else deltaAgg
          val tmp = statePath.stripSuffix("/") + ".__graft_tmp"
          merged.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp)
          Files.createFile(Paths.get(tmp, s"_graft_committed_$batchId"))
          val bak = Paths.get(statePath.stripSuffix("/") + ".__graft_bak")
          deleteRecursive(bak)
          if (Files.exists(target))
            Files.move(target, bak, StandardCopyOption.ATOMIC_MOVE)
          Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
          deleteRecursive(bak)
        }
      }
      .start()
  }

  /** Streaming MERGE into a [[graft.sources.Tx]] table — micro-batches
    * become atomic table-format commits. Exactly-once under replay rides
    * the manifest itself: each commit stamps its micro-batch id as
    * manifest metadata, and a batch id ≤ the newest stamped id is a
    * no-op. [[graft.sources.Tx.latestMeta]] scans back past interleaved
    * non-stream commits, so a concurrent backfill writer can't reset the
    * stream's replay guard. Unlike [[mvMaintainStream]]'s whole-directory
    * swap, commits here are bucket-scoped and snapshot-isolated — a
    * reader mid-refresh sees the previous version, never a partial sink.
    */
  def txMergeSink(
      events: DataFrame,
      keys: Seq[String],
      tablePath: String,
      checkpointDir: String,
      nBuckets: Int = 16,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val committed = graft.sources.Tx
          .latestMeta(tablePath, "stream_batch_id")
          .map(_.toLong).getOrElse(-1L)
        if (batchId > committed) {
          // abortIf closes the TOCTOU the pre-check leaves open: a
          // zombie attempt of the same micro-batch racing this one
          // loses the CAS, re-checks the winner's stamp, and no-ops
          graft.sources.Tx.commitMerge(
            batch.sparkSession, tablePath, batch, keys, nBuckets,
            meta = Map("stream_batch_id" -> batchId.toString),
            abortIf = snap => snap.meta.get("stream_batch_id")
              .exists(_.toLong >= batchId))
        }
        ()
      }
      .start()

  /** [[mvMaintainStream]] with the state in a [[graft.sources.Tx]]
    * table — the variant that needs NEITHER the whole-directory swap nor
    * the full-state rewrite it implies: each micro-batch aggregates to
    * the state shape and [[graft.operators.Mv.refreshTx]] folds it in,
    * touching only the batch's buckets (pruned IO) and committing with
    * one atomic manifest CAS stamped with the micro-batch id (replay =
    * no-op; a crash mid-write leaves the previous version intact and
    * unreferenced debris for vacuum). Per-trigger cost is
    * O(batch + touched buckets); `mvMaintainStream`'s is O(all state).
    */
  def mvMaintainTxStream(
      events: DataFrame,
      stateOf: DataFrame => DataFrame,
      keys: Seq[String],
      adds: Seq[String],
      mins: Seq[String] = Nil,
      maxs: Seq[String] = Nil,
      tablePath: String = null,
      checkpointDir: String = null,
      nBuckets: Int = 16,
      trigger: Trigger = Trigger.AvailableNow(),
      bucketKeys: Seq[String] = Nil): StreamingQuery = {
    require(tablePath != null && checkpointDir != null)
    events.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Mv.refreshTx(
          batch.sparkSession, tablePath, stateOf(batch), keys,
          adds, mins, maxs, nBuckets, batchId = Some(batchId),
          bucketKeys = bucketKeys)
        ()
      }
      .start()
  }

  /** CONTINUOUS change-feed follower — the streaming twin of
    * [[graft.operators.Mv.followChanges]], closing the loop
    * [[mvMaintainTxStream]] closes for raw batches: a downstream
    * Tx-resident MV tails an upstream Tx table's versions and folds each
    * new span's change feed, exactly-once, without ever receiving the
    * raw batches. The source is [[graft.sources.tx.TxTicks]] — a
    * micro-batch stream whose OFFSETS are upstream versions (the keyset
    * source's offset discipline applied to manifests), so a trigger
    * fires only when the upstream actually committed and probing costs
    * one manifest-directory listing.
    *
    * Exactly-once WITHOUT trusting the checkpoint: followChanges keeps
    * its consumption cursor in the SAME manifest commit as the state it
    * produced, so the tick's span is merely a wake-up — a wiped
    * checkpoint replays old spans and the cursor no-ops them; a span the
    * checkpoint thinks is new but the cursor already folded (this
    * process raced another follower) aborts inside the CAS loop. The
    * cursor, not the checkpoint, is the truth (spec-pinned). Per-trigger
    * cost: O(changed upstream buckets) + O(touched state buckets).
    */
  def followChangesStream(
      spark: SparkSession,
      upstreamPath: String,
      statePath: String,
      keys: Seq[String],
      adds: Seq[(String, org.apache.spark.sql.Column)],
      support: String,
      project: DataFrame => DataFrame,
      checkpointDir: String,
      nBuckets: Int = 16,
      bucketKeys: Seq[String] = Nil,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.format("graft.sources.tx.TxTicks")
      .option("path", upstreamPath).load()
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the batch row names a span, but followChanges derives its own
        // from the durable cursor — the tick is only the wake-up
        batch.sparkSession.sparkContext.setJobDescription(
          s"followChangesStream $upstreamPath -> $statePath")
        graft.operators.Mv.followChanges(
          batch.sparkSession, upstreamPath, statePath, keys, adds,
          support, project, nBuckets, bucketKeys)
        ()
      }
      .start()

  private def deleteRecursive(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val st = java.nio.file.Files.walk(p)
      try st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.delete(f))
      finally st.close()
    }

  /** Streaming ingest dedup: each micro-batch of documents is checked for
    * near-dups against a STATIC corpus band index via the batch operator
    * ([[graft.operators.TextDedup.minhashLshPairsIncremental]]) inside
    * `foreachBatch` — one code path for batch backfill and live ingest,
    * the q84 semantics as a stream. The batch side broadcasts (a trigger's
    * worth of docs is small by construction); the corpus side never
    * shuffles, and at 100 TB it is written bucketed by band value so each
    * trigger's probe prunes to colliding buckets. Hits land in
    * `hitsPath/batch_id=<id>/`.
    *
    * Delivery: EXACTLY-ONCE — each micro-batch commits by dynamic
    * partition overwrite of ITS OWN `batch_id` partition. Structured
    * Streaming replays a failed batch under the same batch id, so a crash
    * after a partial write is healed by the retry REPLACING the partition
    * wholesale (leftover files from the dead attempt included) instead of
    * appending beside them; checkpointed offsets stop committed batches
    * from reprocessing at all. Same per-batch commit discipline as
    * [[incrementalMergeSink]]; untouched batch partitions are never
    * opened. Spec-pinned: StreamingSpec plants a partial write from a
    * simulated dead attempt and re-runs the batch — no duplicate
    * (batch_id, pair) rows survive.
    */
  def ingestDedupStream(
      docs: DataFrame, //                     streaming (doc_id, text)
      corpusHashed: DataFrame, //             static (doc_id, shash)
      hitsPath: String,
      checkpointDir: String,
      k: Int = 8,
      bandRows: Int = 2,
      threshold: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val hashed = batch
          .withColumn("toks", graft.functions.Text.tokens(col("text")))
          .withColumn("shash", graft.operators.TextDedup.shingleHashes("toks", 3))
          .select("doc_id", "shash")
        graft.operators.TextDedup
          .minhashLshPairsIncremental(
            corpusHashed, hashed, "doc_id", "shash", k, bandRows, threshold)
          .withColumn("batch_id", lit(batchId))
          .write.partitionBy("batch_id")
          .mode(org.apache.spark.sql.SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic") // replace ONLY this batch's partition
          .parquet(hitsPath)
        ()
      }
      .start()
}
