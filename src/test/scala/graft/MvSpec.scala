package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Mv, Quality}

/** Incremental MV state merge and algebraic rollup: merged/rolled-up
  * state must be bit-identical to aggregating from scratch, including
  * buckets present on only one side of the merge.
  */
class MvSpec extends AnyFunSuite with SparkFixture {

  test("followChanges: crash before CAS, blind retry, replay, duplicate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val up = java.nio.file.Files.createTempDirectory("graft_fcu").toString + "/t"
    val st = java.nio.file.Files.createTempDirectory("graft_fcs").toString + "/t"
    def follow(beforeCas: () => Unit = () => ()) =
      graft.operators.Mv.followChanges(spark, up, st, Seq("g"),
        adds = Seq("n_rows" -> lit(1L), "sum_v" -> col("v")),
        support = "n_rows",
        project = df => df.select(
          (col("id") % 2).cast("string").as("g"), col("v"), col("_change")),
        nBuckets = 4, beforeCas = beforeCas)
    def state() = graft.sources.Tx.read(spark, st)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    graft.sources.Tx.commitMerge(spark, up,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v"),
      Seq("id"), nBuckets = 4)
    follow() // bootstrap: g=0 -> (1, 20), g=1 -> (2, 40)
    assert(state() == Seq(("0", 1L, 20L), ("1", 2L, 40L)))
    // upstream moves: update 2 (20->25), delete 3, insert 4
    graft.sources.Tx.commitMerge(spark, up, Seq((2L, 25L), (4L, 5L)).toDF("id", "v"),
      Seq("id"), nBuckets = 4)
    graft.sources.Tx.commitDelete(spark, up, Seq(3L).toDF("id"),
      Seq("id"), nBuckets = 4)
    // CRASH between state write and cursor/state publish: nothing moved
    val vBefore = graft.sources.Tx.latest(st).get.version
    intercept[RuntimeException](
      follow(beforeCas = () => throw new RuntimeException("crash")))
    assert(graft.sources.Tx.latest(st).get.version == vBefore,
      "a crash before the CAS must leave the state at its old version")
    assert(state() == Seq(("0", 1L, 20L), ("1", 2L, 40L)))
    // blind retry lands the fold exactly once
    follow()
    val expect = Seq(("0", 2L, 30L), ("1", 1L, 10L))
    assert(state() == expect, "g0: +insert(4,5)+update 20->25; g1: -delete(3,30)")
    // replay: cursor says caught up — no version committed
    val vAfter = graft.sources.Tx.latest(st).get.version
    follow()
    assert(graft.sources.Tx.latest(st).get.version == vAfter)
    assert(state() == expect)
    // CONCURRENT duplicate: the loser must abort on the re-checked
    // cursor, not fold the same feed twice
    graft.sources.Tx.commitMerge(spark, up, Seq((5L, 100L)).toDF("id", "v"),
      Seq("id"), nBuckets = 4)
    var raced = false
    follow(beforeCas = () => {
      if (!raced) { raced = true; follow() } // the duplicate wins the CAS
    })
    assert(state() == Seq(("0", 2L, 30L), ("1", 2L, 110L)),
      "the insert must fold exactly once under the concurrent duplicate")
    // bootstrap onto a non-fresh state table is refused
    val st2 = java.nio.file.Files.createTempDirectory("graft_fcs2").toString + "/t"
    graft.sources.Tx.commitMerge(spark, st2,
      Seq(("0", 9L, 9L)).toDF("g", "n_rows", "sum_v"), Seq("g"), nBuckets = 4)
    val e = intercept[IllegalArgumentException](
      graft.operators.Mv.followChanges(spark, up, st2, Seq("g"),
        adds = Seq("n_rows" -> lit(1L), "sum_v" -> col("v")),
        support = "n_rows",
        project = df => df.select(
          (col("id") % 2).cast("string").as("g"), col("v"), col("_change")),
        nBuckets = 4))
    assert(e.getMessage.contains("FRESH"))
  }

  test("followChanges: a slower follow with an OLDER target cannot double-fold") {
    // the race the same-target duplicate case does not cover: B observed
    // upstream at v2 (A is already folding toward v3) and lands the 1→2
    // span mid-A. A's feed (1→3) CONTAINS that span — folding it on top
    // of B's commit would apply 1→2 twice. A must abort because the
    // cursor moved from the base its feed was derived from.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val up = java.nio.file.Files.createTempDirectory("graft_fso_u").toString + "/t"
    val st = java.nio.file.Files.createTempDirectory("graft_fso_s").toString + "/t"
    def follow(beforeCas: () => Unit = () => ()) =
      graft.operators.Mv.followChanges(spark, up, st, Seq("g"),
        adds = Seq("n_rows" -> lit(1L), "sum_v" -> col("v")),
        support = "n_rows",
        project = df => df.select(
          (col("id") % 2).cast("string").as("g"), col("v"), col("_change")),
        nBuckets = 4, beforeCas = beforeCas)
    def state() = graft.sources.Tx.read(spark, st)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    graft.sources.Tx.commitMerge(spark, up,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), Seq("id"), nBuckets = 4)
    follow() // bootstrap at cursor=1
    graft.sources.Tx.commitMerge(spark, up, Seq((3L, 30L)).toDF("id", "v"),
      Seq("id"), nBuckets = 4) // v2: insert 3 (g1)
    graft.sources.Tx.commitMerge(spark, up, Seq((4L, 40L)).toDF("id", "v"),
      Seq("id"), nBuckets = 4) // v3: insert 4 (g0)
    var raced = false
    follow(beforeCas = () => if (!raced) {
      raced = true
      // B, emulated at the Tx level: folds EXACTLY the 1→2 span and
      // stamps cursor=2 — a follower that resolved upstream before v3
      val feed12 = graft.sources.Tx.changes(spark, up, 1L, 2L, emitPre = true)
        .select((col("id") % 2).cast("string").as("g"), col("v"), col("_change"))
      val sign = when(col("_change").isin("insert", "update_post"), lit(1L))
        .otherwise(lit(-1L))
      val delta = feed12.groupBy("g").agg(
        sum(sign * lit(1L)).as("n_rows"), sum(sign * col("v")).as("sum_v"))
      graft.sources.Tx.commitFold(spark, st, delta, Seq("g"), 4,
        meta = Map("cdf_cursor" -> "2"))(
        (ex, d) => graft.operators.Mv.mergeState(ex, d, Seq("g", "__b"),
          adds = Seq("n_rows", "sum_v")).filter(col("n_rows") > 0L))
      ()
    })
    assert(state() == Seq(("0", 1L, 20L), ("1", 2L, 40L)),
      "A must abort: B's 1→2 span landed once, A's overlapping 1→3 feed " +
        "did not fold on top of it")
    follow() // catches up with ONLY the remaining 2→3 span
    assert(state() == Seq(("0", 2L, 60L), ("1", 2L, 40L)))
    // and it equals scratch over what is actually upstream
    val scratch = graft.sources.Tx.read(spark, up)
      .select((col("id") % 2).cast("string").as("g"), col("v"))
      .groupBy("g").agg(count(lit(1)).as("n_rows"), sum("v").as("sum_v"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(state() == scratch)
  }

  test("followChanges: random upstream merge/delete sequences stay scratch-equal") {
    // property form of the CDF loop: after ANY interleaving of upstream
    // merges (inserts+updates) and deletes, a follow brings the
    // downstream state to exactly the scratch aggregation of the current
    // upstream content — cumulative retraction errors would accumulate
    // and surface here even if each single step looked right
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val up = java.nio.file.Files.createTempDirectory("graft_frn_u").toString + "/t"
    val st = java.nio.file.Files.createTempDirectory("graft_frn_s").toString + "/t"
    var seed = 0x7f4a7c159e3779b9L
    def nxt(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    def follow() = graft.operators.Mv.followChanges(spark, up, st, Seq("g"),
      adds = Seq("n_rows" -> lit(1L), "sum_v" -> col("v")),
      support = "n_rows",
      project = df => df.select(
        (col("id") % 3).cast("string").as("g"), col("v"), col("_change")),
      nBuckets = 4)
    def rows(d: org.apache.spark.sql.DataFrame) = d.orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    graft.sources.Tx.commitMerge(spark, up,
      Seq((1L, 100L), (2L, 200L)).toDF("id", "v"), Seq("id"), nBuckets = 4)
    follow() // bootstrap
    var model = Map(1L -> 100L, 2L -> 200L)
    for (step <- 1 to 8) {
      val ids = (0 until 4).map(_ => math.abs(nxt()) % 10 + 1).distinct
      if (step % 3 == 0 && model.nonEmpty) {
        graft.sources.Tx.commitDelete(spark, up, ids.toDF("id"),
          Seq("id"), nBuckets = 4)
        model = model -- ids
      } else {
        val batch = ids.map(i => (i, step * 1000L + i))
        graft.sources.Tx.commitMerge(spark, up, batch.toDF("id", "v"),
          Seq("id"), nBuckets = 4)
        model = model ++ batch
      }
      follow()
      val scratch = model.toSeq.map { case (i, v) => ((i % 3).toString, v) }
        .groupBy(_._1).toSeq
        .map { case (g, vs) => (g, vs.size.toLong, vs.map(_._2).sum) }
        .sortBy(_._1)
      assert(rows(graft.sources.Tx.read(spark, st)
        .select("g", "n_rows", "sum_v")) == scratch,
        s"state diverged from the scratch aggregate after step $step")
    }
  }

  test("applyChangeFeed: retraction math and zero-support removal") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // state over two groups; feed: an update pair moving g1's row value
    // 10→25, a delete emptying g2 entirely, an insert opening g3
    val state0 = Seq(("g1", 2L, 30L), ("g2", 1L, 7L))
      .toDF("g", "n_rows", "sum_v")
    val feed = Seq(
      ("g1", 10L, "update_pre"), ("g1", 25L, "update_post"),
      ("g2", 7L, "delete"),
      ("g3", 5L, "insert")).toDF("g", "v", "_change")
    val out = graft.operators.Mv.applyChangeFeed(state0, feed, Seq("g"),
      adds = Seq("n_rows" -> lit(1L), "sum_v" -> col("v")),
      support = "n_rows")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("g1", 2L, 45L), ("g3", 1L, 5L)),
      "update retracts old and adds new; the emptied group must LEAVE " +
        "the state (a scratch aggregation never saw its rows)")
    // a post-only feed (emitPre=false) must fail loudly, not double-count
    val postOnly = Seq(("g1", 25L, "update")).toDF("g", "v", "_change")
    val e = intercept[Exception](
      graft.operators.Mv.applyChangeFeed(state0, postOnly, Seq("g"),
        adds = Seq("n_rows" -> lit(1L), "sum_v" -> col("v")),
        support = "n_rows").collect())
    assert(e.getMessage.contains("emitPre") ||
      Option(e.getCause).exists(_.getMessage.contains("emitPre")))
  }
  import spark.implicits._

  private val rows = Seq(
    // (id, bucket, v) — bucket 1 base-only, bucket 4 delta-only (ids %10==0
    // are the delta), bucket 2/3 mixed, negative values exercise min/max
    (1L, 1L, 5L), (2L, 1L, -3L), (3L, 2L, 7L), (10L, 2L, 100L),
    (11L, 3L, 0L), (20L, 3L, -50L), (30L, 4L, 9L), (40L, 4L, 1L))

  private def state(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("bucket").agg(
      count(lit(1)).as("n"), sum("v").as("s"),
      min("v").as("mn"), max("v").as("mx"))

  test("mergeState(base, delta) == state from scratch") {
    val df = rows.toDF("id", "bucket", "v")
    val merged = Mv.mergeState(
      state(df.filter(col("id") % 10 =!= 0)),
      state(df.filter(col("id") % 10 === 0)),
      Seq("bucket"), adds = Seq("n", "s"), mins = Seq("mn"), maxs = Seq("mx"))
    val scratch = state(df)
    assert(merged.orderBy("bucket").collect().toSeq ==
      scratch.orderBy("bucket").collect().toSeq)
  }

  test("rollup of fine state == coarse state from scratch") {
    val df = rows.toDF("id", "bucket", "v")
    // coarse bucket = bucket div 2 (1,1,2,2 -> 0,0,1,1... fine->coarse 2:1)
    val rolled = Mv.rollup(state(df), (col("bucket") / 2).cast("long"), "cb",
      adds = Seq("n", "s"), mins = Seq("mn"), maxs = Seq("mx"))
    val scratch = df.withColumn("cb", (col("bucket") / 2).cast("long"))
      .groupBy("cb").agg(
        count(lit(1)).as("n"), sum("v").as("s"),
        min("v").as("mn"), max("v").as("mx"))
    assert(rolled.orderBy("cb").collect().toSeq ==
      scratch.orderBy("cb").collect().toSeq)
  }

  test("mergeState folds are order-independent and equal scratch") {
    // the property a long-running refresh loop relies on: ANY batch
    // split, folded in ANY order, lands on the scratch aggregation —
    // int64 adds commute/associate exactly, least/greatest are
    // idempotent-commutative
    val df = (1L to 60L).map(i =>
      (i, i % 7, ((i * 37) % 23) - 11)).toDF("id", "bucket", "v")
    val scratch = state(df).orderBy("bucket").collect().toSeq
    for (k <- Seq(2, 3, 5); rot <- 0 until k) {
      val parts = (0 until k).map(p => state(df.filter(col("id") % k === p)))
      val rotated = parts.drop(rot) ++ parts.take(rot)
      val folded = rotated.reduce((a, b) => Mv.mergeState(a, b,
        Seq("bucket"), adds = Seq("n", "s"), mins = Seq("mn"), maxs = Seq("mx")))
      assert(folded.orderBy("bucket").collect().toSeq == scratch,
        s"fold of $k parts rotated by $rot diverged from scratch")
    }
  }

  test("composite-key merge derives exact distinct (non-algebraic MV)") {
    // distinct users per bucket via (bucket, user) grain state: repeat
    // hits inside a bucket collapse, a user split across base/delta must
    // count ONCE, and a delta-only (bucket, user) cell must appear
    val hits = Seq(
      // (id, bucket, user) — ids %10==0 are the delta batch
      (1L, 1L, 7L), (2L, 1L, 7L), (10L, 1L, 7L), // same user both sides
      (3L, 1L, 8L), (20L, 2L, 7L), (30L, 2L, 9L) // bucket 2 delta-only
    ).toDF("id", "bucket", "user")
    def grain(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("bucket", "user").agg(count(lit(1)).as("n_hits"))
    val merged = Mv.mergeState(
      grain(hits.filter(col("id") % 10 =!= 0)),
      grain(hits.filter(col("id") % 10 === 0)),
      Seq("bucket", "user"), adds = Seq("n_hits"))
    val view = merged.groupBy("bucket")
      .agg(count(lit(1)).as("du"), sum("n_hits").as("n"))
      .orderBy("bucket").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(view.toSeq == Seq((1L, 2L, 4L), (2L, 2L, 2L)))
  }

  test("refreshPartitioned merges only touched partitions, byte-identically") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_mvp_spec").toString + "/state"
    // state grain (pd, b) with pd = day partition of bucket b (b div 10)
    def stateOf(rows: Seq[(Long, Long)]) = // (bucket, v)
      rows.toDF("b", "v").groupBy("b")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
        .withColumn("pd", col("b") / 10 cast "long")
    val hist = Seq((11L, 5L), (11L, 7L), (12L, 1L), (21L, 9L)) // days 1+2
    val batch = Seq((21L, 4L), (22L, 8L)) // touches ONLY day 2
    Mv.refreshPartitioned(spark, root, stateOf(hist),
      "pd", Seq("pd", "b"), adds = Seq("n", "s"))
    def files(pd: Long) =
      Paths.get(root, s"pd=$pd").toFile.listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getPath, f.length(), f.lastModified())).toSet
    val day1Before = files(1L)
    assert(day1Before.nonEmpty)
    Mv.refreshPartitioned(spark, root, stateOf(batch),
      "pd", Seq("pd", "b"), adds = Seq("n", "s"))
    assert(files(1L) == day1Before,
      "an untouched partition's files must not be rewritten by a refresh")
    val merged = spark.read.parquet(root)
      .select(col("b"), col("n"), col("s"), col("pd").cast("long"))
      .orderBy("b").collect().toSeq
    val scratch = stateOf(hist ++ batch)
      .select(col("b"), col("n"), col("s"), col("pd"))
      .orderBy("b").collect().toSeq
    assert(merged == scratch,
      "partition-pruned refresh must equal scratch aggregation")
  }

  test("backfillPartitioned replaces only the bad range, byte-identically elsewhere") {
    import java.nio.file.Paths
    val root = java.nio.file.Files
      .createTempDirectory("graft_mvb_spec").toString + "/state"
    def stateOf(rows: Seq[(Long, Long)]) =
      rows.toDF("b", "v").groupBy("b")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
        .withColumn("pd", col("b") / 10 cast "long")
    val truth = Seq((11L, 5L), (12L, 1L), (21L, 9L), (21L, 4L), (22L, 8L))
    // defective landing: day 2 lost two rows
    Mv.refreshPartitioned(spark, root,
      stateOf(truth.filterNot(r => r._1 >= 20L && r._2 % 2 == 0)),
      "pd", Seq("pd", "b"), adds = Seq("n", "s"))
    def day1Files() =
      Paths.get(root, "pd=1").toFile.listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getPath, f.length(), f.lastModified())).toSet
    val before = day1Files()
    // repair: scratch re-aggregation of day 2's raw rows replaces pd=2
    Mv.backfillPartitioned(root, stateOf(truth.filter(_._1 >= 20L)), "pd")
    assert(day1Files() == before,
      "backfill must not rewrite partitions outside the repaired range")
    val after = spark.read.parquet(root)
      .select(col("b"), col("n"), col("s")).orderBy("b").collect().toSeq
    val scratch = stateOf(truth)
      .select(col("b"), col("n"), col("s")).orderBy("b").collect().toSeq
    assert(after == scratch, "repaired state must equal scratch truth")
  }

  test("refreshTx: pruned folds through the table format equal scratch") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mvtx_spec").toString + "/t"
    val df = rows.toDF("id", "bucket", "v")
    Mv.refreshTx(spark, root, state(df.filter(col("id") % 10 =!= 0)),
      Seq("bucket"), adds = Seq("n", "s"), mins = Seq("mn"), maxs = Seq("mx"),
      nBuckets = 4, batchId = Some(1L))
    Mv.refreshTx(spark, root, state(df.filter(col("id") % 10 === 0)),
      Seq("bucket"), adds = Seq("n", "s"), mins = Seq("mn"), maxs = Seq("mx"),
      nBuckets = 4, batchId = Some(2L))
    val merged = graft.sources.Tx.read(spark, root)
      .select("bucket", "n", "s", "mn", "mx").orderBy("bucket").collect().toSeq
    val scratch = state(df)
      .select("bucket", "n", "s", "mn", "mx").orderBy("bucket").collect().toSeq
    assert(merged == scratch)
  }

  test("refreshTx: a crash before the CAS leaves state intact; the retry " +
      "lands exactly once (no double-count)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mvtx_crash").toString + "/t"
    val df = rows.toDF("id", "bucket", "v")
    val base = state(df.filter(col("id") % 10 =!= 0))
    val delta = state(df.filter(col("id") % 10 === 0))
    val args = (Seq("n", "s"), Seq("mn"), Seq("mx"))
    Mv.refreshTx(spark, root, base, Seq("bucket"),
      adds = args._1, mins = args._2, maxs = args._3,
      nBuckets = 4, batchId = Some(1L))
    val v1 = graft.sources.Tx.latest(root).get.version
    val v1Rows = graft.sources.Tx.read(spark, root)
      .orderBy("bucket").collect().toSeq
    // CRASH INJECTION: the refresh dies AFTER writing its data files but
    // BEFORE the manifest CAS — the window refreshPartitioned documents
    // as fatal for in-place overwrites. Here the table must still be at
    // v1, reading exactly the pre-crash state.
    intercept[RuntimeException](
      Mv.refreshTx(spark, root, delta, Seq("bucket"),
        adds = args._1, mins = args._2, maxs = args._3,
        nBuckets = 4, batchId = Some(2L),
        beforeCas = () => throw new RuntimeException("injected crash")))
    assert(graft.sources.Tx.latest(root).get.version == v1,
      "a crash before the CAS must leave the table at the old version")
    assert(graft.sources.Tx.read(spark, root)
      .orderBy("bucket").collect().toSeq == v1Rows,
      "readers must still see exactly the pre-crash state")
    // BLIND RETRY of the same batch — the case the in-place overwrite
    // double-counts. Through the format it lands exactly once:
    Mv.refreshTx(spark, root, delta, Seq("bucket"),
      adds = args._1, mins = args._2, maxs = args._3,
      nBuckets = 4, batchId = Some(2L))
    val merged = graft.sources.Tx.read(spark, root)
      .select("bucket", "n", "s", "mn", "mx").orderBy("bucket").collect().toSeq
    val scratch = state(df)
      .select("bucket", "n", "s", "mn", "mx").orderBy("bucket").collect().toSeq
    assert(merged == scratch, "crash + retry must equal scratch exactly")
    // REPLAY after success (crash-after-commit): stamped id gates it out
    val vNow = graft.sources.Tx.latest(root).get.version
    val vRet = Mv.refreshTx(spark, root, delta, Seq("bucket"),
      adds = args._1, mins = args._2, maxs = args._3,
      nBuckets = 4, batchId = Some(2L))
    assert(vRet == vNow && graft.sources.Tx.read(spark, root)
      .select("bucket", "n", "s", "mn", "mx").orderBy("bucket")
      .collect().toSeq == merged,
      "a replayed batch id must commit nothing and change nothing")
    // the crash's orphaned data dir is debris vacuum may clear once aged
    // — but it is UNREFERENCED, so correctness never depended on it
  }

  test("refreshTx: a CONCURRENT duplicate of the same batch folds once") {
    // two schedulers fire the same batch id at once: both pass the
    // before-commit replay check (neither has committed yet), so the
    // guard must hold INSIDE the CAS retry — the loser re-reads the
    // winner's snapshot, sees its own batch id stamped, and aborts
    // instead of re-deriving (which would double-count additive state).
    val root = java.nio.file.Files
      .createTempDirectory("graft_mvtx_dup").toString + "/t"
    val df = rows.toDF("id", "bucket", "v")
    val base = state(df.filter(col("id") % 10 =!= 0))
    val delta = state(df.filter(col("id") % 10 === 0))
    def refresh(d: org.apache.spark.sql.DataFrame, id: Long,
        hook: () => Unit = () => ()) =
      Mv.refreshTx(spark, root, d, Seq("bucket"),
        adds = Seq("n", "s"), mins = Seq("mn"), maxs = Seq("mx"),
        nBuckets = 4, batchId = Some(id), beforeCas = hook)
    refresh(base, 1L)
    var raced = false
    val v = refresh(delta, 2L, hook = () => {
      if (!raced) { raced = true; refresh(delta, 2L) } // the duplicate wins
    })
    assert(v == graft.sources.Tx.latest(root).get.version,
      "the loser must return the winner's version")
    val merged = graft.sources.Tx.read(spark, root)
      .select("bucket", "n", "s", "mn", "mx").orderBy("bucket").collect().toSeq
    val scratch = state(df)
      .select("bucket", "n", "s", "mn", "mx").orderBy("bucket").collect().toSeq
    assert(merged == scratch,
      "concurrent duplicates of one batch must fold it exactly once")
  }

  test("expectationReport counts every rule per row, suite-style") {
    val df = Seq(
      (1L, "ok", 5.0), (2L, "", -1.0), (3L, "", 3.0), (4L, "x", -9.0))
      .toDF("id", "t", "v")
    val rep = Quality.expectationReport(df, col("id"), Seq(
      "t_nonempty" -> (length(col("t")) === 0),
      "v_nonneg" -> (col("v") < 0)))
      .orderBy("rule").collect()
    // id=2 violates BOTH rules (suite semantics — counted in both totals)
    val byRule = rep.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    assert(byRule("t_nonempty") == ((2L, 4L, 500000L)))
    assert(byRule("v_nonneg") == ((2L, 4L, 500000L)))
    assert(rep.filter(_.getString(0) == "t_nonempty").head.getLong(2) == 2L)
    assert(rep.filter(_.getString(0) == "v_nonneg").head.getLong(2) == 2L)
  }

  test("expectationReport on an empty frame: null pass_ppm, no division") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    val rep = Quality.expectationReport(empty, col("id"),
      Seq("v_positive" -> (col("v") <= 0L))).collect()
    assert(rep.length == 1)
    val r = rep.head
    assert(r.getAs[Long]("n_violations") == 0L &&
      r.getAs[Long]("n_rows") == 0L &&
      r.isNullAt(r.fieldIndex("pass_ppm")),
      "an empty input must report a NULL pass rate, not divide by zero")
  }

  test("expectationReport: a clean rule reports zero and a null offender") {
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    val r = Quality.expectationReport(df, col("id"),
      Seq("v_positive" -> (col("v") <= 0))).collect().head
    assert(r.getLong(1) == 0L)
    assert(r.isNullAt(2))
    assert(r.getLong(4) == 1000000L)
  }

  test("applyChangeFeedWithBounds: a deleted max repairs ONLY its group") {
    import spark.implicits._
    // two groups; g=a's max (30) is deleted, g=b sees an insert only
    val state = Seq(("a", 2L, 40L, 10L, 30L), ("b", 1L, 5L, 5L, 5L))
      .toDF("g", "n_rows", "sum_v", "min_v", "max_v")
    val feed = Seq(
      ("a", 30L, "delete"), // retracts g=a's stored max → dirty
      ("b", 7L, "insert")) //  extends g=b's bounds outward → clean
      .toDF("g", "v", "_change")
    // upstream truth AFTER the delete: g=a keeps only v=10
    val upstream = Seq(("a", 10L), ("b", 5L), ("b", 7L)).toDF("g", "v")
    var rescanned: Seq[String] = null
    val out = graft.operators.Mv.applyChangeFeedWithBounds(
      state, feed, Seq("g"),
      adds = Seq("n_rows" -> lit(1L), "sum_v" -> col("v")),
      support = "n_rows",
      mins = Seq("min_v" -> col("v")), maxs = Seq("max_v" -> col("v")),
      rescan = dirty => {
        rescanned = dirty.collect().map(_.getString(0)).toSeq
        upstream.join(dirty, Seq("g"), "left_semi").groupBy("g")
          .agg(count(lit(1)).as("n_rows"), sum("v").as("sum_v"),
            min("v").as("min_v"), max("v").as("max_v"))
      })
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(rescanned == Seq("a"),
      s"only the bound-touching group may be rescanned, got $rescanned")
    assert(out == Seq(("a", 1L, 10L, 10L, 10L), ("b", 2L, 12L, 5L, 7L)),
      "a lands on scratch via the scoped repair; b merges algebraically")

    // a retraction NOT touching a bound stays algebraic (no rescan) —
    // and a dirty group that vanished upstream leaves the state
    var calls = 0
    val out2 = graft.operators.Mv.applyChangeFeedWithBounds(
      state,
      Seq(("a", 20L, "delete"), ("b", 5L, "delete")).toDF("g", "v", "_change"),
      Seq("g"),
      adds = Seq("n_rows" -> lit(1L), "sum_v" -> col("v")),
      support = "n_rows",
      mins = Seq("min_v" -> col("v")), maxs = Seq("max_v" -> col("v")),
      rescan = dirty => {
        calls += 1
        rescanned = dirty.collect().map(_.getString(0)).toSeq
        // b's group is now EMPTY upstream: truth has no row for it
        Seq(("zzz", 0L)).toDF("g", "v").join(dirty, Seq("g"), "left_semi")
          .groupBy("g").agg(count(lit(1)).as("n_rows"), sum("v").as("sum_v"),
            min("v").as("min_v"), max("v").as("max_v"))
      })
      .orderBy("g").collect().map(_.getString(0)).toSeq
    // a's delete of 20 (strictly inside [10,30]) is NOT dirty; b's
    // delete of 5 hits BOTH its bounds → dirty, vanishes upstream → gone
    assert(rescanned == Seq("b") && calls == 1)
    assert(out2 == Seq("a"),
      "b must leave the state when its repaired group has no truth rows")
  }

  test("followChangesBounded: exactly-once cursor + scoped bound repair") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_fcb").toString
    val up = s"$base/up"
    val st = s"$base/st"
    var rescanned: Seq[String] = Seq.empty
    def follow(beforeCas: () => Unit = () => ()) =
      graft.operators.Mv.followChangesBounded(spark, up, st, Seq("g"),
        adds = Seq("n_rows" -> lit(1L), "sum_v" -> col("v")),
        support = "n_rows",
        mins = Seq("min_v" -> col("v")), maxs = Seq("max_v" -> col("v")),
        project = df => df.select(
          (col("id") % 2).cast("string").as("g"), col("v"), col("_change")),
        rescan = (dirty, toV) => {
          rescanned = dirty.collect().map(_.getString(0)).toSeq.sorted
          graft.sources.Tx.read(spark, up, toV)
            .select((col("id") % 2).cast("string").as("g"), col("v"))
            .join(dirty, Seq("g"), "left_semi")
            .groupBy("g").agg(count(lit(1)).as("n_rows"),
              sum("v").as("sum_v"), min("v").as("min_v"),
              max("v").as("max_v"))
        },
        nBuckets = 4, beforeCas = beforeCas)
    def state() = graft.sources.Tx.read(spark, st)
      .select("g", "n_rows", "sum_v", "min_v", "max_v").orderBy("g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // g=0: ids 2,4 (v 20, 40); g=1: ids 1,3 (v 10, 30)
    graft.sources.Tx.commitMerge(spark, up,
      Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("id", "v"),
      Seq("id"), nBuckets = 4)
    follow() // bootstrap is scratch
    assert(state() == Seq(("0", 2L, 60L, 20L, 40L), ("1", 2L, 40L, 10L, 30L)))
    assert(rescanned.isEmpty, "bootstrap never rescans")
    // delete g=0's max (id 4, v 40) and g=1's NON-extremum? g=1 has only
    // two values; delete id 4 only — g=0 dirty, g=1 untouched
    graft.sources.Tx.commitDelete(spark, up, Seq(4L).toDF("id"),
      Seq("id"), nBuckets = 4)
    // crash BEFORE the CAS: state+cursor unmoved, retry lands once
    intercept[RuntimeException](
      follow(beforeCas = () => throw new RuntimeException("crash")))
    assert(state() == Seq(("0", 2L, 60L, 20L, 40L), ("1", 2L, 40L, 10L, 30L)))
    rescanned = Seq.empty
    follow()
    assert(rescanned == Seq("0"),
      s"only the bound-touching group may be rescanned, got $rescanned")
    val expect = Seq(("0", 1L, 20L, 20L, 20L), ("1", 2L, 40L, 10L, 30L))
    assert(state() == expect, "g=0 lands on scratch; g=1 never repaired")
    // replay: caught up — commits nothing
    val v = graft.sources.Tx.latest(st).get.version
    follow()
    assert(graft.sources.Tx.latest(st).get.version == v && state() == expect)
  }

  test("refreshTxWith: custom fold rides the stamp/replay/crash discipline") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_rtw").toString + "/t"
    // a NON-mergeState monoid: per-key set union carried as a sorted
    // csv string — stands in for any sketch-like accumulator
    val fold = (existing: org.apache.spark.sql.DataFrame,
        delta: org.apache.spark.sql.DataFrame) =>
      existing.select(col("k"), col("__b"), col("members").as("__x"))
        .join(delta.select(col("k"), col("__b"), col("members").as("__y")),
          Seq("k", "__b"), "full_outer")
        .select(col("k"),
          array_join(array_sort(array_distinct(array_remove(concat(
            split(coalesce(col("__x"), lit("")), ","),
            split(coalesce(col("__y"), lit("")), ",")), ""))), ",")
            .as("members"),
          col("__b"))
    def refresh(rows: Seq[(String, String)], id: Long,
        beforeCas: () => Unit = () => ()) =
      graft.operators.Mv.refreshTxWith(spark, path,
        rows.toDF("k", "members"), Seq("k"), nBuckets = 4,
        batchId = Some(id), beforeCas = beforeCas)(fold)
    def state() = graft.sources.Tx.read(spark, path).orderBy("k")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    refresh(Seq(("a", "1"), ("b", "2")), 1L)
    // crash before the CAS: state unmoved; blind retry folds ONCE
    intercept[RuntimeException](refresh(Seq(("a", "3")), 2L,
      beforeCas = () => throw new RuntimeException("crash")))
    assert(state() == Seq(("a", "1"), ("b", "2")),
      "bootstrap state unmoved by the crashed refresh")
    refresh(Seq(("a", "3")), 2L)
    val expect = Seq(("a", "1,3"), ("b", "2"))
    assert(state() == expect)
    // replay of batch 2: the stamp makes it a no-op — a double-union of
    // a set monoid would be invisible, so fold a FRESH value instead and
    // assert nothing landed
    val v = graft.sources.Tx.latest(path).get.version
    refresh(Seq(("a", "9")), 2L)
    assert(graft.sources.Tx.latest(path).get.version == v && state() == expect,
      "a replayed batch id must commit nothing, even with new content")
  }

  test("followChanges: an upstream reset fails loudly, never stale no-ops") {
    import spark.implicits._
    val up = java.nio.file.Files.createTempDirectory("graft_fru").toString + "/t"
    val st = java.nio.file.Files.createTempDirectory("graft_frs").toString + "/t"
    def follow() = graft.operators.Mv.followChanges(spark, up, st, Seq("g"),
      adds = Seq("n_rows" -> lit(1L), "sum_v" -> col("v")),
      support = "n_rows",
      project = df => df.select(
        (col("id") % 2).cast("string").as("g"), col("v"), col("_change")),
      nBuckets = 4)
    graft.sources.Tx.commitMerge(spark, up,
      Seq((1L, 10L)).toDF("id", "v"), Seq("id"), nBuckets = 4)
    graft.sources.Tx.commitMerge(spark, up,
      Seq((2L, 20L)).toDF("id", "v"), Seq("id"), nBuckets = 4)
    follow() // cursor = 2
    // the upstream table is deleted and RE-CREATED: its version counter
    // resets to 1, now BELOW the state's cursor — every follow would be
    // a permanent silent no-op serving stale state unless it throws
    def rmrf(p: String): Unit = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.delete(f))
      finally s.close()
    }
    rmrf(up)
    graft.sources.Tx.commitMerge(spark, up,
      Seq((9L, 90L)).toDF("id", "v"), Seq("id"), nBuckets = 4)
    val e = intercept[IllegalStateException](follow())
    assert(e.getMessage.contains("reset"),
      s"cursor-ahead-of-upstream must name the probable reset: ${e.getMessage}")
  }
}
