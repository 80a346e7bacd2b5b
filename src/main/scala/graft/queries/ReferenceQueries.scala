package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Exact
import graft.operators.{Align, Dedup, Quality, Resample, Reshape}
import graft.sources.{Merge, Tables}
import graft.pipeline.Pipeline

/** Reference-parity operator queries (SURVEY.md §2) over the driver corpus.
  *
  * `events` plays the role of the reference's `generation` time series
  * (ts ↔ DATETIME, event_id ↔ _id, value ↔ MW columns — FIXTURES.md §4).
  * Every query is paired with equivalent DuckDB SQL in [[oracleSql]]; both
  * sides ORDER BY a unique key so results are row-order deterministic, and all
  * double aggregation goes through [[graft.functions.Exact]] so hashes match
  * bit-for-bit across engines.
  */
object ReferenceQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Extract the numeric `k` from the props JSON-ish string, as double. */
  private def kOf(props: org.apache.spark.sql.Column) =
    regexp_extract(props, "\"k\": (\\d+)", 1).cast("double")

  val queries: Map[String, Q] = Map(
    // S3/P13-style scan: filter + project + order (pushed to parquet scan).
    "q01_scan_filter_project" -> ((s, dir) => {
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase" && col("value") > 100)
        .select("event_id", "ts", "value")
        .orderBy("event_id")
    }),
    // S2/P12/O4: one keyset page — WHERE id > cursor ORDER BY id LIMIT n.
    "q02_keyset_page" -> ((s, dir) => {
      Pipeline.keysetPage(Tables.events(s, dir), 500L, 1000, "event_id")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    }),
    // S2 generalized to a COMPOSITE cursor (ts, event_id) — the production
    // keyset shape when the order key (a timestamp) is not unique: the id
    // tie-breaker makes the cursor a total order so pages never skip or
    // repeat rows under equal timestamps; the disjunctive predicate is
    // sargable and the page is a TakeOrderedAndProject, never a global
    // sort.
    "q160_keyset_composite" -> ((s, dir) => {
      Pipeline.keysetPageComposite(Tables.events(s, dir),
        lit("2024-01-15 00:00:00").cast("timestamp_ntz"), 5000L, 1000,
        "ts", "event_id")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("ts", "event_id")
    }),
    // S4/S6/A1: scalar max-id probe.
    "q03_max_probe" -> ((s, dir) =>
      Tables.events(s, dir).agg(max(col("event_id")).as("last_id"))),
    // S5/O3/P13: latest matching row — filter, sort desc, limit 1.
    "q04_latest_probe" -> ((s, dir) => {
      Tables.events(s, dir)
        .filter(col("event_type") === "signup")
        .orderBy(col("ts").desc, col("event_id").desc)
        .limit(1)
        .select("event_id", "ts", "event_type")
    }),
    // S10/A3: literal-rows quality summary from counts — ONE aggregation
    // pass (count + count_if in the same job) instead of the reference's
    // scan-per-metric.
    "q05_quality_summary" -> ((s, dir) => {
      val r = Tables.events(s, dir).agg(
        count(lit(1)).as("total"),
        count_if(col("event_type") =!= "error").as("clean")).head()
      val (total, clean) = (r.getLong(0), r.getLong(1))
      Quality.qualitySummary(s, total, clean, Seq("error_events" -> (total - clean)))
        .orderBy("Check")
    }),
    // P1/P2: schema alignment — project to target, missing column as typed null.
    "q06_align_schema" -> ((s, dir) => {
      val target = StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", TimestampNTZType),
        StructField("value", DoubleType),
        StructField("extra_metric", DoubleType)))
      Align.alignSchema(Tables.events(s, dir), target).orderBy("event_id")
    }),
    // C1/C2: lenient parse/cast — null on malformed, never throws.
    "q07_cast_lenient" -> ((s, dir) => {
      Tables.events(s, dir).select(
        col("event_id"),
        to_timestamp(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"),
          "yyyy-MM-dd'T'HH:mm:ss").cast("timestamp_ntz").as("ts_parsed"),
        kOf(col("props")).as("k_value"),
        col("event_type").cast("double").as("bad_cast"))
        .orderBy("event_id")
    }),
    // P3-P5: percentage-consistency repair via the Quality operator.
    "q08_perc_repair" -> ((s, dir) => {
      val base = Tables.events(s, dir).select(
        col("event_id"),
        col("value").as("WIND"),
        (col("value") + kOf(col("props"))).as("GENERATION"),
        kOf(col("props")).as("WIND_perc"))
      Quality.repairPercentages(base, Seq("WIND")).orderBy("event_id")
    }),
    // P8-P10: null handling — drop null keys, fill float nulls with 0.0.
    "q09_null_handling" -> ((s, dir) => {
      val withNulls = Tables.events(s, dir).select(
        when(col("event_id") % 97 === 0, lit(null)).otherwise(col("event_id")).as("_id"),
        when(col("event_type") === "error", lit(null)).otherwise(col("value")).as("value"))
      Quality.handleMissing(withNulls, Seq("_id")).orderBy("_id")
    }),
    // D1+D2+D3: composed keep-last dedup (window row_number idiom).
    "q10_dedup_keeplast" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
      val d1 = Dedup.keepFirstBy(ev, Seq("user_id"), Seq(col("ts").desc, col("event_id").desc))
      val d2 = Dedup.keepFirstBy(d1, Seq("ts"), Seq(col("user_id").desc, col("event_id").desc))
      d2.orderBy("event_id")
    }),
    // A4: 30-minute tumbling resample, mean of every numeric column.
    "q11_resample_30m" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(Resample.bucketStart(col("ts"), "30m").cast("timestamp_ntz").as("bucket"))
        .agg(
          Exact.davg(col("value")).as("avg_value"),
          Exact.davg(col("event_id")).as("avg_event_id"),
          count(lit(1)).as("n"))
        .orderBy("bucket")
    }),
    // Gap-filled resample: q11's buckets densified to the complete 30m
    // axis — empty buckets PRESENT (n=0, NULL mean, filled=true); a
    // missing bucket is an outage signal, not a skippable row. The axis
    // builds from a 1-row bounds agg; the completion join broadcasts.
    "q120_resample_gapfill" -> ((s, dir) => {
      val b = Tables.events(s, dir)
        .groupBy(Resample.bucketStart(col("ts"), "30m").cast("timestamp_ntz").as("bucket"))
        .agg(Exact.davg(col("value")).as("avg_value"), count(lit(1)).as("n"))
      Resample.gapFill(b, "bucket", "30m")
        .na.fill(0L, Seq("n"))
        .withColumn("filled", col("n") === 0L)
        .select("bucket", "avg_value", "n", "filled")
        .orderBy("bucket")
    }),
    // Hopping (sliding) window aggregation: 1-hour windows every 30
    // minutes — each event contributes to exactly two overlapping
    // windows. Spark's native `window(ts, '1 hour', '30 minutes')`
    // multiplies rows map-side (no pre-explode shuffle); the oracle
    // reconstructs the same two candidate starts per event arithmetically.
    // The batch twin of the streaming hop (tumblingMeans' generalization).
    "q125_hopping_window" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(Exact.davg(col("value")).as("avg_value"), count(lit(1)).as("n"))
        .select(col("window.start").cast("timestamp_ntz").as("win_start"),
          col("avg_value"), col("n"))
        .orderBy("win_start")
    }),
    // P11: inclusive-inclusive date-range filter.
    "q12_filter_range" -> ((s, dir) => {
      Resample.filterByDate(Tables.events(s, dir), "ts",
          "2024-01-10 00:00:00", "2024-01-20 00:00:00")
        .select("event_id", "ts", "value")
        .orderBy("event_id")
    }),
    // Settlement-grid completeness audit: the feed the reference ingests
    // is half-hourly (48 settlement periods/day, helpers.py:33-38) via
    // incremental keyset fetch (fetch_neso.py:42-78); this reports, per
    // day, rows / present slots / missing slots / first missing slot —
    // the backfill worklist an operator of that pipeline actually needs.
    "q180_completeness" -> ((s, dir) => {
      Resample.completenessAudit(Tables.events(s, dir), col("ts"), slotsPerDay = 48)
        .orderBy("day")
    }),
    // §3.2 read path: resample FIRST, then filter on bucket labels.
    "q13_resample_then_filter" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(Resample.bucketStart(col("ts"), "1d").cast("timestamp_ntz").as("bucket"))
        .agg(Exact.davg(col("value")).as("avg_value"))
        .filter(col("bucket").between(
          lit("2024-01-05 00:00:00").cast("timestamp_ntz"),
          lit("2024-01-15 00:00:00").cast("timestamp_ntz")))
        .orderBy("bucket")
    }),
    // R1: wide→long unpivot.
    "q14_unpivot" -> ((s, dir) => {
      Reshape.unpivot(
        Tables.lineitem(s, dir),
        ids = Seq("l_orderkey", "l_linenumber"),
        valueCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        variableName = "measure", valueName = "val")
        .orderBy("l_orderkey", "l_linenumber", "measure")
    }),
    // M1/S7: keyed idempotent upsert as a pure query (anti-join + union).
    // Deterministic pseudonymization: user ids mapped to 60-bit md5
    // pseudonyms (salted, re-derivable — joins keep working without the
    // raw id ever leaving the pipeline) with the injectivity audit a
    // privacy review requires: distinct-pseudonym count vs user count
    // (collisions would MERGE users' histories) plus proof every event
    // re-keys. Pure codegen'd expression; the mapping table is the only
    // artifact that ever needs restricted storage.
    "q213_pseudonymize" -> ((s, dir) => {
      val pseud = conv(substring(
        md5(concat(lit("pseudo:"), col("user_id").cast("string"))), 1, 15), 16, 10)
        .cast("long")
      val mapped = Tables.events(s, dir).select("user_id").distinct()
        .withColumn("pseudonym", pseud)
      val rekeyed = Tables.events(s, dir).select("user_id", "event_id")
        .join(mapped, "user_id")
      mapped.agg(count(lit(1)).as("n_users"),
          countDistinct(col("pseudonym")).as("n_pseudonyms"),
          (count(lit(1)) - countDistinct(col("pseudonym"))).as("n_collisions"))
        .crossJoin(broadcast(rekeyed.agg(count(lit(1)).as("n_events_rekeyed"))))
    }),
    // k-anonymity audit with a generalization ladder (Sweeney 2002 / the
    // Samarati generalization lattice, one chain of it): how identifiable
    // is a row from its quasi-identifiers (nation, market segment,
    // account-balance bucket), and which coarsening first reaches k=5?
    // Four levels — balance bucketed at 100, at 1000, dropped, then
    // nation alone — each audited in one map-side-combined group-size
    // aggregation: violating-group count, rows at re-identification risk,
    // minimum group size, and the k-anonymous verdict. The 100 TB shape:
    // each level is one groupBy over bounded-cardinality keys; the ladder
    // is a 4-row decision table, not a per-row rewrite (q213's
    // pseudonymization is the row-level complement).
    "q223_k_anonymity" -> ((s, dir) => {
      val k = 5L
      val c = Tables.customer(s, dir)
        .select(col("c_nationkey").cast("long").as("nat"),
          col("c_mktsegment").as("seg"),
          floor(col("c_acctbal") / 100.0).cast("long").as("b100"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("b1000"))
      def audit(level: String, keys: Seq[String]): DataFrame =
        c.groupBy(keys.map(col): _*).agg(count(lit(1)).as("gs"))
          .agg(count(lit(1)).as("n_groups"),
            sum(when(col("gs") < k, lit(1L)).otherwise(lit(0L))).as("n_violating"),
            sum(when(col("gs") < k, col("gs")).otherwise(lit(0L))).as("rows_at_risk"),
            min(col("gs")).as("min_group"))
          .select(lit(level).as("level"), col("n_groups"), col("n_violating"),
            col("rows_at_risk"), col("min_group"),
            (col("min_group") >= k).as("k_anonymous"))
      audit("l0_nat_seg_bal100", Seq("nat", "seg", "b100"))
        .unionByName(audit("l1_nat_seg_bal1000", Seq("nat", "seg", "b1000")))
        .unionByName(audit("l2_nat_seg", Seq("nat", "seg")))
        .unionByName(audit("l3_nat", Seq("nat")))
        .orderBy("level")
    }),
    // Keyed DELETE on the partitioned sink (takedown / right-to-be-
    // forgotten mechanics): build the bucketed sink, delete every 50th
    // event through the bucket-pruned anti-join path, read back — the
    // oracle computes events minus the delete list relationally, so the
    // hash gate proves the pruned rewrite removed exactly those keys and
    // nothing else. MergePipelineSpec covers the emptied-bucket edge.
    "q207_delete_partitioned" -> ((s, dir) => {
      val existing = Tables.events(s, dir)
        .select("event_id", "user_id", "event_type", "value")
      val sink = graft.sources.Scratch.dir("graft_q207") + "/sink"
      Merge.upsertPartitioned(s, existing, sink, Seq("event_id"), numBuckets = 16)
      Merge.deletePartitioned(s,
        existing.filter(col("event_id") % 50 === 0).select("event_id"),
        sink, Seq("event_id"), numBuckets = 16)
      s.read.parquet(sink).drop("p_bucket")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    }),
    // Ramp-rate audit: the between-consecutive-readings jump |Δvalue|
    // per day (energy ops watch ramp rates — a generation feed that
    // swings hard inside one settlement period is news). lag() over each
    // day's time-ordered readings; per day: max ramp, its timestamp
    // (deterministic struct-max tie-break), and the count of ramps above
    // 3000. Differences are single IEEE subtractions of stored doubles —
    // engine-identical.
    "q215_ramp_rates" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("day").orderBy(col("ts"), col("event_id"))
      val d = Tables.events(s, dir)
        .select(to_date(col("ts")).as("day"), col("ts"), col("event_id"), col("value"))
        .withColumn("ramp", abs(col("value") - lag(col("value"), 1).over(w)))
        .filter(col("ramp").isNotNull)
      d.groupBy("day")
        .agg(count(lit(1)).as("n_ramps"),
          max(col("ramp")).as("max_ramp"),
          max(struct(col("ramp"), col("ts"))).getField("ts").as("max_ramp_ts"),
          count_if(col("ramp") > 3000d).as("n_big_ramps"))
        .orderBy("day")
    }),
    // Load-profile seasonality: mean value per (weekday × hour) cell —
    // the standard energy-dashboard heatmap over half-hourly feeds (the
    // reference's charting layer renders exactly this shape), with the
    // per-weekday PEAK hour via a deterministic struct-max. Exact
    // decimal means; one map-side-combined pass + a 7-row window.
    "q205_seasonality" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cells = Tables.events(s, dir)
        .groupBy(dayofweek(col("ts")).as("weekday"), hour(col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"), Exact.davg(col("value")).as("avg_value"))
      cells
        .withColumn("peak_hour",
          max(struct(col("avg_value"), col("hour"))).over(Window.partitionBy("weekday"))
            .getField("hour"))
        .select("weekday", "hour", "n", "avg_value", "peak_hour")
        .orderBy("weekday", "hour")
    }),
    // Freshness SLA report: per feed (event_type), row count, latest
    // event, and the lag in whole minutes behind the freshest feed —
    // with a stale flag at >60 min. The ops dashboard row the
    // reference's hourly incremental fetch is judged by; lag is exact
    // integer arithmetic on epoch micros (date_diff counts boundary
    // crossings — not the same number in every engine).
    "q190_freshness" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val global = ev.agg(max(col("ts")).as("gmax"))
      ev.groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"), max(col("ts")).as("max_ts"))
        .crossJoin(broadcast(global))
        .withColumn("lag_minutes", expr(
          // NTZ → UTC timestamp is exact under the pinned UTC session TZ
          "(unix_micros(cast(gmax as timestamp)) - unix_micros(cast(max_ts as timestamp))) div 60000000"))
        .withColumn("stale", col("lag_minutes") > 60L)
        .select("event_type", "n_rows", "max_ts", "lag_minutes", "stale")
        .orderBy("event_type")
    }),
    // Dead-letter routing: rows violating ingest rules get a REASON code
    // (first violated rule wins) instead of silently vanishing — the
    // quarantine split before the sink. Violations are planted in-plan
    // (every 97th row an empty type, every 89th a NaN value) so each rule
    // demonstrably fires; the rollup is the dead-letter dashboard row.
    "q186_dead_letter" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("event_type",
          when(col("event_id") % 97 === 0, lit("")).otherwise(col("event_type")))
        .withColumn("value",
          when(col("event_id") % 89 === 0, lit(Double.NaN)).otherwise(col("value")))
      graft.operators.Quality.deadLetterTag(ev, Seq(
        "empty_type" -> (length(col("event_type")) === 0),
        "nan_value" -> isnan(col("value")),
        "null_ts" -> col("ts").isNull))
        .groupBy("dl_reason")
        .agg(count(lit(1)).as("n_rows"), min(col("event_id")).as("min_event_id"))
        .orderBy("dl_reason")
    }),
    // Checksum-verified MERGE: q185's bucket fingerprints taken before
    // and after an upsert — the differing buckets must be EXACTLY the
    // md5-buckets of the incoming keys (an upsert that touched anything
    // else corrupted data; one that touched fewer lost writes). The
    // fp_delta_ok flag IS the post-merge integrity gate, computed from
    // 64 numbers per side.
    "q217_merge_fp_delta" -> ((s, dir) => {
      def fp(df: DataFrame) = graft.sources.Merge.bucketFingerprints(
        df, col("event_id"),
        Seq(col("event_id"), col("user_id"), col("event_type"),
          floor(col("value") * 1e6).cast("long")),
        buckets = 64)
      val existing = Tables.events(s, dir)
        .select("event_id", "user_id", "event_type", "value")
      val incoming = existing.filter(col("event_id") % 100 === 0)
        .withColumn("value", col("value") * 3)
      val after = graft.sources.Merge.upsert(existing, incoming, Seq("event_id"))
      val expected = incoming.select(
        pmod(conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
          .cast("long"), lit(64L)).as("bucket")).distinct()
        .agg(count(lit(1)).as("n_expected"))
      fp(existing).withColumnRenamed("fp", "fp_before")
        .join(fp(after).withColumnRenamed("fp", "fp_after")
          .withColumnRenamed("n_rows", "n_rows_after"), Seq("bucket"), "full")
        .agg(count(lit(1)).as("n_buckets"),
          count_if(!(col("fp_before") <=> col("fp_after"))).as("n_differing"))
        .crossJoin(broadcast(expected))
        .withColumn("fp_delta_ok", col("n_differing") === col("n_expected"))
    }),
    // Anti-entropy bucket fingerprints: 64 Merkle-style bucket checksums
    // of the events table (order-independent XORs of 60-bit row hashes —
    // int64-closed, so the checksum never widens past what a typed
    // cross-engine hash can digest) compared against a copy with ONE
    // perturbed row — the diff
    // localizes to exactly the perturbed key's bucket, which is how two
    // 100 TB replicas are compared with 64 numbers instead of a
    // row-by-row join. Doubles ride on a fixed-point grid (engine float
    // formatting is not canonical).
    "q185_bucket_fingerprint" -> ((s, dir) => {
      def fp(df: DataFrame) = graft.sources.Merge.bucketFingerprints(
        df, col("event_id"),
        Seq(col("event_id"), col("user_id"), col("event_type"),
          floor(col("value") * 1e6).cast("long")),
        buckets = 64)
      val base = Tables.events(s, dir)
      val mutated = base.withColumn("value",
        when(col("event_id") === 4242L, col("value") * 2).otherwise(col("value")))
      fp(base).as("a")
        .join(fp(mutated).withColumnRenamed("fp", "fp_mut")
          .withColumnRenamed("n_rows", "n_rows_mut"), Seq("bucket"), "full")
        .select(col("bucket"), col("n_rows"), col("fp"), col("fp_mut"),
          (!(col("fp") <=> col("fp_mut"))).as("differs"))
        .orderBy("bucket")
    }),
    "q15_upsert" -> ((s, dir) => {
      val existing = Tables.events(s, dir)
        .select("event_id", "user_id", "event_type", "value")
      val updates = existing.filter(col("event_id") % 10 === 0)
        .withColumn("value", col("value") * 2)
      val inserts = existing.filter(col("event_id") < 50)
        .withColumn("event_id", col("event_id") + 1000000L)
      Merge.upsert(existing, updates.unionByName(inserts), Seq("event_id"))
        .orderBy("event_id")
    }),
    // S7 through the scale-safe sink: the SAME merge as q15 but round-
    // tripped through the hash-bucket-partitioned on-disk sink (write
    // existing, upsert incoming, read back) — the oracle checks the sink's
    // post-merge contents, so the partition-pruned rewrite path itself is
    // under the correctness gate, not just spec-tested.
    "q67_upsert_partitioned_sink" -> ((s, dir) => {
      val existing = Tables.events(s, dir)
        .select("event_id", "user_id", "event_type", "value")
      val updates = existing.filter(col("event_id") % 10 === 0)
        .withColumn("value", col("value") * 2)
      val inserts = existing.filter(col("event_id") < 50)
        .withColumn("event_id", col("event_id") + 1000000L)
      val sink = graft.sources.Scratch.dir("graft_q67") + "/sink"
      Merge.upsertPartitioned(s, existing, sink, Seq("event_id"), numBuckets = 16)
      Merge.upsertPartitioned(
        s, updates.unionByName(inserts), sink, Seq("event_id"), numBuckets = 16)
      s.read.parquet(sink).drop("p_bucket")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    }),
    // S8: run-metrics row (counts + min/max probes, single pass).
    "q16_run_metrics" -> ((s, dir) => {
      Tables.events(s, dir).agg(
        count(lit(1)).as("total_fetched"),
        max(col("event_id")).as("last_fetched_id"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        count(when(col("event_type") === "error", lit(1))).as("error_events"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q01_scan_filter_project" ->
      "SELECT event_id, ts, value FROM events WHERE event_type = 'purchase' AND value > 100 ORDER BY event_id",
    "q02_keyset_page" ->
      "SELECT event_id, user_id, event_type, value FROM events WHERE event_id > 500 ORDER BY event_id LIMIT 1000",
    "q160_keyset_composite" ->
      """SELECT event_id, ts, user_id, event_type, value FROM events
          WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
             OR (ts = TIMESTAMP '2024-01-15 00:00:00' AND event_id > 5000)
          ORDER BY ts, event_id LIMIT 1000""".replaceAll("\\s+", " "),
    "q03_max_probe" ->
      "SELECT max(event_id) AS last_id FROM events",
    "q04_latest_probe" ->
      "SELECT event_id, ts, event_type FROM events WHERE event_type = 'signup' ORDER BY ts DESC, event_id DESC LIMIT 1",
    "q05_quality_summary" ->
      """SELECT * FROM (SELECT 'Total raw records' AS "Check", count(*) AS "Count" FROM events UNION ALL SELECT 'Total clean records', count(*) FROM events WHERE event_type <> 'error' UNION ALL SELECT 'error_events', count(*) FROM events WHERE event_type = 'error') ORDER BY "Check"""",
    "q06_align_schema" ->
      "SELECT event_id, ts, value, CAST(NULL AS DOUBLE) AS extra_metric FROM events ORDER BY event_id",
    "q07_cast_lenient" ->
      """SELECT event_id, try_strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S'), '%Y-%m-%dT%H:%M:%S') AS ts_parsed, TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS DOUBLE) AS k_value, TRY_CAST(event_type AS DOUBLE) AS bad_cast FROM events ORDER BY event_id""",
    "q08_perc_repair" ->
      """SELECT event_id, "WIND", "GENERATION", CASE WHEN isnan(calc) THEN raw_perc WHEN abs(calc - raw_perc) > 1.0 THEN calc ELSE raw_perc END AS "WIND_perc" FROM (SELECT *, CASE WHEN "GENERATION" = 0 THEN (CASE WHEN "WIND" > 0 THEN 'infinity'::DOUBLE WHEN "WIND" < 0 THEN '-infinity'::DOUBLE WHEN "WIND" = 0 THEN 'nan'::DOUBLE END) ELSE "WIND" / "GENERATION" * 100 END AS calc FROM (SELECT event_id, value AS "WIND", value + k AS "GENERATION", k AS raw_perc FROM (SELECT event_id, value, TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS DOUBLE) AS k FROM events))) ORDER BY event_id""",
    "q09_null_handling" ->
      "SELECT _id, COALESCE(value, 0.0) AS value FROM (SELECT CASE WHEN event_id % 97 = 0 THEN NULL ELSE event_id END AS _id, CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value FROM events) WHERE _id IS NOT NULL ORDER BY _id",
    "q10_dedup_keeplast" ->
      "WITH d1 AS (SELECT event_id, ts, user_id, event_type, value FROM events QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1) SELECT event_id, ts, user_id, event_type, value FROM d1 QUALIFY row_number() OVER (PARTITION BY ts ORDER BY user_id DESC, event_id DESC) = 1 ORDER BY event_id",
    "q11_resample_30m" ->
      "SELECT time_bucket(INTERVAL '30 minutes', ts) AS bucket, CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / count(value) AS avg_value, CAST(sum(CAST(event_id AS DECIMAL(30,10))) AS DOUBLE) / count(event_id) AS avg_event_id, count(*) AS n FROM events GROUP BY 1 ORDER BY 1",
    "q125_hopping_window" ->
      """WITH w AS (SELECT value,
            unnest([time_bucket(INTERVAL '30 minutes', ts),
                    time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
              AS win_start
          FROM events)
          SELECT win_start,
            CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / count(value) AS avg_value,
            count(*) AS n
          FROM w GROUP BY 1 ORDER BY 1""".replaceAll("\\s+", " "),
    "q120_resample_gapfill" ->
      """WITH b AS (SELECT time_bucket(INTERVAL '30 minutes', ts) AS bucket,
            CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / count(value) AS avg_value,
            count(*) AS n FROM events GROUP BY 1),
          r AS (SELECT unnest(generate_series((SELECT min(bucket) FROM b),
                                              (SELECT max(bucket) FROM b),
                                              INTERVAL '30 minutes')) AS bucket)
          SELECT r.bucket, b.avg_value, coalesce(b.n, 0) AS n, b.n IS NULL AS filled
          FROM r LEFT JOIN b ON r.bucket = b.bucket
          ORDER BY r.bucket""".replaceAll("\\s+", " "),
    "q12_filter_range" ->
      "SELECT event_id, ts, value FROM events WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00' ORDER BY event_id",
    "q180_completeness" ->
      """WITH slotted AS (SELECT CAST(ts AS DATE) AS day,
              (hour(ts) * 60 + minute(ts)) // 30 AS slot FROM events),
          g AS (SELECT day, CAST(count(*) AS BIGINT) AS n_rows,
              list(DISTINCT slot) AS slots FROM slotted GROUP BY day)
          SELECT day, n_rows,
            CAST(len(slots) AS INT) AS n_present,
            CAST(48 - len(slots) AS INT) AS n_missing,
            CAST(list_min(list_filter(range(0, 48), x -> NOT list_contains(slots, x))) AS INT)
              AS first_missing_slot
          FROM g ORDER BY day""".replaceAll("\\s+", " "),
    "q13_resample_then_filter" ->
      "SELECT * FROM (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / count(value) AS avg_value FROM events GROUP BY 1) WHERE bucket BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-15 00:00:00' ORDER BY bucket",
    "q14_unpivot" ->
      "SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM lineitem UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem ORDER BY l_orderkey, l_linenumber, measure",
    "q213_pseudonymize" ->
      """WITH m AS (SELECT DISTINCT user_id,
              ('0x' || substr(md5('pseudo:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                AS pseudonym
            FROM events),
          a AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
              CAST(count(DISTINCT pseudonym) AS BIGINT) AS n_pseudonyms,
              CAST(count(*) - count(DISTINCT pseudonym) AS BIGINT) AS n_collisions
            FROM m),
          r AS (SELECT CAST(count(*) AS BIGINT) AS n_events_rekeyed
                FROM events e JOIN m USING (user_id))
          SELECT a.n_users, a.n_pseudonyms, a.n_collisions, r.n_events_rekeyed
          FROM a, r""".replaceAll("\\s+", " "),
    "q207_delete_partitioned" ->
      """SELECT event_id, user_id, event_type, value FROM events
          WHERE event_id % 50 <> 0 ORDER BY event_id""".replaceAll("\\s+", " "),
    "q223_k_anonymity" ->
      """WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
              CAST(floor(c_acctbal / 100.0) AS BIGINT) AS b100,
              CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS b1000
            FROM customer),
          g0 AS (SELECT count(*) AS gs FROM c GROUP BY nat, seg, b100),
          g1 AS (SELECT count(*) AS gs FROM c GROUP BY nat, seg, b1000),
          g2 AS (SELECT count(*) AS gs FROM c GROUP BY nat, seg),
          g3 AS (SELECT count(*) AS gs FROM c GROUP BY nat),
          a0 AS (SELECT 'l0_nat_seg_bal100' AS level, CAST(count(*) AS BIGINT) AS n_groups,
              CAST(sum(CASE WHEN gs < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
              CAST(sum(CASE WHEN gs < 5 THEN gs ELSE 0 END) AS BIGINT) AS rows_at_risk,
              CAST(min(gs) AS BIGINT) AS min_group, min(gs) >= 5 AS k_anonymous FROM g0),
          a1 AS (SELECT 'l1_nat_seg_bal1000', CAST(count(*) AS BIGINT),
              CAST(sum(CASE WHEN gs < 5 THEN 1 ELSE 0 END) AS BIGINT),
              CAST(sum(CASE WHEN gs < 5 THEN gs ELSE 0 END) AS BIGINT),
              CAST(min(gs) AS BIGINT), min(gs) >= 5 FROM g1),
          a2 AS (SELECT 'l2_nat_seg', CAST(count(*) AS BIGINT),
              CAST(sum(CASE WHEN gs < 5 THEN 1 ELSE 0 END) AS BIGINT),
              CAST(sum(CASE WHEN gs < 5 THEN gs ELSE 0 END) AS BIGINT),
              CAST(min(gs) AS BIGINT), min(gs) >= 5 FROM g2),
          a3 AS (SELECT 'l3_nat', CAST(count(*) AS BIGINT),
              CAST(sum(CASE WHEN gs < 5 THEN 1 ELSE 0 END) AS BIGINT),
              CAST(sum(CASE WHEN gs < 5 THEN gs ELSE 0 END) AS BIGINT),
              CAST(min(gs) AS BIGINT), min(gs) >= 5 FROM g3)
          SELECT * FROM a0 UNION ALL SELECT * FROM a1
          UNION ALL SELECT * FROM a2 UNION ALL SELECT * FROM a3
          ORDER BY level""".replaceAll("\\s+", " "),
    "q215_ramp_rates" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day, ts, event_id, value,
              abs(value - lag(value) OVER (PARTITION BY CAST(ts AS DATE)
                ORDER BY ts, event_id)) AS ramp
            FROM events),
          f AS (SELECT * FROM d WHERE ramp IS NOT NULL),
          mx AS (SELECT day, ts AS max_ramp_ts FROM f
                 QUALIFY row_number() OVER (PARTITION BY day
                   ORDER BY ramp DESC, ts DESC) = 1)
          SELECT f.day, CAST(count(*) AS BIGINT) AS n_ramps,
            max(f.ramp) AS max_ramp, min(mx.max_ramp_ts) AS max_ramp_ts,
            CAST(count(*) FILTER (f.ramp > 3000) AS BIGINT) AS n_big_ramps
          FROM f JOIN mx USING (day)
          GROUP BY f.day ORDER BY f.day""".replaceAll("\\s+", " "),
    "q205_seasonality" ->
      """WITH cells AS (SELECT dayofweek(ts) + 1 AS weekday, hour(ts) AS hour,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / count(value) AS avg_value
            FROM events GROUP BY 1, 2),
          pk AS (SELECT weekday, hour AS peak_hour FROM cells
                 QUALIFY row_number() OVER (PARTITION BY weekday
                   ORDER BY avg_value DESC, hour DESC) = 1)
          SELECT c.weekday, CAST(c.hour AS INT) AS hour, c.n, c.avg_value,
            CAST(pk.peak_hour AS INT) AS peak_hour
          FROM cells c JOIN pk USING (weekday)
          ORDER BY weekday, hour""".replaceAll("\\s+", " "),
    "q190_freshness" ->
      """WITH g AS (SELECT max(ts) AS gmax FROM events),
          f AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
              max(ts) AS max_ts FROM events GROUP BY event_type)
          SELECT event_type, n_rows, max_ts,
            (epoch_us(g.gmax) - epoch_us(max_ts)) // 60000000 AS lag_minutes,
            (epoch_us(g.gmax) - epoch_us(max_ts)) // 60000000 > 60 AS stale
          FROM f, g ORDER BY event_type""".replaceAll("\\s+", " "),
    "q186_dead_letter" ->
      """WITH p AS (SELECT event_id, ts,
              CASE WHEN event_id % 97 = 0 THEN '' ELSE event_type END AS event_type,
              CASE WHEN event_id % 89 = 0 THEN 'NaN'::DOUBLE ELSE value END AS value
            FROM events),
          tagged AS (SELECT event_id,
              CASE WHEN length(event_type) = 0 THEN 'empty_type'
                   WHEN isnan(value) THEN 'nan_value'
                   WHEN ts IS NULL THEN 'null_ts'
                   ELSE 'ok' END AS dl_reason
            FROM p)
          SELECT dl_reason, CAST(count(*) AS BIGINT) AS n_rows,
            min(event_id) AS min_event_id
          FROM tagged GROUP BY dl_reason ORDER BY dl_reason""".replaceAll("\\s+", " "),
    "q217_merge_fp_delta" ->
      """WITH ex AS (SELECT event_id, user_id, event_type, value FROM events),
          inc AS (SELECT event_id, user_id, event_type, value * 3 AS value
                  FROM ex WHERE event_id % 100 = 0),
          aft AS (SELECT e.* FROM ex e
                    WHERE NOT EXISTS (SELECT 1 FROM inc i WHERE i.event_id = e.event_id)
                  UNION ALL SELECT * FROM inc),
          fpb AS (SELECT
              ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 64 AS bucket,
              bit_xor(('0x' || substr(md5(concat_ws('|', CAST(event_id AS VARCHAR),
                CAST(user_id AS VARCHAR), event_type,
                CAST(CAST(floor(value * 1e6) AS BIGINT) AS VARCHAR))), 1, 15))::BIGINT)
                AS fp_before
            FROM ex GROUP BY 1),
          fpa AS (SELECT
              ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 64 AS bucket,
              bit_xor(('0x' || substr(md5(concat_ws('|', CAST(event_id AS VARCHAR),
                CAST(user_id AS VARCHAR), event_type,
                CAST(CAST(floor(value * 1e6) AS BIGINT) AS VARCHAR))), 1, 15))::BIGINT)
                AS fp_after
            FROM aft GROUP BY 1),
          exp0 AS (SELECT CAST(count(DISTINCT
              ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 64)
              AS BIGINT) AS n_expected FROM inc),
          d AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets,
              CAST(count(*) FILTER (fp_before IS DISTINCT FROM fp_after) AS BIGINT)
                AS n_differing
            FROM fpb FULL OUTER JOIN fpa USING (bucket))
          SELECT d.n_buckets, d.n_differing, exp0.n_expected,
            d.n_differing = exp0.n_expected AS fp_delta_ok
          FROM d, exp0""".replaceAll("\\s+", " "),
    "q185_bucket_fingerprint" ->
      """WITH rows0 AS (SELECT event_id, user_id, event_type,
              CAST(floor(value * 1e6) AS BIGINT) AS vfp, value FROM events),
          canon AS (SELECT
              ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 64 AS bucket,
              ('0x' || substr(md5(
                 concat_ws('|', CAST(event_id AS VARCHAR), CAST(user_id AS VARCHAR),
                           event_type, CAST(vfp AS VARCHAR))), 1, 15))::BIGINT AS h,
              ('0x' || substr(md5(
                 concat_ws('|', CAST(event_id AS VARCHAR), CAST(user_id AS VARCHAR),
                           event_type, CAST(CAST(floor(
                             (CASE WHEN event_id = 4242 THEN value * 2 ELSE value END) * 1e6)
                             AS BIGINT) AS VARCHAR))), 1, 15))::BIGINT AS hm
            FROM rows0),
          g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
              bit_xor(h) AS fp,
              bit_xor(hm) AS fp_mut
            FROM canon GROUP BY bucket)
          SELECT bucket, n_rows, fp, fp_mut, fp IS DISTINCT FROM fp_mut AS differs
          FROM g ORDER BY bucket""".replaceAll("\\s+", " "),
    "q15_upsert" ->
      "WITH existing AS (SELECT event_id, user_id, event_type, value FROM events), incoming AS (SELECT event_id, user_id, event_type, value * 2 AS value FROM existing WHERE event_id % 10 = 0 UNION ALL SELECT event_id + 1000000, user_id, event_type, value FROM existing WHERE event_id < 50) SELECT * FROM (SELECT e.* FROM existing e WHERE NOT EXISTS (SELECT 1 FROM incoming i WHERE i.event_id = e.event_id) UNION ALL SELECT * FROM incoming) ORDER BY event_id",
    "q67_upsert_partitioned_sink" ->
      "WITH existing AS (SELECT event_id, user_id, event_type, value FROM events), incoming AS (SELECT event_id, user_id, event_type, value * 2 AS value FROM existing WHERE event_id % 10 = 0 UNION ALL SELECT event_id + 1000000, user_id, event_type, value FROM existing WHERE event_id < 50) SELECT * FROM (SELECT e.* FROM existing e WHERE NOT EXISTS (SELECT 1 FROM incoming i WHERE i.event_id = e.event_id) UNION ALL SELECT * FROM incoming) ORDER BY event_id",
    "q16_run_metrics" ->
      "SELECT count(*) AS total_fetched, max(event_id) AS last_fetched_id, min(ts) AS first_ts, max(ts) AS last_ts, count(CASE WHEN event_type = 'error' THEN 1 END) AS error_events FROM events"
  )
}
