package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Exact
import graft.operators.Analytics
import graft.sources.Tables

/** Join / grouped-agg / window analytics over the TPC-H-ish corpus
  * (SURVEY.md §7.4 — the engine surface beyond reference parity; the
  * reference has zero joins, §2.8).
  *
  * All double aggregation goes through [[graft.functions.Exact]] (decimal
  * accumulate → double) so values hash-match the DuckDB oracle regardless of
  * accumulation order; every query ORDER BYs a unique key set.
  */
object AnalyticsQueries {

  type Q = (SparkSession, String) => DataFrame

  /** DuckDB-side exact sum of a double expression, as double.
    * Scale 4 for money-magnitude columns (see [[graft.functions.Exact.dsum4]]),
    * scale 10 for small-magnitude ones.
    */
  private def dsum(sqlExpr: String, scale: Int = 4): String =
    s"CAST(sum(CAST(($sqlExpr) AS DECIMAL(30,$scale))) AS DOUBLE)"

  /** Sign-safe integer division (truncate-toward-zero on BOTH engines).
    * Spark `div` truncates toward zero while DuckDB `//` floors, so bare
    * division diverges on negative numerators (-7 div 2 = -3 vs
    * -7 // 2 = -4). Dividing MAGNITUDES and re-applying the sign makes
    * both engines compute sign(num)·(|num| div den) — the q235
    * convention, now shared by every ppm mean that could see a negative
    * sum. Emit with `div` for the Spark expr() side and `//` for the
    * oracle side. Denominator must be positive.
    */
  private def tzDiv(num: String, den: String, op: String): String =
    s"CASE WHEN ($num) < 0 THEN -((-($num)) $op ($den)) " +
      s"ELSE ($num) $op ($den) END"

  /** Drop a managed bucketed table AND its orphan warehouse files. A fresh
    * session's in-memory catalog doesn't know tables a PREVIOUS session
    * left in the warehouse dir, and saveAsTable refuses to adopt an
    * existing location — both the entry and the files must go (q240/q241).
    */
  private def dropBucketedTable(s: SparkSession, t: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $t")
    val wh = java.net.URI.create(s.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = java.nio.file.Paths.get(wh, t)
    if (java.nio.file.Files.exists(loc)) {
      // close the walk stream (it holds directory handles open)
      val st = java.nio.file.Files.walk(loc)
      try st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.delete(f))
      finally st.close()
    }
  }

  /** Land `df` as a managed bucketed+sorted table with ONE file per bucket
    * (repartition on the bucket key first — same murmur3 hash mod nb as
    * the bucket assignment, so each writer task owns exactly one bucket;
    * without it every writer emits a file per bucket it sees and the read
    * side must merge several sorted runs per bucket). ScaleProbe's
    * bktjoin family measures this discipline's payoff at 8×/16×/32×.
    */
  private def landBucketed(df: DataFrame, key: String, nb: Int, table: String): Unit =
    df.repartition(nb, col(key))
      .write.mode("overwrite").bucketBy(nb, key).sortBy(key)
      .saveAsTable(table)

  /** Land a bucketed table ONCE per session: if this session's catalog
    * already has `table` carrying a layout marker for the same content
    * tag (sfDir + key + bucket count — the frame derives deterministically
    * from the sf dir), the existing layout is read as-is, which is the
    * production shape: a landing is paid once and every downstream
    * consumer joins against it exchange-free (the r8 verdict's "read a
    * pre-built layout" point). A fresh session (no catalog entry) or a
    * different tag still drops and re-lands; the marker is a `_`-prefixed
    * file inside the table dir, invisible to parquet readers.
    */
  private def landBucketedOnce(
      s: SparkSession, df: => DataFrame, key: String, nb: Int,
      table: String, tag: String): Unit = {
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$tag|$key|$nb".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val wh = java.net.URI.create(s.conf.get("spark.sql.warehouse.dir")).getPath
    val marker = java.nio.file.Paths.get(wh, table, s"_graft_layout_$fp")
    if (s.catalog.tableExists(table) && java.nio.file.Files.exists(marker))
      return
    dropBucketedTable(s, table)
    landBucketed(df, key, nb, table)
    java.nio.file.Files.createFile(marker)
  }

  val queries: Map[String, Q] = Map(
    // Star join: fact `orders` ⋈ broadcast dims customer→nation→region.
    // At 100 TB the three dim joins stay broadcast; only the final groupBy
    // shuffles (5 regions → trivially small).
    "q17_star_join_revenue" -> ((s, dir) => {
      Tables.orders(s, dir)
        .join(Analytics.dim(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .join(Analytics.dim(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .join(Analytics.dim(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          count(lit(1)).as("n_orders"),
          Exact.dsum4(col("o_totalprice")).as("revenue"))
        .orderBy("r_name")
    }),
    // Fact ⋈ fact: lineitem ⋈ orders — sort-merge on orderkey, AQE handles
    // skew/coalesce; revenue = extendedprice*(1-discount) per TPC-H.
    "q18_fact_join_priority" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_lines"),
          Exact.dsumProduct(col("l_extendedprice"), lit(1.0) - col("l_discount"))
            .as("revenue"))
        .orderBy("o_orderpriority")
    }),
    // q18 over the BUCKETED layout — the storage-partitioned join SCALE.md
    // names as the 100 TB fact⋈fact plan, proven end-to-end at every run:
    // both facts land bucketed+sorted on the join key (8 buckets at test
    // SF; thousands on a cluster), the join is forced to sort-merge (the
    // only strategy that exists at 100 TB where neither fact broadcasts),
    // and a runtime require() on the executed plan FAILS the query if ANY
    // Exchange appears — scan-to-join with zero shuffles on either side is
    // asserted, not assumed. The landing write is the honest one-time cost
    // of the layout: paid on the session's FIRST run, read as a pre-built
    // layout after (landBucketedOnce — the production amortization shape;
    // ScaleProbe's bktjoin family prices the landing separately); values
    // replay q18's oracle semantics, plus the exchange_free contract
    // column the plan assertion backs.
    "q240_bucketed_fact_join" -> ((s, dir) => {
      val nb = 8
      landBucketedOnce(s, Tables.lineitem(s, dir)
        .select("l_orderkey", "l_extendedprice", "l_discount"),
        "l_orderkey", nb, "graft_bkt_lineitem", dir)
      landBucketedOnce(s, Tables.orders(s, dir)
        .select("o_orderkey", "o_orderpriority"),
        "o_orderkey", nb, "graft_bkt_orders", dir)
      val joined = s.table("graft_bkt_lineitem").hint("merge")
        .join(s.table("graft_bkt_orders"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      require(plan.contains("SortMergeJoin"),
        s"bucketed fact join must sort-merge, got:\n$plan")
      require(!plan.contains("Exchange"),
        s"bucketed layout must elide every exchange, got:\n$plan")
      joined
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_lines"),
          Exact.dsumProduct(col("l_extendedprice"), lit(1.0) - col("l_discount"))
            .as("revenue"))
        .withColumn("exchange_free", lit(true))
        .orderBy("o_orderpriority")
    }),
    // q240's layout exercised DOWNSTREAM — the release-pipeline composition
    // the storage-partitioned join exists for: the release MANIFEST
    // (doc_id, split, token budget — q96's assignment convention) and the
    // content-stats fact (doc_id, chars, 60-bit content fingerprint) land
    // as SEPARATE doc_id-bucketed tables (the shape a release actually
    // ships: decisions and content metadata are produced by different
    // stages and consumed together by every training job), then re-join
    // scan-to-merge with ZERO Exchange require()d at runtime, rolling up
    // the per-split training-mix card: doc/token/char totals plus the
    // xor content fingerprint (q185's int64-closed convention) a consumer
    // re-derives to prove it read exactly the released bytes. At 100 TB
    // the manifest⋈content join runs once per training job — the landing
    // is paid once per session (landBucketedOnce; re-runs read the
    // pre-built layout), every consumer joins exchange-free (ScaleProbe
    // bktjoin: breakeven ≈ 4-7 joins at probe scale, falling with size).
    "q241_bucketed_release_join" -> ((s, dir) => {
      val nb = 8
      val docs = Tables.documents(s, dir)
      landBucketedOnce(s, docs.select(col("doc_id"),
          size(graft.functions.Text.tokens(col("text"))).cast("long").as("n_tokens"),
          graft.operators.Sampling.assignSplit(col("doc_id"),
            Seq("train" -> 0.90, "val" -> 0.05), last = "test").as("split")),
        "doc_id", nb, "graft_bkt_manifest", dir)
      landBucketedOnce(s, docs.select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"),
          conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("fp60")),
        "doc_id", nb, "graft_bkt_docstats", dir)
      val joined = s.table("graft_bkt_manifest").hint("merge")
        .join(s.table("graft_bkt_docstats"), Seq("doc_id"))
      val plan = joined.queryExecution.executedPlan.toString
      require(plan.contains("SortMergeJoin"),
        s"bucketed release join must sort-merge, got:\n$plan")
      require(!plan.contains("Exchange"),
        s"bucketed release layout must elide every exchange, got:\n$plan")
      joined.groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"),
          expr("bit_xor(fp60)").as("content_fp"))
        .withColumn("exchange_free", lit(true))
        .orderBy("split")
    }),
    // TPC-H Q1 pricing summary: single-table groupBy with partial (map-side)
    // aggregation; the shuffle moves only 6 groups × accumulators.
    "q19_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Exact.dsum4(col("l_quantity")).as("sum_qty"),
          Exact.dsum4(col("l_extendedprice")).as("sum_base_price"),
          Exact.dsumProduct(col("l_extendedprice"), lit(1.0) - col("l_discount"))
            .as("sum_disc_price"),
          Exact.davg(col("l_quantity")).as("avg_qty"),
          Exact.davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    // Distinct-agg: distinct ordering customers per market segment.
    // countDistinct = two-phase shuffle (expand + agg); fine at scale since
    // cardinality ≤ |customer|; approx_count_distinct is offered in
    // Analytics for the 100 TB path but exactness is needed for the oracle.
    "q20_distinct_customers" -> ((s, dir) => {
      Tables.orders(s, dir)
        .join(Analytics.dim(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    }),
    // Top-k per group: 3 highest-value orders per priority, deterministic
    // tiebreak on orderkey. Window row_number ≤ k idiom — one shuffle.
    "q21_topk_orders" -> ((s, dir) => {
      Analytics.topKPerGroup(
        Tables.orders(s, dir),
        Seq("o_orderpriority"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        k = 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "o_orderkey")
    }),
    // Same top-k-per-group semantics through the CUSTOM Catalyst operator
    // (TopKPerGroupPlan → partial/final bounded-heap execs): identical
    // rows to the window idiom, but the exchange carries groups×k rows
    // instead of the whole orders table. Hash-checked against the same
    // row_number oracle as q21.
    "q94_topk_native" -> ((s, dir) => {
      Analytics.topKPerGroupNative(
        Tables.orders(s, dir)
          .select("o_orderpriority", "o_orderkey", "o_totalprice"),
        Seq("o_orderpriority"),
        Seq(("o_totalprice", true), ("o_orderkey", false)),
        k = 3)
        .orderBy("o_orderpriority", "o_orderkey")
    }),
    // Semi/anti join: per nation, customers with vs without orders.
    // Both branches broadcast the *bucketed key set*? No — at scale the
    // orders side is huge, so semi/anti shuffle on custkey; the nation dim
    // joins stay broadcast. Exercises left_semi + left_anti physical plans.
    "q22_semi_anti_customers" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val orders = Tables.orders(s, dir).select("o_custkey")
      val nation = Analytics.dim(Tables.nation(s, dir))
      val withO = cust.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_nationkey").agg(count(lit(1)).as("with_orders"))
      val withoutO = cust.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey").agg(count(lit(1)).as("without_orders"))
      nation
        .join(withO, col("n_nationkey") === withO("c_nationkey"), "left")
        .drop("c_nationkey")
        .join(withoutO, col("n_nationkey") === withoutO("c_nationkey"), "left")
        .select(col("n_name"),
          coalesce(col("with_orders"), lit(0L)).as("with_orders"),
          coalesce(col("without_orders"), lit(0L)).as("without_orders"))
        .orderBy("n_name")
    }),
    // Gap-based sessionization (30-min gap): lag window → cumulative sum →
    // per-user session stats. Single shuffle on user_id shared by both
    // windows and the final groupBy (same partitioning — no re-exchange).
    "q23_sessionize" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("event_id", "ts", "user_id")
      Analytics.sessionize(ev, "user_id", "ts", "event_id", gapSeconds = 1800L)
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          (max(col("session_id")) + 1).as("n_sessions"))
        .orderBy("user_id")
    }),
    // Tumbling 1-hour counts per event type (stream-shaped agg at rest).
    "q24_tumbling_counts" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(
          date_trunc("hour", col("ts")).cast("timestamp_ntz").as("bucket"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          Exact.dsum(col("value")).as("sum_value"))
        .orderBy("bucket", "event_type")
    }),
    // Rollup region → nation over customer account balances; grouping_id
    // (`lvl`) disambiguates subtotal rows and makes ordering deterministic.
    "q25_rollup_balance" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(Analytics.dim(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .join(Analytics.dim(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          Exact.dsum4(col("c_acctbal")).as("total_balance"),
          grouping_id(col("r_name"), col("n_name")).cast("int").as("lvl"))
        .orderBy(col("lvl"), col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),
    // SCD2 dimension history from the orders changelog: each customer's
    // status timeline collapsed into [valid_from, valid_to) segments with
    // version numbers and the open current row — the history-keeping twin
    // of the upsert sink's keep-latest (and the dimension side an as-of
    // join consumes). Two window passes over ONE per-key exchange; no
    // global sort.
    "q163_scd2_history" -> ((s, dir) => {
      graft.operators.Scd.scd2(
        Tables.orders(s, dir).select("o_custkey", "o_orderdate", "o_orderkey", "o_orderstatus"),
        key = "o_custkey", ts = "o_orderdate", tieBreak = "o_orderkey",
        state = "o_orderstatus")
        .orderBy("o_custkey", "version")
    }),
    // Point-in-time join against the q163 SCD2 history: every lineitem
    // reads its customer's order-status AS OF its ship date (left join —
    // facts predating the first version keep NULL state). The interval
    // predicate rides inside a key-equi join, so each fact meets only its
    // key's few version rows; cardinality is provably preserved and the
    // hash gate checks it.
    "q183_pit_join" -> ((s, dir) => {
      val hist = graft.operators.Scd.scd2(
        Tables.orders(s, dir).select("o_custkey", "o_orderdate", "o_orderkey", "o_orderstatus"),
        key = "o_custkey", ts = "o_orderdate", tieBreak = "o_orderkey",
        state = "o_orderstatus")
      val fact = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "o_custkey", "l_shipdate")
      graft.operators.Scd.pitJoin(fact, "o_custkey", "l_shipdate", hist, "o_custkey")
        .orderBy("l_orderkey", "l_linenumber")
    }),
    // TPC-H Q3 shipping priority: 3-way join, filter both fact sides, group
    // by order, top 10 by revenue. Dim filter (mktsegment) broadcast-pruned;
    // lineitem⋈orders sort-merge; final top-k is a single-partition sort of
    // an already-aggregated (small) result.
    "q26_shipping_priority" -> ((s, dir) => {
      val cust = Analytics.dim(
        Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING"))
      val cutoff = lit("1998-01-01").cast("timestamp_ntz")
      val orders = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
      val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(Exact.dsumProduct(col("l_extendedprice"), lit(1.0) - col("l_discount"))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),
    // Daily-bucket anomaly flags: |x − μ| > 2σ over the bucket means,
    // decided ENTIRELY in integer arithmetic — means floor-quantized to a
    // 1e4 grid, then (n·x − S)² > 4(nQ − S²) (the z-test cross-multiplied
    // so no division or sqrt exists to differ between engines). The
    // 30-row stats frame broadcasts back; one pass over buckets.
    // Denormalized order documents: lineitems nested per order
    // (collect_list → sort_array for a canonical item order), then the
    // per-order stats computed FROM THE ARRAY with higher-order
    // functions — decimal-accumulator `aggregate` for revenue (exact,
    // order-independent) and a struct array_max for the priciest line.
    // The oracle computes the same numbers relationally, so the hash
    // gate proves nested == flat — the pre-joined document layout a
    // 100 TB serving store materializes to avoid re-shuffling joins.
    "q206_nested_orders" -> ((s, dir) => {
      val nested = Tables.lineitem(s, dir)
        .select(col("l_orderkey"),
          struct(col("l_linenumber").as("ln"), col("l_extendedprice").as("price"),
            col("l_discount").as("disc")).as("item"))
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("item"))).as("items"))
      nested.select(col("l_orderkey"),
        size(col("items")).as("n_items"),
        expr("""CAST(aggregate(items, CAST(0 AS DECIMAL(30,4)),
                 (acc, x) -> CAST(acc + CAST(x.price * (1.0 - x.disc) AS DECIMAL(30,4))
                             AS DECIMAL(30,4))) AS DOUBLE)""").as("revenue"),
        expr("array_max(transform(items, x -> struct(x.price, x.ln))).ln").as("max_price_ln"))
        .orderBy("l_orderkey")
    }),
    // First-order behavior model: per-user event-type TRANSITION counts
    // (lead over each user's time-ordered stream) with per-source-state
    // totals — the Markov transition matrix as exact integer rationals
    // (n / from_total), the base model behind next-event prediction and
    // funnel-drop diagnostics. One per-user window + one small groupBy;
    // user partitions stay bounded at any corpus size.
    "q199_event_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("from_total",
          sum(col("n")).over(Window.partitionBy(col("from_type"))))
        .orderBy("from_type", "to_type")
    }),
    // Ingestion-order lateness audit: an event is LATE if some
    // earlier-ingested event of its day (smaller event_id) already
    // carried a later event time — the out-of-order rate that decides a
    // streaming watermark delay and a batch keep-last dedup horizon.
    // Running max over a per-day window ordered by ingest id; per-day
    // partitions stay bounded at any corpus size.
    "q194_late_arrivals" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("day")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .withColumn("day", to_date(col("ts")))
        .withColumn("__runmax", max(col("ts")).over(w))
        .withColumn("__late", col("__runmax").isNotNull && col("ts") < col("__runmax"))
        .groupBy("day")
        .agg(count(lit(1)).as("n_rows"), count_if(col("__late")).as("n_late"))
        .withColumn("late_rate", col("n_late").cast("double") / col("n_rows"))
        .orderBy("day")
    }),
    // Session basket analysis: which event types CO-OCCUR within one
    // user session, with lift as the exact rational
    // (supp_ab·n_sessions)/(supp_a·supp_b) — lift > 1 means the pair
    // appears together more than independence predicts, the association
    // signal behind next-action suggestions. Distinct (session, type)
    // rows first, so the pair join is bounded by types-per-session,
    // never raw events.
    "q218_session_baskets" -> ((s, dir) => {
      val sess = Analytics.sessionize(
        Tables.events(s, dir), "user_id", "ts", "event_id", gapSeconds = 1800L)
        .select(col("user_id"), col("session_id"), col("event_type")).distinct()
      val nSess = sess.select("user_id", "session_id").distinct()
        .agg(count(lit(1)).as("n_sessions"))
      val supp = sess.groupBy("event_type").agg(count(lit(1)).as("supp"))
      sess.as("a").join(sess.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.session_id") === col("b.session_id") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("supp_ab"))
        .join(broadcast(supp.select(col("event_type").as("type_a"), col("supp").as("supp_a"))), "type_a")
        .join(broadcast(supp.select(col("event_type").as("type_b"), col("supp").as("supp_b"))), "type_b")
        .crossJoin(broadcast(nSess))
        .select(col("type_a"), col("type_b"), col("supp_ab"), col("supp_a"), col("supp_b"),
          (col("supp_ab") * col("n_sessions")).as("lift_num"),
          (col("supp_a") * col("supp_b")).as("lift_den"))
        .orderBy("type_a", "type_b")
    }),
    // Daily quantile bands: rank-exact p10/p50/p90 of value per day
    // (lower quantile at rank ⌈q·n/100⌉ — picked VALUES, never
    // interpolated, so the bands hash cross-engine where approx
    // percentiles can't). Per-day windows stay bounded at any corpus
    // size; the band table is the volatility-envelope chart every
    // monitoring dashboard draws.
    "q214_daily_bands" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ranked = Tables.events(s, dir)
        .select(to_date(col("ts")).as("day"), col("value"), col("event_id"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("day").orderBy(col("value"), col("event_id"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("day")))
      ranked.groupBy("day")
        .agg(max(col("n")).as("n_rows"),
          min(when(col("rn") === expr("(10 * n + 99) div 100"), col("value"))).as("p10"),
          min(when(col("rn") === expr("(50 * n + 99) div 100"), col("value"))).as("p50"),
          min(when(col("rn") === expr("(90 * n + 99) div 100"), col("value"))).as("p90"))
        .orderBy("day")
    }),
    // Sequential pattern mining, the depth-3 special case: top-20 most
    // frequent 3-step event-type paths across user streams (two lead()
    // taps on the per-user time-ordered window — no self-joins, no
    // explosion beyond one row per step). The funnel (q130) asks about
    // ONE prescribed path; this surfaces which paths exist. Ties break
    // lexicographically so the top-k is deterministic.
    "q233_path_mining" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").cast("timestamp").as("ts"))
        .withColumn("t1", lead(col("event_type"), 1).over(w))
        .withColumn("t2", lead(col("event_type"), 2).over(w))
        .filter(col("t1").isNotNull && col("t2").isNotNull)
        .select(concat_ws(">", col("event_type"), col("t1"), col("t2")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path").asc).limit(20)
    }),
    // Trimmed mean per event type (robust location next to q187's
    // median/MAD): drop the exact bottom and top 5% BY RANK, computed on
    // the aggregated VALUE DOMAIN — per-value counts, one bounded
    // prefix-sum window per group, and each value row contributes
    // |[cum−c, cum] ∩ (t, n−t]| rows via clamp arithmetic — so raw rows
    // are never ranked individually and ties at the cut are handled
    // exactly. All int64 cents.
    "q234_trimmed_mean" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables.events(s, dir)
        .select(col("event_type"), floor(col("value") * 100).cast("long").as("v"))
      val bv = d.groupBy("event_type", "v").agg(count(lit(1)).as("c"))
      val st = bv
        .withColumn("cum", sum(col("c")).over(
          Window.partitionBy("event_type").orderBy("v")))
        .withColumn("n", sum(col("c")).over(Window.partitionBy("event_type")))
        .withColumn("t", expr("(n * 5) div 100"))
        .withColumn("kept", greatest(lit(0L),
          least(col("cum"), col("n") - col("t"))
            - greatest(col("cum") - col("c"), col("t"))))
      st.groupBy("event_type")
        .agg(max(col("n")).as("n"), max(col("t")).as("n_trim_each"),
          sum(col("kept")).as("n_kept"),
          sum(col("kept") * col("v")).as("kept_sum_c"))
        .withColumn("trimmed_mean_ppm",
          expr(tzDiv("kept_sum_c * 1000000", "n_kept", "div")))
        .orderBy("event_type")
    }),
    // Theil–Sen slope per event-type series (robust trend next to q222's
    // level shift): the median over all pairwise day-slopes — immune to
    // the outlier days that pull a least-squares fit (q175/q179's
    // family). Slopes quantize to sign-safe ppm BEFORE ranking (identical
    // int in both engines, so the argmin/median agree bit-for-bit);
    // pairs are day²-bounded per series after daily pre-aggregation.
    "q235_theil_sen" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(floor(col("value")).cast("long")).as("y"))
        .withColumn("x", datediff(col("day"), lit("2024-01-01").cast("date")).cast("long"))
      val p = daily.select(col("event_type"), col("x").as("xa"), col("y").as("ya"))
        .join(daily.select(col("event_type"), col("x").as("xb"), col("y").as("yb")),
          Seq("event_type"))
        .filter(col("xa") < col("xb"))
        .withColumn("num", col("yb") - col("ya"))
        .withColumn("den", col("xb") - col("xa"))
        .withColumn("slope_ppm",
          expr("CASE WHEN num < 0 THEN -(((-num) * 1000000) div den)" +
            " ELSE (num * 1000000) div den END"))
      p.withColumn("np", count(lit(1)).over(Window.partitionBy("event_type")))
        .withColumn("r", row_number().over(Window.partitionBy("event_type")
          .orderBy(col("slope_ppm"), col("num"), col("den"))))
        .filter(col("r") === expr("(np + 1) div 2"))
        .select(col("event_type"), col("np").as("n_pairs"),
          col("slope_ppm").as("med_slope_ppm"),
          col("num").as("med_num"), col("den").as("med_den"))
        .orderBy("event_type")
    }),
    // Deterministic bootstrap CI for total purchase revenue (Efron 1979,
    // engine-reproducible): B=32 resample replicates whose draws are
    // md5-uniform indices — j = H32(b:i) mod n — so both engines build
    // IDENTICAL replicates; replicate sums are exact cents, and the CI
    // bounds are rank-exact picks from the 32 replicate values (min /
    // 2nd / median / 31st / max). The 100 TB note: the index-join
    // formulation needs a global row_number over the measured subset
    // (bounded here — purchases only); at corpus scale the same md5
    // device drives a POISSON bootstrap (per-row deterministic weights,
    // no global index, one pass), which this query's replicate table is
    // the audit for.
    "q228_bootstrap_ci" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val B = 32
      val x = Tables.events(s, dir).filter(col("event_type") === "purchase")
        .select(col("event_id"), floor(col("value") * 100).cast("long").as("cents"))
        .withColumn("idx", row_number().over(Window.orderBy("event_id")) - 1)
      val n = x.agg(count(lit(1)).as("nn"))
      val draws = x.select(col("idx").as("i"))
        .crossJoin(broadcast(n))
        .select(col("i"), col("nn"),
          explode(sequence(lit(0), lit(B - 1))).as("b"))
        .withColumn("j", conv(substring(md5(concat(
            col("b").cast("string"), lit(":"), col("i").cast("string"))), 1, 8),
          16, 10).cast("long") % col("nn"))
      val reps = draws.join(x.select(col("idx").as("j"), col("cents")), "j")
        .groupBy("b").agg(sum(col("cents")).as("rep_sum"))
      val ranked = reps.withColumn("r",
        row_number().over(Window.orderBy(col("rep_sum"), col("b"))))
      def pick(r: Int, name: String) =
        broadcast(ranked.filter(col("r") === r).select(col("rep_sum").as(name)))
      x.agg(count(lit(1)).as("n"), sum(col("cents")).as("obs_sum_c"))
        .crossJoin(pick(1, "rep_min"))
        .crossJoin(pick(2, "rep_lo"))
        .crossJoin(pick(16, "rep_med"))
        .crossJoin(pick(31, "rep_hi"))
        .crossJoin(pick(B, "rep_max"))
    }),
    // Marketing attribution, first-touch vs last-touch side by side: each
    // purchase credits (a) the user's most recent PRIOR click's channel
    // (conditional last_value IGNORE NULLS over the user's time-ordered
    // stream — the as-of lookup as one window pass, no self-join) and
    // (b) the user's first click ever; channels derive deterministically
    // from the event props payload. Per-user windows parallelize across
    // users at any scale; purchases with no prior click land in 'none'.
    "q229_attribution" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").cast("timestamp").as("ts"),
          floor(col("value") * 100).cast("long").as("cents"),
          concat(lit("ch"), (regexp_extract(col("props"), "([0-9]+)", 1)
            .cast("long") % 5).cast("string")).as("ch"))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val withLast = ev.withColumn("last_click_ch",
        last(when(col("event_type") === "click", col("ch")), ignoreNulls = true).over(w))
      val fc = ev.filter(col("event_type") === "click")
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("ch").as("first_click_ch"))
      val pur = withLast.filter(col("event_type") === "purchase")
        .join(fc, Seq("user_id"), "left")
        .select(col("cents"),
          coalesce(col("last_click_ch"), lit("none")).as("last_touch"),
          coalesce(col("first_click_ch"), lit("none")).as("first_touch"))
      pur.groupBy(col("last_touch").as("channel"))
        .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("value_c"))
        .select(lit("last_touch").as("model"), col("channel"),
          col("n_purchases"), col("value_c"))
        .unionByName(pur.groupBy(col("first_touch").as("channel"))
          .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("value_c"))
          .select(lit("first_touch").as("model"), col("channel"),
            col("n_purchases"), col("value_c")))
        .orderBy("model", "channel")
    }),
    // Exact Mann–Whitney U per source (each source's doc-length
    // distribution vs the rest of the corpus): the nonparametric
    // distribution-shift test behind "is src7 sending different content",
    // exact where a z-approximation needn't be. Rank arithmetic runs on
    // the AGGREGATED VALUE DOMAIN, never raw rows: per-value counts, one
    // prefix-sum window over the bounded distinct-value table (doubled
    // average ranks stay integer under ties), then per-(source, value)
    // counts join the value table — so corpus size only enters through
    // two map-side-combined aggregations. Emits doubled rank sums,
    // U·2, E[U]·2 = n₁·n₂, and the tie-correction term Σ(t³−t) for a
    // downstream variance — all exact int64.
    "q225_mann_whitney" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir)
        .select(col("source"), col("n_chars").cast("long").as("v"))
      val byVal = d.groupBy("v").agg(count(lit(1)).as("c"))
      // bounded-domain window: rows = distinct lengths, not docs
      val valstats = byVal
        .withColumn("cum", sum(col("c")).over(Window.orderBy("v")))
        .withColumn("avg2", lit(2L) * (col("cum") - col("c") + 1) + col("c") - 1)
      val bySrcVal = d.groupBy("source", "v").agg(count(lit(1)).as("sc"))
      val tot = d.agg(count(lit(1)).as("nn"))
      val ties = byVal.agg(
        sum(col("c") * col("c") * col("c") - col("c")).as("tie_sum"))
      bySrcVal.join(valstats.select("v", "avg2"), "v")
        .groupBy("source")
        .agg(sum(col("sc")).as("n"),
          sum(col("sc") * col("avg2")).as("rank_sum_x2"))
        .crossJoin(broadcast(tot))
        .crossJoin(broadcast(ties))
        .select(col("source"), col("n"), col("rank_sum_x2"),
          (col("rank_sum_x2") - col("n") * (col("n") + 1)).as("u_x2"),
          (col("n") * (col("nn") - col("n"))).as("eu_x2"),
          col("tie_sum"))
        .orderBy("source")
    }),
    // Optimal single changepoint per event-type series — the first step
    // of binary segmentation (Scott & Knott 1974 shape), EXACT: for every
    // split t the between-segment score (S_L·n_R − S_R·n_L)²/(n_L·n_R)
    // (maximizing it minimizes total within-segment SSE for one split) is
    // computed from per-series prefix sums — one partitioned window pass,
    // no per-split rescan — in pure int64 on whole currency units, argmax
    // by (score, earliest day). Per-series windows parallelize across
    // series at any corpus size; the daily pre-aggregation bounds window
    // rows at days-per-series. Complements q187 (point anomalies) and
    // q209 (distribution drift) with LEVEL-SHIFT detection.
    "q222_changepoint" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(floor(col("value")).cast("long")).as("x"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val pre = daily
        .withColumn("t", row_number().over(w))
        .withColumn("sl", sum(col("x")).over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        .withColumn("st", sum(col("x")).over(Window.partitionBy("event_type")))
      pre.filter(col("t") < col("n"))
        .withColumn("a",
          col("sl") * (col("n") - col("t")) - (col("st") - col("sl")) * col("t"))
        .withColumn("score_q", expr("(a * a) div (t * (n - t))"))
        .withColumn("rn", row_number().over(Window.partitionBy("event_type")
          .orderBy(col("score_q").desc, col("day").asc)))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("day").as("cp_day"), col("n").as("n_days"),
          col("t").as("n_left"), (col("n") - col("t")).as("n_right"),
          col("sl").as("sum_left"), (col("st") - col("sl")).as("sum_right"),
          col("score_q"),
          expr(tzDiv("sl * 1000000", "t", "div")).as("mean_left_ppm"),
          expr(tzDiv("(st - sl) * 1000000", "n - t", "div")).as("mean_right_ppm"))
        .orderBy("event_type")
    }),
    // Robust anomaly detection: q123's mean/σ rule breaks when the
    // anomaly itself inflates σ (masking); the median/MAD rule doesn't.
    // Lower median + lower median of absolute deviations, both RANK-exact
    // (row_number over the day-cardinality aggregated frame — bounded
    // post-aggregation, never raw events), flag |x − med| > 3·MAD, all
    // int64 on the 10⁻⁴ grid.
    "q187_mad_anomaly" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val x = Tables.events(s, dir)
        .groupBy(graft.operators.Resample.bucketStart(col("ts"), "1d")
          .cast("timestamp_ntz").as("bucket"))
        .agg(Exact.davg(col("value")).as("avg_value"))
        .withColumn("xfp", floor(col("avg_value") * 1e4).cast("long"))
      def lowerMedian(df: DataFrame, v: String): DataFrame = {
        val w = Window.orderBy(col(v), col("bucket"))
        df.withColumn("__rn", row_number().over(w))
          .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
          .filter(col("__rn") === expr("(__n + 1) div 2"))
          .select(col(v).as(s"med_$v"))
      }
      val med = lowerMedian(x, "xfp")
      val dev = x.crossJoin(broadcast(med))
        .withColumn("dev", abs(col("xfp") - col("med_xfp")))
      val mad = lowerMedian(dev, "dev")
      dev.crossJoin(broadcast(mad))
        .withColumn("is_anomaly", col("dev") > lit(3L) * col("med_dev"))
        .select("bucket", "avg_value", "dev", "is_anomaly")
        .orderBy("bucket")
    }),
    "q123_bucket_anomaly" -> ((s, dir) => {
      val b = Tables.events(s, dir)
        .groupBy(graft.operators.Resample.bucketStart(col("ts"), "1d")
          .cast("timestamp_ntz").as("bucket"))
        .agg(Exact.davg(col("value")).as("avg_value"))
      val x = b.withColumn("xfp", floor(col("avg_value") * 1e4).cast("long"))
      val stats = x.agg(count(lit(1)).as("n"), sum("xfp").as("s"),
        sum(col("xfp") * col("xfp")).as("q"))
      val dev = col("n") * col("xfp") - col("s")
      x.crossJoin(broadcast(stats))
        .withColumn("is_anomaly",
          dev * dev > lit(4L) * (col("n") * col("q") - col("s") * col("s")))
        .select("bucket", "avg_value", "is_anomaly")
        .orderBy("bucket")
    }),
    // Growth curve: daily active users, new users, and CUMULATIVE unique
    // users — the running distinct computed as a running sum of first-seen
    // flags (a windowed count-distinct does not exist; first-seen does).
    // The single-partition window runs over day-cardinality rows POST-
    // aggregation (~30 here, bounded at any scale), never raw events.
    "q128_user_growth" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), to_date(col("ts")).as("d"))
      val newPerDay = ev.groupBy("user_id").agg(min("d").as("d"))
        .groupBy("d").agg(count(lit(1)).as("n_new"))
      val activePerDay = ev.groupBy("d").agg(countDistinct("user_id").as("n_active"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("d")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      activePerDay.join(newPerDay, Seq("d"), "left")
        .na.fill(0L, Seq("n_new"))
        .withColumn("cum_users", sum("n_new").over(w))
        .select("d", "n_active", "n_new", "cum_users")
        .orderBy("d")
    }),
    // Strict-order funnel conversion with a 24-hour window per stage:
    // first 'view' -> 'click' within a day -> 'purchase' within a day
    // of that click; each stage anchors on the previous stage's
    // FIRST qualifying time (the product-analytics funnel — order- and
    // deadline-sensitive, not mere co-occurrence). Three map-side-
    // combined min aggs + user_id-sharded joins; timestamp arithmetic
    // and comparisons are exact at microsecond precision in both
    // engines.
    "q130_event_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("user_id", "event_type", "ts")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t_view"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts") > col("t_view") &&
          col("ts") <= col("t_view") + expr("INTERVAL 24 HOURS"))
        .groupBy("user_id").agg(min("ts").as("t_click"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts") > col("t_click") &&
          col("ts") <= col("t_click") + expr("INTERVAL 24 HOURS"))
        .groupBy("user_id").agg(min("ts").as("t_purchase"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_full_funnel")))
    }),
    // Cohort retention matrix: users bucketed by first-seen day, distinct
    // active users per (cohort, day offset) — integer-exact. First-seen is
    // one map-side-combined min; the join back shards on user_id.
    "q124_cohort_retention" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), to_date(col("ts")).as("d"))
      val first = ev.groupBy("user_id").agg(min("d").as("cohort_day"))
      ev.join(first, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("d"), col("cohort_day")).cast("long").as("day_offset"))
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_day", "day_offset")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q163_scd2_history" ->
      """WITH ch AS (SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus,
            lag(o_orderstatus) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev,
            row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders),
          seg AS (SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus FROM ch
                  WHERE rn = 1 OR prev IS DISTINCT FROM o_orderstatus),
          hist AS (SELECT o_custkey,
            CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS version,
            o_orderstatus AS state, o_orderdate AS valid_from,
            lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to
          FROM seg)
          SELECT o_custkey, version, state, valid_from, valid_to,
                 (valid_to IS NULL) AS is_current
          FROM hist ORDER BY o_custkey, version""".replaceAll("\\s+", " "),
    "q183_pit_join" ->
      """WITH ch AS (SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus,
            lag(o_orderstatus) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev,
            row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders),
          seg AS (SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus FROM ch
                  WHERE rn = 1 OR prev IS DISTINCT FROM o_orderstatus),
          hist AS (SELECT o_custkey,
            CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS version,
            o_orderstatus AS state, o_orderdate AS valid_from,
            lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to
          FROM seg),
          fact AS (SELECT l_orderkey, l_linenumber, o_custkey, l_shipdate
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
          SELECT f.l_orderkey, f.l_linenumber, f.o_custkey, f.l_shipdate,
                 h.version, h.state
          FROM fact f LEFT JOIN hist h
            ON h.o_custkey = f.o_custkey AND h.valid_from <= f.l_shipdate
            AND (h.valid_to IS NULL OR f.l_shipdate < h.valid_to)
          ORDER BY l_orderkey, l_linenumber""".replaceAll("\\s+", " "),
    "q206_nested_orders" ->
      """WITH mx AS (SELECT l_orderkey, l_linenumber AS max_price_ln FROM lineitem
                     QUALIFY row_number() OVER (PARTITION BY l_orderkey
                       ORDER BY l_extendedprice DESC, l_linenumber DESC) = 1),
          ag AS (SELECT l_orderkey, CAST(count(*) AS INT) AS n_items,
              CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,4))) AS DOUBLE)
                AS revenue
            FROM lineitem GROUP BY l_orderkey)
          SELECT ag.l_orderkey, ag.n_items, ag.revenue, mx.max_price_ln
          FROM ag JOIN mx USING (l_orderkey)
          ORDER BY l_orderkey""".replaceAll("\\s+", " "),
    "q199_event_transitions" ->
      """WITH t AS (SELECT user_id, event_type,
              lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
            FROM events),
          g AS (SELECT event_type AS from_type, next_type AS to_type,
              CAST(count(*) AS BIGINT) AS n
            FROM t WHERE next_type IS NOT NULL GROUP BY 1, 2)
          SELECT from_type, to_type, n,
            CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS from_total
          FROM g ORDER BY from_type, to_type""".replaceAll("\\s+", " "),
    "q194_late_arrivals" ->
      """WITH e AS (SELECT event_id, ts, CAST(ts AS DATE) AS day FROM events),
          r AS (SELECT day, ts, max(ts) OVER (PARTITION BY day ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax
                FROM e)
          SELECT day, CAST(count(*) AS BIGINT) AS n_rows,
            CAST(count(*) FILTER (runmax IS NOT NULL AND ts < runmax) AS BIGINT) AS n_late,
            CAST(count(*) FILTER (runmax IS NOT NULL AND ts < runmax) AS DOUBLE)
              / count(*) AS late_rate
          FROM r GROUP BY day ORDER BY day""".replaceAll("\\s+", " "),
    "q218_session_baskets" ->
      """WITH g AS (SELECT user_id, event_type, ts, event_id,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          sid AS (SELECT user_id, event_type,
              sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) - 1 AS session_id
            FROM g),
          st AS (SELECT DISTINCT user_id, session_id, event_type FROM sid),
          ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions FROM
                   (SELECT DISTINCT user_id, session_id FROM st)),
          sup AS (SELECT event_type, CAST(count(*) AS BIGINT) AS supp FROM st GROUP BY 1),
          p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
              CAST(count(*) AS BIGINT) AS supp_ab
            FROM st a JOIN st b ON a.user_id = b.user_id
              AND a.session_id = b.session_id AND a.event_type < b.event_type
            GROUP BY 1, 2)
          SELECT p.type_a, p.type_b, p.supp_ab, sa.supp AS supp_a, sb.supp AS supp_b,
            p.supp_ab * ns.n_sessions AS lift_num,
            sa.supp * sb.supp AS lift_den
          FROM p JOIN sup sa ON sa.event_type = p.type_a
          JOIN sup sb ON sb.event_type = p.type_b CROSS JOIN ns
          ORDER BY type_a, type_b""".replaceAll("\\s+", " "),
    "q233_path_mining" ->
      """WITH s AS (SELECT event_type,
              lead(event_type, 1) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS t1,
              lead(event_type, 2) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS t2
            FROM events)
          SELECT event_type || '>' || t1 || '>' || t2 AS path,
            CAST(count(*) AS BIGINT) AS n
          FROM s WHERE t1 IS NOT NULL AND t2 IS NOT NULL
          GROUP BY 1 ORDER BY n DESC, path ASC LIMIT 20""".replaceAll("\\s+", " "),
    "q234_trimmed_mean" ->
      """WITH d AS (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v
            FROM events),
          bv AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS c
                 FROM d GROUP BY 1, 2),
          st AS (SELECT event_type, v, c,
              sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
              sum(c) OVER (PARTITION BY event_type) AS n
            FROM bv),
          k AS (SELECT event_type, v, c, cum, n, (n * 5) // 100 AS t,
              greatest(0, least(cum, n - (n * 5) // 100)
                - greatest(cum - c, (n * 5) // 100)) AS kept
            FROM st)
          SELECT event_type, CAST(max(n) AS BIGINT) AS n,
            CAST(max(t) AS BIGINT) AS n_trim_each,
            CAST(sum(kept) AS BIGINT) AS n_kept,
            CAST(sum(kept * v) AS BIGINT) AS kept_sum_c,
            CAST(CASE WHEN sum(kept * v) < 0
              THEN -((-(sum(kept * v) * 1000000)) // sum(kept))
              ELSE (sum(kept * v) * 1000000) // sum(kept) END AS BIGINT)
              AS trimmed_mean_ppm
          FROM k GROUP BY event_type ORDER BY event_type""".replaceAll("\\s+", " "),
    "q235_theil_sen" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
              CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS y
            FROM events GROUP BY 1, 2),
          dx AS (SELECT event_type, y,
              CAST(day - DATE '2024-01-01' AS BIGINT) AS x FROM daily),
          p AS (SELECT a.event_type, (b.y - a.y) AS num, (b.x - a.x) AS den,
              CASE WHEN b.y - a.y < 0
                THEN -(((a.y - b.y) * 1000000) // (b.x - a.x))
                ELSE ((b.y - a.y) * 1000000) // (b.x - a.x) END AS slope_ppm
            FROM dx a JOIN dx b ON a.event_type = b.event_type AND a.x < b.x),
          r AS (SELECT *, count(*) OVER (PARTITION BY event_type) AS np,
              row_number() OVER (PARTITION BY event_type
                ORDER BY slope_ppm, num, den) AS r
            FROM p)
          SELECT event_type, CAST(np AS BIGINT) AS n_pairs,
            CAST(slope_ppm AS BIGINT) AS med_slope_ppm,
            CAST(num AS BIGINT) AS med_num, CAST(den AS BIGINT) AS med_den
          FROM r WHERE r = (np + 1) // 2
          ORDER BY event_type""".replaceAll("\\s+", " "),
    "q228_bootstrap_ci" ->
      """WITH x AS (SELECT event_id, CAST(floor(value * 100) AS BIGINT) AS cents,
              row_number() OVER (ORDER BY event_id) - 1 AS idx
            FROM events WHERE event_type = 'purchase'),
          nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM x),
          d AS (SELECT u.b, x.idx AS i,
              ('0x' || substr(md5(CAST(u.b AS VARCHAR) || ':'
                || CAST(x.idx AS VARCHAR)), 1, 8))::BIGINT % nn.nn AS j
            FROM x CROSS JOIN nn CROSS JOIN unnest(range(0, 32)) AS u(b)),
          reps AS (SELECT b, CAST(sum(x.cents) AS BIGINT) AS rep_sum
                   FROM d JOIN x ON x.idx = d.j GROUP BY b),
          rk AS (SELECT rep_sum, row_number() OVER (ORDER BY rep_sum, b) AS r
                 FROM reps),
          obs AS (SELECT CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(cents) AS BIGINT) AS obs_sum_c FROM x)
          SELECT obs.n, obs.obs_sum_c,
            (SELECT rep_sum FROM rk WHERE r = 1) AS rep_min,
            (SELECT rep_sum FROM rk WHERE r = 2) AS rep_lo,
            (SELECT rep_sum FROM rk WHERE r = 16) AS rep_med,
            (SELECT rep_sum FROM rk WHERE r = 31) AS rep_hi,
            (SELECT rep_sum FROM rk WHERE r = 32) AS rep_max
          FROM obs""".replaceAll("\\s+", " "),
    "q229_attribution" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, ts,
              CAST(floor(value * 100) AS BIGINT) AS cents,
              'ch' || CAST(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) % 5
                AS VARCHAR) AS ch
            FROM events),
          wl AS (SELECT *, last_value(CASE WHEN event_type = 'click' THEN ch END
                   IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ch
                 FROM ev),
          fc AS (SELECT user_id, ch AS first_click_ch FROM (
                   SELECT user_id, ch, row_number() OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS rn
                   FROM ev WHERE event_type = 'click') WHERE rn = 1),
          pur AS (SELECT w.cents,
                    coalesce(w.last_click_ch, 'none') AS last_touch,
                    coalesce(fc.first_click_ch, 'none') AS first_touch
                  FROM wl w LEFT JOIN fc USING (user_id)
                  WHERE w.event_type = 'purchase')
          SELECT * FROM (
            SELECT 'last_touch' AS model, last_touch AS channel,
              CAST(count(*) AS BIGINT) AS n_purchases,
              CAST(sum(cents) AS BIGINT) AS value_c FROM pur GROUP BY 2
            UNION ALL
            SELECT 'first_touch', first_touch,
              CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT)
            FROM pur GROUP BY 2)
          ORDER BY model, channel""".replaceAll("\\s+", " "),
    "q225_mann_whitney" ->
      """WITH d AS (SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents),
          bv AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY v),
          vs AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cum FROM bv),
          vst AS (SELECT v, CAST(2 * (cum - c + 1) + c - 1 AS BIGINT) AS avg2 FROM vs),
          sv AS (SELECT source, v, CAST(count(*) AS BIGINT) AS sc FROM d GROUP BY 1, 2),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM d),
          ties AS (SELECT CAST(sum(c * c * c - c) AS BIGINT) AS tie_sum FROM bv),
          per AS (SELECT source, CAST(sum(sc) AS BIGINT) AS n,
                    CAST(sum(sc * avg2) AS BIGINT) AS rank_sum_x2
                  FROM sv JOIN vst USING (v) GROUP BY source)
          SELECT p.source, p.n, p.rank_sum_x2,
            (p.rank_sum_x2 - p.n * (p.n + 1)) AS u_x2,
            (p.n * (t.nn - p.n)) AS eu_x2, ties.tie_sum
          FROM per p, tot t, ties ORDER BY p.source""".replaceAll("\\s+", " "),
    "q222_changepoint" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
              CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS x
            FROM events GROUP BY 1, 2),
          pre AS (SELECT event_type, day, x,
              row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
              sum(x) OVER (PARTITION BY event_type ORDER BY day) AS sl,
              count(*) OVER (PARTITION BY event_type) AS n,
              sum(x) OVER (PARTITION BY event_type) AS st
            FROM daily),
          sc AS (SELECT *, (sl * (n - t) - (st - sl) * t) AS a
                 FROM pre WHERE t < n),
          sq AS (SELECT *, (a * a) // (t * (n - t)) AS score_q FROM sc),
          b AS (SELECT *, row_number() OVER (PARTITION BY event_type
                  ORDER BY score_q DESC, day) AS rn FROM sq)
          SELECT event_type, day AS cp_day, CAST(n AS BIGINT) AS n_days,
            CAST(t AS BIGINT) AS n_left, CAST(n - t AS BIGINT) AS n_right,
            CAST(sl AS BIGINT) AS sum_left, CAST(st - sl AS BIGINT) AS sum_right,
            CAST(score_q AS BIGINT) AS score_q,
            CAST(CASE WHEN (sl * 1000000) < 0
              THEN -((-(sl * 1000000)) // (t))
              ELSE (sl * 1000000) // (t) END AS BIGINT) AS mean_left_ppm,
            CAST(CASE WHEN ((st - sl) * 1000000) < 0
              THEN -((-((st - sl) * 1000000)) // (n - t))
              ELSE ((st - sl) * 1000000) // (n - t) END AS BIGINT)
              AS mean_right_ppm
          FROM b WHERE rn = 1 ORDER BY event_type""".replaceAll("\\s+", " "),
    "q214_daily_bands" ->
      """WITH e AS (SELECT CAST(ts AS DATE) AS day, value, event_id FROM events),
          r AS (SELECT day, value,
              row_number() OVER (PARTITION BY day ORDER BY value, event_id) AS rn,
              count(*) OVER (PARTITION BY day) AS n
            FROM e)
          SELECT day, CAST(max(n) AS BIGINT) AS n_rows,
            min(CASE WHEN rn = (10 * n + 99) // 100 THEN value END) AS p10,
            min(CASE WHEN rn = (50 * n + 99) // 100 THEN value END) AS p50,
            min(CASE WHEN rn = (90 * n + 99) // 100 THEN value END) AS p90
          FROM r GROUP BY day ORDER BY day""".replaceAll("\\s+", " "),
    "q187_mad_anomaly" ->
      """WITH b AS (SELECT time_bucket(INTERVAL '1 day', ts) AS bucket,
            CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / count(value) AS avg_value
            FROM events GROUP BY 1),
          x AS (SELECT bucket, avg_value,
            CAST(floor(avg_value * 10000.0) AS BIGINT) AS xfp FROM b),
          m AS (SELECT xfp AS med FROM x
                QUALIFY row_number() OVER (ORDER BY xfp, bucket)
                  = (count(*) OVER () + 1) // 2),
          d AS (SELECT x.bucket, x.avg_value, abs(x.xfp - m.med) AS dev FROM x, m),
          md AS (SELECT dev AS mad FROM d
                 QUALIFY row_number() OVER (ORDER BY dev, bucket)
                   = (count(*) OVER () + 1) // 2)
          SELECT bucket, avg_value, dev, dev > 3 * mad AS is_anomaly
          FROM d, md ORDER BY bucket""".replaceAll("\\s+", " "),
    "q123_bucket_anomaly" ->
      """WITH b AS (SELECT time_bucket(INTERVAL '1 day', ts) AS bucket,
            CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / count(value) AS avg_value
            FROM events GROUP BY 1),
          x AS (SELECT bucket, avg_value,
            CAST(floor(avg_value * 10000.0) AS BIGINT) AS xfp FROM b),
          st AS (SELECT count(*) AS n, sum(xfp) AS s, sum(xfp * xfp) AS q FROM x)
          SELECT bucket, avg_value,
            (n * xfp - s) * (n * xfp - s) > 4 * (n * q - s * s) AS is_anomaly
          FROM x, st ORDER BY bucket""".replaceAll("\\s+", " "),
    "q128_user_growth" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
          f AS (SELECT user_id, min(d) AS fd FROM e GROUP BY 1),
          n AS (SELECT fd AS d, count(*) AS n_new FROM f GROUP BY 1),
          a AS (SELECT d, count(DISTINCT user_id) AS n_active FROM e GROUP BY 1)
          SELECT a.d, a.n_active, coalesce(n.n_new, 0) AS n_new,
            CAST(sum(coalesce(n.n_new, 0)) OVER (ORDER BY a.d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
          FROM a LEFT JOIN n ON a.d = n.d ORDER BY a.d""".replaceAll("\\s+", " "),
    "q130_event_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
                    WHERE event_type = 'view' GROUP BY 1),
          c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
                JOIN v ON e.user_id = v.user_id
                WHERE e.event_type = 'click' AND e.ts > v.t_view AND e.ts <= v.t_view + INTERVAL 24 HOURS GROUP BY 1),
          p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
                JOIN c ON e.user_id = c.user_id
                WHERE e.event_type = 'purchase' AND e.ts > c.t_click AND e.ts <= c.t_click + INTERVAL 24 HOURS GROUP BY 1)
          SELECT (SELECT count(*) FROM v) AS n_view,
                 (SELECT count(*) FROM c) AS n_view_click,
                 (SELECT count(*) FROM p) AS n_full_funnel""".replaceAll("\\s+", " "),
    "q124_cohort_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
          f AS (SELECT user_id, min(d) AS cohort_day FROM e GROUP BY 1)
          SELECT f.cohort_day, date_diff('day', f.cohort_day, e.d) AS day_offset,
            count(DISTINCT e.user_id) AS n_users
          FROM e JOIN f ON e.user_id = f.user_id
          GROUP BY 1, 2 ORDER BY 1, 2""".replaceAll("\\s+", " "),
    "q17_star_join_revenue" ->
      s"""SELECT r_name, count(*) AS n_orders, ${dsum("o_totalprice")} AS revenue
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name ORDER BY r_name""".replaceAll("\\s+", " "),
    "q18_fact_join_priority" ->
      s"""SELECT o_orderpriority, count(*) AS n_lines,
          ${dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY o_orderpriority ORDER BY o_orderpriority""".replaceAll("\\s+", " "),
    // q240 = q18's values over the bucketed layout; exchange_free is the
    // contract the Spark-side plan require() backs (an exchange in the
    // bucketed join fails the query instead of flipping the column).
    "q240_bucketed_fact_join" ->
      s"""SELECT o_orderpriority, count(*) AS n_lines,
          ${dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
          TRUE AS exchange_free
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY o_orderpriority ORDER BY o_orderpriority""".replaceAll("\\s+", " "),
    // q241 = the manifest⋈content release rollup replayed layout-free:
    // split via the md5-bucket grid (q96's convention), tokens via the
    // whitespace convention (q27), fp60 via the 60-bit md5 prefix; the
    // exchange_free contract is backed by q241's runtime plan require().
    "q241_bucketed_release_join" ->
      """WITH m AS (SELECT doc_id,
            CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
            CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < 9000 THEN 'train'
                 WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < 9500 THEN 'val'
                 ELSE 'test' END AS split,
            CAST(n_chars AS BIGINT) AS n_chars,
            ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp60
          FROM documents)
          SELECT split, count(*) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
            CAST(sum(n_chars) AS BIGINT) AS total_chars,
            bit_xor(fp60) AS content_fp,
            TRUE AS exchange_free
          FROM m GROUP BY split ORDER BY split""".replaceAll("\\s+", " "),
    "q19_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
          ${dsum("l_quantity")} AS sum_qty,
          ${dsum("l_extendedprice")} AS sum_base_price,
          ${dsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
          ${dsum("l_quantity", 10)} / count(l_quantity) AS avg_qty,
          ${dsum("l_discount", 10)} / count(l_discount) AS avg_disc,
          count(*) AS count_order
          FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          GROUP BY l_returnflag, l_linestatus
          ORDER BY l_returnflag, l_linestatus""".replaceAll("\\s+", " "),
    "q20_distinct_customers" ->
      """SELECT c_mktsegment, count(DISTINCT o_custkey) AS n_customers,
          count(*) AS n_orders
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment ORDER BY c_mktsegment""".replaceAll("\\s+", " "),
    "q21_topk_orders" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM orders
          QUALIFY row_number() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice DESC, o_orderkey ASC) <= 3
          ORDER BY o_orderpriority, o_orderkey""".replaceAll("\\s+", " "),
    "q94_topk_native" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM orders
          QUALIFY row_number() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice DESC, o_orderkey ASC) <= 3
          ORDER BY o_orderpriority, o_orderkey""".replaceAll("\\s+", " "),
    "q22_semi_anti_customers" ->
      """SELECT n_name,
          count(CASE WHEN has_o THEN 1 END) AS with_orders,
          count(CASE WHEN NOT has_o THEN 1 END) AS without_orders
          FROM (SELECT c_nationkey,
                  EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_o
                FROM customer)
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name ORDER BY n_name""".replaceAll("\\s+", " "),
    "q23_sessionize" ->
      """WITH g AS (SELECT user_id, ts,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          SELECT user_id, count(*) AS n_events, CAST(sum(new_s) AS BIGINT) AS n_sessions
          FROM g GROUP BY user_id ORDER BY user_id""".replaceAll("\\s+", " "),
    "q24_tumbling_counts" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
          count(*) AS n, ${dsum("value", 10)} AS sum_value
          FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".replaceAll("\\s+", " "),
    "q25_rollup_balance" ->
      s"""SELECT r_name, n_name, count(*) AS n_customers,
          ${dsum("c_acctbal")} AS total_balance,
          CAST(grouping(r_name) * 2 + grouping(n_name) AS INT) AS lvl
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY ROLLUP (r_name, n_name)
          ORDER BY lvl, r_name NULLS FIRST, n_name NULLS FIRST""".replaceAll("\\s+", " "),
    "q26_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate,
          ${dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
            AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY l_orderkey, o_orderdate
          ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".replaceAll("\\s+", " ")
  )
}
