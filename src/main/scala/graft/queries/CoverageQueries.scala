package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exact
import graft.operators.{Align, Analytics}
import graft.sources.Tables

/** Remaining SURVEY.md §2 inventory items not exercised elsewhere:
  * A2/C3/C4 (date bounds + defaults), P6/P14/C5 (derived chart column,
  * drop-by-suffix, string cosmetics), O5 (stable slice), plus join coverage
  * for the `part`/`supplier` dimensions.
  */
object CoverageQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Rendezvous (HRW) shard routing audit: every doc's shard under 8 and
    // under 9 shards, rolled up per old shard with the count that moved.
    // The minimal-disruption contract — movers relocate ONLY to the new
    // shard 8, ~1/9 of each old shard — is visible in the result (and
    // spec-asserted); mod-hashing would scatter ~8/9 of every shard.
    // Pure per-row codegen'd argmax, one small aggregation.
    // Z-order layout pruning audit: events mapped onto a 256×256 grid
    // (x = user bucket, y = 6-minute time-of-day band), laid out two ways
    // into 64 files — z-tiles (top 6 Morton bits) vs a single-key x-sort
    // (x div 4) — then three predicates (2-D rectangle, user-only slice,
    // time-only band) count the files each layout opens. The z-layout
    // bounds ALL three (the rectangle hits the tiles it overlaps); the
    // x-sort is perfect on x and opens every file for the time band —
    // the trade a 100 TB table's clustering key decides. One scan, one
    // aggregate; the morton code is pure codegen'd bit arithmetic.
    "q174_zorder_pruning" -> ((s, dir) => {
      val L = graft.operators.Layout
      val base = Tables.events(s, dir).select(
        pmod(col("user_id"), lit(256L)).as("x"),
        expr("(hour(ts) * 60 + minute(ts)) div 6").as("y"))
      val prepared = base.select(
        col("x"), col("y"),
        L.zTile(col("x"), col("y"), bits = 8, tileBits = 6).as("file_z"),
        shiftright(col("x"), 2).as("file_x"))
      val rect = col("x").between(32, 47) && col("y").between(64, 95)
      val userP = col("x").between(32, 47)
      val timeP = col("y").between(64, 95)
      prepared.agg(
        countDistinct(when(rect, col("file_z"))).as("rect_files_z"),
        countDistinct(when(rect, col("file_x"))).as("rect_files_x"),
        countDistinct(when(userP, col("file_z"))).as("user_files_z"),
        countDistinct(when(userP, col("file_x"))).as("user_files_x"),
        countDistinct(when(timeP, col("file_z"))).as("time_files_z"),
        countDistinct(when(timeP, col("file_x"))).as("time_files_x"),
        count_if(rect).as("rect_rows"),
        count_if(userP).as("user_rows"),
        count_if(timeP).as("time_rows"))
    }),
    // Range-partitioner bounds audit: the deterministic twin of what a
    // 100 TB global sort does first — md5-sample the sort key (5%), cut
    // the sample into 8 ntiles, take tile maxima as boundaries, assign
    // every event by a broadcast boundary-array filter (no shuffle, no
    // global sort), and report per-range counts + bounds. Balanced
    // n_rows across ranges IS the audit: it is what keeps the real
    // sort's reducers even.
    "q177_range_bounds" -> ((s, dir) => {
      graft.operators.Shard.rangePartitionAudit(
        Tables.events(s, dir), col("ts"), col("event_id"), k = 8, sampleCap = 500)
        .withColumnRenamed("min_v", "min_ts")
        .withColumnRenamed("max_v", "max_ts")
        .orderBy("range_id")
    }),
    "q171_rendezvous_shards" -> ((s, dir) => {
      val sh = graft.operators.Shard
      Tables.documents(s, dir)
        .select(col("doc_id"),
          sh.rendezvousShard(col("doc_id"), 8).as("shard8"),
          sh.rendezvousShard(col("doc_id"), 9).as("shard9"))
        .groupBy("shard8")
        .agg(count(lit(1)).as("n_docs"),
          count_if(col("shard8") =!= col("shard9")).as("n_moved"),
          count_if(col("shard8") =!= col("shard9") && col("shard9") =!= 8)
            .as("n_moved_elsewhere"))
        .orderBy("shard8")
    }),
    // A2 + C3 + C4: dataset date bounds and the UI's default range starts
    // (7d/14d/13w/5y before max), all from one aggregation pass.
    "q44_date_bounds" -> ((s, dir) => {
      Tables.events(s, dir)
        .agg(
          to_date(min(col("ts"))).as("min_date"),
          to_date(max(col("ts"))).as("max_date"))
        .select(
          col("min_date"), col("max_date"),
          date_sub(col("max_date"), 7).as("default_7d"),
          date_sub(col("max_date"), 14).as("default_14d"),
          date_sub(col("max_date"), 13 * 7).as("default_13w"),
          date_sub(col("max_date"), 365 * 5).as("default_5y"))
    }),
    // P6 + P14 + C5 + R1: chart prep — derived CARBON column, helper-column
    // drop by suffix, display-name cosmetics, then unpivot to long form.
    "q45_chart_prep" -> ((s, dir) => {
      val base = Tables.events(s, dir).select(
        col("event_id"),
        col("value").as("GENERATION"),
        (col("value") * 0.4).as("ZERO_CARBON"),
        (col("value") * 2).as("GENERATION_calc"), // helper cols: dropped below
        (col("value") - 1).as("GENERATION_diff"))
      val withDerived = Align.dropBySuffix(
        base.withColumn("CARBON", col("GENERATION") - col("ZERO_CARBON")),
        "_calc", "_diff")
      graft.operators.Reshape
        .unpivot(withDerived, Seq("event_id"), Seq("GENERATION", "ZERO_CARBON", "CARBON"))
        .withColumn("Fuel", initcap(lower(regexp_replace(col("Fuel"), "_", " "))))
        .orderBy("event_id", "Fuel")
    }),
    // O5: stable slice rows (1000, 1100] in event_id order — top-k merge +
    // bounded window, never a global sort of the input (Analytics.stableSlice).
    "q46_slice" -> ((s, dir) => {
      Analytics.stableSlice(
        Tables.events(s, dir).select(col("event_id"), col("event_type")),
        Seq(col("event_id")), start = 1000, end = 1100)
        .orderBy("event_id")
    }),
    // Skew-SPLIT join: exact heavy-key detection (count pass → broadcast
    // heavy-key list), heavy keys join broadcast / light keys shuffle,
    // union — row-identical to the plain join, which is what the oracle
    // hash proves. The deterministic twin of AQE skew mitigation, and
    // the differentiated alternative to q53's blanket salting.
    "q191_skew_split_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("event_id", "user_id", "value")
      val profile = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(min(col("event_id")).as("first_event"))
      Analytics.skewSplitJoin(ev, profile, "user_id", heavyThreshold = 40L)
        .groupBy("user_id", "first_event")
        .agg(count(lit(1)).as("n"), Exact.dsum(col("value")).as("sum_value"))
        .orderBy("user_id")
    }),
    // Skew-mitigating salted join, oracle-checked equivalent to the plain
    // join: events (big, per-user skew) ⋈ per-user profile (small), salted
    // over 8 buckets, then aggregated back per user.
    "q53_salted_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("event_id", "user_id", "value")
      val profile = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(min(col("event_id")).as("first_event"))
      Analytics.saltedJoin(ev, profile, "user_id", salts = 8)
        .groupBy("user_id", "first_event")
        .agg(count(lit(1)).as("n"), Exact.dsum(col("value")).as("sum_value"))
        .orderBy("user_id")
    }),
    // Cross-table consistency audit: an order's status must agree with
    // its lineitems' statuses (F ⟺ all lines F, O ⟺ all lines O,
    // P ⟺ mixed; no lines at all is always a violation). Per status:
    // orders, consistent, violations, first violating key — the
    // business-rule DQ gate that runs beside q193's FK audit. One
    // per-order aggregate + one broadcast-dim join.
    "q212_status_consistency" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).groupBy(col("l_orderkey"))
        .agg(count_if(col("l_linestatus") === "F").as("nf"),
          count_if(col("l_linestatus") === "O").as("no"))
      Tables.orders(s, dir).select("o_orderkey", "o_orderstatus")
        .join(li, col("o_orderkey") === col("l_orderkey"), "left")
        .withColumn("nf", coalesce(col("nf"), lit(0L)))
        .withColumn("no", coalesce(col("no"), lit(0L)))
        .withColumn("consistent",
          when(col("o_orderstatus") === "F", col("no") === 0 && col("nf") > 0)
            .when(col("o_orderstatus") === "O", col("nf") === 0 && col("no") > 0)
            .otherwise(col("nf") > 0 && col("no") > 0))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          count_if(col("consistent")).as("n_consistent"),
          count_if(!col("consistent")).as("n_violations"),
          min(when(!col("consistent"), col("o_orderkey"))).as("first_violation"))
        .orderBy("o_orderstatus")
    }),
    // Referential-integrity audit: orphan counts across every FK edge of
    // the star schema (lineitem→orders/part/supplier, orders→customer,
    // customer/supplier→nation) — each edge one broadcast-dim anti-join,
    // rolled into a single report with the first orphan key for triage.
    // The DQ gate a warehouse load runs before publishing a snapshot.
    "q193_fk_orphans" -> ((s, dir) => {
      def edge(name: String, fact: DataFrame, fk: String, dim: DataFrame, pk: String) =
        fact.join(Analytics.dim(dim.select(col(pk))), col(fk) === col(pk), "left_anti")
          .agg(count(lit(1)).as("n_orphans"),
            min(col(fk)).cast("long").as("first_orphan_key"))
          .select(lit(name).as("fk_edge"), col("n_orphans"), col("first_orphan_key"))
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      edge("lineitem.l_orderkey", li, "l_orderkey", ord, "o_orderkey")
        .unionByName(edge("lineitem.l_partkey", li, "l_partkey", Tables.part(s, dir), "p_partkey"))
        .unionByName(edge("lineitem.l_suppkey", li, "l_suppkey", Tables.supplier(s, dir), "s_suppkey"))
        .unionByName(edge("orders.o_custkey", ord, "o_custkey", Tables.customer(s, dir), "c_custkey"))
        .unionByName(edge("customer.c_nationkey", Tables.customer(s, dir), "c_nationkey",
          Tables.nation(s, dir), "n_nationkey"))
        .orderBy("fk_edge")
    }),
    // Join coverage for part/supplier: revenue and supplier count by brand
    // over lineitem ⋈ part(bcast) ⋈ supplier(bcast).
    "q47_brand_revenue" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .join(Analytics.dim(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .join(Analytics.dim(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n_lines"),
          countDistinct(col("s_suppkey")).as("n_suppliers"),
          Exact.dsumProduct(col("l_extendedprice"), lit(1.0) - col("l_discount"))
            .as("revenue"))
        .orderBy("p_brand")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q174_zorder_pruning" ->
      s"""WITH base AS (SELECT user_id % 256 AS x,
              (hour(ts) * 60 + minute(ts)) // 6 AS y FROM events),
          laid AS (SELECT x, y,
              ${graft.operators.Layout.mortonSql("x", "y", 8)} // 1024 AS file_z,
              x // 4 AS file_x FROM base)
          SELECT
            count(DISTINCT CASE WHEN x BETWEEN 32 AND 47 AND y BETWEEN 64 AND 95 THEN file_z END) AS rect_files_z,
            count(DISTINCT CASE WHEN x BETWEEN 32 AND 47 AND y BETWEEN 64 AND 95 THEN file_x END) AS rect_files_x,
            count(DISTINCT CASE WHEN x BETWEEN 32 AND 47 THEN file_z END) AS user_files_z,
            count(DISTINCT CASE WHEN x BETWEEN 32 AND 47 THEN file_x END) AS user_files_x,
            count(DISTINCT CASE WHEN y BETWEEN 64 AND 95 THEN file_z END) AS time_files_z,
            count(DISTINCT CASE WHEN y BETWEEN 64 AND 95 THEN file_x END) AS time_files_x,
            CAST(count(*) FILTER (x BETWEEN 32 AND 47 AND y BETWEEN 64 AND 95) AS BIGINT) AS rect_rows,
            CAST(count(*) FILTER (x BETWEEN 32 AND 47) AS BIGINT) AS user_rows,
            CAST(count(*) FILTER (y BETWEEN 64 AND 95) AS BIGINT) AS time_rows
          FROM laid""".replaceAll("\\s+", " "),
    "q177_range_bounds" ->
      """WITH sample AS (SELECT ts AS v FROM events
              WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < 500),
          tiled AS (SELECT v, ntile(8) OVER (ORDER BY v) AS tile FROM sample),
          b AS (SELECT tile, max(v) AS bv FROM tiled WHERE tile < 8 GROUP BY tile),
          bs AS (SELECT list_sort(list(bv)) AS bl FROM b),
          assigned AS (SELECT len(list_filter(bs.bl, x -> e.ts > x)) AS range_id, e.ts
            FROM events e, bs)
          SELECT range_id, CAST(count(*) AS BIGINT) AS n_rows,
            min(ts) AS min_ts, max(ts) AS max_ts
          FROM assigned GROUP BY range_id ORDER BY range_id""".replaceAll("\\s+", " "),
    "q171_rendezvous_shards" ->
      """WITH w8 AS (SELECT doc_id, s,
              ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)), 1, 8))::BIGINT AS w
            FROM documents, unnest(range(0, 8)) AS u(s)),
          s8 AS (SELECT doc_id, s AS shard8 FROM w8
                 QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, s DESC) = 1),
          w9 AS (SELECT doc_id, s,
              ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)), 1, 8))::BIGINT AS w
            FROM documents, unnest(range(0, 9)) AS u(s)),
          s9 AS (SELECT doc_id, s AS shard9 FROM w9
                 QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, s DESC) = 1)
          SELECT shard8, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(count(*) FILTER (shard8 <> shard9) AS BIGINT) AS n_moved,
            CAST(count(*) FILTER (shard8 <> shard9 AND shard9 <> 8) AS BIGINT) AS n_moved_elsewhere
          FROM s8 JOIN s9 USING (doc_id)
          GROUP BY shard8 ORDER BY shard8""".replaceAll("\\s+", " "),
    "q44_date_bounds" ->
      """SELECT CAST(min(ts) AS DATE) AS min_date, CAST(max(ts) AS DATE) AS max_date,
          CAST(max(ts) AS DATE) - 7 AS default_7d,
          CAST(max(ts) AS DATE) - 14 AS default_14d,
          CAST(max(ts) AS DATE) - 91 AS default_13w,
          CAST(max(ts) AS DATE) - 1825 AS default_5y
          FROM events""".replaceAll("\\s+", " "),
    "q45_chart_prep" ->
      """WITH base AS (SELECT event_id, value AS g, value * 0.4 AS z FROM events)
          SELECT event_id,
            CASE v WHEN 'GENERATION' THEN 'Generation' WHEN 'ZERO_CARBON' THEN 'Zero Carbon' ELSE 'Carbon' END AS "Fuel",
            CASE v WHEN 'GENERATION' THEN g WHEN 'ZERO_CARBON' THEN z ELSE g - z END AS value
          FROM base, unnest(['GENERATION', 'ZERO_CARBON', 'CARBON']) AS u(v)
          ORDER BY event_id, "Fuel"""".replaceAll("\\s+", " "),
    "q46_slice" ->
      """SELECT event_id, event_type FROM events
          QUALIFY row_number() OVER (ORDER BY event_id) BETWEEN 1001 AND 1100
          ORDER BY event_id""".replaceAll("\\s+", " "),
    "q212_status_consistency" ->
      """WITH li AS (SELECT l_orderkey,
              CAST(count(*) FILTER (l_linestatus = 'F') AS BIGINT) AS nf,
              CAST(count(*) FILTER (l_linestatus = 'O') AS BIGINT) AS no
            FROM lineitem GROUP BY l_orderkey),
          j AS (SELECT o.o_orderkey, o.o_orderstatus,
              coalesce(li.nf, 0) AS nf, coalesce(li.no, 0) AS no
            FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey),
          c AS (SELECT o_orderkey, o_orderstatus,
              CASE WHEN o_orderstatus = 'F' THEN no = 0 AND nf > 0
                   WHEN o_orderstatus = 'O' THEN nf = 0 AND no > 0
                   ELSE nf > 0 AND no > 0 END AS consistent
            FROM j)
          SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
            CAST(count(*) FILTER (consistent) AS BIGINT) AS n_consistent,
            CAST(count(*) FILTER (NOT consistent) AS BIGINT) AS n_violations,
            min(CASE WHEN NOT consistent THEN o_orderkey END) AS first_violation
          FROM c GROUP BY o_orderstatus ORDER BY o_orderstatus""".replaceAll("\\s+", " "),
    "q193_fk_orphans" ->
      """SELECT * FROM (
          SELECT 'customer.c_nationkey' AS fk_edge,
            CAST(count(*) AS BIGINT) AS n_orphans,
            CAST(min(c_nationkey) AS BIGINT) AS first_orphan_key
          FROM customer WHERE NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)
          UNION ALL SELECT 'lineitem.l_orderkey', CAST(count(*) AS BIGINT), CAST(min(l_orderkey) AS BIGINT)
          FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
          UNION ALL SELECT 'lineitem.l_partkey', CAST(count(*) AS BIGINT), CAST(min(l_partkey) AS BIGINT)
          FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)
          UNION ALL SELECT 'lineitem.l_suppkey', CAST(count(*) AS BIGINT), CAST(min(l_suppkey) AS BIGINT)
          FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)
          UNION ALL SELECT 'orders.o_custkey', CAST(count(*) AS BIGINT), CAST(min(o_custkey) AS BIGINT)
          FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
          ORDER BY fk_edge""".replaceAll("\\s+", " "),
    "q191_skew_split_join" ->
      """WITH profile AS (SELECT user_id, min(event_id) AS first_event
                          FROM events GROUP BY user_id)
          SELECT e.user_id, p.first_event, count(*) AS n,
            CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS sum_value
          FROM events e JOIN profile p ON e.user_id = p.user_id
          GROUP BY e.user_id, p.first_event ORDER BY e.user_id""".replaceAll("\\s+", " "),
    "q53_salted_join" ->
      """WITH profile AS (SELECT user_id, min(event_id) AS first_event
                          FROM events GROUP BY user_id)
          SELECT e.user_id, p.first_event, count(*) AS n,
            CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS sum_value
          FROM events e JOIN profile p ON e.user_id = p.user_id
          GROUP BY e.user_id, p.first_event ORDER BY e.user_id""".replaceAll("\\s+", " "),
    "q47_brand_revenue" ->
      """SELECT p_brand, count(*) AS n_lines,
          count(DISTINCT s_suppkey) AS n_suppliers,
          CAST(sum(CAST((l_extendedprice * (1.0 - l_discount)) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          GROUP BY p_brand ORDER BY p_brand""".replaceAll("\\s+", " ")
  )
}
