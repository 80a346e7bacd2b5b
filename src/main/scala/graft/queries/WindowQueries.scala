package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exact
import graft.sources.Tables

/** Window-frame, pivot, set-operation, and ranking-family coverage —
  * engine surface beyond the reference (which has no window frames, no
  * pivot, no set ops; SURVEY §2.6/§2.8).
  */
object WindowQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // EWMA smoothing in exact fixed point (α=1/2, 16-lag truncation →
    // power-of-two weights → `(Σ x_p·2^p) div (2^m−1)` pure int64): the
    // exponentially-weighted cousin of q55's rolling mean that float
    // arithmetic could never hash-match cross-engine. One per-user window
    // + codegen'd fold.
    "q170_ewma" -> ((s, dir) => {
      graft.operators.Analytics.ewmaFp(
        Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"),
          floor(col("value") * 1e6).cast("long").as("vfp")),
        key = "user_id", ts = "ts", tieBreak = "event_id", vfpCol = "vfp")
        .select("event_id", "user_id", "ewma_fp")
        .orderBy("event_id")
    }),
    // Rolling mean over a 7-row frame per user (moving-average smoothing —
    // the time-series op the reference's dashboard resample approximates).
    // Exact decimal rolling sum / count so values hash-match.
    "q55_rolling_mean" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-6, Window.currentRow)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .withColumn("rolling_avg",
          sum(col("value").cast("decimal(30,10)")).over(w).cast("double")
            / count(col("value")).over(w))
        .select("event_id", "user_id", "rolling_avg")
        .orderBy("event_id")
    }),
    // Pivot (long → wide): per-user event-type counts as columns — the
    // inverse of R1's unpivot.
    "q56_pivot" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .count()
        .na.fill(0L)
        .orderBy("user_id")
    }),
    // Set operations: purchasers INTERSECT signups, and purchasers EXCEPT
    // signups, tagged and unioned.
    "q57_set_ops" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchasers = ev.filter(col("event_type") === "purchase").select("user_id").distinct()
      val signups = ev.filter(col("event_type") === "signup").select("user_id").distinct()
      purchasers.intersect(signups).withColumn("set_op", lit("both"))
        .unionByName(purchasers.except(signups).withColumn("set_op", lit("purchase_only")))
        .orderBy("set_op", "user_id")
    }),
    // AS-OF join: each purchase matched to the user's latest click at or
    // before it (union + last-value window — one shuffle, linear; see
    // Analytics.asofJoin). Oracle uses DuckDB's native ASOF LEFT JOIN —
    // independent implementations of the same semantics.
    "q59_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "ts", "user_id", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_id"), col("value").as("click_value"))
      graft.operators.Analytics.asofJoin(
        purchases, clicks, key = "user_id", leftTs = "ts", rightTs = "ts",
        asofCols = Seq("click_id", "click_value"), rightTieBreak = "click_id")
        .orderBy("event_id")
    }),
    // Band (range) join: cross-user event pairs within 1 second, via the
    // interval-bucketed equi-join (candidates = same/neighbor time bucket,
    // then exact |gap| filter) — the scale path for inequality joins.
    "q60_band_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val a = ev.select(col("event_id").as("a_id"), col("user_id").as("a_user"), col("ts"))
      val b = ev.select(col("event_id").as("b_id"), col("user_id").as("b_user"),
        col("ts").as("ts_b"))
      graft.operators.Analytics.bandJoin(
        a, b, "ts", "ts_b", maxGapSeconds = 1L,
        extraCond = col("a_user") < col("b_user"))
        .select(col("a_id"), col("b_id"),
          (unix_micros(col("ts_b").cast("timestamp"))
            - unix_micros(col("ts").cast("timestamp"))).as("gap_us"))
        .orderBy("a_id", "b_id")
    }),
    // Native session windows: Spark's built-in session_window (merging
    // state machine) cross-validated against the oracle's independent
    // lag/cumsum formulation — two constructions of the same semantics.
    "q62_session_window" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("sw.start").cast("timestamp_ntz").as("session_start"),
          col("sw.end").cast("timestamp_ntz").as("session_end"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    }),
    // Cube over two dims: all four grouping levels with grouping_id.
    "q63_cube" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          Exact.dsum4(col("l_quantity")).as("sum_qty"),
          grouping_id(col("l_returnflag"), col("l_linestatus")).cast("int").as("lvl"))
        .orderBy(col("lvl"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),
    // Ranking family in one pass: rank / dense_rank / percent_rank /
    // ntile(4) / cume_dist over order value per priority (unique tiebreak
    // via orderkey keeps ntile deterministic).
    "q58_ranking_family" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("prnk", percent_rank().over(w))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("cume", cume_dist().over(w))
        .filter(col("rnk") <= 50)
        .orderBy("o_orderpriority", "rnk")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q170_ewma" ->
      """WITH e AS (SELECT user_id, event_id, ts,
              CAST(floor(value * 1000000.0) AS BIGINT) AS v,
              row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events),
          f AS (SELECT a.user_id, a.event_id,
              b.v, b.rn - greatest(a.rn - 15, 1) AS p
            FROM e a JOIN e b
              ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 15 AND a.rn),
          g AS (SELECT event_id, user_id,
              CAST(sum(v * (CAST(1 AS BIGINT) << p)) AS BIGINT) AS s,
              ((CAST(1 AS BIGINT) << count(*)) - 1) AS d
            FROM f GROUP BY event_id, user_id)
          SELECT event_id, user_id,
              CAST(CASE WHEN s < 0 THEN -((-s) // d) ELSE s // d END AS BIGINT)
                AS ewma_fp
          FROM g ORDER BY event_id""".replaceAll("\\s+", " "),
    "q55_rolling_mean" ->
      """SELECT event_id, user_id,
          CAST(sum(CAST(value AS DECIMAL(30,10)))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
            / count(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS rolling_avg
          FROM events ORDER BY event_id""".replaceAll("\\s+", " "),
    "q56_pivot" ->
      """SELECT user_id,
          count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
          count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
          count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
          count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
          count(CASE WHEN event_type = 'error' THEN 1 END) AS error
          FROM events GROUP BY user_id ORDER BY user_id""".replaceAll("\\s+", " "),
    "q57_set_ops" ->
      """WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
          s AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup')
          SELECT user_id, 'both' AS set_op FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM s)
          UNION ALL
          SELECT user_id, 'purchase_only' FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM s)
          ORDER BY set_op, user_id""".replaceAll("\\s+", " "),
    "q59_asof_join" ->
      """WITH p AS (SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'purchase'),
          c0 AS (SELECT user_id, ts, event_id AS click_id, value AS click_value
                 FROM events WHERE event_type = 'click'),
          c AS (SELECT * FROM c0
                QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY click_id DESC) = 1)
          SELECT p.event_id, p.ts, p.user_id, p.value,
            c.click_id AS asof_click_id, c.click_value AS asof_click_value
          FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
          ORDER BY p.event_id""".replaceAll("\\s+", " "),
    "q60_band_join" ->
      """SELECT a.event_id AS a_id, b.event_id AS b_id,
          epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
          FROM events a JOIN events b
          ON a.user_id < b.user_id
          AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 1000000
          ORDER BY a_id, b_id""".replaceAll("\\s+", " "),
    "q62_session_window" ->
      """WITH g AS (SELECT user_id, ts,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                 THEN 1 ELSE 0 END AS new_s
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          s AS (SELECT user_id, ts,
            sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid FROM g)
          SELECT user_id, min(ts) AS session_start,
            max(ts) + INTERVAL 30 MINUTE AS session_end, count(*) AS n_events
          FROM s GROUP BY user_id, sid
          ORDER BY user_id, session_start""".replaceAll("\\s+", " "),
    "q63_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty,
          CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS lvl
          FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
          ORDER BY lvl, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
        .replaceAll("\\s+", " "),
    "q58_ranking_family" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
          rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
          percent_rank() OVER w AS prnk, ntile(4) OVER w AS quartile,
          cume_dist() OVER w AS cume
          FROM orders
          WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
          QUALIFY rnk <= 50
          ORDER BY o_orderpriority, rnk""".replaceAll("\\s+", " ")
  )
}
