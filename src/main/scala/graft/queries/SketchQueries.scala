package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Resample, Sketches}
import graft.functions.Text
import graft.sources.Tables

/** Calendar-interval resampling over the multi-year `orders` table plus
  * sketch-based approximate aggregates.
  *
  * q50's sketch VALUES are engine-specific (HLL++ / GK have no DuckDB
  * twin), so the raw estimates cannot cross-engine hash-match — instead
  * q50 outputs the exact cardinality plus sketch-accuracy CONTRACT
  * booleans computed in-plan (|approx−exact| within the documented bound;
  * approx percentiles inside an exact quantile band), and the oracle
  * replays the exact side with literal TRUE for each contract. A sketch
  * drifting out of bounds therefore hash-FAILS the row — the fixed-seed
  * accuracy contract made oracle-checkable. Exact companions: q61
  * percentiles, q66 count/countDistinct; SketchBoundsSpec pins error
  * magnitudes. The capability matters at 100 TB: approx_count_distinct
  * is one pass + constant memory vs countDistinct's expand-shuffle, and
  * approx_percentile avoids a full sort.
  */
object SketchQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // A4 calendar path over years of data: monthly + yearly buckets from
    // date_trunc (Spark's window() rejects month/year durations).
    "q49_resample_calendar" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      orders
        .groupBy(
          Resample.bucketStart(col("o_orderdate"), "1y").cast("timestamp_ntz").as("year"),
          Resample.bucketStart(col("o_orderdate"), "1mo").cast("timestamp_ntz").as("month"))
        .agg(
          count(lit(1)).as("n_orders"),
          graft.functions.Exact.dsum4(col("o_totalprice")).as("revenue"))
        .orderBy("month")
    }),
    // EXACT percentiles (sort-based `percentile`, type-7 interpolation —
    // the same definition as DuckDB's quantile_cont, so values hash-match).
    // The exact/approx pair q61/q50 is the accuracy-vs-scale tradeoff:
    // exact sorts per group; approx streams one sketch per group.
    "q61_exact_percentiles" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.9)").as("p90"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy("o_orderpriority")
    }),
    // Sketch-accuracy contract, oracle-gated: HLL++ distinct customers and
    // GK order-price quantiles per priority, each verified IN-PLAN against
    // the exact answer computed alongside — the checked output is the
    // exact cardinality plus three contract booleans (raw sketch values
    // are engine-specific and cannot hash-match; the booleans can, and a
    // sketch drifting out of its bound fails the hash gate). rsd=0.01
    // HLL++ is held to 5% (5σ); accuracy-10000 GK percentiles (rank error
    // ≤ n/10⁴) are held inside the exact ±0.005-quantile band.
    // PLAN NOTE (r9): countDistinct must NOT share an agg() with the
    // sketch buffers. Spark's distinct-aggregate rewrite keys the first
    // partial aggregate on (group, distinct-col) — (priority, custkey),
    // ~100k groups at sf0.1 — and builds + serializes EVERY
    // TypedImperativeAggregate buffer per customer group (the rsd=0.01
    // HLL buffer alone is 1644 longs), pushing ~10M sketch buffers
    // through two exchanges at 100× scale for a 5-row answer. Isolating
    // countDistinct in its own 5-group aggregate keeps the sketch agg a
    // map-side partial over 5 groups, and the array forms collapse
    // 4 percentile + 2 percentile_approx buffers into one of each
    // (7 buffers → 3). Measured: 27.2 s → ~1 s at sf0.1, hash unchanged.
    "q50_approx_stats" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      val sketches = orders
        .groupBy(col("o_orderpriority"))
        .agg(
          approx_count_distinct(col("o_custkey"), rsd = 0.01).as("__acd"),
          expr("percentile_approx(o_totalprice, array(0.5D, 0.99D), 10000)")
            .as("__pa"),
          expr("percentile(o_totalprice, array(0.495D, 0.505D, 0.985D, 0.995D))")
            .as("__pe"))
      val exact = orders
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_customers"))
      exact.join(sketches, "o_orderpriority")
        .select(col("o_orderpriority"), col("n_customers"),
          (abs(col("__acd") - col("n_customers")) * 20 <= col("n_customers"))
            .as("cd_within_5pct"),
          (col("__pa")(0) >= col("__pe")(0) && col("__pa")(0) <= col("__pe")(1))
            .as("p50_in_band"),
          (col("__pa")(1) >= col("__pe")(2) && col("__pa")(1) <= col("__pe")(3))
            .as("p99_in_band"))
        .orderBy("o_orderpriority")
    }),
    // The exact companion to q50, oracle-checked: per-priority cardinalities
    // the sketches approximate. countDistinct is the expand-shuffle whose
    // cost q50's one-pass constant-memory HLL++ avoids at 100 TB.
    "q66_exact_distinct" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("n_customers"))
        .orderBy("o_orderpriority")
    }),
    // Linear counting (Whang, Vander-Zanden & Taylor 1990) — the
    // DETERMINISTIC cardinality estimator next to q50's engine-specific
    // HLL++: a 4096-bucket md5 bitmap per priority (constant size, one
    // map-side-combined distinct over (group, bucket)), estimate
    // n̂ = −m·ln(empty/m), audited against the exact distinct count. The
    // bitmap is exact-int; the single ln per GROUP follows q64's
    // ulp-separation argument. m chosen so no priority saturates at any
    // tested sf (expected empty ≈ 174 at sf0.1's heaviest load).
    "q158_linear_counting" -> ((s, dir) => {
      val m = 4096
      val o = Tables.orders(s, dir)
      val hits = o.select(col("o_orderpriority"),
          (conv(substring(md5(concat(lit("lc:"), col("o_custkey").cast("string"))),
            1, 8), 16, 10).cast("long") % m).as("b"))
        .distinct()
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n_buckets_hit"))
      val exact = o.groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_exact"))
      hits.join(exact, "o_orderpriority")
        .withColumn("lc_est_fp", floor(
          lit(-m.toDouble)
            * log((lit(m) - col("n_buckets_hit")).cast("double") / lit(m.toDouble))
            * lit(1e6)).cast("long"))
        .orderBy("o_orderpriority")
    }),
    // Count-min heavy hitters — the DETERMINISTIC frequency sketch q50's
    // engine-specific HLL/KLL family can't oracle-check: a 4×64 md5-bucket
    // CMS over corpus word bigrams (~900 distinct keys in 64 buckets, so
    // collisions — and the min-over-rows recovery — are real), audited
    // against the exact top-20 counts. cms_n ≥ exact_n always; the sketch
    // is a constant-size, map-side-combined, MERGEABLE aggregate — the
    // 100 TB (and streaming) shape for corpus-frequency tracking.
    // Equi-width histogram median per event type, with the exact audit in
    // the same row: the deterministic constant-memory quantile estimator
    // (16 integer bins over the group's fixed-point range; estimate = the
    // lower edge of the bin reaching rank ⌈n/2⌉) next to the rank-exact
    // median and the signed error — the oracle-checkable counterpart of
    // q50's approx_percentile the way q158's linear counting pairs with
    // HLL. At 100 TB the estimator's shape (one agg + groups·bins rows)
    // survives; the audit's per-group sort is the part you drop.
    "q169_histogram_median" -> ((s, dir) => {
      Sketches.histogramMedian(
        Tables.events(s, dir)
          .select(col("event_type"),
            floor(col("value") * 1e6).cast("long").as("vfp")),
        "event_type", "vfp", bins = 16)
        .orderBy("event_type")
    }),
    "q153_countmin_heavy" -> ((s, dir) => {
      val grams = Tables.documents(s, dir)
        .select(explode(Text.wordNgramsFromText(col("text"), 2)).as("tok"))
      val sketch = Sketches.countMin(grams, "tok", depth = 4, width = 64)
      val top = grams.groupBy("tok").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("tok").asc).limit(20)
      top.join(Sketches.cmsEstimate(top.select("tok"), "tok", sketch, 4, 64), "tok")
        .select(col("tok"), col("exact_n"), col("cms_n"),
          (col("cms_n") - col("exact_n")).as("overestimate"))
        .orderBy(col("exact_n").desc, col("tok").asc)
    }),
    // AMS second-moment (F₂ / self-join size) sign sketch (Alon, Matias &
    // Szegedy 1996) — the UNBIASED companion to q230's always-over
    // count-min bound: depth-4 estimators Z_j = Σ_rows s_j(key) with
    // s_j = ±1 from an md5 parity bit, est_j = Z_j², summarized by the
    // lower median; the exact F₂ = Σ_k f(k)² rides along. Each Z is ONE
    // map-side-combined pass over raw rows (no per-key state at all) —
    // the sketch a streaming/distributed system keeps when even the key
    // cardinality is too big to hold.
    "q231_ams_f2" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir).select(col("user_id").cast("string").as("k"))
      def sign(j: Int) = when(
        conv(substring(md5(concat(lit(s"$j:"), col("k"))), 1, 8), 16, 10)
          .cast("long") % 2 === 0, lit(1L)).otherwise(lit(-1L))
      val zCols = (0 until 4).map(j => sum(sign(j)).as(s"z$j"))
      val z = ev.agg(zCols.head, zCols.tail: _*)
      val ests = z.select(explode(array((0 until 4).map(j =>
          struct(lit(j.toLong).as("j"), col(s"z$j").as("z"))): _*)).as("e"))
        .select(col("e.j").as("j"), col("e.z").as("z"),
          (col("e.z") * col("e.z")).as("est"))
      val med = ests
        .withColumn("r", row_number().over(Window.orderBy(col("est"), col("j"))))
        .filter(col("r") === 2).select(col("est").as("est_med"))
      val exact = ev.groupBy("k").agg(count(lit(1)).as("f"))
        .agg(sum(col("f") * col("f")).as("f2_exact"))
      ests.crossJoin(broadcast(med)).crossJoin(broadcast(exact))
        .select("j", "z", "est", "est_med", "f2_exact")
        .orderBy("j")
    }),
    // Join-size estimation WITHOUT touching either join side's keys
    // together (AMS / count-min inner product — the cardinality statistic
    // a distributed optimizer keeps per join column): events.user_id ⋈
    // orders.o_custkey sketched on a shared 4×64 md5 grid; per depth the
    // bucket-wise product sum upper-bounds Σ_k f_e(k)·f_o(k), min over
    // depths is the estimate, and the exact join cardinality (via the
    // two per-key count tables, never the raw join) rides along with the
    // signed overestimate. Sketches are one pass per side, constant
    // size, mergeable — at 100 TB the two relations never co-shuffle to
    // be estimated.
    "q230_join_size_sketch" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id").cast("string").as("k"))
      val ord = Tables.orders(s, dir).select(col("o_custkey").cast("string").as("k"))
      val cmE = Sketches.countMin(ev, "k", depth = 4, width = 64)
      val cmO = Sketches.countMin(ord, "k", depth = 4, width = 64)
      val ests = Sketches.cmsInnerProduct(cmE, cmO)
        .select(col("j").cast("long").as("j"), col("est"))
      val exact = ev.groupBy("k").agg(count(lit(1)).as("ne"))
        .join(ord.groupBy("k").agg(count(lit(1)).as("no")), "k")
        .agg(coalesce(sum(col("ne") * col("no")), lit(0L)).as("exact_join_rows"))
      ests
        .crossJoin(broadcast(exact))
        .crossJoin(broadcast(ests.agg(min(col("est")).as("est_min"))))
        .select(col("j"), col("est"), col("est_min"), col("exact_join_rows"),
          (col("est") - col("exact_join_rows")).as("overestimate"))
        .orderBy("j")
    }),
    // KMV / bottom-k sketch overlap (Beyer, Haas, Reinwald, Sismanis &
    // Gemulla, SIGMOD 2007): every source pair's shingle-set Jaccard and
    // union size estimated WITHOUT a corpus join — the 100 TB shape for
    // cross-corpus overlap monitoring, where the per-source sketch is k
    // values (here k=256, sets are 1k–10k) and pairwise comparison
    // touches only sketches. Per source: the k smallest distinct 32-bit
    // gram hashes via the bounded-heap TopKPerGroup (no per-source
    // sort). Per pair: merge the two sketches, keep the k smallest of
    // the union, rho = values present in BOTH → Jaccard ≈ rho/k, and the
    // k-th minimum gives |A∪B| ≈ (k−1)·2³²/kth. The exact audit columns
    // (inter/union/Jaccard over the full gram sets) ride along at test
    // scale; at production scale the audit drops and only the 20·k-value
    // sketch table remains. All arithmetic exact int64 (divisions via
    // non-negative `div`).
    "q219_kmv_overlap" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val k = 256
      val g = Tables.documents(s, dir)
        .select(col("source"), explode(Text.wordNgramsFromText(col("text"), 3)).as("gram"))
        .distinct()
      val h = g.select(col("source"),
          conv(substring(md5(concat(lit("kmv:"), col("gram"))), 1, 8), 16, 10)
            .cast("long").as("h"))
        .distinct()
      val sk = Analytics.topKPerGroupNative(h, Seq("source"), Seq(("h", false)), k)
      val srcs = g.select("source").distinct()
      val pairs = srcs.select(col("source").as("src_a"))
        .crossJoin(srcs.select(col("source").as("src_b")))
        .filter(col("src_a") < col("src_b"))
      val pv = pairs.join(sk.select(col("source").as("src_a"), col("h")), "src_a")
          .withColumn("ina", lit(1L)).withColumn("inb", lit(0L))
        .unionByName(pairs.join(sk.select(col("source").as("src_b"), col("h")), "src_b")
          .select(col("src_a"), col("src_b"), col("h"), lit(0L).as("ina"), lit(1L).as("inb")))
      val m = pv.groupBy("src_a", "src_b", "h")
        .agg(max(col("ina")).as("ina"), max(col("inb")).as("inb"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("src_a", "src_b").orderBy("h")))
        .filter(col("rn") <= k)
        .groupBy("src_a", "src_b")
        .agg(max(col("h")).as("kth_min"),
          sum(col("ina") * col("inb")).as("rho"))
      val inter = g.select(col("source").as("src_a"), col("gram"))
        .join(g.select(col("source").as("src_b"), col("gram")), "gram")
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("inter_exact"))
      val sz = g.groupBy(col("source")).agg(count(lit(1)).as("n"))
      m.join(inter, Seq("src_a", "src_b"))
        .join(sz.select(col("source").as("src_a"), col("n").as("__na")), "src_a")
        .join(sz.select(col("source").as("src_b"), col("n").as("__nb")), "src_b")
        .select(col("src_a"), col("src_b"), lit(k.toLong).as("k"),
          col("kth_min"), col("rho"),
          expr(s"(rho * 1000000) div $k").as("jaccard_est_ppm"),
          expr(s"(${k - 1} * 4294967296) div kth_min").as("union_est"),
          col("inter_exact"),
          (col("__na") + col("__nb") - col("inter_exact")).as("union_exact"),
          expr("(inter_exact * 1000000) div (__na + __nb - inter_exact)")
            .as("jaccard_exact_ppm"))
        .orderBy("src_a", "src_b")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q49_resample_calendar" ->
      """SELECT CAST(date_trunc('year', o_orderdate) AS TIMESTAMP) AS year,
          CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
          count(*) AS n_orders,
          CAST(sum(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS revenue
          FROM orders GROUP BY 1, 2 ORDER BY month""".replaceAll("\\s+", " "),
    "q61_exact_percentiles" ->
      """SELECT o_orderpriority,
          quantile_cont(o_totalprice, 0.5) AS p50,
          quantile_cont(o_totalprice, 0.9) AS p90,
          min(o_totalprice) AS lo, max(o_totalprice) AS hi
          FROM orders GROUP BY o_orderpriority
          ORDER BY o_orderpriority""".replaceAll("\\s+", " "),
    "q66_exact_distinct" ->
      """SELECT o_orderpriority, count(*) AS n,
          count(DISTINCT o_custkey) AS n_customers
          FROM orders GROUP BY o_orderpriority
          ORDER BY o_orderpriority""".replaceAll("\\s+", " "),
    "q169_histogram_median" ->
      """WITH q AS (SELECT event_type AS g,
              CAST(floor(value * 1000000.0) AS BIGINT) AS v FROM events),
          st AS (SELECT g, min(v) AS mn, max(v) AS mx, count(*) AS n FROM q GROUP BY g),
          b AS (SELECT q.g,
              CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
                   ELSE least(CAST(15 AS BIGINT), ((v - mn) * 16) // (mx - mn + 1)) END AS bin
            FROM q JOIN st USING (g)),
          h AS (SELECT g, bin, count(*) AS c FROM b GROUP BY g, bin),
          cu AS (SELECT g, bin,
              sum(c) OVER (PARTITION BY g ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
            FROM h),
          eb AS (SELECT cu.g, min(bin) AS p50_bin FROM cu JOIN st USING (g)
                 WHERE cum >= (n + 1) // 2 GROUP BY cu.g),
          est AS (SELECT g, n, mn, mx, p50_bin,
                    mn + (p50_bin * (mx - mn + 1)) // 16 AS p50_est_fp
                  FROM eb JOIN st USING (g)),
          ex AS (SELECT g, v AS p50_exact_fp FROM
                   (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
                           count(*) OVER (PARTITION BY g) AS n2 FROM q)
                 WHERE rn = (n2 + 1) // 2)
          SELECT g AS event_type, n, mn, mx, p50_bin, p50_est_fp, p50_exact_fp,
                 p50_est_fp - p50_exact_fp AS err_fp
          FROM est JOIN ex USING (g) ORDER BY event_type""".replaceAll("\\s+", " "),
    "q158_linear_counting" ->
      """WITH b AS (SELECT DISTINCT o_orderpriority,
              ('0x' || substr(md5('lc:' || CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT
                % 4096 AS b
            FROM orders),
          h AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_buckets_hit
                FROM b GROUP BY 1),
          e AS (SELECT o_orderpriority, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
                FROM orders GROUP BY 1)
          SELECT h.o_orderpriority, h.n_buckets_hit, e.n_exact,
            CAST(floor(-4096.0 * ln((4096 - h.n_buckets_hit) / 4096.0) * 1000000.0)
              AS BIGINT) AS lc_est_fp
          FROM h JOIN e USING (o_orderpriority)
          ORDER BY o_orderpriority""".replaceAll("\\s+", " "),
    "q153_countmin_heavy" ->
      raw"""WITH t AS (SELECT unnest([ws[i] || ' ' || ws[i+1]
                  for i in range(1, len(ws))]) AS tok
                FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS ws
                      FROM documents)),
          jb AS (SELECT tok, u.j,
                   ('0x' || substr(md5(CAST(u.j AS VARCHAR) || ':' || tok), 1, 8))::BIGINT
                     % 64 AS bucket
                 FROM t CROSS JOIN unnest(range(0, 4)) AS u(j)),
          sk AS (SELECT j, bucket, CAST(count(*) AS BIGINT) AS c
                 FROM jb GROUP BY 1, 2),
          ex AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_n FROM t
                 GROUP BY tok ORDER BY exact_n DESC, tok LIMIT 20),
          est AS (SELECT e.tok, min(sk.c) AS cms_n
                  FROM ex e CROSS JOIN unnest(range(0, 4)) AS u(j)
                  JOIN sk ON sk.j = u.j AND sk.bucket =
                    ('0x' || substr(md5(CAST(u.j AS VARCHAR) || ':' || e.tok), 1, 8))::BIGINT % 64
                  GROUP BY e.tok)
          SELECT e.tok, e.exact_n, est.cms_n, est.cms_n - e.exact_n AS overestimate
          FROM ex e JOIN est USING (tok)
          ORDER BY exact_n DESC, tok""".replaceAll("\\s+", " "),
    "q231_ams_f2" ->
      """WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
          sg AS (SELECT u.j, CASE WHEN ('0x' || substr(md5(CAST(u.j AS VARCHAR)
                     || ':' || k), 1, 8))::BIGINT % 2 = 0
                   THEN 1 ELSE -1 END AS s
                 FROM ev CROSS JOIN unnest(range(0, 4)) AS u(j)),
          z AS (SELECT j, CAST(sum(s) AS BIGINT) AS z FROM sg GROUP BY j),
          e AS (SELECT CAST(j AS BIGINT) AS j, z, z * z AS est FROM z),
          m AS (SELECT est AS est_med FROM (
                  SELECT est, row_number() OVER (ORDER BY est, j) AS r FROM e)
                WHERE r = 2),
          x AS (SELECT CAST(sum(f * f) AS BIGINT) AS f2_exact FROM (
                  SELECT CAST(count(*) AS BIGINT) AS f FROM ev GROUP BY k))
          SELECT e.j, e.z, e.est, m.est_med, x.f2_exact
          FROM e, m, x ORDER BY e.j""".replaceAll("\\s+", " "),
    "q230_join_size_sketch" ->
      """WITH ek AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
          ok AS (SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders),
          ejb AS (SELECT u.j, ('0x' || substr(md5(CAST(u.j AS VARCHAR) || ':' || k),
                    1, 8))::BIGINT % 64 AS bucket
                  FROM ek CROSS JOIN unnest(range(0, 4)) AS u(j)),
          ecm AS (SELECT j, bucket, CAST(count(*) AS BIGINT) AS ca
                  FROM ejb GROUP BY 1, 2),
          ojb AS (SELECT u.j, ('0x' || substr(md5(CAST(u.j AS VARCHAR) || ':' || k),
                    1, 8))::BIGINT % 64 AS bucket
                  FROM ok CROSS JOIN unnest(range(0, 4)) AS u(j)),
          ocm AS (SELECT j, bucket, CAST(count(*) AS BIGINT) AS cb
                  FROM ojb GROUP BY 1, 2),
          est AS (SELECT e.j, CAST(sum(e.ca * o.cb) AS BIGINT) AS est
                  FROM ecm e JOIN ocm o ON o.j = e.j AND o.bucket = e.bucket
                  GROUP BY e.j),
          mn AS (SELECT CAST(min(est) AS BIGINT) AS est_min FROM est),
          ex AS (SELECT CAST(coalesce(sum(ne * no), 0) AS BIGINT) AS exact_join_rows
                 FROM (SELECT k, count(*) AS ne FROM ek GROUP BY k) a
                 JOIN (SELECT k, count(*) AS no FROM ok GROUP BY k) b USING (k))
          SELECT CAST(est.j AS BIGINT) AS j, est.est, mn.est_min,
            ex.exact_join_rows, est.est - ex.exact_join_rows AS overestimate
          FROM est, mn, ex ORDER BY est.j""".replaceAll("\\s+", " "),
    "q219_kmv_overlap" ->
      raw"""WITH gr AS (SELECT DISTINCT source, gram FROM (
              SELECT source, unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                     for i in range(1, greatest(len(toks) - 1, 1))]) AS gram
              FROM (SELECT source, regexp_split_to_array(trim(text), '\s+') AS toks
                    FROM documents))),
          hs AS (SELECT DISTINCT source,
                   ('0x' || substr(md5('kmv:' || gram), 1, 8))::BIGINT AS h FROM gr),
          sk AS (SELECT source, h FROM (
                   SELECT source, h,
                     row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM hs)
                 WHERE rn <= 256),
          sr AS (SELECT DISTINCT source FROM gr),
          p AS (SELECT a.source AS src_a, b.source AS src_b
                FROM sr a, sr b WHERE a.source < b.source),
          pv AS (SELECT p.src_a, p.src_b, sk.h, 1 AS ina, 0 AS inb
                 FROM p JOIN sk ON sk.source = p.src_a
                 UNION ALL
                 SELECT p.src_a, p.src_b, sk.h, 0 AS ina, 1 AS inb
                 FROM p JOIN sk ON sk.source = p.src_b),
          pu AS (SELECT src_a, src_b, h, max(ina) AS ina, max(inb) AS inb
                 FROM pv GROUP BY 1, 2, 3),
          pr AS (SELECT *, row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
                 FROM pu),
          m AS (SELECT src_a, src_b, max(h) AS kth_min,
                  CAST(sum(ina * inb) AS BIGINT) AS rho
                FROM pr WHERE rn <= 256 GROUP BY 1, 2),
          ie AS (SELECT ga.source AS src_a, gb.source AS src_b,
                   CAST(count(*) AS BIGINT) AS inter_exact
                 FROM gr ga JOIN gr gb ON ga.gram = gb.gram AND ga.source < gb.source
                 GROUP BY 1, 2),
          sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM gr GROUP BY 1)
          SELECT m.src_a, m.src_b, CAST(256 AS BIGINT) AS k, m.kth_min, m.rho,
            CAST((m.rho * 1000000) // 256 AS BIGINT) AS jaccard_est_ppm,
            CAST((255 * 4294967296) // m.kth_min AS BIGINT) AS union_est,
            ie.inter_exact,
            (sza.n + szb.n - ie.inter_exact) AS union_exact,
            CAST((ie.inter_exact * 1000000) // (sza.n + szb.n - ie.inter_exact) AS BIGINT)
              AS jaccard_exact_ppm
          FROM m JOIN ie ON ie.src_a = m.src_a AND ie.src_b = m.src_b
          JOIN sz sza ON sza.source = m.src_a
          JOIN sz szb ON szb.source = m.src_b
          ORDER BY m.src_a, m.src_b""".replaceAll("\\s+", " "),
    // q50's exact side replayed; the contract booleans are TRUE literals —
    // the Spark side computes them from the live sketches, so an
    // out-of-bounds sketch hash-fails the row (see the header note).
    "q50_approx_stats" ->
      """SELECT o_orderpriority,
          CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
          TRUE AS cd_within_5pct, TRUE AS p50_in_band, TRUE AS p99_in_band
          FROM orders GROUP BY o_orderpriority
          ORDER BY o_orderpriority""".replaceAll("\\s+", " ")
  )
}
