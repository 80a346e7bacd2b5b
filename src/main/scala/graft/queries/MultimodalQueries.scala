package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal-plumbing queries. The media table is synthesized
  * deterministically from `documents` (utf-8 payloads — the corpus text is
  * pure ASCII, so DuckDB can recompute every byte-level feature with
  * `unicode()` on character slices). The JVM side runs the REAL pipeline —
  * typed Dataset → mapPartitions → FakeCodec — and the oracle reimplements
  * the codec arithmetic in SQL, so the whole batch shape is value-checked.
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  private def media(s: SparkSession, dir: String) =
    Multimodal.mediaFromDocuments(s, Tables.documents(s, dir))

  /** DuckDB: list of byte values (== code points; ASCII corpus). */
  private val BytesSql =
    "[unicode(text[i:i]) for i in range(1, len(text) + 1)]"

  val queries: Map[String, Q] = Map(
    // Full decode/feature pipeline via mapPartitions (batch-shaped codec
    // calls), features verified value-for-value by the SQL oracle.
    "q41_media_features" -> ((s, dir) => {
      Multimodal.extractFeatures(media(s, dir)).toDF()
        .select(
          col("media_id"), col("kind"), col("n_bytes"), col("byte_mean"),
          concat_ws(",", col("histogram")).as("histogram"),
          // fixed-point view of the float embedding: floor(v·1e6) is
          // identical in every IEEE engine (no decimal-rounding ties)
          concat_ws(",",
            transform(col("embedding"), v => floor(v.cast("double") * 1e6).cast("long")))
            .as("embedding"))
        .orderBy("media_id")
    }),
    // PERCEPTUAL near-duplicate pairs over media payloads — the dHash
    // device (gradient hash: 61 byte samples on an even grid, bit i set
    // iff sample i > sample i+1) on the stub codec's bytes: q121 catches
    // bit-exact copies only; a re-encoded asset with ONE changed header
    // byte (the planted perturbation here) defeats md5 but flips only
    // the hash bits whose samples straddle the change, so it surfaces at
    // hamming <= 6. Candidates come from the 7×8-bit banding (complete
    // for hamming<=6, same machinery as SimHash q35) — signatures, never
    // payloads, cross the wire. dHash over aHash deliberately: the
    // mean-threshold variant embeds a second fold inside the bit lambda,
    // and interpreted HOFs re-evaluate it per element (a measured
    // 99-second query at sf0.1); the gradient form needs only the sample
    // array, whose 120 references also keep CollapseProject from
    // inlining it — samples are computed once per row. Byte value ==
    // code point on this ASCII corpus (the BytesSql convention), all
    // arithmetic exact int64.
    "q236_media_phash" -> ((s, dir) => {
      val base = Tables.documents(s, dir).select(col("doc_id").as("media_id"), col("text"))
      val aug = base.unionByName(
        base.filter(col("media_id") % 13 === 0).select(
          (col("media_id") + 200000).as("media_id"),
          concat(lit("X"), expr("substring(text, 2)")).as("text")))
      // staged barrier: without it CollapseProject inlines the sample
      // transform into all 120 references of the bit lambda and the
      // interpreted HOF re-runs 61 substr calls per reference (the
      // simhashPairs 40x-recompute lesson; measured 104 s at sf0.1)
      val sampled = graft.sources.Stage.through(aug
        .withColumn("__s", expr(
          "transform(sequence(0, 60), i -> CAST(ascii(substr(text," +
            " CAST(1 + (i * (length(text) - 1)) div 61 AS INT), 1)) AS BIGINT))"))
        .select(col("media_id"), col("__s")))
      val hashed = sampled
        .withColumn("ahash", expr(
          "aggregate(transform(sequence(0, 59), i ->" +
            " IF(element_at(__s, i + 1) > element_at(__s, i + 2)," +
            " shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))," +
            " CAST(0 AS BIGINT), (a, x) -> a + x)"))
        .select("media_id", "ahash")
      graft.operators.TextDedup.simhashPairs(hashed, "media_id", "ahash", maxHamming = 6)
        .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"), col("hamming"))
        .orderBy("media_a", "media_b")
    }),
    // Metadata-only scan: never touches the payload column (column
    // pruning keeps 100 TB of media bytes unread).
    // Payload integrity audit: every media row carries the checksum
    // computed at ingest; recomputing md5 over the (possibly corrupted —
    // every 101st row gets an appended byte in-plan) payload localizes
    // silent bit-rot per kind with the first corrupt id for triage. The
    // check never decodes — it reads bytes and hashes, which is why it
    // can run on 100 TB of media cheaply.
    "q216_media_integrity" -> ((s, dir) => {
      val m = media(s, dir).toDF().withColumn("checksum", md5(col("content")))
      val corrupted = m.withColumn("content",
        when(col("media_id") % 101 === 0,
          concat(col("content"), encode(lit("X"), "UTF-8")))
          .otherwise(col("content")))
      corrupted.withColumn("ok", md5(col("content")) === col("checksum"))
        .groupBy("kind")
        .agg(count(lit(1)).as("n_rows"), count_if(!col("ok")).as("n_corrupt"),
          min(when(!col("ok"), col("media_id"))).as("first_corrupt"))
        .orderBy("kind")
    }),
    "q42_media_meta" -> ((s, dir) => {
      media(s, dir).toDF()
        .groupBy("kind")
        .agg(
          count(lit(1)).as("n"),
          sum(col("duration_ms")).as("total_ms"),
          max(col("width")).as("max_width"),
          max(col("sample_rate")).as("max_rate"))
        .orderBy("kind")
    }),
    // Payload-level exact media dedup: digest the OPAQUE bytes (md5 over
    // the binary column — never decoded), group, and report duplicate
    // groups with their canonical id and how many declared modalities the
    // identical payload appears under (re-ingested bytes relabeled as a
    // different kind — a real ingest pathology). Copies planted at
    // media_id+200000 (kind recomputed from the new id, so groups span
    // kinds). One uniform 16-byte-digest shuffle; content never moves.
    "q121_media_dedup" -> ((s, dir) => {
      val m = media(s, dir).toDF().select("media_id", "kind", "content")
      val kinds = array(lit("image"), lit("audio"), lit("video"))
      val aug = m.unionByName(
        m.filter(col("media_id") % 13 === 0).select(
          (col("media_id") + 200000).as("media_id"),
          element_at(kinds, ((col("media_id") + 200000) % 3).cast("int") + 1).as("kind"),
          col("content")))
      aug.groupBy(md5(col("content")).as("digest"))
        .agg(count(lit(1)).as("n_copies"),
          min("media_id").as("canonical_id"),
          countDistinct("kind").as("n_kinds"))
        .filter(col("n_copies") > 1)
        .orderBy("digest")
    }),
    // Frame sampling stub: every other 64-byte window of each video
    // payload becomes a "frame" row (media_id, frame_idx, frame_bytes).
    "q43_frame_sample" -> ((s, dir) => {
      val videos = media(s, dir).filter(col("kind") === "video")
      import videos.sparkSession.implicits._
      videos.flatMap { r =>
        Multimodal.FakeCodec.sampleFrames(r.content, 64).zipWithIndex.map {
          case (chunk, k) => (r.media_id, k.toLong * 2, chunk.length)
        }
      }.toDF("media_id", "frame_idx", "frame_bytes")
        .orderBy("media_id", "frame_idx")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q41_media_features" ->
      s"""WITH b AS (SELECT doc_id AS media_id,
            ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
            $BytesSql AS bytes FROM documents)
          SELECT media_id, kind, len(bytes) AS n_bytes,
            CAST(list_sum(bytes) AS DOUBLE) / len(bytes) AS byte_mean,
            array_to_string([len(list_filter(bytes, x -> (x >> 4) = h))::BIGINT
                             for h in range(0, 16)], ',') AS histogram,
            array_to_string([CAST(floor(CAST(
                CAST(list_sum([bytes[i] for i in range(1, len(bytes) + 1)
                               if (i - 1) % 8 = d]) % 997 AS FLOAT)
                / CAST(997 AS FLOAT) AS DOUBLE) * 1000000.0) AS BIGINT)
              for d in range(0, 8)], ',') AS embedding
          FROM b ORDER BY media_id""".replaceAll("\\s+", " "),
    "q236_media_phash" ->
      """WITH m AS (
            SELECT doc_id AS media_id, text FROM documents
            UNION ALL
            SELECT doc_id + 200000, 'X' || substr(text, 2)
            FROM documents WHERE doc_id % 13 = 0),
          sm AS (
            SELECT media_id,
              [unicode(text[(1 + (i * (length(text) - 1)) // 61)
                 :(1 + (i * (length(text) - 1)) // 61)])
               for i in range(0, 61)] AS s
            FROM m),
          h AS (
            SELECT media_id,
              CAST(list_sum([CASE WHEN s[i+1] > s[i+2] THEN 1 << i ELSE 0 END
                for i in range(0, 60)]) AS BIGINT) AS ahash
            FROM sm)
          SELECT a.media_id AS media_a, b.media_id AS media_b,
            CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
          FROM h a JOIN h b ON a.media_id < b.media_id
          WHERE bit_count(xor(a.ahash, b.ahash)) <= 6
          ORDER BY media_a, media_b""".replaceAll("\\s+", " "),
    "q216_media_integrity" ->
      """WITH m AS (SELECT doc_id AS media_id,
              ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
              text, md5(text) AS checksum
            FROM documents),
          c AS (SELECT media_id, kind, checksum,
              CASE WHEN media_id % 101 = 0 THEN text || 'X' ELSE text END AS content
            FROM m)
          SELECT kind, CAST(count(*) AS BIGINT) AS n_rows,
            CAST(count(*) FILTER (md5(content) <> checksum) AS BIGINT) AS n_corrupt,
            min(CASE WHEN md5(content) <> checksum THEN media_id END) AS first_corrupt
          FROM c GROUP BY kind ORDER BY kind""".replaceAll("\\s+", " "),
    "q121_media_dedup" ->
      """WITH m AS (
            SELECT doc_id AS media_id,
              ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind, text
            FROM documents
            UNION ALL
            SELECT doc_id + 200000,
              ['image','audio','video'][CAST((doc_id + 200000) % 3 AS INT) + 1], text
            FROM documents WHERE doc_id % 13 = 0)
          SELECT md5(text) AS digest, count(*) AS n_copies,
            min(media_id) AS canonical_id, count(DISTINCT kind) AS n_kinds
          FROM m GROUP BY 1 HAVING count(*) > 1
          ORDER BY digest""".replaceAll("\\s+", " "),
    "q42_media_meta" ->
      """SELECT ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
          count(*) AS n,
          CAST(sum(CASE WHEN doc_id % 3 <> 0 THEN n_chars * 10 ELSE 0 END) AS BIGINT) AS total_ms,
          max(CASE WHEN doc_id % 3 = 0 THEN 640 ELSE 0 END) AS max_width,
          max(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END) AS max_rate
          FROM documents GROUP BY 1 ORDER BY kind""".replaceAll("\\s+", " "),
    "q43_frame_sample" ->
      """WITH v AS (SELECT doc_id AS media_id, len(text) AS n FROM documents
                    WHERE doc_id % 3 = 2),
          f AS (SELECT media_id,
                  unnest([i for i in range(0, CAST(ceil(n / 64.0) AS BIGINT)) if i % 2 = 0]) AS frame_idx,
                  n FROM v)
          SELECT media_id, frame_idx, CAST(least(64, n - frame_idx * 64) AS INT) AS frame_bytes
          FROM f ORDER BY media_id, frame_idx""".replaceAll("\\s+", " ")
  )
}
