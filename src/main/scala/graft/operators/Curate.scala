package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators that decide WHAT goes into a training run:
  * token-budgeted source mixing, deterministic training order, first-seen
  * n-gram novelty, and the quality-prune curve. Everything here follows the
  * repo's determinism contract: membership and ordering decisions come from
  * md5 buckets or exact integer arithmetic, never engine RNG or float
  * accumulation, so results are identical across runs, engines, cluster
  * sizes and partitionings — which is what puts each op under the DuckDB
  * oracle gate.
  */
object Curate {

  /** Downsample each stratum (source/domain/language) to approximately
    * `budget(stratum)` tokens — the "assemble a mix with N tokens of web,
    * M of code" primitive of training-data curation.
    *
    * A row is kept iff `bucket(key) · T_stratum < 10000 · B_stratum` where
    * `T` is the stratum's total token count and `B` its budget: exactly the
    * deterministic [[Sampling.hashBucket]] membership at rate `B/T`, but
    * expressed as a cross-multiplication so BOTH engines decide with pure
    * int64 arithmetic — no division, no float threshold to diverge. A
    * stratum under budget (T ≤ B) keeps every row; smaller budgets keep
    * strict subsets of larger ones (the threshold is monotonic in B).
    *
    * Scale shape: one map-side-combined agg produces the per-stratum totals
    * (rows = #strata, tiny), broadcast-joined back; the membership test is
    * then a codegen'd filter on the fact side — the corpus itself never
    * shuffles. int64 overflow headroom: bucket < 10⁴, so T_stratum up to
    * ~9·10¹⁴ tokens (≈ 3.6 PB of text) is safe.
    */
  def tokenBudget(
      df: DataFrame,
      key: Column,
      stratum: Column,
      tokens: Column,
      budgets: Map[String, Long],
      default: Long): DataFrame = {
    require(default >= 0 && budgets.values.forall(_ >= 0), "budgets must be >= 0")
    val budgetCol = budgets.foldLeft(lit(default)) { case (acc, (s, b)) =>
      when(col("__stratum") === s, lit(b)).otherwise(acc)
    }
    val tagged = df
      .withColumn("__stratum", stratum)
      .withColumn("__tok", tokens.cast("long"))
    val totals = tagged.groupBy("__stratum").agg(sum("__tok").as("__total"))
    tagged
      .join(broadcast(totals), "__stratum")
      .filter(Sampling.hashBucket(key) * col("__total") < lit(10000L) * budgetCol)
      .drop("__stratum", "__tok", "__total")
  }

  /** Deterministic training order: assign every row a shard and a dense
    * rank within its shard, ordered by md5("ord:" ∥ key) — a reproducible
    * global shuffle of the corpus (the step before writing training shards
    * consumed sequentially by data loaders). Adds `shard` and `pos`.
    *
    * Scale shape: the window hash-exchanges on `shard` and sorts within —
    * precisely the physical plan of the shard-write itself
    * (`repartition(shard) + sortWithinPartitions`), so the numbering costs
    * nothing extra at write time. One task holds one shard: pick `nShards`
    * so a shard fits a task (at 100 TB, ~50k shards of ~2 GB), which is
    * also the shard size a training data loader wants.
    */
  def trainingOrder(df: DataFrame, key: Column, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val okey = md5(concat(lit("ord:"), key.cast("string")))
    df.withColumn("__okey", okey)
      .withColumn("shard",
        conv(substring(col("__okey"), 1, 8), 16, 10).cast("long") % nShards)
      .withColumn("pos",
        row_number().over(
          Window.partitionBy("shard").orderBy(col("__okey"), key)).cast("long"))
      .drop("__okey")
  }

  /** Sequence-packing manifest (GPT-style concat-and-chunk): lay the
    * corpus out in [[trainingOrder]]'s deterministic order, concatenate
    * token streams shard after shard, and cut fixed `seqLen`-token
    * training sequences — each document's manifest row records its global
    * token offset and which sequences it lands in (`first_seq`…`last_seq`,
    * crossing boundaries when it straddles a cut). The step between
    * curation and the trainer's fixed-shape batches.
    *
    * Scale shape: a global running total WITHOUT a global window. The
    * within-shard prefix sum runs under the same hash-exchange-on-shard +
    * sort plan as the shard write itself; cross-shard offsets come from a
    * #shards-row aggregate whose own cumsum window is bounded by the shard
    * count (at 100 TB: ~50k rows) and joins back broadcast. A naive
    * `Window.orderBy` cumsum would move the corpus to ONE task — the
    * single-partition cliff this shape exists to avoid.
    *
    * Adds: `doc_start` (global token offset), `first_seq`, `last_seq`,
    * `n_seqs` (sequences this doc contributes to).
    */
  def packingManifest(
      df: DataFrame,
      key: Column,
      tokens: Column,
      nShards: Int,
      seqLen: Long): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val ordered = trainingOrder(df.withColumn("__tok", tokens.cast("long")), key, nShards)
    val wIn = Window.partitionBy("shard").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPrefix = ordered.withColumn("__cum", sum(col("__tok")).over(wIn))
    val wOff = Window.orderBy("shard") // #shards rows only — bounded
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ordered.groupBy("shard").agg(sum("__tok").as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .select("shard", "__off")
    withPrefix.join(broadcast(offsets), "shard")
      .withColumn("doc_start", col("__off") + col("__cum") - col("__tok"))
      .withColumn("first_seq", floor(col("doc_start") / seqLen).cast("long"))
      .withColumn("last_seq",
        floor((col("doc_start") + greatest(col("__tok"), lit(1L)) - 1) / seqLen).cast("long"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
      .drop("__tok", "__cum", "__off")
  }

  /** Curriculum training order: documents stream in phases (an integral
    * `phase` column — e.g. quality bands, best first), deterministically
    * md5-shuffled WITHIN a phase, sharded for parallel writes. Within each
    * shard positions run phase 0 first, then phase 1, ... so a loader
    * reading shards sequentially sees the curriculum.
    *
    * Scale shape: identical to [[trainingOrder]] — one hash exchange on
    * `shard` + sort-within, which IS the shard-write plan; the phase must
    * be computable without a global pass (fixed-width bands of an exact
    * integer score, never ntile/percent_rank, so ordering is reproducible
    * in any engine and stable as the corpus grows).
    */
  def curriculumOrder(df: DataFrame, key: Column, phase: Column, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val okey = md5(concat(lit("cur:"), key.cast("string")))
    df.withColumn("phase", phase.cast("long"))
      .withColumn("__okey", okey)
      .withColumn("shard",
        conv(substring(col("__okey"), 1, 8), 16, 10).cast("long") % nShards)
      .withColumn("pos",
        row_number().over(
          Window.partitionBy("shard").orderBy(col("phase"), col("__okey"), key)).cast("long"))
      .drop("__okey")
  }

  /** First-seen n-gram novelty per document: the fraction of a doc's
    * distinct n-gram hashes whose corpus-wide first occurrence (minimum id)
    * is this doc. Low novelty = the doc restates earlier content — the
    * contribution signal behind "prune documents that add nothing new".
    * Docs with fewer than `n` tokens have no n-grams and are absent from
    * the output.
    *
    * Scale shape: the classic inverted-index pair of passes — explode to
    * (gram-hash, id), map-side-combined min per gram, then an equi-join
    * back on the gram hash (both sides already clustered on it, so AQE
    * reuses the exchange). Shuffles carry 8-byte hashes, never text.
    */
  def noveltyScore(df: DataFrame, idCol: String, toksColName: String, n: Int): DataFrame = {
    val grams = df.select(
      col(idCol), explode(TextDedup.shingleHashes(toksColName, n)).as("__g"))
    val firstSeen = grams.groupBy("__g").agg(min(col(idCol)).as("__first"))
    grams
      .join(firstSeen, "__g")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col(idCol) === col("__first"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", col("n_novel").cast("double") / col("n_grams"))
  }

  /** Quality-prune curve: bucket the corpus into `buckets` quality
    * quantiles and report docs/tokens per bucket — the table behind "what
    * do we lose if we cut the bottom 20%?".
    *
    * Exact ntile needs a TOTAL sort of the corpus; at 100 TB that is the
    * wrong plan. Instead quality is quantized onto an integer grid
    * (`floor(q·grid)`, the repo's float-quantization rule), the corpus
    * aggregates to ≤ grid+1 cells in ONE map-side-combined pass, and
    * quantile boundaries are assigned to cells from the cumulative doc
    * count — a window over at most `grid+1` rows, constant-size however
    * large the corpus. Docs in the same grid cell share a bucket (that is
    * the advertised semantic: histogram quantiles at grid resolution).
    * Bucket ids and boundaries are pure integer/IEEE-identical arithmetic,
    * so the whole curve hash-matches cross-engine.
    */
  def pruneCurve(
      df: DataFrame,
      quality: Column,
      weight: Column,
      buckets: Int = 10,
      grid: Int = 10000): DataFrame = {
    require(buckets > 0 && grid >= buckets, "need buckets > 0 and grid >= buckets")
    val cells = df
      .groupBy(floor(quality * grid).cast("long").as("cell"))
      .agg(count(lit(1)).as("n_docs"), sum(weight.cast("long")).as("n_tokens"))
    val total = cells.agg(sum("n_docs").as("__total"))
    val cum = Window.orderBy("cell")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .crossJoin(broadcast(total))
      .withColumn("__before", sum(col("n_docs")).over(cum) - col("n_docs"))
      .withColumn("bucket",
        least(
          floor(col("__before").cast("double") * buckets / col("__total")) + 1L,
          lit(buckets.toLong)).cast("long"))
      .groupBy("bucket")
      .agg(
        sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"),
        min("cell").as("min_cell"), max("cell").as("max_cell"))
      .orderBy("bucket")
  }
}
