package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Keyed idempotent upsert (MERGE emulation) and append sinks.
  *
  * Reference semantics (src/serve/load.py:14-51): batched
  * `INSERT … ON CONFLICT(_id) DO UPDATE SET <all non-PK cols> = excluded.<col>`
  * — i.e. incoming rows win on key collision; re-running the same batch leaves
  * the table unchanged (idempotency proven by tests/test_db_load.py:85-100).
  * Empty incoming batch is a no-op (load.py:20-22).
  *
  * Spark mapping: no transactional table format is available in this
  * environment, so MERGE is expressed relationally —
  * `existing ANTI JOIN incoming ON key, UNION ALL incoming` — and persisted by
  * atomic directory swap.
  *
  * Scale note: the anti join shuffles both sides on the key unless the table
  * is bucketed by the key (then only incoming shuffles) or incoming is small
  * enough to broadcast — [[upsert]] broadcasts automatically under
  * `autoBroadcastJoinThreshold` via AQE. On a real deployment this operator is
  * the one place a Delta/Iceberg `MERGE INTO` should replace the emulation:
  * copy-on-write rewrites only the files containing matched keys instead of
  * rewriting the table.
  */
object Merge {

  /** M1/S7: upsert as a pure query — incoming wins per key; idempotent. */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    existing.join(incoming, keys, "left_anti").unionByName(incoming)

  /** Persist an upsert result with write-temp-then-swap atomicity. */
  def upsertToPath(
      spark: SparkSession, incoming: DataFrame, path: String, keys: Seq[String]): Unit = {
    if (incoming.isEmpty) return // reference: empty batch is a no-op
    val target = Paths.get(path)
    val merged =
      if (Files.exists(target)) upsert(spark.read.parquet(path), incoming, keys)
      else incoming
    val tmp = path.stripSuffix("/") + ".__graft_tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val bak = path.stripSuffix("/") + ".__graft_bak"
    val bakPath = Paths.get(bak)
    deleteRecursive(bakPath)
    if (Files.exists(target)) Files.move(target, bakPath, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursive(bakPath)
  }

  /** Scale-safe MERGE: hash-bucket-partitioned sink where an upsert rewrites
    * ONLY the partitions containing incoming keys (reference semantics
    * unchanged: src/serve/load.py:30-48 touches only incoming `_id`s).
    *
    * Layout: `path/<partCol>=<b>/...` with `b = pmod(xxhash64(keys), numBuckets)`
    * — a pure function of the merge keys, so a key's rows can never migrate
    * between partitions and the anti join stays correct against the pruned
    * read. The merge plan reads only touched partitions (directory-level
    * partition pruning via the `isin` filter) and the write uses dynamic
    * partition overwrite, so untouched partitions' files are not even opened.
    * Per hourly batch at a 100 TB sink this rewrites `touched/numBuckets` of
    * the table instead of all of it.
    *
    * Single-writer (as the reference's hourly scheduler is); dynamic
    * overwrite commits per-partition via staging-dir rename, so a crash
    * mid-commit can leave a subset of touched partitions updated — rerun the
    * batch (idempotent per key) to converge.
    */
  def upsertPartitioned(
      spark: SparkSession,
      incoming: DataFrame,
      path: String,
      keys: Seq[String],
      numBuckets: Int = 64,
      partCol: String = "p_bucket"): Unit = {
    // Stage the incoming plan ONCE: the merge needs three actions over it
    // (empty probe, touched-partition collect, the write), and an expensive
    // incoming plan — a dedup join, a gram decontamination — must not be
    // re-executed per action. Released before returning.
    val withP = incoming.withColumn(
      partCol, pmod(xxhash64(keys.map(col): _*), lit(numBuckets)).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE probe pass answers the empty check AND the touched-partition
      // set (r16, the Tx.commitRewrite bucket-probe fusion applied to the
      // hive sink): the old isEmpty was a separate job — and a FULL scan
      // of the staged frame whenever the batch was empty — before the
      // distinct().collect() ran anyway. partCol here is pmod(xxhash64),
      // never null, so the probe keys are the exact directory set.
      val touched = withP.groupBy(partCol).agg(count(lit(1)))
        .collect().map(_.getInt(0)).toSeq
      if (touched.isEmpty) return // reference: empty batch is a no-op
      // The bucket count is part of the sink's on-disk contract: rows land in
      // pmod(hash, N), so merging with a different N would let a key's rows
      // migrate partitions — the pruned anti-join would miss the conflict and
      // silently duplicate keys. Record N beside the data (underscore-prefixed
      // → invisible to parquet directory reads) and refuse a mismatched merge.
      val marker = Paths.get(path, "_graft_buckets")
      if (!Files.exists(Paths.get(path))) {
        withP.write.partitionBy(partCol).mode(SaveMode.Overwrite).parquet(path)
        Files.writeString(marker, numBuckets.toString)
        return
      }
      if (Files.exists(marker)) {
        val recorded = Files.readString(marker).trim.toInt
        require(recorded == numBuckets,
          s"sink at $path is bucketed with $recorded buckets; upsert called with " +
            s"$numBuckets — keys would migrate partitions and the merge would " +
            "silently duplicate them. Rewrite the sink to change bucketing.")
      } else Files.writeString(marker, numBuckets.toString) // pre-marker sink: adopt
      val existing = spark.read.parquet(path)
        .filter(col(partCol).isin(touched: _*)) // prunes to touched directories
      upsert(existing, withP, keys)
        .write.partitionBy(partCol).mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic") // replace ONLY written partitions
        .parquet(path)
    } finally withP.unpersist(blocking = false)
  }

  /** [[upsertPartitioned]] with a DOMAIN partition column that already
    * exists on the incoming frame — e.g. an IVF index's centroid
    * assignment, where the layout must be partitioned by the quantizer's
    * output so a probe can prune to its nProbe buckets
    * ([[graft.queries.SimilarityQueries]] q111/q132).
    *
    * Contract: `partCol` must be a DETERMINISTIC function of the merge
    * keys for the life of the sink (for IVF: the quantizer is frozen and a
    * vector's embedding never changes), for the same reason
    * [[upsertPartitioned]] derives its bucket from the keys — if a key's
    * rows could migrate partitions between batches, the pruned anti-join
    * would miss the old copy and silently duplicate the key. Same
    * touched-partitions-only merge plan: read prunes to incoming partCol
    * values, write commits via dynamic partition overwrite, untouched
    * buckets' files are never opened.
    */
  def upsertPartitionedBy(
      spark: SparkSession,
      incoming: DataFrame,
      path: String,
      keys: Seq[String],
      partCol: String): Unit = {
    // Stage once — three actions (empty probe, touched collect, write) must
    // not re-execute an expensive incoming plan (e.g. an IVF assignment).
    val staged = incoming.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE probe pass answers empty + touched set + the null guard (r16
      // probe fusion — groupBy keeps a null group, so a null partition
      // value surfaces as a null probe key): the old shape paid an
      // isEmpty job, then on the initial branch a null-filter FULL scan,
      // then the distinct().collect().
      val touched = staged.groupBy(partCol).agg(count(lit(1)))
        .collect().map(_.get(0)).toSeq
      if (touched.isEmpty) return // reference: empty batch is a no-op
      if (!Files.exists(Paths.get(path))) {
        require(!touched.contains(null),
          s"NULL $partCol in initial write to $path — null rows land in the " +
            "hive default partition, which later pruned merges (isin over " +
            "touched values) can never match, so their keys would silently " +
            "duplicate. The partition column must be non-null by contract.")
        staged.write.partitionBy(partCol).mode(SaveMode.Overwrite).parquet(path)
        return
      }
      // A NULL partition value would land in __HIVE_DEFAULT_PARTITION__ while
      // the pruned read's isin(touched) never matches null — an existing row
      // under the null partition would dodge the anti-join and its key would
      // duplicate. Refuse rather than merge wrong; the probe above already
      // surfaces the null, so the guard costs no extra pass.
      require(!touched.contains(null),
        s"NULL $partCol in incoming batch for $path — the partition column " +
          "must be a non-null deterministic function of the merge keys.")
      val existing = spark.read.parquet(path)
        .filter(col(partCol).isin(touched: _*)) // prunes to touched directories
      upsert(existing, staged, keys)
        .write.partitionBy(partCol).mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic") // replace ONLY written partitions
        .parquet(path)
    } finally staged.unpersist(blocking = false)
  }

  /** Maintenance for the partitioned sink: every hourly upsert rewrites its
    * touched partitions as fresh files, so a bucket that keeps receiving
    * small batches accumulates small files until scans pay per-file open
    * cost — the classic long-lived-sink failure mode. Compaction rewrites
    * ONLY buckets holding >= `minFilesToCompact` part-files, coalescing
    * each to a single file via one hash repartition on the partition
    * column (all of a bucket's rows land in one task → one file), and
    * commits with dynamic partition overwrite so untouched buckets' files
    * are not even opened. Data is byte-for-byte the same rows, just
    * repacked. Returns the compacted bucket ids.
    *
    * File listing is driver-side java.nio (this environment is a local
    * FS); a cluster deployment swaps in the Hadoop FileSystem listing —
    * the plan shape (pruned read, dynamic overwrite) is unchanged.
    */
  def compactPartitioned(
      spark: SparkSession,
      path: String,
      minFilesToCompact: Int = 2,
      partCol: String = "p_bucket"): Seq[Int] = {
    import scala.jdk.CollectionConverters._
    val root = Paths.get(path)
    require(Files.exists(root), s"no sink at $path")
    val prefix = partCol + "="
    // both list streams hold directory handles — close them eagerly
    def listNames(d: java.nio.file.Path): Seq[String] = {
      val st = Files.list(d)
      try st.iterator().asScala.map(_.getFileName.toString).toSeq
      finally st.close()
    }
    val toCompact = listNames(root)
      .filter(n => n.startsWith(prefix) && Files.isDirectory(root.resolve(n)))
      .filter(n => listNames(root.resolve(n))
        .count(_.endsWith(".parquet")) >= minFilesToCompact)
      .map(_.stripPrefix(prefix).toInt)
      .sorted
    if (toCompact.isEmpty) return Nil
    spark.read.parquet(path)
      .filter(col(partCol).isin(toCompact: _*)) // directory-pruned read
      .repartition(col(partCol)) //                one task (= one file) per bucket
      .write.partitionBy(partCol).mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .parquet(path)
    toCompact
  }

  /** S8: append-only metrics sink (run history). */
  /** Keyed DELETE on the bucket-partitioned sink — the inverse of
    * [[upsertPartitioned]] and the mechanics of a takedown / opt-out /
    * right-to-be-forgotten pass at 100 TB: the delete-key list maps to
    * its buckets through the SAME pmod(xxhash64) the sink was written
    * with, only the touched partitions are read (directory pruning) and
    * anti-joined, and the rewrite commits via dynamic partition
    * overwrite — untouched buckets' files are never opened. Idempotent:
    * re-running the same delete list is a no-op.
    *
    * The bucket-count marker contract of [[upsertPartitioned]] applies
    * unchanged (a mismatched N would prune to the WRONG buckets and
    * silently miss rows).
    */
  def deletePartitioned(
      spark: SparkSession,
      deleteKeys: DataFrame,
      path: String,
      keys: Seq[String],
      numBuckets: Int = 64,
      partCol: String = "p_bucket"): Unit = {
    val withP = deleteKeys.select(keys.map(col): _*).distinct()
      .withColumn(partCol, pmod(xxhash64(keys.map(col): _*), lit(numBuckets)).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // same single-probe fusion as upsertPartitioned: empty check +
      // touched set in one job (partCol = pmod(xxhash64), never null)
      val touched = withP.groupBy(partCol).agg(count(lit(1)))
        .collect().map(_.getInt(0)).toSeq
      if (touched.isEmpty) return
      val marker = Paths.get(path, "_graft_buckets")
      if (Files.exists(marker)) {
        val recorded = Files.readString(marker).trim.toInt
        require(recorded == numBuckets,
          s"sink at $path is bucketed with $recorded buckets; delete called with " +
            s"$numBuckets — pruning would miss the keys' actual partitions.")
      }
      val existing = spark.read.parquet(path)
        .filter(col(partCol).isin(touched: _*))
      val survivors = existing.join(withP, keys, "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // dynamic overwrite only replaces partitions PRESENT in the written
        // data — a bucket whose every row was deleted would silently keep
        // its old files. Remove those directories explicitly.
        val kept = survivors.select(partCol).distinct().collect().map(_.getInt(0)).toSet
        survivors
          .write.partitionBy(partCol).mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .parquet(path)
        (touched.toSet -- kept).foreach { b =>
          deleteRecursive(Paths.get(path, s"$partCol=$b"))
        }
      } finally survivors.unpersist(blocking = false)
    } finally withP.unpersist(blocking = false)
  }

  /** Merkle-style bucket fingerprints — the anti-entropy primitive for
    * comparing two copies of a table (sink vs re-export, primary vs
    * replica) WITHOUT a row-by-row join: each row hashes to a 60-bit
    * md5 integer over its canonical column string, rows bucket by key
    * hash, and a bucket's fingerprint is the exact XOR of its row hashes
    * (order- and partitioning-independent — xor commutes and stays in
    * int64, never widening; a sum would silently promote to HUGEINT /
    * decimal128 in other engines and break typed-value comparison). Two
    * copies agree iff all `buckets` fingerprints agree; a diff localizes
    * to its buckets, so repair reads only those — the Cassandra/DynamoDB
    * anti-entropy idea as one map-side-combined aggregation.
    *
    * XOR caveat: a row appearing an EVEN number of times cancels out of
    * its bucket fingerprint. The canonical string includes the key, so
    * this only matters for full-row duplicates — which a keyed
    * (upserted) table does not contain; `n_rows` still catches pure
    * duplication either way.
    *
    * Columns are canonicalized as strings joined with '|', NULL as a
    * sentinel; callers pass integer/string columns (cast floats to a
    * fixed-point grid first — engine float-formatting is not canonical).
    *
    * Returns (bucket, n_rows, fp), one row per occupied bucket.
    */
  def bucketFingerprints(df: DataFrame, key: Column, cols: Seq[Column], buckets: Int): DataFrame = {
    require(buckets >= 1 && buckets <= (1 << 20), s"bad bucket count $buckets")
    val canon = concat_ws("|",
      cols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*)
    df.select(
        pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
          lit(buckets.toLong)).as("bucket"),
        conv(substring(md5(canon), 1, 15), 16, 10).cast("long").as("__h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(__h)").as("fp"))
  }

  def appendMetrics(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  private def deleteRecursive(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      // close the walk stream (it holds directory handles open)
      val st = Files.walk(p)
      try st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
      finally st.close()
    }
}
