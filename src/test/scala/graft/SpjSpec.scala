package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Tx

/** Storage-partitioned joins over the table format: [[graft.sources.tx
  * .TxScan]] reports its recorded bucket layout as a
  * KeyGroupedPartitioning (bucket transform resolved through the
  * catalog's FunctionCatalog surface), so two Tx tables with the SAME
  * layout sort-merge scan-to-join with ZERO Exchange — and every
  * mismatch (different nBuckets, different key types, path reads with
  * no catalog) falls back soundly to the shuffle plan.
  */
class SpjSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_spj").toString

  private def registerCat(root: String): String = {
    val cat = s"spj${java.util.UUID.randomUUID().toString.take(8).filter(_.isLetterOrDigit)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.tx.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  private def withSpj[T](body: => T): T = {
    val keys = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("same-layout Tx join plans zero Exchange (storage-partitioned)") {
    val root = freshRoot()
    val a = (1L to 400L).map(i => (i, i * 2)).toDF("id", "va")
    val b = (1L to 400L).map(i => (i, i * 3)).toDF("id", "vb")
    Tx.commitMerge(spark, s"$root/fa", a, Seq("id"), nBuckets = 8)
    Tx.commitMerge(spark, s"$root/fb", b, Seq("id"), nBuckets = 8)
    val cat = registerCat(root)
    withSpj {
      val joined = spark.table(s"$cat.fa").hint("merge")
        .join(spark.table(s"$cat.fb"), Seq("id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"expected a sort-merge join, got:\n$plan")
      assert(!plan.contains("Exchange"),
        s"same-layout Tx tables must join with zero Exchange, got:\n$plan")
      // and the values are the plain join's
      val got = joined.orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.length == 400 && got(6) == (7L, 14L, 21L))
    }
  }

  test("mixed layouts fall back to the shuffle plan, correctly") {
    val root = freshRoot()
    val a = (1L to 100L).map(i => (i, i * 2)).toDF("id", "va")
    val b = (1L to 100L).map(i => (i, i * 3)).toDF("id", "vb")
    Tx.commitMerge(spark, s"$root/fa", a, Seq("id"), nBuckets = 8)
    Tx.commitMerge(spark, s"$root/fb", b, Seq("id"), nBuckets = 16)
    val cat = registerCat(root)
    withSpj {
      val joined = spark.table(s"$cat.fa").hint("merge")
        .join(spark.table(s"$cat.fb"), Seq("id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"),
        s"different nBuckets must NOT be declared co-partitioned:\n$plan")
      assert(joined.count() == 100L)
    }
    // different KEY TYPES under equal nBuckets: the hash is
    // type-sensitive, so the bound function's canonicalName differs and
    // the join must shuffle
    val root2 = freshRoot()
    val c = (1 to 100).map(i => (i, i * 2)).toDF("id", "vc") // int id
    Tx.commitMerge(spark, s"$root2/fa", a, Seq("id"), nBuckets = 8)
    Tx.commitMerge(spark, s"$root2/fc", c, Seq("id"), nBuckets = 8)
    val cat2 = registerCat(root2)
    withSpj {
      val fa = spark.table(s"$cat2.fa")
      val fc = spark.table(s"$cat2.fc")
      val j2 = fa.hint("merge").join(fc, fa("id") === fc("id").cast("long"))
      val plan = j2.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"),
        s"int-keyed vs long-keyed layouts must shuffle:\n$plan")
      assert(j2.count() == 100L)
    }
  }

  test("SPJ survives hash pruning on one side (partial partition values)") {
    val root = freshRoot()
    val a = (1L to 400L).map(i => (i, i * 2)).toDF("id", "va")
    val b = (1L to 400L).map(i => (i, i * 3)).toDF("id", "vb")
    Tx.commitMerge(spark, s"$root/fa", a, Seq("id"), nBuckets = 8)
    Tx.commitMerge(spark, s"$root/fb", b, Seq("id"), nBuckets = 8)
    val cat = registerCat(root)
    withSpj {
      // the pushed IN prunes fa to <=3 buckets (hash pruning); fb keeps
      // all 8 — pushPartValues aligns the partition values, so the join
      // still must be CORRECT whatever plan Spark picks
      val fa = spark.table(s"$cat.fa").filter(col("id").isin(3L, 5L, 7L))
      val joined = fa.hint("merge").join(spark.table(s"$cat.fb"), Seq("id"))
      val got = joined.orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == Seq((3L, 6L, 9L), (5L, 10L, 15L), (7L, 14L, 21L)))
    }
  }

  test("groupBy on the bucket key aggregates with zero Exchange") {
    val root = freshRoot()
    val a = (1L to 400L).map(i => (i % 50, i)).toDF("k", "v")
    Tx.commitMerge(spark, s"$root/fa",
      a.groupBy("k").agg(sum("v").as("v")).withColumn("tag",
        concat(lit("t"), col("k"))).select("k", "v", "tag"),
      Seq("k"), nBuckets = 8)
    // a second commit so buckets hold >1 row per key family
    Tx.commitMerge(spark, s"$root/fa",
      Seq((1L, 999L, "t1")).toDF("k", "v", "tag"), Seq("k"), nBuckets = 8)
    val cat = registerCat(root)
    withSpj {
      // the reported KeyGroupedPartitioning satisfies the aggregation's
      // clustered distribution — the groupBy plans NO Exchange (at
      // 100 TB: a full-table rollup on the bucket key never shuffles)
      val agg = spark.table(s"$cat.fa").groupBy("k")
        .agg(sum("v").as("sv"), count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket-key groupBy must aggregate exchange-free, got:\n$plan")
      val got = agg.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      // the second merge REPLACED key 1 (merge semantics), so its group
      // is exactly the replacement row; an untouched key keeps its sum
      assert(got(1L) == 999L)
      assert(got(2L) == (1L to 400L).filter(_ % 50 == 2).sum)
    }
  }

  test("file-sorted layout elides the join Sorts too (scan-to-merge-join)") {
    val root = freshRoot()
    val a = (1L to 2000L).map(i => (i, i * 2)).toDF("id", "va")
    val b = (1L to 2000L).map(i => (i, i * 3)).toDF("id", "vb")
    // maxRowsPerFile forces MULTI-FILE buckets: the reported ordering
    // is only sound if the reader concatenates the rolled files in
    // write order (TxBucketFiles' -cNNN counter sort)
    Tx.commitMerge(spark, s"$root/fa", a, Seq("id"), nBuckets = 4,
      fileSortCols = Seq("id"), maxRowsPerFile = 100L)
    Tx.commitMerge(spark, s"$root/fb", b, Seq("id"), nBuckets = 4,
      fileSortCols = Seq("id"), maxRowsPerFile = 100L)
    val cat = registerCat(root)
    withSpj {
      val joined = spark.table(s"$cat.fa").hint("merge")
        .join(spark.table(s"$cat.fb"), Seq("id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"storage-partitioned: no Exchange expected:\n$plan")
      // "Sort [" matches only Sort operators (SortMergeJoin prints with
      // no space): scan -> merge-join, NOTHING between
      assert(!plan.contains("Sort ["),
        s"file-sorted layout must elide the join sorts, got:\n$plan")
      val got = joined.orderBy("id").collect()
      assert(got.length == 2000 &&
        (got(6).getLong(0), got(6).getLong(1), got(6).getLong(2)) ==
          (7L, 14L, 21L))
    }
  }

  test("late-enabled file sort does NOT report ordering over old dirs") {
    val root = freshRoot()
    val a = (1L to 400L).map(i => (i, i * 2)).toDF("id", "va")
    val b = (1L to 400L).map(i => (i, i * 3)).toDF("id", "vb")
    // fa: v1 UNSORTED, then the sort declared late, then one commit
    // touching only bucket(s) of a key subset — old dirs carry no
    // .sorted marker, so the scan must NOT promise an ordering
    Tx.commitMerge(spark, s"$root/fa", a, Seq("id"), nBuckets = 4)
    Tx.setLayoutProperties(s"$root/fa", fileSortCols = Seq("id"))
    Tx.commitMerge(spark, s"$root/fa",
      Seq((1L, 111L)).toDF("id", "va"), Seq("id"), nBuckets = 4)
    Tx.commitMerge(spark, s"$root/fb", b, Seq("id"), nBuckets = 4,
      fileSortCols = Seq("id"))
    val cat = registerCat(root)
    withSpj {
      val joined = spark.table(s"$cat.fa").hint("merge")
        .join(spark.table(s"$cat.fb"), Seq("id"))
      val plan = joined.queryExecution.executedPlan.toString
      // the partitioning still aligns (zero Exchange), but fa's mixed
      // sorted/unsorted dirs force a Sort — soundness over speed
      assert(!plan.contains("Exchange"), s"no Exchange expected:\n$plan")
      assert(plan.contains("Sort ["),
        s"mixed sorted/unsorted dirs must keep the Sort, got:\n$plan")
      val got = joined.orderBy("id").collect()
      assert(got.length == 400 && got(0).getLong(1) == 111L)
    }
  }

  test("one-side shuffle: a non-Tx frame shuffles INTO the Tx layout") {
    val root = freshRoot()
    val a = (1L to 400L).map(i => (i, i * 2)).toDF("id", "va")
    Tx.commitMerge(spark, s"$root/fa", a, Seq("id"), nBuckets = 8)
    val cat = registerCat(root)
    withSpj {
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      try {
        // the other side is a PLAIN in-memory frame: Spark evaluates
        // the catalog's bucket function (TxBucketBound.produceResult)
        // to shuffle it into the Tx layout — ONE Exchange instead of
        // two, and a hash drift between produceResult and the writers'
        // layout would mis-bucket rows and drop join matches, so the
        // full-match assert below pins the two hashes equal
        val other = (1L to 400L).map(i => (i, i * 3)).toDF("id", "vb")
        val joined = spark.table(s"$cat.fa").hint("merge")
          .join(other, Seq("id"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
        val exchanges = "Exchange".r.findAllIn(plan).length
        assert(exchanges == 1,
          s"one-side shuffle expected exactly ONE Exchange, got " +
            s"$exchanges:\n$plan")
        val got = joined.orderBy("id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        assert(got.length == 400 && got(6) == (7L, 14L, 21L),
          "every key must match — a produceResult/writer hash drift " +
            "would silently drop rows")
      } finally spark.conf.unset(
        "spark.sql.sources.v2.bucketing.shuffle.enabled")
    }
  }

  test("partially-clustered dial: SPJ stays correct and exchange-free") {
    // `spark.sql.sources.v2.bucketing.partiallyClusteredDistribution
    // .enabled` is upstream's skew dial for SPJ: when a scan emits
    // MULTIPLE splits per partition key, Spark may keep one side
    // partially clustered and replicate the other instead of grouping.
    // TxScan emits exactly ONE InputPartition per bucket (a bucket
    // never fragments — Tx.scala layout invariant), so there is nothing
    // for the dial to split and the plan is pinned IDENTICAL to the
    // plain SPJ plan: zero Exchange, one task per bucket. This test
    // documents that behavior; the hot-bucket answer is the skew GATE
    // below, not this dial.
    val root = freshRoot()
    val a = (1L to 400L).map(i => (i, i * 2)).toDF("id", "va")
    val b = (1L to 400L).map(i => (i, i * 3)).toDF("id", "vb")
    Tx.commitMerge(spark, s"$root/fa", a, Seq("id"), nBuckets = 8)
    Tx.commitMerge(spark, s"$root/fb", b, Seq("id"), nBuckets = 8)
    val cat = registerCat(root)
    withSpj {
      spark.conf.set("spark.sql.sources.v2.bucketing" +
        ".partiallyClusteredDistribution.enabled", "true")
      try {
        val joined = spark.table(s"$cat.fa").hint("merge")
          .join(spark.table(s"$cat.fb"), Seq("id"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
        assert(!plan.contains("Exchange"),
          s"one split per bucket: the dial must not change the " +
            s"zero-Exchange plan, got:\n$plan")
        assert(joined.rdd.getNumPartitions == 8,
          "one task per bucket under the dial too")
        val got = joined.orderBy("id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        assert(got.length == 400 && got(6) == (7L, 14L, 21L))
      } finally spark.conf.unset("spark.sql.sources.v2.bucketing" +
        ".partiallyClusteredDistribution.enabled")
    }
  }

  test("skew gate: a pathologically hot bucket falls back to shuffle") {
    val root = freshRoot()
    // keys 1..64 carry 4 small rows each; key 7 carries 20k rows with
    // distinct ~60-byte payloads — its bucket dwarfs the median by far
    // more than the gate's default 16x
    val cold = (1L to 64L).flatMap(k => (1L to 4L).map(i =>
      (k, s"v$k-$i")))
    val hot = (1L to 20000L).map(i =>
      (7L, s"hot-payload-$i-${"x" * 40}"))
    val a = (cold ++ hot).zipWithIndex
      .map { case ((k, v), ix) => (ix.toLong, k, v) }
      .toDF("id", "k", "v")
    val dim = (1L to 64L).map(k => (k, k * 10)).toDF("k", "w")
    Tx.commitMerge(spark, s"$root/fa", a, Seq("id", "k"),
      bucketKeys = Seq("k"), nBuckets = 8)
    Tx.commitMerge(spark, s"$root/fd", dim, Seq("k"), nBuckets = 8)
    val cat = registerCat(root)
    withSpj {
      // default gate (maxSkew 16): fa's hot bucket trips it, the scan
      // declines the layout report, and the join takes the shuffle
      // plan — where AQE's skew handling CAN split the hot key
      val joined = spark.table(s"$cat.fa").hint("merge")
        .join(spark.table(s"$cat.fd"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"),
        s"the skew gate must decline SPJ for a hot bucket, got:\n$plan")
      assert(joined.count() == cold.size + hot.size)
      // dial the gate off: the layout reports again and the join is
      // storage-partitioned (zero Exchange) — the gate is advisory,
      // never load-bearing for correctness
      spark.conf.set("spark.graft.tx.spj.maxSkew", "0")
      try {
        val j2 = spark.table(s"$cat.fa").hint("merge")
          .join(spark.table(s"$cat.fd"), Seq("k"))
        val plan2 = j2.queryExecution.executedPlan.toString
        assert(!plan2.contains("Exchange"),
          s"gate disabled: same-layout join must be exchange-free:\n$plan2")
        assert(j2.count() == cold.size + hot.size)
      } finally spark.conf.unset("spark.graft.tx.spj.maxSkew")
    }
  }

  test("path reads (no catalog) stay on the sound shuffle plan") {
    val root = freshRoot()
    val a = (1L to 100L).map(i => (i, i * 2)).toDF("id", "va")
    val b = (1L to 100L).map(i => (i, i * 3)).toDF("id", "vb")
    Tx.commitMerge(spark, s"$root/fa", a, Seq("id"), nBuckets = 8)
    Tx.commitMerge(spark, s"$root/fb", b, Seq("id"), nBuckets = 8)
    withSpj {
      val joined = spark.read.format("graft-tx").load(s"$root/fa")
        .hint("merge")
        .join(spark.read.format("graft-tx").load(s"$root/fb"), Seq("id"))
      // no FunctionCatalog to resolve the transform -> partitioning is
      // ignored; the join must still be correct
      assert(joined.count() == 100L)
    }
  }
}
