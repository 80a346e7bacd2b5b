package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Align, Cast, Dedup}
import graft.sources.Merge

/** Property tests for the invariants the reference asserts only by example
  * (SURVEY.md §5.2): dedup uniqueness, upsert idempotency, align-schema
  * column contract, lenient casts never throwing. Uses raw ScalaCheck Gen
  * with a fixed seed (the scalatest-scalacheck bridge is not available in
  * this offline environment).
  */
class PropertySpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  /** Deterministic sampling loop standing in for forAll. */
  private def forAllSamples[A](gen: Gen[A], n: Int = 12)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(42L + i)).foreach(check)
    }

  private val rowsGen: Gen[List[(Long, Long, Double)]] =
    Gen.listOfN(40, for {
      id <- Gen.chooseNum(1L, 12L) // small domains force duplicates
      t <- Gen.chooseNum(0L, 8L)
      v <- Gen.chooseNum(-100.0, 100.0)
    } yield (id, t * 3600000L, v))

  test("property: composed dedup yields unique _id AND unique DATETIME") {
    forAllSamples(rowsGen) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("_id", "ms", "v")
          .withColumn("DATETIME", timestamp_millis(col("ms"))).drop("ms")
        val out = Dedup.dedupKeepLast(df)
        val n = out.count()
        assert(out.select("_id").distinct().count() == out.select("_id").count())
        assert(out.select("DATETIME").distinct().count() == n)
        // dedup never invents rows
        assert(n <= rows.length)
      }
    }
  }

  test("property: upsert is idempotent and key-complete") {
    forAllSamples(Gen.zip(rowsGen, rowsGen)) { case (a, b) =>
      val existing = a.toDF("_id", "t", "v").dropDuplicates("_id")
      val incoming = b.toDF("_id", "t", "v").dropDuplicates("_id")
      val once = Merge.upsert(existing, incoming, Seq("_id"))
      val twice = Merge.upsert(once, incoming, Seq("_id"))
      // applying the same batch again changes nothing
      assert(once.orderBy("_id", "t", "v").collect().toSeq ==
        twice.orderBy("_id", "t", "v").collect().toSeq)
      // result keys = union of input keys
      val keys = once.select("_id").as[Long].collect().toSet
      val expected = (existing.select("_id").as[Long].collect() ++
        incoming.select("_id").as[Long].collect()).toSet
      assert(keys == expected)
      // incoming rows win per key
      val incomingKeys = incoming.select("_id").as[Long].collect().toSet
      val winners = once.filter(col("_id").isin(incomingKeys.toSeq: _*))
        .orderBy("_id").collect().toSeq
      assert(winners == incoming.filter(col("_id").isin(incomingKeys.toSeq: _*))
        .orderBy("_id").collect().toSeq)
    }
  }

  test("property: alignSchema output columns equal target schema exactly") {
    val target = graft.schema.Schemas.generation
    forAllSamples(Gen.someOf(target.fields.map(_.name) ++ Seq("junk1", "junk2")), n = 6) { present =>
      val df = spark.range(3).toDF("n")
        .select((col("n") +: present.toList.map(c => lit("1").as(c))): _*)
        .drop("n")
      val out = Align.alignSchema(df, target)
      // contract: output column NAMES == target schema, in order; types are
      // coerced by the separate Cast stage (as in the reference, where align
      // runs against the all-string landing schema)
      assert(out.columns.toSeq == target.fields.map(_.name).toSeq)
      val presentSet = present.toSet
      out.schema.fields.filterNot(f => presentSet(f.name)).foreach { f =>
        assert(f.dataType == target(f.name).dataType) // absent → typed null
      }
    }
  }

  test("property: stableSlice equals sorted drop/take for any bounds") {
    val gen = for {
      rows <- Gen.listOfN(60, Gen.chooseNum(1L, 1000000L))
      start <- Gen.chooseNum(0, 70)
      len <- Gen.chooseNum(0, 30)
    } yield (rows.distinct, start, len)
    forAllSamples(gen) { case (rows, start, len) =>
      if (rows.nonEmpty) {
        val df = rows.map(i => (i, s"v$i")).toDF("id", "v").repartition(5)
        val out = graft.operators.Analytics
          .stableSlice(df, Seq(col("id")), start, start + len)
          .orderBy("id").as[(Long, String)].collect().toSeq
        val expected = rows.sorted.slice(start, start + len).map(i => (i, s"v$i"))
        assert(out == expected)
      }
    }
  }

  test("property: window-based sequence packing equals the sequential fill model") {
    import org.apache.spark.sql.expressions.Window
    val cap = 512
    val gen: Gen[List[(Long, String, Int)]] = Gen.listOfN(60, for {
      id <- Gen.chooseNum(1L, 500L)
      lang <- Gen.oneOf("en", "fr", "zh")
      n <- Gen.chooseNum(1, 900) // docs may exceed cap on their own
    } yield (id, lang, n))
    forAllSamples(gen, n = 8) { rows0 =>
      val rows = rows0.distinctBy(_._1)
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val packed = rows.toDF("doc_id", "lang", "n_tokens")
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .withColumn("bin",
          floor((col("cum") - col("n_tokens")).cast("double") / cap).cast("long"))
        .select("lang", "doc_id", "bin")
        .as[(String, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
      // sequential reference model: walk each language in doc_id order,
      // assigning bin = fill-before / cap
      val expected = rows.groupBy(_._2).flatMap { case (lang, docs) =>
        var fill = 0L
        docs.sortBy(_._1).map { case (id, _, n) =>
          val bin = fill / cap
          fill += n
          (lang, id) -> bin
        }
      }
      assert(packed == expected)
    }
  }

  test("property: contamination overlap equals brute-force trigram intersection") {
    val word = Gen.oneOf("ab", "cd", "ef", "gh", "ij", "kl")
    val doc = Gen.listOfN(10, word).map(_.mkString(" "))
    forAllSamples(Gen.zip(Gen.listOfN(5, doc), doc), n = 8) { case (trainTexts, testText) =>
      val train = trainTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val test = Seq((100L, testText)).toDF("doc_id", "text")
      val out = graft.operators.TextDedup
        .contaminationPairs(train, test, "doc_id", "text", n = 3, minShared = 1)
        .select("train_id", "n_shared").as[(Long, Long)].collect().toMap
      def grams(t: String): Set[String] =
        t.split("\\s+").toSeq.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
      val expected = trainTexts.zipWithIndex
        .map { case (t, i) => i.toLong -> (grams(t) & grams(testText)).size.toLong }
        .filter(_._2 >= 1).toMap
      assert(out == expected)
    }
  }

  test("property: lenient casts never throw, null iff unparsable") {
    val strGen = Gen.oneOf(
      Gen.numStr.map(s => if (s.isEmpty) "0" else s.take(15)),
      Gen.alphaStr,
      Gen.const(null: String),
      Gen.chooseNum(-1e6, 1e6).map(_.toString))
    forAllSamples(Gen.listOfN(25, strGen)) { vals =>
      val out = Cast.castNumeric(vals.toDF("v"), Seq("v")).collect()
      out.zip(vals).foreach { case (row, in) =>
        val parsed = try Some(java.lang.Double.parseDouble(if (in == null) "x" else in))
          catch { case _: Exception => None }
        if (parsed.isEmpty) assert(row.isNullAt(0))
        else assert(row.getDouble(0) == parsed.get)
      }
    }
  }
}
