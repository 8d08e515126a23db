package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs = graft.Tables(spark, TestSpark.sfDir, "documents")

  test("hashSplit labels every row exactly once, near the weights, deterministically") {
    val split = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val total = docs.count()
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == total) // partition: every row, no dupes
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train").toDouble / total - 0.8) < 0.05)
    // determinism: a second evaluation gives the identical assignment
    val again = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.select("doc_id", "split")
      .exceptAll(again.select("doc_id", "split")).isEmpty)
  }

  test("hashSample is a deterministic subset of the right size") {
    val s = Sampling.hashSample(docs, "doc_id", 0.25)
    val n = s.count()
    assert(n > 0 && n < docs.count())
    assert(math.abs(n.toDouble / docs.count() - 0.25) < 0.08)
    assert(s.select("doc_id").exceptAll(docs.select("doc_id")).isEmpty)
    assert(Sampling.hashSample(docs, "doc_id", 0.25).count() == n)
    // different salt draws a different sample
    val other = Sampling.hashSample(docs, "doc_id", 0.25, salt = "other")
    assert(other.select("doc_id").exceptAll(s.select("doc_id")).count() > 0)
  }

  test("packBudget bins are the exclusive-prefix-sum intervals") {
    val budget = 512L
    val binned = Sampling.packBudget(docs, Seq("lang"), "doc_id",
      TextAnalysis.tokenCount(col("text")), budget)
      .select(col("lang"), col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n"), col("bin"))
      .collect()
    for ((_, rows) <- binned.groupBy(_.getString(0))) {
      var prev = 0L
      for (r <- rows.sortBy(_.getLong(1))) {
        assert(r.getLong(3) == prev / budget,
          s"doc ${r.getLong(1)}: bin ${r.getLong(3)} != ${prev / budget}")
        prev += r.getLong(2)
      }
    }
  }

  test("packSequences: exact concat-and-chunk with EOS, partial dropped") {
    import spark.implicits._
    // group g: docs [1,2,3], [4], [5,6] -> stream with eos=99:
    // 1 2 3 99 4 99 5 6 99  (9 tokens) -> seqLen 4: [1,2,3,99] [4,99,5,6],
    // trailing [99] dropped
    val df = Seq(
      ("g", 0L, Seq(1, 2, 3)), ("g", 1L, Seq(4)), ("g", 2L, Seq(5, 6)),
      ("h", 0L, Seq(7, 8, 9))  // h: 7 8 9 99 -> exactly one full sequence
    ).toDF("grp", "doc_id", "ids")
    val out = Sampling.packSequences(df, Seq("grp"), "doc_id", "ids",
      seqLen = 4, eosId = 99)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getSeq[Int](2).toList)).sortBy(t => (t._1, t._2)).toList
    assert(out == List(
      ("g", 0L, List(1, 2, 3, 99)),
      ("g", 1L, List(4, 99, 5, 6)),
      ("h", 0L, List(7, 8, 9, 99))))
  }

  test("packSequences: every full sequence has exactly seqLen tokens and " +
    "the stream order is reconstructed, not arrival order") {
    import spark.implicits._
    val docsIds = (0L until 37L).map(i =>
      ("s", i, (0 until (i % 7).toInt).map(j => (i * 100 + j).toInt)))
    // shuffled input: packing must depend only on orderCol
    val df = scala.util.Random.shuffle(docsIds).toDF("grp", "doc_id", "ids")
    val out = Sampling.packSequences(df, Seq("grp"), "doc_id", "ids",
      seqLen = 16, eosId = -1)
      .collect().map(r => (r.getLong(1), r.getSeq[Int](2).toList))
      .sortBy(_._1).toList
    val stream = docsIds.sortBy(_._2).flatMap(d => d._3 :+ -1)
    val expected = stream.grouped(16).filter(_.size == 16).toList
      .zipWithIndex.map { case (s, i) => (i.toLong, s.toList) }
    assert(out == expected)
    assert(out.forall(_._2.size == 16))
  }

  test("mixtureSample hits the target proportions, binding group kept whole") {
    import spark.implicits._
    // skewed input: 300 a, 60 b, 200 c; target 1:1:2 -> b binds (C=60),
    // expected keeps ~ a=60, b=60 (all), c=120
    val df = ((0 until 300).map(i => (i.toLong, "a")) ++
      (1000 until 1060).map(i => (i.toLong, "b")) ++
      (2000 until 2200).map(i => (i.toLong, "c")))
      .toDF("id", "grp")
    val out = Sampling.mixtureSample(df, "grp", "id",
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 2.0))
    val counts = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("b") == 60, "binding group keeps every row")
    assert(math.abs(counts("a") - 60.0) / 60.0 < 0.25)
    assert(math.abs(counts("c") - 120.0) / 120.0 < 0.25)
    // deterministic: re-evaluation is identical
    assert(out.exceptAll(Sampling.mixtureSample(df, "grp", "id",
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 2.0))).isEmpty)
    // unweighted groups are dropped
    val withJunk = df.union(Seq((9999L, "z")).toDF("id", "grp"))
    assert(Sampling.mixtureSample(withJunk, "grp", "id", Map("a" -> 1.0))
      .filter(col("grp") =!= "a").count() == 0)
  }

  test("mixtureUpsample: whole+fractional epochs, dense epoch ids, cap " +
    "applied, unlisted groups pass once, deterministic") {
    val rates = Map("src0" -> 3.5, "src1" -> 2.25, "src2" -> 10.0)
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.mixtureUpsample(df.select("doc_id", "source"),
        "source", "doc_id", rates, maxRepeat = 8.0)
    val out = run(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val perDoc = out.groupBy(_._1)
    val srcOf = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, copies) <- perDoc) {
      val src = srcOf(id)
      val n = copies.length
      // epochs are dense 0..n-1
      assert(copies.map(_._3).sorted.sameElements(0 until n), s"doc $id")
      src match {
        case "src0" => assert(n == 3 || n == 4, s"doc $id n=$n")
        case "src1" => assert(n == 2 || n == 3, s"doc $id n=$n")
        case "src2" => assert(n == 8, s"doc $id capped n=$n") // 10 -> cap 8
        case _ => assert(n == 1, s"doc $id unlisted n=$n")
      }
    }
    // fractional epochs hit ~ the fractional rate over the group
    val n0 = perDoc.collect { case (id, c) if srcOf(id) == "src0" => c.length }
    assert(n0.sum.toDouble / n0.size >= 3.0 && n0.sum.toDouble / n0.size <= 4.0)
    // deterministic and layout-independent
    val again = run(docs.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sorted
    assert(again.sameElements(out.sorted))
    // rates below 1 are rejected (thinning is mixtureSample's job)
    intercept[IllegalArgumentException] {
      Sampling.mixtureUpsample(docs.select("doc_id", "source"),
        "source", "doc_id", Map("src0" -> 0.5))
    }
  }

  test("trainingOrder: every row once, positions dense per shard, stable") {
    val ordered = Sampling.trainingOrder(docs, "doc_id", shards = 8)
    assert(ordered.count() == docs.count()) // no row lost or duplicated
    val perShard = ordered.groupBy("shard")
      .agg(count(lit(1)).as("n"), max(col("pos")).as("maxp"),
        min(col("pos")).as("minp")).collect()
    assert(perShard.nonEmpty && perShard.length <= 8)
    for (r <- perShard) { // dense 1..n positions within each shard
      assert(r.getLong(3) == 1L && r.getLong(2) == r.getLong(1))
    }
    // deterministic: identical assignment on re-evaluation
    val again = Sampling.trainingOrder(docs, "doc_id", shards = 8)
    assert(ordered.select("doc_id", "shard", "pos")
      .exceptAll(again.select("doc_id", "shard", "pos")).isEmpty)
  }

  test("quotaSample: exactly min(k, group size) rows per group, a subset") {
    val q = Sampling.quotaSample(docs, "lang", "doc_id", k = 7)
    val got = q.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == full.keySet)
    for ((g, n) <- got) assert(n == math.min(7L, full(g)), s"group $g")
    assert(q.select("doc_id").exceptAll(docs.select("doc_id")).isEmpty)
    // deterministic
    assert(q.exceptAll(Sampling.quotaSample(docs, "lang", "doc_id", 7)).isEmpty)
  }

  test("leakageSafeSplit: no near-dup pair ever straddles train/test") {
    import org.apache.spark.sql.functions.{concat, lit, when}
    // plant near-dups: every 3rd doc gets a lightly-perturbed twin
    val twins = docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" tail tail")).as("text"))
    val corpus = docs.select("doc_id", "text").unionByName(twins)
    val split = Sampling.leakageSafeSplit(corpus, "doc_id", "text",
      threshold = 0.5, weights = Seq("train" -> 0.9, "test" -> 0.1))
    // every row present exactly once, both labels in use
    assert(split.count() == corpus.count())
    assert(split.select("split").distinct().count() == 2)
    // the leakage contract: one split label per cluster rep
    assert(split.groupBy("rep")
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).isEmpty)
    // and concretely: each planted twin shares its original's split
    val orig = split.filter(col("doc_id") < 100000L)
      .select(col("doc_id").as("o_id"), col("split").as("o_split"))
    val straddle = split.filter(col("doc_id") >= 100000L)
      .join(orig, col("doc_id") - 100000L === col("o_id"))
      .filter(col("split") =!= col("o_split"))
    assert(straddle.isEmpty)
  }

  test("temperatureRates6: hand-checked sqrt weighting, alpha=1 is the " +
    "uniform factor, caps and thinning quantize exactly") {
    import graft.operators.Sampling.temperatureRates6
    // a=100, b=400: weights 10/20, denom 30, total 500, t=2*500=1000:
    // rate_a = 10/30*1000/100 = 10/3, rate_b = 20/30*1000/400 = 5/3
    val r = temperatureRates6(Seq("b" -> 400L, "a" -> 100L), 0.5, 2.0, 8.0)
    assert(r.map(_._1) == Seq("a", "b")) // sorted fold order
    assert(r == Seq("a" -> 3333333L, "b" -> 1666666L), r)
    // the cap clamps the flattened small source
    assert(temperatureRates6(Seq("a" -> 100L, "b" -> 400L), 0.5, 2.0, 3.0)
      .head == ("a" -> 3000000L))
    // thinning: tf=0.5 -> whole parts 0, micro-fracs survive
    assert(temperatureRates6(Seq("a" -> 100L, "b" -> 400L), 0.5, 0.5, 8.0)
      == Seq("a" -> 833333L, "b" -> 416666L))
    // alpha=1: every group's rate IS totalFactor (natural proportions)
    assert(temperatureRates6(Seq("a" -> 7L, "b" -> 913L), 1.0, 2.0, 8.0)
      .forall(_._2 == 2000000L))
    intercept[IllegalArgumentException](temperatureRates6(Nil, 0.5, 1, 1))
    intercept[IllegalArgumentException](
      temperatureRates6(Seq("a" -> 0L), 0.5, 1, 1))
  }

  test("temperatureMixture: small sources repeat, big sources thin, " +
    "draws are deterministic and epoch ids dense") {
    import spark.implicits._
    val df = ((0 until 40).map(i => (i.toLong, "big")) ++
      (1000 until 1010).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    // counts 40/10, weights sqrt: ~6.32/3.16, t = 1.0*50:
    // rate_big = (6.32/9.49)*50/40 ~ 0.833, rate_small ~ 1.667
    val out = Sampling.temperatureMixture(df, "source", "doc_id",
      alpha = 0.5, totalFactor = 1.0, maxRepeat = 8.0)
    val bySrc = out.groupBy("source")
      .agg(count(lit(1)).as("n"), max("epoch").as("maxe"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.get(2))).toMap
    // big thins: strictly fewer draws than rows; small repeats: more
    assert(bySrc("big")._1 < 40 && bySrc("big")._1 > 20, bySrc)
    assert(bySrc("small")._1 > 10, bySrc)
    assert(bySrc("small")._2.toString.toInt >= 1) // second epoch exists
    // determinism: the identical frame drawn twice is row-identical
    val again = Sampling.temperatureMixture(df, "source", "doc_id",
      alpha = 0.5, totalFactor = 1.0, maxRepeat = 8.0)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("dsirWeights: target-like docs score positive, alien docs " +
    "negative, feature count and empty-doc handling exact") {
    import spark.implicits._
    // target corpus speaks "alpha beta"; the pool speaks "gamma delta";
    // probe docs borrow one dialect each
    val rows = Seq(
      (1L, true, "alpha beta alpha beta"),
      (2L, true, "beta alpha beta"),
      (3L, false, "gamma delta gamma delta"),
      (4L, false, "delta gamma delta"),
      (10L, false, "alpha beta alpha"), // pool doc that looks like target
      (11L, true, "gamma delta"),       // target doc that looks like pool
      (12L, false, ""),                 // no features at all
      (13L, false, "   "))              // whitespace-only
      .toDF("doc_id", "is_t", "text")
    val out = Sampling.dsirWeights(rows, "doc_id", "text", col("is_t"),
      buckets = 64)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // n_feats = unigrams + bigrams = 2n-1 for n >= 1 words, else 0
    assert(out(1L)._1 == 7 && out(3L)._1 == 7 && out(11L)._1 == 3)
    assert(out(12L) == ((0L, 0L, false)) && out(13L) == ((0L, 0L, false)))
    // dialect determines the sign regardless of the doc's own label
    assert(out(10L)._2 > 0 && out(10L)._3, "alpha-dialect doc must be kept")
    assert(out(11L)._2 < 0 && !out(11L)._3, "gamma-dialect doc must score " +
      "negative even though it is labeled target")
    assert(out(1L)._2 > 0 && out(3L)._2 < 0)
    // rerun is bit-identical (pure hash + integer arithmetic)
    val again = Sampling.dsirWeights(rows, "doc_id", "text", col("is_t"),
      buckets = 64).collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(again == out.map { case (k, v) => k -> v._2 })
  }
}
