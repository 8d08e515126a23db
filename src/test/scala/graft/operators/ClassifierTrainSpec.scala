package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Integer-exact GD trainer for the hashed quality classifier: the
  * distributed run must equal a plain-Scala reimplementation bit for
  * bit, learn a separable corpus, and round-trip into the trained
  * scorer. */
class ClassifierTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 64

  /** Plain-Scala mirror of the exact update rule (independent of the
    * Spark plan — the in-process analog of q93's SQL unroll). */
  private def localTrain(docs: Seq[(Long, String)], iters: Int): Array[Long] = {
    def bucket(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % dim).toInt
    }
    val feats = docs.map { case (y, text) =>
      val ws = text.trim.split("\\s+", -1).toSeq
      val cnts = ws.groupBy(bucket).view.mapValues(_.size.toLong).toMap
      (y, ws.size.toLong, cnts)
    }
    val n = docs.size.toLong
    val w6 = Array.fill(dim)(0L)
    for (_ <- 0 until iters) {
      val sq = Array.fill(dim)(0L)
      for ((y, len, cnts) <- feats) {
        val s = cnts.map { case (j, c) => w6(j) * c }.sum
        val r12 = (s * 1000000L) / len - y * 1000000000000L
        for ((j, c) <- cnts) sq(j) += (r12 * c) / len
      }
      for (j <- 0 until dim) w6(j) -= sq(j) / (2L * n * 1000000L)
    }
    w6
  }

  test("distributed trainer == plain-Scala mirror, exactly, on real docs") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("y", when(col("source") === "src0", 1L).otherwise(0L))
    val dist = TextAnalysis.trainHashClassifier(docs, "doc_id", "text", "y",
      dim = dim, iters = 2)
    val local = localTrain(
      docs.select("y", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq, iters = 2)
    assert(dist.toSeq == local.toSeq)
  }

  test("a separable corpus is separated by the trained scorer") {
    // y=1 docs carry a marker token; shared filler on both sides
    val rows = (0 until 40).map { i =>
      val y = i % 2
      val text =
        if (y == 1) s"filler$i spammarker common words here"
        else s"filler$i common words here indeed"
      (i.toLong, y.toLong, text)
    }
    val df = rows.toDF("doc_id", "y", "text")
    val w6 = TextAnalysis.trainHashClassifier(df, "doc_id", "text", "y",
      dim = dim, iters = 4)
    val scored = df.select(col("y"),
        TextAnalysis.hashClassifierScoreWith(col("text"), w6.toSeq, dim).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val pos = scored.filter(_._1 == 1).map(_._2)
    val neg = scored.filter(_._1 == 0).map(_._2)
    assert(pos.min > neg.max,
      s"not separated: pos min ${pos.min} vs neg max ${neg.max}")
  }

  test("zero weights score zero; blank text scores zero under any weights") {
    val zeros = Array.fill(dim)(0L)
    val some = Array.tabulate(dim)(j => (j * 1000 - 32000).toLong)
    val df = Seq("real text here", "", "   ").toDF("text")
    val out = df.select(
      TextAnalysis.hashClassifierScoreWith(col("text"), zeros.toSeq, dim).as("z"),
      TextAnalysis.hashClassifierScoreWith(col("text"), some.toSeq, dim).as("s"))
      .collect()
    assert(out.forall(_.getDouble(0) == 0.0))
    assert(out.drop(1).forall(_.getDouble(1) == 0.0)) // the blank rows
  }

  test("trained scoring is a scan-level expression: zero exchanges") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val w6 = Array.tabulate(dim)(j => j.toLong * 100 - 3200)
    val plan = docs
      .select(TextAnalysis.hashClassifierScoreWith(col("text"), w6.toSeq, dim))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("iters = 0 is the zero model") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("y", lit(1L))
    val w = TextAnalysis.trainHashClassifier(docs, "doc_id", "text", "y",
      dim = dim, iters = 0)
    assert(w.forall(_ == 0L))
  }
}
