package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Content-defined exact-substring dedup ([[Dedup.exactSubstrSpans]]):
  * the distributed output must equal a sequential reference
  * implementation exactly, planted off-boundary repeats must be found
  * deterministically, and the operator must beat [[Dedup.duplicateSpans]]'
  * probabilistic `sampleMod` knob at the same shuffle-reduction factor
  * on a real constructed corpus. */
class ExactSubstrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The operator's anchor hash, sequentially: first 8 hex digits of
    * md5(token) as a long. */
  private def tokHash(w: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(w.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      h.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
  }

  /** Sequential reference: chunk every doc at content-defined anchors,
    * count chunk text occurrences corpus-wide, flag non-first
    * occurrences, stitch adjacent flagged chunks, filter to minTokens.
    * Mirrors the operator step for step in plain collections. */
  private def reference(docs: Seq[(Long, String)], minTokens: Int, gap: Int)
      : Set[(Long, Long, Long, Long, Long)] = {
    val chunks = docs.flatMap { case (id, text) =>
      val ws = text.split("\\s+").filter(_.nonEmpty)
      if (ws.isEmpty) Nil
      else {
        val bs = 0L +: ws.indices.drop(1)
          .filter(i => tokHash(ws(i)) % gap == 0).map(_.toLong) :+ ws.length.toLong
        bs.sliding(2).map { case Seq(s, e) =>
          (id, s, e, ws.slice(s.toInt, e.toInt).mkString(" "))
        }.toSeq
      }
    }
    val occ = chunks.groupBy(_._4).map { case (c, os) =>
      c -> (os.size, os.map(o => o._1 * 4294967296L + o._2).min)
    }
    val dup = chunks.filter { case (id, s, _, c) =>
      val (n, fk) = occ(c); n >= 2 && id * 4294967296L + s != fk
    }
    dup.groupBy(_._1).toSeq.flatMap { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      val islands = sorted.foldLeft(List.empty[List[(Long, Long)]]) {
        case (acc, (_, s, e, _)) => acc match {
          case (h @ ((_, pe) :: _)) :: t if pe == s => ((s, e) :: h) :: t
          case _ => List((s, e)) :: acc
        }
      }
      islands.map { isl =>
        val ss = isl.map(_._1).min; val ee = isl.map(_._2).max
        (id, ss, ee - 1, ee - ss, isl.size.toLong)
      }.filter(_._4 >= minTokens)
    }.toSet
  }

  private def run(docs: Seq[(Long, String)], minTokens: Int, gap: Int) =
    Dedup.exactSubstrSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
        minTokens, gap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet

  // a deterministic word stream over a small vocabulary (golden-ratio
  // hop — no RNG), like the corpus fixtures
  private val vocab = Vector("key", "agg", "row", "scan", "slow", "fast",
    "table", "value", "part", "hash", "merge", "batch", "window", "spark",
    "order", "data", "column", "join", "small", "line")
  private def words(seed: Int, n: Int): Seq[String] =
    (0 until n).map(i => vocab(((i * 7 + seed * 13 + i * i % 11) +
      seed * i) % vocab.size))

  test("distributed spans equal the sequential reference exactly") {
    val base = (0L until 24L).map(id => id -> words(id.toInt, 80).mkString(" "))
    // plant: doc 100 embeds doc 3's tokens 7..66 after 5 filler words —
    // an OFF-BOUNDARY offset in both copies
    val slice = words(3, 80).slice(7, 67)
    val docs = base :+ (100L ->
      (Seq("pad0", "pad1", "pad2", "pad3", "pad4") ++ slice).mkString(" "))
    for (gap <- Seq(4, 8, 16); minTokens <- Seq(1, 24)) {
      assert(run(docs, minTokens, gap) == reference(docs, minTokens, gap),
        s"gap=$gap minTokens=$minTokens")
    }
  }

  test("a planted off-boundary 60-token repeat is found in the copy, " +
    "not the original, with only partial head/tail chunks untrimmed") {
    // every token unique EXCEPT the planted slice, so the only repeated
    // content in the corpus is the plant itself
    val src = (0 until 80).map(i => s"w3x$i")
    val docs = Seq(
      3L -> src.mkString(" "),
      100L -> (Seq("pad0", "pad1", "pad2", "pad3", "pad4") ++
        src.slice(7, 67)).mkString(" "))
    val got = run(docs, minTokens = 12, gap = 8)
    assert(got.nonEmpty, "planted repeat not detected")
    assert(got.forall(_._1 == 100L), s"first occurrence must be kept: $got")
    // detected span sits inside the planted region [5, 64] of doc 100
    // and misses at most the partial head/tail chunks
    val (_, s, e, n, _) = got.maxBy(_._4)
    assert(s >= 5 && e <= 64 && n >= 12, s"span ($s,$e,$n)")
  }

  test("deterministic where sampleMod is probabilistic: a corpus where " +
    "duplicateSpans at sampleMod=16 misses, exactSubstrSpans at gap=16 finds") {
    // search deterministic seeds for a 60-token repeat whose k=10
    // windows ALL dodge hash % 16 == 0 — expected ~7% of seeds, so a
    // couple hundred attempts always yields one; the found corpus is a
    // REAL text pair, not an adversarial hash collision
    val found = (0 until 300).view.map { seed =>
      val src = words(seed, 80)
      val docs = Seq(
        seed.toLong -> src.mkString(" "),
        100L -> (Seq("pad0", "pad1", "pad2") ++ src.slice(7, 67)).mkString(" "))
      val missed = Dedup.duplicateSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", k = 10, sampleMod = 16).isEmpty
      (docs, missed)
    }.find(_._2).map(_._1)
    assert(found.nonEmpty, "no miss-corpus found in 300 seeds — " +
      "sampleMod semantics changed?")
    val got = run(found.get, minTokens = 24, gap = 16)
    assert(got.nonEmpty && got.forall(_._1 == 100L),
      s"content-defined chunking must find what mod-sampling missed: $got")
  }

  test("id contract: out-of-range ids fail loudly") {
    val bad = Seq((-1L, "a b c")).toDF("doc_id", "text")
    val e = intercept[Exception](
      Dedup.exactSubstrSpans(bad, "doc_id", "text", 1, 4).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("exactSubstrSpans")), e)
  }
}
