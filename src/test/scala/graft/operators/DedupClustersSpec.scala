package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Connected-components contraction (large-star/small-star) and the
  * end-to-end dedup clustering pipeline. */
class DedupClustersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(pairs: (Long, Long)*): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, clique, and separate components contract to min ids") {
    // chain 1-2-3-4 (worst case for naive propagation), clique {10,11,12},
    // pair {20,21}, reversed/duplicate edges
    val m = cc((2, 1), (2, 3), (4, 3), (10, 11), (11, 12), (12, 10),
      (21, 20), (20, 21), (3, 2))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("long path converges within the iteration bound") {
    val path = (0L until 40L).map(i => (i, i + 1))
    val m = cc(path: _*)
    assert(m.size == 41 && m.values.forall(_ == 0L))
  }

  test("empty edge list yields empty mapping") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() == 0)
  }

  test("ccAppend(build(even), odd) equals the full rebuild exactly") {
    // an affine functional graph u -> 13u+7 mod 60: even-residue edges
    // build small alternating fragments, odd-residue edges stitch them
    // into the full cycles — the append genuinely merges components
    val all = (0L until 60L).map(u => (u, (u * 13 + 7) % 60))
    val even = all.filter(_._1 % 2 == 0)
    val odd = all.filter(_._1 % 2 == 1)
    val base = Dedup.connectedComponents(even.toDF("id_a", "id_b"))
    val got = Dedup.ccAppend(base, odd.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == cc(all: _*))
    // sanity: the append DID merge (fewer components than the even build)
    val evenReps = base.select("rep").distinct().count()
    assert(got.values.toSet.size < evenReps)
  }

  test("ccAppend: empty delta is identity; empty base is a plain build; " +
    "one delta edge bridges two prior components") {
    val base = Dedup.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b"))
    val same = Dedup.ccAppend(base, Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(same == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val fresh = Dedup.ccAppend(
      Seq.empty[(Long, Long)].toDF("id", "rep"),
      Seq((5L, 6L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fresh == Map(5L -> 5L, 6L -> 5L))
    val bridged = Dedup.ccAppend(base, Seq((3L, 10L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bridged == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L))
  }

  test("dedupClusters maps singletons to themselves and flags keepers") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "a completely different document about spark query engines"),
      (4L, "unique text with no duplicate partner in this tiny corpus at all")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupClusters(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == Set((1L, 1L, true), (2L, 1L, false), (3L, 3L, true), (4L, 4L, true)))
    // exactly one keeper per cluster
  }

  test("clusterSizeProfile: histogram accounting reconciles exactly with " +
    "the mapping it audits") {
    val clusters = Seq(
      // one pair, one triple, three singletons
      (1L, 1L), (2L, 1L),
      (3L, 3L), (4L, 3L), (5L, 3L),
      (6L, 6L), (7L, 7L), (8L, 8L)).toDF("id", "rep")
    val prof = Dedup.clusterSizeProfile(clusters)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(prof == Map(
      1L -> ((3L, 3L, 0L)), 2L -> ((1L, 2L, 1L)), 3L -> ((1L, 3L, 2L))))
    // invariants on real data: docs reconcile, drops == docs - clusters
    val real = Dedup.dedupClusters(
      graft.Tables(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text", threshold = 0.5)
    val p = Dedup.clusterSizeProfile(real.select("id", "rep")).collect()
    assert(p.map(_.getLong(2)).sum == real.count())
    assert(p.map(_.getLong(3)).sum ==
      real.count() - real.filter(org.apache.spark.sql.functions.col("keep")).count())
  }

  test("keepBestPerCluster keeps exactly one member per cluster — the " +
    "highest score, smallest id on ties — and matches dedupClusters' " +
    "clustering") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val best = Dedup.keepBestPerCluster(docs, "doc_id", "text",
      score = col("n_chars"), threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(best.length == docs.count())
    // one keeper per rep, and it is the (score desc, id asc) argmax
    for ((rep, members) <- best.groupBy(_._2)) {
      val keepers = members.filter(_._4)
      assert(keepers.length == 1, s"cluster $rep has ${keepers.length} keepers")
      val expect = members.minBy(m => (-m._3, m._1))
      assert(keepers.head._1 == expect._1,
        s"cluster $rep kept ${keepers.head._1}, expected ${expect._1}")
    }
    // the clustering itself is dedupClusters' (only the policy differs)
    val reps = Dedup.dedupClusters(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(best.forall { case (id, rep, _, _) => reps(id) == rep })
  }
}
