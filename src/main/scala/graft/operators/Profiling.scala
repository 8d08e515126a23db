package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Corpus-frequency profiling operators that stay EXACT while keeping
  * every exchange bounded — the pre-flight analyses of a curation run
  * ("which domains dominate the crawl?", "how many distinct shingles
  * per language?") that naive `GROUP BY` answers with an exchange sized
  * by the distinct universe.
  */
object Profiling {

  /** EXACT φ-heavy hitters: every value of `expr` whose frequency is at
    * least `ceil(minFraction · N)` over the non-null rows, with its
    * exact count — never a false positive, never a miss.
    *
    * Two-phase plan (the classical distributed frequent-items shape):
    *
    *   1. CANDIDATES — each partition runs a Misra–Gries summary with
    *      k = ⌈1/φ⌉ counters (bounded memory, one pass, nothing
    *      shuffled). MG guarantees every item with local frequency
    *      > n_p/(k+1) survives its partition; an item with GLOBAL
    *      frequency ≥ φ·N has local frequency ≥ φ·n_p in at least one
    *      partition (pigeonhole), and φ > 1/(k+1) by choice of k — so
    *      the union of partition candidates is a SUPERSET of the true
    *      heavy hitters. At most partitions × k candidate keys total.
    *   2. CONFIRM — exact counts restricted to the candidate set: the
    *      bounded candidate list is broadcast, matching rows hash-
    *      aggregate with map-side combine (the exchange carries at most
    *      partitions × |candidates| partial rows), and the φ·N
    *      threshold filter drops the superset's false candidates.
    *
    * The input is scanned twice (candidates, confirm) — the price of
    * exactness; both scans are embarrassingly parallel and neither ever
    * shuffles the full distinct universe, which is what breaks
    * `GROUP BY value HAVING count >= t` at 100 TB when `value` has
    * billions of distincts (URLs, shingles). Output order is
    * unspecified (sort downstream if needed).
    *
    * Result is EXACT and partition-layout-independent: extra MG
    * candidates only add confirm work, never rows (the threshold filter
    * is exact), and true heavy hitters are always candidates. */
  def heavyHitters(df: DataFrame, expr: Column, minFraction: Double): DataFrame = {
    require(minFraction > 0 && minFraction <= 1,
      s"minFraction must be in (0, 1], got $minFraction")
    val spark = df.sparkSession
    import spark.implicits._
    val k = math.ceil(1.0 / minFraction).toInt
    val items = df.select(expr.cast(StringType).as("item"))
      .filter(col("item").isNotNull)
    val candidates = items.as[String].mapPartitions { it =>
      // Misra-Gries: k counters; a full summary meeting a new item
      // decrements ALL counters (amortized O(1) per row — each
      // decrement pays back an earlier increment)
      val counters = new java.util.HashMap[String, Long](k * 2)
      it.foreach { s =>
        val c = counters.get(s)
        if (c > 0L) counters.put(s, c + 1L)
        else if (counters.size < k) counters.put(s, 1L)
        else {
          val jt = counters.entrySet().iterator()
          while (jt.hasNext) {
            val e = jt.next()
            if (e.getValue == 1L) jt.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      import scala.jdk.CollectionConverters._
      counters.keySet().iterator().asScala
    }.toDF("item").distinct()
    val total = items.agg(count(lit(1)).as("n_total"))
    items.join(broadcast(candidates), "item")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") >= ceil(lit(minFraction) * col("n_total")))
      .select(col("item"), col("cnt"))
  }

  /** Per-group distinct-count estimates via the native bottom-k KMV
    * aggregate ([[graft.expressions.KmvDistinct]]): one ordinary
    * groupBy whose per-group state is a BOUNDED k-long sketch (map-side
    * partial aggregation ships at most k hashes per group per task),
    * where `COUNT(DISTINCT x)` ships the group's whole distinct set.
    * EXACT below k distincts, ±1/√k above. `expr` is hashed with the
    * engine-standard md5/hash60 so the estimate is SQL-mirrorable. */
  def distinctByGroup(df: DataFrame, groupCols: Seq[Column], expr: Column,
                      sketchK: Int = 1024): DataFrame = {
    require(sketchK >= 2, s"sketchK must be >= 2, got $sketchK")
    df.groupBy(groupCols: _*)
      .agg(call_function("graft_kmv_distinct",
        TextAnalysis.hash60(expr.cast(StringType)), lit(sketchK))
        .as("est_distinct"))
  }
}
