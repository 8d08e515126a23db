package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join utilities Spark lacks natively: skew salting, the as-of
  * (temporal) join, and the bucketized interval/range join.
  *
  * At 100 TB a handful of hot keys turn a shuffled equi-join into a
  * straggler: every row of a hot key lands on one reducer. AQE's skew
  * split (enabled in GraftSession) handles moderate skew after the fact;
  * [[saltedEquiJoin]] removes it up front by sharding each big-side key
  * into `salts` sub-keys and replicating the small side per shard — the
  * classic salting rewrite. Results are identical to the plain join (the
  * salt is internal), verified by the q42 oracle.
  *
  * [[asofJoin]] and [[rangeJoin]] cover the two temporal-join shapes a
  * feature/training pipeline needs (latest-state enrichment; window
  * containment). Both are rewrites onto shuffled equi-machinery — never a
  * theta-join, which Spark can only plan as a broadcast-nested-loop or
  * cartesian product.
  */
object Joins {

  /** Equi-join `big ⋈ small` on `key` with the big side salted into
    * `salts` shards. `small` is replicated `salts`× via explode — keep it
    * the dimension side. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, bigKey: String,
                     smallKey: String, salts: Int,
                     joinType: String = "inner"): DataFrame = {
    val saltVals = array((0 until salts).map(lit): _*)
    val b = big.withColumn("__salt", pmod(xxhash64(col(bigKey)), lit(salts)))
    val s = small.withColumn("__salt", explode(saltVals))
    b.join(s, b(bigKey) === s(smallKey) && b("__salt") === s("__salt"), joinType)
      .drop("__salt")
  }

  /** As-of join: every `left` row gets the single most recent `right` row
    * with equal `keys` and right `rightTs` <= left `leftTs` (a right row
    * AT the left timestamp matches), optionally only when the match is at
    * most `toleranceUs` microseconds old. Unmatched (or out-of-tolerance)
    * left rows keep null attachment columns — left-outer semantics, the
    * pandas `merge_asof` contract.
    *
    * Scale design — the union-and-sweep rewrite. The naive plan is an
    * inequality join (`l.key = r.key AND r.ts <= l.ts` + a per-left-row
    * argmax): Spark plans the non-equi conjunct as a join *filter* over
    * the full keyed pair space, so a key with n left × m right rows
    * materializes n·m intermediate pairs before the argmax prunes them —
    * quadratic on exactly the hot keys that matter at 100 TB. Instead both
    * sides are tagged and unioned (right rows carry their attachment
    * columns packed in ONE struct, left rows carry null), shuffled ONCE on
    * `keys`, sorted per key by (time, side, tie), and swept with a
    * running `last(payload, ignoreNulls)` window — each left row picks up
    * the latest preceding right struct in a single pass. Cost is one
    * exchange + one per-partition sort, linear in rows regardless of how
    * many right rows precede each left row; skew is bounded by the
    * hottest key, same as any keyed window.
    *
    * Determinism: right rows sort BEFORE left rows at the same timestamp
    * (so `<=` holds), and right rows sharing (key, ts) are ordered by
    * `tieCol` — the largest `tieCol` wins. The attachment is one struct,
    * so all attached columns come from the SAME right row (a per-column
    * carry could stitch different rows when a column is null).
    *
    * Nulls follow join semantics, not window semantics: right rows with a
    * null key or null timestamp can never match (filtered before the
    * union); left rows with a null key or null timestamp match nothing
    * (attachment forced null) instead of meeting them in the null window
    * partition.
    *
    * Attached columns surface as `prefix + rightTs` (the matched row's
    * event time) and `prefix + c` for each payload column `c`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               tieCol: String, prefix: String = "asof_",
               toleranceUs: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one equi-key")
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    toleranceUs.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))

    val pay = struct(col(rightTs).as("__rts") +: payload.map(col): _*)
    val r = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _) && col(rightTs).isNotNull)
      .select(keys.map(col) ++ Seq(
        col(rightTs).as("__t"), lit(0).as("__side"),
        col(tieCol).as("__tie"), pay.as("__pay")): _*)
    val l = left.select(keys.map(col) ++ Seq(
      col(leftTs).as("__t"), lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__lrow")): _*)

    // unionByName(allowMissingColumns) nulls __pay/__tie on the left rows
    // and __lrow on the right rows — the null payload is what the
    // ignoreNulls sweep skips
    val u = r.unionByName(l, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u.withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val leftValid = left.columns.filter(keys.contains).map(c =>
      col("__lrow").getField(c).isNotNull).foldLeft(
        col("__lrow").getField(leftTs).isNotNull)(_ && _)
    val inTolerance = toleranceUs match {
      case Some(t) => unix_micros(col("__lrow").getField(leftTs)) -
        unix_micros(col("__m").getField("__rts")) <= t
      case None => lit(true)
    }
    val m = when(leftValid && col("__m").isNotNull && inTolerance, col("__m"))
    carried.select(
      left.columns.map(c => col("__lrow").getField(c).as(c)) ++
        Seq(m.getField("__rts").as(prefix + rightTs)) ++
        payload.map(c => m.getField(c).as(prefix + c)): _*)
  }

  /** [[asofJoin]] against a BOUNDED-per-key static right side, in a form
    * Structured Streaming can run: the right side is collapsed to one
    * sorted (time, tie, payload) array per key, the left stream joins it
    * with a plain stream-static equi-join, and the match is an array
    * lookup — `element_at(filter(arr, rts <= ts), -1)` — evaluated per
    * row at the scan. No window over the stream, no state store: the
    * only state is the static side itself.
    *
    * Semantics are IDENTICAL to [[asofJoin]] (<= match, max `tieCol`
    * among equal timestamps, whole-struct attachment, tolerance,
    * null-key/null-ts rows match nothing) — asserted row-for-row in
    * JoinsSpec (batch) and StreamingSpec (streamed left side).
    *
    * Contract: the right side must be per-key BOUNDED (a dimension's
    * state history, not another event stream) — each key's full history
    * becomes one array row, and keys above `maxRightRowsPerKey`
    * (default 2^17) fail LOUDLY at the aggregate (raise_error on the
    * collected size, same posture as [[rangeJoin]]'s replication cap).
    * Honest scope of that guard: it fires AFTER collect_list has
    * materialized the key's array, so it converts the
    * oversized-but-allocatable regime into a clear contract error; a
    * key so hot its array cannot even allocate still dies on the
    * aggregate itself (a true pre-flight would need a second full
    * count-shuffle of the right side on EVERY call — not worth taxing
    * the contract-respecting 99% for). For stream×stream as-of, bound
    * the right side by watermark/window first; for the batch-only
    * unbounded case use [[asofJoin]], whose sweep never materializes a
    * key's history in one row. */
  def asofJoinStatic(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String, payload: Seq[String],
                     tieCol: String, prefix: String = "asof_",
                     toleranceUs: Option[Long] = None,
                     maxRightRowsPerKey: Int = 1 << 17): DataFrame = {
    require(keys.nonEmpty, "asofJoinStatic needs at least one equi-key")
    require(payload.nonEmpty, "asofJoinStatic needs at least one payload column")
    toleranceUs.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))
    require(maxRightRowsPerKey > 0, "maxRightRowsPerKey must be > 0")

    val entry = struct(col(rightTs).as("__rts"), col(tieCol).as("__tie"),
      struct(payload.map(col): _*).as("__p"))
    val ragg = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _) && col(rightTs).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(entry)).as("__arr"))
      .withColumn("__arr",
        when(size(col("__arr")) > maxRightRowsPerKey,
          raise_error(concat(
            lit(s"asofJoinStatic: right side has > $maxRightRowsPerKey rows " +
              "for key "), concat_ws(",", keys.map(col(_).cast("string")): _*),
            lit(" — the static-right contract is a BOUNDED per-key history " +
              "(a dimension's state, not an event stream); use asofJoin " +
              "for unbounded right sides or raise maxRightRowsPerKey"))))
          .otherwise(col("__arr")))

    val joined = left.join(ragg, keys, "left")
    val eligible = filter(col("__arr"), e => e.getField("__rts") <= col(leftTs))
    // ANSI mode: element_at on an empty array errors — guard on size
    val last = when(size(eligible) > 0, element_at(eligible, -1))
    val inTolerance = toleranceUs match {
      case Some(t) => unix_micros(col(leftTs)) -
        unix_micros(last.getField("__rts")) <= t
      case None => lit(true)
    }
    val m = when(col(leftTs).isNotNull && inTolerance, last)
    joined.select(
      left.columns.map(col) ++
        Seq(m.getField("__rts").as(prefix + rightTs)) ++
        payload.map(c => m.getField("__p").getField(c).as(prefix + c)): _*)
  }

  /** Interval (range) join: every `points` row joins every `intervals`
    * row whose `[startCol, endCol]` (inclusive) contains its `ptCol` —
    * with NO equi-key required. Output is the pair space
    * (all point columns + all interval columns); callers project.
    *
    * Scale design — bucketization. A pure range predicate gives Catalyst
    * no equi-conjunct, so the physical plan is BroadcastNestedLoop (or a
    * cartesian product), streaming every point past every interval:
    * |P|×|I| comparisons. The standard rewrite quantizes time into
    * fixed-width buckets of `bucketUs` microseconds: each interval is
    * replicated to every bucket it overlaps (`sequence` + explode — rows,
    * not driver loops), each point is bucketed once, the join becomes a
    * shuffled EQUI-join on the bucket id, and the exact containment
    * predicate prunes the co-bucketed false pairs. Comparisons shrink
    * from |P|×|I| to sum-per-bucket(points × intervals); AQE can split a
    * hot bucket like any other shuffle key. Pick `bucketUs` near the
    * typical interval length: replication factor stays ~2 while bucket
    * population stays sparse.
    *
    * Intervals wider than `maxBucketsPerInterval` buckets fail fast
    * (scan-level error) rather than silently exploding the replication —
    * an interval spanning the whole corpus history belongs in a broadcast
    * join, not here. Null timestamps on either side never match, matching
    * SQL range-predicate semantics.
    */
  def rangeJoin(points: DataFrame, ptCol: String,
                intervals: DataFrame, startCol: String, endCol: String,
                bucketUs: Long, maxBucketsPerInterval: Int = 1 << 16): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be > 0, got $bucketUs")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be > 0")
    val b0 = floor(unix_micros(col(startCol)) / bucketUs)
    val b1 = floor(unix_micros(col(endCol)) / bucketUs)
    val guarded = when(b1 - b0 >= maxBucketsPerInterval,
      raise_error(concat(lit(s"rangeJoin: interval spans >= $maxBucketsPerInterval " +
        s"buckets of $bucketUs us at "), col(startCol).cast("string"))))
      .otherwise(b1)
    val i = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .withColumn("__bkt", explode(sequence(b0, guarded)))
    val p = points
      .filter(col(ptCol).isNotNull)
      .withColumn("__bkt", floor(unix_micros(col(ptCol)) / bucketUs))
    p.join(i, Seq("__bkt"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bkt")
  }
}
