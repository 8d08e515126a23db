package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Column helpers shared by the engine and the verification queries.
  *
  * Determinism note: a floating-point SUM over a shuffled dataset is
  * order-dependent, so Spark and an independent oracle (DuckDB) can differ
  * in the last ulps on large groups. Anywhere a query is hash-compared
  * against the oracle we sum via an exact decimal representation
  * (`dsum`/`davg`) — both engines then produce bit-identical doubles.
  * Means of logs (geomean) shrink the accumulated error by 1/n, so a
  * 6-decimal round suffices there.
  */
package object functions {

  private val D = DecimalType(28, 6)

  /** Order-independent exact sum of a double column (6-decimal quantum),
    * returned as double. Matches
    * `CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)` in ANSI SQL. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast(DoubleType)

  /** Order-independent mean built from dsum / count. */
  def davg(c: Column): Column = (dsum(c) / count(c)).cast(DoubleType)

  /** Exact median, value-identical to Spark's built-in `median` (same
    * interpolation) but ~10× cheaper per row — dispatches to the native
    * [[graft.expressions.ExactMedian]] (primitive-array buffer instead of
    * the built-in Percentile's boxed hash map). */
  def exactMedian(c: Column): Column =
    call_function("graft_median", c.cast(DoubleType))

  /** Geometric mean: exp(mean(ln x)). Matches the reference's geomean
    * (bearysta aggregate.py:94-99 special-cases scipy gmean). Round the
    * result (e.g. 6 decimals) when oracle-compared. */
  def geomean(c: Column): Column = exp(avg(log(c)))

  /** Let-binding for Column expressions: evaluates `e` exactly once and
    * passes the bound value to `f`. Implemented as a single-element-array
    * `transform`, whose lambda variable is a true runtime binding — unlike
    * a Project alias, which CollapseProject may inline into `f`'s body and
    * re-evaluate per lambda iteration (catastrophic for expensive
    * subexpressions inside higher-order functions). */
  def bound(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), f), 1)

  /** Character-level Jaccard similarity of two strings (distinct-char
    * sets), matching DuckDB's `jaccard(s1, s2)`. */
  def charJaccard(a: Column, b: Column): Column = {
    val sa = array_distinct(split(a, ""))
    val sb = array_distinct(split(b, ""))
    val inter = size(array_intersect(sa, sb)).cast(DoubleType)
    val union = size(array_union(sa, sb)).cast(DoubleType)
    inter / union
  }

  /** Cosine similarity of two equal-length float-array columns, computed
    * in double precision. Dispatches to the native codegen'd
    * [[graft.expressions.ArrayCosine]] (registered by
    * [[graft.GraftExtensions]]); bit-identical to [[cosineHof]]. */
  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** Squared Euclidean distance of two float-vector columns (native
    * [[graft.expressions.ArrayL2Sq]], codegen'd fused loop, double
    * accumulation in sequential left-fold order). */
  def l2sq(a: Column, b: Column): Column =
    call_function("graft_l2sq", a, b)

  /** Reference higher-order-function formulation of [[cosine]] — same
    * sequential left-fold accumulation, usable without the extensions
    * registration; kept for cross-checking the native expression. */
  def cosineHof(a: Column, b: Column): Column = {
    val dot = aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))
    val nb = sqrt(aggregate(b, lit(0.0),
      (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))
    dot / (na * nb)
  }
}
