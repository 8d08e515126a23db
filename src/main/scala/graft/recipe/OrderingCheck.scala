package graft.recipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed, queryable form of the reference's expected-ordering check
  * (A8, aggregate.py:674-703): instead of (only) a driver-side warning
  * string, emit one verdict ROW per group — the expected series order,
  * the observed order (worst first, same direction convention as the
  * reference: ascending sort when higher values are better), and a pass
  * flag. Downstream pipelines can then join/filter on `ordering_ok`
  * rather than scraping logs, and the verdict itself is oracle-checkable
  * (a window/array_agg rank comparison in ANSI SQL).
  *
  * The aggregation is one shuffle on the group keys over the
  * already-aggregated (group x series)-sized frame — driver never
  * collects. Ties sort deterministically by the series combo string, and
  * null values are excluded, both matching [[Benchmark]]'s A8 pass.
  */
object OrderingCheck {

  private val SEP = "|"
  private val SUB = "/"

  /** @param expected series-combination order expected by the config,
    *                 worst first (each inner Seq is one combo of
    *                 `seriesCols` values, joined with "/" in the output)
    * @param higherIsBetter reference convention: when true the observed
    *                 order is ascending in `valueCol` (worst = smallest
    *                 value first); when false, descending. */
  def verdict(df: DataFrame, groupCols: Seq[String], seriesCols: Seq[String],
              valueCol: String, expected: Seq[Seq[String]],
              higherIsBetter: Boolean): DataFrame = {
    val combo = concat_ws(SUB, seriesCols.map(c => col(c).cast("string")): _*)
    // array_sort on the struct is ascending by (v, combo); negating the
    // value flips to descending with the combo tie-break preserved
    val sortV = if (higherIsBetter) col(valueCol) else negate(col(valueCol))
    val observed = concat_ws(SEP,
      transform(
        array_sort(collect_list(struct(sortV.as("v"), combo.as("c")))),
        x => x.getField("c")))
    df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(observed.as("observed_order"))
      .withColumn("expected_order", lit(expected.map(_.mkString(SUB)).mkString(SEP)))
      .withColumn("ordering_ok", col("observed_order") === col("expected_order"))
      .select(groupCols.map(col) :+ col("expected_order") :+
        col("observed_order") :+ col("ordering_ok"): _*)
  }
}
