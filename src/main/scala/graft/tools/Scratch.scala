package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Throwaway dev experiments (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    time("count")(li.count())
    time("count again")(li.count())
    def checks(cols: Seq[String]) = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNotNull && col(c).try_cast(DoubleType).isNull, 1L).otherwise(0L)).as(s"${c}__baddbl"),
        sum(when(col(c).isNotNull && !trim(col(c)).rlike("^[+-]?\\d+$"), 1L).otherwise(0L)).as(s"${c}__badlong"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        count(col(c)).as(s"${c}__nnz"))
    } :+ count(lit(1L)).as("__nrows")
    time("infer agg 2 cols (rlike)")(li.select(checks(Seq("l_returnflag", "l_linestatus")): _*).collect())
    time("infer agg 2 cols again")(li.select(checks(Seq("l_returnflag", "l_linestatus")): _*).collect())
    def checks2(cols: Seq[String]) = cols.flatMap { c =>
      val cls = call_function("graft_numclass", col(c))
      Seq(
        sum(when(cls === lit(3), 1L).otherwise(0L)).as(s"${c}__baddbl"),
        sum(when(cls > lit(1), 1L).otherwise(0L)).as(s"${c}__badlong"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        count(col(c)).as(s"${c}__nnz"))
    } :+ count(lit(1L)).as("__nrows")
    time("infer agg 2 cols (numclass)")(li.select(checks2(Seq("l_returnflag", "l_linestatus")): _*).collect())
    time("infer agg numclass again")(li.select(checks2(Seq("l_returnflag", "l_linestatus")): _*).collect())
    time("median 1 col")(li.groupBy("l_linestatus").agg(median(col("l_extendedprice"))).collect())
    time("median again")(li.groupBy("l_linestatus").agg(median(col("l_extendedprice"))).collect())
    time("graft_median")(li.groupBy("l_linestatus").agg(graft.functions.exactMedian(col("l_extendedprice"))).collect())
    time("graft_median again")(li.groupBy("l_linestatus").agg(graft.functions.exactMedian(col("l_extendedprice"))).collect())
    spark.stop()
  }
}
