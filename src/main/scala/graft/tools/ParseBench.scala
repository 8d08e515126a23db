package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Dev: isolate the per-task cost of the recipe CSV record parse (guide
  * §1.2 "per-task work") — times from_csv vs graft_csv_fields over the
  * same synthetic benchmark-log lines through the noop sink (guide §1.4),
  * min-of-3 per variant. Args: [rows] [fields].
  * Results recorded in OPTIMIZATION_r11.md / SCALE.md. */
object ParseBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(4000000L)
    val nFields = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    // benchmark-log-ish lines: numbers, words, a padded field, a blank —
    // quote-free (the fast path the corpus exercises)
    val line = (i: org.apache.spark.sql.Column) => concat_ws(",",
      i.cast("string"), lit("sklearn_kmeans"), (i % 97).cast("string"),
      format_string(" %.3f", i * 0.001), lit(""), lit("x86_64"),
      (i * 31 % 1000).cast("string"), lit("train"))
    val df = spark.range(rows).select(line(col("id")).as("l"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    df.count() // pin the input so both variants read identical cached bytes

    val schema = StructType((0 until nFields).map(i => StructField(s"c$i", StringType)))
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-18s min=${secs.min}%.2fs  runs=${secs.map(s => f"$s%.2f").mkString(",")}")
      secs.min
    }
    val a = time("from_csv") {
      df.select(from_csv(col("l"), schema,
        Map("ignoreLeadingWhiteSpace" -> "true")).as("r"))
        .select((0 until nFields).map(i => col(s"r.c$i")): _*)
    }
    val b = time("graft_csv_fields") {
      df.select(call_function("graft_csv_fields", col("l"), lit(nFields)).as("a"))
        .select((0 until nFields).map(i => col("a").getItem(i).as(s"c$i")): _*)
    }
    println(f"rows=$rows fields=$nFields speedup=${a / b}%.2fx")
    spark.stop()
  }
}
