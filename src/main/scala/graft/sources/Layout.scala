package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) interleaved sort
  * keys, so ONE stored sort order serves range predicates on SEVERAL
  * columns at once.
  *
  * Parquet prunes row groups by min/max statistics, which only helps
  * when the file is clustered on the filtered column. A linear sort
  * serves exactly one column; sorting by the Z-key — the bitwise
  * interleave of the coordinates — keeps rows close in EVERY dimension
  * close in the file, so a 2-D range predicate (length × quality,
  * time × key) skips most row groups on both axes. This is the layout
  * technique behind multi-dimensional clustering in modern lakehouse
  * table formats; [[BucketedStore]] answers "co-locate joins",
  * [[CorpusSink]] answers "bound file counts", `zkey` answers "make
  * min/max pruning multi-column".
  *
  * The key is pure integer arithmetic on the plan (shift/and/multiply
  * — codegen'd, mirrorable in ANSI SQL via [[zkeySql]]): coordinate j's
  * bit i lands at key bit `i·n + j`. Coordinates must already be
  * non-negative integers below 2^bits — quantize floats/ranks upstream
  * (the key clusters, it does not need exact values). `bits · n ≤ 62`
  * keeps the key in a signed long.
  */
object Layout {

  /** Z-order key over `cols` with `bits` bits per coordinate. Inputs
    * out of [0, 2^bits) raise an error at the scan (a silently wrapped
    * coordinate would quietly destroy clustering). */
  def zkey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zkey needs at least one column")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits*cols must fit a signed long: got $bits x ${cols.size}")
    val n = cols.size
    val bound = lit(1L << bits)
    val guarded = cols.map { c =>
      val cl = c.cast("long")
      when(cl < 0 || cl >= bound,
        raise_error(concat(lit(s"zkey coordinate out of [0, 2^$bits): "),
          cl.cast("string")))).otherwise(cl)
    }
    (0 until bits).flatMap { i =>
      guarded.zipWithIndex.map { case (c, j) =>
        shiftright(c, i).bitwiseAND(lit(1L)) * lit(1L << (i * n + j))
      }
    }.reduce(_ + _)
  }

  /** The ANSI-SQL mirror of [[zkey]] over column names — same shift/
    * and/multiply tree, for engine-equivalence oracles. */
  def zkeySql(cols: Seq[String], bits: Int): String = {
    require(cols.nonEmpty && bits >= 1 && bits * cols.size <= 62)
    val n = cols.size
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        s"(($c >> $i) & 1) * ${1L << (i * n + j)}"
      }
    }.mkString(" + ")
  }

  /** [[CorpusSink.writeCurated]] with in-file Z-ordering: rows inside
    * every parquet file are sorted by the interleaved key of
    * `zorderCols` (kept in the output as `zkey`, so readers can range-
    * partition on it too), making row-group min/max pruning effective
    * on all of them at once. */
  def writeZOrdered(df: DataFrame, path: String, partitionCols: Seq[String],
                    saltCol: String, zorderCols: Seq[Column], bits: Int,
                    filesPerPartition: Int = 1,
                    maxRecordsPerFile: Long = 1L << 20): Unit =
    CorpusSink.writeCurated(
      df.withColumn("zkey", zkey(zorderCols, bits)),
      path, partitionCols, saltCol, filesPerPartition,
      sortCols = Seq("zkey"), maxRecordsPerFile = maxRecordsPerFile)
}
