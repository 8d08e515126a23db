package graft

import org.apache.spark.sql.SparkSession

/** Session factory shared by Verify / Bench / tests.
  *
  * local[N] with shuffle partitions matched to cores (never the 200
  * default), AQE on so runtime statistics drive partition coalescing and
  * skew-join splitting — the same settings scale to a multi-executor
  * cluster where AQE picks post-shuffle parallelism from real sizes.
  */
object GraftSession {

  def builder(cpus: String): SparkSession.Builder =
    SparkSession
      .builder()
      .appName("bearystaspark")
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // pandas column resolution is case-sensitive: the reference corpus
      // carries 'Classes' (raw/sklearn) and 'classes' (svm/logreg/df_clsf)
      // as DISTINCT union-padded columns and indicator recipes reference
      // one of them exactly — case-insensitive resolution would merge
      // them (wrong drop semantics) or go ambiguous
      .config("spark.sql.caseSensitive", "true")
      // testdata events.parquet stores ts as TIMESTAMP(NANOS) which the
      // vectorized reader rejects; read as long nanos, Tables converts.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Default local session: SPARK_GRAFT_CPUS (driver sets it) or 32. */
  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
