package graft.operators

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame

/** Scale-adaptive input spread for CPU-heavy operator entry maps
  * (shingle md5, codec decode, vector math).
  *
  * The operators used to `repartition(defaultParallelism)` their input
  * unconditionally: correct in latency terms on a LOCAL scan (a small
  * parquet input arrives as one split and would serialize the whole
  * hashing/decoding map onto one core) but scale-adverse — at corpus
  * scale the same line shuffles the ENTIRE payload (text, vectors,
  * media bytes) through an exchange that buys nothing, because a big
  * input already arrives as more splits than the cluster has cores
  * (guide §2.4 "remove shuffles outright"; §2.5 "input skew: fix at the
  * source if you can, otherwise repartition immediately after the
  * read").
  *
  * The spread now fires only in the latency regime, decided from the
  * relation's own statistics (same decision shape as CsvSource's
  * line-repartition rule): when the input is smaller than cores ×
  * `spark.sql.files.maxPartitionBytes`, its scan cannot yield one split
  * per core, so idle cores are converted into wall time by one cheap
  * shuffle. Anything larger is throughput-bound — the scan already
  * feeds every core in waves and the repartition would be pure added
  * IO. Non-file inputs whose size Catalyst cannot estimate default to
  * `spark.sql.defaultSizeInBytes` (huge), i.e. keep their natural
  * layout.
  */
private[graft] object Spread {
  def scan(df: DataFrame): DataFrame = {
    val sess = df.sparkSession
    val par = sess.sparkContext.defaultParallelism
    // Streaming frames keep the unconditional spread: batch statistics
    // are undefined before a micro-batch exists (QueryExecution's
    // batch-only assertion throws on a streaming source), and a
    // micro-batch is latency-regime by construction.
    if (df.isStreaming) return df.repartition(par)
    val maxSplit = JavaUtils.byteStringAsBytes(
      sess.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes < BigInt(par) * maxSplit) df.repartition(par) else df
  }
}
