package graft.sources

/** Shared executor-task plumbing for the file-granular sources
  * ([[Sqlite.scanGlob]], [[Warc.readWarc]]): the driver's effective
  * hadoop conf shipped as plain entries — `Configuration` is not
  * Java-serializable and Spark's SerializableConfiguration is
  * spark-private — so object-store credentials/endpoints survive into
  * the tasks. One snapshot per scan, one rebuild per partition. */
private[sources] object TaskConf {

  def snapshot(spark: org.apache.spark.sql.SparkSession): Array[(String, String)] = {
    val it = spark.sparkContext.hadoopConfiguration.iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
    buf.toArray
  }

  def rebuild(entries: Array[(String, String)]): org.apache.hadoop.conf.Configuration = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    entries.foreach { case (k, v) => conf.set(k, v) }
    conf
  }
}
