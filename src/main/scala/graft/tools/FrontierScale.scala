package graft.tools

import org.apache.spark.sql.functions._

/** Scale-growth smoke for crawl-frontier construction
  * (`Crawl.frontier`, q132): a synthetic harvested-link pile — skewed
  * in-link distribution (quadratic hash fold concentrates mass on low
  * page ids, like real link graphs), a messy fetch variant every third
  * row (canonicalization work), a 1000-entry blocklist (the inlined
  * suffix gate at realistic curation size), 10% of pages already seen,
  * per-host cap 100 — grown mult× while hosts/pages stay fixed.
  *
  * What linear-ish wall growth proves: the pile collapses map-side
  * (in-link counting is a partial-agg url exchange), the seen anti-join
  * rides the same partitioning, and the window works on unique URLs —
  * so the operator's cost is dominated by the scan, not the shuffle,
  * which is the property that matters when the link pile is 100 TB.
  *
  * Usage: scripts/run.sh graft.tools.FrontierScale [baseRows] [mults...]
  */
object FrontierScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = args.headOption.map(_.toLong).getOrElse(2000000L)
    val mults = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 4, 16)
    val hosts = 5000
    val pages = 200000

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val blocked = (0 until 1000).map(i => s"blocked$i.example")
    for (m <- mults) {
      val n = base * m
      // skewed page popularity: fold a hash quadratically toward 0
      val h = pmod(xxhash64(col("id")), lit(pages.toLong))
      val page = (h * h / pages).cast("long")
      val host = pmod(page, lit(hosts.toLong)).cast("string")
      val clean = concat(lit("https://h"), host, lit(".example/p/"),
        page.cast("string"))
      val messy = concat(lit("HTTPS://H"), host, lit(".EXAMPLE:443/p/"),
        page.cast("string"), lit("?utm_source=s#frag"))
      val bad = concat(lit("https://blocked"),
        pmod(col("id"), lit(1000L)).cast("string"), lit(".example/x"))
      val links = spark.range(n).select(
        when(pmod(col("id"), lit(7L)) === 0, bad)
          .when(pmod(col("id"), lit(3L)) === 0, messy)
          .otherwise(clean).as("href"))
      val seen = spark.range(pages / 10).select(
        concat(lit("https://h"),
          pmod(col("id"), lit(hosts.toLong)).cast("string"),
          lit(".example/p/"), col("id").cast("string")).as("url"))
      val r = time(s"frontier x$m") {
        graft.operators.Crawl.frontier(links, "href", seen, blocked, 100)
          .agg(count(lit(1)).as("urls"), sum("inlinks").as("links"),
            countDistinct(col("host")).as("hosts"))
          .head()
      }
      println(s"  mult=$m rows=$n -> frontier urls=${r.getLong(0)} " +
        s"inlinks=${r.getLong(1)} hosts=${r.getLong(2)}")
    }
    spark.stop()
  }
}
