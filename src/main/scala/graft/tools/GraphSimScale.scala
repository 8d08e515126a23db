package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.operators.{Crawl, Dedup, Multimodal}
import graft.expressions.PngCodec

/** Scale-growth smoke for the round-9 graph/similarity additions:
  *
  *  1. `Crawl.pageRank` — edges AND nodes grown mult× (a bigger web,
  *     not a denser one), 5 iterations. Linear-ish wall proves the
  *     iteration cost is the src-keyed join + dst-keyed partial-agg
  *     exchange over the edge list, with no N²/driver term; the
  *     fixed-point rank sum is printed as the bit-stability canary
  *     (same graph → same sum, any partitioning).
  *  2. `Multimodal.dhashNearDups` — an image corpus grown mult× where
  *     hashes are near-unique by construction (hash-mixed pixel
  *     patterns) except one planted exact twin per base asset, so TRUE
  *     pairs grow exactly linearly. Payloads are persisted before the
  *     timed leg (decode+hash+join only). A quadratic bend would mean
  *     band buckets are degenerating instead of tracking content
  *     diversity.
  *  3. `Dedup.prefixJaccardPairs` — the ScaleSmoke replica trick
  *     (per-replica token suffixes: no shingle crosses replicas) plus a
  *     tail-mutated twin per doc: pair truth grows linearly while the
  *     shingle universe grows mult×. Tests that the df aggregate and
  *     prefix-keyed join stay scan-shaped as the corpus AND vocabulary
  *     grow.
  *
  * Usage: scripts/run.sh graft.tools.GraphSimScale [sfDir] [mults...]
  */
object GraphSimScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 4, 16)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def enabled(name: String): Boolean =
      only.forall(_.exists(p => name.contains(p) || p.contains(name)))

    for (m <- mults) {
      println(s"mult=$m")

      if (enabled("pageRank")) {
        val baseEdges = 2000000L
        val baseNodes = 100000L
        val nodes = baseNodes * m
        // skewed in-degree (quadratic hash fold), like a real web graph
        val h = pmod(xxhash64(col("id")), lit(nodes))
        val edges = spark.range(baseEdges * m).select(
          h.as("src"),
          (pmod(xxhash64(col("id"), lit(1)), lit(nodes)) *
            pmod(xxhash64(col("id"), lit(2)), lit(nodes)) / nodes)
            .cast("long").as("dst"))
        val (cnt, mass) = time(s"pageRank x$m") {
          val r = Crawl.pageRank(edges, "src", "dst", iterations = 5)
            .agg(count(lit(1)), sum(col("rank"))).head()
          (r.getLong(0), r.getLong(1))
        }
        println(s"    nodes=$cnt rankMass=$mass")
      }

      if (enabled("ccAppend")) {
        // daily-ingest clustering: 64-long chain components over n
        // nodes (deep enough that a rebuild pays ~log2(64) alternating-
        // star rounds), then fold in a 1k-pair delta bridging random
        // blocks. The append re-enters the loop with one already-
        // contracted star edge per non-root node, so its rounds chase
        // only the delta's chains — compare against the full rebuild
        // over base + delta at each mult. (connectedComponents runs its
        // loop EAGERLY — per-round signature actions — so timing wraps
        // the call, and count() just reads the final star set.)
        val n = 100000L * m
        val base = spark.range(n).filter(col("id") % 64 =!= 63)
          .select(col("id").as("u"), (col("id") + 1).as("v"))
        val delta = spark.range(1000)
          .select(pmod(xxhash64(col("id")), lit(n)).as("u"),
            pmod(xxhash64(col("id"), lit(7)), lit(n)).as("v"))
        val pre = time(s"ccBuildBase x$m") {
          val p = Dedup.connectedComponents(base)
            .persist(StorageLevel.MEMORY_AND_DISK)
          p.count()
          p
        }
        val nApp = time(s"ccAppend x$m")(
          graft.operators.Dedup.ccAppend(pre, delta).count())
        val nFull = time(s"ccRebuild x$m")(
          Dedup.connectedComponents(base.unionAll(delta)).count())
        println(s"    appendRows=$nApp rebuildRows=$nFull")
        pre.unpersist()
      }

      if (enabled("dhashNearDups")) {
        val baseAssets = 20000L
        val pxSchema = StructType(Seq(
          StructField("asset_id", LongType, nullable = false),
          StructField("payload", BinaryType, nullable = true)))
        val n = baseAssets * m
        val assets = spark.range(n).mapPartitions { it =>
          it.flatMap { id =>
            val w = (id % 13 + 6).toInt; val h = (id % 11 + 6).toInt
            // PER-PIXEL murmur-style finalizer: any formula AFFINE in i
            // (plain multiply-add included) yields near-constant
            // adjacent-pixel differences, which preserves gradient signs
            // across ids and blows pairs up quadratically — the q145
            // fixture's deliberate collision design. The xor-shift +
            // multiply makes differences non-linear, so dHashes are
            // near-unique and TRUE pairs are exactly the planted twins.
            val px = Array.tabulate(w * h) { i =>
              val x = id * 2654435761L + i * 0x9E3779B97F4A7C15L
              val y = (x ^ (x >>> 31)) * 0xFF51AFD7ED558CCDL
              ((y >>> 33) & 0xFF).toByte
            }
            val png = PngCodec.encode(PngCodec.Raster(w, h, 1, px))
            Seq(org.apache.spark.sql.Row(id, png),
              org.apache.spark.sql.Row(id + n, png)) // exact twin
          }
        }(org.apache.spark.sql.Encoders.row(pxSchema))
          .persist(StorageLevel.MEMORY_AND_DISK)
        assets.count() // pin payloads: the timed leg is decode+hash+join
        val pairs = time(s"dhashNearDups x$m") {
          Multimodal.dhashNearDups(assets, maxHamming = 2, bands = 4).count()
        }
        println(s"    assets=${2 * n} pairs=$pairs")
        assets.unpersist()
      }

      if (enabled("prefixJaccard")) {
        val replicated = docs
          .withColumn("rep", explode(sequence(lit(0), lit(m - 1))))
          .select(
            (col("doc_id") * m + col("rep")).as("doc_id"),
            array_join(transform(split(trim(col("text")), "\\s+"),
              t => concat(t, lit("_"), col("rep"))), " ").as("text"))
        val salted = replicated.union(replicated.select(
          (col("doc_id") + lit(100000000L)).as("doc_id"),
          concat(col("text"), lit(" graft dup probe tail")).as("text")))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val total = salted.count()
        val pairs = time(s"prefixJaccard x$m") {
          Dedup.prefixJaccardPairs(salted, "doc_id", "text",
            n = 3, threshold = 0.5).count()
        }
        println(s"    docs=$total pairs=$pairs")
        salted.unpersist()
      }
    }
    spark.stop()
  }
}
