package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities for skewed data.
  *
  * At 100 TB a handful of hot keys turn a shuffled equi-join into a
  * straggler: every row of a hot key lands on one reducer. AQE's skew
  * split (enabled in GraftSession) handles moderate skew after the fact;
  * [[saltedEquiJoin]] removes it up front by sharding each big-side key
  * into `salts` sub-keys and replicating the small side per shard — the
  * classic salting rewrite. Results are identical to the plain join (the
  * salt is internal), verified by the q42 oracle.
  */
object Joins {

  /** Equi-join `big ⋈ small` on `key` with the big side salted into
    * `salts` shards. `small` is replicated `salts`× via explode — keep it
    * the dimension side. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, bigKey: String,
                     smallKey: String, salts: Int,
                     joinType: String = "inner"): DataFrame = {
    val saltVals = array((0 until salts).map(lit): _*)
    val b = big.withColumn("__salt", pmod(xxhash64(col(bigKey)), lit(salts)))
    val s = small.withColumn("__salt", explode(saltVals))
    b.join(s, b(bigKey) === s(smallKey) && b("__salt") === s("__salt"), joinType)
      .drop("__salt")
  }
}
