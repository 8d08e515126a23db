package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/** Driver contract — one `queries` entry (+ matching DuckDB `oracleSql`)
  * per implemented operator from SURVEY.md §2.
  *
  * Numeric determinism: floating-point sums are order-dependent, so both
  * sides sum via DECIMAL(28,6) (see [[graft.functions.dsum]]) and means of
  * logs are rounded — every value below is bit-identical between Spark and
  * DuckDB regardless of partitioning.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_group_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A1/A2: the core group-aggregate (bearysta aggregate.py:719-727)
    "q01_group_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("n_rows"))
    }),

    // ---- A2: min/max/median (exact median, not approx — oracle equality)
    "q02_minmax_median" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          median(col("o_totalprice")).as("med_price"),
          count(lit(1)).as("n_rows"))
    }),

    // ---- A2: geomean = exp(avg(ln x)) (aggregate.py:94-99)
    "q03_geomean" -> ((s, dir) => {
      t(s, dir, "part")
        .groupBy("p_brand")
        .agg(round(geomean(col("p_retailprice")), 6).as("geo_price"),
             count(lit(1)).as("n_rows"))
    }),

    // ---- A3: empty-key group-by = one global group (aggregate.py:21-39)
    "q04_global_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy()
        .agg(
          count(lit(1)).as("n_rows"),
          dsum(col("l_extendedprice")).as("sum_price"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"))
    }),

    // ---- F2: filter-in, typed isin (aggregate.py:549-551)
    "q05_filter_in" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderstatus").isin("F", "O"))
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_rows"),
             dsum(col("o_totalprice")).as("sum_price"))
    }),

    // ---- F1: filter-out, NOT-IN incl. numeric-typed values
    //      (aggregate.py:341-343; typed match per SURVEY §2.3 note)
    "q06_filter_out" -> ((s, dir) => {
      t(s, dir, "part")
        .filter(!col("p_size").isin(1, 2, 3))
        .filter(!col("p_type").isin("PROMO"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_rows"),
             dsum(col("p_retailprice")).as("sum_price"))
    }),

    // ---- P1/P2/P3: rename + computed columns (when/otherwise, split,
    //      concat — the precomputed idiom set of SURVEY §2.2)
    "q07_rename_computed" -> ((s, dir) => {
      t(s, dir, "customer")
        .withColumnRenamed("c_mktsegment", "segment")
        .withColumn("tier",
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high"))
        .withColumn("cust_num", element_at(split(col("c_name"), "#"), 2))
        .groupBy("segment", "tier")
        .agg(count(lit(1)).as("n_rows"),
             min(col("cust_num")).as("first_cust"))
    }),

    // ---- A4: ratio_of — ratio of group-aggregate to base-aggregate,
    //      base picked by series literal (aggregate.py:354-442)
    "q08_ratio_of" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val grp = li.groupBy("l_returnflag", "l_linestatus")
        .agg(davg(col("l_extendedprice")).as("v"))
      val base = li.filter(col("l_returnflag") === "N")
        .groupBy("l_linestatus")
        .agg(davg(col("l_extendedprice")).as("b"))
      grp.join(broadcast(base), Seq("l_linestatus"))
        .select(col("l_returnflag"), col("l_linestatus"),
                (col("v") / col("b")).as("ratio"))
    }),

    // ---- R1: pack / melt (aggregate.py:511-517) — Dataset.unpivot
    "q09_pack" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "name", "value")
    }),

    // ---- R2/W1: unpack / pivot (aggregate.py:519-541) — name column
    //      becomes one column per value
    "q10_unpack" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(dsum(col("value")))
    }),

    // ---- O3: union-by-name with missing→null (aggregate.py:173)
    "q11_union_by_name" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(
        col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_acctbal").as("acctbal"), col("c_mktsegment").as("segment"),
        lit("customer").as("src"))
      val sup = t(s, dir, "supplier").select(
        col("s_suppkey").as("id"), col("s_name").as("name"),
        col("s_acctbal").as("acctbal"), lit("supplier").as("src"))
      c.unionByName(sup, allowMissingColumns = true)
    }),

    // ---- A6: distinct / drop_duplicates (aggregate.py:633,687)
    "q12_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
    }),

    // ---- O4: except — expected-minus-present (aggregate.py:639)
    "q13_except" -> ((s, dir) => {
      val all = t(s, dir, "part").select("p_type").distinct()
      val small = t(s, dir, "part").filter(col("p_size") < 45)
        .select("p_type").distinct()
      all.except(small)
    }),

    // ---- J2: equi-join + aggregate; dim side broadcast
    "q14_join_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
             dsum(col("o_totalprice")).as("sum_price"))
    })
  )

  // DuckDB-dialect oracle. CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)
  // mirrors graft.functions.dsum exactly.
  private def DSUM(x: String) = s"CAST(SUM(CAST($x AS DECIMAL(28,6))) AS DOUBLE)"
  private def DAVG(x: String) = s"${DSUM(x)} / COUNT($x)"

  def oracleSql: Map[String, String] = Map(
    "q01_group_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         ${DSUM("l_quantity")} AS sum_qty,
         ${DSUM("l_extendedprice")} AS sum_price,
         ${DAVG("l_discount")} AS avg_disc,
         COUNT(*) AS n_rows
         FROM lineitem GROUP BY 1, 2""",
    "q02_minmax_median" ->
      """SELECT o_orderpriority,
         MIN(o_totalprice) AS min_price,
         MAX(o_totalprice) AS max_price,
         MEDIAN(o_totalprice) AS med_price,
         COUNT(*) AS n_rows
         FROM orders GROUP BY 1""",
    "q03_geomean" ->
      """SELECT p_brand,
         ROUND(EXP(AVG(LN(p_retailprice))), 6) AS geo_price,
         COUNT(*) AS n_rows
         FROM part GROUP BY 1""",
    "q04_global_agg" ->
      s"""SELECT COUNT(*) AS n_rows,
         ${DSUM("l_extendedprice")} AS sum_price,
         MIN(l_shipdate) AS min_ship,
         MAX(l_shipdate) AS max_ship
         FROM lineitem""",
    "q05_filter_in" ->
      s"""SELECT o_orderstatus, o_orderpriority,
         COUNT(*) AS n_rows, ${DSUM("o_totalprice")} AS sum_price
         FROM orders
         WHERE o_orderstatus IN ('F', 'O')
           AND o_orderpriority IN ('1-URGENT', '2-HIGH')
         GROUP BY 1, 2""",
    "q06_filter_out" ->
      s"""SELECT p_brand, COUNT(*) AS n_rows,
         ${DSUM("p_retailprice")} AS sum_price
         FROM part
         WHERE p_size NOT IN (1, 2, 3) AND p_type NOT IN ('PROMO')
         GROUP BY 1""",
    "q07_rename_computed" ->
      """SELECT c_mktsegment AS segment,
         CASE WHEN c_acctbal < 0 THEN 'negative'
              WHEN c_acctbal < 5000 THEN 'mid'
              ELSE 'high' END AS tier,
         COUNT(*) AS n_rows,
         MIN(str_split(c_name, '#')[2]) AS first_cust
         FROM customer GROUP BY 1, 2""",
    "q08_ratio_of" ->
      s"""WITH grp AS (
           SELECT l_returnflag, l_linestatus,
                  ${DAVG("l_extendedprice")} AS v
           FROM lineitem GROUP BY 1, 2),
         base AS (
           SELECT l_linestatus, ${DAVG("l_extendedprice")} AS b
           FROM lineitem WHERE l_returnflag = 'N' GROUP BY 1)
         SELECT grp.l_returnflag, grp.l_linestatus, grp.v / base.b AS ratio
         FROM grp JOIN base USING (l_linestatus)""",
    "q09_pack" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS name, l_quantity AS value FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_discount' AS name, l_discount AS value FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_tax' AS name, l_tax AS value FROM lineitem""",
    "q10_unpack" ->
      s"""SELECT user_id,
         CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN value END AS DECIMAL(28,6))) AS DOUBLE) AS click,
         CAST(SUM(CAST(CASE WHEN event_type = 'error' THEN value END AS DECIMAL(28,6))) AS DOUBLE) AS error,
         CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value END AS DECIMAL(28,6))) AS DOUBLE) AS purchase,
         CAST(SUM(CAST(CASE WHEN event_type = 'signup' THEN value END AS DECIMAL(28,6))) AS DOUBLE) AS signup,
         CAST(SUM(CAST(CASE WHEN event_type = 'view' THEN value END AS DECIMAL(28,6))) AS DOUBLE) AS view
         FROM events GROUP BY 1""",
    "q11_union_by_name" ->
      """SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal,
                c_mktsegment AS segment, 'customer' AS src
         FROM customer
         UNION ALL BY NAME
         SELECT s_suppkey AS id, s_name AS name, s_acctbal AS acctbal,
                'supplier' AS src
         FROM supplier""",
    "q12_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q13_except" ->
      """SELECT DISTINCT p_type FROM part
         EXCEPT
         SELECT DISTINCT p_type FROM part WHERE p_size < 45""",
    "q14_join_agg" ->
      s"""SELECT c_mktsegment,
         COUNT(*) AS n_orders, ${DSUM("o_totalprice")} AS sum_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1"""
  )
}
