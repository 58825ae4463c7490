package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational core operators of the reference's algebra, re-expressed as
  * declarative Spark plans.
  *
  * Coverage (reference: modules/core/src/main/scala/sql/expr/relational/
  * RelOp.scala:107-675): Project, Select(filter), Aggregate(+HAVING),
  * Join (inner/outer/cross/semi/anti), Compound(union/intersect/except),
  * Distinct, DistinctOn, Order, LimitOffset, Values, subqueries.
  *
  * Oracle-parity rules (see SURVEY.md §5): money sums go through
  * DECIMAL(38,6) per-row casts so both engines do exact arithmetic;
  * fp ratios are rounded; every query carries a total deterministic
  * ORDER BY.
  */
object Relational {

  private def dec(c: Column): Column = c.cast(DecimalType(38, 6))

  /** Exact money sum: per-row DECIMAL(38,6) cast (order-immune exact
    * arithmetic) then ONE cast back to double — the driver hashes the
    * pyarrow value repr, where a DECIMAL output (`Decimal('1.500000')`)
    * never matches DuckDB's float64 (`1.5`); a double output matches
    * bit-for-bit because both engines do a single correctly-rounded
    * decimal->binary conversion of the same exact sum. */
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact average: exact decimal sum, one cast to double, one IEEE
    * division — bit-identical across engines, no ROUND tie risk. */
  private def davg(c: Column): Column =
    sum(dec(c)).cast("double") / count(lit(1))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Aggregate with multiple aggregates + filter (TPC-H Q1 shape).
    "q01_pricing_summary" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Project + filter: arithmetic/projection pushed onto the scan.
    "q02_filter_project" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_quantity") < lit(10.0))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          // raw double product: IEEE-identical across engines, so no
          // round() (whose half-way ties differ between engines)
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("net_price"),
          (col("l_quantity") * lit(2.0) + lit(1.0)).as("qty2"),
          (col("l_extendedprice") / (col("l_quantity") + lit(1.0)))
            .as("unit_ish"),
          (col("l_partkey") % lit(7)).as("pk_mod"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // Inner join + aggregate + top-k (TPC-H Q3 shape). Dimension side is
    // broadcast; fact join shuffles on the key.
    "q03_join_agg" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      // aggregate-before-join: the fact collapses to one row per
      // orderkey BEFORE touching the dims, so the join probes 150k
      // pre-aggregated rows instead of broadcasting the 600k-row fact
      // (which the local-stats planner otherwise does — and at 100 TB
      // the agg exchange doubles as the join distribution on the same
      // key, so the join adds no shuffle at all)
      t.lineitem
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .join(t.customer.filter(col("c_mktsegment") === "BUILDING")
            .join(t.orders, col("c_custkey") === col("o_custkey"))
            .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("o_orderdate"), col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // Semi join (EXISTS).
    "q04_exists" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer
        .join(t.orders.filter(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // GROUP BY + HAVING.
    "q05_having" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total_spent"))
        .filter(col("n_orders") >= 12)
        .orderBy(col("o_custkey"))
    },

    // GROUP BY expression (year bucket).
    "q06_group_expr" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders
        .groupBy(year(col("o_orderdate")).as("o_year"),
          col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_year"), col("o_orderpriority"))
    },

    // Full outer join with null indicators on both sides.
    "q07_outer_join" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val custAgg = t.orders.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      t.customer
        .join(custAgg, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_name"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          col("c_custkey").isNull.as("cust_missing"),
          col("o_custkey").isNull.as("orders_missing"))
        .orderBy(col("custkey"))
    },

    // Cross join (small x small).
    "q08_cross_join" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.region.crossJoin(t.supplier)
        .select(col("r_name"), col("s_name"), col("s_acctbal"))
        .orderBy(col("r_name"), col("s_name"))
    },

    // Anti join (NOT EXISTS): customers with no orders above a threshold.
    "q09_not_exists" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer
        .join(t.orders.filter(col("o_totalprice") > 300000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },

    // 5-way star join (TPC-H Q5 shape): revenue by nation. All dimension
    // tables broadcast; single shuffle on the fact keys.
    "q10_star_join" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(t.nation, col("s_nationkey") === col("n_nationkey"))
        .join(t.region, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("n_name"))
    },

    // IN subquery (rewritten as semi join by Catalyst).
    "q11_in_subquery" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val bigParts = t.part.filter(col("p_size") >= 40).select(col("p_partkey"))
      t.lineitem
        .join(bigParts, col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_partkey"))
        .agg(dsum(col("l_quantity")).as("qty"))
        .orderBy(col("l_partkey"))
    },

    // Quantified comparisons (reference SqlQueryParser ANY/ALL
    // subqueries): > ALL (S) and < ANY (S) rewrite to comparisons
    // against the 1-row max(S) aggregate, broadcast into the scan —
    // the oracle runs DuckDB's NATIVE ALL/ANY operators against the
    // same subquery, proving the rewrite's semantics. (Non-null,
    // non-empty S: the standard rewrite preconditions, satisfied
    // here; NULL/empty cases take the EXISTS guard form.)
    "q192_any_all" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val ref = t.part.where(col("p_brand") === "Brand#11")
        .agg(max(col("p_retailprice")).as("mx"))
      t.part.crossJoin(broadcast(ref))
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
          (col("p_retailprice") > col("mx")).as("above_all"),
          (col("p_retailprice") < col("mx")).as("below_any"))
        .orderBy(col("p_partkey"))
    },

    // Scalar subquery: parts priced above the overall average. The scalar
    // is a 1-row aggregate broadcast into the comparison (no collect()).
    "q12_scalar_subquery" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val avgPrice = t.part.agg(
        round(avg(col("p_retailprice")), 4).as("avg_price"))
      t.part.crossJoin(broadcast(avgPrice))
        .filter(col("p_retailprice") > col("avg_price"))
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        .orderBy(col("p_partkey"))
    },

    // Compound operators: UNION ALL / INTERSECT / EXCEPT in one result,
    // tagged by branch.
    "q13_compound" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val buyers = t.orders.filter(col("o_totalprice") > 250000.0)
        .select(col("o_custkey").as("custkey")).distinct()
      val urgent = t.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey")).distinct()
      val u = buyers.union(urgent).distinct()
        .withColumn("src", lit("union"))
      val i = buyers.intersect(urgent).withColumn("src", lit("intersect"))
      val e = buyers.except(urgent).withColumn("src", lit("except"))
      u.unionAll(i).unionAll(e).orderBy(col("src"), col("custkey"))
    },

    // DISTINCT over a projection.
    "q14_distinct" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders
        .select(col("o_orderstatus"), col("o_orderpriority"))
        .distinct()
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    },

    // DISTINCT ON (latest order per customer) — window + filter; identical
    // row_number semantics on the oracle side.
    "q15_distinct_on" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey"))
      t.orders
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .orderBy(col("o_custkey"))
    },

    // ORDER BY with NULLS LAST + LIMIT/OFFSET; nulls synthesized
    // deterministically so the sort exercises null ordering.
    "q16_sort_limit" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer
        .withColumn("bal",
          when(col("c_acctbal") < 0.0, lit(null)).otherwise(col("c_acctbal")))
        .select(col("c_custkey"), col("bal"))
        .orderBy(col("bal").desc_nulls_last, col("c_custkey"))
        .offset(5).limit(20)
    },

    // VALUES inline table joined against a base table.
    "q17_values" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      import spark.implicits._
      val segments = Seq(
        ("BUILDING", 1), ("MACHINERY", 2), ("AUTOMOBILE", 3))
        .toDF("seg", "seg_rank")
      t.customer
        .join(broadcast(segments), col("c_mktsegment") === col("seg"))
        .groupBy(col("seg"), col("seg_rank"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("seg_rank"))
    },

    // CASE expression bucketing + conditional aggregation.
    "q18_case" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders
        .withColumn("bucket",
          when(col("o_totalprice") < 100000.0, "small")
            .when(col("o_totalprice") < 300000.0, "medium")
            .otherwise("large"))
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
          davg(col("o_totalprice")).as("avg_price"))
        .orderBy(col("bucket"))
    }
  )

  def oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS net_price,
        |  l_quantity * 2.0 + 1.0 AS qty2,
        |  l_extendedprice / (l_quantity + 1.0) AS unit_ish,
        |  l_partkey % 7 AS pk_mod
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_quantity < 10.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_join_agg" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q04_exists" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q05_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_spent
        |FROM orders GROUP BY o_custkey
        |HAVING COUNT(*) >= 12
        |ORDER BY o_custkey""".stripMargin,

    "q06_group_expr" ->
      """SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year, o_orderpriority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2
        |ORDER BY o_year, o_orderpriority""".stripMargin,

    "q07_outer_join" ->
      """SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_name,
        |  COALESCE(n_orders, 0) AS n_orders,
        |  c_custkey IS NULL AS cust_missing,
        |  o_custkey IS NULL AS orders_missing
        |FROM customer
        |FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_orders
        |  FROM orders GROUP BY o_custkey) oa
        |ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,

    "q08_cross_join" ->
      """SELECT r_name, s_name, s_acctbal
        |FROM region CROSS JOIN supplier
        |ORDER BY r_name, s_name""".stripMargin,

    "q09_not_exists" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q10_star_join" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q11_in_subquery" ->
      """SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 40)
        |GROUP BY l_partkey
        |ORDER BY l_partkey""".stripMargin,

    "q192_any_all" ->
      """SELECT p_partkey, p_brand, p_retailprice,
        |  p_retailprice > ALL (SELECT p_retailprice FROM part
        |    WHERE p_brand = 'Brand#11') AS above_all,
        |  p_retailprice < ANY (SELECT p_retailprice FROM part
        |    WHERE p_brand = 'Brand#11') AS below_any
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q12_scalar_subquery" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |WHERE p_retailprice >
        |  (SELECT ROUND(AVG(p_retailprice), 4) FROM part)
        |ORDER BY p_partkey""".stripMargin,

    "q13_compound" ->
      """WITH buyers AS (SELECT DISTINCT o_custkey AS custkey FROM orders
        |    WHERE o_totalprice > 250000.0),
        |  urgent AS (SELECT DISTINCT o_custkey AS custkey FROM orders
        |    WHERE o_orderpriority = '1-URGENT')
        |SELECT custkey, 'union' AS src
        |  FROM (SELECT custkey FROM buyers UNION SELECT custkey FROM urgent)
        |UNION ALL
        |SELECT custkey, 'intersect' AS src
        |  FROM (SELECT custkey FROM buyers INTERSECT SELECT custkey FROM urgent)
        |UNION ALL
        |SELECT custkey, 'except' AS src
        |  FROM (SELECT custkey FROM buyers EXCEPT SELECT custkey FROM urgent)
        |ORDER BY src, custkey""".stripMargin,

    "q14_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "q15_distinct_on" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey) AS rn FROM orders) x
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,

    "q16_sort_limit" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0.0 THEN NULL ELSE c_acctbal END AS bal
        |FROM customer
        |ORDER BY bal DESC NULLS LAST, c_custkey
        |LIMIT 20 OFFSET 5""".stripMargin,

    "q17_values" ->
      """SELECT seg, seg_rank, COUNT(*) AS n_cust
        |FROM customer
        |JOIN (VALUES ('BUILDING', 1), ('MACHINERY', 2), ('AUTOMOBILE', 3))
        |  AS v(seg, seg_rank)
        |ON c_mktsegment = seg
        |GROUP BY seg, seg_rank
        |ORDER BY seg_rank""".stripMargin,

    "q18_case" ->
      """SELECT CASE WHEN o_totalprice < 100000.0 THEN 'small'
        |  WHEN o_totalprice < 300000.0 THEN 'medium'
        |  ELSE 'large' END AS bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_price
        |FROM orders
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin
  )
}
