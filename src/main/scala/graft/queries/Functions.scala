package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Scalar function library + aggregate/window function surface of the
  * reference, re-expressed with `org.apache.spark.sql.functions._`
  * (whole-stage-codegen'd — no UDFs anywhere).
  *
  * Inventory source (reference): modules/core/src/main/scala/sql/exec/
  * scalar/ScalFunctionEvaluator.scala:38-56 (aggregates) and the
  * scalarFunctions map below it; window/ordered aggregates from
  * analytics/sequence/matcher/aggregate/SeqAggregate.scala.
  *
  * FP parity notes (SURVEY.md §5): libm transcendentals may differ by
  * 1 ulp between engines → ROUND(x, 6) on both sides; exact ops
  * (floor/ceil/sign/sqrt/mod) stay raw; multi-pass moment stats use the
  * same explicit raw-moment formula on both sides.
  */
object Functions {

  private def dec(c: Column): Column = c.cast(DecimalType(38, 6))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Math scalar functions over part.
    "q19_math_funcs" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val x = col("p_retailprice") / lit(1000.0)
      t.part.select(
        col("p_partkey"),
        abs(col("p_retailprice") * lit(-1.0)).as("f_abs"),
        floor(col("p_retailprice")).as("f_floor"),
        ceil(col("p_retailprice")).as("f_ceil"),
        when(x >= 0, floor(x)).otherwise(ceil(x)).as("f_trunc"),
        signum(col("p_retailprice") - lit(1000.0)).as("f_sign"),
        sqrt(col("p_retailprice")).as("f_sqrt"),
        round(pow(x, lit(1.5)), 6).as("f_pow"),
        round(exp(x * lit(-1.0)), 6).as("f_exp"),
        round(log(col("p_retailprice")), 6).as("f_ln"),
        round(log10(col("p_retailprice")), 6).as("f_log10"),
        round(sin(x), 6).as("f_sin"),
        round(cos(x), 6).as("f_cos"),
        round(atan(x), 6).as("f_atan"),
        (col("p_partkey") % lit(13L)).as("f_mod"),
        expr("p_partkey div 7").as("f_intdiv"),
        lit(math.Pi).as("f_pi"))
        .orderBy(col("p_partkey"))
    },

    // String scalar functions over customer/nation names.
    "q20_string_funcs" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer.select(
        col("c_custkey"),
        concat(col("c_name"), lit("_"), col("c_mktsegment")).as("f_concat"),
        length(col("c_name")).as("f_len"),
        lower(col("c_name")).as("f_lower"),
        upper(col("c_mktsegment")).as("f_upper"),
        trim(concat(lit("  "), col("c_name"), lit("  "))).as("f_trim"),
        substring(col("c_name"), 1, 8).as("f_substr"),
        instr(col("c_name"), "0").as("f_strpos"),
        regexp_replace(col("c_name"), "Customer", "Cust").as("f_replace"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("f_lpad"),
        reverse(col("c_mktsegment")).as("f_reverse"),
        repeat(substring(col("c_mktsegment"), 1, 2), 2).as("f_repeat"),
        split_part(col("c_name"), lit("#"), lit(2)).as("f_split_part"))
        .orderBy(col("c_custkey"))
    },

    // NULL-handling scalars; nulls synthesized deterministically.
    "q21_null_funcs" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val balOrNull =
        when(col("c_acctbal") < 0.0, lit(null)).otherwise(col("c_acctbal"))
      t.customer.select(
        col("c_custkey"),
        coalesce(balOrNull, lit(0.0)).as("f_coalesce"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("f_nullif"),
        greatest(col("c_acctbal"), lit(5000.0)).as("f_greatest"),
        least(col("c_acctbal"), lit(5000.0)).as("f_least"),
        balOrNull.isNull.as("f_isnull"))
        .orderBy(col("c_custkey"))
    },

    // Date/time functions over orders timestamps.
    "q22_date_funcs" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders.select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("f_year"),
        month(col("o_orderdate")).as("f_month"),
        dayofmonth(col("o_orderdate")).as("f_day"),
        dayofyear(col("o_orderdate")).as("f_doy"),
        (dayofweek(col("o_orderdate")) - lit(1)).as("f_dow"),
        quarter(col("o_orderdate")).as("f_quarter"),
        date_trunc("month", col("o_orderdate")).as("f_trunc_month"),
        (col("o_orderdate") + expr("INTERVAL 3 DAYS")).as("f_plus_3d"),
        (col("o_orderdate") - expr("INTERVAL 2 HOURS")).as("f_minus_2h"),
        datediff(lit("2002-01-01").cast("date"),
          col("o_orderdate").cast("date")).cast("long").as("f_days_to"),
        unix_timestamp(col("o_orderdate")).as("f_epoch"),
        last_day(col("o_orderdate").cast("date")).as("f_last_day"),
        col("o_orderdate").cast("date").as("f_date"))
        .orderBy(col("o_orderkey"))
    },

    // Predicates: LIKE / ILIKE / regex / BETWEEN / IS DISTINCT FROM / IN.
    "q23_predicates" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.part.select(
        col("p_partkey"),
        col("p_name").like("%part_1%").as("f_like"),
        col("p_name").ilike("%PART%").as("f_ilike"),
        col("p_name").rlike("part_[0-9]+$").as("f_regex"),
        col("p_size").between(10, 20).as("f_between"),
        (!(col("p_brand") <=> col("p_type"))).as("f_distinct_from"),
        col("p_type").isin("PROMO", "ECONOMY").as("f_in"))
        .orderBy(col("p_partkey"))
    },

    // BETWEEN SYMMETRIC (reference rangeQual Symmetric,
    // SqlQueryParser.scala:722-727): bound order doesn't matter —
    // rewritten to between(least, greatest). Both orders exercised
    // against a bound pair derived per row.
    "q194_between_symmetric" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val lo = pmod(col("p_partkey"), lit(30))
      val hi = lit(20)
      t.part.select(
        col("p_partkey"), col("p_size"),
        col("p_size").between(least(lo, hi), greatest(lo, hi))
          .as("f_symmetric"),
        col("p_size").between(lo, hi).as("f_asymmetric"))
        .orderBy(col("p_partkey"))
    },

    // COUNT/SUM/AVG/MIN/MAX + DISTINCT qualifiers.
    "q24_count_distinct" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey"), col("l_suppkey")).as("n_part_supp"),
          sum_distinct(col("l_linenumber").cast("long")).as("sum_dist_line"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
        .orderBy(col("l_returnflag"))
    },

    // Dispersion/association statistics. Small-magnitude inputs keep
    // absolute fp error far below the ROUND(6) grain.
    "q25_stats_agg" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          (round(stddev_pop(col("l_quantity")), 6) + lit(0.0)).as("sd_pop_qty"),
          (round(stddev_samp(col("l_quantity")), 6) + lit(0.0)).as("sd_samp_qty"),
          (round(var_pop(col("l_quantity")), 6) + lit(0.0)).as("var_pop_qty"),
          (round(var_samp(col("l_quantity")), 6) + lit(0.0)).as("var_samp_qty"),
          (round(corr(col("l_quantity"), col("l_discount")), 6) + lit(0.0)).as("corr_qd"),
          (round(covar_pop(col("l_discount"), col("l_tax")), 6) + lit(0.0)).as("cov_pop_dt"),
          (round(covar_samp(col("l_discount"), col("l_tax")), 6) + lit(0.0))
            .as("cov_samp_dt"))
        .orderBy(col("l_returnflag"))
    },

    // Linear-regression aggregates (y = quantity over x = discount).
    "q26_regr_agg" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val y = col("l_quantity"); val x = col("l_discount")
      t.lineitem
        .groupBy(col("l_linestatus"))
        .agg(
          regr_count(y, x).as("r_count"),
          round(regr_avgx(y, x), 6).as("r_avgx"),
          round(regr_avgy(y, x), 6).as("r_avgy"),
          round(regr_slope(y, x), 4).as("r_slope"),
          round(regr_intercept(y, x), 4).as("r_intercept"),
          round(regr_r2(y, x), 6).as("r_r2"),
          round(regr_sxx(y, x), 4).as("r_sxx"),
          round(regr_syy(y, x), 2).as("r_syy"),
          round(regr_sxy(y, x), 4).as("r_sxy"))
        .orderBy(col("l_linestatus"))
    },

    // Skewness/kurtosis (pop + sample) via explicit raw-moment formulas —
    // written identically on the oracle side so engine-internal
    // definitional differences (g1 vs G1) can't bite.
    "q27_skew_kurt" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          avg(col("l_quantity")).as("m1"),
          avg(col("l_quantity") * col("l_quantity")).as("m2r"),
          avg(col("l_quantity") * col("l_quantity") * col("l_quantity"))
            .as("m3r"),
          avg(col("l_quantity") * col("l_quantity") * col("l_quantity")
            * col("l_quantity")).as("m4r"))
        .select(
          col("l_returnflag"),
          round((col("m3r") - lit(3.0) * col("m1") * col("m2r")
            + lit(2.0) * col("m1") * col("m1") * col("m1"))
            / pow(col("m2r") - col("m1") * col("m1"), 1.5), 6)
            .as("skew_pop"),
          round((col("m4r") - lit(4.0) * col("m1") * col("m3r")
            + lit(6.0) * col("m1") * col("m1") * col("m2r")
            - lit(3.0) * col("m1") * col("m1") * col("m1") * col("m1"))
            / pow(col("m2r") - col("m1") * col("m1"), 2.0) - lit(3.0), 6)
            .as("kurt_pop"),
          round(sqrt(col("n") * (col("n") - lit(1.0))) / (col("n") - lit(2.0))
            * (col("m3r") - lit(3.0) * col("m1") * col("m2r")
              + lit(2.0) * col("m1") * col("m1") * col("m1"))
            / pow(col("m2r") - col("m1") * col("m1"), 1.5), 6)
            .as("skew_samp"))
        .orderBy(col("l_returnflag"))
    },

    // Boolean aggregates.
    "q28_bool_agg" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders
        .groupBy(col("o_orderpriority"))
        .agg(
          bool_and(col("o_totalprice") > 2000.0).as("all_above_2k"),
          bool_or(col("o_totalprice") > 400000.0).as("any_above_400k"),
          bool_and(col("o_orderstatus") === "F").as("every_final"))
        .orderBy(col("o_orderpriority"))
    },

    // Ordered STRING_AGG: nation names per region.
    "q29_string_agg" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.nation.join(t.region, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(concat_ws(",", array_sort(collect_list(col("n_name"))))
          .as("nations"))
        .orderBy(col("r_name"))
    },

    // Window functions: ranking, navigation, frames.
    "q30_window_funcs" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.orders.select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"),
        ntile(4).over(w).as("quartile"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        nth_value(col("o_totalprice"), 2).over(wRows).as("second_price"),
        first(col("o_totalprice")).over(wRows).as("first_price"),
        sum(dec(col("o_totalprice"))).over(wRows).cast("double").as("running_total"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cdist"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // MOVAVG — reference modules/core .../aggregate/SeqAggregate.scala
    // (moving-window mean over an ordered stream) as a frame window.
    "q31_movavg" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-3, 0)
      t.events.select(
        col("event_id"), col("user_id"),
        round(avg(col("value")).over(w), 6).as("movavg4"))
        .orderBy(col("event_id"))
    },

    // EXPMOVAVG — recursive EWMA (alpha=0.3) computed as an ordered fold
    // over each user's event values; both engines reduce sequentially in
    // identical order, so the doubles match exactly.
    "q32_expmovavg" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.events
        .groupBy(col("user_id"))
        .agg(array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("value")))).as("seq"))
        .select(
          col("user_id"),
          aggregate(
            col("seq"),
            lit(null).cast("double"),
            (acc, s) => when(acc.isNull, s.getField("value"))
              .otherwise(lit(0.3) * s.getField("value") + lit(0.7) * acc))
            .as("ewma"))
        .orderBy(col("user_id"))
    },

    // Column-level encryption (reference: util/encrypt/Encryptor.scala
    // — AES string encrypt/decrypt guarding stored credentials),
    // re-expressed on Spark's NATIVE aes_encrypt/aes_decrypt
    // expressions in deterministic ECB mode. DuckDB has no AES, so
    // the oracle checks the crypto path through its deterministic
    // observables: the decrypt(encrypt(x)) round trip must restore x
    // (hash-checked as the roundtrip column against the plaintext
    // itself), and the ECB+PKCS5 ciphertext length is a closed form
    // of the plaintext length (((n div 16) + 1) * 16 bytes, base64
    // 4*ceil(bytes/3)) — a broken cipher, mode, or padding flips
    // either column and fails the hash. Keys in real use come from a
    // secret store, never a literal.
    "q307_column_crypto" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val key = "0123456789abcdef" // 128-bit demo key (test fixture)
      t.customer.select(col("c_custkey"), col("c_name"))
        .withColumn("ct",
          expr(s"base64(aes_encrypt(c_name, '$key', 'ECB'))"))
        .withColumn("rt",
          expr(s"CAST(aes_decrypt(unbase64(ct), '$key', 'ECB') AS STRING)"))
        .select(col("c_custkey"), col("rt").as("roundtrip"),
          length(col("ct")).cast("int").as("ct_len"))
        .orderBy(col("c_custkey"))
    }
  )

  def oracle: Map[String, String] = Map(
    "q19_math_funcs" ->
      """SELECT p_partkey,
        |  ABS(p_retailprice * -1.0) AS f_abs,
        |  CAST(FLOOR(p_retailprice) AS BIGINT) AS f_floor,
        |  CAST(CEIL(p_retailprice) AS BIGINT) AS f_ceil,
        |  CAST(CASE WHEN p_retailprice / 1000.0 >= 0
        |    THEN FLOOR(p_retailprice / 1000.0)
        |    ELSE CEIL(p_retailprice / 1000.0) END AS BIGINT) AS f_trunc,
        |  CASE WHEN p_retailprice - 1000.0 > 0 THEN 1.0
        |    WHEN p_retailprice - 1000.0 < 0 THEN -1.0 ELSE 0.0 END AS f_sign,
        |  SQRT(p_retailprice) AS f_sqrt,
        |  ROUND(POW(p_retailprice / 1000.0, 1.5), 6) AS f_pow,
        |  ROUND(EXP(p_retailprice / 1000.0 * -1.0), 6) AS f_exp,
        |  ROUND(LN(p_retailprice), 6) AS f_ln,
        |  ROUND(LOG10(p_retailprice), 6) AS f_log10,
        |  ROUND(SIN(p_retailprice / 1000.0), 6) AS f_sin,
        |  ROUND(COS(p_retailprice / 1000.0), 6) AS f_cos,
        |  ROUND(ATAN(p_retailprice / 1000.0), 6) AS f_atan,
        |  p_partkey % 13 AS f_mod,
        |  p_partkey // 7 AS f_intdiv,
        |  PI() AS f_pi
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q20_string_funcs" ->
      """SELECT c_custkey,
        |  c_name || '_' || c_mktsegment AS f_concat,
        |  CAST(LENGTH(c_name) AS INT) AS f_len,
        |  LOWER(c_name) AS f_lower,
        |  UPPER(c_mktsegment) AS f_upper,
        |  TRIM('  ' || c_name || '  ') AS f_trim,
        |  SUBSTRING(c_name, 1, 8) AS f_substr,
        |  CAST(STRPOS(c_name, '0') AS INT) AS f_strpos,
        |  REGEXP_REPLACE(c_name, 'Customer', 'Cust') AS f_replace,
        |  LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS f_lpad,
        |  REVERSE(c_mktsegment) AS f_reverse,
        |  REPEAT(SUBSTRING(c_mktsegment, 1, 2), 2) AS f_repeat,
        |  SPLIT_PART(c_name, '#', 2) AS f_split_part
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q21_null_funcs" ->
      """SELECT c_custkey,
        |  COALESCE(CASE WHEN c_acctbal < 0.0 THEN NULL ELSE c_acctbal END,
        |    0.0) AS f_coalesce,
        |  NULLIF(c_mktsegment, 'BUILDING') AS f_nullif,
        |  GREATEST(c_acctbal, 5000.0) AS f_greatest,
        |  LEAST(c_acctbal, 5000.0) AS f_least,
        |  (CASE WHEN c_acctbal < 0.0 THEN NULL ELSE c_acctbal END) IS NULL
        |    AS f_isnull
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q22_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(YEAR(o_orderdate) AS INT) AS f_year,
        |  CAST(MONTH(o_orderdate) AS INT) AS f_month,
        |  CAST(DAY(o_orderdate) AS INT) AS f_day,
        |  CAST(DAYOFYEAR(o_orderdate) AS INT) AS f_doy,
        |  CAST(DAYOFWEEK(o_orderdate) AS INT) AS f_dow,
        |  CAST(QUARTER(o_orderdate) AS INT) AS f_quarter,
        |  DATE_TRUNC('month', o_orderdate) AS f_trunc_month,
        |  o_orderdate + INTERVAL 3 DAY AS f_plus_3d,
        |  o_orderdate - INTERVAL 2 HOUR AS f_minus_2h,
        |  DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
        |    AS f_days_to,
        |  CAST(EPOCH(o_orderdate) AS BIGINT) AS f_epoch,
        |  LAST_DAY(CAST(o_orderdate AS DATE)) AS f_last_day,
        |  CAST(o_orderdate AS DATE) AS f_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q23_predicates" ->
      """SELECT p_partkey,
        |  p_name LIKE '%part_1%' AS f_like,
        |  p_name ILIKE '%PART%' AS f_ilike,
        |  REGEXP_MATCHES(p_name, 'part_[0-9]+$') AS f_regex,
        |  p_size BETWEEN 10 AND 20 AS f_between,
        |  p_brand IS DISTINCT FROM p_type AS f_distinct_from,
        |  p_type IN ('PROMO', 'ECONOMY') AS f_in
        |FROM part ORDER BY p_partkey""".stripMargin,

    // DuckDB's parser accepts BETWEEN SYMMETRIC but its executor
    // doesn't implement it ("Not implemented: T_List") — the oracle
    // spells out the same least/greatest rewrite graft applies.
    "q194_between_symmetric" ->
      """SELECT p_partkey, p_size,
        |  p_size BETWEEN least(p_partkey % 30, 20)
        |    AND greatest(p_partkey % 30, 20) AS f_symmetric,
        |  p_size BETWEEN p_partkey % 30 AND 20 AS f_asymmetric
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q24_count_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(*) AS n_rows,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp,
        |  CAST(SUM(DISTINCT CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sum_dist_line,
        |  MIN(l_quantity) AS min_qty,
        |  MAX(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q25_stats_agg" ->
      """SELECT l_returnflag,
        |  ROUND(STDDEV_POP(l_quantity), 6) + 0.0 AS sd_pop_qty,
        |  ROUND(STDDEV_SAMP(l_quantity), 6) + 0.0 AS sd_samp_qty,
        |  ROUND(VAR_POP(l_quantity), 6) + 0.0 AS var_pop_qty,
        |  ROUND(VAR_SAMP(l_quantity), 6) + 0.0 AS var_samp_qty,
        |  ROUND(CORR(l_quantity, l_discount), 6) + 0.0 AS corr_qd,
        |  ROUND(COVAR_POP(l_discount, l_tax), 6) + 0.0 AS cov_pop_dt,
        |  ROUND(COVAR_SAMP(l_discount, l_tax), 6) + 0.0 AS cov_samp_dt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q26_regr_agg" ->
      """SELECT l_linestatus,
        |  REGR_COUNT(l_quantity, l_discount) AS r_count,
        |  ROUND(REGR_AVGX(l_quantity, l_discount), 6) AS r_avgx,
        |  ROUND(REGR_AVGY(l_quantity, l_discount), 6) AS r_avgy,
        |  ROUND(REGR_SLOPE(l_quantity, l_discount), 4) AS r_slope,
        |  ROUND(REGR_INTERCEPT(l_quantity, l_discount), 4) AS r_intercept,
        |  ROUND(REGR_R2(l_quantity, l_discount), 6) AS r_r2,
        |  ROUND(REGR_SXX(l_quantity, l_discount), 4) AS r_sxx,
        |  ROUND(REGR_SYY(l_quantity, l_discount), 2) AS r_syy,
        |  ROUND(REGR_SXY(l_quantity, l_discount), 4) AS r_sxy
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q27_skew_kurt" ->
      """WITH m AS (SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    AVG(l_quantity) AS m1,
        |    AVG(l_quantity * l_quantity) AS m2r,
        |    AVG(l_quantity * l_quantity * l_quantity) AS m3r,
        |    AVG(l_quantity * l_quantity * l_quantity * l_quantity) AS m4r
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  ROUND((m3r - 3.0 * m1 * m2r + 2.0 * m1 * m1 * m1)
        |    / POW(m2r - m1 * m1, 1.5), 6) AS skew_pop,
        |  ROUND((m4r - 4.0 * m1 * m3r + 6.0 * m1 * m1 * m2r
        |    - 3.0 * m1 * m1 * m1 * m1)
        |    / POW(m2r - m1 * m1, 2.0) - 3.0, 6) AS kurt_pop,
        |  ROUND(SQRT(n * (n - 1.0)) / (n - 2.0)
        |    * (m3r - 3.0 * m1 * m2r + 2.0 * m1 * m1 * m1)
        |    / POW(m2r - m1 * m1, 1.5), 6) AS skew_samp
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "q28_bool_agg" ->
      """SELECT o_orderpriority,
        |  BOOL_AND(o_totalprice > 2000.0) AS all_above_2k,
        |  BOOL_OR(o_totalprice > 400000.0) AS any_above_400k,
        |  BOOL_AND(o_orderstatus = 'F') AS every_final
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q29_string_agg" ->
      """SELECT r_name,
        |  STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q30_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ROW_NUMBER() OVER w AS INT) AS rn,
        |  CAST(RANK() OVER w AS INT) AS rk,
        |  CAST(DENSE_RANK() OVER w AS INT) AS drk,
        |  CAST(NTILE(4) OVER w AS INT) AS quartile,
        |  LAG(o_totalprice, 1) OVER w AS prev_price,
        |  LEAD(o_totalprice, 1) OVER w AS next_price,
        |  NTH_VALUE(o_totalprice, 2) OVER wr AS second_price,
        |  FIRST_VALUE(o_totalprice) OVER wr AS first_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER wr AS DOUBLE) AS running_total,
        |  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
        |  ROUND(CUME_DIST() OVER w, 6) AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey),
        |  wr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q31_movavg" ->
      """SELECT event_id, user_id,
        |  ROUND(AVG(value) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS movavg4
        |FROM events ORDER BY event_id""".stripMargin,

    "q32_expmovavg" ->
      """SELECT user_id,
        |  LIST_REDUCE(LIST(value ORDER BY ts, event_id),
        |    (acc, v) -> 0.3 * v + 0.7 * acc) AS ewma
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // deterministic observables of the AES path: the round trip must
    // restore the plaintext, and ECB+PKCS5 ciphertext length is a
    // closed form of the (ASCII) plaintext length
    "q307_column_crypto" ->
      """SELECT c_custkey, c_name AS roundtrip,
        |  CAST(4 * CEIL(((LENGTH(c_name) // 16 + 1) * 16) / 3.0)
        |    AS INT) AS ct_len
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
