package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.ExtendedOps

/** Extended operators: ALIGN (as-of), DisjointInterval, row-sequence
  * MATCH, PIVOT/UNPIVOT, TYPEINFER, IMPUTED, sessionization, streaming
  * windows (batch-equivalent plans of the Structured Streaming
  * pipelines), and external CSV/JSON sources.
  */
object Extended {

  private def dec(c: Column): Column = c.cast(DecimalType(38, 6))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ALIGN / as-of join: each purchase event gets the latest prior click
    // of the same user (reference RelOp.scala:700 Align).
    "q33_align_asof" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val ev = t.events
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"),
          col("event_id").as("click_event_id"),
          col("ts"), col("value").as("click_value"))
      ExtendedOps.asofAlign(
        purchases, clicks,
        keyCols = Seq("user_id"), ordCols = Seq("ts"),
        payload = Map(
          "click_event_id" -> "last_click_id",
          "click_value" -> "last_click_value"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // The same ALIGN through the custom physical operator
    // (AsOfJoinPlan -> AsOfJoinStrategy -> AsOfJoinExec sorted merge):
    // a second, independent implementation of q33's semantics — the
    // oracle is identical, so the custom exec must agree with DuckDB's
    // ASOF JOIN row-for-row.
    "q100_asof_exec" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val ev = t.events
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("last_click_id"),
          col("value").as("last_click_value"))
      ExtendedOps.asofJoinExec(
        purchases, clicks, keyCols = Seq("user_id"), ordCol = "ts")
        .orderBy(col("user_id"), col("event_id"))
    },

    // ALIGN ON <dist> MARGIN <n> — the reference's OTHER align mode
    // (AlignTableResult.scala): banded dynamic-time-warping alignment
    // of two ordered streams minimizing cumulative |value| distance,
    // emitting the row pairs along the optimal warping path. Per-user
    // click stream aligned to purchase stream. Hash-checked: the
    // oracle re-expresses the banded DP as a DuckDB recursive CTE over
    // anti-diagonals (per-key sequences are small at gate scale);
    // DtwAlignSpec additionally proves the DP against an independent
    // brute-force implementation.
    "q228_dtw_align" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val ev = t.events
      val clicks = ev.filter(col("event_type") === "click")
      val purchases = ev.filter(col("event_type") === "purchase")
      graft.operators.DtwAlign.align(
          clicks, purchases, "user_id", "ts", "value", Some(3))
        .select(col("key").as("user_id"), col("step"),
          col("a_ord"), col("b_ord"), round(col("d"), 6).as("d"))
        .orderBy(col("user_id"), col("step"))
    },

    // DisjointInterval: 30-minute activity intervals per user split into
    // elementary disjoint segments (reference RelOp.scala:723).
    "q34_disjoint_interval" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val iv = t.events.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"),
          col("ts").as("lo"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("hi"))
      ExtendedOps.disjointIntervals(iv, "user_id", "lo", "hi")
        .select(col("user_id"), col("event_id"), col("out_lo"), col("out_hi"))
        .orderBy(col("user_id"), col("event_id"), col("out_lo"))
    },

    // Interval-overlap join: per user, 10-minute view windows that
    // overlap 10-minute purchase windows — interval x interval (vs
    // q108's point-in-interval), grid-binned with reference-cell
    // dedup so no theta join and no distinct() shuffle.
    "q201_interval_join" -> { (spark, dir) =>
      val e = Tables(spark, dir).events
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).cast("double").as("pe"))
      val v = e.where(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("v_id"),
          col("pe").as("v_lo"), (col("pe") + 600d).as("v_hi"))
      val p = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          col("pe").as("p_lo"), (col("pe") + 600d).as("p_hi"))
      ExtendedOps
        .intervalOverlapJoin(v, p, Seq("user_id"),
          "v_lo", "v_hi", "p_lo", "p_hi", 600.0)
        .select(col("user_id"), col("v_id"), col("p_id"),
          (least(col("v_hi"), col("p_hi")) -
            greatest(col("v_lo"), col("p_lo"))).as("overlap_s"))
        .orderBy(col("user_id"), col("v_id"), col("p_id"))
    },

    // Row-sequence MATCH (pattern `click purchase`, adjacent rows) per
    // user stream — the relational compilation of the reference's
    // label-regex matcher (analytics/sequence/matcher).
    "q35_seq_match" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t.events
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .filter(col("event_type") === "purchase" &&
          col("prev_type") === "click")
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_matches"),
          min(col("ts")).as("first_match_ts"),
          sum(dec(col("value"))).cast("double").as("purchase_total"),
          sum(dec(col("prev_value"))).cast("double").as("click_total"))
        .orderBy(col("user_id"))
    },

    // PIVOT order counts by status (reference: analytics/transform).
    "q36_pivot" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy(col("o_orderpriority"))
    },

    // UNPIVOT part metrics to (metric, val) rows (RelOp.scala:766).
    "q37_unpivot" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.part
        .select(col("p_partkey"),
          col("p_retailprice").as("retailprice"),
          col("p_size").cast("double").as("size"))
        .unpivot(Array(col("p_partkey")), "metric", "val")
        .orderBy(col("p_partkey"), col("metric"))
    },

    // IMPUTED — fill synthesized nulls with the per-user mean
    // (reference: analytics/ml/imputer).
    "q38_impute" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val withNulls = t.events.withColumn("v",
        when(col("event_type") === "error", lit(null)).otherwise(col("value")))
      val w = Window.partitionBy(col("user_id"))
      withNulls.select(
        col("event_id"), col("user_id"),
        col("v").isNull.as("was_missing"),
        round(coalesce(col("v"), avg(col("v")).over(w)), 6).as("v_imputed"))
        .orderBy(col("event_id"))
    },

    // TYPEINFER — infer column types from string samples by try-cast
    // vote (reference: analytics/inferTypes).
    "q41_typeinfer" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val src = t.events.select(
        get_json_object(col("props"), "$.k").as("s_int"),
        concat(get_json_object(col("props"), "$.k"), lit(".5"))
          .as("s_double"),
        date_format(col("ts"), "yyyy-MM-dd").as("s_date"),
        col("event_type").as("s_str"))
      // int-ness via regex: DuckDB's TRY_CAST(varchar AS INT) rounds
      // '87.5' to 88 where Spark's returns null, so try_cast can't be
      // the shared oracle semantics for integers. MLOps.inferTypes
      // computes every column's counters in ONE scan.
      graft.operators.MLOps.inferTypes(src).orderBy(col("col_name"))
    },

    // TYPEINFER in the reference's ACTUAL semantics — the table comes
    // back with columns CAST to the inferred types (sclera
    // analytics/inferTypes/InferTypesTableResult.scala: infer over
    // the lookahead, cast every row, custom NULLS markers first),
    // not a report. Every lane exercised: an all-integer column with
    // 'NA' markers -> BIGINT with NULLs, a decimal column -> DOUBLE,
    // an ISO date column -> DATE, and a mixed column stays string.
    // Driver check is value AND schema: the oracle recomputes with
    // explicit CASTs + NULLIF, so a wrong inferred type fails the
    // schema gate, not just the hash.
    "q375_typeinfer_apply" -> { (spark, dir) =>
      Tables(spark, dir).registerAll()
      spark.sql(
        """SELECT o_orderkey,
          |  CASE WHEN o_orderkey % 7 = 0 THEN 'NA'
          |    ELSE CAST(o_custkey AS STRING) END AS cust_s,
          |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS STRING)
          |    AS price_s,
          |  CAST(CAST(o_orderdate AS DATE) AS STRING) AS date_s,
          |  o_orderpriority AS mixed_s
          |FROM orders""".stripMargin)
        .createOrReplaceTempView("typed_src")
      spark.sql("GRAFT TYPEINFER typed_src NULLS ('NA') APPLY")
        .orderBy(col("o_orderkey"))
    },

    // External CSV source: round-trip nation through CSV and query it
    // (reference: external/objects/ExternalSource.scala).
    "q42_csv_source" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val tmp = graft.sources.ExternalStage.materialize(dir, "csv_nation",
        t.nation) { (df, path) =>
        df.coalesce(1).write.mode("overwrite")
          .option("header", "true").csv(path)
      }
      val back = spark.read.option("header", "true")
        .schema(t.nation.schema).csv(tmp)
      back.join(t.region, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_nations"),
          min(col("n_name")).as("first_nation"))
        .orderBy(col("r_name"))
    },

    // External JSON(L) source round-trip.
    "q43_json_source" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val subset = t.orders
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
      val tmp = graft.sources.ExternalStage.materialize(dir, "json_orders",
        subset) { (df, path) =>
        df.coalesce(1).write.mode("overwrite").json(path)
      }
      val back = spark.read.schema(subset.schema).json(tmp)
      back.groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    },

    // LIVE JDBC federation (reference: dbms/rdbms/, dbms/driver/
    // SqlDriver.scala — sclera's data-virtualization core pushes
    // subplans into attached RDBMSs): the nation dimension lives in an
    // embedded Derby DATABASE (real JDBC round-trip, not a stub), the
    // customer fact stays parquet; Spark pushes the n_regionkey filter
    // into Derby as the remote WHERE (PushedFilters — asserted in
    // JdbcDerbySpec) and broadcast-joins the 15-row dim to the fact.
    // The 100-TB shape: dimension pulled filtered from the RDBMS,
    // never the fact; the fact-side scan is the only big read.
    "q231_jdbc_federated" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val loc = graft.sources.EmbeddedDerby.location(
        "fed_" + graft.operators.TextSearchOps.corpusFingerprint(
          s"$dir/nation.parquet"), "nation")
      // seed the 25-row dim (overwrite-on-call: staleness-proof, and
      // the content-fingerprinted db name isolates corpora)
      loc.write(t.nation)
      loc.read(spark)
        .where(col("n_regionkey") < 3)
        .select(col("n_nationkey"), col("n_name").as("n_name"))
        .join(t.customer, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c_acctbal").cast("decimal(38,6)")).cast("double")
            .as("total_bal"))
        .orderBy(col("n_name"))
    },

    // WHOLE-SUBPLAN pushdown into the attached RDBMS (reference:
    // sql/mapper/SqlMapper.scala:23, sql/mapper/TargetSqlQuery.scala
    // — sclera translates pushable subtrees into target-dialect SQL
    // run inside the attached DB). Spark-first: the Derby db is a
    // DSv2 JDBCTableCatalog with pushdown enabled, and Catalyst's
    // V2ScanRelationPushDown does the translation. Here the GROUP BY
    // + COUNT/SUM execute INSIDE Derby (the scan shows
    // PushedAggregates/PushedGroupByExpressions — plan-guarded in
    // FederatedPushdownSpec); Spark receives 25 aggregated rows,
    // never the raw remote table.
    "q357_fed_agg_pushdown" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val fp = graft.operators.TextSearchOps.corpusFingerprint(
        s"$dir/supplier.parquet")
      val db = s"fedpd_$fp"
      graft.sources.FederatedPushdown.seedOnce(spark, db, "SUPP_FED",
        t.supplier.withColumn("s_acctbal",
          col("s_acctbal").cast("decimal(12,2)")))
      val cat = graft.sources.FederatedPushdown
        .attach(spark, s"fed_$fp", db)
      graft.sources.FederatedPushdown.table(spark, cat, "SUPP_FED")
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_supp"),
          sum(col("s_acctbal")).cast("double").as("total_bal"))
        .orderBy(col("s_nationkey"))
    },

    // Same-source JOIN pushdown: supplier and nation both live in the
    // attached Derby db, and the join COLLAPSES INTO ONE REMOTE QUERY
    // (SupportsPushDownJoin; the single scan shows PushedJoins —
    // plan-guarded). Spark-side work is only the aggregation of the
    // joined rows Derby returns.
    "q358_fed_join_pushdown" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val fp = graft.operators.TextSearchOps.corpusFingerprint(
        s"$dir/supplier.parquet")
      val db = s"fedpd_$fp"
      graft.sources.FederatedPushdown.seedOnce(spark, db, "SUPP_FED",
        t.supplier.withColumn("s_acctbal",
          col("s_acctbal").cast("decimal(12,2)")))
      graft.sources.FederatedPushdown.seedOnce(spark, db, "NAT_FED",
        t.nation)
      val cat = graft.sources.FederatedPushdown
        .attach(spark, s"fed_$fp", db)
      graft.sources.FederatedPushdown.table(spark, cat, "SUPP_FED")
        .join(
          graft.sources.FederatedPushdown.table(spark, cat, "NAT_FED"),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_supp"),
          min(col("s_acctbal")).cast("double").as("min_bal"),
          max(col("s_acctbal")).cast("double").as("max_bal"))
        .orderBy(col("n_name"))
    },

    // ORDER BY + LIMIT pushdown: the top-k runs INSIDE Derby
    // (PushedTopN in the scan — plan-guarded); k rows cross the wire.
    // VARCHAR seeding matters here: Derby cannot ORDER BY a CLOB, and
    // Spark's default JDBC string mapping is CLOB.
    "q359_fed_topn_pushdown" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val fp = graft.operators.TextSearchOps.corpusFingerprint(
        s"$dir/supplier.parquet")
      val db = s"fedpd_$fp"
      graft.sources.FederatedPushdown.seedOnce(spark, db, "SUPP_FED",
        t.supplier.withColumn("s_acctbal",
          col("s_acctbal").cast("decimal(12,2)")))
      val cat = graft.sources.FederatedPushdown
        .attach(spark, s"fed_$fp", db)
      graft.sources.FederatedPushdown.table(spark, cat, "SUPP_FED")
        .orderBy(col("s_acctbal").desc, col("s_suppkey"))
        .limit(5)
        .select(col("s_suppkey"), col("s_name"),
          col("s_acctbal").cast("double").as("acctbal"))
    },

    // Remote DML WRITE-BACK into the attached RDBMS (reference:
    // sclera executes CREATE TABLE AS / INSERT against the attached
    // data store through dbms/driver/StatementDriver.scala — updates
    // flow INTO the store, not just out of it). Spark-first: the
    // attached Derby db is a DSv2 TableCatalog, so catalog DDL/DML is
    // the native surface — DROP TABLE IF EXISTS + DataFrame CTAS
    // (writeTo(...).create()) + SQL INSERT INTO all execute against
    // Derby (GraftDerbyJoinDialect maps strings to VARCHAR so the
    // written table stays pushdown-queryable). The read-back goes
    // through the same pushdown catalog. 100-TB shape: what lands in
    // the RDBMS is the aggregated, model-sized summary — the parquet
    // fact never leaves Spark.
    "q369_fed_writeback" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val fp = graft.operators.TextSearchOps.corpusFingerprint(
        s"$dir/supplier.parquet")
      val db = s"fedpd_$fp"
      graft.sources.FederatedPushdown.seedOnce(spark, db, "SUPP_FED",
        t.supplier.withColumn("s_acctbal",
          col("s_acctbal").cast("decimal(12,2)")))
      val cat = graft.sources.FederatedPushdown
        .attach(spark, s"fed_$fp", db)
      spark.sql(s"DROP TABLE IF EXISTS $cat.APP.NATION_BAL_WB")
      t.supplier
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_supp"),
          sum(col("s_acctbal").cast("decimal(12,2)")).cast("double")
            .as("total_bal"))
        .writeTo(s"$cat.APP.NATION_BAL_WB").create()
      spark.sql(
        s"INSERT INTO $cat.APP.NATION_BAL_WB VALUES (999, 0L, 0.0D)")
      spark.table(s"$cat.APP.NATION_BAL_WB")
        .orderBy(col("s_nationkey"))
    },

    // The GENERIC federation front door: GRAFT ATTACH JDBC '<url>'
    // resolves the vendor through the engine-profile SPI (built-ins:
    // derby/duckdb/h2 — reference: sclera's rdbms-location SPI,
    // dbms/rdbms/location/RdbmsLocation.scala) instead of the
    // DERBY-keyword sugar; the aggregate still executes INSIDE the
    // attached engine (PushedAggregates — plan-guarded in
    // GenericAttachSpec, which also proves this exact lane against
    // DuckDB as a second live vendor).
    "q383_attach_jdbc_sql" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val fp = graft.operators.TextSearchOps.corpusFingerprint(
        s"$dir/supplier.parquet")
      val db = s"fedpd_$fp"
      graft.sources.FederatedPushdown.seedOnce(spark, db, "SUPP_FED",
        t.supplier.withColumn("s_acctbal",
          col("s_acctbal").cast("decimal(12,2)")))
      val url = graft.sources.EmbeddedDerby.url(db)
      spark.sql(s"GRAFT ATTACH JDBC '$url' AS genfed_$fp").collect()
      spark.sql(
        s"""SELECT s_nationkey, COUNT(*) AS n_supp,
           |  CAST(MAX(s_acctbal) AS DOUBLE) AS max_bal
           |FROM genfed_$fp.APP.SUPP_FED
           |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
    },

    // JSON column extraction from events.props.
    "q44_json_extract" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.events
        .withColumn("k", expr(
          "try_cast(get_json_object(props, '$.k') AS INT)"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n"),
          sum(col("k").cast("long")).as("sum_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    },

    // Spark 4 VARIANT semi-structured path (the modern engine's typed
    // JSON lane): parse_json -> open VARIANT column -> variant_get
    // typed extraction, the shredding-friendly shape for ingesting
    // heterogeneous metadata at corpus scale without a fixed schema.
    // All extraction is codegen'd; the oracle runs DuckDB's
    // independent JSON machinery over the same synthesized payloads.
    "q286_variant" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.documents
        .select(col("doc_id"),
          concat(lit("{\"id\":"), col("doc_id"),
            lit(",\"meta\":{\"lang\":\""), col("lang"),
            lit("\",\"n\":"), col("n_chars"), lit("}}")).as("raw"))
        .select(col("doc_id"), expr("parse_json(raw)").as("v"))
        .select(
          expr("variant_get(v, '$.meta.lang', 'string')").as("lang"),
          expr("variant_get(v, '$.meta.n', 'bigint')").as("n"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("sum_chars"),
          max(col("n")).as("max_chars"))
        .orderBy(col("lang"))
    },

    // Tumbling-window aggregation — batch-equivalent of the Structured
    // Streaming pipeline in graft.streaming (same window() operator).
    "q45_stream_window" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.events
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("total"))
        .select(col("w.start").as("w_start"), col("event_type"),
          col("n"), col("total"))
        .orderBy(col("w_start"), col("event_type"))
    },

    // Sliding-window aggregation (2h window, 1h slide).
    "q46_sliding_window" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.events
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("total"))
        .select(col("w.start").as("w_start"), col("n"), col("total"))
        .orderBy(col("w_start"))
    },

    // Gap-based sessionization (30-minute inactivity gap) — batch
    // analogue of session_window / flatMapGroupsWithState.
    "q47_sessionize" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      ExtendedOps.sessionize(t.events, "user_id", "ts", "event_id", 1800L)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
        .orderBy(col("user_id"), col("session_id"))
    },

    // PATH-style sequence aggregate: ordered event-type path per user
    // (reference: analytics/sequence/matcher/aggregate).
    "q56_seq_path" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.events
        .groupBy(col("user_id"))
        .agg(array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("event_type")))).as("seq"))
        .select(col("user_id"),
          array_join(transform(col("seq"), s => s.getField("event_type")),
            "->").as("path"),
          size(col("seq")).as("path_len"))
        .orderBy(col("user_id"))
    }
  )

  def oracle: Map[String, String] = Map(
    // The banded-DTW DP re-expressed in SQL: the `cells` recursive CTE
    // sweeps the cost matrix by ANTI-DIAGONALS, carrying two diagonals
    // per iteration (cur=1 the newest, cur=0 the one before) so every
    // cell's three predecessors — diag from cur=0, up/left from cur=1
    // — are visible in the working table. min over the (cost, pref)
    // struct reproduces the engine's deterministic tie preference
    // diag(0) > up(1) > left(2); the `path` CTE then backtracks from
    // (n-1, m-1) along the stored pointers. Independent of the Scala
    // DP in every respect except the algorithm's definition.
    "q228_dtw_align" ->
      """WITH RECURSIVE
        |a AS (
        |  SELECT user_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ord,
        |    CAST(value AS DOUBLE) AS val,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY date_trunc('second', ts)) - 1 AS INT) AS i
        |  FROM events WHERE event_type = 'click'),
        |b AS (
        |  SELECT user_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ord,
        |    CAST(value AS DOUBLE) AS val,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY date_trunc('second', ts)) - 1 AS INT) AS j
        |  FROM events WHERE event_type = 'purchase'),
        |dims AS (
        |  SELECT ka.user_id, ka.n, kb.m,
        |    GREATEST(3, abs(ka.n - kb.m)) AS band
        |  FROM (SELECT user_id, CAST(count(*) AS INT) n FROM a GROUP BY 1) ka
        |  JOIN (SELECT user_id, CAST(count(*) AS INT) m FROM b GROUP BY 1) kb
        |    USING (user_id)),
        |dist AS (
        |  SELECT a.user_id, a.i, b.j, abs(a.val - b.val) AS dd
        |  FROM a JOIN b USING (user_id) JOIN dims USING (user_id)
        |  WHERE b.j BETWEEN a.i - dims.band AND a.i + dims.band),
        |cells AS (
        |  SELECT d.user_id, 0 AS i, 0 AS j, d.dd AS cost, -1 AS frm, 1 AS cur
        |  FROM dist d WHERE d.i = 0 AND d.j = 0
        |  UNION ALL
        |  SELECT user_id, i, j, cost, frm, cur FROM (
        |    SELECT c.user_id, c.i, c.j, c.cost, c.frm, 0 AS cur
        |    FROM cells c WHERE c.cur = 1
        |    UNION ALL
        |    SELECT nd.user_id, nd.i, nd.j,
        |      nd.best['c'] + nd.dd AS cost, nd.best['p'] AS frm, 1 AS cur
        |    FROM (
        |      SELECT d.user_id, d.i, d.j, any_value(d.dd) AS dd,
        |        min({'c': c.cost, 'p': CASE
        |            WHEN c.cur = 0 THEN 0
        |            WHEN c.i = d.i - 1 THEN 1 ELSE 2 END}) AS best
        |      FROM cells c
        |      JOIN dist d ON d.user_id = c.user_id
        |        AND ((c.cur = 0 AND d.i = c.i + 1 AND d.j = c.j + 1)
        |          OR (c.cur = 1 AND d.i = c.i + 1 AND d.j = c.j)
        |          OR (c.cur = 1 AND d.i = c.i AND d.j = c.j + 1))
        |      GROUP BY d.user_id, d.i, d.j) nd
        |  )),
        |cf AS (
        |  SELECT DISTINCT user_id, i, j, cost, frm FROM cells),
        |path AS (
        |  SELECT c.user_id, c.i, c.j, c.frm
        |  FROM cf c JOIN dims dm ON c.user_id = dm.user_id
        |    AND c.i = dm.n - 1 AND c.j = dm.m - 1
        |  UNION ALL
        |  SELECT c.user_id, c.i, c.j, c.frm
        |  FROM path p JOIN cf c ON c.user_id = p.user_id
        |    AND ((p.frm = 0 AND c.i = p.i - 1 AND c.j = p.j - 1)
        |      OR (p.frm = 1 AND c.i = p.i - 1 AND c.j = p.j)
        |      OR (p.frm = 2 AND c.i = p.i AND c.j = p.j - 1)))
        |SELECT p.user_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY p.user_id
        |    ORDER BY p.i + p.j, p.i) AS INT) AS step,
        |  a.ord AS a_ord, b.ord AS b_ord,
        |  ROUND(abs(a.val - b.val), 6) AS d
        |FROM path p
        |JOIN a ON a.user_id = p.user_id AND a.i = p.i
        |JOIN b ON b.user_id = p.user_id AND b.j = p.j
        |ORDER BY p.user_id, step""".stripMargin,

    "q33_align_asof" ->
      """SELECT p.user_id, p.event_id, p.ts,
        |  c.event_id AS last_click_id, c.value AS last_click_value
        |FROM (SELECT user_id, event_id, ts FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, event_id, ts, value FROM events
        |      WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin,

    "q100_asof_exec" ->
      """SELECT p.user_id, p.event_id, p.ts,
        |  c.event_id AS last_click_id, c.value AS last_click_value
        |FROM (SELECT user_id, event_id, ts FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, event_id, ts, value FROM events
        |      WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin,

    "q201_interval_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch(CAST(date_trunc('second', ts) AS TIMESTAMP)) AS pe
        |  FROM events),
        |v AS (SELECT user_id, event_id AS v_id, pe AS v_lo,
        |    pe + 600 AS v_hi FROM e WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS p_id, pe AS p_lo,
        |    pe + 600 AS p_hi FROM e WHERE event_type = 'purchase')
        |SELECT v.user_id AS user_id, v_id, p_id,
        |  LEAST(v_hi, p_hi) - GREATEST(v_lo, p_lo) AS overlap_s
        |FROM v JOIN p ON v.user_id = p.user_id
        |  AND v_lo < p_hi AND p_lo < v_hi
        |ORDER BY v.user_id, v_id, p_id""".stripMargin,

    "q34_disjoint_interval" ->
      """WITH iv AS (SELECT user_id, event_id, ts AS lo,
        |    ts + INTERVAL 30 MINUTE AS hi
        |  FROM events WHERE event_type = 'click'),
        |pts AS (SELECT DISTINCT user_id, p FROM
        |  (SELECT user_id, lo AS p FROM iv
        |   UNION SELECT user_id, hi AS p FROM iv)),
        |seg AS (SELECT user_id, p AS s_lo,
        |    LEAD(p) OVER (PARTITION BY user_id ORDER BY p) AS s_hi
        |  FROM pts)
        |SELECT iv.user_id, iv.event_id,
        |  seg.s_lo AS out_lo, seg.s_hi AS out_hi
        |FROM iv JOIN seg ON iv.user_id = seg.user_id
        |  AND seg.s_lo >= iv.lo AND seg.s_hi <= iv.hi
        |WHERE seg.s_hi IS NOT NULL
        |ORDER BY iv.user_id, iv.event_id, out_lo""".stripMargin,

    "q35_seq_match" ->
      """WITH lagged AS (SELECT user_id, ts, event_type, value,
        |    LAG(event_type, 1) OVER w AS prev_type,
        |    LAG(value, 1) OVER w AS prev_value
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, COUNT(*) AS n_matches,
        |  MIN(ts) AS first_match_ts,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS purchase_total,
        |  CAST(SUM(CAST(prev_value AS DECIMAL(38,6))) AS DOUBLE) AS click_total
        |FROM lagged
        |WHERE event_type = 'purchase' AND prev_type = 'click'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q36_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q37_unpivot" ->
      """SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS val
        |  FROM part
        |UNION ALL
        |SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val
        |  FROM part
        |ORDER BY p_partkey, metric""".stripMargin,

    "q38_impute" ->
      """SELECT event_id, user_id,
        |  (CASE WHEN event_type = 'error' THEN NULL ELSE value END)
        |    IS NULL AS was_missing,
        |  ROUND(COALESCE(
        |    CASE WHEN event_type = 'error' THEN NULL ELSE value END,
        |    AVG(CASE WHEN event_type = 'error' THEN NULL ELSE value END)
        |      OVER (PARTITION BY user_id)), 6) AS v_imputed
        |FROM events ORDER BY event_id""".stripMargin,

    "q375_typeinfer_apply" ->
      """SELECT o_orderkey,
        |  CAST(NULLIF(CASE WHEN o_orderkey % 7 = 0 THEN 'NA'
        |    ELSE CAST(o_custkey AS VARCHAR) END, 'NA') AS BIGINT)
        |    AS cust_s,
        |  CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR)
        |    AS DOUBLE) AS price_s,
        |  CAST(CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS DATE)
        |    AS date_s,
        |  o_orderpriority AS mixed_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q41_typeinfer" ->
      """WITH src AS (SELECT
        |    json_extract_string(props, '$.k') AS s_int,
        |    json_extract_string(props, '$.k') || '.5' AS s_double,
        |    strftime(ts, '%Y-%m-%d') AS s_date,
        |    event_type AS s_str
        |  FROM events),
        |stats AS (
        |  SELECT 's_int' AS col_name, COUNT(s_int) AS n_nonnull,
        |    COUNT(CASE WHEN regexp_matches(s_int, '^-?[0-9]+$')
        |      THEN 1 END) AS n_int,
        |    COUNT(TRY_CAST(s_int AS DOUBLE)) AS n_double,
        |    COUNT(TRY_CAST(s_int AS DATE)) AS n_date FROM src
        |  UNION ALL
        |  SELECT 's_double', COUNT(s_double),
        |    COUNT(CASE WHEN regexp_matches(s_double, '^-?[0-9]+$')
        |      THEN 1 END),
        |    COUNT(TRY_CAST(s_double AS DOUBLE)),
        |    COUNT(TRY_CAST(s_double AS DATE)) FROM src
        |  UNION ALL
        |  SELECT 's_date', COUNT(s_date),
        |    COUNT(CASE WHEN regexp_matches(s_date, '^-?[0-9]+$')
        |      THEN 1 END),
        |    COUNT(TRY_CAST(s_date AS DOUBLE)),
        |    COUNT(TRY_CAST(s_date AS DATE)) FROM src
        |  UNION ALL
        |  SELECT 's_str', COUNT(s_str),
        |    COUNT(CASE WHEN regexp_matches(s_str, '^-?[0-9]+$')
        |      THEN 1 END),
        |    COUNT(TRY_CAST(s_str AS DOUBLE)),
        |    COUNT(TRY_CAST(s_str AS DATE)) FROM src)
        |SELECT col_name, n_nonnull, n_int, n_double, n_date,
        |  CASE WHEN n_int = n_nonnull THEN 'int'
        |    WHEN n_double = n_nonnull THEN 'double'
        |    WHEN n_date = n_nonnull THEN 'date'
        |    ELSE 'string' END AS inferred
        |FROM stats ORDER BY col_name""".stripMargin,

    "q42_csv_source" ->
      """SELECT r_name, COUNT(*) AS n_nations, MIN(n_name) AS first_nation
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q43_json_source" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  MAX(o_orderkey) AS max_key
        |FROM orders GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "q231_jdbc_federated" ->
      """SELECT n_name, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
        |    AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_regionkey < 3
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q357_fed_agg_pushdown" ->
      """SELECT s_nationkey, COUNT(*) AS n_supp,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE)
        |    AS total_bal
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"""
        .stripMargin,

    "q358_fed_join_pushdown" ->
      """SELECT n_name, COUNT(*) AS n_supp,
        |  CAST(MIN(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE)
        |    AS min_bal,
        |  CAST(MAX(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE)
        |    AS max_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q359_fed_topn_pushdown" ->
      """SELECT s_suppkey, s_name,
        |  CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
        |FROM supplier
        |ORDER BY CAST(s_acctbal AS DECIMAL(12,2)) DESC, s_suppkey
        |LIMIT 5""".stripMargin,

    "q383_attach_jdbc_sql" ->
      """SELECT s_nationkey, COUNT(*) AS n_supp,
        |  CAST(MAX(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE)
        |    AS max_bal
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"""
        .stripMargin,

    "q369_fed_writeback" ->
      """SELECT s_nationkey, COUNT(*) AS n_supp,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE)
        |    AS total_bal
        |FROM supplier GROUP BY s_nationkey
        |UNION ALL
        |SELECT CAST(999 AS INTEGER), CAST(0 AS BIGINT),
        |  CAST(0.0 AS DOUBLE)
        |ORDER BY s_nationkey""".stripMargin,

    // same synthesized payloads through DuckDB's independent JSON
    // machinery (json_extract vs Spark's VARIANT lane)
    "q286_variant" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    '{"id":' || doc_id || ',"meta":{"lang":"' || lang ||
        |      '","n":' || n_chars || '}}' AS raw
        |  FROM documents),
        |ext AS (
        |  SELECT json_extract_string(raw, '$.meta.lang') AS lang,
        |    CAST(json_extract(raw, '$.meta.n') AS BIGINT) AS n
        |  FROM raw)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n) AS BIGINT) AS sum_chars,
        |  CAST(MAX(n) AS BIGINT) AS max_chars
        |FROM ext GROUP BY lang ORDER BY lang""".stripMargin,

    "q44_json_extract" ->
      """SELECT event_type,
        |  COUNT(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS n,
        |  CAST(SUM(CAST(TRY_CAST(json_extract_string(props, '$.k') AS INT)
        |    AS BIGINT)) AS BIGINT) AS sum_k,
        |  MAX(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q45_stream_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start, event_type,
        |  COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    "q46_sliding_window" ->
      """WITH slid AS (SELECT
        |    time_bucket(INTERVAL '1 hour', ts)
        |      - k.k * INTERVAL '1 hour' AS w_start,
        |    value
        |  FROM events CROSS JOIN (VALUES (0), (1)) AS k(k))
        |SELECT w_start, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
        |FROM slid GROUP BY w_start ORDER BY w_start""".stripMargin,

    "q47_sessionize" ->
      """WITH gapped AS (SELECT user_id, ts, event_id,
        |    CASE WHEN LAG(ts) OVER w IS NULL THEN 1
        |      WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
        |        > 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (SELECT user_id, ts,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS session_id
        |  FROM gapped)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q56_seq_path" ->
      """SELECT user_id,
        |  STRING_AGG(event_type, '->' ORDER BY ts, event_id) AS path,
        |  CAST(COUNT(*) AS INT) AS path_len
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
