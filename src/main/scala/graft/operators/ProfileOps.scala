package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Single-pass column profiler (the data-exploration DESCRIBE the
  * reference's TYPEINFER sits next to): null counts, exact distinct
  * cardinalities, and numeric min/max for EVERY column of any table in
  * ONE scan. The multi-distinct aggregate plans as a single Expand —
  * never one scan per column (the q41 inferTypes discipline) — and the
  * wide 1-row result unstacks to a column-per-row report.
  */
object ProfileOps {

  /** Data-quality rule checker (expectation suite): each rule is a
    * boolean expression over the table's columns; the report is one
    * row per rule with violation counts and rates — ONE scan computes
    * every rule side by side as conditional aggregates (never a scan
    * per rule), so a 100-TB expectation suite costs one pass. NULL
    * rule results count as violations (an expectation that cannot be
    * evaluated is not satisfied). */
  def checkRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "GRAFT CHECK needs at least one rule")
    val aggs = Seq(count(lit(1)).as("__n")) ++ rules.zipWithIndex.map {
      case ((_, pred), i) =>
        // coalesce: sum over ZERO rows is NULL — an empty table has 0
        // violations and every rule passes, not a null report row
        coalesce(
          sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)), lit(0L))
          .as(s"__v$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col("__n").as("n_rows"),
        col(s"__v$i").as("n_violations"),
        when(col("__n") > 0L,
          round(col(s"__v$i").cast("double") / col("__n").cast("double"), 6))
          .as("violation_rate"),
        (col(s"__v$i") === 0L).as("passed"))
    }
    wide.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** Join-key skew diagnosis: per-key frequency profile collapsed to
    * one summary row (key count, min/max/mean occupancy, skew factor =
    * max/mean). The planning read that decides between a plain shuffle
    * join, AQE skew splitting, and a salted join. Two hash aggregates —
    * nothing is key-ordered, nothing leaves the executors but one row. */
  def keySkew(df: DataFrame, keyCol: String): DataFrame = {
    val cnts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    cnts.agg(
      count(lit(1)).as("n_keys"),
      min(col("cnt")).as("min_cnt"),
      max(col("cnt")).as("max_cnt"),
      (sum(col("cnt").cast("decimal(38,6)")).cast("double") /
        count(lit(1)).cast("double")).as("mean_raw"))
      .select(col("n_keys"), col("min_cnt"), col("max_cnt"),
        round(col("mean_raw"), 6).as("mean_cnt"),
        round(col("max_cnt").cast("double") / col("mean_raw"), 6)
          .as("skew_factor"))
  }

  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    val aggs: Seq[Column] = fields.toIndexedSeq.zipWithIndex.flatMap {
      case (f, i) =>
        val base = Seq(
          sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"nn$i"),
          countDistinct(col(f.name)).as(s"nd$i"))
        f.dataType match {
          case _: NumericType => base ++ Seq(
            min(col(f.name)).cast("double").as(s"mn$i"),
            max(col(f.name)).cast("double").as(s"mx$i"))
          case _ => base
        }
    }
    val stackArgs = fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
      val mm = f.dataType match {
        case _: NumericType => s"mn$i, mx$i"
        case _ => "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)"
      }
      s"'${f.name}', nn$i, nd$i, $mm"
    }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${fields.length}, $stackArgs) " +
        "AS (col_name, n_nulls, n_distinct, min_num, max_num)")
      .orderBy(col("col_name"))
  }

  /** Functional-dependency discovery over candidate column pairs
    * (Huhtala et al. 1999, TANE's violation counting — the schema-
    * profiling read that finds denormalization keys and dirty
    * dimensions): for each (lhs -> rhs) candidate, an FD holds iff
    * every lhs value maps to ONE rhs value. Reports, per candidate:
    * the number of lhs groups, the number of VIOLATING groups (>1
    * distinct rhs), the violating ROW count (rows outside each
    * group's majority rhs — the minimum repair size), and the
    * holds/confidence verdict.
    *
    * Scale shape: per candidate ONE hash aggregate on (lhs, rhs) —
    * map-side combined, fact touched once per candidate — then
    * group-level algebra on the distinct-pair frame; the per-pair
    * results union into one bounded report. Never a self-join,
    * nothing quadratic in the fact.
    */
  def fdViolations(df: DataFrame, candidates: Seq[(String, String)])
      : DataFrame = {
    require(candidates.nonEmpty, "fdViolations: no candidate pairs")
    val reports = candidates.map { case (lhs, rhs) =>
      val pairs = df.groupBy(col(lhs).as("l"), col(rhs).as("r"))
        .agg(count(lit(1)).as("n"))
      val groups = pairs.groupBy(col("l"))
        .agg(count(lit(1)).as("n_rhs"),
          sum(col("n")).as("n_rows"),
          max(col("n")).as("n_majority"))
      groups.agg(
          count(lit(1)).as("n_groups"),
          sum(when(col("n_rhs") > 1, 1L).otherwise(0L))
            .as("n_violating_groups"),
          sum(col("n_rows") - col("n_majority")).as("n_violating_rows"),
          sum(col("n_rows")).as("n_total"))
        .select(lit(lhs).as("lhs"), lit(rhs).as("rhs"),
          col("n_groups"), col("n_violating_groups"),
          col("n_violating_rows"),
          (col("n_violating_groups") === 0L).as("holds"),
          round(lit(1.0) -
            col("n_violating_rows").cast("double") /
              col("n_total").cast("double"), 6).as("confidence"))
    }
    reports.reduce(_.unionAll(_)).orderBy(col("lhs"), col("rhs"))
  }
}
