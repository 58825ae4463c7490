package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL-dialect extension (reference: sql/parser/SqlQueryParser.scala —
  * sclera's parser owns custom productions like MATCH and DISTINCT ON;
  * Spark's is extended, not replaced, via injectParser).
  *
  * Two graft productions are recognized at statement level, everything
  * else delegates to Spark's parser:
  *
  *   GRAFT MATCH '<pattern>' ON <table>
  *     KEY <col> ORDER <col> LABEL <col> [VALUE <col>]
  *
  *   GRAFT DISTINCT ON (<col>[, ...]) FROM <table>
  *     ORDER BY <col> [ASC|DESC] [, ...]
  *
  *   GRAFT ASOF <probe_table> REF <ref_table>
  *     KEY <col>[, ...] ORDER <col>
  *
  *   GRAFT RANGE <points_table> POINT <col> IN <intervals_table>
  *     LO <col> HI <col> WIDTH <number>
  *
  *   GRAFT BAND <points_table> POINT <col> IN <intervals_table>
  *     LO <col> HI <col> KEY <col>[, ...]
  *
  *   GRAFT IMPUTE <table> VALUE <col> KEY <col>[, ...]
  *
  *   GRAFT CLUSTER <table> K <n> ITERS <m>
  *
  *   GRAFT TYPEINFER <table>
  *
  * MATCH compiles to the SeqMatchOp mapPartitions plan; DISTINCT ON
  * builds the custom DistinctOnPlan logical node, which the injected
  * RewriteDistinctOn rule lowers; ASOF builds the AsOfJoinPlan logical
  * node, which the injected AsOfJoinStrategy plans as the sorted-merge
  * AsOfJoinExec — the same front-door/back-door split as the reference
  * (parser produces algebra nodes, the planner lowers them).
  */
class GraftSqlParser(spark: () => SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private val MatchRe =
    ("""(?is)\s*GRAFT\s+MATCH\s+'([^']+)'\s+ON\s+(\w+)\s+KEY\s+(\w+)""" +
      """\s+ORDER\s+(\w+)\s+LABEL\s+(\w+)(?:\s+VALUE\s+(\w+))?\s*""").r

  private val DistinctOnRe =
    ("""(?is)\s*GRAFT\s+DISTINCT\s+ON\s*\(([^)]+)\)\s+FROM\s+(\w+)""" +
      """\s+ORDER\s+BY\s+(.+?)\s*""").r

  private val RangeRe =
    ("""(?is)\s*GRAFT\s+RANGE\s+(\w+)\s+POINT\s+(\w+)\s+IN\s+(\w+)""" +
      """\s+LO\s+(\w+)\s+HI\s+(\w+)\s+WIDTH\s+([0-9.]+)\s*""").r

  private val BandRe =
    ("""(?is)\s*GRAFT\s+BAND\s+(\w+)\s+POINT\s+(\w+)\s+IN\s+(\w+)""" +
      """\s+LO\s+(\w+)\s+HI\s+(\w+)\s+KEY\s+([\w,\s]+?)\s*""").r

  private val AsOfRe =
    ("""(?is)\s*GRAFT\s+ASOF\s+(\w+)\s+REF\s+(\w+)""" +
      """\s+KEY\s+([\w,\s]+?)\s+ORDER\s+(\w+)\s*""").r

  private val ImputeRe =
    ("""(?is)\s*GRAFT\s+IMPUTE\s+(\w+)\s+VALUE\s+(\w+)""" +
      """\s+KEY\s+([\w,\s]+?)\s*""").r

  private val ClusterRe =
    """(?is)\s*GRAFT\s+CLUSTER\s+(\w+)\s+K\s+(\d+)\s+ITERS\s+(\d+)\s*""".r

  private val TypeInferRe =
    """(?is)\s*GRAFT\s+TYPEINFER\s+(\w+)\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case MatchRe(pattern, table, key, ord, label, value) =>
      val df = spark().table(table)
      graft.operators.SeqMatchOp
        .matchPattern(df, key, ord, label, pattern, Option(value))
        .queryExecution.logical
    case DistinctOnRe(keys, table, orderBy) =>
      val df = spark().table(table)
      val order = orderBy.split(",").map(_.trim).filter(_.nonEmpty)
        .map { spec =>
          val parts = spec.split("\\s+")
          val asc = parts.length < 2 || !parts(1).equalsIgnoreCase("DESC")
          (parts(0), asc)
        }.toSeq
      DistinctOnPlan.resolved(
        df.queryExecution.analyzed,
        keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
        order)
    case RangeRe(points, pcol, intervals, lo, hi, width) =>
      graft.operators.ExtendedOps.rangeJoin(
        spark().table(points), spark().table(intervals),
        pcol, lo, hi, width.toDouble)
        .queryExecution.logical
    case BandRe(points, pcol, intervals, lo, hi, keys) =>
      graft.operators.ExtendedOps.bandJoin(
        spark().table(points), spark().table(intervals),
        keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
        pcol, lo, hi)
        .queryExecution.logical
    case AsOfRe(probe, ref, keys, ord) =>
      graft.operators.ExtendedOps.asofJoinExec(
        spark().table(probe), spark().table(ref),
        keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq, ord)
        .queryExecution.logical
    case ImputeRe(table, value, keys) =>
      graft.operators.MLOps.imputeMean(
        spark().table(table), value,
        keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .queryExecution.logical
    case ClusterRe(table, k, iters) =>
      graft.operators.MLOps.kmeans(
        spark().table(table), k.toInt, iters.toInt)
        .queryExecution.logical
    case TypeInferRe(table) =>
      graft.operators.MLOps.inferTypes(spark().table(table))
        .queryExecution.logical
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
}
