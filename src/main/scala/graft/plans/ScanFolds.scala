package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native prefix-scan folds over collected time series.
  *
  * Sequential recurrences (EWMA control limits, Kalman passes, Holt
  * levels) are inherently order-dependent: the Spark-idiomatic shape
  * collects the bounded series into ONE row and folds it. SQL
  * `aggregate(...)` expresses that fold, but `ArrayAggregate` is a
  * CodegenFallback higher-order function — every step pays an
  * interpreted lambda plus an `array_append` that re-copies the
  * accumulator array, so an n-step chart costs O(n^2) interpreted
  * work. These expressions run the same recurrence in ONE native O(n)
  * pass with the IDENTICAL IEEE-754 operation sequence (left-assoc
  * multiply/add, same constants), so emitted doubles are bit-identical
  * to the SQL fold they replace and the DuckDB oracle hashes agree.
  *
  * Scale shape: the input array is the calendar-bounded daily series
  * (one row after the pre-aggregate), so eval cost is microseconds;
  * the win is removing the interpreted quadratic fold from the plan.
  */
case class EwmaChartScan(
    xs: Expression, sx: Expression, n: Expression,
    smr: Expression, nmr: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(xs, sx, n, smr, nmr)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ewma_chart"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("d", DateType, nullable = true),
      StructField("x", LongType, nullable = true),
      StructField("z", DoubleType, nullable = false),
      StructField("hw", DoubleType, nullable = true))),
    containsNull = false)

  override def eval(input: InternalRow): Any = {
    val arr = xs.eval(input)
    val sxV = sx.eval(input)
    val nV = n.eval(input)
    val smrV = smr.eval(input)
    val nmrV = nmr.eval(input)
    if (arr == null || sxV == null || nV == null) return null
    val a = arr.asInstanceOf[ArrayData]
    val len = a.numElements()
    val mu = sxV.asInstanceOf[Long].toDouble / nV.asInstanceOf[Long].toDouble
    // A single-day series has no moving ranges: sum(mr) is SQL NULL
    // and the fold's hw term is NULL — mirror that exactly.
    val sigmaNull = smrV == null
    val sigma =
      if (sigmaNull) 0.0
      else smrV.asInstanceOf[Long].toDouble /
        nmrV.asInstanceOf[Long].toDouble / 1.128
    var z = mu
    var w = 1.0
    val out = new Array[Any](len)
    var i = 0
    while (i < len) {
      val e = a.getStruct(i, 2)
      val d = if (e.isNullAt(0)) null else Int.box(e.getInt(0))
      val x = e.getLong(1)
      // identical op order to the SQL fold:
      //   z' = 0.2*x + 0.8*z;  w' = w*0.64
      //   hw = 3.0 * ((smr/nmr)/1.128) * sqrt((0.2/1.8) * (1 - w'))
      z = 0.2d * x.toDouble + 0.8d * z
      w = w * 0.64d
      val hw: Any =
        if (sigmaNull) null
        else Double.box(
          3.0d * sigma * math.sqrt((0.2d / 1.8d) * (1.0d - w)))
      out(i) = new GenericInternalRow(Array[Any](d, x, z, hw))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): EwmaChartScan =
    EwmaChartScan(c(0), c(1), c(2), c(3), c(4))
}

object ScanFolds {
  /** Register the scan-fold expressions for expr()/spark.sql use.
    * Idempotent; call once per session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ewma_chart",
      exprs => EwmaChartScan(
        exprs(0), exprs(1), exprs(2), exprs(3), exprs(4)),
      "built-in")
  }
}
