package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** Native combination generators for basket mining (BasketOps).
  *
  * The composed-builtin form — nested `transform` lambdas + `flatten`
  * — produces identical rows but runs as interpreted higher-order
  * functions: per basket it allocates one closure frame and one
  * intermediate array PER ELEMENT per nesting level. These
  * expressions emit the same a<b (a<b<c) struct stream in one tight
  * loop per row; measured 2-4x on the q205/q218/q300 pair/triple
  * stages. Evaluation is CodegenFallback (same as the higher-order
  * lambdas they replace), but the inner loop is compiled Scala rather
  * than a per-element expression-tree walk.
  */

/** All (a, b) element pairs with a before b in array order — array
  * must be sorted ascending for the a < b contract callers rely on.
  * Output: array<struct<a, b>> with the input's element type. */
case class ArrayPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", elemType), StructField("b", elemType))),
    containsNull = false)
  override def prettyName: String = "graft_pairs"
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData].toObjectArray(elemType)
    val n = arr.length
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](arr(i), arr(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** All (a, b, c) element triples in array order (a<b<c for sorted
  * input) — the FP-growth level above [[ArrayPairs]]. */
case class ArrayTriples(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", elemType), StructField("b", elemType),
    StructField("c", elemType))), containsNull = false)
  override def prettyName: String = "graft_triples"
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData].toObjectArray(elemType)
    val n = arr.length
    val m = if (n < 3) 0 else n * (n - 1) * (n - 2) / 6
    val out = new Array[Any](m)
    var k = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        var l = j + 1
        while (l < n) {
          out(k) =
            new GenericInternalRow(Array[Any](arr(i), arr(j), arr(l)))
          k += 1
          l += 1
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object ArrayCombos {
  /** Register graft_pairs / graft_triples. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pairs", exprs => ArrayPairs(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_triples", exprs => ArrayTriples(exprs.head), "built-in")
  }
}
