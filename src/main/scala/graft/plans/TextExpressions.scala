package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.SparkSession

/** Native Catalyst expressions for the text hot paths. Same results as
  * the composed-builtin versions (and the DuckDB oracle), minus the
  * per-element interpreted-lambda overhead.
  */

/** Polynomial rolling hash over the first `maxChars` code points:
  * h = (h * 31 + codePoint) mod 10^15 — identical to
  * TextFunctions.fingerprint (split + ascii + fold). */
case class FingerprintHash(child: Expression, maxChars: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    var taken = 0
    while (i < s.length && taken < maxChars) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 1000000000000000L
      i += Character.charCount(cp)
      taken += 1
    }
    h
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.FingerprintHash.hash($c.toString(), $maxChars)")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object FingerprintHash {
  /** Called from generated code. */
  def hash(s: String, maxChars: Int): Long = {
    var h = 0L
    var i = 0
    var taken = 0
    while (i < s.length && taken < maxChars) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 1000000000000000L
      i += Character.charCount(cp)
      taken += 1
    }
    h
  }
}

/** Count of common elements of two SORTED arrays (merge walk — no
  * per-row hash set). Inputs must be array_sort'ed and element types
  * must match (string or long); equal to size(array_intersect(a, b))
  * on distinct sorted inputs. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"

  private lazy val isLongElems: Boolean = left.dataType match {
    case org.apache.spark.sql.types.ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val c =
        if (isLongElems) java.lang.Long.compare(a.getLong(i), b.getLong(j))
        else a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val cmp =
        if (isLongElems)
          s"Long.compare($l.getLong(i), $r.getLong(j))"
        else
          s"$l.getUTF8String(i).compareTo($r.getUTF8String(j))"
      s"""
         |int i = 0, j = 0, n = 0;
         |int na = $l.numElements(), nb = $r.numElements();
         |while (i < na && j < nb) {
         |  int c = $cmp;
         |  if (c == 0) { n++; i++; j++; }
         |  else if (c < 0) i++;
         |  else j++;
         |}
         |${ev.value} = n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Full k-hash MinHash signature over an array of token hashes in ONE
  * native loop: out[i] = min over h of
  * (1000003 + i*7919) * h + (12345 + i*271) mod 2147483647 —
  * arithmetic identical to the composed transform/array_min version
  * (and the SQL oracle), but k*|tokens| multiply-mods run in a tight
  * JVM loop instead of nested interpreted lambdas (the dominant cost
  * of the LSH pipeline at corpus scale). */
case class MinhashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    MinhashSignature.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.MinhashSignature.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object MinhashSignature {
  /** Called from generated code. Token hashes must already be reduced
    * below 2^31 (pmod 2147483647) so a*h never overflows a long. */
  def compute(th: ArrayData, k: Int): ArrayData = {
    val n = th.numElements()
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      val a = 1000003L + i * 7919L
      val b = 12345L + i * 271L
      if (n == 0) out(i) = null // mirror array_min(empty) = null
      else {
        var best = Long.MaxValue
        var j = 0
        while (j < n) {
          val v = (a * th.getLong(j) + b) % 2147483647L
          if (v < best) best = v
          j += 1
        }
        out(i) = best
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

object TextExpressions {
  /** Register the text expressions for use via expr()/spark.sql.
    * Idempotent; call once per session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fingerprint",
      exprs => FingerprintHash(exprs.head, 256), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash",
      exprs => MinhashSignature(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
  }
}
