package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.Expression

/** External scalar FUNCTION objects (reference:
  * external/objects/ExternalFunction.scala:26,
  * external/expr/ExternalScalarFunction.scala — SQL-callable scalar
  * functions whose implementation lives outside the engine, attached
  * to the catalog by name).
  *
  * Spark-first re-expression: an external provider is a named
  * EXPRESSION TEMPLATE (`__arg0`, `__arg1`, ... placeholders). GRAFT
  * ADD FUNCTION binds a template into the session's function registry;
  * at every call site the template is spliced inline as native
  * Catalyst expressions — so the "external" function participates in
  * whole-stage codegen, constant folding, and filter pushdown exactly
  * like a builtin, instead of the eval-per-row black box a UDF (or a
  * real RPC) would be. The provider catalog below holds deterministic
  * local implementations standing in for the external service (this
  * container has no egress); a deployment would generate the same
  * templates from the service's pushdown contract, or fall back to a
  * typed UDF wrapper for non-expressible calls.
  */
object ExternalFunctions {

  /** A provider = arity + expression template + doc. */
  final case class Provider(name: String, arity: Int, template: String,
      description: String)

  /** Deterministic local stand-ins for external-service functions. */
  val providers: Map[String, Provider] = Seq(
    Provider("tiered_discount", 2,
      "__arg0 * (1.0 - least(__arg1, 10) * 0.01)",
      "price discounted 1% per unit, capped at 10%"),
    Provider("geo_bucket", 2,
      "cast(floor(__arg0 / 10.0) * 100 + floor(__arg1 / 10.0) as bigint)",
      "10-degree lat/lon grid cell id"),
    Provider("risk_score", 2,
      "least(100.0, __arg0 * 2.0 + __arg1 * 0.5)",
      "bounded linear risk blend of two signals")
  ).map(p => p.name -> p).toMap

  /** Per-session name -> provider binding state (admin listing).
    * Keyed WEAKLY by the SparkSession instance so GRAFT LIST FUNCTIONS
    * reports exactly the bindings callable in THAT session — function
    * registrations live in a per-session function registry, and a
    * process-global listing would leak bindings across sessions (and
    * survive a session restart). Weak keys let a closed session's
    * state be collected with it. */
  private val bound = new java.util.WeakHashMap[
    SparkSession, scala.collection.concurrent.TrieMap[String, String]]()

  private def sessionMap(spark: SparkSession)
      : scala.collection.concurrent.TrieMap[String, String] =
    bound.synchronized {
      var m = bound.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, String]
        bound.put(spark, m)
      }
      m
    }

  /** Bind `fnName` to `providerName`'s template in the session
    * function registry. Idempotent; later binds win (reference
    * replace-on-create semantics). */
  def add(spark: SparkSession, fnName: String, providerName: String): Unit = {
    val p = providers.getOrElse(providerName,
      throw new IllegalArgumentException(
        s"unknown external function provider '$providerName' " +
          s"(have: ${providers.keys.toSeq.sorted.mkString(", ")})"))
    val template: Expression =
      spark.sessionState.sqlParser.parseExpression(p.template)
    val builder: Seq[Expression] => Expression = { args =>
      require(args.length == p.arity,
        s"$fnName expects ${p.arity} arguments, got ${args.length}")
      template.transformUp {
        case UnresolvedAttribute(Seq(n)) if n.startsWith("__arg") =>
          args(n.stripPrefix("__arg").toInt)
      }
    }
    // source must be one of Spark's known kinds; "built-in" is what
    // the other graft native functions register as
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(fnName, builder, "built-in")
    sessionMap(spark).put(fnName, providerName)
  }

  def remove(spark: SparkSession, fnName: String): Boolean = {
    spark.sessionState.functionRegistry.dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(fnName))
    sessionMap(spark).remove(fnName).isDefined
  }

  /** (name, provider, arity, description) rows for GRAFT LIST
    * FUNCTIONS in `spark`, name-ordered — only THIS session's
    * bindings. */
  def list(spark: SparkSession): Seq[(String, String, Int, String)] =
    sessionMap(spark).toSeq.sortBy(_._1).map { case (n, pn) =>
      val p = providers(pn)
      (n, pn, p.arity, p.description)
    }

  /** Test/registry hygiene. */
  def clear(spark: SparkSession): Unit =
    list(spark).foreach { case (n, _, _, _) => remove(spark, n) }
}
