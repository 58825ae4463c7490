package graft.spi

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.StructType

import graft.sources.ExternalLocation

/** Dynamic provider discovery (reference: external/service/
  * ExternalFunctionService.scala + ExternalSourceService.scala and
  * modules/config ScleraConfig — sclera loads source/function
  * providers as runtime-discovered services, so third-party jars can
  * extend the engine's catalog without touching core code).
  *
  * Spark/JVM-idiomatic re-expression: providers implement one of the
  * two service traits below and announce themselves through the
  * standard java.util.ServiceLoader mechanism — a
  * `META-INF/services/graft.spi.GraftFunctionProviderService` (or
  * ...SourceProviderService) file on the classpath naming the
  * implementation class. Graft's own built-ins load through the SAME
  * channel (spi/BuiltinProviders.scala + the resources entries), so
  * the discovery path is exercised by every query, not just by tests.
  */

/** An external scalar-function provider: a named Catalyst expression
  * template over `__arg0`, `__arg1`, ... placeholders, spliced inline
  * at call sites (whole-stage codegen, constant folding, and pushdown
  * all apply — see functions/ExternalFunctions.scala). */
final case class FunctionProvider(
    name: String, arity: Int, template: String, description: String,
    /** Additional arity → template overloads (reference functions are
      * often variadic — DATE_PARTSTR's 2-arg default-SHORT form,
      * RANDOMSTR's 1-arg form); the primary (arity, template) pair
      * stays the documented signature in GRAFT LIST FUNCTIONS. */
    altTemplates: Map[Int, String] = Map.empty)

/** SPI: contribute scalar-function providers. */
trait GraftFunctionProviderService {
  def functionProviders: Seq[FunctionProvider]
}

/** SPI: contribute external-location KINDS usable in
  * `GRAFT ADD LOCATION <name> <KIND> '<path>' [SCHEMA '<ddl>']`.
  * The factory receives the path and the optional parsed schema. */
trait GraftSourceProviderService {
  def sourceKinds: Map[String, (String, Option[StructType]) => ExternalLocation]
}

/** A JDBC engine profile for the generic federation lane (`GRAFT
  * ATTACH JDBC '<url>' AS <catalog>`): how to recognize the vendor's
  * urls, which driver boots it, where unqualified tables live, how
  * the engine folds identifier case, which DSv2 pushdown lanes its
  * SQL dialect genuinely renders (enabling a lane the dialect cannot
  * spell silently drops clauses — observed with Derby TopN), and an
  * optional Spark JdbcDialect to register for the url space.
  *
  * Reference analogue: sclera abstracts attached RDBMS vendors behind
  * an rdbms driver/location SPI (modules/core/src/main/scala/dbms/
  * rdbms/location/RdbmsLocation.scala; H2.scala is core's built-in,
  * plugins add Oracle/MySQL/...); profiles are the Spark-idiomatic
  * equivalent, discovered through the same ServiceLoader channel as
  * function and source providers. */
final case class JdbcEngineProfile(
    name: String,
    urlPrefix: String,
    driverClass: Option[String],
    defaultSchema: String,
    upperCaseIdentifiers: Boolean,
    pushdownConfs: Seq[String],
    dialect: Option[() => org.apache.spark.sql.jdbc.JdbcDialect]) {
  /** Fold an unquoted table name the way the engine's catalog stores
    * it (Derby/H2 upper-case, DuckDB keeps case). */
  def tableIdent(name: String): String =
    if (upperCaseIdentifiers) name.toUpperCase else name
}

/** SPI: contribute JDBC engine profiles for `GRAFT ATTACH JDBC`. */
trait GraftJdbcDialectProviderService {
  def jdbcEngines: Seq[JdbcEngineProfile]
}

/** An NLP task (reference: analytics/nlp/service/NlpService.scala +
  * analytics/nlp/objects/ParseTask.scala — sclera's NLP tasks are
  * runtime-discovered services the TEXT statement invokes by name):
  * a named transform from the text column to derived output columns,
  * expressed as Catalyst Columns so whole-stage codegen, pruning, and
  * pushdown apply to third-party taggers exactly as to built-ins. */
final case class NlpTask(
    name: String, description: String,
    outputs: org.apache.spark.sql.Column =>
      Seq[(String, org.apache.spark.sql.Column)])

/** SPI: contribute NLP tasks for `GRAFT TEXT TASK <name> IN <col>
  * FROM <table>`. */
trait GraftNlpTaskProviderService {
  def nlpTasks: Seq[NlpTask]
}

/** ServiceLoader-backed registry. Scanned once per process (provider
  * sets are classpath-static); both graft built-ins and third-party
  * jars surface here indistinguishably. */
object ProviderRegistry {

  private def loader: ClassLoader = {
    val ctx = Thread.currentThread.getContextClassLoader
    if (ctx != null) ctx else getClass.getClassLoader
  }

  /** All discovered function providers by name; later services must
    * not clash with earlier ones (duplicate names are a deployment
    * error worth failing loudly on). */
  lazy val functionProviders: Map[String, FunctionProvider] = {
    val all = ServiceLoader
      .load(classOf[GraftFunctionProviderService])
      .flatMap(_.functionProviders)
    val dup = all.groupBy(_.name).collect { case (n, ps) if ps.size > 1 => n }
    require(dup.isEmpty,
      s"duplicate external function providers: ${dup.mkString(", ")}")
    all.map(p => p.name -> p).toMap
  }

  /** All discovered JDBC engine profiles by name. */
  lazy val jdbcEngines: Map[String, JdbcEngineProfile] = {
    val all = ServiceLoader.load(classOf[GraftJdbcDialectProviderService])
      .flatMap(_.jdbcEngines)
    val dup = all.groupBy(_.name).collect { case (n, ps) if ps.size > 1 => n }
    require(dup.isEmpty,
      s"duplicate jdbc engine profiles: ${dup.mkString(", ")}")
    all.map(p => p.name -> p).toMap
  }

  /** Resolve the engine profile for a JDBC url (longest matching
    * prefix wins, so a plugin may specialize a vendor's sub-scheme). */
  def jdbcEngineForUrl(url: String): Option[JdbcEngineProfile] = {
    val lower = url.toLowerCase
    jdbcEngines.values.toSeq
      .filter(p => lower.startsWith(p.urlPrefix.toLowerCase))
      .sortBy(-_.urlPrefix.length)
      .headOption
  }

  /** All discovered NLP tasks by upper-cased name. */
  lazy val nlpTasks: Map[String, NlpTask] = {
    val all = ServiceLoader.load(classOf[GraftNlpTaskProviderService])
      .flatMap(_.nlpTasks)
    val dup = all.groupBy(_.name.toUpperCase)
      .collect { case (n, ps) if ps.size > 1 => n }
    require(dup.isEmpty,
      s"duplicate nlp task providers: ${dup.mkString(", ")}")
    all.map(t => t.name.toUpperCase -> t).toMap
  }

  /** All discovered source kinds (upper-cased). */
  lazy val sourceKinds
      : Map[String, (String, Option[StructType]) => ExternalLocation] = {
    val all = ServiceLoader.load(classOf[GraftSourceProviderService])
      .flatMap(_.sourceKinds.map { case (k, f) => k.toUpperCase -> f })
    val dup = all.groupBy(_._1).collect { case (n, ps) if ps.size > 1 => n }
    require(dup.isEmpty,
      s"duplicate external source kinds: ${dup.mkString(", ")}")
    all.toMap
  }

  private object ServiceLoader {
    def load[T](cls: Class[T]): Seq[T] =
      java.util.ServiceLoader.load(cls, loader).iterator().asScala.toSeq
  }
}
