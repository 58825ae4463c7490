package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** External data locations (reference: external/objects/
  * ExternalSource.scala and the dbms/ module's location registry):
  * named, typed handles to data living outside the engine, readable
  * as DataFrames so every downstream operator composes unchanged —
  * the Spark-first re-expression of sclera's cross-source federation
  * (Catalyst sees an ordinary relation; pushdown/pruning still apply,
  * and for JDBC Spark pushes filters into the remote query).
  */
trait ExternalLocation {
  def read(spark: SparkSession): DataFrame

  /** Materialize a result INTO the location (reference SqlCudParser
    * createExtTarget — CREATE EXTERNAL <target> AS <query>, the
    * write side of federation). Overwrite semantics. */
  def write(df: DataFrame): Unit
}

final case class ParquetLocation(path: String) extends ExternalLocation {
  def read(spark: SparkSession): DataFrame = spark.read.parquet(path)
  def write(df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(path)
}

final case class CsvLocation(
    path: String, header: Boolean = true,
    schema: Option[StructType] = None) extends ExternalLocation {
  def read(spark: SparkSession): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }
  def write(df: DataFrame): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)
}

final case class JsonLocation(
    path: String, schema: Option[StructType] = None)
    extends ExternalLocation {
  def read(spark: SparkSession): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).json(path)
  }
  def write(df: DataFrame): Unit =
    df.write.mode("overwrite").json(path)
}

final case class TextLocation(path: String) extends ExternalLocation {
  def read(spark: SparkSession): DataFrame = spark.read.text(path)
  def write(df: DataFrame): Unit = {
    require(df.columns.length == 1,
      "TEXT location write needs exactly one string column")
    df.write.mode("overwrite").text(path)
  }
}

/** JDBC location (reference: dbms/rdbms federation, dbms/driver/
  * SqlDriver.scala). Reads through Spark's jdbc source: predicate
  * pushdown into the remote database (the scan's PushedFilters become
  * the remote WHERE clause), optional partitioned parallel reads via
  * `partitionColumn` options. Exercised LIVE against embedded Derby
  * (on the Spark classpath) in JdbcDerbySpec and q231_jdbc_federated:
  * real write/read round-trip plus a pushdown plan assertion. */
final case class JdbcLocation(
    url: String, table: String,
    options: Map[String, String] = Map.empty) extends ExternalLocation {
  def read(spark: SparkSession): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .load()

  /** Write `df` into the location's table through the same JDBC
    * channel (overwrite = drop/recreate, the reference's
    * replace-on-create DML semantics). */
  def write(df: DataFrame): Unit = write(df, "overwrite")

  def write(df: DataFrame, mode: String): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .mode(mode)
      .save()
}

/** Embedded Apache Derby helpers — the live RDBMS the federation path
  * is exercised against (derby*.jar ships on the Spark classpath; the
  * database is a local directory, no network). */
object EmbeddedDerby {
  /** Keep Derby's derby.log out of the working directory. */
  private lazy val home: String = {
    val h = s"${System.getProperty("java.io.tmpdir")}/graft_derby_home"
    new java.io.File(h).mkdirs()
    System.setProperty("derby.system.home", h)
    h
  }

  /** JDBC url for a database directory under the Derby home
    * (`;create=true` boots it on first touch). */
  def url(dbName: String): String = {
    val _ = home
    s"jdbc:derby:$home/$dbName;create=true"
  }

  def location(dbName: String, table: String): JdbcLocation =
    JdbcLocation(url(dbName), table,
      Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
}

/** Process-wide named-location registry (sclera: ADD LOCATION ...). */
object ExternalLocations {
  private val registry = TrieMap.empty[String, ExternalLocation]

  def register(name: String, loc: ExternalLocation): Unit =
    registry.put(name, loc)

  def get(name: String): Option[ExternalLocation] = registry.get(name)

  def remove(name: String): Boolean = registry.remove(name).isDefined

  def names: Seq[String] = registry.keys.toSeq.sorted

  /** Read a registered location as a DataFrame. */
  def table(spark: SparkSession, name: String): DataFrame =
    registry.get(name) match {
      case Some(loc) => loc.read(spark)
      case None => throw new IllegalArgumentException(
        s"unknown external location '$name' " +
          s"(registered: ${registry.keys.toSeq.sorted.mkString(", ")})")
    }
}
