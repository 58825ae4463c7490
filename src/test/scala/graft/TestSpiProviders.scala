package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.sources.ExternalLocation
import graft.spi.{FunctionProvider, GraftFunctionProviderService,
  GraftNlpTaskProviderService, GraftSourceProviderService, NlpTask}

/** A provider-defined location kind: tab-separated values. Proves the
  * ExternalLocation surface is SPI-extensible (the trait is open and
  * the parser resolves kinds through the registry). */
final case class TsvLocation(path: String, schema: Option[StructType])
    extends ExternalLocation {
  def read(spark: SparkSession): DataFrame = {
    val r = spark.read.option("header", "true").option("sep", "\t")
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }
  def write(df: DataFrame): Unit =
    df.write.mode("overwrite").option("header", "true")
      .option("sep", "\t").csv(path)
}

/** Third-party-style provider registered ONLY through the standard
  * ServiceLoader channel (src/test/resources/META-INF/services) — if
  * discovery broke, nothing else would surface these. */
final class TestSpiProviders
    extends GraftFunctionProviderService with GraftSourceProviderService
    with GraftNlpTaskProviderService {

  /** A third-party "tagger": shoutiness = uppercase-letter share of
    * all letters — arrives only via ServiceLoader, evaluates as pure
    * Catalyst Columns like any built-in task. */
  override def nlpTasks: Seq[NlpTask] = {
    import org.apache.spark.sql.functions._
    Seq(NlpTask("shoutiness",
      "uppercase share of letters (test SPI tagger)",
      text => {
        val letters = length(regexp_replace(text, "[^A-Za-z]", ""))
        val uppers = length(regexp_replace(text, "[^A-Z]", ""))
        Seq("shoutiness" -> when(letters > 0,
          uppers.cast("double") / letters.cast("double"))
          .otherwise(lit(0.0)))
      }))
  }

  override def functionProviders: Seq[FunctionProvider] = Seq(
    FunctionProvider("spi_clamp", 3,
      "greatest(__arg1, least(__arg2, __arg0))",
      "clamp arg0 into [arg1, arg2] (test SPI provider)"))

  override def sourceKinds
      : Map[String, (String, Option[StructType]) => ExternalLocation] =
    Map("TSV" -> ((path, schema) => TsvLocation(path, schema)))
}
