package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ExternalFunctions

/** ServiceLoader provider SPI (spi/GraftProviders.scala; reference
  * external/service/ExternalFunctionService.scala +
  * ExternalSourceService.scala — sclera's runtime-discovered
  * source/function providers). The test provider
  * (graft.TestSpiProviders) is registered ONLY through
  * META-INF/services on the test classpath, so these tests fail if
  * discovery itself breaks. */
class ProviderSpiSpec extends AnyFunSuite {
  import TestSession._

  test("built-in providers arrive through the ServiceLoader channel") {
    val ps = ExternalFunctions.providers
    for (n <- Seq("tiered_discount", "geo_bucket", "risk_score"))
      assert(ps.contains(n), s"builtin provider $n not discovered")
    assert(graft.spi.ProviderRegistry.sourceKinds.keySet
      .intersect(Set("CSV", "JSON", "PARQUET", "TEXT")).size == 4)
  }

  test("a classpath provider jar's FUNCTION surfaces and evaluates") {
    assert(ExternalFunctions.providers.contains("spi_clamp"),
      "test SPI function provider not discovered")
    spark.sql("GRAFT ADD FUNCTION clamp3 FROM spi_clamp")
    try {
      val out = spark.sql(
        "SELECT clamp3(v, 2, 5) AS c FROM VALUES (1), (4), (9) AS t(v)")
        .collect().map(_.getInt(0)).toSeq
      assert(out == Seq(2, 4, 5))
    } finally spark.sql("GRAFT REMOVE FUNCTION clamp3")
  }

  test("a classpath provider jar's SOURCE KIND works in ADD LOCATION") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_spi_tsv").toString + "/t"
    val df = Tables(spark, sfDir).region
      .select(col("r_regionkey"), col("r_name"))
    graft.TsvLocation(dir, None).write(df)
    spark.sql(s"GRAFT ADD LOCATION spitsv TSV '$dir'")
    try {
      val back = spark.sql(
        "SELECT COUNT(*) AS n FROM EXTERNAL(spitsv)").collect().head
      assert(back.getLong(0) == 5L)
    } finally spark.sql("GRAFT REMOVE LOCATION spitsv")
  }

  test("a classpath provider jar's NLP TASK runs end to end") {
    // discovery: built-ins and the test tagger share one channel
    val tasks = graft.spi.ProviderRegistry.nlpTasks
    for (n <- Seq("SENTENCES", "TOKENS", "SHOUTINESS"))
      assert(tasks.contains(n), s"nlp task $n not discovered")
    // the statement resolves the third-party task by name
    Tables(spark, sfDir).registerAll()
    val out = spark.sql(
      "GRAFT TEXT TASK SHOUTINESS IN text FROM documents")
    assert(out.columns.contains("shoutiness"))
    val vals = out.select(col("shoutiness")).collect()
      .map(_.getDouble(0))
    assert(vals.nonEmpty && vals.forall(v => v >= 0.0 && v <= 1.0))
    // LIST TASKS surfaces every discovered task with its description
    val listed = spark.sql("GRAFT LIST TASKS").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(listed.contains("shoutiness")
      && listed("shoutiness").contains("test SPI tagger"))
    assert(listed.contains("sentences") && listed.contains("tokens"))
    // unknown task names the available ones
    val e = intercept[IllegalArgumentException] {
      spark.sql("GRAFT TEXT TASK NOPE IN text FROM documents")
    }
    assert(e.getMessage.contains("SHOUTINESS")
      && e.getMessage.contains("SENTENCES"))
  }

  test("an unknown kind names the discovered kinds in its error") {
    val e = intercept[IllegalArgumentException] {
      spark.sql("GRAFT ADD LOCATION nope AVRO '/tmp/x'")
    }
    assert(e.getMessage.contains("TSV") && e.getMessage.contains("CSV"))
  }

  test("function bindings are session state, not library state") {
    val other = spark.newSession()
    ExternalFunctions.add(other, "spi_only", "spi_clamp")
    try {
      assert(ExternalFunctions.list(other).exists(_._1 == "spi_only"))
      assert(!ExternalFunctions.list(spark).exists(_._1 == "spi_only"))
      // and the binding is recorded in the session's own conf — the
      // session carries its state; no graft-side map keyed on session
      assert(other.conf.get("graft.external.function.spi_only")
        == "spi_clamp")
      assert(spark.conf
        .getOption("graft.external.function.spi_only").isEmpty)
    } finally ExternalFunctions.clear(other)
  }
}
