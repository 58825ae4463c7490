package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction must preserve content exactly, hit the closed-form file
  * count, and keep the round-robin row spread near target — the parts
  * of the OPTIMIZE contract the q299 oracle can't see. */
class CompactionSpec extends AnyFunSuite {
  import TestSession._

  test("compaction preserves content and bounds per-file rows") {
    val t = Tables(spark, sfDir)
    val frag = graft.sources.ExternalStage.materialize(sfDir,
      "frag_documents", t.documents) { (df, path) =>
      df.repartition(64).write.mode("overwrite").parquet(path)
    }
    val target = 100L
    val rep = graft.operators.LayoutOps
      .compact(spark, frag, frag + "_c2", target).collect()(0)
    val nRows = rep.getAs[Long]("n_rows")
    assert(rep.getAs[Long]("n_rows_after") == nRows)
    assert(rep.getAs[Long]("files_before") == 64L)
    assert(rep.getAs[Long]("files_after") ==
      (nRows + target - 1) / target)

    val a = spark.read.parquet(frag)
    val b = spark.read.parquet(frag + "_c2")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)

    val perFile = b.groupBy(input_file_name()).count()
      .collect().map(_.getLong(1))
    assert(perFile.sum == nRows)
    // round-robin keeps every file within 2x of the target
    assert(perFile.max <= 2 * target, s"max=${perFile.max}")
  }

  test("GRAFT COMPACT statement returns the same report") {
    val t = Tables(spark, sfDir)
    val frag = graft.sources.ExternalStage.materialize(sfDir,
      "frag_documents", t.documents) { (df, path) =>
      df.repartition(64).write.mode("overwrite").parquet(path)
    }
    val viaSql = spark.sql(
      s"GRAFT COMPACT '$frag' INTO '${frag}_c3' ROWS 100")
      .collect()(0)
    assert(viaSql.getAs[Long]("files_before") == 64L)
    assert(viaSql.getAs[Long]("files_after") ==
      (viaSql.getAs[Long]("n_rows") + 99) / 100)
  }
}
