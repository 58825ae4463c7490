package graft

import java.io.{BufferedReader, PrintWriter, StringReader, StringWriter}

import org.scalatest.funsuite.AnyFunSuite

/** The interactive shell's loop, driven without a TTY: SQL + GRAFT
  * statements, multi-line input, meta commands, error recovery. */
class ShellSpec extends AnyFunSuite {
  import TestSession._

  private def drive(script: String): (Int, String) = {
    Tables(spark, sfDir).registerAll()
    val out = new StringWriter
    val n = graft.tools.Shell.run(spark,
      new BufferedReader(new StringReader(script)),
      new PrintWriter(out))
    (n, out.toString)
  }

  test("executes SQL and GRAFT statements, renders aligned tables") {
    val (n, out) = drive(
      """SELECT r_name FROM region ORDER BY r_name;
        |GRAFT SKEW lineitem KEY l_orderkey;
        |\q
        |""".stripMargin)
    assert(n == 2)
    assert(out.contains("AFRICA") && out.contains("EUROPE"))
    assert(out.contains("skew_factor"))
    assert(out.contains("(5 rows)"))
  }

  test("multi-line statements buffer until the semicolon") {
    val (n, out) = drive(
      """SELECT count(*) AS n
        |FROM nation
        |WHERE n_regionkey < 2;
        |""".stripMargin)
    assert(n == 1)
    assert(out.contains("10"))
  }

  test("meta commands: tables, timer, csv format, explain") {
    val (_, out) = drive(
      """\tables
        |\timer on
        |\format csv
        |SELECT n_name FROM nation WHERE n_nationkey = 0;
        |\explain SELECT * FROM region
        |\q
        |""".stripMargin)
    assert(out.contains("nation") && out.contains("region"))
    assert(out.contains("time: "))
    assert(out.contains("n_name\nNATION_0"))
    assert(out.contains("Physical Plan"))
  }

  test("EXPLAIN SCRIPT ON echoes plans per statement until OFF") {
    val (n, out) = drive(
      """EXPLAIN SCRIPT ON;
        |SELECT COUNT(*) AS n FROM region;
        |EXPLAIN SCRIPT OFF;
        |SELECT COUNT(*) AS n2 FROM nation;
        |\q
        |""".stripMargin)
    assert(n == 4)
    assert(out.contains("explain script on") &&
      out.contains("explain script off"))
    // the plan echo appears exactly once (only while ON)
    assert("== Physical Plan ==".r.findAllIn(out).length == 1)
  }

  test("errors are reported and the loop keeps going") {
    val (n, out) = drive(
      """SELECT * FROM no_such_table;
        |SELECT 1 AS ok;
        |""".stripMargin)
    assert(n == 1)
    assert(out.contains("error:"))
    assert(out.contains("ok"))
  }

  test("\\source executes statements from a file") {
    val f = java.nio.file.Files.createTempFile("graft_shell", ".sql")
    java.nio.file.Files.writeString(f,
      "SELECT count(*) AS n_regions FROM region;\n")
    val (_, out) = drive(s"\\source $f\n\\q\n")
    assert(out.contains("n_regions"))
    assert(out.contains("5"))
  }
}
