package graft.tools

import java.io.{BufferedReader, PrintWriter}

import org.apache.spark.sql.SparkSession

/** Interactive shell (reference: modules/interfaces/shell — Repl.scala,
  * ReplCommand.scala: SQL statements + meta commands over a line
  * reader). Spark-first re-expression: every statement — the full
  * Spark SQL surface plus the GRAFT dialect — goes through
  * `spark.sql`, so the shell is a thin loop, not an engine. Meta
  * commands mirror the reference's set:
  *
  *   \q                      quit
  *   \d | \tables            list temp views / tables
  *   \timer on|off           print per-statement wall time
  *   \format table|csv       result rendering
  *   \source <file>          execute statements from a file
  *   \explain <stmt>         formatted physical plan
  *
  * Statements may span lines and end with `;`. The core loop is a
  * pure function over (reader, writer) so ShellSpec drives it without
  * a TTY; `main` wires stdin/stdout and a session with graft
  * extensions + the testdata tables registered.
  */
object Shell {

  private val MaxRows = 50

  /** Run the REPL loop until EOF or \q. Returns statements executed. */
  def run(spark: SparkSession, in: BufferedReader, out: PrintWriter): Int = {
    var timer = false
    var csv = false
    // EXPLAIN SCRIPT mode (reference SqlAdminParser.scala:153
    // SqlExplainScript): while ON, every executed statement echoes
    // its plan before the result rows
    var explainScript = false
    var executed = 0
    val buf = new StringBuilder

    def renderResult(df: org.apache.spark.sql.DataFrame): Unit = {
      val rows = df.limit(MaxRows + 1).collect()
      val shown = rows.take(MaxRows)
      val names = df.columns
      if (csv) {
        out.println(names.mkString(","))
        shown.foreach(r => out.println(
          r.toSeq.map(v => if (v == null) "" else v.toString)
            .mkString(",")))
      } else {
        val cells = shown.map(_.toSeq.map(v =>
          if (v == null) "NULL" else v.toString))
        val widths = names.indices.map(i =>
          (names(i).length +: cells.map(_(i).length)).max)
        def line(vals: Seq[String]) = out.println(
          vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }
            .mkString(" | "))
        line(names.toSeq)
        out.println(widths.map("-" * _).mkString("-+-"))
        cells.foreach(line)
      }
      out.println(
        s"(${shown.length}${if (rows.length > MaxRows) "+" else ""} rows)")
    }

    // the statement-level toggle (sclera: EXPLAIN SCRIPT [ON|OFF])
    val ExplainScriptRe =
      """(?is)\s*(?:GRAFT\s+)?EXPLAIN\s+SCRIPT(?:\s+(ON|OFF))?\s*""".r

    def exec(stmt: String): Unit = {
      stmt match {
        case ExplainScriptRe(mode) =>
          explainScript = mode == null || mode.equalsIgnoreCase("ON")
          out.println(s"explain script ${if (explainScript) "on" else "off"}")
          executed += 1
          return
        case _ => ()
      }
      val t0 = System.nanoTime()
      try {
        val df = spark.sql(stmt)
        if (explainScript) out.println(
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode
              .fromString("simple")))
        renderResult(df)
        executed += 1
        if (timer) out.println(
          f"time: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      } catch {
        case e: Exception =>
          out.println(s"error: ${Option(e.getMessage).getOrElse(e).toString
            .linesIterator.take(3).mkString(" / ")}")
      }
    }

    def meta(cmd: String): Boolean = { // true = keep looping
      val parts = cmd.split("\\s+").toSeq
      parts.head match {
        case "\\q" => return false
        case "\\d" | "\\tables" =>
          spark.catalog.listTables().collect()
            .map(_.name).sorted.foreach(out.println)
        case "\\timer" => timer = parts.lift(1).contains("on")
        case "\\format" => csv = parts.lift(1).contains("csv")
        case "\\explain" =>
          try out.println(
            spark.sql(cmd.stripPrefix("\\explain").trim)
              .queryExecution.explainString(
                org.apache.spark.sql.execution.ExplainMode
                  .fromString("formatted")))
          catch { case e: Exception => out.println(s"error: ${e.getMessage}") }
        case "\\source" => parts.lift(1) match {
          case Some(f) if java.nio.file.Files.exists(
              java.nio.file.Paths.get(f)) =>
            val r = java.nio.file.Files.newBufferedReader(
              java.nio.file.Paths.get(f))
            try run(spark, r, out) finally r.close()
          case other =>
            out.println(s"error: cannot read ${other.getOrElse("<missing>")}")
        }
        case other => out.println(s"error: unknown command $other")
      }
      true
    }

    var looping = true
    while (looping) {
      val lineRead = in.readLine()
      if (lineRead == null) looping = false
      else {
        val line = lineRead.trim
        if (buf.isEmpty && line.startsWith("\\"))
          looping = meta(line)
        else if (line.nonEmpty) {
          buf.append(line).append(' ')
          if (line.endsWith(";")) {
            val stmt = buf.toString.trim.stripSuffix(";")
            buf.clear()
            if (stmt.nonEmpty) exec(stmt)
          }
        }
      }
      out.flush()
    }
    executed
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    graft.Tables(spark, dir).registerAll()
    val out = new PrintWriter(System.out)
    out.println(s"graft shell — tables from $dir; \\q to quit")
    out.flush()
    run(spark,
      new BufferedReader(new java.io.InputStreamReader(System.in)), out)
    spark.stop()
  }
}
