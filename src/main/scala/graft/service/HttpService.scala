package graft.service

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.SparkSession

/** HTTP query service (reference: modules/service — sclera's web
  * service executes statements over HTTP for non-JVM clients). The
  * graft twin rides the JDK's built-in httpserver (zero deps):
  *
  *   GET  /health        -> {"status":"ok"}
  *   POST /sql  (body = statement text)
  *       -> {"columns":[...], "rows":[[...], ...], "n":N}
  *
  * The full Spark SQL + GRAFT dialect flows through; results cap at
  * `maxRows` (a service returns pages, not corpora — large extracts
  * belong in a sink write, which the dialect itself can do). JSON is
  * emitted with the same full escaping discipline as Verify's
  * oracle_sql.json (every control char escaped).
  */
class HttpService(spark: SparkSession, port: Int, maxRows: Int = 1000) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  /** Bound port (useful when constructed with port 0 = ephemeral). */
  def boundPort: Int = server.getAddress.getPort

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def jval(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n: Byte => n.toString
    case n: Short => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Float => if (n.isNaN || n.isInfinite) jstr(n.toString)
      else n.toString
    case n: Double => if (n.isNaN || n.isInfinite) jstr(n.toString)
      else n.toString
    case n: java.math.BigDecimal => n.toPlainString
    case other => jstr(other.toString)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  server.createContext("/health", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      respond(ex, 200, """{"status":"ok"}""")
  })

  server.createContext("/sql", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      if (ex.getRequestMethod != "POST") {
        respond(ex, 405, """{"error":"POST a statement to /sql"}""")
        return
      }
      val stmt = new String(
        ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8).trim
      try {
        val df = spark.sql(stmt)
        val rows = df.limit(maxRows).collect()
        val cols = df.columns.map(jstr).mkString("[", ",", "]")
        val data = rows.map(_.toSeq.map(jval).mkString("[", ",", "]"))
          .mkString("[", ",", "]")
        respond(ex, 200,
          s"""{"columns":$cols,"rows":$data,"n":${rows.length}}""")
      } catch {
        case e: Exception => respond(ex, 400,
          s"""{"error":${jstr(Option(e.getMessage)
            .getOrElse(e.getClass.getName).linesIterator
            .take(3).mkString(" / "))}}""")
      }
    }
  })

  // ---- web display client (reference: modules/interfaces/display
  // Display.scala — sclera renders results to a browser). GET
  // /display?q=<urlencoded statement> (or POST the statement) returns
  // an HTML page: result rows as a styled table, or — when the
  // statement is a GRAFT PLOT ... RENDER returning the 1-row svg
  // relation — the chart embedded inline.

  private def hesc(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case '\'' => "&#39;"
    case c => c.toString
  }

  private def htmlPage(title: String, body: String): String =
    "<!DOCTYPE html><html><head><meta charset=\"utf-8\"/>" +
      s"<title>${hesc(title)}</title><style>" +
      "body{font-family:sans-serif;margin:16px}" +
      "table{border-collapse:collapse}" +
      "th,td{border:1px solid #999;padding:3px 8px;font-size:13px}" +
      "th{background:#eee}caption{text-align:left;padding:4px 0;" +
      "font-weight:bold}</style></head><body>" + body + "</body></html>"

  private def respondHtml(ex: HttpExchange, code: Int,
      body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/html; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  server.createContext("/display", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val stmt =
        if (ex.getRequestMethod == "POST")
          new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8).trim
        else Option(ex.getRequestURI.getRawQuery).getOrElse("")
          .split("&").collectFirst {
            case p if p.startsWith("q=") =>
              java.net.URLDecoder.decode(p.drop(2), "UTF-8").trim
          }.getOrElse("")
      if (stmt.isEmpty) {
        respondHtml(ex, 400, htmlPage("graft",
          "<p>pass a statement: GET /display?q=... or POST it</p>"))
        return
      }
      try {
        val df = spark.sql(stmt)
        val rows = df.limit(maxRows).collect()
        val body =
          if (df.columns.toSeq == Seq("svg") && rows.length == 1)
            // a GRAFT PLOT ... RENDER relation: embed the chart
            rows.head.getString(0)
          else {
            val head = df.columns
              .map(c => s"<th>${hesc(c)}</th>").mkString
            val data = rows.map { r =>
              r.toSeq.map(v =>
                s"<td>${hesc(if (v == null) "null" else v.toString)}</td>")
                .mkString("<tr>", "", "</tr>")
            }.mkString
            s"<table><caption>${hesc(stmt)} — ${rows.length} " +
              s"row(s)</caption><tr>$head</tr>$data</table>"
          }
        respondHtml(ex, 200, htmlPage("graft display", body))
      } catch {
        case e: Exception => respondHtml(ex, 400, htmlPage("graft error",
          s"<p>error: ${hesc(Option(e.getMessage)
            .getOrElse(e.getClass.getName).linesIterator
            .take(3).mkString(" / "))}</p>"))
      }
    }
  })

  // ---- streaming / animated plot display (reference: modules/visual
  // model/plot/Transition.scala — sclera animates a plot over a
  // streaming query). GET /plot/<display> serves the LATEST frame the
  // StreamingPlot registry holds for that display — each browser poll
  // sees the newest micro-batch's complete SVG; ?frames=1 lists the
  // retained history (batch ids) instead.
  server.createContext("/plot", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val name = ex.getRequestURI.getPath.stripPrefix("/plot")
        .stripPrefix("/")
      val wantList = Option(ex.getRequestURI.getRawQuery)
        .exists(_.contains("frames=1"))
      graft.streaming.StreamingPlot.display(name) match {
        case None => respondHtml(ex, 404, htmlPage("graft plot",
          s"<p>no streaming display named '${hesc(name)}'</p>"))
        case Some(d) if wantList =>
          val items = d.frames
            .map { case (id, _) => s"<li>batch $id</li>" }.mkString
          respondHtml(ex, 200, htmlPage(s"frames: $name",
            s"<ul>$items</ul>"))
        case Some(d) => d.latest match {
          case Some(svg) =>
            respondHtml(ex, 200, htmlPage(s"plot: $name", svg))
          case None => respondHtml(ex, 404, htmlPage("graft plot",
            s"<p>display '${hesc(name)}' has no frames yet</p>"))
        }
      }
    }
  })

  def start(): HttpService = { server.start(); this }
  def stop(): Unit = server.stop(0)
}

object HttpService {
  /** Session + tables + server in one call (the service main). */
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    graft.Tables(spark, dir).registerAll()
    val port = args.lift(1).map(_.toInt).getOrElse(8080)
    val svc = new HttpService(spark, port).start()
    println(s"graft http service on port ${svc.boundPort} " +
      s"(tables from $dir); POST /sql")
  }
}
