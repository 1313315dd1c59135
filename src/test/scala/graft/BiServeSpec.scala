package graft

import java.net.{InetSocketAddress, Socket}
import java.util.concurrent.TimeUnit

/** S7 — the BI serving tier. The reference serves its relational surface
  * to Superset over TDS/ODBC (reference superset/Readme.md:9,
  * invoice-api/server.js:11-26); the Spark-first equivalent is the Hive
  * thriftserver speaking HiveServer2 protocol over TCP. This spec proves
  * the round trip END TO END from OUTSIDE the Spark JVM: beeline (its
  * own JVM, the stock HiveServer2 client) connects over the socket and
  * aggregates the denormalized BI view.
  */
class BiServeSpec extends SparkSpec {

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  private def awaitPort(port: Int, timeoutMs: Long): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      val sock = new Socket()
      try {
        sock.connect(new InetSocketAddress("127.0.0.1", port), 500)
        return true
      } catch {
        case _: java.io.IOException => Thread.sleep(250)
      } finally sock.close()
    }
    false
  }

  test("S7: an external SQL client (beeline, own JVM) queries the BI view") {
    // keep derby/operation-log litter out of the repo working dir
    System.setProperty("derby.system.home", tmpDir("derby"))
    spark.conf.set("hive.server2.thrift.bind.host", "127.0.0.1")
    spark.conf.set("hive.server2.logging.operation.log.location", tmpDir("oplog"))
    // (spark.sql.hive.thriftServer.singleSession is STATIC conf — cannot
    // be set here; the GLOBAL temp view below is what crosses sessions)

    ops.Views.registerInvoiceViews(spark, sf)
    // a GLOBAL temp view is visible to every thrift session regardless
    // of the server's session-isolation setting
    spark.table("vw_invoice_header_line")
      .createOrReplaceGlobalTempView("vw_invoice_header_line")
    val expected = spark.table("vw_invoice_header_line").count()
    assert(expected > 0)

    // freePort closes its probe socket before the server binds — a
    // benign TOCTOU race in a busy CI box; retry with a fresh port
    // rather than burning one long timeout on a stolen port. (The
    // server class is private to its package, so it is held behind a
    // stop closure rather than a named type.)
    var port = -1
    def tryStart(): Option[() => Unit] = {
      port = freePort()
      spark.conf.set("hive.server2.thrift.port", port.toString)
      val s = org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
        .startWithSparkSession(spark, exitOnError = false)
      if (awaitPort(port, 30000)) Some(() => s.stop())
      else { s.stop(); None }
    }
    var stopServer: Option[() => Unit] = None
    var attempts = 0
    while (stopServer.isEmpty && attempts < 3) {
      attempts += 1
      stopServer = tryStart()
    }
    assert(stopServer.nonEmpty, s"thrift server never bound after $attempts attempts")
    try {
      val pb = new ProcessBuilder(
        "/opt/spark/bin/beeline",
        "-u", s"jdbc:hive2://127.0.0.1:$port/default",
        "-n", "graft", "-p", "",
        "--outputformat=tsv2", "--silent=true",
        "-e", "SELECT count(*) AS n FROM global_temp.vw_invoice_header_line")
        .redirectErrorStream(true)
      pb.environment().put("SPARK_HOME", "/opt/spark")
      val p = pb.start()
      p.getOutputStream.close() // no stdin: -e must run and exit
      // drain concurrently — a blocking readAllBytes would outlive the
      // waitFor timeout if the client ever went interactive
      val outBuf = new java.io.ByteArrayOutputStream()
      val drainer = new Thread(() => p.getInputStream.transferTo(outBuf))
      drainer.setDaemon(true)
      drainer.start()
      val finished = p.waitFor(180, TimeUnit.SECONDS)
      if (!finished) p.destroyForcibly().waitFor()
      drainer.join(5000)
      val out = outBuf.toString()
      assert(finished, s"beeline hung:\n$out")
      assert(p.exitValue() == 0, s"beeline rc=${p.exitValue()}:\n$out")
      assert(out.linesIterator.map(_.trim).contains(expected.toString),
        s"expected row count $expected in client output:\n$out")
    } finally stopServer.foreach(_())
  }
}
