package graft

import graft.llm.CorpusCache
import java.util.concurrent.{CountDownLatch, CyclicBarrier, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** CorpusCache concurrency and crash-residue behavior: interleaved
  * resolves of one key must run ONE build and both serve a complete
  * artifact; a partial (crashed) occupant of the key path is replaced,
  * never served. */
class CorpusCacheSpec extends SparkSpec {

  private val src = s"$sf/orders.parquet"
  private val markers = Seq("_DONE")

  private def freshTag(): String = s"spec-${System.nanoTime()}"

  test("two interleaved resolves of one key run one build, both serve it") {
    val tag = freshTag()
    val builds = new AtomicInteger(0)
    val started = new CyclicBarrier(2)
    val inBuild = new CountDownLatch(1)
    def resolveOnce(): java.io.File = {
      started.await(10, TimeUnit.SECONDS)
      CorpusCache.resolve(spark, src, "graft-cachespec", tag, markers) { d =>
        builds.incrementAndGet()
        inBuild.countDown()
        d.mkdirs()
        java.nio.file.Files.writeString(
          new java.io.File(d, "payload").toPath, "artifact")
        Thread.sleep(300) // hold the build open so the second resolve
                          // provably overlaps it, not follows it
        CorpusCache.touchMarker(d, "_DONE")
      }
    }
    var a: java.io.File = null
    var b: java.io.File = null
    val t1 = new Thread(() => a = resolveOnce())
    val t2 = new Thread(() => b = resolveOnce())
    t1.start(); t2.start()
    assert(inBuild.await(10, TimeUnit.SECONDS), "no build ever started")
    t1.join(30000); t2.join(30000)
    assert(builds.get() == 1,
      s"interleaved resolves ran ${builds.get()} builds, want exactly 1")
    for (d <- Seq(a, b)) {
      assert(d != null, "a resolve never returned")
      assert(new java.io.File(d, "_DONE").exists(), s"incomplete artifact at $d")
      assert(java.nio.file.Files.readString(
        new java.io.File(d, "payload").toPath) == "artifact")
    }
    assert(a.getCanonicalPath == b.getCanonicalPath)
  }

  test("a partial occupant of the key path is replaced by a fresh build") {
    val tag = freshTag()
    // first resolve to learn the key dir, then maul it into the shape a
    // crashed marker-era build leaves: payload present, marker missing
    val dir = CorpusCache.resolve(spark, src, "graft-cachespec", tag,
      markers) { d =>
      d.mkdirs()
      java.nio.file.Files.writeString(
        new java.io.File(d, "payload").toPath, "v1")
      CorpusCache.touchMarker(d, "_DONE")
    }
    new java.io.File(dir, "_DONE").delete()
    java.nio.file.Files.writeString(
      new java.io.File(dir, "payload").toPath, "torn")
    val again = CorpusCache.resolve(spark, src, "graft-cachespec", tag,
      markers) { d =>
      d.mkdirs()
      java.nio.file.Files.writeString(
        new java.io.File(d, "payload").toPath, "v2")
      CorpusCache.touchMarker(d, "_DONE")
    }
    assert(again.getCanonicalPath == dir.getCanonicalPath)
    assert(java.nio.file.Files.readString(
      new java.io.File(again, "payload").toPath) == "v2",
      "the torn occupant must be rebuilt, not served")
    assert(new java.io.File(again, "_DONE").exists())
  }

  test("a complete artifact is served without re-building") {
    val tag = freshTag()
    val builds = new AtomicInteger(0)
    def once(): java.io.File =
      CorpusCache.resolve(spark, src, "graft-cachespec", tag, markers) { d =>
        builds.incrementAndGet()
        d.mkdirs()
        CorpusCache.touchMarker(d, "_DONE")
      }
    once(); once()
    assert(builds.get() == 1, "a warm key must serve, not rebuild")
  }

  test("a build that CRASHES publishes nothing; the next resolve " +
      "rebuilds and the orphaned temp never becomes the served dir") {
    val tag = freshTag()
    val builds = new AtomicInteger(0)
    var crashedTmp: java.io.File = null
    val boom = intercept[RuntimeException] {
      CorpusCache.resolve(spark, src, "graft-cachespec", tag, markers) { d =>
        builds.incrementAndGet()
        crashedTmp = d
        d.mkdirs()
        // partial payload on disk, then the process "dies" before any
        // marker — the crash-mid-build window the temp-sibling +
        // markers protocol exists for
        java.nio.file.Files.writeString(
          new java.io.File(d, "payload").toPath, "partial")
        throw new RuntimeException("injected build crash")
      }
    }
    assert(boom.getMessage.contains("injected build crash"))
    // the crash must not have published: a second resolve builds again
    val served = CorpusCache.resolve(spark, src, "graft-cachespec", tag,
        markers) { d =>
      builds.incrementAndGet()
      d.mkdirs()
      java.nio.file.Files.writeString(
        new java.io.File(d, "payload").toPath, "complete")
      CorpusCache.touchMarker(d, "_DONE")
    }
    assert(builds.get() == 2, "the crashed build must not be served")
    assert(new java.io.File(served, "_DONE").exists())
    assert(java.nio.file.Files.readString(
      new java.io.File(served, "payload").toPath) == "complete",
      "the served artifact must be the rebuild, not the crash residue")
    assert(served.getCanonicalPath != crashedTmp.getCanonicalPath,
      "the orphaned temp sibling must never be promoted")
  }

  test("TWO PROCESSES racing one key both serve one complete artifact " +
      "— no torn read, no promoted intermediate") {
    // The per-key monitor serializes builders within one JVM only; two
    // JVMs (driver + BiServe, or concurrent benches) CAN double-build
    // the same key. The temp-sibling + atomic-publish protocol must
    // then hand both processes one complete artifact: the first
    // complete publish wins, the loser discards its own build and
    // serves the winner's, and neither ever observes the torn
    // mid-build payload either build stages. (The BiServeSpec
    // own-JVM precedent: the second builder is a real process.)
    val tag = freshTag()
    // the child: a second JVM with this test JVM's classpath and
    // module options, resolving the same key with a 4-second
    // deliberately-torn two-step build
    val jvmOpts = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments
      .toArray(Array.empty[String])
      .filter(o => o.startsWith("--add-opens") ||
        o.startsWith("--add-exports") || o.startsWith("-Dspark."))
    val cmd = Seq(
      s"${System.getProperty("java.home")}/bin/java") ++ jvmOpts ++ Seq(
      "-Xmx2g", "-cp", System.getProperty("java.class.path"),
      "graft.CorpusCacheRaceChild", src, tag, "4000")
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    val proc = pb.start()
    val out = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    try {
      // wait until the child is provably MID-BUILD: its temp sibling
      // exists but the key dir does not
      val tmpRoot = new java.io.File(System.getProperty("java.io.tmpdir"))
      def childStaging() = Option(tmpRoot.listFiles())
        .getOrElse(Array.empty)
        .exists(f => f.getName.startsWith("graft-ccrace-") &&
          f.getName.contains(".build-"))
      val deadline = System.currentTimeMillis() + 60000
      while (!childStaging() && proc.isAlive &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(childStaging(), "child never started building")
      // race it from THIS process with its own two-step build
      val stamp = s"parent-${ProcessHandle.current().pid()}"
      val mine = CorpusCache.resolve(spark, src, "graft-ccrace", tag,
          Seq("_DONE")) { d =>
        d.mkdirs()
        val p = new java.io.File(d, "payload").toPath
        java.nio.file.Files.writeString(p, s"GEN $stamp START\n")
        Thread.sleep(500)
        java.nio.file.Files.writeString(p,
          s"GEN $stamp START\n${"x" * 4096}\nGEN $stamp END")
        CorpusCache.touchMarker(d, "_DONE")
      }
      val myPayload = java.nio.file.Files.readString(
        new java.io.File(mine, "payload").toPath)
      // drain the child and take its served payload
      val lines = Iterator.continually(out.readLine())
        .takeWhile(_ != null).toVector
      assert(proc.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        "child JVM did not exit")
      assert(proc.exitValue() == 0,
        s"child failed:\n${lines.takeRight(25).mkString("\n")}")
      val childPayload = lines.collectFirst {
        case l if l.contains("CCRACE_SERVED=") =>
          l.substring(l.indexOf("CCRACE_SERVED=") + 14).replace("\\n", "\n")
      }.getOrElse(fail("child printed no served payload"))
      // no torn read: both payloads are a COMPLETE generation of ONE
      // builder (same stamp start to end), and both processes serve
      // the SAME artifact
      def completeGen(p: String): Boolean = {
        val m = "(?s)GEN (\\S+) START\n.*\nGEN (\\S+) END".r
        p match { case m(a, b) => a == b; case _ => false }
      }
      assert(completeGen(myPayload),
        s"parent served a torn payload: ${myPayload.take(80)}…")
      assert(completeGen(childPayload),
        s"child served a torn payload: ${childPayload.take(80)}…")
      assert(myPayload == childPayload,
        "the two processes served different artifacts for one key")
    } finally {
      proc.destroyForcibly()
      out.close()
    }
  }
}
