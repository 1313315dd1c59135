package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => CheckTest}

/** Generative checks for the two pieces of version arithmetic that must
  * agree with Spark's own evaluation: the source's pushed (lo, hi]
  * narrowing and the sink's bucket derivation. */
class PushdownPropertySpec extends SparkSpec {
  import spark.implicits._

  // --- source pushdown: random predicates vs in-memory evaluation -------

  private lazy val srcDir: String = {
    val out = tmpDir("pushprop")
    graft.cdc.Retention.writeCompacted(
      (1L to 200L).map(v => (v * 10, v)).toDF("entity_id", "change_version"),
      out, nFiles = 4)
    out
  }

  private val ops = Seq[(String, (Long, Long) => Boolean)](
    (">", _ > _), (">=", _ >= _), ("<", _ < _), ("<=", _ <= _), ("=", _ == _))

  private def colPred(op: String, v: Long) = op match {
    case ">" => col("change_version") > v
    case ">=" => col("change_version") >= v
    case "<" => col("change_version") < v
    case "<=" => col("change_version") <= v
    case "=" => col("change_version") === v
  }

  private val genPred: Gen[(String, Long)] = for {
    op <- Gen.oneOf(ops.map(_._1))
    v <- Gen.chooseNum(-5L, 205L)
  } yield (op, v)

  test("pushed version predicates select exactly the rows Spark would") {
    val opFns = ops.toMap
    val src = spark.read.format("graft-cdc").option("path", srcDir).load()
    val prop = forAll(genPred, genPred) { (p1, p2) =>
      val got = src.filter(colPred(p1._1, p1._2) && colPred(p2._1, p2._2))
        .select("change_version").as[Long].collect().toSet
      val want = (1L to 200L)
        .filter(v => opFns(p1._1)(v, p1._2) && opFns(p2._1)(v, p2._2))
        .toSet
      got == want
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  // --- sink bucket math: write-side expr == read-side Long division -----

  test("write-side bucket expression matches readVersion's Long division") {
    val versions = Seq(0L, 1L, 999L, 1000L, 1001L,
      (1L << 53) - 1, 1L << 53, (1L << 53) + 1,
      (1L << 53) + 999, (1L << 62) + 123456789L, Long.MaxValue - 1)
    val got = versions.toDF("change_version")
      .select(expr(s"change_version div ${graft.sinks.DocumentSink.VersionsPerBucket}"))
      .as[Long].collect().toSeq
    val want = versions.map(_ / graft.sinks.DocumentSink.VersionsPerBucket)
    assert(got == want)
    // the double-division form this replaced really does diverge up there
    val viaDouble = versions.map(v =>
      math.floor(v.toDouble / graft.sinks.DocumentSink.VersionsPerBucket).toLong)
    assert(viaDouble != want, "sanity: double math would have disagreed")
  }
}
