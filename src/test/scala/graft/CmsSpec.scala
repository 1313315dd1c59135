package graft

import org.apache.spark.sql.functions._
import graft.functions.{CountMinSketch, CmsSketch}
import graft.llm.{LlmQueries, TextOps}

/** Count-min sketch laws: the one-sided error guarantee, exactness of
  * sketch-table rollups (merge == direct build), the collision bound
  * under a forced-tiny width, and the declared query's audit columns. */
class CmsSpec extends SparkSpec {

  private lazy val terms = Tables.documents(spark, sf)
    .select(col("source"), explode(TextOps.tokens(col("text"))).as("term"))
    .withColumn("h", xxhash64(col("term")))

  test("declared query: estimates dominate truth, exact where collision-free") {
    val got = LlmQueries.queries("llm_cms_counts")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (src, term, est, truth) =>
      assert(est >= truth, s"CMS must never underestimate: $src/$term")
    }
    // with width 1024 over a ~31-term vocabulary, every probe term has
    // at least one collision-free row — verify that claim from the
    // actual vocabulary + hash family rather than assuming it, then
    // demand exactness for the covered terms
    val vocab = terms.select("term", "h").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val probeTerms = got.map(_._2).distinct
    probeTerms.foreach { t =>
      val h = vocab.find(_._1 == t).get._2
      val free = (0 until 4).exists { row =>
        val idx = CountMinSketch.index(h, row, 1024)
        !vocab.exists { case (o, oh) =>
          o != t && CountMinSketch.index(oh, row, 1024) == idx
        }
      }
      if (free) got.filter(_._2 == t).foreach { case (src, _, est, truth) =>
        assert(est == truth,
          s"collision-free term $t must be exact in $src")
      }
    }
  }

  private def toSketch(r: org.apache.spark.sql.Row): CmsSketch =
    CmsSketch(r.getLong(0),
      r.getSeq[scala.collection.Seq[Long]](1).map(_.toVector).toVector)

  test("rollup equals direct build (merge is exact)") {
    val perSource = terms.groupBy(col("source"))
      .agg(CountMinSketch.agg(4, 64)(col("h")).as("cms"))
      .select("cms.n", "cms.rows").collect().map(toSketch)
    val direct = toSketch(
      terms.agg(CountMinSketch.agg(4, 64)(col("h")).as("cms"))
        .select("cms.n", "cms.rows").collect().head)
    val merged = perSource.reduce { (a, b) =>
      CmsSketch(a.n + b.n, a.rows.zip(b.rows).map { case (ra, rb) =>
        ra.zip(rb).map { case (x, y) => x + y } })
    }
    assert(merged == direct,
      "element-wise rollup must equal the direct union sketch")
  }

  test("forced-tiny width: overestimates stay within the row-collision bound") {
    val vocab = terms.select("term", "h").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val truthMap = terms.groupBy("term").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val width = 4
    val sk = toSketch(
      terms.agg(CountMinSketch.agg(2, width)(col("h")).as("cms"))
        .select("cms.n", "cms.rows").collect().head)
    val n = sk.n
    vocab.foreach { case (t, h) =>
      val est = CountMinSketch.estimate(sk, h)
      val truth = truthMap(t)
      assert(est >= truth)
      // deterministic bound: a row's overestimate is the sum of the
      // OTHER terms landing in the same cell — recompute it exactly
      val rowBounds = (0 until 2).map { row =>
        val idx = CountMinSketch.index(h, row, width)
        vocab.collect { case (o, oh)
          if o != t && CountMinSketch.index(oh, row, width) == idx =>
            truthMap(o)
        }.sum
      }
      assert(est - truth <= rowBounds.min,
        s"$t: est $est exceeds truth $truth + min row collisions")
      assert(est <= n)
    }
  }
}
