package graft

import graft.llm.TextOps
import org.apache.spark.sql.functions._

/** Typed-core entities (SURVEY §1.1) and text-operator edge cases. */
class ModelSpec extends SparkSpec {
  import spark.implicits._

  test("typed headers carry exact decimal money") {
    val hs = Model.invoiceHeaders(spark, sf)
    val h = hs.filter(_.invoiceId == 1L).head()
    assert(h.invoiceNumber == "INV-000000001")
    assert(h.totalAmount.scale == 2, "decimal(12,2) money")
    assert(hs.count() == Tables.orders(spark, sf).count())
  }

  test("typed lines: persisted computed column lineTotal = qty * unitPrice") {
    val ls = Model.invoiceLines(spark, sf).limit(100).collect()
    ls.foreach { l =>
      assert(l.lineTotal == (l.qty * l.unitPrice).setScale(4),
        s"computed column mismatch for line ${l.lineId}")
    }
  }

  test("lineId is a unique surrogate (IDENTITY parity) despite repeated line numbers") {
    val ls = Model.invoiceLines(spark, sf)
    assert(ls.count() == Tables.lineitem(spark, sf).count())
    assert(ls.select("lineId").distinct().count() == ls.count(),
      "lineId must be unique — (l_orderkey, l_linenumber) is NOT")
    // the raw pair really does repeat in this testdata (why the window exists)
    val rawPairs = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber").distinct().count()
    assert(rawPairs < ls.count(), "fixture sanity: raw pair is non-unique")
  }

  test("typed join pairs agree with the untyped flat view") {
    val n = Model.headerLinePairs(spark, sf).count()
    assert(n == Tables.lineitem(spark, sf).count())
  }

  test("langId: CJK text routes to zh; lexicon scoring breaks ties stably") {
    val df = Seq(
      (1L, "the cat and the dog"),            // en lexicon hits
      (2L, "el que la casa y de"),            // es hits
      (3L, "der und die das ist"),            // de hits
      (4L, "你好世界"),       // CJK → zh
      (5L, "xyzzy plugh")                     // no hits → tie → en
    ).toDF("id", "text")
    val got = df.select($"id", TextOps.langId($"text").as("l"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "en" && got(2L) == "es" && got(3L) == "de")
    assert(got(4L) == "zh")
    assert(got(5L) == "en", "all-zero scores fall back to the first lexicon")
  }

  test("chunking covers every token with the declared overlap") {
    val text = (1 to 150).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = df.select(explode(TextOps.chunks($"text", size = 64, step = 48)))
      .as[String].collect()
    assert(chunks.length == 3) // ceil((150-64)/48)+1
    val toks = chunks.flatMap(_.split(' '))
    assert(toks.toSet == (1 to 150).map(i => s"w$i").toSet, "full coverage")
    // consecutive chunks overlap by size - step = 16 tokens
    val c0 = chunks(0).split(' ').toSet
    val c1 = chunks(1).split(' ').toSet
    assert(c0.intersect(c1).size == 16)
    // short doc → single chunk, whole text
    val short = Seq((2L, "a b c")).toDF("doc_id", "text")
      .select(explode(TextOps.chunks($"text", 64, 48))).as[String].collect()
    assert(short.toSeq == Seq("a b c"))
  }

  test("text op edges: empty-ish strings don't crash or mis-tokenize") {
    val df = Seq((1L, ""), (2L, "one"), (3L, "a  b")).toDF("id", "text")
    val toks = df.select($"id", size(TextOps.tokens($"text")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(toks(1L) == 1 && toks(2L) == 1) // split("") = [""]
    val fp = df.select(TextOps.fingerprint($"text")).collect()
    assert(fp.forall(_.getString(0).length == 32))
    val rh = df.select(TextOps.rollingHash($"text")).collect()
    assert(rh.map(_.getLong(0)).distinct.length == 3)
  }
}
