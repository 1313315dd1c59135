package graft

import graft.functions.{HeavyHitters, MisraGries}
import graft.llm.TextOps
import org.apache.spark.sql.functions._

/** Misra–Gries heavy hitters: the sketch guarantee, merge safety, and
  * the exact-recount contract of the two-pass operator. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // a deterministic skewed stream: term "t<i>" appears i^2 times
  private def stream(maxI: Int): Seq[String] =
    (1 to maxI).flatMap(i => Seq.fill(i * i)(s"t$i"))

  test("MG guarantee: freq > n/(cap+1) terms survive, error bounded") {
    val cap = 8
    val xs = stream(20) // n = sum i^2 = 2870
    val n = xs.size.toLong
    val mg = new MisraGries(cap)
    val sketch = xs.foldLeft(mg.zero)(mg.reduce)
    assert(sketch.size <= cap)
    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n / (cap + 1)
    exact.foreach { case (t, f) =>
      if (f > bound)
        assert(sketch.contains(t), s"$t (freq $f > $bound) missing")
      sketch.get(t).foreach { est =>
        assert(est <= f && est >= f - bound,
          s"$t: estimate $est outside [${f - bound}, $f]")
      }
    }
  }

  test("MG merge keeps the bound across arbitrary splits") {
    val cap = 8
    val xs = stream(20)
    val n = xs.size.toLong
    val mg = new MisraGries(cap)
    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n / (cap + 1)
    for (parts <- Seq(2, 3, 7)) {
      val merged = xs.grouped((xs.size + parts - 1) / parts)
        .map(_.foldLeft(mg.zero)(mg.reduce))
        .reduce(mg.merge)
      assert(merged.size <= cap)
      exact.foreach { case (t, f) =>
        if (f > bound)
          assert(merged.contains(t), s"parts=$parts: $t missing")
      }
    }
  }

  test("ScalaCheck: the MG bound holds for arbitrary streams and splits") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => CheckTest}
    val stream = Gen.nonEmptyListOf(Gen.chooseNum(0, 30).map(i => s"t$i"))
    val capG = Gen.chooseNum(1, 12)
    val partsG = Gen.chooseNum(1, 5)
    val prop = forAll(stream, capG, partsG) { (xs, cap, parts) =>
      val mg = new MisraGries(cap)
      val merged = xs.grouped(math.max(1, (xs.size + parts - 1) / parts))
        .map(_.foldLeft(mg.zero)(mg.reduce))
        .reduce(mg.merge)
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
      val bound = xs.size.toLong / (cap + 1)
      merged.size <= cap &&
        exact.forall { case (t, f) =>
          (f <= bound || merged.contains(t)) &&
            merged.get(t).forall(e => e <= f && e >= f - bound)
        }
    }
    val r = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(r.passed, r.status.toString)
  }

  test("topTerms equals the exact brute force on the corpus") {
    val terms = Tables.documents(spark, sf)
      .select(explode(TextOps.tokens(col("text"))).as("term"))
    val exact = terms.groupBy($"term").agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"term").limit(20)
      .as[(String, Long)].collect().toSeq
    val got = HeavyHitters.topTerms(terms, "term", 20, capacity = 1024)
      .as[(String, Long)].collect().toSeq
    assert(got == exact)
  }

  test("an uncertifiable sketch falls back to the full aggregate " +
      "instead of returning a wrong 'exact' top-k") {
    val terms = Tables.documents(spark, sf)
      .select(explode(TextOps.tokens(col("text"))).as("term"))
    val exact = terms.groupBy($"term").agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"term").limit(20)
      .as[(String, Long)].collect().toSeq
    // capacity 8 cannot certify a top-20 (k-th freq <= n/9 on this
    // corpus) — the MG guarantee doesn't cover the request, so the
    // guard must route to the full-vocabulary aggregate: the result is
    // STILL the exact top-20, paid for with the vocab shuffle
    val got = HeavyHitters.topTerms(terms, "term", 20, capacity = 8)
      .as[(String, Long)].collect().toSeq
    assert(got == exact,
      "guarded fallback must return the true top-k, never a sketch miss")
    // and a certifying capacity keeps the sketch path: the plan filters
    // on the candidate set instead of aggregating the vocabulary
    val plan = HeavyHitters.topTerms(terms, "term", 20, capacity = 1024)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("INSET") || plan.contains(" IN ("),
      s"certified path must keep the candidate isin filter:\n$plan")
  }
}
