package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => CheckTest}
import graft.llm.Cluster

/** Connected-components clustering: transitivity (the property pair-wise
  * dedup lacks), pointer-jump convergence on long chains, the maxIter
  * guard, and the end-to-end dupClusters contract. */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], maxIter: Int = 25) =
    Cluster.connectedComponents(
      edges.toDF("id_a", "id_b"), maxIter)
      .as[(Long, Long)].collect().toMap

  test("components merge transitively: a~b, b~c puts a,b,c in one cluster") {
    val labels = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a 64-node path graph converges (pointer jumping beats diameter)") {
    // plain min-neighbor propagation needs ~63 rounds on a path; the
    // pointer-jump step must bring it under the 25-round default bound
    val edges = (0L until 63L).map(i => (i, i + 1))
    val labels = cc(edges)
    assert(labels.size == 64 && labels.values.forall(_ == 0L))
  }

  test("maxIter guard throws instead of returning half-converged labels") {
    val edges = (0L until 63L).map(i => (i, i + 1))
    assertThrows[IllegalStateException] { cc(edges, maxIter = 2) }
  }

  test("property: equals union-find on random graphs") {
    val genEdges = Gen.nonEmptyListOf(for {
      a <- Gen.chooseNum(0L, 30L); b <- Gen.chooseNum(0L, 30L)
      if a != b
    } yield (math.min(a, b), math.max(a, b)))
    val prop = forAll(genEdges) { edges =>
      val want = {
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        parent.keys.map(x => x -> find(x)).toMap
      }
      cc(edges) == want
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("dupClusters: cluster id is the min member, size counts members") {
    // three exact copies + one unrelated doc: one cluster of 3
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (5L, "alpha beta gamma delta epsilon zeta eta theta"),
      (9L, "alpha beta gamma delta epsilon zeta eta theta"),
      (7L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val out = Cluster.dupClusters(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().sorted
    assert(out.toSeq == Seq((1L, 1L, 3L), (1L, 5L, 3L), (1L, 9L, 3L)))
  }
}
