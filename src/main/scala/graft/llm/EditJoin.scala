package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-similarity self-join via segment-indexed blocking (the
  * PassJoin/Ed-Join pigeonhole): find every pair of rows whose
  * fixed-length string keys are within edit distance `k` WITHOUT a
  * domain blocking key and WITHOUT ever forming a cross product.
  *
  * The pigeonhole: partition each string into `k+1` contiguous
  * segments. An edit script of at most `k` operations leaves at least
  * one segment untouched, and the untouched segment reappears in the
  * other string shifted by the net insert/delete drift in front of it
  * — for the EQUAL-LENGTH strings this object is scoped to, an
  * optimal script has #inserts = #deletes ≤ ⌊k/2⌋, so any prefix's
  * net drift (and hence the shift) is bounded by ⌊k/2⌋, not k. So
  * the candidate set
  *
  *   segments(a) ⋈ shifted-substrings(b)  on (segment index, bytes)
  *
  * is complete — every qualifying pair survives — and the join key
  * (index, segment bytes) is high-cardinality: corpus-scale candidate
  * generation is a plain shuffle join whose fan-out is bounded by the
  * constant enumeration factor ((k+1) segments one side,
  * ≤ (k+1)·(2⌊k/2⌋+1) substrings the other), never |block|². Candidates
  * are then verified with the THRESHOLDED banded levenshtein (O(k·n)
  * early-exit DP), so false candidates cost k·n character compares,
  * not a full DP table.
  *
  * Scope: string keys of exactly `len` characters (rows with any
  * other length are dropped — the caller aligns them, e.g. fixed
  * 30-char document heads). Variable-length PassJoin needs per-length
  * partition schemes and a length-band join; the fixed-length form
  * covers the fingerprint/prefix-key shape the curation pipeline
  * uses. Contrast with [[LlmQueries.fuzzyPairsQ]]'s source-blocked
  * join: blocking on a 5-value domain key leaves O((n/5)²) pairs per
  * block, honest only while blocks stay small; this shape is the
  * 100 TB path when the threshold is tight (k ≪ len — at k close to
  * len the untouched segments shrink to a couple of characters and
  * the pigeonhole filter stops pruning; there the LSH family is the
  * right tool instead).
  *
  * Reference anchor: the reference has no fuzzy matching at all
  * (nearest is LIKE-suffix matching, sqls/setup-invoice-db.sql:30) —
  * this is part of the [NORTH-STAR] curation surface (SURVEY §2.11 N2).
  */
object EditJoin {

  /** The `k+1`-segment partition of a `len`-char string: 1-based
    * (start, length) per segment, longer segments first. */
  private[graft] def scheme(len: Int, k: Int): Seq[(Int, Int, Int)] = {
    val n = k + 1
    val base = len / n
    val rem = len % n
    val lens = Seq.tabulate(n)(i => if (i < rem) base + 1 else base)
    lens.scanLeft(1)(_ + _).zip(lens).zipWithIndex.map {
      case ((start, l), i) => (i, start, l)
    }
  }

  /** The probe-window half-width: an equal-length pair's optimal
    * script has at most ⌊k/2⌋ insert/delete pairs, so no untouched
    * segment shifts further than that. */
  private[graft] def shift(k: Int): Int = k / 2

  /** All (segIndex, piece) probes of a string `s` under `scheme`:
    * every substring that could be some partner's untouched segment,
    * i.e. each segment window slid by at most ±⌊k/2⌋. Mirrors the
    * Spark enumeration; used by the spec's completeness property. */
  private[graft] def probes(s: String, len: Int, k: Int): Set[(Int, String)] =
    (for {
      (i, start, l) <- scheme(len, k)
      p <- math.max(1, start - shift(k)) to
        math.min(len - l + 1, start + shift(k))
    } yield (i, s.substring(p - 1, p - 1 + l))).toSet

  /** Self-join `df` on `strCol` (exactly `len` chars; other lengths
    * dropped) within edit distance `k`. Returns
    * (id_a, id_b, dist): id_a < id_b, dist = exact levenshtein ≤ k. */
  def fixedLenSelfJoin(df: DataFrame, idCol: String, strCol: String,
                       len: Int, k: Int): DataFrame = {
    require(k >= 1 && k + 1 <= len, s"need 1 <= k <= len-1, got k=$k len=$len")
    val sch = scheme(len, k)
    val keys = df.filter(length(col(strCol)) === len)
      .select(col(idCol).as("__id"), col(strCol).as("__s"))

    val segs = keys.select(col("__id").as("id_a"), col("__s").as("head_a"),
        explode(array(sch.map { case (i, start, l) =>
          struct(lit(i).as("i"), substring(col("__s"), start, l).as("piece"))
        }: _*)).as("g"))
      .select(col("id_a"), col("head_a"), col("g.i"), col("g.piece"))

    // array_distinct: repeated text can make two shift positions yield
    // the same (i, piece) probe — dedup before the join, not after
    val subs = keys.select(col("__id").as("id_b"), col("__s").as("head_b"),
        explode(array_distinct(array((for {
          (i, start, l) <- sch
          p <- math.max(1, start - shift(k)) to
            math.min(len - l + 1, start + shift(k))
        } yield struct(lit(i).as("i"),
          substring(col("__s"), p, l).as("piece"))): _*))).as("g"))
      .select(col("id_b"), col("head_b"), col("g.i"), col("g.piece"))

    segs.join(subs, Seq("i", "piece"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "head_a", "id_b", "head_b")
      .distinct() // a pair can collide on several segments — verify once
      .withColumn("dist",
        levenshtein(col("head_a"), col("head_b"), k).cast("long"))
      .filter(col("dist") >= 0)
      .select("id_a", "id_b", "dist")
  }
}
