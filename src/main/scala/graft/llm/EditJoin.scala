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
  * Two forms: [[fixedLenSelfJoin]] scopes to keys of exactly `len`
  * characters (the fingerprint/prefix-key shape — tighter ±⌊k/2⌋
  * windows because equal lengths force #inserts = #deletes);
  * [[selfJoin]] is the general variable-length PassJoin — per-length
  * partition schemes plus a length-band probe (an indexed string of
  * length l is probed by strings of length m ∈ [l−k, l+k], each
  * segment window widened by the net length drift Δ = m−l: at most
  * ⌊(k−Δ)/2⌋ deletes shift it left, ⌊(k+Δ)/2⌋ inserts shift it
  * right). Contrast with [[LlmQueries.fuzzyPairsQ]]'s source-blocked
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

  /** Variable-length probe mirror for [[selfJoin]]: the (segIndex,
    * piece) windows of `t` against the scheme of an INDEXED length
    * `lIndexed`, slid by the drift-refined bound for
    * Δ = |t| − lIndexed. Used by the spec's completeness property. */
  private[graft] def varProbes(t: String, lIndexed: Int,
                               k: Int): Set[(Int, String)] = {
    val m = t.length
    val delta = m - lIndexed
    (for {
      (i, start, slen) <- scheme(lIndexed, k)
      p <- math.max(1, start - (k - delta) / 2) to
        math.min(m - slen + 1, start + (k + delta) / 2)
    } yield (i, t.substring(p - 1, p - 1 + slen))).toSet
  }

  /** Self-join `df` on `strCol` (exactly `len` chars; other lengths
    * dropped) within edit distance `k`; [[selfJoin]] is the
    * variable-length form. `blockCols` adds domain blocking ON TOP of
    * the segment pigeonhole (candidates must also match on them — the
    * fail-over shape for [[LlmQueries.fuzzyPairsQ]]'s over-cap blocks:
    * per-block pair space becomes candidates, never |block|²); the
    * block columns prefix the output. Returns
    * (blockCols..., id_a, id_b, dist): id_a < id_b,
    * dist = exact levenshtein ≤ k. */
  def fixedLenSelfJoin(df: DataFrame, idCol: String, strCol: String,
                       len: Int, k: Int,
                       blockCols: Seq[String] = Nil): DataFrame = {
    require(k >= 1 && k + 1 <= len, s"need 1 <= k <= len-1, got k=$k len=$len")
    val sch = scheme(len, k)
    val bc = blockCols.map(col)
    val allKeys = df.filter(length(col(strCol)) === len)
      .select(bc :+ col(idCol).as("__id") :+ col(strCol).as("__s"): _*)

    // EXACT-CLONE COLLAPSE (the knnGraph / semanticDedup precedent,
    // measured here in the round-8 sf1 sweep: on the 10-clone corpus
    // every identical head multiplies both the candidate join and the
    // banded-DP verifies by the clone count — quadratically in pair
    // terms — driving the family to 36-85× at 10×, when the DISTINCT
    // head set had not grown at all). Candidates and verifies run over
    // one representative per (block, head); member pairs re-enter
    // afterwards: a rep pair expands to its groups' cross product at
    // the SAME verified distance (edit distance is a function of the
    // strings), and clone-mates within a group are pairwise distance 0
    // by identity — never re-verified. ADAPTIVE: one aggregate scan
    // decides whether any clone exists — a clone-free corpus skips the
    // mapping checkpoint and the two expansion joins entirely (pure
    // overhead there, ~0.5 s at sf0.1, measured round 8), so the
    // collapse only runs where it pays.
    val bcn = blockCols
    val groups = allKeys.groupBy(bc :+ col("__s"): _*)
      .agg(min(col("__id")).as("__rep"), count(lit(1)).as("__n"))
      .localCheckpoint(true)
    val hasClones = !groups.filter(col("__n") > 1).isEmpty
    val mapping = if (!hasClones) null
    else allKeys
      .join(groups.drop("__n"), bcn :+ "__s")
      .select(bc :+ col("__id") :+ col("__rep"): _*)
      .localCheckpoint(true)
    val keys = if (!hasClones) allKeys
    else groups.select(bc :+ col("__rep").as("__id") :+ col("__s"): _*)

    val segs = keys.select(bc ++ Seq(col("__id").as("id_a"),
        col("__s").as("head_a"),
        explode(array(sch.map { case (i, start, l) =>
          struct(lit(i).as("i"), substring(col("__s"), start, l).as("piece"))
        }: _*)).as("g")): _*)
      .select(bc ++ Seq(col("id_a"), col("head_a"),
        col("g.i"), col("g.piece")): _*)

    // array_distinct: repeated text can make two shift positions yield
    // the same (i, piece) probe — dedup before the join, not after
    val subs = keys.select(bc ++ Seq(col("__id").as("id_b"),
        col("__s").as("head_b"),
        explode(array_distinct(array((for {
          (i, start, l) <- sch
          p <- math.max(1, start - shift(k)) to
            math.min(len - l + 1, start + shift(k))
        } yield struct(lit(i).as("i"),
          substring(col("__s"), p, l).as("piece"))): _*))).as("g")): _*)
      .select(bc ++ Seq(col("id_b"), col("head_b"),
        col("g.i"), col("g.piece")): _*)

    // SIZE THE CANDIDATE PIPELINE FROM THE DATA (r15 opt, the
    // fuzzyPairs recipe): candidate bytes are small — a few MB of
    // (id, head) rows even when weak 2-3-char segments collide into
    // ~|block|²-order candidates — so AQE's byte-based coalescing ran
    // the collision join, the pair distinct AND the banded-DP verify
    // in ONE task (measured 5.7 s + 1.6 s single-task stages on the
    // 10× scale corpus). Pin the join and the verify exchanges at a
    // width derived from the key count; inert at real scale where the
    // bytes grow past AQE's advisory size anyway.
    val sessionParts =
      df.sparkSession.sparkContext.defaultParallelism.toLong
    val nKeys = // coalesce: no key has length == len → sum is NULL
      if (hasClones) groups.count() // (r16 advice; nKeys = 0 clamps
      else groups.agg(coalesce(sum(col("__n")), lit(0L))) // parts to
        .head().getLong(0) // sessionParts and the joins run empty)
    val parts = math.min(math.max(sessionParts,
      nKeys * (k + 1) * (k + 1) / 25000L), 200000L).toInt
    val jk = bc ++ Seq(col("i"), col("piece"))
    val repPairs = segs.repartition(parts, jk: _*)
      .join(subs.repartition(parts, jk: _*), blockCols ++ Seq("i", "piece"))
      .filter(col("id_a") < col("id_b"))
      .select(blockCols ++ Seq("id_a", "head_a", "id_b", "head_b") map col: _*)
      .distinct() // a pair can collide on several segments — verify once
      .repartition(parts, col("id_a"), col("id_b"))
      .withColumn("dist",
        levenshtein(col("head_a"), col("head_b"), k).cast("long"))
      .filter(col("dist") >= 0)
      .select(blockCols ++ Seq("id_a", "id_b", "dist") map col: _*)

    if (!hasClones) repPairs
    else expandClonePairs(repPairs, mapping, blockCols)
  }

  /** Expansion half of the exact-clone collapse: rep pairs → member
    * cross products at the verified distance (groups are disjoint, so
    * each member pair arises from exactly one rep pair — no distinct
    * needed); clone-mates within a group are distance 0 by identity.
    * Output-bound by construction: the joins emit exactly the result
    * rows, no verify rides along. `mapping` carries
    * (blockCols..., __id, __rep). */
  private def expandClonePairs(repPairs: DataFrame, mapping: DataFrame,
                               blockCols: Seq[String]): DataFrame = {
    val bc = blockCols.map(col)
    val ma = mapping.select(bc :+ col("__rep").as("id_a") :+
      col("__id").as("__xa"): _*)
    val mb = mapping.select(bc :+ col("__rep").as("id_b") :+
      col("__id").as("__xb"): _*)
    val cross = repPairs
      .join(ma, blockCols :+ "id_a").join(mb, blockCols :+ "id_b")
      .select(bc ++ Seq(least(col("__xa"), col("__xb")).as("id_a"),
        greatest(col("__xa"), col("__xb")).as("id_b"), col("dist")): _*)
    val intra = mapping.select(bc :+ col("__rep") :+
        col("__id").as("id_a"): _*)
      .join(mapping.select(bc :+ col("__rep") :+
        col("__id").as("id_b"): _*), blockCols :+ "__rep")
      .filter(col("id_a") < col("id_b"))
      .select(bc ++ Seq(col("id_a"), col("id_b"),
        lit(0L).as("dist")): _*)
    cross.unionByName(intra)
  }

  /** Variable-length PassJoin self-join: every (id_a, id_b, dist) pair
    * with levenshtein ≤ `k` over keys of ANY length, no blocking key.
    *
    * Shape: the per-length segment schemes are DRIVER-ENUMERATED into
    * two literal tables — the length DOMAIN is bounded by the key
    * width (distinct lengths ≤ max chars, a few dozen for head keys),
    * never by corpus size — and broadcast-joined against the rows, so
    * each row picks its own scheme with `Column.substr` arithmetic.
    * The index side emits its k+1 segments keyed (own length, segment
    * index, bytes); the probe side emits, for every indexable length
    * l within ±k of its own length m, the segment windows of
    * scheme(l, k) slid by the drift-refined bound (Δ = m − l: an
    * optimal script has ≤ ⌊(k−Δ)/2⌋ deletes and ≤ ⌊(k+Δ)/2⌋ inserts,
    * so an untouched segment shifts at most that far left/right —
    * equal lengths recover the fixed form's ±⌊k/2⌋). The join key
    * (l, i, piece) is high-cardinality; fan-out per row is a CONSTANT
    * (≤ (2k+1)·(k+1) windows of ≤ 2k+1 positions), so candidate
    * generation is a plain shuffle join at any corpus size. Candidate
    * rows carry only ids — texts join back AFTER the pair distinct
    * for exactly one banded-DP verify per pair.
    *
    * Keys shorter than k+1 characters can't host k+1 non-empty
    * segments, so the pigeonhole doesn't apply — their pairs (partner
    * length ≤ 2k, since distance ≥ length difference) go through a
    * broadcast length-band join over the `len ≤ k` side instead:
    * nothing is dropped, and that side is degenerate-tiny for any
    * real key geometry (its value space is at most |Σ|^k). */
  /** NOTE on clone collapse: [[fixedLenSelfJoin]] collapses identical
    * keys before candidate generation (measured 24-50× at 10× on the
    * clone corpus); this variable-length form deliberately does NOT —
    * its declared workload's key geometry (head width modulated by the
    * doc id) de-clones even byte-identical documents by construction,
    * so the collapse found nothing while its groupBy + expansion joins
    * cost ~2× on every corpus (measured round 8, then reverted). A
    * caller whose variable-length keys DO repeat can pre-collapse with
    * the same pattern. */
  def selfJoin(df: DataFrame, idCol: String, strCol: String, k: Int,
               maxDistinctLengths: Int = 4096): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(idCol).as("__id"), col(strCol).as("__s"),
      length(col(strCol)).as("__len"))
    val lens = keys.select("__len").distinct().as[Int].collect().toSeq.sorted
    require(lens.length <= maxDistinctLengths,
      s"${lens.length} distinct key lengths exceed $maxDistinctLengths — " +
        "not a bounded-width key column")
    val mains = lens.filter(_ >= k + 1)

    val segDf = (for {
      l <- mains
      (i, start, slen) <- scheme(l, k)
    } yield (l, i, start, slen)).toDF("__len", "i", "start", "slen")
    val probeDf = (for {
      m <- mains
      l <- mains if math.abs(l - m) <= k
      delta = m - l
      (i, start, slen) <- scheme(l, k)
      p <- math.max(1, start - (k - delta) / 2) to
        math.min(m - slen + 1, start + (k + delta) / 2)
    } yield (m, l, i, p, slen)).toDF("__len", "l", "i", "p", "slen")

    val index = keys.join(broadcast(segDf), Seq("__len"))
      .select(col("__len").as("l"), col("i"),
        col("__s").substr(col("start"), col("slen")).as("piece"),
        col("__id").as("id_a"))
    val probe = keys.join(broadcast(probeDf), Seq("__len"))
      .select(col("l"), col("i"),
        col("__s").substr(col("p"), col("slen")).as("piece"),
        col("__id").as("id_b"))
      .distinct() // overlapping windows over repeated text re-emit probes
    val mainPairs = index.join(probe, Seq("l", "i", "piece"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))

    val shortA = keys.filter(col("__len") <= k)
      .select(col("__id").as("id_a"), col("__len").as("len_a"))
    val shortB = keys.filter(col("__len") <= 2 * k)
      .select(col("__id").as("id_b"), col("__len").as("len_b"))
    val shortPairs = broadcast(shortA).join(shortB,
        col("id_a") =!= col("id_b") &&
          abs(col("len_a") - col("len_b")) <= k)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))

    val sA = keys.select(col("__id").as("id_a"), col("__s").as("__sa"))
    val sB = keys.select(col("__id").as("id_b"), col("__s").as("__sb"))
    // main (both lengths ≥ k+1) and short (one length ≤ k) pairs are
    // disjoint by construction — union, dedup collisions, verify once
    mainPairs.unionByName(shortPairs)
      .distinct()
      .join(sA, "id_a").join(sB, "id_b")
      .withColumn("dist",
        levenshtein(col("__sa"), col("__sb"), k).cast("long"))
      .filter(col("dist") >= 0)
      .select("id_a", "id_b", "dist")
  }
}
