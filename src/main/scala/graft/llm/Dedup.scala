package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [NORTH-STAR] Deduplication operators for training-data curation
  * (BASELINE.json mandate): exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * and embedding-cosine near-dup.
  *
  * Scale design (100 TB): every variant is candidate-generation by
  * LSH-bucket shuffle + within-bucket verification — never an O(n²)
  * all-pairs join. The only shuffles are (a) groupBy content-key for
  * exact dedup, (b) the explode+groupBy on (band, bucket) for LSH, and
  * (c) the bucket-equality self-join for verification, all of which
  * partition on high-cardinality keys and therefore spread evenly.
  * Signature computation is per-row Column expressions (codegen, no UDF).
  */
object Dedup {

  // ------------------------------------------------------------- exact ----

  /** N1 — exact dedup: keep the lowest id per content fingerprint.
    * groupBy(hash) rather than dropDuplicates so the survivor is
    * deterministic (dropDuplicates keeps an arbitrary row). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextOps.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  // ---------------------------------------------------------- shingles ----

  /** Word n-gram shingles (distinct), the unit set for Jaccard. String
    * form, for inspection/tests; the pipeline uses the codegen'd hashed
    * form (graft.functions.ShingleHashes) — hashes are 8 bytes instead
    * of n words and hash-set semantics are identical up to 64-bit
    * collisions. */
  def shingles(text: Column, n: Int): Column =
    array_distinct(TextOps.ngrams(text, n))

  /** Hashed shingle set of a text column (codegen'd; requires
    * VectorFunctions.register on the session). */
  def shingleHashSet(text: Column, n: Int): Column =
    graft.functions.VectorFunctions.shingleHashes(TextOps.tokens(text), n)

  /** Exact Jaccard similarity of two shingle-set columns, scaled to 1e4
    * integer for deterministic comparison. */
  def jaccardE4(a: Column, b: Column): Column =
    round(lit(10000.0) * size(array_intersect(a, b)) /
      size(array_union(a, b))).cast("long")

  // ----------------------------------------------------------- MinHash ----

  /** Banded bucket keys over a MinHash signature column: one
    * struct(band, bucket) per band, bucket = hash of the band's signature
    * lanes. THE single definition of band geometry — the batch pipeline
    * (minhashBands) and the streaming dedup (StreamingDedup.bandRows)
    * must bucket identically or the same document lands in different
    * buckets across the two. Requires bands to divide numHashes exactly:
    * silently dropping the remainder lanes would pay for signatures the
    * bucketing never uses and deliver less recall than configured. */
  def bandBuckets(sig: Column, numHashes: Int, bands: Int): Column = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes) exactly — " +
        s"${numHashes % bands} signature lanes would be silently unused")
    val rows = numHashes / bands
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(lit(b) +: (b * rows until (b + 1) * rows)
          .map(i => element_at(sig, i + 1)): _*).as("bucket"))
    }: _*)
  }

  /** Banded LSH rows: one output row per (doc, band) with the band's
    * bucket key — the shuffle key for candidate generation. Signature
    * computation is the codegen'd ShingleHashes + MinHashSig pair
    * (promoted from higher-order expressions after BENCH showed
    * interpreted-lambda overhead at ~0.5 ms/doc dominating dedup). */
  def minhashBands(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, numHashes: Int = 16,
                   bands: Int = 8): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    df.select(col(idCol), shingleHashSet(col(textCol), shingleN).as("sh"))
      .select(col(idCol),
        graft.functions.VectorFunctions.minhashSig(col("sh"), numHashes).as("sig"))
      .select(col(idCol),
        explode(bandBuckets(col("sig"), numHashes, bands)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
  }

  /** Default giant-bucket cap: a bucket wider than this is split before
    * pair explosion. 256 keeps per-sub-bucket pair counts ≤ ~32k while
    * leaving every realistic LSH bucket (a handful of docs) untouched. */
  val DefaultMaxBucket = 256

  /** The giant-bucket guard: buckets wider than `maxBucket` are split by
    * a secondary hash of the doc id into ~maxBucket-sized sub-buckets
    * BEFORE pair explosion, turning a degenerate bucket's O(b²) pair
    * blowup (empty/boilerplate texts all hash identically) into
    * O(b·maxBucket). Buckets at or under the cap keep `sub = 0`, so
    * normal pairs and recall are untouched; the only pairs traded away
    * straddle sub-buckets of a giant bucket. The window's count
    * partitions on the bucket key the downstream groupBy/join uses, so
    * the cap rides the shuffle that stage already pays (a skewed count
    * partition is linear in b, not quadratic).
    *
    * WHEN the trade is sound depends on the bucket KEY SPACE. MinHash
    * band buckets are 64-bit signature hashes: an over-cap bucket can
    * only be ≥cap IDENTICAL signatures (random 64-bit collisions are
    * negligible at any corpus size), i.e. genuinely degenerate
    * boilerplate whose members are mutual dups — splitting loses
    * nothing a dedup cares about, so the cap defaults ON there. SimHash
    * chunk keys (16-bit) and hyperplane buckets (2^planes) are SMALL
    * key spaces: at corpus scale every bucket fills with thousands of
    * UNRELATED members, over-cap is routine, and splitting would drop
    * genuine near-dup pairs wholesale — the cap defaults OFF there
    * (pass a cap explicitly when boilerplate skew is the known hazard;
    * the scale lever for those generators is more chunks/planes).
    *
    * `maxBucket = Int.MaxValue` disables the cap entirely — no window,
    * no sort, `sub` pinned to 0. */
  private[llm] def withBucketCap(df: DataFrame, keyCols: Seq[String],
                                 idCol: String, maxBucket: Int): DataFrame = {
    require(maxBucket > 1, s"maxBucket must be > 1, got $maxBucket")
    if (maxBucket == Int.MaxValue) return df.withColumn("sub", lit(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    df.withColumn("_bn", count(lit(1)).over(w))
      .withColumn("sub",
        when(col("_bn") <= maxBucket, lit(0L))
          .otherwise(pmod(xxhash64(col(idCol)),
            ceil(col("_bn").cast("double") / maxBucket).cast("long"))))
      .drop("_bn")
  }

  /** Candidate pairs from banded LSH rows: group by (band, bucket),
    * emit all in-bucket pairs. One evaluation of the signature pipeline
    * and one shuffle — the self-join formulation evaluates the pipeline
    * once per join side. Pathological buckets are width-capped by
    * [[withBucketCap]]; the groupBy key gains the `sub` column, which
    * Catalyst satisfies with the window's (band, bucket) partitioning —
    * no extra exchange. */
  private def bucketPairs(bandsDf: DataFrame, idCol: String,
                          maxBucket: Int = DefaultMaxBucket): DataFrame =
    withBucketCap(bandsDf, Seq("band", "bucket"), idCol, maxBucket)
      .groupBy(col("band"), col("bucket"), col("sub"))
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))), y =>
          struct(least(x, y).as("id_a"), greatest(x, y).as("id_b"))))))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()

  /** N2 — MinHash+LSH near-dup candidate pairs, verified with exact
    * Jaccard ≥ `minJaccardE4` over the hashed shingle sets. Returns
    * (id_a, id_b, jaccard_e4), id_a < id_b. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, numHashes: Int = 16,
                      bands: Int = 8, minJaccardE4: Long = 7000,
                      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val candidates =
      bucketPairs(minhashBands(df, idCol, textCol, shingleN, numHashes, bands),
        idCol, maxBucket)
    val sh = df.select(col(idCol),
      shingleHashSet(col(textCol), shingleN).as("sh"))
    candidates
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        jaccardE4(col("sh_a"), col("sh_b")).as("jaccard_e4"))
      .filter(col("jaccard_e4") >= minJaccardE4)
  }

  /** Adaptive exact-clone grouping shared by the LINEAR-OUTPUT dedup
    * consumers ([[minhashDedup]], [[Cluster.dupClusters]]) — the
    * EditJoin / knnGraph precedent, motivated here by the round-9
    * sf5/sf10 probes: a corpus with clone multiplicity m pays C(m,2)
    * verified pairs per duplicated text in [[minhashNearDups]] (the
    * 50/100-wide probe clone groups sit UNDER the 256 giant-bucket
    * cap, so nothing bounds them), measured 15 → 57 s warm2 for 2×
    * data on `llm_dedup_clusters`. Survivors and cluster rows are
    * linear in documents, so those consumers derive their answers
    * from the REP-level pair graph + group membership and never
    * materialize the quadratic intermediate. The pair-emitting API
    * itself stays uncollapsed: its output IS the pair set (intra-clone
    * pairs are real J=1.0 near-dup pairs), and its degenerate-bucket
    * behavior is the giant-bucket cap contract LlmSpec pins.
    *
    * ADAPTIVE, with a MATERIALITY threshold: the gate reads one
    * checkpointed (id, fingerprint) projection — one corpus scan, a
    * 24-byte-per-row shuffle — and collapses only when the clone pair
    * mass Σ C(n_g, 2) exceeds the corpus size, i.e. when the direct
    * path's pair graph would be superlinear in documents. Incidental
    * duplication (sf0.1 testdata carries 8 duplicate texts in 5000 —
    * measured when the any-clone draft of this gate fired there and
    * put the collapse's extra join rounds on the benched path for a
    * sub-corpus-sized pair graph) stays on the original single-plan
    * path, as does every driver verify SF (clone-free, so oracle
    * outputs are bit-identical). Identity is the content fingerprint,
    * the same md5 equivalence [[exact]] already rests on. Returns
    * (groups: __fp, __rep, __n; mapping: __id, __rep; both null below
    * the threshold). */
  private[llm] def cloneGroups(df: DataFrame, idCol: String,
                               textCol: String): (DataFrame, DataFrame, Boolean) = {
    // ONE pass over the texts: checkpoint the (id, fp) projection so the
    // gate aggregates, the grouped table, and the membership mapping all
    // read the 24-byte rows, never the corpus again
    val keyed = df
      .select(col(idCol), TextOps.fingerprint(col(textCol)).as("__fp"))
      .localCheckpoint(true)
    // r15 opt: ONE driver probe instead of two — n, the distinct count
    // and the clone pair mass all derive from the grouped table, so the
    // former keyed-level aggregate job is folded into this one
    val groups = keyed.groupBy(col("__fp"))
      .agg(min(col(idCol)).as("__rep"), count(lit(1)).as("__n"))
      .localCheckpoint(true)
    // coalesce: on an EMPTY corpus both sums are NULL (r16 advice —
    // getLong would NPE where the pre-fold two-probe form returned
    // (null, null, false)); n = d = 0 then takes the clone-free exit
    val probe = groups.agg(
      coalesce(sum(col("__n")), lit(0L)).as("n"), count(lit(1)).as("d"),
      coalesce(sum(col("__n") * (col("__n") - 1) / 2).cast("long"),
        lit(0L)).as("mass")).head()
    if (probe.getLong(0) == probe.getLong(1)) return (null, null, false)
    if (probe.getLong(2) <= probe.getLong(0)) return (null, null, false)
    val mapping = keyed
      .join(groups.select(col("__fp"), col("__rep")), Seq("__fp"))
      .select(col(idCol).as("__id"), col("__rep"))
    (groups, mapping, true)
  }

  /** N2' — the dedup *result*: drop the higher-id member of every verified
    * near-dup pair (plus exact dups), keep the rest.
    *
    * Clone-heavy corpora go through [[cloneGroups]]: verified pairs are
    * computed over one representative per distinct text and the loser
    * set derives group-level — a member x loses iff a VERIFIED pair
    * would rank it second, i.e. iff the min rep adjacent to x's group
    * is < x (every member of the adjacent group ≥ its rep pairs with x),
    * or x is a non-rep member of a clone group (clone-mates are J=1.0
    * partners: HashUtil.shingleHashes emits ≥1 shingle for ANY token
    * run, even empty, so identical texts always verify). Linear in
    * documents at any clone multiplicity; at the driver SFs the gate
    * is off and the plan is the original one. */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (groups, mapping, hasClones) = cloneGroups(df, idCol, textCol)
    if (!hasClones) {
      val losers = minhashNearDups(df, idCol, textCol)
        .select(col("id_b").as(idCol)).distinct()
      df.join(losers, Seq(idCol), "left_anti")
    } else {
      val reps = df.join(groups.select(col("__rep").as(idCol)), Seq(idCol))
        .select(col(idCol), col(textCol))
      val repPairs = minhashNearDups(reps, idCol, textCol)
        .select("id_a", "id_b")
      val minAdj = repPairs.select(col("id_a").as("__rep"), col("id_b").as("__o"))
        .unionByName(repPairs.select(col("id_b").as("__rep"), col("id_a").as("__o")))
        .groupBy("__rep").agg(min(col("__o")).as("__minadj"))
      val cloned = groups.filter(col("__n") > 1)
        .select(col("__rep"), lit(true).as("__cl"))
      val losers = mapping.join(minAdj, Seq("__rep"), "left")
        .join(cloned, Seq("__rep"), "left")
        .filter((col("__minadj").isNotNull && col("__minadj") < col("__id")) ||
          (col("__cl").isNotNull && col("__id") > col("__rep")))
        .select(col("__id").as(idCol)).distinct()
      df.join(losers, Seq(idCol), "left_anti")
    }
  }

  // ----------------------------------------------------------- SimHash ----

  /** 64-bit SimHash over a pre-projected token-hash array — the
    * interpreted higher-order reference form (64 `aggregate` lambdas).
    * Kept as the executable specification the codegen'd
    * graft.functions.SimHashSig is spec-proven bit-identical to; the
    * pipelines below use the compiled form (one pass, not 64). */
  def simhashOfHashes(hashes: Column): Column = {
    val n = size(hashes)
    (0 until 64).map { i =>
      val ones = aggregate(hashes, lit(0),
        (acc, h) => acc + shiftrightunsigned(h, i)
          .bitwiseAND(lit(1L)).cast("int"))
      when(ones * 2 > n, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** (id, simhash) per document: tokenize+hash once, then the codegen'd
    * one-pass signature (graft.functions.SimHashSig). */
  def simhashSigs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    df.select(col(idCol),
      transform(TextOps.tokens(col(textCol)), t => xxhash64(t)).as("th"))
      .select(col(idCol),
        graft.functions.VectorFunctions.simhashSig(col("th")).as("sig"))
  }

  /** Convenience single-column form (requires VectorFunctions.register
    * on the session). */
  def simhash(text: Column): Column =
    graft.functions.VectorFunctions.simhashSig(
      transform(TextOps.tokens(text), t => xxhash64(t)))

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** N2'' — SimHash near-dup pairs with hamming ≤ maxDist. Candidate
    * generation by the pigeonhole principle: split the signature into
    * (maxDist+1) chunks; any pair within maxDist matches exactly on at
    * least one chunk, so the self-join keys on (chunk_idx, chunk_value)
    * — same LSH-bucket shape as MinHash, no all-pairs. The bucket cap
    * defaults OFF here: capping a 16-bit chunk-key space breaks the
    * pigeonhole completeness guarantee (see withBucketCap). */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxDist: Int = 3,
                      maxBucket: Int = Int.MaxValue): DataFrame = {
    val chunks = maxDist + 1
    val bits = 64 / chunks
    val sigs = simhashSigs(df, idCol, textCol)
    val banded = withBucketCap(
      sigs.select(col(idCol), col("sig"), explode(
        array((0 until chunks).map { c =>
          struct(lit(c).as("chunk"),
            shiftrightunsigned(col("sig"), c * bits)
              .bitwiseAND(lit((1L << bits) - 1)).as("ckey"))
        }: _*)).as("cb"))
        .select(col(idCol), col("sig"), col("cb.chunk"), col("cb.ckey")),
      Seq("chunk", "ckey"), idCol, maxBucket)
    val a = banded.select(col(idCol).as("id_a"), col("sig").as("sig_a"),
      col("chunk"), col("ckey"), col("sub"))
    val b = banded.select(col(idCol).as("id_b"), col("sig").as("sig_b"),
      col("chunk"), col("ckey"), col("sub"))
    a.join(b, Seq("chunk", "ckey", "sub"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming(col("sig_a"), col("sig_b")).as("dist"))
      // threshold BEFORE the dedup shuffle: far pairs that merely share
      // one chunk (the majority at scale) never enter the exchange; a
      // pair's (id_a, id_b, dist) is identical across chunks, so the
      // filter/distinct order cannot change the result
      .filter(col("dist") <= maxDist)
      .distinct()
  }

  // ------------------------------------------------------ n-gram Jaccard --

  /** N2''' — n-gram Jaccard near-dup: LSH-candidates (reusing the MinHash
    * bands — the honest scale path; a direct all-pairs Jaccard is O(n²))
    * re-verified with exact shingle Jaccard at a caller threshold. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, minJaccardE4: Long = 8000): DataFrame =
    minhashNearDups(df, idCol, textCol, shingleN,
      numHashes = 16, bands = 8, minJaccardE4 = minJaccardE4)

  // ------------------------------------------- embedding cosine near-dup --

  /** N2'''' — embedding near-dup: random-hyperplane LSH buckets (see
    * SimSearch.hyperplaneSignature) + exact cosine verification. Pairs
    * with cosine ≥ minCosE6/1e6. The bucket cap defaults OFF here: the
    * 2^planes bucket space fills with unrelated members at corpus
    * scale, so capping would drop genuine pairs — add planes instead
    * (see withBucketCap). */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        planes: Int = 12, minCosE6: Long = 950000,
                        maxBucket: Int = Int.MaxValue): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    val sigs = withBucketCap(
      df.select(col(idCol),
        SimSearch.hyperplaneSignature(col(vecCol), planes).as("bucket"),
        col(vecCol).as("v")),
      Seq("bucket"), idCol, maxBucket)
    val a = sigs.select(col(idCol).as("id_a"), col("v").as("v_a"),
      col("bucket"), col("sub"))
    val b = sigs.select(col(idCol).as("id_b"), col("v").as("v_b"),
      col("bucket"), col("sub"))
    a.join(b, Seq("bucket", "sub"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        SimSearch.cosineE6(col("v_a"), col("v_b")).as("cos_e6"))
      .filter(col("cos_e6") >= minCosE6)
  }

  // ------------------------------------------- semantic dedup (SemDeDup) --

  /** Semantic dedup, cluster-scoped — the SemDeDup recipe (Abbas et al.
    * 2023, arXiv 2303.09540): assign every vector to its nearest
    * centroid, form candidate pairs WITHIN a cluster only, verify by
    * exact integer cosine, and drop the larger id of every verified
    * pair. The learned clusters replace [[embeddingNearDups]]'s
    * data-oblivious hyperplane buckets as the candidate generator:
    * cells follow the data's density, so the same pair budget buys more
    * recall — and the within-cluster scope is the published trade
    * (a pair straddling a cluster boundary is not a candidate; the two
    * operators bracket each other, LlmSpec).
    *
    * Scale shape (100 TB): assignment is corpus × broadcast(centroids)
    * (Ivf.assign — the corpus never shuffles for it); the pair join
    * shuffles on centroid_id, high-cardinality when k is sized to the
    * corpus (k ∝ n keeps per-cluster pair spaces constant — the
    * published deployments run 10⁴–10⁵ clusters). `maxCluster`
    * hash-subdivides pathological cells (the [[withBucketCap]] idiom)
    * so no task owns a quadratic blow-up; the split is by id hash, so
    * over-cap cells trade recall for the bound — size k so the cap
    * never engages, it is the guard rail, not the mechanism.
    *
    * Returns survivors as (idCol, centroid_id). */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
                    centroids: DataFrame, minCosE6: Long = 950000,
                    maxCluster: Int = Int.MaxValue): DataFrame = {
    graft.functions.VectorFunctions.register(emb.sparkSession)
    val assigned = Ivf.assign(emb, idCol, vecCol, centroids)
      .select(col(idCol), col("centroid_id"))
      .join(emb.select(col(idCol), col(vecCol).as("__v")), Seq(idCol))
    // EXACT-CLONE COLLAPSE (r7 sf1 probe finding: clone-heavy corpora —
    // the dedup target workload — made the cell pair join quadratic in
    // clone count). Byte-identical vectors in one cell are ONE pair
    // candidate: cos(clone, clone) = 1e6 ≥ any τ ≤ 1e6, so every
    // non-min clone is a dup by identity, and the min clone dominates
    // any pair its clones would have formed (same cosine, smaller id).
    // Pair enumeration then costs distinct-vectors², not rows².
    // Output-equivalent to the uncollapsed form (the naive-reference
    // spec pins it); for the degenerate τ > 1e6 nothing qualifies —
    // including clones — so the identity-drop is gated on τ.
    val grouped = assigned.groupBy(col("centroid_id"), col("__v"))
      .agg(min(col(idCol)).as("__rep"))
    val cloneDropped =
      if (minCosE6 > 1000000L)
        assigned.sparkSession.createDataFrame(
          assigned.sparkSession.sparkContext
            .emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(idCol,
              org.apache.spark.sql.types.LongType))))
      else assigned
        .join(grouped, Seq("centroid_id", "__v"))
        .filter(col(idCol) =!= col("__rep"))
        .select(col(idCol))
    val reps = grouped.select(col("__rep").as(idCol), col("__v"),
      col("centroid_id"))
    val cells = withBucketCap(reps, Seq("centroid_id"), idCol, maxCluster)
    val a = cells.select(col(idCol).as("id_a"), col("__v").as("v_a"),
      col("centroid_id"), col("sub"))
    val b = cells.select(col(idCol).as("id_b"), col("__v").as("v_b"),
      col("centroid_id"), col("sub"))
    val repDropped = a.join(b, Seq("centroid_id", "sub"))
      .filter(col("id_a") < col("id_b"))
      .filter(SimSearch.cosineE6(col("v_a"), col("v_b")) >= minCosE6)
      .select(col("id_b").as(idCol)).distinct()
    val dropped = cloneDropped.unionByName(repDropped).distinct()
    assigned.join(dropped, Seq(idCol), "left_anti")
      .select(col(idCol), col("centroid_id"))
  }

  // --------------------------------------------------- incremental ----

  /** Incremental EXACT dedup — the growing-corpus shape: a new ingest
    * batch is checked against the fingerprint INDEX of everything
    * already accepted, then within itself; the accepted corpus is
    * never re-deduped. Cost ∝ batch: the index side is one anti-join
    * probe keyed on `fp` (riding the index table's fp-bucketed layout
    * at scale), old-vs-old work never happens. Returns the surviving
    * batch rows (all columns); their fingerprints are the index delta
    * the caller appends for the next batch. */
  def incrementalExact(batch: DataFrame, indexFps: DataFrame,
                       idCol: String, textCol: String): DataFrame = {
    val fpd = batch.withColumn("__fp", TextOps.fingerprint(col(textCol)))
    val fresh = fpd.join(
      indexFps.select(col("fp").as("__fp")).distinct(), Seq("__fp"), "left_anti")
    val winners = fresh.groupBy(col("__fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(col("__fp"), col(idCol))
    fresh.join(winners, Seq("__fp", idCol), "left_semi").drop("__fp")
  }

  /** Incremental NEAR-dup pairs — every verified pair with at least one
    * member in the new batch. The index is the corpus's banded LSH rows
    * (`minhashBands` output, persisted once per accepted doc); the
    * batch's bands semi-join it to pull ONLY the buckets the batch
    * touches, so pair formation and verification are bounded by the
    * batch's bucket footprint — old-vs-old pairs are never formed and
    * the corpus text is read only for the implicated ids (a bounded
    * id-keyed join against `corpusTexts`, which must NOT contain the
    * batch). Same LSH params as the index build; a bucket is only ever
    * SMALLER here than in the full run, so the cap can't split a pair
    * the full run kept. */
  def incrementalNearDups(batch: DataFrame, indexBands: DataFrame,
                          corpusTexts: DataFrame,
                          idCol: String, textCol: String,
                          shingleN: Int = 3, numHashes: Int = 16,
                          bands: Int = 8, minJaccardE4: Long = 7000,
                          maxBucket: Int = DefaultMaxBucket): DataFrame =
    // staged once: the band rows feed BOTH the touched-bucket probe and
    // the pair-formation union — without the checkpoint the batch would
    // be shingled+signed twice (batch-sized, so the stage is bounded)
    incrementalNearDupsWithBands(
      minhashBands(batch, idCol, textCol, shingleN, numHashes, bands)
        .localCheckpoint(),
      batch, indexBands, corpusTexts, idCol, textCol, shingleN,
      minJaccardE4, maxBucket)

  /** [[incrementalNearDups]] with the batch's band rows PRE-COMPUTED
    * (and already staged) by the caller — the streaming flow computes
    * them once per micro-batch and reuses them for the index append,
    * instead of re-shingling the survivors (r16; the signature pass
    * was the measured per-batch cost of the stream_near_dedup drain).
    * `bBands` must be `minhashBands(batch, …)` under the same LSH
    * geometry as `indexBands`. */
  private[graft] def incrementalNearDupsWithBands(
      bBands: DataFrame, batch: DataFrame, indexBands: DataFrame,
      corpusTexts: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, minJaccardE4: Long = 7000,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val touched = bBands.select(col("band"), col("bucket")).distinct()
    val rows = bBands.withColumn("is_new", lit(true)).unionByName(
      indexBands.select(col(idCol), col("band"), col("bucket"))
        .join(touched, Seq("band", "bucket"), "left_semi")
        .withColumn("is_new", lit(false)))
    val pairs = withBucketCap(rows, Seq("band", "bucket"), idCol, maxBucket)
      .groupBy(col("band"), col("bucket"), col("sub"))
      .agg(array_sort(collect_list(struct(col(idCol), col("is_new"))))
        .as("ms"))
      .filter(size(col("ms")) > 1)
      .select(explode(flatten(transform(col("ms"), (x, i) =>
        transform(slice(col("ms"), i + 2, size(col("ms"))), y =>
          struct(x(idCol).as("id_a"), y(idCol).as("id_b"),
            (x("is_new") || y("is_new")).as("any_new"))))))
        .as("p"))
      .filter(col("p.any_new"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
    val implicated = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as(idCol)).distinct()
    val sh = corpusTexts.select(col(idCol), col(textCol))
      .unionByName(batch.select(col(idCol), col(textCol)))
      .join(implicated, Seq(idCol), "left_semi")
      .select(col(idCol), shingleHashSet(col(textCol), shingleN).as("sh"))
    pairs
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        jaccardE4(col("sh_a"), col("sh_b")).as("jaccard_e4"))
      .filter(col("jaccard_e4") >= minJaccardE4)
  }

  /** Incremental near-dedup RESULT: the batch rows that survive against
    * the accepted corpus and lower-id batch members. Loser rule, given
    * pairs are ordered (id_a < id_b) and every pair has a batch member:
    * a batch id_b always loses (its partner is a corpus doc or a
    * lower-id batch doc); a batch id_a loses only to a corpus partner.
    * The pair table is staged once (bounded by the batch's bucket
    * footprint) so the two loser branches don't recompute the LSH. */
  def incrementalNearDedup(batch: DataFrame, indexBands: DataFrame,
                           corpusTexts: DataFrame,
                           idCol: String, textCol: String): DataFrame =
    incrementalNearDedupFrom(
      incrementalNearDups(batch, indexBands, corpusTexts, idCol, textCol),
      batch, idCol)

  /** The loser-rule half of [[incrementalNearDedup]], given the
    * verified pair table (so a caller with pre-computed batch bands
    * composes [[incrementalNearDupsWithBands]] with this). */
  private[graft] def incrementalNearDedupFrom(
      nearDups: DataFrame, batch: DataFrame, idCol: String): DataFrame = {
    val batchIds = batch.select(col(idCol))
    val pairs = nearDups.localCheckpoint()
    val losers = pairs
      .join(batchIds.select(col(idCol).as("id_b")), Seq("id_b"), "left_semi")
      .select(col("id_b").as(idCol))
      .unionByName(pairs
        .join(batchIds.select(col(idCol).as("id_a")), Seq("id_a"), "left_semi")
        .join(batchIds.select(col(idCol).as("id_b")), Seq("id_b"), "left_anti")
        .select(col("id_a").as(idCol)))
      .distinct()
    batch.join(losers, Seq(idCol), "left_anti")
  }
}
