package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [NORTH-STAR] Byte-pair-encoding subword tokenizer — trained and
  * applied as a distributed operator (no reference counterpart; the
  * reference's text surface stops at JSON assembly,
  * storedprocedure.sql:51). This is the real merge-table algorithm, not
  * the regex approximation in [[TextOps.bpeTokenCount]] (which remains
  * the cheap pre-tokenizer/count heuristic).
  *
  * Scale shape (the standard corpus-scale BPE recipe): the corpus is
  * touched exactly ONCE — a pre-tokenize + word-count shuffle — and
  * every training iteration runs over the word-TYPE vocabulary
  * (wcount-weighted), which is orders of magnitude smaller than the
  * corpus and independent of corpus growth once the type inventory
  * saturates (Heaps' law). Encoding likewise never loops over the
  * corpus: the merge list replays on the distinct-word dictionary
  * (vocab-sized higher-order maps), and documents join their per-doc
  * word counts to the finished word→pieces dictionary — one
  * high-cardinality join on the word key, no UDFs anywhere, every step
  * a codegen'd Column expression.
  */
object Bpe {

  /** The pre-tokenizer: runs of letters, runs of digits, or a single
    * other non-space symbol — shared with [[TextOps.bpeTokenCount]] so
    * the heuristic count and the real tokenizer segment identically. */
  val preTokRe = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  private def words(text: Column): Column =
    regexp_extract_all(text, lit(preTokRe), lit(0))

  /** Seed symbolization: one single-character symbol per codepoint.
    * (split(word, "") is avoided — its empty-trailing behavior differs
    * across Spark versions; substring is unambiguous.) */
  private val charSyms: Column =
    expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")

  /** Adjacent symbol pairs of one round, overlapping, per occurrence —
    * the Sennrich get_stats contract. Guarded: sequence(1, 0) in Spark
    * DESCENDS, so single-symbol words must short-circuit to []. */
  private val adjacentPairs: Column =
    when(size(col("syms")) < 2, expr("array()"))
      .otherwise(expr(
        "transform(sequence(1, size(syms) - 1)," +
          " i -> struct(syms[i - 1] AS a, syms[i] AS b))"))

  /** One merge (a, b) → ab applied to a symbol array: greedy
    * left-to-right, non-overlapping, and the minted symbol does not
    * re-merge within the same step — the standard BPE replace. Pure
    * higher-order fold with (out, pending) state; stays in codegen. */
  def applyMerge(syms: Column, a: String, b: String): Column = {
    val init = struct(
      expr("CAST(array() AS array<string>)").as("out"),
      lit(null).cast("string").as("pend"))
    val emit = (acc: Column) => concat(acc.getField("out"),
      array(acc.getField("pend")))
    aggregate(syms, init,
      (acc, x) =>
        when(acc.getField("pend").isNull,
          struct(acc.getField("out").as("out"), x.as("pend")))
          .when(acc.getField("pend") === lit(a) && x === lit(b),
            struct(concat(acc.getField("out"), array(lit(a + b))).as("out"),
              lit(null).cast("string").as("pend")))
          .otherwise(struct(emit(acc).as("out"), x.as("pend"))),
      acc => when(acc.getField("pend").isNull, acc.getField("out"))
        .otherwise(emit(acc)))
  }

  /** (word, wcount) vocabulary — the one corpus-wide pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcount"))

  final case class Merge(rank: Int, left: String, right: String,
      merged: String, pairCount: Long)

  /** Train up to `k` merges. Per round: wcount-weighted adjacent-pair
    * counts (ONE shuffle on the pair key — high-cardinality, even
    * spread), deterministic argmax (count desc, pair asc — ties can
    * never flip across engines), then the merge mapped over the vocab
    * arrays. localCheckpoint each round keeps the lineage flat (the
    * pointer-jumping precedent, [[Cluster]]); the driver holds only the
    * k merge rows and the per-round 1-row argmax. Stops early when no
    * pair reaches `minCount`. */
  def train(docs: DataFrame, textCol: String, k: Int,
      minCount: Long = 2L): (Seq[Merge], DataFrame) = {
    var vocab = wordCounts(docs, textCol)
      .withColumn("syms", charSyms)
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    var rank = 0
    while (rank < k && !done) {
      val top = vocab
        .select(col("wcount"), explode(adjacentPairs).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wcount")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getAs[Long]("cnt") < minCount) done = true
      else {
        val (a, b) = (top(0).getAs[String]("a"), top(0).getAs[String]("b"))
        merges += Merge(rank, a, b, a + b, top(0).getAs[Long]("cnt"))
        vocab = vocab
          .withColumn("syms", applyMerge(col("syms"), a, b))
          .localCheckpoint(true)
        rank += 1
      }
    }
    (merges.toSeq, vocab)
  }

  /** word → pieces dictionary: the merge list replayed IN RANK ORDER
    * over the distinct-word table. Checkpointed every 8 merges so the
    * nested-fold expression tree stays inside codegen limits. */
  def dictionary(docs: DataFrame, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    var dict = docs.select(explode(words(col(textCol))).as("word"))
      .distinct()
      .withColumn("syms", charSyms)
    merges.zipWithIndex.foreach { case (m, i) =>
      dict = dict.withColumn("syms", applyMerge(col("syms"), m.left, m.right))
      if ((i + 1) % 8 == 0) dict = dict.localCheckpoint(true)
    }
    dict
  }

  /** Encode: per-document piece totals via the dictionary join. The
    * corpus side pre-aggregates to (doc, word, n) BEFORE the join — the
    * join key is then distinct per document, so a globally common word
    * cannot concentrate one reducer (the same skew bound the TF-IDF
    * family rides). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val pieces = dictionary(docs, textCol, merges)
      .select(col("word"), size(col("syms")).cast("long").as("n_pieces"))
    docs.select(col(idCol), explode(words(col(textCol))).as("word"))
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("n"))
      .join(pieces, "word")
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("n_pieces")).as("n_pieces"))
      .orderBy(idCol)
  }
}
