package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Distributed BPE vocabulary induction (Sennrich et al. 2016) — the
  * subword-tokenizer training step of an LLM data pipeline. The
  * algorithmic shape that makes it 100 TB-viable: the CORPUS is
  * touched exactly once (one explode + one word-count aggregate); the
  * k merge rounds then iterate over the WORD-FREQUENCY TABLE, which
  * is Zipf-bounded (distinct words, not corpus tokens). Each round is
  * one pair-count aggregate over that table plus an O(1) driver
  * argmax — the same per-round shape HuggingFace's trainer uses, with
  * the pair counts distributed.
  *
  * Determinism: the winning pair breaks ties by (count DESC, left ASC,
  * right ASC), so the merge sequence is a pure function of the corpus.
  * Merges apply left-to-right without overlap (the standard greedy
  * pass).
  *
  * The per-word merge application is a typed map over the vocab table
  * — genuinely sequential per-row symbol logic (the documented
  * exception to the no-lambda rule, like the codec boundary): it runs
  * on the Zipf-bounded vocab relation, never the corpus.
  */
object BpeInduction {

  final case class Merge(left: String, right: String, pairCount: Long)
  final case class SymWord(word: String, freq: Long, syms: Seq[String])

  /** One greedy non-overlapping left-to-right merge pass. */
  def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Train k merges over `df(textCol)`; returns the ordered merge list
    * and the final symbolized vocab (word, freq, syms).
    */
  def train(df: DataFrame, textCol: String, k: Int): (Seq[Merge], Dataset[SymWord]) = {
    require(k >= 1, "k must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._

    // the single corpus pass: word frequencies
    val words = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]

    var vocab: Dataset[SymWord] = words
      .map { case (w, f) => SymWord(w, f, w.map(_.toString)) }
      .localCheckpoint()

    val merges = Seq.newBuilder[Merge]
    var round = 0
    var exhausted = false
    while (round < k && !exhausted) {
      val best = vocab
        .flatMap(sw => sw.syms.sliding(2).collect {
          case Seq(a, b) => ((a, b), sw.freq)
        })
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((a, b), c) => (a, b, c) }
        .toDF("a", "b", "c")
        .orderBy(col("c").desc, col("a"), col("b"))
        .head(1)
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(a, b, c)
        val prev = vocab
        vocab = vocab
          .map(sw => sw.copy(syms = applyMerge(sw.syms, a, b)))
          .localCheckpoint() // cut the k-round lineage; frees the prior round
        prev.unpersist()
      }
      round += 1
    }
    (merges.result(), vocab)
  }

  /** Tokenize a corpus with a trained vocab — the 100 TB encode path:
    * the symbolized vocab (Zipf-bounded) broadcasts; the corpus
    * explodes to words and JOINS the vocab for its subword
    * segmentation — no per-corpus-row merge logic ever runs. Words
    * absent from the vocab (unseen at train time) fall back to
    * character symbols via the merge list applied in order (driver
    * logic on the broadcast side never touches them — they surface as
    * `oov = true` with char count). Returns per-doc
    * (id, n_words, n_subwords, n_oov_words).
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
      vocab: Dataset[SymWord]): DataFrame = {
    val spark = df.sparkSession
    val words = df.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(col(textCol))).as("word"))
    val vtab = broadcast(vocab.toDF()
      .select(col("word"), size(col("syms")).as("__n_syms")))
    words.join(vtab, Seq("word"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("__n_syms"),
          length(col("word")))).cast("long").as("n_subwords"),
        sum(when(col("__n_syms").isNull, 1L).otherwise(0L)).as("n_oov_words"))
  }

  /** Deterministic symbol → token-id table for a trained vocab: every
    * subword symbol the training produced PLUS every single character
    * of the training words (so an OOV word whose characters all
    * appeared at train time — even fully merged away, like the 'h'
    * inside a learned "th" — still round-trips to known ids), sorted,
    * ids dense from 1. Id 0 is reserved for characters never seen at
    * train time (the <unk> of this tokenizer).
    */
  def symbolization(vocab: Seq[SymWord]): Seq[(String, Int)] = {
    val syms = (vocab.flatMap(_.syms) ++
      vocab.flatMap(_.word.map(_.toString))).distinct.sorted
    syms.zipWithIndex.map { case (sym, i) => (sym, i + 1) }
  }

  /** Per-document TOKEN-ID SEQUENCE under a trained vocab — what a
    * training-data pipeline actually ships to the trainer, where
    * [[tokenCounts]] only budgets. Same 100 TB shape as the counts
    * path: the corpus explodes to positioned words, the Zipf-bounded
    * (word → id-array) table BROADCASTS, and the per-doc sequence
    * reassembles with one aggregation — no per-row merge loop. OOV
    * words expand character-by-character through the symbolization (a
    * literal map column; unknown characters are id 0). The sequence
    * is emitted as an order-sensitive digest (`n_tokens`, md5 of the
    * space-joined ids) so the result stays one row per document while
    * still pinning every id at every position.
    */
  def tokenIdSequences(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[SymWord]): DataFrame = {
    val symId = symbolization(vocab).toMap
    val spark = df.sparkSession
    import spark.implicits._
    val vtab = broadcast(
      vocab.map(sw => (sw.word, sw.syms.map(symId))).toDF("word", "__ids"))
    val charKeys = symId.keys.filter(_.length == 1).toSeq.sorted
    val charMap = map_from_arrays(
      array(charKeys.map(lit): _*),
      array(charKeys.map(k => lit(symId(k))): _*))
    df.select(col(idCol).as("id"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "word")))
      .join(vtab, Seq("word"), "left")
      // split-on-empty keeps a trailing "" (Pattern.split limit -1) —
      // filter it, or every OOV word would grow a spurious id-0 token
      .withColumn("__wids", coalesce(col("__ids"),
        transform(filter(split(col("word"), ""), c => c =!= ""),
          c => coalesce(element_at(charMap, c), lit(0)))))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("pos"), col("__wids")))).as("__ws"))
      .select(col("id"), flatten(col("__ws.__wids")).as("__toks"))
      .select(col("id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        md5(concat_ws(" ",
          transform(col("__toks"), t => t.cast("string")))).as("seq_md5"))
  }
}
