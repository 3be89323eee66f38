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
}
