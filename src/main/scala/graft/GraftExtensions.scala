package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{ByteSum, DoubleDot, IntDot, MinHashAgg, SimHashAgg, WinnowedFingerprint, WordGrams, ZInterleave}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql` users get the
  * same surface as the Column API:
  *
  *   SELECT double_dot(a, b)                      -- array<double> dot
  *   SELECT int_dot(a, b)                         -- array<int> dot (quantized ANN)
  *   SELECT winnowed_fingerprint(text[, k, w])    -- rolling-hash winnowing
  *   SELECT minhash_signature(shingle, 128) ... GROUP BY doc  -- MinHash agg
  *   SELECT simhash_signature(h, 60) ... GROUP BY doc         -- SimHash agg
  *   SELECT word_grams(toks, 3)                   -- compiled n-gram shingles
  *   SELECT z_interleave(x, y)                    -- Morton/Z-order layout code
  *   SELECT byte_sum(payload)                     -- unsigned-byte sum of a binary
  *
  * Wire up with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("double_dot"),
      new ExpressionInfo(classOf[DoubleDot].getName, "double_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "double_dot(a, b) takes two arrays")
        DoubleDot(args.head, args(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("int_dot"),
      new ExpressionInfo(classOf[IntDot].getName, "int_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "int_dot(a, b) takes two arrays")
        IntDot(args.head, args(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("byte_sum"),
      new ExpressionInfo(classOf[ByteSum].getName, "byte_sum"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "byte_sum(binary) takes one argument")
        ByteSum(args.head)
      }))

    // aggregate builders return the bare AggregateFunction — the
    // analyzer wraps it into an AggregateExpression like any built-in
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_signature"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_signature(shingle, numHashes)")
        MinHashAgg(args.head, intArg(args(1), "numHashes"))
      }))

    ext.injectFunction((
      FunctionIdentifier("simhash_signature"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_signature"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "simhash_signature(hash, bits)")
        SimHashAgg(args.head, intArg(args(1), "bits"))
      }))

    ext.injectFunction((
      FunctionIdentifier("word_grams"),
      new ExpressionInfo(classOf[WordGrams].getName, "word_grams"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_grams(tokens, n)")
        WordGrams(args.head, intArg(args(1), "n"))
      }))

    ext.injectFunction((
      FunctionIdentifier("z_interleave"),
      new ExpressionInfo(classOf[ZInterleave].getName, "z_interleave"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "z_interleave(x, y) takes two ints")
        ZInterleave(args.head, args(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[graft.functions.BloomMightContain].getName,
        "bloom_might_contain"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "bloom_might_contain(key_hash, filter_bytes) — filter_bytes a binary literal")
        val bytes = args(1) match {
          case Literal(b: Array[Byte], org.apache.spark.sql.types.BinaryType) => b
          case other => throw new IllegalArgumentException(
            s"bloom_might_contain filter must be a binary literal, got $other")
        }
        graft.functions.BloomMightContain(args.head, bytes)
      }))

    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[graft.functions.BloomAgg].getName, "bloom_agg"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "bloom_agg(key_hash, expectedItems)")
        val expected = args(1) match {
          case Literal(v: Int, _) => v.toLong
          case Literal(v: Long, _) => v
          case other => throw new IllegalArgumentException(
            s"bloom_agg expectedItems must be an integer literal, got $other")
        }
        graft.functions.BloomAgg(args.head, expected)
      }))

    ext.injectFunction((
      FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[graft.functions.BloomContains].getName,
        "bloom_contains"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "bloom_contains(key_hash, filter_bytes)")
        graft.functions.BloomContains(args.head, args(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("winnowed_fingerprint"),
      new ExpressionInfo(classOf[WinnowedFingerprint].getName, "winnowed_fingerprint"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => WinnowedFingerprint(text, 8, 4)
        case Seq(text, k, w) =>
          WinnowedFingerprint(text, intArg(k, "k"), intArg(w, "w"))
        case _ => throw new IllegalArgumentException(
          "winnowed_fingerprint(text[, k, w])")
      }))
  }
}
