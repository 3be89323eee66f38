package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions registration: custom expressions reachable
  * from SQL text, not just the Column API.
  */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // getOrCreate reuses the suite-shared session and would skip the
    // extensions — clear the registry so a fresh session (same
    // SparkContext) is built with them applied
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  test("double_dot callable from SQL") {
    val r = spark.sql(
      "SELECT double_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
  }

  test("int_dot callable from SQL, long accumulator") {
    val r = spark.sql(
      "SELECT int_dot(array(100000, -2, 3), array(100000, 5, 6)) AS d")
      .head().getLong(0)
    assert(r == 10000000008L)
  }

  test("word_grams callable from SQL, short-doc edge included") {
    val r = spark.sql(
      "SELECT word_grams(array('a', 'b', 'c', 'd'), 3) AS g").head().getSeq[String](0)
    assert(r == Seq("a b c", "b c d"))
    val short = spark.sql(
      "SELECT word_grams(array('a', 'b'), 3) AS g").head().getSeq[String](0)
    assert(short == Seq("a b"))
  }

  test("z_interleave callable from SQL, matches kernel") {
    val r = spark.sql("SELECT z_interleave(5, 3) AS z").head().getLong(0)
    assert(r == graft.functions.ZInterleave.compute(5, 3))
    assert(spark.sql("SELECT z_interleave(65535, 65535) AS z").head().getLong(0) == 0xFFFFFFFFL)
  }

  test("byte_sum callable from SQL, unsigned semantics") {
    // 0xFF must count as 255, not -1 — the unsigned contract real
    // sample bytes (BMP BGR, PCM) depend on
    val r = spark.sql("SELECT byte_sum(unhex('FF01')) AS s")
      .head().getLong(0)
    assert(r == 256L, s"unsigned byte sum diverged: $r")
    assert(spark.sql("SELECT byte_sum(CAST('' AS BINARY)) AS s")
      .head().getLong(0) == 0L)
  }

  test("dot kernels reject dimension mismatch instead of truncating") {
    val ei = intercept[Exception] {
      spark.sql("SELECT int_dot(array(1, 2, 3), array(1, 2))").head()
    }
    assert(ei.getMessage.contains("dimension mismatch") ||
      ei.getCause != null && ei.getCause.getMessage.contains("dimension mismatch"))
    val ed = intercept[Exception] {
      spark.sql("SELECT double_dot(array(1.0d), array(1.0d, 2.0d))").head()
    }
    assert(ed.getMessage.contains("dimension mismatch") ||
      ed.getCause != null && ed.getCause.getMessage.contains("dimension mismatch"))
  }

  test("winnowed_fingerprint callable from SQL, defaults and explicit args") {
    val n = spark.sql(
      "SELECT size(winnowed_fingerprint('the quick brown fox jumps over the lazy dog')) AS n")
      .head().getInt(0)
    assert(n > 0)
    val n2 = spark.sql(
      "SELECT size(winnowed_fingerprint('the quick brown fox jumps over the lazy dog', 4, 2)) AS n")
      .head().getInt(0)
    assert(n2 >= n)
  }

  test("bloom_might_contain callable from SQL with a binary filter literal") {
    import org.apache.spark.sql.functions._
    val small = spark.range(100).select(col("id").as("k"))
    val bytes = graft.operators.BloomPrune.buildFilter(
      small.toDF(), Seq("k"), expectedItems = 100L)
    val hex = bytes.map(b => f"$b%02x").mkString
    small.toDF().createOrReplaceTempView("bloom_members")
    // every member must probe true (one-sided error)
    val misses = spark.sql(
      s"SELECT count(*) AS n FROM bloom_members " +
        s"WHERE NOT bloom_might_contain(xxhash64(k), X'$hex')")
      .head().getLong(0)
    assert(misses == 0L)
    // a non-literal filter argument fails loudly, not silently
    val e = intercept[Exception] {
      spark.sql("SELECT bloom_might_contain(xxhash64(1), CAST(NULL AS BINARY))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("binary literal") ||
      e.getMessage.toLowerCase.contains("bloom_might_contain"))
  }

  test("bloom_agg / bloom_contains callable from SQL; per-group filters are tight") {
    spark.range(1000)
      .selectExpr("id % 4 AS g", "id AS k")
      .createOrReplaceTempView("bloom_groups")
    // per-group filter: every member hits its OWN group's filter...
    val idx = spark.sql(
      "SELECT g, bloom_agg(xxhash64(k), 1000) AS bf FROM bloom_groups GROUP BY g")
    idx.createOrReplaceTempView("bloom_idx")
    val misses = spark.sql(
      """SELECT count(*) AS n FROM bloom_groups b JOIN bloom_idx i ON b.g = i.g
        |WHERE NOT bloom_contains(xxhash64(b.k), i.bf)""".stripMargin)
      .head().getLong(0)
    assert(misses == 0L)
    // ...and almost never a DIFFERENT group's (members are disjoint mod 4)
    val crossHits = spark.sql(
      """SELECT count(*) AS n FROM bloom_groups b JOIN bloom_idx i ON b.g <> i.g
        |WHERE bloom_contains(xxhash64(b.k), i.bf)""".stripMargin)
      .head().getLong(0)
    assert(crossHits <= 90, s"cross-group fp burst: $crossHits of 3000")
  }

  test("minhash_signature / simhash_signature callable from SQL as aggregates") {
    // MinHash: SQL aggregate ≡ Column-API aggregate on the same rows
    val sqlSig = spark.sql(
      """SELECT minhash_signature(s, 8) AS sig FROM (
        |  SELECT explode(array('a b c', 'b c d', 'c d e')) AS s)""".stripMargin)
      .head().getSeq[Long](0)
    import org.apache.spark.sql.functions.col
    val apiSig = spark.range(1)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit("a b c"),
          org.apache.spark.sql.functions.lit("b c d"),
          org.apache.spark.sql.functions.lit("c d e"))).as("s"))
      .agg(graft.functions.MinHashAgg(col("s"), 8).as("sig"))
      .head().getSeq[Long](0)
    assert(sqlSig == apiSig && sqlSig.length == 8)

    // SimHash over known hashes: bits 0 and 1 set in 2 of 3 inputs →
    // majority sets them; bit 2 set once → majority clears it
    val sim = spark.sql(
      "SELECT simhash_signature(h, 60) AS sig FROM (SELECT explode(array(3L, 3L, 4L)) AS h)")
      .head().getLong(0)
    assert(sim == 3L)

    // inputTypes: an INT hash column coerces via implicit cast instead
    // of a per-row ClassCastException
    val simInt = spark.sql(
      "SELECT simhash_signature(h, 60) AS sig FROM (SELECT explode(array(3, 3, 4)) AS h)")
      .head().getLong(0)
    assert(simInt == 3L)
  }

  test("vector_sum matches posexplode path across partition merges") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // many partitions force partial-buffer merges, incl. empty partials
    val df = (0 until 200).map(i => (i % 3, Array(i, -i, i * 2)))
      .toDF("g", "vec").repartition(17)
    val viaAgg = df.groupBy("g")
      .agg(graft.functions.VectorSumAgg(col("vec")).as("sums"))
      .select(col("g"), col("sums"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val viaExplode = df
      .select(col("g"), posexplode(col("vec")).as(Seq("pos", "v")))
      .groupBy("g", "pos").agg(sum("v").as("s"))
      .collect().groupBy(_.getInt(0))
      .map { case (g, rows) =>
        g -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(viaAgg == viaExplode)
    // dimension mismatch fails loudly
    val bad = Seq((1, Array(1, 2)), (1, Array(1, 2, 3))).toDF("g", "vec")
    val e = intercept[Exception] {
      bad.groupBy("g").agg(graft.functions.VectorSumAgg(col("vec"))).collect()
    }
    assert(e.getMessage.contains("dimension mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("dimension mismatch"))
  }
}
