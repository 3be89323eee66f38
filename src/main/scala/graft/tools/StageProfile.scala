package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{ConnectedComponents, Decontaminate, TextDedup}
import graft.queries.DataPipelineQueries

/** Dev-loop stage timing for the d10 composite; not part of the library
  * surface.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stage] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val evalSet = Tables(spark, dir, "documents")
      .filter(col("doc_id") % 37 === 0).select(col("doc_id"), col("text"))

    if (args.length > 1 && args(1) == "lsh") { lshBreakdown(spark, dir, evalSet); spark.stop(); return }
    if (args.length > 1 && args(1) == "q18") { q18Breakdown(spark, dir); spark.stop(); return }
    if (args.length > 1 && args(1) == "w33") { w33Breakdown(spark, dir); spark.stop(); return }
    // warm the JVM/codegen once
    DataPipelineQueries.d10_curation_pipeline(spark, dir).count()
    spark.catalog.clearCache()

    val corpus = DataPipelineQueries.dupDocCorpus(spark, dir)
      .join(broadcast(evalSet.select(col("doc_id").as("__eid"))),
        col("doc_id") === col("__eid"), "left_anti")
      .localCheckpoint()
    time("corpus (checkpoint)") { corpus.count() }
    val s1 = TextDedup.exact(corpus, "doc_id", "text").localCheckpoint()
    time("s1 exact dedup") { s1.count() }
    var pairs: DataFrame = null
    time("s2a minhash pairs") {
      pairs = TextDedup.minhashLshPairs(s1, "doc_id", "text",
        n = 3, numHashes = 128, bands = 32, threshold = 0.8).localCheckpoint()
      pairs.count()
    }
    var comps: DataFrame = null
    time("s2b connected components") {
      comps = ConnectedComponents.dedupGroups(s1, pairs, "doc_id")
      comps.count()
    }
    val s2 = s1.join(comps.filter(col("is_survivor")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      .repartition(spark.sparkContext.defaultParallelism)
    var contam: DataFrame = null
    time("s3 decontaminate") {
      contam = Decontaminate.report(s2, evalSet, "doc_id", "text", n = 8)
        .select("doc_id").localCheckpoint()
      contam.count()
    }
    val s3 = s2.join(broadcast(contam), Seq("doc_id"), "left_anti")
    time("s4 gram quality gate") {
      TextDedup.gramStats(s3, "doc_id", "text", n = 2)
        .filter(!((col("n_grams") - col("n_distinct_grams")) * 10 <= col("n_grams")))
        .count()
    }
    spark.stop()
  }

  /** w33 stage timing (warm): the unified-forget composite's phases,
    * so the optimization loop can see which of commit / fold / probe /
    * serve the wall actually lives in.
    */
  private def w33Breakdown(spark: SparkSession, dir: String): Unit = {
    import graft.streaming.{IndexMaintenance, UnifiedIndex}
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[w33] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm end-to-end once, as Bench does
    graft.queries.EngineQueries.queries("w33_unified_forget")(spark, dir).count()
    spark.catalog.clearCache()
    val root = java.nio.file.Files.createTempDirectory("graft-w33prof")
      .toFile.getAbsolutePath + "/cat"
    val cat = new graft.sources.TableCatalog(spark, root)
    val d = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    time("commitBatch (full corpus)") { UnifiedIndex.commitBatch(cat, d, 0L) }
    time("delete (bulk 1/3)") {
      UnifiedIndex.delete(cat, d.filter(col("doc_id") % 3 === 1)
        .select(col("doc_id")), 2L)
    }
    time("fold (compactUnifiedIfNeeded)") {
      IndexMaintenance.compactUnifiedIfNeeded(cat, 100L)
    }
    time("require: no masking tombstone") {
      cat.read("tombstones").join(cat.read("sizes"),
        Seq("id"), "left_semi").isEmpty
    }
    time("require: membershipConsistent (exact)") {
      UnifiedIndex.membershipConsistent(cat)
    }
    time("delete (trickle)") {
      UnifiedIndex.delete(cat, d.filter(col("doc_id") % 10 === 2)
        .select(col("doc_id")), 3L)
    }
    time("probe (no compaction)") {
      IndexMaintenance.compactUnifiedIfNeeded(cat, 101L)
    }
    val (bands, shingles, sizes) = UnifiedIndex.lshLive(cat)
    val probes = d.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
    val matches = time("lshIndexLookup (probes)") {
      val m = TextDedup.lshIndexLookup(probes, "doc_id", "text",
        bands, shingles, sizes).persist()
      m.count(); m
    }
    time("require: tombstoned-id scan") {
      matches.filter(col("id_c") % 3 === 1 || col("id_c") % 10 === 2).isEmpty
    }
    time("require: copy-match count") {
      matches.filter(col("id_c") === col("id_q") - 1000000000L).count()
      d.filter(col("doc_id") % 20 === 0
        && col("doc_id") % 3 =!= 1 && col("doc_id") % 10 =!= 2
        && length(trim(col("text"))) > 0).count()
    }
    matches.unpersist()
    time("bm25 serve tail") {
      val (tf, dl) = UnifiedIndex.postingsLive(cat)
      graft.queries.EngineQueries.queries("t19_bm25_topk") // touch
      tf.filter(col("tok").isin(Seq("merge", "window", "filter",
        "scan", "join", "sort"): _*)).join(dl, "doc_id").count()
    }
  }

  /** q18 timing, bench shape (warm, fixture cached after the first run):
    * full load + route + stage + evolve + dedup + bucketed merge + read.
    */
  private def q18Breakdown(spark: SparkSession, dir: String): Unit = {
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm codegen/classloading once end-to-end, as Bench does
    graft.queries.PipelineQueries.q18_cdc_pipeline_file(spark, dir).count()
    spark.catalog.clearCache()
    (1 to 3).foreach { round =>
      time(s"r$round q18 end-to-end (bench shape)") {
        graft.queries.PipelineQueries.q18_cdc_pipeline_file(spark, dir).count()
      }
      spark.catalog.clearCache()
    }
  }

  /** Sub-step timing of the LSH pair path on the d10 stage-1 survivors.
    * Deliberately profiles the SMALL-candidate (broadcast) regime —
    * production `minhashLshPairs` size-gates these broadcasts and falls
    * back to shuffle joins past the candidate limits; do not point this
    * at a corpus with huge duplicate clusters.
    */
  private def lshBreakdown(spark: SparkSession, dir: String,
      evalSet: DataFrame): Unit = {
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[lsh] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // warm codegen
    DataPipelineQueries.d10_curation_pipeline(spark, dir).count()
    spark.catalog.clearCache()
    val corpus = DataPipelineQueries.dupDocCorpus(spark, dir)
      .join(broadcast(evalSet.select(col("doc_id").as("__eid"))),
        col("doc_id") === col("__eid"), "left_anti")
      .localCheckpoint()
    val s1 = TextDedup.exact(corpus, "doc_id", "text").localCheckpoint()
    s1.count()
    val sh = TextDedup.shingles(s1, "doc_id", "text", 3).persist()
    time("shingles materialize") { sh.count() }
    val bk = TextDedup.lshBandsFromShingles(sh, 128, 32).persist()
    time("band keys (minhash sigs)") { bk.count() }
    val candidates = bk.as("a").join(bk.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct().persist()
    time("candidates") { candidates.count() }
    time("shingle stats") { sh.agg(countDistinct(col("id")), count(lit(1))).count() }
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_shingles"))
    val pairShingles = sh.join(broadcast(candidates), col("id") === col("id_a"))
      .select(col("id_a"), col("id_b").as("__cand_b"), col("shingle").as("__cand_sh"))
    val inter = sh.join(broadcast(pairShingles),
        col("id") === col("__cand_b") && col("shingle") === col("__cand_sh"))
      .select(col("id_a"), col("__cand_b").as("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    time("verify (inter+sizes)") {
      inter
        .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_shingles", "size_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_shingles", "size_b"), "id_b")
        .count()
    }
  }
}
