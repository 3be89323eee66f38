package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{ConnectedComponents, Decontaminate, TextDedup}
import graft.queries.DataPipelineQueries.dupDocCorpus

/** Throwaway perf probes; not part of the library surface. */
object Experiment {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val s = spark

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[exp] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (pass_ <- 0 to 1) {
    println(s"[exp] === pass $pass_ ===")
    // replicate d10 stage by stage, timing each materialization
    val evalSet = Tables(s, dir, "documents")
      .filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text"))
    val corpus = time("corpus checkpoint")(dupDocCorpus(s, dir)
      .join(broadcast(evalSet.select(col("doc_id").as("__eid"))),
        col("doc_id") === col("__eid"), "left_anti")
      .localCheckpoint())
    val s1docs = time("s1 exact dedup checkpoint")(
      TextDedup.exact(corpus, "doc_id", "text").localCheckpoint())
    val pairs = TextDedup.minhashLshPairs(s1docs, "doc_id", "text",
      n = 3, numHashes = 128, bands = 32, threshold = 0.8)
    val comps = time("LSH pairs + CC")(
      ConnectedComponents.dedupGroups(s1docs, pairs, "doc_id").localCheckpoint())
    val s2docs = s1docs.join(
      comps.filter(col("is_survivor")).select("doc_id"), Seq("doc_id"), "left_semi")
    val contam = time("decontaminate")(
      Decontaminate.report(s2docs, evalSet, "doc_id", "text", n = 8)
        .select("doc_id").localCheckpoint())
    val s3docs = s2docs.join(broadcast(contam), Seq("doc_id"), "left_anti")
    val n2 = size(TextFunctions.wordNgramsAll(col("text"), 2))
    val d2 = size(TextFunctions.wordNgrams(col("text"), 2))
    println(s"[exp] s3docs partitions: ${s3docs.rdd.getNumPartitions}")
    time("quality exprs on s1docs direct")(
      println(s1docs.filter(!(((n2 - d2) * 10) <= n2)).count()))
    time("quality exprs on s3docs")(
      println(s3docs.filter(!(((n2 - d2) * 10) <= n2)).count()))
    time("project-then-filter")(
      println(s3docs.select(col("doc_id"), n2.as("__n2"), d2.as("__d2"))
        .filter(!((col("__n2") - col("__d2")) * 10 <= col("__n2"))).count()))
    val lowq = time("quality gate")(
      s3docs.filter(!(((n2 - d2) * 10) <= n2)).select("doc_id").localCheckpoint())
    time("final labeling") {
      val out = corpus.select(col("doc_id"))
        .join(s1docs.select(col("doc_id"), lit(true).as("__s1")), Seq("doc_id"), "left")
        .join(comps.select(col("doc_id"), col("is_survivor").as("__s2")), Seq("doc_id"), "left")
        .join(broadcast(contam.withColumn("__c", lit(true))), Seq("doc_id"), "left")
        .join(broadcast(lowq.withColumn("__lq", lit(true))), Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("__s1").isNull, "exact_dup")
            .when(!col("__s2"), "near_dup")
            .when(col("__c").isNotNull && col("__c"), "contaminated")
            .when(col("__lq").isNotNull && col("__lq"), "low_quality")
            .otherwise("kept").as("stage"))
        .orderBy(col("doc_id"))
      println(s"[exp]   rows: ${out.count()}")
    }
    }
    spark.stop()
  }
}
