package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke, two parts (select with arg `cdc` / `lsh` / default both):
  *
  * - CDC: initialize a bucketed store from the sf0.1 lineitem (~600k
  *   rows, composite key), then merge a ~1.2M-row CDC batch (2× updates
  *   on every row + deletes + inserts) and a small 10k-row batch.
  * - LSH: run d03 (MinHash+LSH text dedup) and d05 (banded embedding
  *   near-dup) over synthetic clustered corpora at 5k and 50k
  *   docs/vectors — wall-time growth should be near-linear (fixed
  *   cluster size ⇒ candidate volume ∝ n); a candidate explosion shows
  *   up here long before sf-gated correctness would catch it. The 50k
  *   doc corpus plants a 1000-member duplicate cluster (~500k candidate
  *   pairs), driving the verification joins through the over-limit
  *   shuffle fallback.
  *
  * Dev tool: numbers land in COVERAGE.md.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mode = args.headOption.getOrElse("all")
    if (mode == "lsh" || mode == "all") lshSmoke(spark)
    if (mode == "cdc" || mode == "all") cdcSmoke(spark, "/root/testdata/sf0.1")
    if (mode == "curation" || mode == "all") curationSmoke(spark)
    if (mode == "containment" || mode == "all") containmentSmoke(spark)
    spark.stop()
  }

  /** d19 prefix containment on ITS OWN worst case: every doc ends with
    * the same 12-word boilerplate tail, so those shingles have df = n
    * and the exact inverted-index join (d16) pays Σ df² ≈ n² rows —
    * exactly the corpus shape containment detection targets. The prefix
    * path's candidates come only from each doc's rarest shingles
    * (cluster-specific, df = 10), so growth must track n, not n².
    * A small exact run is timed for contrast.
    */
  private def containmentSmoke(spark: SparkSession): Unit = {
    def synthDocs(n: Int) = {
      val unique = (0 until 12).map(j =>
        substring(md5(concat(floor(col("id") / 10).cast("long").cast("string"),
          lit(s"_u$j"))), 1, 7))
      val boiler = (0 until 12).map(j => lit(s"boiler$j"))
      spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", (unique ++ boiler): _*).as("text"))
    }
    val contrast = synthDocs(2000).repartition(32).persist()
    contrast.count()
    time("d16 exact containment, 2000 docs (universal boilerplate ⇒ df² join)") {
      println(s"[scale]   directed pairs: ${graft.operators.TextDedup
        .containmentPairs(contrast, "doc_id", "text").count()}")
    }
    contrast.unpersist()
    Seq(5000, 50000).foreach { n =>
      val docs = synthDocs(n).repartition(32).persist()
      docs.count()
      time(s"d19 prefix containment, $n docs (universal boilerplate tail" +
          (if (n >= 50000) ", candidates ⇒ shuffle fallback)" else ")")) {
        val pairs = graft.operators.TextDedup
          .containmentPairsPrefix(docs, "doc_id", "text")
        println(s"[scale]   directed pairs: ${pairs.count()}")
      }
      docs.unpersist()
    }
    // d21 winnowed fingerprints on CLUSTER corpora (10-member duplicate
    // clusters, distinct content per cluster): per-fingerprint df = the
    // cluster size, so pair volume — and cost — must track n. (A corpus
    // with universal boilerplate SUBSTRINGS is d21's documented banding
    // case: the output itself is quadratic there.)
    def clusterDocs(n: Int) = {
      val words = (0 until 15).map(j =>
        substring(md5(concat(floor(col("id") / 10).cast("long").cast("string"),
          lit(s"_c$j"))), 1, 7))
      spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", words: _*).as("text"))
    }
    Seq(5000, 50000).foreach { n =>
      val docs = clusterDocs(n).repartition(32).persist()
      docs.count()
      time(s"d21 fingerprint pairs, $n docs (10-member clusters)") {
        val pairs = graft.operators.TextDedup
          .fingerprintPairs(docs, "doc_id", "text")
        println(s"[scale]   pairs: ${pairs.count()}")
      }
      docs.unpersist()
    }
    // d23 fingerprint containment on ITS OWN worst case: every doc ends
    // with the same char-level boilerplate tail, so the tail's
    // fingerprints have df = n and the exact inverted-index join pays
    // Σ df² ≈ n². Prefix candidates come only from each doc's rarest
    // fingerprints — the cluster-specific head (df = 10) — so growth
    // must track n. A small exact run is timed for contrast.
    def tailDocs(n: Int) = {
      val unique = (0 until 10).map(j =>
        substring(md5(concat(floor(col("id") / 10).cast("long").cast("string"),
          lit(s"_f$j"))), 1, 7))
      val tail = lit("universal boilerplate tail shared by every single document")
      spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", (unique :+ tail): _*).as("text"))
    }
    val fpContrast = tailDocs(2000).repartition(32).persist()
    fpContrast.count()
    time("d23-exact fingerprint containment, 2000 docs (universal tail ⇒ df² join)") {
      println(s"[scale]   directed pairs: ${graft.operators.TextDedup
        .fingerprintContainment(fpContrast, "doc_id", "text").count()}")
    }
    fpContrast.unpersist()
    Seq(5000, 50000).foreach { n =>
      val docs = tailDocs(n).repartition(32).persist()
      docs.count()
      time(s"d23 prefix fingerprint containment, $n docs (universal tail)") {
        println(s"[scale]   directed pairs: ${graft.operators.TextDedup
          .fingerprintContainmentPrefix(docs, "doc_id", "text").count()}")
      }
      docs.unpersist()
    }
  }

  /** as-of join and sequence packing at synthetic volume (orders of
    * magnitude above the testdata): growth must track the input
    * near-linearly — the single-shuffle / shard-local-window contracts.
    */
  private def curationSmoke(spark: SparkSession): Unit = {
    def events(n: Int) = spark.range(n).select(
      col("id").as("event_id"),
      (col("id") % 50000L).as("user_id"),
      org.apache.spark.sql.functions.expr(
        "timestamp_micros(1700000000000000 + id * 1000)").as("ts"),
      when(col("id") % 3 === 0, "purchase").otherwise("click").as("event_type"),
      (col("id") % 97).cast("double").as("value"))
    Seq(1000000, 10000000).foreach { n =>
      val ev = events(n)
      val probe = ev.filter(col("event_type") === "purchase")
      val build = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("b_event_id"))
      time(s"asof join, $n events, 50k users") {
        graft.operators.AsofJoin
          .asofLookup(probe, build, Seq("user_id"), "ts", Seq("b_event_id"))
          .filter(col("b_event_id").isNotNull).count()
      }
    }
    Seq(500000, 5000000).foreach { n =>
      val docs = spark.range(n).select(col("id").as("doc_id"),
        (col("id") % 900 + 100).as("n"))
      time(s"sequence packing, $n docs, 64 shards") {
        graft.operators.SequencePacking
          .pack(docs, "doc_id", col("n"), ctx = 2048, shards = 64)
          .agg(countDistinct(col("pack_id"))).collect()
      }
    }
    // line dedup: every doc gets 5 unique lines + 1 of 20 shared
    // boilerplate lines — kept-line volume grows with the corpus while
    // the dropped set stays the planted 20; cost must track the line
    // count (one count shuffle + one join), not the pair count
    Seq(100000, 1000000).foreach { n =>
      val docs = spark.range(n).select(col("id").as("doc_id"),
        concat_ws("\n",
          concat(lit("boiler line "), (col("id") % 20).cast("string")),
          concat(lit("u"), col("id"), lit(" alpha")),
          concat(lit("u"), col("id"), lit(" bravo")),
          concat(lit("u"), col("id"), lit(" charlie")),
          concat(lit("u"), col("id"), lit(" delta")),
          concat(lit("u"), col("id"), lit(" echo"))).as("text"))
      time(s"line dedup, $n docs, 6 lines each") {
        val out = graft.operators.TextDedup.lineDedup(docs, "doc_id", "text")
        val bad = out.filter(col("n_kept") =!= 5).count()
        require(bad == 0, s"expected exactly the boilerplate line dropped, $bad docs differ")
      }
    }
  }

  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  /** d03/d05 at 5k and 50k: clustered synthetic corpora (10-member
    * duplicate clusters, so candidate volume grows linearly with n).
    */
  private def lshSmoke(spark: SparkSession): Unit = {
    // integer floor-div for cluster ids (`col/10` alone is DOUBLE division
    // — every row would get a unique "cluster")
    def concept(bigCluster: Int) =
      when(col("id") < bigCluster, lit(0L)).otherwise(floor(col("id") / 10).cast("long"))
    def synthDocs(n: Int, bigCluster: Int): org.apache.spark.sql.DataFrame = {
      val words = (0 until 15).map(j =>
        substring(md5(concat(concept(bigCluster).cast("string"), lit(s"_$j"))), 1, 7))
      spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", words: _*).as("text"))
    }
    def synthVecs(n: Int): org.apache.spark.sql.DataFrame = {
      // hash-derived pseudo-random components (a sinusoid family like
      // sin(c·31 + 7d) is heavily self-correlated — cos(31Δc) swings to
      // ±1 — and floods the corpus with accidental "near-dups");
      // ±0.02 noise keeps within-cluster cosine ≈ 0.999
      val comps = (0 until 64).map { d =>
        val h = conv(substring(md5(concat(concept(0).cast("string"), lit(s"_d$d"))), 1, 15), 16, 10)
        (h.cast("double") / lit(math.pow(2, 60)) - 0.5) + sin(col("id") * 97 + d) * 0.02
      }
      spark.range(n).select(col("id").as("vec_id"), array(comps: _*).as("vec"))
    }
    Seq(5000, 50000).foreach { n =>
      val docs = synthDocs(n, bigCluster = if (n >= 50000) 1000 else 0)
        .repartition(32).persist()
      docs.count()
      time(s"d03 minhash+LSH dedup, $n docs (10-member clusters" +
          (if (n >= 50000) " + one 1000-member cluster ⇒ shuffle fallback)" else ")")) {
        val pairs = graft.operators.TextDedup
          .minhashLshPairs(docs, "doc_id", "text")
        println(s"[scale]   pairs: ${pairs.count()}")
      }
      // d09: a FIXED 500-doc batch against this store's band index — the
      // per-batch cost must track batch + candidates, not store size.
      // Batch concepts 0-499 duplicate store clusters (at 50k, concept 0
      // alone matches the planted 1000-member cluster; the shuffle
      // fallback itself is spec-covered in DataPipelineSpec).
      val batch = {
        val words = (0 until 15).map(j =>
          substring(md5(concat(col("id").cast("string"), lit(s"_$j"))), 1, 7))
        spark.range(500).select((col("id") + 10000000L).as("doc_id"),
          concat_ws(" ", words: _*).as("text"))
      }
      val index = graft.operators.IncrementalDedup
        .bandIndex(docs, "doc_id", "text").persist()
      time(s"d09 band-index build, $n docs (amortized across batches)") {
        index.count()
      }
      time(s"d09 incremental dedup, 500-doc batch vs $n-doc index") {
        val hits = graft.operators.IncrementalDedup
          .dedupAgainst(index, docs, batch, "doc_id", "text")
        println(s"[scale]   batch hits: ${hits.count()}")
      }
      index.unpersist()
      docs.unpersist()

      // band width scales with corpus size (8 bits at 5k, 16 at 50k):
      // keeping bits ∝ log n holds per-band bucket occupancy — and so
      // candidate volume — near-linear; a fixed width would admit a
      // constant FRACTION of all pairs (quadratic growth). Planes are
      // corpus vectors sampled with a stride so they span distinct
      // clusters (the first-128 prefix would yield ~13 near-identical
      // normals and degenerate band keys).
      val bands = 16
      val bitsPerBand = if (n >= 50000) 16 else 8
      val vecs = synthVecs(n).repartition(32).persist()
      vecs.count()
      time(s"d05 banded near-dup LSH, $n vectors (64-dim, $bands bands × $bitsPerBand bits)") {
        val numPlanes = bands * bitsPerBand
        val planes = vecs.filter(col("vec_id") % (n / numPlanes) === 0)
          .orderBy("vec_id").limit(numPlanes)
          .select("vec").collect().map(_.getSeq[Double](0).toSeq).toSeq
        val pairs = graft.operators.VectorSearch
          .cosineNearDupPairs(vecs, "vec_id", "vec", 0.9, planes, bands = bands)
        println(s"[scale]   pairs: ${pairs.count()}")
      }
      vecs.unpersist()
    }
  }

  private def cdcSmoke(spark: SparkSession, dir: String): Unit = {

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val keys = Seq("l_orderkey", "l_linenumber")
    val root = Files.createTempDirectory("scale").toString

    val store = time("initial load 600k rows / 64 buckets") {
      graft.sources.BucketedTableStore.create(spark, s"$root/li", keys, li, numBuckets = 64)
    }

    // big batch: every row updated twice (dedup must collapse), 10% deleted
    val big = li.select(col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity") + 1).as("l_quantity"), col("l_extendedprice"),
        col("l_partkey"), col("l_suppkey"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
      .withColumn("Op", when(col("l_orderkey") % 10 === 0, "D").otherwise("U"))
      .withColumn("load_timestamp", to_timestamp(lit("2030-01-01 00:00:00")))
      .withColumn("ingestion_seq", lit(1L))
    val bigDup = big.unionAll(big.withColumn("ingestion_seq", lit(2L))
      .withColumn("l_quantity", col("l_quantity") + 1))

    time("dedup 1.2M-row batch -> 600k") {
      val d = graft.operators.CdcDedup.dedup(bigDup, keys, gate = true).persist()
      println(s"[scale] dedup rows: ${d.count()}")
      time("merge 600k-key batch (touches all 64 buckets)") {
        println(s"[scale] touched: ${store.merge(d)}")
      }
    }
    println(s"[scale] store rows after big merge: ${store.read().count()}")

    // small batch: 10k rows touching few keys
    val small = graft.operators.CdcDedup.dedup(
      bigDup.filter(col("l_orderkey") % 61 === 1), keys, gate = true).persist()
    println(s"[scale] small batch rows: ${small.count()}")
    time("merge 10k-row batch (partition-pruned)") {
      println(s"[scale] touched: ${store.merge(small)}")
    }
  }
}
