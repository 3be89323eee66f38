package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TableCatalog
import graft.streaming.{IndexMaintenance, PostingsIndex}

/** The tombstone-fraction compaction trigger: crossing the threshold
  * schedules EXACTLY one transact; below it, none — and compaction is
  * a pure execution event (served results bit-identical, history
  * intact).
  */
class IndexMaintenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def tmpCat(prefix: String): TableCatalog =
    new TableCatalog(spark, java.nio.file.Files
      .createTempDirectory(prefix).toFile.getAbsolutePath + "/cat")

  private def corpus10 = (1 to 10).map(i =>
      i.toLong -> s"document number $i talks about topic${i % 3} and shares words")
    .toDF("doc_id", "text")

  test("LSH index: below threshold no transact, above exactly one, serve identical") {
    import graft.operators.TextDedup
    val cat = tmpCat("graft-lshcmp")
    val docs = corpus10
    graft.operators.CacheScope.scoped { implicit cs =>
      cat.commitAll(TextDedup.lshIndexRelations(docs, "doc_id", "text"), 0L)
    }
    // tombstone 2 of 10 docs → dead fraction 0.2 < 0.3: must NOT compact
    cat.commitAll(Map("tombstones" ->
      docs.filter(col("doc_id") <= 2).select(col("doc_id").as("id"))), 1L)
    val gensBefore = cat.loggedGenerations().size
    assert(math.abs(IndexMaintenance.lshDeadFraction(cat) - 0.2) < 1e-9)
    assert(IndexMaintenance.compactLshIfNeeded(cat, 2L).isEmpty,
      "compaction fired below threshold")
    assert(cat.loggedGenerations().size == gensBefore,
      "a below-threshold check must write no generation")
    // tombstone 2 more (4/10 = 0.4 ≥ 0.3): exactly one transact
    cat.commitAll(Map("tombstones" -> cat.read("tombstones").unionByName(
      docs.filter(col("doc_id") === 3 || col("doc_id") === 4)
        .select(col("doc_id").as("id")))), 3L)
    val q = docs.filter(col("doc_id") >= 8) // lookup batch
    def serveMasked() = {
      val tomb = broadcast(cat.read("tombstones"))
      def live(r: String) = cat.read(r).join(tomb, Seq("id"), "left_anti")
      TextDedup.lshIndexLookup(q, "doc_id", "text",
          live("bands"), live("shingles"), live("sizes"))
        .collect().map(_.toSeq).toSet
    }
    val before = serveMasked()
    val preGen = cat.latestGeneration().get
    val compacted = IndexMaintenance.compactLshIfNeeded(cat, 4L)
    assert(compacted.nonEmpty, "compaction must fire at 0.4 dead")
    assert(cat.loggedGenerations().size == gensBefore + 2,
      "exactly one compaction generation (plus the tombstone commit)")
    assert(cat.read("tombstones").isEmpty, "compaction must reset tombstones")
    assert(IndexMaintenance.lshDeadFraction(cat) == 0.0)
    // idempotent: a second check is a no-op
    assert(IndexMaintenance.compactLshIfNeeded(cat, 5L).isEmpty)
    // compaction is an execution event: the compacted index serves the
    // same matches the masked one did (tombstone relation now empty,
    // so serveMasked's anti-join is a no-op over the compacted rows)
    assert(serveMasked() == before, "compacted serve diverged")
    // AS OF: the pre-compaction generation still reads the full index
    assert(cat.readAt(preGen, "tombstones").count() == 4L,
      "time travel lost the pre-compaction tombstones")
  }

  test("postings index: fraction follows replaced revisions; trigger compacts once") {
    val cat = tmpCat("graft-postcmp")
    val docs = corpus10
    val none = docs.limit(0)
    PostingsIndex.commitBatch(cat, docs, none, 0L)
    assert(IndexMaintenance.postingsDeadFraction(cat) == 0.0)
    // replace 2 docs and delete 1: doclen now has 12 rows (10 rev-0 +
    // 2 rev-1 replacements), of which docs 1-3's rev-0 rows are dead
    // → 3/12 = 0.25 < 0.3 → no compaction
    PostingsIndex.commitBatch(cat,
      docs.filter(col("doc_id") <= 2)
        .withColumn("text", concat(lit("fresh "), col("text"))),
      docs.filter(col("doc_id") === 3).select("doc_id"), 1L, replace = true)
    val f1 = IndexMaintenance.postingsDeadFraction(cat)
    assert(math.abs(f1 - 0.25) < 1e-9, s"fraction $f1")
    val gens = cat.loggedGenerations().size
    assert(IndexMaintenance.compactPostingsIfNeeded(cat, 2L).isEmpty)
    assert(cat.loggedGenerations().size == gens)
    // delete 2 more docs: 5 dead / 12 ≈ 0.42 ≥ 0.3 → one transact
    PostingsIndex.commitBatch(cat, none,
      docs.filter(col("doc_id") === 4 || col("doc_id") === 5)
        .select("doc_id"), 3L)
    val (preTf, preDl) = PostingsIndex.live(cat)
    val beforeTf = preTf.collect().map(_.toSeq.take(3)).toSet
    val beforeDl = preDl.collect().map(_.toSeq.take(2)).toSet
    val g = IndexMaintenance.compactPostingsIfNeeded(cat, 4L)
    assert(g.nonEmpty, "postings compaction must fire at 0.42 dead")
    assert(cat.read("tombstones").isEmpty)
    assert(IndexMaintenance.postingsDeadFraction(cat) == 0.0)
    val (postTf, postDl) = PostingsIndex.live(cat)
    assert(postTf.collect().map(_.toSeq.take(3)).toSet == beforeTf,
      "compacted postings diverged")
    assert(postDl.collect().map(_.toSeq.take(2)).toSet == beforeDl,
      "compacted doclen diverged")
    // the rev contract survives compaction: a later delete still masks
    PostingsIndex.commitBatch(cat, none,
      docs.filter(col("doc_id") === 6).select("doc_id"), 5L)
    val (tf2, _) = PostingsIndex.live(cat)
    assert(tf2.filter(col("doc_id") === 6).isEmpty,
      "post-compaction delete failed to mask")
  }

  test("unified index: one delete masks both families; one transact folds all five") {
    import graft.streaming.UnifiedIndex
    val cat = tmpCat("graft-unicmp")
    val docs = corpus10
    UnifiedIndex.commitBatch(cat, docs, 0L)
    assert(IndexMaintenance.unifiedDeadFraction(cat) == 0.0)
    // forget 2 of 10 (0.2 < 0.3): masked in BOTH serves, no transact
    UnifiedIndex.delete(cat, docs.filter(col("doc_id") <= 2)
      .select("doc_id"), 1L)
    assert(math.abs(IndexMaintenance.unifiedDeadFraction(cat) - 0.2) < 1e-9)
    val gens = cat.loggedGenerations().size
    assert(IndexMaintenance.compactUnifiedIfNeeded(cat, 2L).isEmpty)
    assert(cat.loggedGenerations().size == gens)
    val (_, _, sizes) = UnifiedIndex.lshLive(cat)
    val (tf, dl) = UnifiedIndex.postingsLive(cat)
    assert(sizes.filter(col("id") <= 2).isEmpty, "LSH serve leaked a tombstone")
    assert(tf.filter(col("doc_id") <= 2).isEmpty
      && dl.filter(col("doc_id") <= 2).isEmpty,
      "postings serve leaked a tombstone")
    // forget 2 more (0.4 ≥ 0.3): ONE transact folds all five relations
    UnifiedIndex.delete(cat, docs.filter(col("doc_id") === 3
      || col("doc_id") === 4).select("doc_id"), 2L)
    val beforeDl = dl.collect().map(_.toSeq).toSet // live view pre-fold
    val g = IndexMaintenance.compactUnifiedIfNeeded(cat, 3L)
    assert(g.nonEmpty, "unified compaction must fire at 0.4 dead")
    assert(cat.loggedGenerations().size == gens + 2)
    assert(cat.read("tombstones").isEmpty)
    Seq("bands", "shingles", "sizes").foreach(r =>
      assert(cat.read(r).filter(col("id") <= 4).isEmpty,
        s"$r kept folded rows"))
    Seq("postings", "doclen").foreach(r =>
      assert(cat.read(r).filter(col("doc_id") <= 4).isEmpty,
        s"$r kept folded rows"))
    // the families stayed in lockstep through delete + compaction
    assert(UnifiedIndex.membershipConsistent(cat))
    val (_, dlPost) = UnifiedIndex.postingsLive(cat)
    assert(dlPost.collect().map(_.toSeq).toSet
      == beforeDl.filter(_.head.asInstanceOf[Long] > 4),
      "compacted serve diverged from the masked one")
  }

  test("fragmentation trigger: a delete-free stream folds at the segment ceiling") {
    import graft.streaming.UnifiedIndex
    val cat = tmpCat("graft-frag")
    val docs = corpus10
    val allMembers =
      Seq("bands", "shingles", "sizes", "postings", "doclen", "positions")
    // five ingest-only batches: no tombstone ever exists, so the
    // dead-fraction trigger can never fire — chains would fragment
    // forever without the segment ceiling
    val fired = (0 until 5).map { i =>
      UnifiedIndex.commitBatch(cat, docs.filter(col("doc_id") % 5 === i),
        i.toLong)
      IndexMaintenance.compactUnifiedIfNeeded(cat, 100L + i,
        maxSegments = 4).nonEmpty
    }
    // chains grow 1,2,3,4 → the ceiling fires EXACTLY once at 4; the
    // fold resets to one directory and the next append chains to 2
    assert(fired == Seq(false, false, false, true, false),
      s"trigger pattern diverged: $fired")
    assert(IndexMaintenance.fragmentation(cat, allMembers) == 2)
    // the pure-defrag fold is an execution event: everything serves,
    // families in lockstep, whole corpus intact
    assert(UnifiedIndex.membershipConsistent(cat))
    val (_, dl) = UnifiedIndex.postingsLive(cat)
    assert(dl.count() == 10, "defragmentation lost documents")
    assert(UnifiedIndex.positionsLive(cat)
      .select("doc_id").distinct().count() == 10)
  }

  test("unified recrawl: one floor replaces a revision in all six relations; satisfied floors fold") {
    import graft.operators.InvertedIndex
    import graft.streaming.UnifiedIndex
    val cat = tmpCat("graft-unirecrawl")
    val docs = corpus10
    UnifiedIndex.commitBatch(cat, docs, 0L)
    // recrawl docs 1-3: rev-1 rows + a finite floor in ONE generation
    val recrawl = docs.filter(col("doc_id") <= 3)
      .withColumn("text", concat(lit("fresh crawl "), col("text")))
    UnifiedIndex.commitBatch(cat, recrawl, 1L, replace = true)
    assert(UnifiedIndex.membershipConsistent(cat),
      "the recrawl tore a family (per-revision lockstep)")
    // exactly one revision serves, and it is the NEW one
    val (_, dl) = UnifiedIndex.postingsLive(cat)
    assert(dl.filter(col("doc_id") <= 3).collect()
      .forall(_.getAs[Long]("rev") == 1L), "a stale revision is serving")
    assert(dl.groupBy(col("doc_id")).count().filter(col("count") > 1).isEmpty)
    // the positional member serves the new token sequence only
    val phrase = InvertedIndex.phraseCount(
      UnifiedIndex.positionsLive(cat), Seq("fresh", "crawl"))
    assert(phrase.select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 3L), "phrase serving diverged from the recrawl")
    // a forget OVERLAPPING a recrawled id: ∞ dominates the finite floor
    UnifiedIndex.delete(cat, docs.filter(col("doc_id") === 2)
      .select("doc_id"), 2L)
    val (_, dl2) = UnifiedIndex.postingsLive(cat)
    assert(dl2.filter(col("doc_id") === 2).isEmpty,
      "the forget failed to dominate the recrawl floor")
    // fold: dead revisions destroyed, EVERY floor here is satisfied
    assert(IndexMaintenance.compactUnifiedIfNeeded(cat, 3L,
      threshold = 1e-9).nonEmpty)
    assert(cat.read("tombstones").isEmpty,
      "a satisfied floor survived its compaction")
    assert(cat.read("sizes").filter(col("id") <= 3 && col("rev") === 0L).isEmpty
      && cat.read("positions").filter(col("doc_id") === 2L).isEmpty,
      "the fold kept dead revisions")
    assert(UnifiedIndex.membershipConsistent(cat))
    // post-fold, the erase is SATISFIED: a later re-crawl of id 2 is a
    // new ingestion event and serves normally (an erase destroys data
    // held then, it is not a forever-ban on the id)
    UnifiedIndex.commitBatch(cat,
      docs.filter(col("doc_id") === 2)
        .withColumn("text", concat(lit("second life "), col("text"))),
      4L, replace = true)
    val (_, dl3) = UnifiedIndex.postingsLive(cat)
    assert(dl3.filter(col("doc_id") === 2).count() == 1L,
      "a re-crawl after a satisfied erase must serve")
    assert(UnifiedIndex.membershipConsistent(cat))
  }

  test("extra member: a rider relation lives, masks, and folds with the six built-ins") {
    import graft.streaming.UnifiedIndex
    val cat = tmpCat("graft-unirider")
    val docs = corpus10
    def rider(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id").as("id"), length(col("text")).as("feat"))
    UnifiedIndex.commitBatch(cat, docs, 0L,
      extraMembers = Map("codes" -> rider(docs)))
    // the rider carries the batch's revision like the built-ins
    assert(cat.read("codes").collect().forall(_.getAs[Long]("rev") == 0L))
    // recrawl: the rider's new revision rides the same floor commit
    val re = docs.filter(col("doc_id") <= 2)
      .withColumn("text", concat(lit("fresh "), col("text")))
    UnifiedIndex.commitBatch(cat, re, 1L, replace = true,
      extraMembers = Map("codes" -> rider(re)))
    val live = UnifiedIndex.memberLive(cat, "codes", "id")
    assert(live.count() == 10 && live.filter(col("id") <= 2).collect()
      .forall(_.getAs[Long]("rev") == 1L),
      "the rider served a stale revision after the recrawl")
    // one forget masks the rider with every other modality
    UnifiedIndex.delete(cat, docs.filter(col("doc_id") === 5)
      .select("doc_id"), 2L)
    assert(UnifiedIndex.memberLive(cat, "codes", "id")
      .filter(col("id") === 5).isEmpty, "forget did not reach the rider")
    // the fold covers the rider in the SAME transact — WITHOUT being
    // named: the fold set derives from the generation's member
    // manifest (a loop that forgets a rider cannot strand it)
    val before = UnifiedIndex.memberLive(cat, "codes", "id")
      .collect().map(_.toSeq).toSet
    assert(IndexMaintenance.compactUnifiedIfNeeded(cat, 3L,
      threshold = 1e-9).nonEmpty)
    assert(cat.read("codes").count() == 9,
      "dead rider revisions survived the fold")
    assert(UnifiedIndex.memberLive(cat, "codes", "id")
      .collect().map(_.toSeq).toSet == before,
      "folding changed the rider's serve")
  }

  test("rider-only erase is SATISFIED by the fold: no lingering tombstone masks re-admission") {
    import graft.streaming.UnifiedIndex
    val cat = tmpCat("graft-rideronly")
    val docs = corpus10
    def rider(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id").as("id"), length(col("text")).as("feat"))
    // doc 42 is the w39 empty-text-still-embeds case: 0 tokens, so the
    // text families never see it — its ONLY rows live in the rider
    val withEmpty = docs.unionByName(Seq((42L, "")).toDF("doc_id", "text"))
    UnifiedIndex.commitBatch(cat, withEmpty, 0L,
      extraMembers = Map("codes" -> rider(withEmpty)))
    assert(cat.read("sizes").filter(col("id") === 42L).isEmpty
      && cat.read("codes").filter(col("id") === 42L).count() == 1L,
      "fixture broke: the empty-text doc must be rider-only")
    // forget the rider-only doc (plus enough text docs to fire the
    // sizes-based trigger) and fold
    UnifiedIndex.delete(cat, Seq(42L).toDF("doc_id"), 1L)
    UnifiedIndex.delete(cat, docs.filter(col("doc_id") <= 4)
      .select("doc_id"), 2L)
    assert(IndexMaintenance.compactUnifiedIfNeeded(cat, 3L).nonEmpty)
    // the fold destroyed the rider rows — that SATISFIES the erase:
    // the tombstone must fold with them (judged against the union of
    // id-bearing members, not `sizes` alone), or a later legitimate
    // re-admission would be silently masked and destroyed
    assert(cat.read("codes").filter(col("id") === 42L).isEmpty,
      "the fold kept the forgotten rider rows")
    assert(cat.read("tombstones").filter(col("id") === 42L).isEmpty,
      "a rider-satisfied erase lingered as a pending tombstone")
    // the revival contract: re-admission of id 42 serves in every
    // modality it now has rows for
    val revived = Seq((42L, "second life text")).toDF("doc_id", "text")
    UnifiedIndex.commitBatch(cat, revived, 4L,
      extraMembers = Map("codes" -> rider(revived)))
    assert(UnifiedIndex.memberLive(cat, "codes", "id")
      .filter(col("id") === 42L).count() == 1L,
      "re-admission after a satisfied rider-only erase must serve")
    assert(UnifiedIndex.postingsLive(cat)._2
      .filter(col("doc_id") === 42L).count() == 1L)
    // contrast pin: a NEVER-admitted id's erase stays pending through
    // the same fold (the durable races-ahead ledger is untouched)
    UnifiedIndex.delete(cat, Seq(777L).toDF("doc_id"), 5L)
    // 3 of the 7 live sizes rows dead (docs 5-7; 42 re-admitted with
    // text counts as the 7th) ≈ 0.43 ≥ 0.3 — the trigger fires
    UnifiedIndex.delete(cat, docs.filter(col("doc_id") >= 5
      && col("doc_id") <= 7).select("doc_id"), 6L)
    assert(IndexMaintenance.compactUnifiedIfNeeded(cat, 7L).nonEmpty)
    assert(cat.read("tombstones").collect().map(_.getLong(0)).toSet
      == Set(777L), "the never-admitted erase must survive as pending")
  }

  test("index AS OF: a snapshot serves identically across later churn and a fold") {
    import graft.streaming.UnifiedIndex
    val cat = tmpCat("graft-idxasof")
    val docs = corpus10
    UnifiedIndex.commitBatch(cat, docs, 0L)
    val g0 = cat.latestGeneration().get
    def snapshot() = {
      val (tf, dl) = UnifiedIndex.postingsLiveAt(cat, g0)
      (tf.collect().map(_.toSeq).toSet, dl.collect().map(_.toSeq).toSet,
        UnifiedIndex.positionsLiveAt(cat, g0).collect().map(_.toSeq).toSet)
    }
    val before = snapshot()
    // churn: recrawl + forget + a fold that rewrites the head
    UnifiedIndex.commitBatch(cat,
      docs.filter(col("doc_id") <= 3)
        .withColumn("text", concat(lit("fresh "), col("text"))),
      1L, replace = true)
    UnifiedIndex.delete(cat, docs.filter(col("doc_id") === 7)
      .select("doc_id"), 2L)
    assert(snapshot() == before,
      "later maintenance leaked into the AS-OF serve")
    assert(IndexMaintenance.compactUnifiedIfNeeded(cat, 3L,
      threshold = 1e-9).nonEmpty)
    // compaction is a NEW generation: the snapshot still serves
    // bit-identically (history is never edited)
    assert(snapshot() == before, "the fold rewrote history")
    // and the head moved on: doc 7 gone, docs 1-3 at revision 1
    val (_, headDl) = UnifiedIndex.postingsLive(cat)
    assert(headDl.filter(col("doc_id") === 7).isEmpty)
    assert(headDl.filter(col("doc_id") <= 3).collect()
      .forall(_.getAs[Long]("rev") == 1L))
  }

  test("vacuum makes an erase absolute: expired snapshots unreadable, erased bytes off disk") {
    import graft.streaming.UnifiedIndex
    val root = java.nio.file.Files.createTempDirectory("graft-gdprvac")
      .toFile.getAbsolutePath + "/cat"
    val cat = new TableCatalog(spark, root)
    val docs = corpus10
    UnifiedIndex.commitBatch(cat, docs, 0L)
    val g0 = cat.latestGeneration().get
    UnifiedIndex.delete(cat, docs.filter(col("doc_id") <= 4)
      .select("doc_id"), 1L)
    assert(IndexMaintenance.compactUnifiedIfNeeded(cat, 2L).nonEmpty)
    // pre-vacuum: the erase is TIME-TRAVELABLE (w38's documented
    // contract — history is append-only until retention)
    assert(UnifiedIndex.postingsLiveAt(cat, g0)._2
      .filter(col("doc_id") <= 4).count() == 4)
    // retention: keep only the post-fold head — the pre-erase
    // generations expire and their data directories reclaim
    val dropped = cat.vacuum(keepLast = 1)
    assert(dropped.contains(g0), s"vacuum kept the pre-erase generation: $dropped")
    // the expired snapshot no longer serves (destruction is absolute)
    intercept[Exception] {
      UnifiedIndex.postingsLiveAt(cat, g0)._2.count()
    }
    // ...and the erased rows' BYTES are gone: no parquet file under
    // the member directories still holds a forgotten doc (the GDPR
    // assertion — masking hides, folding rewrites, vacuum destroys)
    Seq("doclen", "positions", "sizes").foreach { m =>
      val all = spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$root/tables/$m")
      val key = if (m == "sizes") "id" else "doc_id"
      assert(all.filter(col(key) <= 4).isEmpty,
        s"erased bytes of $m survive on disk after vacuum")
    }
    // the live head is untouched by retention
    assert(UnifiedIndex.postingsLive(cat)._2.count() == 6)
  }

  test("a tag pins its append-chain cut through vacuum, kill floors replayed at the tag") {
    import graft.streaming.UnifiedIndex
    val root = java.nio.file.Files.createTempDirectory("graft-tagchain")
      .toFile.getAbsolutePath + "/cat"
    val cat = new TableCatalog(spark, root)
    val docs = corpus10
    // THREE ingest batches: the tagged cut's members are CHAINS of
    // three append segments — the retention case the snapshot-member
    // tag tests never exercise (a chain pins old directories
    // transitively; losing any one segment corrupts the cut)
    (0 until 3).foreach(i => UnifiedIndex.commitBatch(cat,
      docs.filter(col("doc_id") % 3 === i), i.toLong))
    // a forget BEFORE the tag: the tagged cut has an ACTIVE floor
    UnifiedIndex.delete(cat, docs.filter(col("doc_id") === 4)
      .select("doc_id"), 3L)
    val gTag = cat.createTag("cut")
    assert(cat.appendVersions(gTag)("sizes").size == 3,
      "fixture broke: the tagged cut must be a 3-segment chain")
    val tagServe = UnifiedIndex.postingsLiveAt(cat, gTag)._2
      .collect().map(_.toSeq).toSet
    assert(!tagServe.exists(_.head == 4L),
      "the tag-time serve must replay the tag-time floor")
    // churn past the tag: more forgets, then the fold rewrites the
    // head to snapshot members (the chains become garbage to every
    // generation EXCEPT the tagged one)
    UnifiedIndex.delete(cat, docs.filter(col("doc_id") <= 3)
      .select("doc_id"), 4L)
    assert(IndexMaintenance.compactUnifiedIfNeeded(cat, 5L).nonEmpty)
    val dropped = cat.vacuum(keepLast = 1)
    assert(dropped.nonEmpty && !dropped.contains(gTag))
    // every segment directory of the tagged chain is still on disk
    cat.appendVersions(gTag).foreach { case (m, chain) =>
      chain.foreach { v =>
        assert(new java.io.File(s"$root/tables/$m/v=$v").exists(),
          s"vacuum reclaimed tagged chain segment $m/v=$v")
      }
    }
    // ...and the tag serves bit-identically after the sweep, floors
    // included (the head, meanwhile, reflects the later churn)
    assert(UnifiedIndex.postingsLiveAt(cat, cat.tagGeneration("cut"))._2
      .collect().map(_.toSeq).toSet == tagServe,
      "the tagged cut's serve changed across vacuum")
    assert(UnifiedIndex.postingsLive(cat)._2
      .filter(col("doc_id") <= 4).isEmpty)
    // drop the tag: the next vacuum reclaims the cut (pin released)
    cat.dropTag("cut")
    val dropped2 = cat.vacuum(keepLast = 1)
    assert(dropped2.contains(gTag),
      "an untagged cut must become reclaimable")
  }

  test("unified index: positions fold in the same transact; erase-before-admit survives it") {
    import graft.streaming.UnifiedIndex
    val cat = tmpCat("graft-uniposc")
    val docs = corpus10
    // the erase request RACES AHEAD of its document: id 99 not admitted
    UnifiedIndex.delete(cat, Seq(99L).toDF("doc_id"), 0L)
    UnifiedIndex.commitBatch(cat, docs, 1L)
    // cross the trigger with admitted deletes (4/10 masked ≥ 0.3)
    UnifiedIndex.delete(cat, docs.filter(col("doc_id") <= 4)
      .select("doc_id"), 2L)
    val livePre = UnifiedIndex.positionsLive(cat).collect().map(_.toSeq).toSet
    assert(IndexMaintenance.compactUnifiedIfNeeded(cat, 3L).nonEmpty)
    // the sixth relation folded with the other five...
    assert(cat.read("positions").filter(col("doc_id") <= 4).isEmpty,
      "positions kept folded rows")
    assert(UnifiedIndex.membershipConsistent(cat),
      "compaction tore positions from the other families")
    // ...and folding is a pure execution event for phrase serving
    assert(UnifiedIndex.positionsLive(cat).collect().map(_.toSeq).toSet
      == livePre, "compacted positional serve diverged from the masked one")
    // the never-admitted erase SURVIVED the fold (durable ledger)...
    assert(cat.read("tombstones").collect().map(_.getLong(0)).toSet
      == Set(99L), "compaction dropped a pending erase request")
    // ...and masks the doc the moment it is finally admitted
    UnifiedIndex.commitBatch(cat,
      Seq(99L -> "late arrival text late arrival").toDF("doc_id", "text"), 4L)
    val (_, _, sizes) = UnifiedIndex.lshLive(cat)
    val (tf, dl) = UnifiedIndex.postingsLive(cat)
    assert(sizes.filter(col("id") === 99L).isEmpty
        && tf.filter(col("doc_id") === 99L).isEmpty
        && dl.filter(col("doc_id") === 99L).isEmpty
        && UnifiedIndex.positionsLive(cat)
          .filter(col("doc_id") === 99L).isEmpty,
      "an erased-before-admission doc was served after admission")
    // now MATCHED, the tombstone folds away at the next compaction
    assert(IndexMaintenance.compactUnifiedIfNeeded(cat, 5L,
      threshold = 1e-9).nonEmpty)
    assert(cat.read("tombstones").isEmpty,
      "a matched tombstone survived its compaction")
    assert(cat.read("sizes").filter(col("id") === 99L).isEmpty,
      "the erased doc's rows survived the fold")
  }
}
