package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.InvertedIndex
import graft.sources.TableCatalog

/** Property-based check of the unified index's cross-family contract:
  * for ANY interleaving of ingest batches, RECRAWLS (replace=true kill
  * floors), forgets, redeliveries, and fraction-triggered compactions,
  * (a) the membership invariant holds at every generation, (b) every
  * family's live (id, rev) set equals an independent sequential
  * interpreter's surviving revisions (the interpreter replays the
  * kill-floor arithmetic in plain Scala — max floor per id, pending
  * erases surviving folds, post-fold revival), and (c) the stored
  * token sequences ARE the live revision's text — whether floors are
  * currently masked or folded is invisible.
  */
class UnifiedIndexPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  sealed trait Step
  case class Ingest(docs: List[(Long, String)]) extends Step
  case class Recrawl(docs: List[(Long, String)]) extends Step
  case class Delete(ids: List[Long]) extends Step
  case object Compact extends Step
  case object RedeliverLast extends Step

  private val words = Vector("alpha", "beta", "merge", "scan", "", "x")
  private def textGen: Gen[String] = for {
    n <- Gen.choose(0, 5)
    ws <- Gen.listOfN(n, Gen.oneOf(words))
  } yield ws.mkString(" ")

  // ids are drawn fresh per ingest from a counter the driver owns, so
  // every doc REVISION lands in exactly one batch (the maintenance
  // contract); recrawls and deletes draw from the already-issued range
  private def stepsGen: Gen[List[Step]] = {
    var nextId = 0L
    def ingest: Gen[Step] = for {
      n <- Gen.choose(1, 4)
      texts <- Gen.listOfN(n, textGen)
    } yield Ingest(texts.map { t => nextId += 1; (nextId, t) })
    // recrawls/deletes reference ISSUED ids only — before any ingest
    // they degrade to an ingest (an id fabricated ahead of the counter
    // would later collide with a fresh ingest of the same id, which is
    // exactly what the upstream admission gate makes impossible)
    def recrawl: Gen[Step] = Gen.delay {
      if (nextId == 0) ingest
      else for {
        n <- Gen.choose(1, 2)
        ids <- Gen.listOfN(n, Gen.choose(1L, nextId))
        texts <- Gen.listOfN(n, textGen)
      } yield Recrawl(ids.distinct.zip(texts))
    }
    def delete: Gen[Step] = Gen.delay {
      if (nextId == 0) ingest
      else for {
        n <- Gen.choose(1, 3)
        ids <- Gen.listOfN(n, Gen.choose(1L, nextId))
      } yield Delete(ids.distinct)
    }
    Gen.listOfN(7, Gen.frequency(3 -> ingest, 2 -> recrawl, 2 -> delete,
      1 -> Gen.const(Compact), 1 -> Gen.const(RedeliverLast)))
  }

  private def samples[T](gen: Gen[T], n: Int, seed: Long = 7L): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(seed + i)))

  test("streaming binding: a real foreachBatch stream maintains both families") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val cat = new TableCatalog(spark, java.nio.file.Files
      .createTempDirectory("graft-unistream").toFile.getAbsolutePath + "/cat")
    val q = ms.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-unistream-ckpt").toFile.getAbsolutePath)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        UnifiedIndex.commitBatch(cat, batch, id); ()
      }
      .start()
    try {
      ms.addData(1L -> "alpha beta gamma", 2L -> "the quick fox")
      q.processAllAvailable()
      ms.addData(3L -> "merge scan filter")
      q.processAllAvailable()
    } finally q.stop()
    assert(cat.loggedGenerations() == Seq(0L, 1L))
    (0L to 1L).foreach(g => assert(UnifiedIndex.membershipConsistent(cat, Some(g))))
    assert(cat.read("doclen").count() == 3)
    assert(cat.read("sizes").count() == 3)
    // a crash-replay of micro-batch 1 through the same sink no-ops
    assert(UnifiedIndex.commitBatch(cat,
      Seq(3L -> "merge scan filter").toDF("doc_id", "text"), 1L) == -1L)
    // a RECRAWL feed binds the same way: replace=true per micro-batch
    val ms2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q2 = ms2.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-unistream-ckpt2").toFile.getAbsolutePath)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        UnifiedIndex.commitBatch(cat, batch, 100L + id, replace = true); ()
      }
      .start()
    try {
      ms2.addData(2L -> "replaced text entirely")
      q2.processAllAvailable()
    } finally q2.stop()
    assert(UnifiedIndex.membershipConsistent(cat))
    val (_, dl) = UnifiedIndex.postingsLive(cat)
    assert(dl.count() == 3, "recrawl must replace, not add")
    assert(dl.filter($"doc_id" === 2L).head().getAs[Long]("dl") == 3L,
      "the stream-maintained recrawl is not serving its new text")
  }

  test("any interleaving: families stay in lockstep and serve the interpreter's corpus") {
    samples(stepsGen, 6).zipWithIndex.foreach { case (steps, i) =>
      val cat = new TableCatalog(spark, java.nio.file.Files
        .createTempDirectory(s"graft-uniprop$i").toFile.getAbsolutePath + "/cat")
      // the independent interpreter mirrors the REVISION semantics:
      // physical rows per (id, rev) and per-id kill floors — exactly
      // what the catalog holds, derived sequentially in plain Scala
      def toks(t: String) = t.trim.split("\\s+").filter(_.nonEmpty).toList
      var revs = Map.empty[Long, List[(Long, List[String])]] // id -> (rev, toks)*
      var floors = Map.empty[Long, Long]                     // id -> max kill floor
      // the RIDER member (w39's extraMembers contract) rides every
      // commit: one (id, feat) row per admitted doc — 0-token docs
      // included, unlike the text families
      var riderRevs = Map.empty[Long, List[(Long, Long)]]    // id -> (rev, feat)*
      def floorOf(id: Long) = floors.getOrElse(id, Long.MinValue)
      var batchId = 0L
      var compactSeq = 0L
      var last: Option[Step] = None
      def addRev(id: Long, t: String): Unit = {
        val tk = toks(t)
        if (tk.nonEmpty) revs += id -> (revs.getOrElse(id, Nil) :+ (batchId, tk))
        riderRevs += id ->
          (riderRevs.getOrElse(id, Nil) :+ (batchId, tk.size.toLong))
      }
      def riderDf(docs: List[(Long, String)]) =
        docs.map { case (id, t) => (id, toks(t).size.toLong) }
          .toDF("id", "feat")
      def doCompact(): Unit = {
        // the interpreter's trigger replay: ≥1 dead SIZES row (a dead
        // revision of a ≥1-token doc) with tombstone rows present
        val total = revs.valuesIterator.map(_.size).sum
        val dead = revs.iterator.map { case (id, rs) =>
          rs.count(_._1 < floorOf(id)) }.sum
        val shouldFire = floors.nonEmpty && total > 0 && dead > 0
        val fired = IndexMaintenance.compactUnifiedIfNeeded(cat,
          100000L + compactSeq, threshold = 1e-9)
        compactSeq += 1
        assert(fired.nonEmpty == shouldFire,
          s"sample $i: trigger fired=${fired.nonEmpty}, model says $shouldFire")
        if (shouldFire) {
          // pending erases (∞ floor, no rows to destroy in ANY
          // id-bearing member — riders included) survive the fold;
          // every satisfied floor goes with the rows it masked — so a
          // LATER recrawl of a folded-erase id revives by design. An
          // erase whose only rows lived in the rider (a 0-token doc)
          // is SATISFIED by destroying those rider rows: the tombstone
          // folds with them, it must not linger to mask a legitimate
          // re-admission (ADVICE r12 — an erase is not a forever-ban).
          val pending = floors.filter { case (id, f) =>
            f == Long.MaxValue && revs.getOrElse(id, Nil).isEmpty &&
              riderRevs.getOrElse(id, Nil).isEmpty }
          revs = revs.map { case (id, rs) =>
            id -> rs.filter(_._1 >= floorOf(id)) }.filter(_._2.nonEmpty)
          riderRevs = riderRevs.map { case (id, rs) =>
            id -> rs.filter(_._1 >= floorOf(id)) }.filter(_._2.nonEmpty)
          floors = pending
        }
      }
      steps.foreach {
        case st @ Ingest(docs) =>
          UnifiedIndex.commitBatch(cat, docs.toDF("doc_id", "text"), batchId,
            extraMembers = Map("codes" -> riderDf(docs)))
          docs.foreach { case (id, t) => addRev(id, t) }
          last = Some(st); batchId += 1
        case st @ Recrawl(docs) =>
          UnifiedIndex.commitBatch(cat, docs.toDF("doc_id", "text"), batchId,
            replace = true, extraMembers = Map("codes" -> riderDf(docs)))
          docs.foreach { case (id, t) =>
            floors += id -> math.max(floorOf(id), batchId)
            addRev(id, t)
          }
          last = Some(st); batchId += 1
        case st @ Delete(ids) =>
          UnifiedIndex.delete(cat, ids.toDF("doc_id"), batchId)
          ids.foreach(id => floors += id -> Long.MaxValue)
          last = Some(st); batchId += 1
        case Compact => doCompact()
        case RedeliverLast =>
          // crash-replay of the previous micro-batch: must no-op and
          // must NOT disturb the model (a compaction in between does
          // not reopen the window — the batch ledger is generation-
          // independent)
          last.foreach {
            case Ingest(docs) =>
              assert(UnifiedIndex.commitBatch(cat,
                docs.toDF("doc_id", "text"), batchId - 1) == -1L)
            case Recrawl(docs) =>
              assert(UnifiedIndex.commitBatch(cat,
                docs.toDF("doc_id", "text"), batchId - 1,
                replace = true) == -1L)
            case Delete(ids) =>
              assert(UnifiedIndex.delete(cat,
                ids.toDF("doc_id"), batchId - 1) == -1L)
            case _ => ()
          }
        }
      val built = cat.latestGeneration()
        .exists(g => cat.memberNames(g).contains("sizes"))
      if (!built) () // no ingest ever happened: nothing to serve
      else {
        // sometimes fold at the end too: serving must not change
        if (i % 2 == 0) doCompact()
        // at most one revision of an id can clear its floor (every
        // non-newest revision sits under the floor of the recrawl
        // that superseded it); the interpreter's live corpus
        val live: Map[Long, List[String]] = revs.flatMap { case (id, rs) =>
          val alive = rs.filter(_._1 >= floorOf(id))
          assert(alive.size <= 1,
            s"sample $i: model invariant broke: id=$id rs=$rs floors=$floors steps=$steps")
          alive.headOption.map(r => id -> r._2)
        }
        // (a) lockstep at every surviving generation — and the
        // O(aggregate) fast detector agrees with the exceptAll
        // forensic on every consistent state
        cat.loggedGenerations().foreach { g =>
          assert(UnifiedIndex.membershipConsistent(cat, Some(g)),
            s"sample $i: generation $g tore the families apart")
          assert(UnifiedIndex.membershipConsistentFast(cat, Some(g)),
            s"sample $i: fast detector false-alarmed at generation $g")
        }
        // (b) both live id sets == interpreter's surviving revisions
        val expected = live.keySet
        val (_, _, sizes) = UnifiedIndex.lshLive(cat)
        val (_, dl) = UnifiedIndex.postingsLive(cat)
        val gateIds = sizes.select("id").collect().map(_.getLong(0)).toSet
        val retrIds = dl.select("doc_id").collect().map(_.getLong(0)).toSet
        assert(gateIds == expected, s"sample $i: gate ids diverged")
        assert(retrIds == expected, s"sample $i: retrieval ids diverged")
        // (c) doclen values match the live revision's token counts —
        // a recrawled doc MUST serve its newest text's length
        val dlMap = dl.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(dlMap == live.map { case (id, tk) => id -> tk.size.toLong },
          s"sample $i: doc lengths diverged")
        // (d) the positional member rides the SAME lifecycle: live ids
        // in lockstep and the stored token sequence IS the live
        // revision's text (one stale-revision position row anywhere
        // would corrupt the sequence)
        val posLive = UnifiedIndex.positionsLive(cat)
        val posIds = posLive.select("doc_id").distinct()
          .collect().map(_.getLong(0)).toSet
        assert(posIds == expected, s"sample $i: positional ids diverged")
        val posSeq = posLive.collect()
          .groupBy(_.getLong(0))
          .map { case (id, rows) =>
            id -> rows.sortBy(_.getLong(1)).map(_.getString(2)).toList
          }
        assert(posSeq == live, s"sample $i: stored token sequences diverged")
        // (e) the RIDER member rides the same lifecycle: exactly the
        // newest unmasked (id, rev, feat) rows serve — including rows
        // for 0-token docs the text families never see — and folds
        // (auto-discovered) destroyed everything below a floor
        val riderGot = UnifiedIndex.memberLive(cat, "codes", "id")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val riderExp = riderRevs.flatMap { case (id, rs) =>
          val alive = rs.filter(_._1 >= floorOf(id))
          assert(alive.size <= 1, s"sample $i: rider model invariant broke")
          alive.headOption.map(r => (id, r._2, r._1)) // (id, feat, rev)
        }.toSet
        assert(riderGot == riderExp, s"sample $i: rider member diverged")
      }
    }
  }

  test("torn states: the fast detector flags everything the exceptAll path does") {
    import graft.sources.TableCatalog
    def freshCat(tag: String) = new TableCatalog(spark, java.nio.file.Files
      .createTempDirectory(s"graft-torn$tag").toFile.getAbsolutePath + "/cat")
    def ids(xs: Long*) = xs.toDF("id").withColumn("rev", lit(0L))
    def docIds(xs: Long*) = xs.toDF("doc_id").withColumn("dl", lit(1L))
      .withColumn("rev", lit(0L))
    def posRows(xs: Long*) = xs.toDF("doc_id")
      .withColumn("pos", lit(1L)).withColumn("tok", lit("x"))
      .withColumn("rev", lit(0L))
    def both(cat: TableCatalog): (Boolean, Boolean) =
      (UnifiedIndex.membershipConsistent(cat),
        UnifiedIndex.membershipConsistentFast(cat))
    // a missing family: the original w32 torn window
    val c1 = freshCat("missing")
    c1.commitAll(Map(
      "sizes" -> ids(1L, 2L).withColumn("n", lit(3L)),
      "doclen" -> docIds(1L, 2L)), 0L)
    assert(both(c1) == (false, false), "missing positional family")
    // same COUNT, different ids: only the hash sum can see it
    val c2 = freshCat("swap")
    c2.commitAll(Map(
      "sizes" -> ids(1L, 2L).withColumn("n", lit(3L)),
      "doclen" -> docIds(1L, 3L),
      "positions" -> posRows(1L, 2L)), 0L)
    assert(both(c2) == (false, false), "count-preserving id swap")
    // an id stranded in one family
    val c3 = freshCat("strand")
    c3.commitAll(Map(
      "sizes" -> ids(1L, 2L, 3L).withColumn("n", lit(3L)),
      "doclen" -> docIds(1L, 2L),
      "positions" -> posRows(1L, 2L)), 0L)
    assert(both(c3) == (false, false), "id stranded in the gate only")
    // a DUPLICATED per-doc row (multiset tear)
    val c4 = freshCat("dup")
    c4.commitAll(Map(
      "sizes" -> ids(1L, 2L).withColumn("n", lit(3L)),
      "doclen" -> docIds(1L, 1L, 2L),
      "positions" -> posRows(1L, 2L)), 0L)
    assert(both(c4) == (false, false), "duplicated doclen row")
    // a RECRAWL tear: id 1's new revision landed in the gate and
    // retrieval but not positions — the id is present everywhere, only
    // the per-REVISION compare can see it (the torn window the
    // replace=true path closes)
    val c6 = freshCat("revskew")
    def withRev(df: org.apache.spark.sql.DataFrame, r: Long) =
      df.drop("rev").withColumn("rev", lit(r))
    c6.commitAll(Map(
      "sizes" -> ids(1L, 2L).withColumn("n", lit(3L))
        .unionByName(withRev(ids(1L).withColumn("n", lit(3L)), 1L)),
      "doclen" -> docIds(1L, 2L).unionByName(withRev(docIds(1L), 1L)),
      "positions" -> posRows(1L, 2L)), 0L)
    assert(both(c6) == (false, false), "recrawl revision skew")
    // and the healthy state passes both
    val c5 = freshCat("ok")
    c5.commitAll(Map(
      "sizes" -> ids(1L, 2L).withColumn("n", lit(3L)),
      "doclen" -> docIds(1L, 2L),
      "positions" -> posRows(1L, 2L)), 0L)
    assert(both(c5) == (true, true), "healthy state")
  }
}
