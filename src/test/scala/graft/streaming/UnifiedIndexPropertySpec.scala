package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.InvertedIndex
import graft.sources.TableCatalog

/** Property-based check of the unified index's cross-family contract:
  * for ANY interleaving of ingest batches, deletes, redeliveries, and
  * fraction-triggered compactions, (a) the membership invariant holds
  * at every generation, (b) both families' live id sets equal an
  * independent sequential interpreter's surviving ≥1-token docs, and
  * (c) phrase serving from the live positions-free index matches the
  * interpreter's corpus — whether tombstones are currently masked or
  * folded is invisible.
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
  case class Delete(ids: List[Long]) extends Step
  case object RedeliverLast extends Step

  private val words = Vector("alpha", "beta", "merge", "scan", "", "x")
  private def textGen: Gen[String] = for {
    n <- Gen.choose(0, 5)
    ws <- Gen.listOfN(n, Gen.oneOf(words))
  } yield ws.mkString(" ")

  // ids are drawn fresh per ingest from a counter the driver owns, so
  // every doc lands in exactly one batch (the maintenance contract)
  private def stepsGen: Gen[List[Step]] = {
    var nextId = 0L
    def ingest: Gen[Step] = for {
      n <- Gen.choose(1, 4)
      texts <- Gen.listOfN(n, textGen)
    } yield Ingest(texts.map { t => nextId += 1; (nextId, t) })
    def delete: Gen[Step] = for {
      n <- Gen.choose(1, 3)
      ids <- Gen.listOfN(n, Gen.choose(1L, math.max(1L, nextId)))
    } yield Delete(ids.distinct)
    Gen.listOfN(6, Gen.frequency(3 -> ingest, 2 -> delete,
      1 -> Gen.const(RedeliverLast)))
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
  }

  test("any interleaving: families stay in lockstep and serve the interpreter's corpus") {
    samples(stepsGen, 6).zipWithIndex.foreach { case (steps, i) =>
      val cat = new TableCatalog(spark, java.nio.file.Files
        .createTempDirectory(s"graft-uniprop$i").toFile.getAbsolutePath + "/cat")
      // the independent interpreter: id -> text of live docs
      var model = Map.empty[Long, String]
      var batchId = 0L
      var last: Option[(Boolean, Any)] = None // (isIngest, payload)
      steps.foreach {
        case Ingest(docs) =>
          UnifiedIndex.commitBatch(cat, docs.toDF("doc_id", "text"), batchId)
          model ++= docs
          last = Some((true, docs)); batchId += 1
        case Delete(ids) =>
          UnifiedIndex.delete(cat, ids.toDF("doc_id"), batchId)
          model --= ids
          last = Some((false, ids)); batchId += 1
        case RedeliverLast =>
          // crash-replay of the previous micro-batch: must no-op and
          // must NOT disturb the model
          last.foreach {
            case (true, docs: List[(Long, String)] @unchecked) =>
              assert(UnifiedIndex.commitBatch(cat,
                docs.toDF("doc_id", "text"), batchId - 1) == -1L)
            case (false, ids: List[Long] @unchecked) =>
              assert(UnifiedIndex.delete(cat,
                ids.toDF("doc_id"), batchId - 1) == -1L)
            case _ => ()
          }
        }
      val built = cat.latestGeneration()
        .exists(g => cat.memberNames(g).contains("sizes"))
      if (!built) () // no ingest ever happened: nothing to serve
      else {
        // sometimes fold the tombstones: serving must not change
        if (i % 2 == 0)
          IndexMaintenance.compactUnifiedIfNeeded(cat, 1000L, threshold = 1e-9)
        // (a) lockstep at every surviving generation — and the
        // O(aggregate) fast detector agrees with the exceptAll
        // forensic on every consistent state
        cat.loggedGenerations().foreach { g =>
          assert(UnifiedIndex.membershipConsistent(cat, Some(g)),
            s"sample $i: generation $g tore the families apart")
          assert(UnifiedIndex.membershipConsistentFast(cat, Some(g)),
            s"sample $i: fast detector false-alarmed at generation $g")
        }
        // (b) both live id sets == interpreter's ≥1-token survivors
        val expected = model.collect {
          case (id, t) if t.trim.split("\\s+").exists(_.nonEmpty) => id
        }.toSet
        val (_, _, sizes) = UnifiedIndex.lshLive(cat)
        val (_, dl) = UnifiedIndex.postingsLive(cat)
        val gateIds = sizes.select("id").collect().map(_.getLong(0)).toSet
        val retrIds = dl.select("doc_id").collect().map(_.getLong(0)).toSet
        assert(gateIds == expected, s"sample $i: gate ids diverged")
        assert(retrIds == expected, s"sample $i: retrieval ids diverged")
        // (c) doclen values match the interpreter's token counts
        val dlMap = dl.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val expDl = model.collect {
          case (id, t) if t.trim.split("\\s+").exists(_.nonEmpty) =>
            id -> t.trim.split("\\s+").count(_.nonEmpty).toLong
        }
        assert(dlMap == expDl.toMap, s"sample $i: doc lengths diverged")
        // (d) the positional member rides the SAME lifecycle: live ids
        // in lockstep, per-doc position counts equal the doc lengths,
        // and the stored token sequence IS the interpreter's text
        val posLive = UnifiedIndex.positionsLive(cat)
        val posIds = posLive.select("doc_id").distinct()
          .collect().map(_.getLong(0)).toSet
        assert(posIds == expected, s"sample $i: positional ids diverged")
        val posSeq = posLive.collect()
          .groupBy(_.getLong(0))
          .map { case (id, rows) =>
            id -> rows.sortBy(_.getLong(1)).map(_.getString(2)).toList
          }
        val expSeq = model.collect {
          case (id, t) if t.trim.split("\\s+").exists(_.nonEmpty) =>
            id -> t.trim.split("\\s+").filter(_.nonEmpty).toList
        }
        assert(posSeq == expSeq.toMap,
          s"sample $i: stored token sequences diverged")
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
