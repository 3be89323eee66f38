package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Model-based randomized check of the catalog's FULL operation
  * surface — commit, clone, rename, drop, vacuum — against an
  * in-memory reference model. The targeted specs pin each operation
  * alone; this pins their INTERACTIONS (a clone of a renamed table, a
  * drop after a clone, vacuum across all of it), where
  * location-indirection bugs would actually bite: the model tracks
  * per-generation (name → rows) with no notion of physical location,
  * so any indirection mistake — a clone drifting with its source, a
  * vacuum reclaiming a dir a kept clone still needs, a rename
  * resurrecting a dropped name — surfaces as a read/model mismatch.
  */
class TableCatalogPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshRoot(): String = {
    val d = Files.createTempDirectory("graft-cat-prop").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/cat"
  }

  private def df(rows: Seq[Long]) = {
    import spark.implicits._
    rows.toDF("v")
  }

  private def readSet(cat: TableCatalog, g: Long, t: String): Seq[Long] =
    cat.readAt(g, t).collect().map(_.getLong(0)).toSeq.sorted

  test("random op interleavings: every kept generation reads back the model") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 2).foreach { round =>
      val cat = new TableCatalog(spark, freshRoot())
      // model: per catalog generation, the full (name -> rows) cut;
      // genOffset = how many leading generations vacuum removed
      var model = Vector.empty[Map[String, Seq[Long]]]
      var nextName = 0
      var ts = 0L
      def name(): String = { nextName += 1; s"t$nextName" }
      def live: Map[String, Seq[Long]] = model.lastOption.getOrElse(Map.empty)
      var dropped = 0 // generations vacuumed off the front
      def tick(): Long = { ts += 1000; ts }

      (1 to 28).foreach { _ =>
        val names = live.keys.toSeq.sorted
        rnd.nextInt(10) match {
          case r if r <= 4 || names.isEmpty => // commit 1-2 tables (new or existing)
            val targets = (1 to 1 + rnd.nextInt(2)).map { _ =>
              if (names.nonEmpty && rnd.nextBoolean()) names(rnd.nextInt(names.size))
              else name()
            }.distinct
            val data = targets.map(t =>
              t -> Seq.fill(1 + rnd.nextInt(6))(rnd.nextInt(1000).toLong)).toMap
            cat.commitAll(data.map { case (t, v) => t -> df(v) }, tick())
            model = model :+ (live ++ data)
          case 5 => // clone to a fresh name
            val src = names(rnd.nextInt(names.size))
            val dst = name()
            cat.cloneTable(src, dst, tick())
            model = model :+ (live + (dst -> live(src)))
          case 6 => // RESTORE to a random kept generation: the head's
            // table map becomes that cut's (dropped names revive,
            // later names vanish), as one new generation — and the
            // restored entries' old version dirs must survive any
            // LATER vacuum exactly like clone pins do
            val target = dropped + rnd.nextInt(model.size - dropped)
            cat.restore(target.toLong, tick())
            model = model :+ model(target)
          case 7 => // rename to a fresh name
            val from = names(rnd.nextInt(names.size))
            val to = name()
            cat.renameTable(from, to, tick())
            model = model :+ (live - from + (to -> live(from)))
          case 8 if names.size > 1 => // drop (keep at least one table)
            val t = names(rnd.nextInt(names.size))
            cat.dropTable(t, tick())
            model = model :+ (live - t)
          case 9 if model.size - dropped > 2 => // vacuum a random window
            val keep = 1 + rnd.nextInt(model.size - dropped - 1)
            cat.vacuum(keepLast = keep)
            dropped = model.size - keep
          case _ => // skew toward commits when a branch is inapplicable
            val t = if (names.nonEmpty) names(rnd.nextInt(names.size)) else name()
            val v = Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(1000).toLong)
            cat.commitAll(Map(t -> df(v)), tick())
            model = model :+ (live + (t -> v))
        }
        // latest cut always matches the model exactly
        val g = cat.latestGeneration().get
        assert(g == model.size - 1, s"generation drift: $g vs ${model.size - 1}")
        live.foreach { case (t, rows) =>
          assert(readSet(cat, g, t) == rows.sorted,
            s"round $round: latest read of '$t' diverged from the model")
        }
        assert(cat.tableVersions(g).keySet == live.keySet)
      }
      // every KEPT generation still reads back its full historical cut
      (dropped until model.size).foreach { g =>
        model(g).foreach { case (t, rows) =>
          assert(readSet(cat, g.toLong, t) == rows.sorted,
            s"round $round: time travel to g=$g table '$t' diverged")
        }
      }
    }
  }

  /** Branch/tag interleavings against an in-memory model: main state,
    * per-branch state with a base-version staleness marker (publish
    * must fast-forward exactly when main has not advanced past the
    * branch's base), and tag snapshots that survive everything
    * including vacuum. The targeted BranchSpec pins each behavior
    * alone; this pins the interactions — a publish racing a main
    * commit, a tag over a branch-published cut, vacuum across live
    * branches — where per-ref healing or lineage bugs would bite.
    */
  test("random branch/tag/publish interleavings match the ref model") {
    val rnd = new scala.util.Random(99173L)
    (1 to 2).foreach { round =>
      val cat = new TableCatalog(spark, freshRoot())
      var ts = 0L
      def tick(): Long = { ts += 1000; ts }
      var main = Map("t0" -> Seq(1L, 2L))
      cat.commitAll(main.map { case (t, v) => t -> df(v) }, tick())
      var mainVer = 0
      var nextB = 0
      // branch -> (state, baseVersion, committedSinceBase)
      var branches = Map.empty[String, (Map[String, Seq[Long]], Int, Boolean)]
      var tags = Map.empty[String, Map[String, Seq[Long]]]
      var nGens = 1 // generations ever logged (for vacuum keepLast)

      (1 to 30).foreach { _ =>
        rnd.nextInt(12) match {
          case r if r <= 2 => // commit to main
            val data = Map(s"t${rnd.nextInt(3)}" ->
              Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(1000).toLong))
            cat.commitAll(data.map { case (t, v) => t -> df(v) }, tick())
            main = main ++ data; mainVer += 1; nGens += 1
          case 3 | 4 => // create branch at main head
            nextB += 1; val b = s"b$nextB"
            cat.createBranch(b)
            branches += b -> (main, mainVer, false)
          case 5 | 6 | 7 if branches.nonEmpty => // commit on a branch
            val b = branches.keys.toSeq.sorted.apply(
              rnd.nextInt(branches.size))
            val (st, base, _) = branches(b)
            val data = Map(s"t${rnd.nextInt(3)}" ->
              Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(1000).toLong))
            cat.commitAllOn(b, data.map { case (t, v) => t -> df(v) }, tick())
            branches += b -> (st ++ data, base, true); nGens += 1
          case 8 if branches.nonEmpty => // publish: FF or conflict
            val b = branches.keys.toSeq.sorted.apply(
              rnd.nextInt(branches.size))
            val (st, base, committed) = branches(b)
            if (base == mainVer) {
              cat.publishBranch(b)
              main = st
              // a no-commit publish is a pointer no-op: main's head
              // does not move, so other branches stay fast-forwardable
              if (committed) mainVer += 1
              branches += b -> (st, mainVer, false)
            } else {
              intercept[TableCatalog.CommitConflictException] {
                cat.publishBranch(b)
              }
              // conflicted: recover by re-branching the model's way
              cat.dropBranch(b)
              branches -= b
            }
          case 9 => // tag the current main cut
            val t = s"tag${tags.size}"
            cat.createTag(t)
            tags += t -> main
          case 10 if nGens > 2 => // vacuum a random window
            cat.vacuum(keepLast = 1 + rnd.nextInt(2))
          case _ if branches.nonEmpty && rnd.nextBoolean() => // drop a branch
            val b = branches.keys.toSeq.sorted.apply(
              rnd.nextInt(branches.size))
            cat.dropBranch(b); branches -= b
          case _ => ()
        }
        // invariants after EVERY op
        val g = cat.latestGeneration().get
        main.foreach { case (t, rows) =>
          assert(readSet(cat, g, t) == rows.sorted,
            s"round $round: main read of '$t' diverged") }
        branches.foreach { case (b, (st, _, _)) =>
          st.foreach { case (t, rows) =>
            assert(cat.readRef(b, t).collect().map(_.getLong(0)).sorted
              .toSeq == rows.sorted,
              s"round $round: branch $b read of '$t' diverged") } }
        tags.foreach { case (tg, st) =>
          st.foreach { case (t, rows) =>
            assert(cat.readTag(tg, t).collect().map(_.getLong(0)).sorted
              .toSeq == rows.sorted,
              s"round $round: tag $tg read of '$t' diverged") } }
      }
    }
  }
}
