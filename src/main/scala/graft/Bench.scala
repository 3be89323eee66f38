package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Timed runs per query; the reported figure is the median, so a single
    * contended run (another process stealing the box mid-bench) cannot
    * poison a round's numbers — the outlier stays visible in `runs`.
    */
  private val Runs = 3

  /** 1-minute load average — machine-contention telemetry so a bench run
    * on a busy box is self-evidently contaminated (medians protect
    * against one bad run, not a loaded machine for the whole bench).
    */
  private def loadAvg(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split("\\s+").head.toDouble
    catch { case _: Throwable => -1.0 }

  /** (busy, total) machine jiffies from /proc/stat's aggregate cpu line.
    * busy includes STEAL — on a shared hypervisor, a neighbor VM's work
    * shows up only as steal time, and rounds 4-6 were all contaminated
    * by exactly that kind of invisible-to-loadavg-attribution noise.
    * Only the first 8 fields (user nice system idle iowait irq softirq
    * steal) are summed: the kernel already folds guest/guest_nice into
    * user/nice, so including fields 9-10 would double-count guest time
    * on VM hosts and skew the foreign-CPU share.
    */
  private def machineJiffies(): (Long, Long) =
    try {
      val v = scala.io.Source.fromFile("/proc/stat").getLines().next()
        .split("\\s+").drop(1).take(8).map(_.toLong)
      val idle = v(3) + v(4) // idle + iowait
      (v.sum - idle, v.sum)
    } catch { case _: Throwable => (0L, 0L) }

  /** Per-query medians from the newest prior round's BENCH_r*.json in
    * the cwd (the driver leaves them in the repo root). Keys are stored
    * under BOTH the artifact's key form and its id prefix, so lookups
    * work whichever name tier the prior round's precision ladder used.
    * Feeds the cross-round regression retry: a query >2× slower than
    * last round's median gets extra runs before the figure is believed —
    * round 7's v04 (0.72 s → 1.97 s under contention) motivated this.
    */
  private def priorMedians(): Map[String, Double] =
    try {
      val fs = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
        .filter(_.getName.matches("BENCH_r\\d+\\.json"))
        .sortBy(f => f.getName.replaceAll("\\D", "").toInt)
      if (fs.isEmpty) Map.empty
      else {
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(fs.last).path("parsed").path("queries")
        val it = node.fields()
        val b = Map.newBuilder[String, Double]
        while (it.hasNext) {
          val e = it.next(); val v = e.getValue.asDouble(-1.0)
          if (v >= 0) { b += e.getKey -> v; b += e.getKey.split('_').head -> v }
        }
        b.result()
      }
    } catch { case _: Throwable => Map.empty }

  /** utime+stime jiffies of THIS process (all threads — executor pool,
    * GC, codegen). comm can contain spaces, so parse after the last ')'.
    */
  private def ownJiffies(): Long =
    try {
      val s = scala.io.Source.fromFile("/proc/self/stat").mkString
      val f = s.substring(s.lastIndexOf(')') + 2).split("\\s+")
      f(11).toLong + f(12).toLong // utime, stime (fields 14,15 1-indexed)
    } catch { case _: Throwable => 0L }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val loadBefore = loadAvg()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state measurement: run every query once untimed first, at
    // the target scale factor, then time the later passes. The first pass
    // absorbs one-time plan codegen/classloading (AQE picks different
    // physical plans per data size, so warming at a smaller SF compiles
    // the wrong generated classes); the cache is cleared between runs so
    // every timed pass still performs all data work.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache() // drop per-query persists between runs
    }
    // A failed run records -1, NOT its (tiny) wall time: a query dying
    // fast — e.g. scratch disk full after an earlier query's spill —
    // would otherwise masquerade as a 4 ms success and silently poison
    // the round's medians.
    //
    // Outlier retry: a contended box inflates individual runs (never
    // deflates them — timing noise on a shared machine is one-sided), so
    // a query gets up to MaxRetries extra runs and its reported figure is
    // the median of the fastest `Runs` successful runs, when EITHER
    //  (a) its max/min run ratio exceeds RetryRatio — bursty contention
    //      (one neighbor process landing mid-query), or
    //  (b) every kept run was measured under foreign CPU pressure above
    //      ForeignThresh — uniform contention, which spread CANNOT see:
    //      round 6's q17 ran 28.8 s (quiet: ~1.5 s) with near-zero
    //      in-query spread because the box was loaded for its whole slot,
    //      so the spread-only retry never fired.
    // Foreign share per run = (machine busy jiffies − own process
    // jiffies) / total machine jiffies over the run's wall interval;
    // steal time counts as busy, so hypervisor neighbors register too.
    // Queries whose kept runs are ALL above ForeignThresh after the
    // retry budget land in the summary's `dirty` list: those medians are
    // contaminated and a cross-round reader must not treat them as
    // regressions. Retried ids stay reported as before.
    val RetryRatio = 2.0
    val MaxRetries = 3
    val ForeignThresh = 0.15
    def spreadOf(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ > 0.05) // sub-50ms queries: ratio is all jitter
      if (ok.isEmpty) 1.0 else ok.max / ok.min
    }
    // kept set = fastest `Runs` successful runs (one-sided noise model)
    def kept(xs: Seq[(Double, Double)]): Seq[(Double, Double)] = {
      val ok = xs.filter(_._1 >= 0).sortBy(_._1).take(Runs)
      if (ok.nonEmpty) ok else Seq((-1.0, 0.0))
    }
    def keptTimes(xs: Seq[(Double, Double)]): Seq[Double] = kept(xs).map(_._1)
    // a query is clean once SOME kept run saw an acceptably quiet box
    def allKeptForeign(xs: Seq[(Double, Double)]): Boolean =
      kept(xs).forall { case (t, f) => t >= 0 && f > ForeignThresh }
    val benchJ0 = machineJiffies(); val benchOwn0 = ownJiffies()
    val prior = priorMedians()
    // cross-round regression trigger: current kept-median >2× last
    // round's median (prior ≥ 0.15 s — below that the ratio is jitter).
    // Retrying can't fix a REAL regression, but it stops a one-slot
    // contended box from printing a phantom one (r6 q17: 28.8 s).
    def regressed(name: String, runs: Seq[(Double, Double)]): Boolean = {
      val cur = { val k = keptTimes(runs); k.sorted.apply(k.size / 2) }
      cur >= 0 && prior.get(name).orElse(prior.get(name.split('_').head))
        .exists(p => p >= 0.15 && cur > RetryRatio * p)
    }
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Double) = {
      val (b0, a0) = machineJiffies(); val o0 = ownJiffies()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getClass.getName}: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      val (b1, a1) = machineJiffies(); val o1 = ownJiffies()
      val foreign =
        if (a1 <= a0) 0.0
        else math.max(0L, (b1 - b0) - (o1 - o0)).toDouble / (a1 - a0)
      spark.catalog.clearCache()
      (if (ok) dt else -1.0, foreign)
    }
    def flagged(name: String, runs: Seq[(Double, Double)]): Boolean =
      spreadOf(keptTimes(runs)) > RetryRatio || allKeptForeign(runs) ||
        regressed(name, runs)
    val results = scala.collection.mutable.LinkedHashMap[String, (Seq[(Double, Double)], Int)]()
    SparkEntry.queries.foreach { case (name, fn) =>
      var runs = (1 to Runs).map(_ => once(name, fn))
      var retries = 0
      while (flagged(name, runs) && retries < MaxRetries) {
        runs = runs :+ once(name, fn)
        retries += 1
      }
      results(name) = (runs, retries)
    }
    // Run-level backoff pass (r8 verdict item 1): immediate retries
    // can't outrun a neighbor process that owns the box for a multi-
    // minute slot — round 8's artifact printed d19 "9 s" / d36 "8 s"
    // (quiet medians 3.5 / 2.0) because every retry landed inside the
    // same contention window. If any query is still flagged after its
    // in-place retry budget, wait out the window ONCE (a real pause,
    // not more back-to-back runs) and give each flagged query a short
    // second budget on what is hopefully a quieter box.
    val BackoffMs = 30000L
    val BackoffRuns = 2
    val backoffIds = results.collect { case (k, (v, _)) if flagged(k, v) => k }.toSeq
    if (backoffIds.nonEmpty) {
      System.err.println(
        s"[bench] ${backoffIds.size} queries still contended after retries " +
          s"(${backoffIds.mkString(",")}); backing off ${BackoffMs / 1000} s")
      Thread.sleep(BackoffMs)
      for (k <- backoffIds) {
        val fn = SparkEntry.queries(k)
        var (runs, retries) = results(k)
        var extra = 0
        while (flagged(k, runs) && extra < BackoffRuns) {
          runs = runs :+ once(k, fn)
          extra += 1
        }
        results(k) = (runs, retries + extra)
      }
    }
    val loadAfter = loadAvg()
    val benchJ1 = machineJiffies()
    // whole-bench foreign CPU share — the single most honest "was this
    // run contaminated" number
    val benchForeign =
      if (benchJ1._2 <= benchJ0._2) 0.0
      else math.max(0L, (benchJ1._1 - benchJ0._1) - (ownJiffies() - benchOwn0))
        .toDouble / (benchJ1._2 - benchJ0._2)
    val retriedIds = results.collect { case (k, (_, r)) if r > 0 => k }.toSeq
    val dirtyIds = results.collect {
      case (k, (v, _)) if allKeptForeign(v) && keptTimes(v).head >= 0.05 => k
    }.toSeq
    def median(xs: Seq[(Double, Double)]): Double = {
      val k = keptTimes(xs)
      k.sorted.apply(k.size / 2)
    }
    def fmt(d: Double, decimals: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(d))
    // failed queries (median -1) stay visible per-query but don't skew
    // the total downward
    val total = results.values.map { case (v, _) => median(v) }.filter(_ >= 0).sum
    // Quiet-run total: per query, the median over only the runs whose
    // foreign-CPU share stayed under ForeignThresh (falling back to the
    // overall kept median when no quiet run exists). Emitted BESIDE the
    // headline total so a reader can tell "the code got slower" from
    // "the box was busy" without re-running anything.
    def quietMedian(xs: Seq[(Double, Double)]): Double = {
      val quiet = xs.filter { case (t, f) => t >= 0 && f <= ForeignThresh }
        .map(_._1).sorted.take(Runs)
      if (quiet.nonEmpty) quiet(quiet.size / 2) else median(xs)
    }
    val quietTotal =
      results.values.map { case (v, _) => quietMedian(v) }.filter(_ >= 0).sum
    // Run-level honesty flag: true when the whole-bench foreign share is
    // material or any query never saw a quiet run — a cross-round reader
    // must treat a contended:true artifact's regressions as unproven.
    val contended = benchForeign > 0.10 || dirtyIds.nonEmpty
    // worst per-query max/min ratio over the KEPT runs — >2 after retries
    // means contention the retry budget couldn't outrun
    val spread = results.values
      .map { case (v, _) => spreadOf(keptTimes(v)) }
      .foldLeft(1.0)(math.max)
    // Per-run detail first (may be long); the harness only keeps the LAST
    // ~2000 characters of stdout, so the machine-readable summary must be
    // the final line and must be short enough to survive that tail cut —
    // medians only, trimmed decimals. (Rounds 1-3 emitted one giant line
    // with all runs inline and the harness never managed to parse it.)
    // per-run detail: time then its foreign-CPU share, interleaved —
    // [t1,f1,t2,f2,…] — so a slow run is attributable from the artifact
    val rs = results.map { case (k, (v, _)) =>
      "\"" + k + "\":" +
        v.flatMap(p => Seq(fmt(p._1, 3), fmt(p._2, 2))).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    println(s"""{"metric":"runs","unit":"sec","runs":$rs,"sf":"$sfDir"}""")
    def summaryWith(fmtVal: Double => String,
        keyOf: String => String = identity,
        retryCap: Int = Int.MaxValue): String = {
      val qs = results
        .map { case (k, (v, _)) => "\"" + keyOf(k) + "\":" + fmtVal(median(v)) }
        .mkString("{", ",", "}")
      // sf as basename: the final line must fit the stdout tail budget
      val sf = sfDir.split('/').last
      // retried ids use the short query-id prefix; the list ships IN FULL
      // on every normal tier (a truncated retry audit hid 8 ids in r7) —
      // only the last-resort tier caps it (overflow as a "+N" marker) so
      // a pathologically contended run can't blow the tail budget
      def capped(ids: Seq[String]): String = {
        val short = ids.map(keyOf)
        (if (short.size <= retryCap) short
         else short.take(retryCap) :+ s"+${short.size - retryCap}")
          .map("\"" + _ + "\"").mkString("[", ",", "]")
      }
      s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec","quiet":${fmt(quietTotal, 2)},"contended":$contended,"queries":$qs,"sf":"$sf","load":[${fmt(loadBefore, 1)},${fmt(loadAfter, 1)}],"spread":${fmt(spread, 1)},"fcpu":${fmt(benchForeign, 2)},"retried":${capped(retriedIds)},"dirty":${capped(dirtyIds)}}"""
    }
    def summary(decimals: Int): String = summaryWith(fmt(_, decimals))
    // adaptive tier: the slow queries (the ones worth profiling) keep a
    // decimal, sub-second ones round to an integer — much shorter than
    // uniform 1-dec, far more informative than uniform 0-dec
    def adaptive: String = summaryWith(v => if (v >= 0.95) fmt(v, 1) else fmt(v, 0))
    // tighter fallback before losing all decimals: only multi-second
    // queries (the profiling targets) keep theirs
    def adaptive2: String = summaryWith(v => if (v >= 1.95) fmt(v, 1) else fmt(v, 0))
    // Last-resort tiers: keys shortened to their id prefix ("q18",
    // "d06") — every query's id is unique and is how all other round
    // artifacts (verdict, correctness rows) refer to them. At ~90
    // queries the full-name map no longer fits the tail budget at ANY
    // precision, so without this tier the ladder would emit an
    // over-budget line and get head-clipped into unparseability.
    val idOf: String => String =
      if (results.keys.map(_.split('_').head).toSet.size == results.size)
        _.split('_').head
      else identity
    def idTier(decimals: Int): String = summaryWith(fmt(_, decimals), idOf)
    def idTierCapped: String = summaryWith(fmt(_, 0), idOf, retryCap = 15)
    // Stop Spark BEFORE the final line: executor/shutdown log noise must
    // not land after the summary, or the tail cut could clip it.
    spark.stop()
    // Fit under the harness's 2000-char stdout tail (minus sbt's ~75-char
    // epilogue line): drop precision until the line fits. A too-long final
    // line would be HEAD-clipped by the tail cut and unparseable, so the
    // gate stays just under the real ~1925-char budget.
    println((Seq(summary(3), summary(2), summary(1), adaptive, adaptive2,
        summary(0), idTier(2), idTier(1), idTier(0)) :+ idTierCapped)
      .find(_.length <= 1895).getOrElse(idTierCapped))
  }
}
