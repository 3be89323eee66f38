package graft.tools

/** Mechanical round-end figures (r13 verdict item 6: the snapshot
  * commit claimed "262/262" while the registry held 263, because the
  * numbers were typed, not generated). Prints the registry size, the
  * oracle-map size, and the row counts of each correctness artifact
  * passed as an argument (defaults: the newest CORRECTNESS_r*.json in
  * the cwd plus CORRECTNESS_SF1.json), then FAILS (exit 1) on any
  * mismatch — a missing oracle entry, an artifact row count that
  * trails the registry, or an artifact entry with a failing status —
  * listing the offending ids. Round-end claims cite this output.
  *
  * No Spark session: the registry is a static map, the artifacts are
  * plain JSON.
  */
object RegistryCount {
  def main(args: Array[String]): Unit = {
    val registry = graft.SparkEntry.queries.keySet
    val oracles = graft.SparkEntry.oracleSql.keySet
    println(s"registry=${registry.size} oracles=${oracles.size}")
    var bad = false
    if (registry != oracles) {
      bad = true
      val missing = (registry -- oracles).toSeq.sorted
      val extra = (oracles -- registry).toSeq.sorted
      if (missing.nonEmpty) println(s"MISMATCH queries without oracle: ${missing.mkString(",")}")
      if (extra.nonEmpty) println(s"MISMATCH oracles without query: ${extra.mkString(",")}")
    }
    val defaults = {
      val newest = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
        .filter(_.getName.matches("CORRECTNESS_r\\d+\\.json"))
        .sortBy(f => f.getName.replaceAll("\\D", "").toInt)
        .lastOption.map(_.getName)
      newest.toSeq :+ "CORRECTNESS_SF1.json"
    }
    val files = if (args.nonEmpty) args.toSeq else defaults
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    for (path <- files) {
      val f = new java.io.File(path)
      if (!f.exists()) { println(s"$path: MISSING"); bad = true }
      else {
        val root = om.readTree(f)
        val ids = {
          val it = root.fieldNames()
          val b = Set.newBuilder[String]
          while (it.hasNext) b += it.next()
          b.result()
        }
        val failing = ids.filter { id =>
          val n = root.path(id)
          !(n.path("rows_match").asBoolean(false) &&
            n.path("schema_match").asBoolean(false) &&
            n.path("hash_match").asBoolean(false))
        }.toSeq.sorted
        val missing = (registry -- ids).toSeq.sorted
        println(s"$path: rows=${ids.size} pass=${ids.size - failing.size}")
        if (missing.nonEmpty) {
          bad = true
          println(s"MISMATCH $path lacks: ${missing.mkString(",")}")
        }
        if (failing.nonEmpty) {
          bad = true
          println(s"MISMATCH $path failing: ${failing.mkString(",")}")
        }
      }
    }
    if (bad) sys.exit(1)
    println("OK: registry, oracles, and artifacts agree")
  }
}
