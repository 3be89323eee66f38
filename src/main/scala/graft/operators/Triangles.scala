package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting by DEGREE ORIENTATION — the classic fix for the
  * wedge explosion that kills naive triangle counting on skewed
  * graphs: enumerating both out-edges of every node costs
  * Σ deg(v)², so one hub with a million neighbors generates 10¹²
  * wedge candidates. Orienting every undirected edge from the
  * lower-(degree, id) endpoint to the higher one makes each
  * triangle's wedges come from its SMALLEST corner only, and bounds
  * every out-degree by O(√m) (a node of degree d > √m has < √m
  * higher-degree neighbors) — so wedge volume is O(m^1.5) worst
  * case and hub-proof in practice (Suri & Vassilvitskii, "Counting
  * Triangles and the Curse of the Last Reducer", WWW 2011; the
  * MapReduce formulation this re-expresses as three DataFrame
  * joins).
  *
  * Shape: degree = one map-side-combined aggregation; orientation =
  * one broadcast-or-shuffle join of edges with degrees; wedges =
  * self-join of oriented edges on the source; closure = one join of
  * wedges against oriented edges. Everything is equi-joins on node
  * ids — AQE/broadcast applies as sizes allow. No collect, no
  * driver-side graph.
  */
object Triangles {

  /** Canonicalize an undirected edge list: drop self-loops, order
    * endpoints as (lo, hi), dedup parallel edges. Input columns
    * `srcCol`, `dstCol`; output columns `a` < `b`.
    */
  def canonical(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(
      least(col(srcCol), col(dstCol)).as("a"),
      greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Count triangles and wedges (open 2-paths) of the undirected
    * simple graph `canon` (columns `a` < `b` from [[canonical]]).
    * Returns one row: `n_triangles`, `n_wedges` — the global
    * clustering coefficient's numerator (×3) and denominator, kept
    * as exact integers for the oracle.
    */
  def count(canon: DataFrame): DataFrame = {
    // degree per node: each canonical edge contributes to both ends
    val deg = canon.select(col("a").as("n"))
      .unionAll(canon.select(col("b").as("n")))
      .groupBy(col("n")).agg(org.apache.spark.sql.functions.count(lit(1)).as("d"))
    // orient each edge from the (degree, id)-smaller endpoint; carry
    // the head's (degree, id) so the wedge self-join can order the two
    // out-neighbors WITHOUT a global rank (lexicographic compare on
    // the carried pair replaces a sort-the-world dense_rank)
    val withDeg = canon
      .join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("src"),
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("b"))
        .otherwise(col("a")).as("dst"),
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("db"))
        .otherwise(col("da")).as("ddst"))
    // wedges from each triangle's smallest corner: pairs of
    // out-neighbors (v, w) with σ(v) < σ(w); closure checks v→w
    val e1 = oriented.select(col("src"), col("dst").as("v"), col("ddst").as("dv"))
    val e2 = oriented.select(col("src"), col("dst").as("w"), col("ddst").as("dw"))
    val wedges = e1.join(e2, Seq("src"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
    val tri = wedges.join(
      oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"),
      "left_semi")
    // open-wedge total Σ C(deg, 2) needs no orientation; `div` keeps
    // the arithmetic integer-exact (long / long is DOUBLE in Spark)
    val wedgeTotal = deg.agg(
      sum(expr("d * (d - 1) div 2")).cast("long").as("n_wedges"))
    tri.agg(org.apache.spark.sql.functions.count(lit(1)).as("n_triangles")).crossJoin(wedgeTotal)
  }
}
