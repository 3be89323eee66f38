package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Declarative data-contract auditing — the Deequ/dbt-tests shape: a
  * table ships with a contract (not-null columns, unique keys, enum
  * domains, value ranges, format regexes) and the engine verifies the
  * whole contract in ONE aggregate pass, emitting a violation count
  * per rule. At 100 TB the pass is a single scan with conditional
  * aggregates (plus count-distinct for uniqueness, which rides the
  * same Expand the exact-NDV profile uses) — never one job per rule.
  *
  * NULL semantics: scalar rules (set / range / regex) PASS null cells —
  * nullability is [[Rule.NotNull]]'s job, so one bad cell never counts
  * twice. [[Rule.Unique]] counts duplicate fully-non-null key tuples;
  * rows with a null key component are NotNull's finding, not a
  * duplicate.
  */
object Constraints {

  sealed trait Rule { def name: String }
  object Rule {
    final case class NotNull(column: String) extends Rule {
      val name = s"not_null($column)"
    }
    final case class Unique(columns: Seq[String]) extends Rule {
      val name = s"unique(${columns.mkString(",")})"
    }
    final case class InSet(column: String, values: Seq[String]) extends Rule {
      val name = s"in_set($column)"
    }
    final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
      val name = s"in_range($column)"
    }
    final case class Matches(column: String, regex: String) extends Rule {
      val name = s"matches($column)"
    }
  }
  import Rule._

  private def violationExpr(r: Rule): Column = (r match {
    case NotNull(c) => count(lit(1)) - count(col(c))
    case Unique(cs) =>
      val allSet = cs.map(col(_).isNotNull).reduce(_ && _)
      count(when(allSet, 1)) - count_distinct(col(cs.head), cs.tail.map(col): _*)
    case InSet(c, vs) =>
      sum(when(col(c).isNotNull && !col(c).isin(vs: _*), 1L).otherwise(0L))
    case InRange(c, lo, hi) =>
      sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L).otherwise(0L))
    case Matches(c, re) =>
      sum(when(col(c).isNotNull && !col(c).rlike(re), 1L).otherwise(0L))
  }).cast(LongType)

  /** Audit `df` against the contract: returns (rule, violations), one
    * row per rule, all rules computed in a single aggregate.
    */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty contract")
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      violationExpr(r).as(s"__v$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = rules.zipWithIndex.map { case (r, i) =>
      s"'${r.name}', __v$i"
    }
    one.selectExpr(
      s"stack(${rules.length}, ${entries.mkString(", ")}) AS (rule, violations)")
  }

  /** Exact MULTISET equality of two same-schema relations in ONE
    * action: side-tagged union, one grouped per-side count over all
    * columns, any imbalanced group fails. Identical semantics to the
    * require-pin shape `a.exceptAll(b).isEmpty &&
    * b.exceptAll(a).isEmpty` (multiset equality ⟺ empty symmetric
    * difference; GROUP BY and exceptAll share null-safe equality) at
    * one shuffle of the union instead of two exceptAll shuffles — the
    * lifecycle composites pin several of these per run, so the job
    * count is query latency.
    */
  def sameMultiset(a: DataFrame, b: DataFrame): Boolean = {
    val cols = a.columns.toSeq
    require(b.columns.toSeq == cols,
      s"sameMultiset: schemas differ (${cols.mkString(",")} vs ${b.columns.mkString(",")})")
    a.withColumn("__side", lit(1))
      .unionAll(b.withColumn("__side", lit(2)))
      .groupBy(cols.map(col): _*)
      .agg(count(when(col("__side") === 1, 1)).as("__na"),
        count(when(col("__side") === 2, 1)).as("__nb"))
      .filter(col("__na") =!= col("__nb"))
      .isEmpty
  }

  /** The DuckDB replay of one rule's violation count — the oracle SQL
    * is generated from the SAME rule objects as the audit plan, so the
    * two sides cannot desynchronize.
    */
  def ruleSql(r: Rule, table: String): String = r match {
    case NotNull(c) =>
      s"SELECT '${r.name}' AS rule, CAST(COUNT(*) - COUNT($c) AS BIGINT) AS violations FROM $table"
    case Unique(cs) =>
      val allSet = cs.map(c => s"$c IS NOT NULL").mkString(" AND ")
      val tuple = if (cs.size == 1) cs.head else s"(${cs.mkString(", ")})"
      s"SELECT '${r.name}' AS rule, CAST(COUNT(CASE WHEN $allSet THEN 1 END) - COUNT(DISTINCT $tuple) AS BIGINT) AS violations FROM $table"
    case InSet(c, vs) =>
      val set = vs.map(v => s"'$v'").mkString(", ")
      s"SELECT '${r.name}' AS rule, CAST(SUM(CASE WHEN $c IS NOT NULL AND $c NOT IN ($set) THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM $table"
    case InRange(c, lo, hi) =>
      s"SELECT '${r.name}' AS rule, CAST(SUM(CASE WHEN $c IS NOT NULL AND ($c < $lo OR $c > $hi) THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM $table"
    case Matches(c, re) =>
      s"SELECT '${r.name}' AS rule, CAST(SUM(CASE WHEN $c IS NOT NULL AND NOT regexp_matches($c, '$re') THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM $table"
  }
}
