package graft.operators

import org.apache.spark.sql.types._

import graft.types.TypeMapper

/** Schema evolution: diff an incoming staging schema against the production
  * schema, auto-adding safe new columns and flagging the rest for manual
  * intervention.
  *
  * Re-expresses the reference's `handle_schema_evolution`
  * (reference: lambda/handler.py:250-338) and the snapshot-diff variant
  * (reference: lambda_schema_evolution_integration.py:70-108) on Spark
  * `StructType`s.
  */
object SchemaEvolution {

  /** CDC metadata excluded from evolution (reference: handler.py:274). */
  val ExcludedCols: Set[String] = Set("Op", "load_timestamp", "rn", "ingestion_seq", "__source_file")

  final case class NewColumn(name: String, dataType: DataType)
  final case class TypeChange(name: String, from: DataType, to: DataType)

  /** Outcome of one evolution pass.
    * @param columnsAdded    safe new columns appended (nullable) to the target
    * @param requiresManual  column → reason, for the notification channel
    *                        (reference SNS publish, handler.py:313-336)
    * @param removedColumns  in production but missing from staging (report
    *                        only — the reference never drops columns)
    * @param typeChanges     same name, different type (report only)
    */
  final case class EvolutionResult(
      columnsAdded: Seq[NewColumn],
      requiresManual: Seq[(String, String)],
      removedColumns: Seq[String],
      typeChanges: Seq[TypeChange]) {
    def hasChanges: Boolean =
      columnsAdded.nonEmpty || requiresManual.nonEmpty || removedColumns.nonEmpty || typeChanges.nonEmpty
  }

  /** Is a Spark type safe for automatic ADD COLUMN? Mirrors the reference's
    * SAFE_AUTO_ADD_TYPES triage (mapping.py:165-180): scalar types are
    * safe; complex/spatial-ish types require manual intervention.
    */
  def isSafeToAdd(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: StructType | _: MapType => false
    case NullType                                  => false
    case _                                         => true
  }

  /** Diff staging → production. New safe columns become `columnsAdded`;
    * new complex columns go to `requiresManual`.
    */
  def diff(staging: StructType, production: StructType): EvolutionResult = {
    val prodNames = production.fieldNames.toSet
    val stagingFields = staging.fields.filterNot(f => ExcludedCols.contains(f.name))
    val stagingNames = stagingFields.map(_.name).toSet

    val newFields = stagingFields.filterNot(f => prodNames.contains(f.name))
    val (safe, manual) = newFields.partition(f => isSafeToAdd(f.dataType))

    val removed = production.fieldNames
      .filterNot(n => ExcludedCols.contains(n))
      .filterNot(stagingNames.contains)

    val typeChanges = stagingFields.flatMap { f =>
      production.fields.find(_.name == f.name) match {
        case Some(p) if p.dataType != f.dataType => Some(TypeChange(f.name, p.dataType, f.dataType))
        case _ => None
      }
    }

    EvolutionResult(
      columnsAdded = safe.map(f => NewColumn(f.name, f.dataType)).toSeq,
      requiresManual = manual.map(f =>
        f.name -> s"Type ${f.dataType.simpleString} requires manual conversion").toSeq,
      removedColumns = removed.toSeq,
      typeChanges = typeChanges.toSeq)
  }

  /** Diff when the incoming side is described by *source type strings*
    * (DMS/MySQL names), converting through [[TypeMapper]] — the reference's
    * primary path (information_schema strings, handler.py:276-292).
    */
  def diffSourceTypes(
      stagingTypes: Seq[(String, String)],
      production: StructType): EvolutionResult = {
    val prodNames = production.fieldNames.toSet
    val incoming = stagingTypes.filterNot { case (n, _) => ExcludedCols.contains(n) }
    val newCols = incoming.filterNot { case (n, _) => prodNames.contains(n) }

    val added = Seq.newBuilder[NewColumn]
    val manual = Seq.newBuilder[(String, String)]
    newCols.foreach { case (name, srcType) =>
      val conv = TypeMapper.toSparkType(srcType)
      conv.dataType match {
        case Some(dt) if conv.isSafe => added += NewColumn(name, dt)
        case _                       => manual += (name -> conv.message)
      }
    }
    EvolutionResult(added.result(), manual.result(), Nil, Nil)
  }

  /** Apply the additions: evolved production schema with new columns
    * appended as nullable (the ADD COLUMN ... NULL of handler.py:290-292).
    */
  def evolve(production: StructType, result: EvolutionResult): StructType =
    result.columnsAdded.foldLeft(production) { (schema, nc) =>
      schema.add(StructField(nc.name, nc.dataType, nullable = true))
    }

  /** Is `from → to` a WIDENING promotion — every `from` value
    * representable in `to` with no loss? The auto-applicable half of
    * the type-change channel (the reference flags ALL type changes
    * manual; the upstream ALTERs that actually happen — int→bigint,
    * float→double, decimal precision growth — are mechanical):
    * integral up-chain, float→double, integral→decimal/double with
    * room, and decimal growth that keeps scale and gains at least the
    * integer digits it had. Everything else (narrowing, cross-family,
    * scale changes) stays manual — silent truncation is the failure
    * mode this classification exists to prevent.
    */
  def isWidening(from: DataType, to: DataType): Boolean = {
    def rank(dt: DataType): Option[Int] = dt match {
      case ByteType => Some(0); case ShortType => Some(1)
      case IntegerType => Some(2); case LongType => Some(3)
      case _ => None
    }
    def intDigits(dt: DataType): Int = dt match {
      case ByteType => 3; case ShortType => 5; case IntegerType => 10
      case LongType => 19; case _ => 0
    }
    (from, to) match {
      case (f, t) if f == t => true
      case (f, t) if rank(f).isDefined && rank(t).isDefined =>
        rank(f).get < rank(t).get
      case (FloatType, DoubleType) => true
      case (f, DoubleType) if rank(f).isDefined && intDigits(f) <= 15 => true
      case (f, d: DecimalType) if rank(f).isDefined =>
        d.precision - d.scale >= intDigits(f)
      case (f: DecimalType, t: DecimalType) =>
        t.scale == f.scale && t.precision >= f.precision
      case _ => false
    }
  }
}
