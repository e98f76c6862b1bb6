package graft.sources.delta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Delta-style COLUMN MAPPING (name mode): the log's schema carries the
  * user-facing LOGICAL names, while every field's metadata records the
  * PHYSICAL name its values live under in the data files
  * (`delta.columnMapping.physicalName`, plus a stable
  * `delta.columnMapping.id`). RENAME COLUMN and DROP COLUMN then become
  * pure metaData commits — no data rewrite at any table size — exactly
  * the mechanism delta-spark's `delta.columnMapping.mode = name` uses
  * (the schema-evolution surface the reference reaches through its
  * Trino Delta catalog, `README.md:114-124`).
  *
  * Upgrade rule: the FIRST rename/drop stamps every existing field with
  * `physicalName = its current name` (all files on disk were written
  * under those names, so the stamp is a no-op for existing data) and
  * sets the mode property. Columns ADDED to a mapped table get fresh
  * `col-<uuid>` physical names so a dropped column's values can never
  * resurrect under a re-added logical name.
  *
  * Everything below is driver-side metadata arithmetic; the single
  * translation a read pays is a column rename projection (zero-cost in
  * Catalyst — it folds into the scan's output attributes).
  *
  * Scope (stated honestly): top-level columns only — nested-field
  * renames would need parquet field-id resolution, which the callers
  * refuse loudly rather than emulate. */
private[delta] object ColumnMapping {
  val ModeKey = "delta.columnMapping.mode"
  val MaxIdKey = "delta.columnMapping.maxColumnId"
  val PhysKey = "delta.columnMapping.physicalName"
  val IdKey = "delta.columnMapping.id"

  def modeEnabled(config: Map[String, String]): Boolean =
    config.get(ModeKey).contains("name")

  /** A field's physical (file) name — its logical name until stamped. */
  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysKey)) f.metadata.getString(PhysKey) else f.name

  /** logical → physical for every field (identity entries included). */
  def physMap(schema: StructType): Map[String, String] =
    schema.fields.map(f => f.name -> physicalName(f)).toMap

  /** Does any field's physical name differ from its logical name? The
    * translation paths engage only then — an unmapped (or
    * freshly-upgraded, never-renamed) table runs the exact pre-mapping
    * code. */
  def hasMapping(schema: StructType): Boolean =
    schema.fields.exists(f => physicalName(f) != f.name)

  /** The schema as the data files see it: physical names, mapping
    * metadata stripped, types/nullability kept. */
  def physicalSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f =>
      StructField(physicalName(f), f.dataType, f.nullable)))

  /** User-facing schema: logical names with the mapping bookkeeping
    * metadata removed (delta-spark likewise hides it from reads). */
  def stripped(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
        .remove(PhysKey).remove(IdKey).build())
    })

  private def idOf(f: StructField): Option[Long] =
    if (f.metadata.contains(IdKey)) Some(f.metadata.getLong(IdKey)) else None

  def maxId(schema: StructType): Long =
    schema.fields.flatMap(idOf).foldLeft(0L)(math.max)

  /** Upgrade stamp: every field missing a physicalName gets
    * `physicalName = current name` (existing files were written under
    * it) and the next column id. Idempotent. */
  def upgrade(schema: StructType): StructType = {
    var id = maxId(schema)
    StructType(schema.fields.map { f =>
      if (f.metadata.contains(PhysKey)) f
      else {
        id += 1
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putString(PhysKey, f.name).putLong(IdKey, id).build())
      }
    })
  }

  /** Stamp fields missing a physicalName with FRESH `col-<uuid>` names —
    * the rule for columns added to an already-mapped table. No-op when
    * the mode is off. */
  def stampNewFields(schema: StructType,
                     config: Map[String, String]): StructType =
    if (!modeEnabled(config)) schema
    else {
      var id = maxId(schema)
      StructType(schema.fields.map { f =>
        if (f.metadata.contains(PhysKey)) f
        else {
          id += 1
          f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
            .putString(PhysKey, s"col-${java.util.UUID.randomUUID()}")
            .putLong(IdKey, id).build())
        }
      })
    }

  /** Carry mapping stamps forward from `ref` onto same-named fields of
    * `schema` that lack one — the overwrite-with-new-schema rule (a
    * surviving column keeps its physical name; its old files stay
    * readable through time travel either way). */
  def carryForward(schema: StructType, ref: StructType): StructType = {
    val byName: Map[String, Metadata] = ref.fields.collect {
      case f if f.metadata.contains(PhysKey) => f.name -> f.metadata
    }.toMap
    StructType(schema.fields.map { f =>
      if (f.metadata.contains(PhysKey)) f
      else byName.get(f.name) match {
        case Some(m) =>
          f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
            .putString(PhysKey, m.getString(PhysKey))
            .putLong(IdKey, m.getLong(IdKey)).build())
        case None => f
      }
    })
  }

  /** Rename a DataFrame's columns logical → physical per `schema` before
    * staging data files. Columns outside the schema (e.g. the CDF's
    * `_change_type`) pass through untouched. */
  def toPhysical(df: DataFrame, schema: StructType): DataFrame =
    if (!hasMapping(schema)) df
    else {
      val m = physMap(schema)
      df.select(df.columns.toSeq.map(c => col(c).as(m.getOrElse(c, c))): _*)
    }

  /** The names a sink task must WRITE under: `writeSchema`'s fields
    * (query output order) renamed logical → physical per the table's
    * stamped schema. Identity when the table is empty or unmapped. */
  def physicalWriteSchema(writeSchema: StructType,
                          tableSchema: Option[StructType]): StructType =
    tableSchema match {
      case Some(t) if hasMapping(t) =>
        val m = physMap(t)
        StructType(writeSchema.fields.map(f =>
          StructField(m.getOrElse(f.name, f.name), f.dataType, f.nullable)))
      case _ => writeSchema
    }

  /** Column-name list logical → physical (partition columns etc.). */
  def physicalCols(cols: Seq[String],
                   tableSchema: Option[StructType]): Seq[String] =
    tableSchema match {
      case Some(t) if hasMapping(t) =>
        val m = physMap(t); cols.map(c => m.getOrElse(c, c))
      case _ => cols
    }

  /** Rewrite a resolved/unresolved predicate's attribute names logical →
    * physical, so [[DataSkipping]] bounds evaluation keys into the
    * add-action stats and partitionValues (both recorded under physical
    * names). */
  def physicalExpr(e: Expression, schema: StructType): Expression =
    if (!hasMapping(schema)) e
    else {
      val m = physMap(schema)
      e.transform {
        case a: AttributeReference if m.contains(a.name) => a.withName(m(a.name))
        case u: UnresolvedAttribute
            if u.nameParts.size == 1 && m.contains(u.nameParts.head) =>
          UnresolvedAttribute(Seq(m(u.nameParts.head)))
      }
    }
}
