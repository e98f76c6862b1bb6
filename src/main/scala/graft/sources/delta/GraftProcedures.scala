package graft.sources.delta

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._

/** The engine's MAINTENANCE operations as SQL procedures
  * (`CALL graft.system.<proc>(…)` — Spark 4's ProcedureCatalog seam,
  * the same surface Iceberg/Delta expose OPTIMIZE/VACUUM through):
  *
  * {{{
  *   CALL graft.system.checkpoint('db.events')
  *   CALL graft.system.compact('db.events', 1048576L, 1)
  *   CALL graft.system.zorder('db.events', 'id,ts', 4)
  *   CALL graft.system.vacuum('db.events', 604800000L)
  *   CALL graft.system.clean_log('db.events', 2592000000L)
  *   CALL graft.system.restore('db.events', 3L)
  *   CALL graft.system.set_cdf('db.events', true)
  * }}}
  *
  * Table arguments are catalog-relative names (`ns.table`), resolved
  * against the owning [[GraftCatalog]]'s warehouse. Each call is the
  * corresponding engine API — one atomic log commit (or a bounded
  * file-reclaim walk), nothing procedural beyond it. */
private[delta] object GraftProcedures {

  private final case class Proc(
      name: String, description: String,
      params: Seq[(String, DataType)],
      run: (SparkSession, String, Seq[Any]) => Option[(StructType, Array[InternalRow])])

  /** Wrap a side-effect-only body as a row-less procedure. */
  private def unitProc(body: (SparkSession, String, Seq[Any]) => Unit)
    : (SparkSession, String, Seq[Any]) => Option[(StructType, Array[InternalRow])] =
    (s, t, a) => { body(s, t, a); None }

  private def procs: Seq[Proc] = Seq(
    Proc("checkpoint",
      "write a parquet checkpoint of the table's current head",
      Seq("table" -> StringType),
      unitProc((s, t, _) => { DeltaLog.checkpoint(s, t); () })),
    Proc("compact",
      "fold data files below a size threshold into target_files per partition",
      Seq("table" -> StringType, "smaller_than_bytes" -> LongType,
        "target_files" -> IntegerType),
      unitProc((s, t, a) => DeltaTable.compactFiles(s, t,
        a(0).asInstanceOf[Long], a(1).asInstanceOf[Int]))),
    Proc("zorder",
      "rewrite the table along the z-curve of the given comma-separated columns",
      Seq("table" -> StringType, "columns" -> StringType, "n_files" -> IntegerType),
      unitProc((s, t, a) => DeltaTable.optimize(s, t,
        a(0).toString.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
        a(1).asInstanceOf[Int]))),
    Proc("vacuum",
      "reclaim tombstoned files past retention plus crash orphans; returns counts",
      Seq("table" -> StringType, "retain_ms" -> LongType),
      (s, t, a) => {
        val removed = DeltaTable.vacuumRemoved(s, t, a(0).asInstanceOf[Long])
        val orphans = DeltaTable.vacuumOrphans(s, t, a(0).asInstanceOf[Long])
        Some((StructType(Seq(
          StructField("removed_files", IntegerType),
          StructField("orphan_files", IntegerType))),
          Array(InternalRow(removed, orphans))))
      }),
    Proc("clean_log",
      "delete pre-checkpoint commit JSON older than retention",
      Seq("table" -> StringType, "retain_ms" -> LongType),
      unitProc((s, t, a) => { DeltaLog.cleanLog(s, t, a(0).asInstanceOf[Long]); () })),
    Proc("restore",
      "reset table content to an earlier version via one commit",
      Seq("table" -> StringType, "version" -> LongType),
      unitProc((s, t, a) => DeltaTable.restore(s, t, a(0).asInstanceOf[Long]))),
    Proc("set_cdf",
      "set the delta.enableChangeDataFeed table property",
      Seq("table" -> StringType, "enabled" -> BooleanType),
      unitProc((s, t, a) => DeltaTable.setProperties(s, t,
        Map("delta.enableChangeDataFeed" -> a(0).toString)))),
    Proc("add_constraint",
      "add a CHECK constraint (validates existing rows, then enforced on every write)",
      Seq("table" -> StringType, "name" -> StringType, "expr" -> StringType),
      unitProc((s, t, a) => DeltaTable.addConstraint(s, t,
        a(0).toString, a(1).toString))),
    Proc("drop_constraint",
      "drop a CHECK constraint by name",
      Seq("table" -> StringType, "name" -> StringType),
      unitProc((s, t, a) => DeltaTable.dropConstraint(s, t, a(0).toString))),
    Proc("clone",
      "shallow-clone the source snapshot into a new table (zero data copied)",
      Seq("table" -> StringType, "target_table" -> StringType),
      unitProc((s, t, a) =>
        DeltaTable.cloneShallow(s, t, a(0).asInstanceOf[String]))),
    Proc("sync_identity",
      "recompute identity high-water marks from the data (never regresses)",
      Seq("table" -> StringType),
      (s, t, _) => {
        import org.apache.spark.unsafe.types.UTF8String
        val updated = DeltaTable.syncIdentity(s, t)
        Some((StructType(Seq(
          StructField("column", StringType),
          StructField("high_water_mark", LongType))),
          updated.toSeq.sortBy(_._1).map { case (c, v) =>
            InternalRow(UTF8String.fromString(c), v)
          }.toArray))
      }),
    Proc("purge_dvs",
      "REORG APPLY (PURGE): rewrite only DV-bearing files without their " +
        "deleted rows; returns the rewritten-file count",
      Seq("table" -> StringType),
      (s, t, _) => {
        val n = DeltaTable.purgeDeletionVectors(s, t)
        Some((StructType(Seq(StructField("purged_files", IntegerType))),
          Array(InternalRow(n))))
      }),
    Proc("detail",
      "DESCRIBE DETAIL: version, file/byte counts, partitioning, DV counts, properties",
      Seq("table" -> StringType),
      (s, t, _) => {
        import org.apache.spark.unsafe.types.UTF8String
        val head = DeltaLog.snapshot(s, t)
        require(!head.isEmpty, s"delta: $t has no commits")
        val props = head.configuration.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString(",")
        val dvs = head.files.flatMap(_.dv).filter(_.cardinality > 0)
        val row = InternalRow(
          head.version,
          head.files.size,
          head.files.map(_.size).sum,
          dvs.size,
          dvs.map(_.cardinality).sum,
          // the PROTOCOL.md storage codes in use: "i" inline / "u"
          // table-relative UUID sidecar / "p" absolute path
          UTF8String.fromString(
            dvs.map(_.storageType).distinct.sorted.mkString(",")),
          UTF8String.fromString(head.partitionColumns.mkString(",")),
          UTF8String.fromString(props))
        Some((StructType(Seq(
          StructField("version", LongType),
          StructField("num_files", IntegerType),
          StructField("size_bytes", LongType),
          StructField("num_deletion_vectors", IntegerType),
          StructField("deleted_rows", LongType),
          StructField("dv_storage_types", StringType),
          StructField("partition_columns", StringType),
          StructField("properties", StringType))), Array(row)))
      }),
    Proc("history",
      "DESCRIBE HISTORY: one row per commit, newest first",
      Seq("table" -> StringType),
      (s, t, _) => {
        val rows = DeltaTable.describeHistory(s, t).map { h =>
          InternalRow(h.version,
            org.apache.spark.unsafe.types.UTF8String.fromString(h.operation),
            h.timestampMs, h.nAdds, h.nRemoves)
        }.toArray
        Some((StructType(Seq(
          StructField("version", LongType),
          StructField("operation", StringType),
          StructField("timestamp_ms", LongType),
          StructField("n_adds", IntegerType),
          StructField("n_removes", IntegerType))), rows))
      }))

  def names: Array[String] = procs.map(_.name).toArray

  def load(catalog: GraftCatalog, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"graft catalog: procedures live in the `system` namespace, got " +
        s"${ident.namespace().mkString(".")}")
    val p = procs.find(_.name == ident.name()).getOrElse(
      throw new UnsupportedOperationException(
        s"graft catalog: unknown procedure ${ident.name()} " +
          s"(available: ${names.mkString(", ")})"))
    new UnboundProcedure {
      override def name(): String = p.name
      override def description(): String = p.description
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = p.name
          override def description(): String = p.description
          override def isDeterministic: Boolean = false
          override def parameters(): Array[ProcedureParameter] =
            p.params.map { case (n, dt) =>
              ProcedureParameter.in(n, dt).build()
            }.toArray
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val table = catalog.resolveTablePath(input.getUTF8String(0).toString)
            // params named `*_table` are catalog-relative names too —
            // resolved against the same warehouse (clone's target)
            val rest = p.params.drop(1).zipWithIndex.map { case ((nm, dt), i) =>
              val v = input.get(i + 1, dt)
              if (dt == StringType && nm.endsWith("table"))
                catalog.resolveTablePath(v.toString)
              else v
            }
            p.run(SparkSession.active, table, rest) match {
              case None => java.util.Collections.emptyIterator()
              case Some((outSchema, outRows)) =>
                val scan: Scan = new org.apache.spark.sql.connector.read.LocalScan {
                  override def rows(): Array[InternalRow] = outRows
                  override def readSchema(): StructType = outSchema
                }
                java.util.Collections.singletonList(scan).iterator()
            }
          }
        }
    }
  }
}
