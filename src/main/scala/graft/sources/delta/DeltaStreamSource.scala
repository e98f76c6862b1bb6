package graft.sources.delta

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Structured Streaming SOURCE over the from-scratch Delta log
  * (`spark.readStream.format("graft-delta").load(table)`) — the
  * consuming half of a Delta-to-Delta pipeline as a first-class
  * streaming source, completing what [[DeltaTable.changesSince]] offers
  * as a pull API. delta-spark's streaming source has the same contract
  * (`spark/SaveDelta.scala:157-163` writes the table this would tail).
  *
  * Offsets ARE log versions: `latestOffset` lists the log (a few KB of
  * metadata — no data IO), and a micro-batch (start, end] plans one
  * input partition per file ADDED in those commits with
  * `dataChange=true`. Maintenance commits (OPTIMIZE/compaction) are
  * skipped exactly like `changesSince`; a data-changing REMOVE
  * (overwrite/merge) fails the batch loudly — an append-only tailer
  * cannot represent it (upstream's ignoreChanges contract). Offsets
  * live in the query's checkpoint, so restarts resume exactly-once:
  * the log is immutable per version, which makes every replanned batch
  * bit-identical.
  *
  * The streaming reader is row-based (parquet-hadoop's Group API — the
  * per-batch file sets are micro-batch-sized); the BATCH read path
  * stays [[DeltaTable.read]], which drives Spark's vectorized parquet
  * scan. Supported column types: the primitive lattice (boolean, int,
  * long, float, double, string) plus Hive-partition columns restored
  * from the add-action's `partitionValues` — nested types raise at
  * plan time rather than corrupting silently. */
class DeltaStreamDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-delta"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DeltaStreamDataSource.logSchema(DeltaStreamDataSource.tablePath(options))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new DeltaStreamTable(schema, new CaseInsensitiveStringMap(properties))
}

private[delta] object DeltaStreamDataSource {
  def tablePath(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-delta: 'path' option required"))

  def logSchema(table: String): StructType = {
    val snap = DeltaLog.snapshot(SparkSession.active, table)
    require(!snap.isEmpty, s"graft-delta: $table has no commits")
    val schema = snap.schemaJson
      .map(j => DataType.fromJson(j).asInstanceOf[StructType])
      .getOrElse(throw new IllegalStateException(s"graft-delta: $table missing metaData"))
    schema.fields.foreach { f =>
      require(DeltaRowReader.supported(f.dataType),
        s"graft-delta: unsupported column type ${f.dataType.catalogString} " +
          s"for ${f.name} — the streaming reader handles the primitive " +
          "lattice (boolean/int/long/float/double/string)")
    }
    schema
  }
}

private[delta] class DeltaStreamTable(
    tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft-delta:" + options.get("path")
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new DeltaStreamScan(tableSchema, options)
    }
}

private[delta] class DeltaStreamScan(
    schema: StructType, options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new DeltaMicroBatchStream(DeltaStreamDataSource.tablePath(options), schema,
      Option(options.get("startingVersion")).getOrElse("earliest"))
}

/** `{"version":N}` — the committed log version this cursor has fully
  * delivered. */
private[delta] case class DeltaOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

private[delta] class DeltaMicroBatchStream(table: String, schema: StructType,
                                           startingVersion: String = "earliest")
    extends MicroBatchStream {

  private def spark = SparkSession.active

  // fixed for the stream's lifetime (writeInternal refuses a partitioning
  // change), so one metadata read instead of a snapshot replay per batch
  private lazy val partCols: Array[String] =
    DeltaLog.snapshot(spark, table).partitionColumns.toArray

  /** `earliest` (default) delivers the whole table as the first batch
    * (requires an append-only history); `latest` tails only commits after
    * stream creation — the escape hatch for tables whose history carries
    * overwrites; a number starts after that version. */
  override def initialOffset(): Offset = startingVersion match {
    case "earliest" => DeltaOffset(-1L)
    case "latest" => latestOffset().asInstanceOf[DeltaOffset]
    case v => DeltaOffset(v.toLong)
  }

  override def latestOffset(): Offset =
    DeltaOffset(DeltaLog.versions(spark, table).lastOption.getOrElse(-1L))

  override def deserializeOffset(json: String): Offset = {
    import org.json4s._
    (org.json4s.jackson.JsonMethods.parse(json) \ "version") match {
      case JInt(v) => DeltaOffset(v.toLong)
      case JLong(v) => DeltaOffset(v)
      case other => throw new IllegalArgumentException(
        s"graft-delta: bad offset $json ($other)")
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (sv, ev) = (start.asInstanceOf[DeltaOffset].version,
      end.asInstanceOf[DeltaOffset].version)
    if (ev <= sv) return Array.empty
    val vs = DeltaLog.versions(spark, table).filter(v => v > sv && v <= ev)
    // same reconstruction contract as changesSince: the batch's range
    // must be dense, and data-changing removes cannot be tailed
    require(vs == (sv + 1 to ev),
      s"graft-delta: $table's log is missing commits in ($sv, $ev] " +
        s"(retained: $vs) — this cursor's unread commits are gone")
    vs.flatMap { v =>
      val c = DeltaLog.readCommit(spark, table, v)
      require(c.dataChangingRemoves == 0,
        s"graft-delta: $table was overwritten/merged at version $v — " +
          "append-only tailing cannot represent removes; restart the " +
          "stream from the current snapshot")
      c.adds.filter(_.dataChange).map(a =>
        DeltaFilePartition(new Path(table, a.path).toString, a.partitionValues))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    DeltaReaderFactory(schema, partCols)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[delta] case class DeltaFilePartition(
    file: String, partitionValues: Map[String, String]) extends InputPartition

private[delta] case class DeltaReaderFactory(
    schema: StructType, partitionColumns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DeltaFilePartition]
    new DeltaRowReader(p.file, schema, partitionColumns.toSet, p.partitionValues)
  }
}

/** Executor-side row reader: parquet-hadoop's example Group API over one
  * data file, projected into the LOG's schema. Partition columns (absent
  * from the data file, per Hive layout) restore from the add-action's
  * stringly-typed `partitionValues`; missing data columns (schema
  * evolution: files written before a column existed) read as NULL — the
  * same semantics the batch reader gets from Spark's parquet source with
  * the log schema applied. */
private[delta] class DeltaRowReader(
    file: String, schema: StructType, partCols: Set[String],
    partitionValues: Map[String, String])
    extends PartitionReader[InternalRow] {

  import org.apache.parquet.hadoop.ParquetReader
  import org.apache.parquet.hadoop.example.GroupReadSupport
  import org.apache.parquet.example.data.Group

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new Path(file))
      .withConf(new Configuration()).build()
  private var current: InternalRow = _

  // precomputed per-field plan: partition constant, or group-field name
  private val partConst: Array[Any] = schema.fields.map { f =>
    if (partCols.contains(f.name))
      DeltaRowReader.parsePartition(partitionValues.get(f.name).orNull, f.dataType)
    else null
  }
  private val isPart: Array[Boolean] = schema.fields.map(f => partCols.contains(f.name))

  override def next(): Boolean = {
    val g = reader.read()
    if (g == null) return false
    val values = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema.fields(i)
      values(i) =
        if (isPart(i)) partConst(i)
        else if (!g.getType.containsField(f.name)) null // pre-evolution file
        else {
          val idx = g.getType.getFieldIndex(f.name)
          if (g.getFieldRepetitionCount(idx) == 0) null
          else DeltaRowReader.readField(g, idx, f.dataType)
        }
      i += 1
    }
    current = new GenericInternalRow(values)
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

private[delta] object DeltaRowReader {
  def supported(t: DataType): Boolean = t match {
    case BooleanType | IntegerType | LongType | FloatType | DoubleType |
         StringType => true
    case _ => false
  }

  def readField(g: org.apache.parquet.example.data.Group, idx: Int,
                t: DataType): Any = t match {
    case BooleanType => g.getBoolean(idx, 0)
    case IntegerType => g.getInteger(idx, 0)
    case LongType => g.getLong(idx, 0)
    case FloatType => g.getFloat(idx, 0)
    case DoubleType => g.getDouble(idx, 0)
    case StringType => UTF8String.fromBytes(g.getBinary(idx, 0).getBytes)
    case other => throw new IllegalStateException(s"graft-delta: $other")
  }

  def parsePartition(v: String, t: DataType): Any =
    if (v == null) null
    else t match {
      case BooleanType => v.toBoolean
      case IntegerType => v.toInt
      case LongType => v.toLong
      case FloatType => v.toFloat
      case DoubleType => v.toDouble
      case StringType => UTF8String.fromString(v)
      case other => throw new IllegalStateException(s"graft-delta: $other")
    }
}
