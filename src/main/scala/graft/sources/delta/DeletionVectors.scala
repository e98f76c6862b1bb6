package graft.sources.delta

import java.nio.ByteBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration
import org.json4s._

/** One file's deletion vector: the set of PHYSICAL row indexes (parquet
  * `_metadata.row_index` order — stable for a written file) whose rows
  * are logically deleted. Carried on the `add` action as the protocol's
  * `deletionVector` descriptor (PROTOCOL.md "Deletion Vectors"), so a
  * row-level DELETE commits O(deleted rows) of sidecar bytes instead of
  * rewriting every straddled file — THE DML cost story at 100 TB, where
  * deleting 0.1% of rows otherwise rewrites ~every file.
  *
  * Descriptor fields mirror the protocol's names; the encodings are
  * graft-native (stated honestly — cross-engine DV readers expect
  * roaring bitmaps, which this container lacks):
  *   - `storageType` "i": `pathOrInlineDv` is base64 of [[DeletionVectors.serialize]];
  *   - `storageType` "u": a path RELATIVE to the table root
  *     (`_dv/dv-<uuid>.bin`), like data-file paths;
  *   - `storageType` "p": an ABSOLUTE path — what [[DeltaTable.cloneShallow]]
  *     rewrites "u" into, exactly as it absolutizes data paths.
  * `cardinality` is the deleted-row count (monotone per file: DVs only
  * grow until the file is rewritten or fully removed). */
final case class DvDescriptor(storageType: String, pathOrInlineDv: String,
                              sizeInBytes: Long, cardinality: Long)

object DeletionVectors {

  /** Wire format: [magic "GDV1"][version 1][count][count sorted longs],
    * all big-endian. Sorted-ascending is the contract [[DvLookup]]'s
    * binary search relies on. */
  private val Magic = 0x47445631 // "GDV1"
  private val Version = 1

  /** Inline-vs-sidecar threshold: a small DV rides inside the commit
    * JSON (no sidecar file, no extra read IO); past this it becomes a
    * `_dv/` file so commit JSON stays metadata-sized. */
  val InlineThresholdBytes: Int = 4096

  def serialize(sortedIndexes: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 + 8 * sortedIndexes.length)
    bb.putInt(Magic).putInt(Version).putLong(sortedIndexes.length.toLong)
    sortedIndexes.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    require(bb.getInt() == Magic, "delta: bad deletion-vector magic")
    require(bb.getInt() == Version, "delta: unsupported deletion-vector version")
    val n = bb.getLong()
    require(n >= 0 && 16 + 8 * n == bytes.length,
      s"delta: deletion-vector length mismatch (count=$n, bytes=${bytes.length})")
    val out = new Array[Long](n.toInt)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  /** Merge two sorted index arrays (duplicates collapse — idempotent
    * when a retry re-deletes an already-recorded index). */
  def union(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      val v = if (a(i) <= b(j)) a(i) else b(j)
      if (a(i) == v) i += 1
      if (j < b.length && b(j) == v) j += 1
      if (k == 0 || out(k - 1) != v) { out(k) = v; k += 1 }
    }
    while (i < a.length) { if (k == 0 || out(k - 1) != a(i)) { out(k) = a(i); k += 1 }; i += 1 }
    while (j < b.length) { if (k == 0 || out(k - 1) != b(j)) { out(k) = b(j); k += 1 }; j += 1 }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }

  /** Resolve a descriptor to the path its bytes live at (file forms
    * only; inline has no path). */
  def resolvePath(table: String, d: DvDescriptor): Path = d.storageType match {
    case "u" => new Path(table, d.pathOrInlineDv)
    case "p" => new Path(d.pathOrInlineDv)
    case other => throw new IllegalArgumentException(
      s"delta: deletion-vector storageType '$other' has no path")
  }

  def load(conf: Configuration, table: String, d: DvDescriptor): Array[Long] =
    d.storageType match {
      case "i" => deserialize(java.util.Base64.getDecoder.decode(d.pathOrInlineDv))
      case "u" | "p" =>
        val p = resolvePath(table, d)
        val fs = p.getFileSystem(conf)
        val in = fs.open(p)
        try {
          val bytes = new Array[Byte](d.sizeInBytes.toInt)
          in.readFully(0L, bytes)
          deserialize(bytes)
        } finally in.close()
      case other => throw new IllegalArgumentException(
        s"delta: unknown deletion-vector storageType '$other'")
    }

  /** Write `sortedIndexes` as a descriptor: inline under the threshold,
    * else a fresh `_dv/dv-<uuid>.bin` sidecar (UUID names — collision-
    * free without coordination, exactly like data files; a crashed or
    * losing writer's sidecar is an orphan [[DeltaTable.vacuumOrphans]]
    * reclaims). Callable executor-side: `conf` is the only context. */
  def write(conf: Configuration, table: String,
            sortedIndexes: Array[Long]): DvDescriptor = {
    val bytes = serialize(sortedIndexes)
    if (bytes.length <= InlineThresholdBytes)
      DvDescriptor("i", java.util.Base64.getEncoder.encodeToString(bytes),
        bytes.length.toLong, sortedIndexes.length.toLong)
    else {
      val rel = s"_dv/dv-${java.util.UUID.randomUUID()}.bin"
      val p = new Path(table, rel)
      val fs = p.getFileSystem(conf)
      val out = fs.create(p, false)
      try out.write(bytes) finally out.close()
      DvDescriptor("u", rel, bytes.length.toLong, sortedIndexes.length.toLong)
    }
  }

  /** Delete a descriptor's sidecar file if it has one (best-effort —
    * used on commit-race cleanup of a losing attempt's fresh DVs). */
  def deleteFile(conf: Configuration, table: String, d: DvDescriptor): Unit =
    if (d.storageType == "u" || d.storageType == "p") {
      val p = resolvePath(table, d)
      p.getFileSystem(conf).delete(p, false)
    }

  // --- action JSON (the `deletionVector` field of add/remove) ---------------

  def toJson(d: DvDescriptor): JValue = JObject(
    "storageType" -> JString(d.storageType),
    "pathOrInlineDv" -> JString(d.pathOrInlineDv),
    "sizeInBytes" -> JLong(d.sizeInBytes),
    "cardinality" -> JLong(d.cardinality))

  def fromJson(j: JValue): Option[DvDescriptor] = j match {
    case JObject(_) =>
      def longOf(v: JValue): Long = v match {
        case JInt(n) => n.toLong
        case JLong(n) => n
        case _ => 0L
      }
      (j \ "storageType", j \ "pathOrInlineDv") match {
        case (JString(st), JString(p)) =>
          Some(DvDescriptor(st, p, longOf(j \ "sizeInBytes"),
            longOf(j \ "cardinality")))
        case _ => None
      }
    case _ => None
  }

  /** Checkpoint column form: the descriptor as one JSON string (same
    * pattern as the `stats` column — a STRING survives checkpoint
    * schema evolution; absent/null column means no DV). */
  def toJsonString(d: DvDescriptor): String =
    jackson.JsonMethods.compact(jackson.JsonMethods.render(toJson(d)))

  def fromJsonString(s: String): Option[DvDescriptor] =
    try fromJson(jackson.JsonMethods.parse(s)) catch { case _: Exception => None }
}

/** Executor-side DV membership: qualified file path → deleted-index
  * array, loaded LAZILY in the task that reads the file (descriptors —
  * metadata-sized — travel in the plan; bitmap bytes never touch the
  * driver). A one-entry hot cache fronts the concurrent map because a
  * scan task reads one file's rows consecutively — the per-row cost is
  * a reference compare + binary search. */
final class DvLookup(table: String,
                     descriptors: Map[String, DvDescriptor],
                     conf: Broadcast[SerializableConfiguration])
    extends Serializable {

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
  @transient private var lastFile: String = _
  @transient private var lastArr: Array[Long] = _

  private val Empty = Array.empty[Long]

  def deleted(file: UTF8String, rowIndex: Long): Boolean = {
    val f = file.toString
    var arr = if (f == lastFile) lastArr else null
    if (arr == null) {
      arr = cache.computeIfAbsent(f, k => descriptors.get(k) match {
        case Some(d) => DeletionVectors.load(conf.value.value, table, d)
        case None => Empty
      })
      lastFile = f
      lastArr = arr
    }
    java.util.Arrays.binarySearch(arr, rowIndex) >= 0
  }
}

/** `dv_deleted(file_path, row_index) → boolean`: is the row deleted by
  * its file's deletion vector? The [[DvLookup]] rides as ONE reference
  * object in the generated code ([[graft.functions.BloomContains]]
  * pattern) so the filter stays inside whole-stage codegen; per row it
  * costs a cached-array fetch and an O(log cardinality) binary search. */
case class DvDeleted(left: Expression, right: Expression, lookup: DvLookup)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string file_path, bigint row_index), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullable: Boolean = false
  override def dataType: DataType = BooleanType
  override def prettyName: String = "dv_deleted"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val f = left.eval(input)
    val r = right.eval(input)
    // _metadata fields are never NULL; treat a NULL defensively as live
    if (f == null || r == null) false
    else lookup.deleted(f.asInstanceOf[UTF8String], r.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("dvLookup", lookup, classOf[DvLookup].getName)
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    ev.copy(
      code = code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.value} = false;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          ${ev.value} = $ref.deleted(${leftGen.value}, ${rightGen.value});
        }
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DvDeleted =
    copy(left = newLeft, right = newRight)
}
