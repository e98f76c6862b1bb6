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
  * Fields AND encodings follow the protocol (a foreign Delta reader
  * that supports `deletionVectors` reads these tables — the reference
  * serves its tables to Trino's Delta connector, `trino/etc/catalog/
  * delta.properties`):
  *   - `storageType` "i": `pathOrInlineDv` is the Z85 (base-85)
  *     encoding of the serialized bitmap (`sizeInBytes` recovers the
  *     unpadded length); no `offset`;
  *   - `storageType` "u": `pathOrInlineDv` is `<random prefix><z85
  *     uuid>` (last 20 chars encode a UUID); the bytes live at
  *     `<table>/<prefix>/deletion_vector_<uuid>.bin` at `offset`;
  *   - `storageType` "p": an ABSOLUTE file path — what
  *     [[DeltaTable.cloneShallow]] rewrites "u" into, exactly as it
  *     absolutizes data paths.
  * `cardinality` is the deleted-row count (monotone per file: DVs only
  * grow until the file is rewritten or fully removed). */
final case class DvDescriptor(storageType: String, pathOrInlineDv: String,
                              sizeInBytes: Long, cardinality: Long,
                              offset: Option[Long] = None)

object DeletionVectors {

  /** Serialized-bitmap format (PROTOCOL.md "Deletion Vector Format"):
    * `[magic 1681511377, 4B LE][RoaringBitmapArray "portable"]` where
    * portable = `[#bitmaps, 8B LE]` then per non-empty bitmap in
    * ascending key order `[key = high 32 bits, 4B LE][standard 32-bit
    * RoaringBitmap serialization]`. The 32-bit serialization is
    * delegated to `org.roaringbitmap.RoaringBitmap` (Spark's own
    * shuffle-status dependency), whose wire format IS the
    * RoaringFormatSpec the protocol cites — array/bitmap/run
    * containers all round-trip. */
  private val Magic = 1681511377
  /** On-disk sidecar framing: `[version 0x01, 1 byte]` then per stored
    * vector `[dataSize, 4B BE][data][CRC-32 of data, 4B BE]`; a
    * descriptor's `offset` points at its dataSize field. */
  private[delta] val FileFormatVersion: Byte = 1

  /** Inline-vs-sidecar threshold: a small DV rides inside the commit
    * JSON (no sidecar file, no extra read IO); past this it becomes a
    * sidecar file so commit JSON stays metadata-sized. */
  val InlineThresholdBytes: Int = 4096

  def serialize(sortedIndexes: Array[Long]): Array[Byte] = {
    // group by high-32 key; input sorted ⇒ groups are runs, keys ascend
    val bitmaps = scala.collection.mutable.ArrayBuffer.empty[(Int, org.roaringbitmap.RoaringBitmap)]
    var i = 0
    while (i < sortedIndexes.length) {
      val key = (sortedIndexes(i) >>> 32).toInt
      val rb = new org.roaringbitmap.RoaringBitmap()
      while (i < sortedIndexes.length && (sortedIndexes(i) >>> 32).toInt == key) {
        rb.add((sortedIndexes(i) & 0xFFFFFFFFL).toInt)
        i += 1
      }
      bitmaps += ((key, rb))
    }
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(Integer.reverseBytes(Magic))
    out.writeLong(java.lang.Long.reverseBytes(bitmaps.length.toLong))
    bitmaps.foreach { case (key, rb) =>
      out.writeInt(Integer.reverseBytes(key))
      rb.serialize(out) // RoaringFormatSpec bytes (the lib's native wire form)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val magic = Integer.reverseBytes(in.readInt())
    require(magic == Magic,
      s"delta: unsupported deletion-vector format magic $magic (want $Magic)")
    val n = java.lang.Long.reverseBytes(in.readLong())
    require(n >= 0 && n <= Int.MaxValue, s"delta: bad deletion-vector bitmap count $n")
    // two tiny passes over the (few) bitmaps so the output array
    // allocates exact-size and primitive — this loads on the per-task
    // hot path, where boxing millions of indexes would be GC noise
    val bitmaps = new Array[(Long, org.roaringbitmap.RoaringBitmap)](n.toInt)
    var b = 0
    var total = 0L
    while (b < n) {
      val key = Integer.reverseBytes(in.readInt()).toLong
      val rb = new org.roaringbitmap.RoaringBitmap()
      rb.deserialize(in) // consumes exactly one spec-format bitmap
      bitmaps(b) = (key, rb)
      total += rb.getLongCardinality
      b += 1
    }
    require(total <= Int.MaxValue, s"delta: deletion vector too large ($total)")
    val out = new Array[Long](total.toInt)
    var k = 0
    bitmaps.foreach { case (key, rb) =>
      val it = rb.getIntIterator
      while (it.hasNext) { out(k) = (key << 32) | (it.next().toLong & 0xFFFFFFFFL); k += 1 }
    }
    out // keys ascend and each bitmap iterates in unsigned order ⇒ sorted
  }

  // --- Z85 (the base-85 variant the protocol names for UUIDs + inline) ----

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val t = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => t(c.toInt) = i }
    t
  }

  /** Z85-encode `bytes` (zero-padded up to a multiple of 4 — the
    * decoder truncates back via the caller-known length, delta's
    * Base85Codec convention). */
  def z85Encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else java.util.Arrays.copyOf(bytes, bytes.length + (4 - bytes.length % 4))
    val sb = new java.lang.StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = ((padded(i) & 0xFFL) << 24) | ((padded(i + 1) & 0xFFL) << 16) |
        ((padded(i + 2) & 0xFFL) << 8) | (padded(i + 3) & 0xFFL)
      val chunk = new Array[Char](5)
      var j = 4
      while (j >= 0) { chunk(j) = Z85Alphabet((v % 85).toInt); v /= 85; j -= 1 }
      sb.append(chunk)
      i += 4
    }
    sb.toString
  }

  /** Decode a Z85 string to its first `outLen` bytes (padding drops). */
  def z85Decode(s: String, outLen: Int): Array[Byte] = {
    require(s.length % 5 == 0, s"delta: Z85 length ${s.length} not a multiple of 5")
    val full = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Decode(c.toInt) else -1
        require(d >= 0, s"delta: invalid Z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      val o = i / 5 * 4
      full(o) = (v >>> 24).toByte; full(o + 1) = (v >>> 16).toByte
      full(o + 2) = (v >>> 8).toByte; full(o + 3) = v.toByte
      i += 5
    }
    require(outLen <= full.length, s"delta: Z85 payload shorter than $outLen")
    if (outLen == full.length) full else java.util.Arrays.copyOf(full, outLen)
  }

  /** A UUID as the protocol's 20-char Z85 form (16 bytes, MSB first). */
  def encodeUuid(u: java.util.UUID): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
    z85Encode(bb.array())
  }

  def decodeUuid(s: String): java.util.UUID = {
    require(s.length == 20, s"delta: Z85 UUID must be 20 chars, got ${s.length}")
    val bb = ByteBuffer.wrap(z85Decode(s, 16))
    new java.util.UUID(bb.getLong(), bb.getLong())
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

  /** "u" descriptors' table-relative sidecar path: the last 20 chars of
    * `pathOrInlineDv` Z85-decode to the UUID, anything before them is a
    * random directory prefix (the protocol's S3-key-spreading knob) —
    * `<prefix>/deletion_vector_<uuid>.bin`. */
  def relativePath(d: DvDescriptor): String = {
    require(d.storageType == "u",
      s"delta: storageType '${d.storageType}' has no relative path")
    require(d.pathOrInlineDv.length >= 20,
      s"delta: 'u' pathOrInlineDv too short: '${d.pathOrInlineDv}'")
    // pre-protocol graft builds stored a literal relative PATH here
    // ("_dv/dv-<uuid>.bin") whose tail happens to be valid Z85 — refuse
    // it loudly instead of decoding a garbage UUID and failing deep in
    // a scan with FileNotFound. Keyed on the legacy form's "_dv/"
    // directory, NOT on ".bin": '.' is a valid Z85 character, so a
    // protocol-conformant foreign descriptor whose random prefix or
    // encoded UUID happens to end in ".bin" must still decode.
    require(!d.pathOrInlineDv.startsWith("_dv/"),
      s"delta: '${d.pathOrInlineDv}' is a legacy graft DV path, not the " +
        "protocol's <prefix><z85-uuid> form — purge the table's vectors " +
        "(CALL graft.system.purge_dvs) with the build that wrote them, " +
        "then re-delete under this one")
    val prefix = d.pathOrInlineDv.dropRight(20)
    val uuid = decodeUuid(d.pathOrInlineDv.takeRight(20))
    val name = s"deletion_vector_$uuid.bin"
    if (prefix.isEmpty) name else s"$prefix/$name"
  }

  /** The path a tombstone for a retired sidecar should carry (None for
    * inline): table-relative for "u" — same namespace as data-file
    * paths, so [[DeltaTable.vacuumRemoved]]'s retention clock reclaims
    * the bytes — absolute for "p". */
  def tombstonePath(d: DvDescriptor): Option[String] = d.storageType match {
    case "u" => Some(relativePath(d))
    case "p" => Some(d.pathOrInlineDv)
    case _ => None
  }

  /** Resolve a descriptor to the path its bytes live at (file forms
    * only; inline has no path). */
  def resolvePath(table: String, d: DvDescriptor): Path = d.storageType match {
    case "u" => new Path(table, relativePath(d))
    case "p" => new Path(d.pathOrInlineDv)
    case other => throw new IllegalArgumentException(
      s"delta: deletion-vector storageType '$other' has no path")
  }

  def load(conf: Configuration, table: String, d: DvDescriptor): Array[Long] =
    d.storageType match {
      case "i" =>
        deserialize(z85Decode(d.pathOrInlineDv, d.sizeInBytes.toInt))
      case "u" | "p" =>
        val p = resolvePath(table, d)
        val fs = p.getFileSystem(conf)
        val in = fs.open(p)
        try {
          // frame at `offset`: [dataSize 4B BE][data][CRC-32 4B BE].
          // Absent offset defaults to 0 (delta-kernel's reading), NOT
          // to "after the version byte" — a writer that omits it points
          // the descriptor at the very start of its blob
          val off = d.offset.getOrElse(0L)
          val head = new Array[Byte](4)
          in.readFully(off, head)
          val size = ByteBuffer.wrap(head).getInt
          require(size == d.sizeInBytes,
            s"delta: sidecar size $size != descriptor sizeInBytes ${d.sizeInBytes} ($p)")
          val bytes = new Array[Byte](size)
          in.readFully(off + 4, bytes)
          val tail = new Array[Byte](4)
          in.readFully(off + 4 + size, tail)
          val crc = new java.util.zip.CRC32()
          crc.update(bytes)
          require(ByteBuffer.wrap(tail).getInt == crc.getValue.toInt,
            s"delta: deletion-vector checksum mismatch at $p:$off")
          deserialize(bytes)
        } finally in.close()
      case other => throw new IllegalArgumentException(
        s"delta: unknown deletion-vector storageType '$other'")
    }

  /** Write `sortedIndexes` as a descriptor: inline under the threshold,
    * else a fresh single-vector `deletion_vector_<uuid>.bin` sidecar
    * (one-shot convenience over [[DvSidecarWriter]] — batch paths that
    * write many vectors must hold one writer per task instead). */
  def write(conf: Configuration, table: String,
            sortedIndexes: Array[Long]): DvDescriptor = {
    val w = new DvSidecarWriter(conf, table, atTableRoot = true)
    try w.write(sortedIndexes) finally w.close()
  }

  /** Like [[write]], but sidecars land under an explicit `dir` as
    * ABSOLUTE-path ("p") descriptors — table-root-agnostic, which is
    * what transient position sets (row-level-operation marks staged
    * under a `.staging-` scratch) need: any later reader resolves them
    * without knowing the scratch layout. */
  def writeAt(conf: Configuration, dir: String,
              sortedIndexes: Array[Long]): DvDescriptor = {
    val w = new DvSidecarWriter(conf, dir, atTableRoot = false)
    try w.write(sortedIndexes) finally w.close()
  }

  /** [[load]] through the executor-level [[DvVectorCache]] for
    * file-backed forms — a split-up data file's readers land in
    * several tasks, and each would otherwise re-read and re-deserialize
    * the file's ENTIRE vector. Inline ("i") descriptors skip the cache:
    * their decode is bounded by [[InlineThresholdBytes]] and the
    * payload itself would be the key. */
  def loadCached(conf: Configuration, table: String,
                 d: DvDescriptor): Array[Long] =
    if (d.storageType == "i") load(conf, table, d)
    else DvVectorCache.get(
      s"$table|${d.storageType}|${d.pathOrInlineDv}|${d.offset.getOrElse(0L)}")(
      load(conf, table, d))

  /** Delete a descriptor's sidecar file if it has one (best-effort —
    * used on commit-race cleanup of a losing attempt's fresh DVs). */
  def deleteFile(conf: Configuration, table: String, d: DvDescriptor): Unit =
    if (d.storageType == "u" || d.storageType == "p") {
      val p = resolvePath(table, d)
      p.getFileSystem(conf).delete(p, false)
    }

  // --- action JSON (the `deletionVector` field of add/remove) ---------------

  def toJson(d: DvDescriptor): JValue = JObject(
    List(
      "storageType" -> (JString(d.storageType): JValue),
      "pathOrInlineDv" -> JString(d.pathOrInlineDv)) ++
      d.offset.map(o => "offset" -> (JLong(o): JValue)).toList ++
      List(
        "sizeInBytes" -> (JLong(d.sizeInBytes): JValue),
        "cardinality" -> JLong(d.cardinality)): _*)

  /** Parse the `deletionVector` field of an add/remove action (or its
    * checkpoint JSON-string form). Absent field → None; a PRESENT but
    * malformed descriptor THROWS — treating it as "no DV" would drop
    * the vector from scan routing and silently resurrect its deleted
    * rows, the one failure mode a reader must never have. Only
    * `offset` is optional (delta-kernel omits it for offset 0). */
  def fromJson(j: JValue): Option[DvDescriptor] = j match {
    case JObject(_) =>
      def bad(what: String): Nothing = throw new IllegalStateException(
        s"delta: malformed deletionVector descriptor ($what): " +
          jackson.JsonMethods.compact(jackson.JsonMethods.render(j)))
      def longOf(name: String): Long = (j \ name) match {
        case JInt(n) => n.toLong
        case JLong(n) => n
        case _ => bad(s"missing $name")
      }
      (j \ "storageType", j \ "pathOrInlineDv") match {
        case (JString(st), JString(p)) =>
          val off = j \ "offset" match {
            case JInt(n) => Some(n.toLong)
            case JLong(n) => Some(n)
            case _ => None
          }
          Some(DvDescriptor(st, p, longOf("sizeInBytes"),
            longOf("cardinality"), off))
        case _ => bad("missing storageType/pathOrInlineDv")
      }
    case _ => None
  }

  /** The descriptor as one JSON string — the wire form row-level-op
    * commit messages carry, and the column form of PRE-round-12
    * checkpoints (current checkpoints write the protocol's STRUCT,
    * [[DeltaLog.CpDv]]; readers accept both). */
  def toJsonString(d: DvDescriptor): String =
    jackson.JsonMethods.compact(jackson.JsonMethods.render(toJson(d)))

  /** [[fromJson]] over a JSON string. JSON that does not even parse
    * returns None (callers with a non-descriptor string context, e.g.
    * the row-level commit path, escalate that to their own hard
    * error); a parsed-but-malformed descriptor throws via
    * [[fromJson]]'s strictness. */
  def fromJsonString(s: String): Option[DvDescriptor] =
    try fromJson(jackson.JsonMethods.parse(s))
    catch { case _: com.fasterxml.jackson.core.JacksonException => None }
}

/** Executor-level (per-JVM) LRU of loaded deletion vectors, bounded by
  * TOTAL retained positions (not entry count — vectors vary from a few
  * indexes to tens of millions). Sidecar bytes are immutable once
  * written (UUID names, create-fail-if-exists), so entries never go
  * stale. Loads happen OUTSIDE the lock — two concurrent misses may
  * both read the file (wasted IO, never a wrong answer) rather than
  * serialize every task's first access behind one reader. */
private[delta] object DvVectorCache {
  private val MaxLongs = 16L << 20 // ~128 MB of cached positions
  private var total = 0L
  private val map =
    new java.util.LinkedHashMap[String, Array[Long]](64, 0.75f, true)

  def get(key: String)(load: => Array[Long]): Array[Long] = {
    synchronized {
      val v = map.get(key)
      if (v != null) return v
    }
    val arr = load
    synchronized {
      val existing = map.get(key)
      if (existing != null) existing
      else {
        map.put(key, arr)
        total += arr.length
        val it = map.entrySet().iterator()
        while (total > MaxLongs && it.hasNext) {
          val e = it.next()
          if (e.getKey != key) { total -= e.getValue.length; it.remove() }
        }
        arr
      }
    }
  }
}

/** Appends MANY vectors into ONE framed sidecar file — the protocol's
  * shape (a sidecar holds multiple vectors; each descriptor's `offset`
  * locates its frame). At 100 TB a wide DELETE straddling 50k files
  * must not write 50k tiny objects (S3 put-amplification); instead
  * each TASK holds one of these and appends its files' vectors, so a
  * commit writes O(tasks) sidecars, not O(files). The file opens
  * LAZILY on the first oversized vector (all-inline tasks create
  * nothing) under a fresh UUID name — collision-free without
  * coordination, exactly like data files; a crashed or losing writer's
  * sidecar is an orphan [[DeltaTable.vacuumOrphans]] reclaims.
  *
  * `atTableRoot=true` emits the protocol's "u" descriptors (the shared
  * file is `deletion_vector_<uuid>.bin` under the table root `dir`);
  * false emits absolute-path "p" descriptors under a scratch `dir`
  * (row-level-operation marks). Executor-callable: `conf` is the only
  * context. Not thread-safe — one per task, like any file writer. */
final class DvSidecarWriter(conf: Configuration, dir: String,
                            atTableRoot: Boolean,
                            rolloverBytes: Long = Int.MaxValue.toLong) {
  private var uuid: java.util.UUID = _
  private var path: Path = _
  private var out: java.io.OutputStream = _
  private var written: Long = 0L
  private val allPaths = scala.collection.mutable.ArrayBuffer.empty[Path]

  /** Inline descriptor under the threshold; otherwise one appended
    * frame `[dataSize 4B BE][data][CRC-32 4B BE]` whose descriptor
    * offset points at its dataSize field. The file ROLLS OVER before an
    * offset would cross `rolloverBytes` (default `Int.MaxValue`):
    * the protocol's checkpoint schema types `offset` as an int, so a
    * task packing enough vectors to pass 2 GiB must start a fresh
    * sidecar or every future checkpoint of the table would refuse. */
  def write(sortedIndexes: Array[Long]): DvDescriptor = {
    val bytes = DeletionVectors.serialize(sortedIndexes)
    if (bytes.length <= DeletionVectors.InlineThresholdBytes)
      DvDescriptor("i", DeletionVectors.z85Encode(bytes),
        bytes.length.toLong, sortedIndexes.length.toLong)
    else {
      if (out != null && written + 8L + bytes.length > rolloverBytes)
        close() // next write opens a fresh UUID file
      if (out == null) {
        uuid = java.util.UUID.randomUUID()
        path = new Path(dir, s"deletion_vector_$uuid.bin")
        out = path.getFileSystem(conf).create(path, false)
        allPaths += path
        out.write(DeletionVectors.FileFormatVersion.toInt)
        written = 1L
      }
      val off = written
      out.write(ByteBuffer.allocate(4).putInt(bytes.length).array())
      out.write(bytes)
      val crc = new java.util.zip.CRC32()
      crc.update(bytes)
      out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
      written += 8L + bytes.length
      DvDescriptor(
        if (atTableRoot) "u" else "p",
        if (atTableRoot) DeletionVectors.encodeUuid(uuid)
        else path.getFileSystem(conf).makeQualified(path).toString,
        bytes.length.toLong, sortedIndexes.length.toLong,
        offset = Some(off))
    }
  }

  def close(): Unit = if (out != null) { out.close(); out = null }

  /** Close and delete EVERY sidecar this writer created, rolled-over
    * ones included (task-failure cleanup — don't wait for the vacuum
    * cycle when the failure is observed in-line). */
  def abort(): Unit = {
    close()
    allPaths.foreach(p => p.getFileSystem(conf).delete(p, false))
  }
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
        case Some(d) => DeletionVectors.loadCached(conf.value.value, table, d)
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
