package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Per-file key bloom filters — sidecar files under `blooms/`, one per
  * data file, holding a bloom per configured column (table property
  * `graft.bloom.columns`). The point-lookup complement to min/max
  * stats: uniform high-cardinality keys (md5 merge keys, uuids) make
  * min/max useless, so `WHERE merge_key = 'x'` on a 100 TB table reads
  * every file; with a per-file bloom the scan opens only the file(s)
  * that may contain the key (expected 1 + fpp·files). Iceberg reaches
  * the same goal with parquet row-group bloom filters + puffin blobs;
  * here the sidecar is loaded at PLANNING (driver, LRU-cached, files
  * are immutable so entries never invalidate) which skips whole FILES,
  * strictly stronger than row-group skipping.
  *
  * Never load-bearing: a bloom can only say "definitely absent" for a
  * file; false positives read a file whose rows Spark then filters
  * (pushed filters stay residual), missing/corrupt sidecars keep the
  * file. Deleted rows keep their key in the bloom (conservative).
  *
  * Format (one sidecar): magic "GBF1", int nCols, then per column:
  * utf name, int k, int nWords, nWords longs. Bits are fixed-size per
  * file (`graft.bloom.bits-per-file`, default 2^20 ≈ 128 KiB — 1% fpp
  * up to ~110k distinct keys/file; size to ~10 bits/key).
  *
  * Hashing: two 32-bit Murmur3 passes (seeds 0 and 0x9747b28c) over the
  * value's INTERNAL representation combined into a 64-bit pair for
  * double hashing — identical at write (InternalRow) and prune
  * (pushed-filter literal) time. Supported: string, int, long, date,
  * timestamp; other types are not tracked (never pruned).
  */
object GraftBloom {

  /** Table property: comma-separated columns to build per-file blooms for. */
  val ColumnsProp = "graft.bloom.columns"
  /** Table property: bloom size in bits per column per file (power of two). */
  val BitsProp = "graft.bloom.bits-per-file"
  val DefaultBits: Int = 1 << 20
  val NumHashes = 7

  def columns(properties: Map[String, String]): Seq[String] =
    properties.get(ColumnsProp).map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Nil)

  def bits(properties: Map[String, String]): Int =
    properties.get(BitsProp).map(_.toInt).map(b =>
      java.lang.Integer.highestOneBit(math.max(b, 1 << 10))).getOrElse(DefaultBits)

  /** Sidecar path (table-relative) for a data file path like
    * `data/part-x.parquet` → `blooms/part-x.parquet.bloom`.
    */
  def sidecarFor(dataRelPath: String): String =
    "blooms/" + dataRelPath.stripPrefix("data/") + ".bloom"

  /** The (h1, h2) hash pair of a value's internal representation; None
    * for unsupported types or null.
    */
  private[graft] def hashPair(v: Any, dt: DataType): Option[(Int, Int)] = {
    def bytes(b: Array[Byte]) = Some((
      Murmur3_x86_32.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 0),
      Murmur3_x86_32.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 0x9747b28c)))
    def long(l: Long) = Some((
      Murmur3_x86_32.hashLong(l, 0), Murmur3_x86_32.hashLong(l, 0x9747b28c)))
    (dt, v) match {
      case (_, null) => None
      case (StringType, s: UTF8String) => bytes(s.getBytes)
      case (IntegerType, n: Int) => long(n.toLong)
      case (LongType, n: Long) => long(n)
      case (DateType, n: Int) => long(n.toLong)
      case (TimestampType | TimestampNTZType, n: Long) => long(n)
      case _ => None
    }
  }

  /** Pushed-filter literal (EXTERNAL domain) → the same hash pair the
    * writer computed from the internal value.
    */
  private[catalog] def hashPairExternal(v: Any, dt: DataType): Option[(Int, Int)] = (dt, v) match {
    case (_, null) => None
    case (StringType, s: String) => hashPair(UTF8String.fromString(s), StringType)
    case (IntegerType, n: Int) => hashPair(n, IntegerType)
    case (LongType, n: Long) => hashPair(n, LongType)
    case (LongType, n: Int) => hashPair(n.toLong, LongType)
    case (DateType, d: java.sql.Date) => hashPair(DateTimeUtils.fromJavaDate(d), DateType)
    case (DateType, d: java.time.LocalDate) => hashPair(DateTimeUtils.localDateToDays(d), DateType)
    case (TimestampType, t: java.sql.Timestamp) => hashPair(DateTimeUtils.fromJavaTimestamp(t), TimestampType)
    case (TimestampType, t: java.time.Instant) => hashPair(DateTimeUtils.instantToMicros(t), TimestampType)
    case _ => None
  }

  /** One in-construction bloom (fixed size, power-of-two bits). */
  final class Builder(nBits: Int) {
    require(java.lang.Integer.bitCount(nBits) == 1, s"bits must be a power of two: $nBits")
    private val words = new Array[Long](nBits / 64)
    private val mask = nBits - 1

    def add(h: (Int, Int)): Unit = {
      var i = 0
      while (i < NumHashes) {
        val bit = (h._1 + i * h._2) & mask
        words(bit >> 6) |= 1L << (bit & 63)
        i += 1
      }
    }
    def result: Filterbits = new Filterbits(words, mask)
  }

  /** Queryable bloom bits. `k` is the hash count the WRITER set the
    * bits with (carried in the sidecar) — probing must use it, not the
    * compile-time [[NumHashes]]: a probe with more hashes than were set
    * yields false negatives, and a bloom false negative SKIPS a file
    * that contains matching rows (silent wrong results, not degraded
    * pruning).
    */
  final class Filterbits(words: Array[Long], mask: Int, k: Int = NumHashes) {
    def mayContain(h: (Int, Int)): Boolean = {
      var i = 0
      while (i < k) {
        val bit = (h._1 + i * h._2) & mask
        if ((words(bit >> 6) & (1L << (bit & 63))) == 0L) return false
        i += 1
      }
      true
    }
    private[GraftBloom] def raw: Array[Long] = words
  }

  /** Serialize `col -> bits` to the sidecar byte format. */
  def serialize(blooms: Seq[(String, Filterbits)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(0x47424631) // "GBF1"
    out.writeInt(blooms.size)
    blooms.foreach { case (name, f) =>
      out.writeUTF(name)
      out.writeInt(NumHashes)
      out.writeInt(f.raw.length)
      f.raw.foreach(out.writeLong)
    }
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Map[String, Filterbits] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    require(in.readInt() == 0x47424631, "not a graft bloom sidecar")
    val n = in.readInt()
    (0 until n).map { _ =>
      val name = in.readUTF()
      // probe with the WRITER's hash count: old sidecars stay correct
      // across a NumHashes change instead of silently false-negating
      val k = in.readInt()
      require(k >= 1 && k <= 64, s"bloom sidecar hash count out of range: $k")
      val words = new Array[Long](in.readInt())
      var i = 0
      while (i < words.length) { words(i) = in.readLong(); i += 1 }
      name -> new Filterbits(words, words.length * 64 - 1, k)
    }.toMap
  }

  // ---- driver-side sidecar cache (planning-time pruning) -------------

  /** Parsed sidecars by absolute path. Data files (and so their
    * sidecars) are immutable — entries never invalidate; bounded LRU
    * (256 × ~128 KiB ≈ 32 MiB worst case).
    */
  private val cache = new java.util.LinkedHashMap[String, Map[String, Filterbits]](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, Map[String, Filterbits]]): Boolean =
      size() > 256
  }

  private[catalog] def cacheClear(): Unit = cache.synchronized(cache.clear())

  /** Load (cached) the sidecar for `bloomRel` under `tableDir`; None on
    * any failure — pruning must degrade to "keep the file".
    */
  def load(tableDir: String, bloomRel: String, conf: Configuration): Option[Map[String, Filterbits]] = {
    val abs = new Path(new Path(tableDir), bloomRel).toString
    cache.synchronized(Option(cache.get(abs))) match {
      case some @ Some(_) => some
      case None =>
        try {
          val p = new Path(abs)
          val fs = p.getFileSystem(conf)
          val in = fs.open(p)
          val bytes = try in.readAllBytes() finally in.close()
          val parsed = deserialize(bytes)
          cache.synchronized(cache.put(abs, parsed))
          Some(parsed)
        } catch { case _: Throwable => None }
    }
  }

  /** May the file possibly contain ANY of `values` in `col`? Loads the
    * sidecar lazily; unknowns answer true.
    */
  def mayContainAny(
      tableDir: String, entry: FileEntry, col: String, dt: DataType,
      hashes: Seq[(Int, Int)], conf: Configuration): Boolean =
    entry.bloom match {
      case None => true
      case Some(rel) => load(tableDir, rel, conf) match {
        case None => true
        case Some(byCol) => byCol.get(col) match {
          case None => true
          case Some(bits) => hashes.isEmpty || hashes.exists(bits.mayContain)
        }
      }
    }
}
