package graft.log

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}

/** Per-file bloom-filter indexes for equality/IN file skipping — the
  * data-skipping lever min/max stats cannot provide: a high-cardinality key
  * written in arrival order spans nearly the full key range in EVERY file,
  * so range stats prune nothing, while a bloom filter prunes a point lookup
  * to ~the one file that holds the key (within the configured false-positive
  * rate). Same idea as Databricks' bloom filter index for Delta; here the
  * filter is one sidecar file per (data file, column) under `_bloom/`,
  * referenced from the AddFile action.
  *
  * Layout: little-endian `[int version=1][int k][long mBits][mBits/8 bytes]`.
  * Membership hashing is Spark's `xxhash64(col)` (seed 42) split
  * Kirsch-Mitzenmacher style into k probe positions — the same hash Spark
  * computes distributedly at build time can be replayed on the driver for a
  * predicate literal, so build and probe can never disagree.
  */
object BloomFilter {

  val Version = 1

  /** Size the filter for `n` expected distinct values at false-positive
    * rate `fpp`; bits rounded up to whole 64-bit words, capped at 2^27 bits
    * (16 MB) so a pathological row count cannot balloon the sidecars. */
  def sizing(n: Long, fpp: Double): (Long, Int) = {
    val ln2 = math.log(2)
    val mRaw = math.ceil(-n.max(1L) * math.log(fpp) / (ln2 * ln2)).toLong
    val m = math.min(((mRaw + 63) / 64) * 64, 1L << 27)
    val k = math.max(1, math.round(ln2 * m / n.max(1L)).toInt).min(16)
    (m, k)
  }

  /** The k probe positions for one xxhash64 value (double hashing: the two
    * 32-bit halves drive an odd-stride sequence — standard KM construction). */
  def positions(hash: Long, m: Long, k: Int): Iterator[Long] = {
    val h1 = hash
    val h2 = (hash >>> 32) | 1L // odd stride
    (0 until k).iterator.map(i => java.lang.Long.remainderUnsigned(h1 + i * h2, m))
  }

  def serialize(k: Int, m: Long, words: Array[Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(16 + words.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Version).putInt(k).putLong(m)
    words.foreach(buf.putLong)
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): Option[Loaded] = {
    if (bytes.length < 16) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val v = buf.getInt
    val k = buf.getInt
    val m = buf.getLong
    if (v != Version || k <= 0 || m <= 0 || bytes.length < 16 + m / 8) None
    else {
      val words = new Array[Long]((m / 64).toInt)
      var i = 0
      while (i < words.length) { words(i) = buf.getLong; i += 1 }
      Some(Loaded(k, m, words))
    }
  }

  final case class Loaded(k: Int, m: Long, words: Array[Long]) {
    def mightContain(hash: Long): Boolean =
      positions(hash, m, k).forall { pos =>
        (words((pos / 64).toInt) & (1L << (pos % 64).toInt)) != 0L
      }
  }
}

/** Driver-side reader over a table's bloom sidecars: resolves an AddFile's
  * per-column bloom reference, loads + caches the bitset by relative path,
  * and answers membership conservatively — any missing/corrupt sidecar (or
  * a renamed column whose bloom is keyed by the old name) keeps the file. */
final class BloomIndex private (resolve: Option[String => Path]) {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[BloomFilter.Loaded]]()

  /** False ONLY when a valid bloom for the column proves the hash absent. */
  def mightContain(f: AddFile, colName: String, hash: Long): Boolean = resolve match {
    case None => true
    case Some(rs) =>
      val ref = Option(f.bloom).flatMap(_.collectFirst {
        case (c, rel) if c.equalsIgnoreCase(colName) => rel
      })
      ref.forall { rel =>
        cache.computeIfAbsent(rel, r =>
          try BloomFilter.deserialize(Files.readAllBytes(rs(r)))
          catch { case scala.util.control.NonFatal(_) => None }
        ).forall(_.mightContain(hash))
      }
  }
}

object BloomIndex {
  /** No sidecar access — every membership query answers "might contain". */
  val disabled: BloomIndex = new BloomIndex(None)

  def forTable(tableDir: Path): BloomIndex =
    new BloomIndex(Some(rel => tableDir.resolve(rel)))
}
