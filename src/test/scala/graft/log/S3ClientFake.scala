package graft.log

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Contract fake of the S3 object API: a linearizable key→bytes map with
  * S3's semantics (lexicographic complete listing, NoSuchKey on absent
  * get, 412-style putIfNoneMatch) plus injectable network faults — the
  * three lying conditional-PUT outcomes a real store produces
  * (land-then-throw, land-then-412, throw-before-landing) and transient
  * GET failures. `chaos(seed, p)` arms all four at probability ~p each;
  * the one-shot vars arm a single deterministic fault. */
class S3ClientFake extends S3ObjectClient {
  private val objects = new ConcurrentHashMap[String, Array[Byte]]()
  private val putTimes = new ConcurrentHashMap[String, java.lang.Long]()

  // one-shot deterministic faults
  @volatile var nextPutLandsThenThrows = false
  @volatile var nextPutLandsThen412s = false
  @volatile var nextPutThrowsBeforeLanding = false

  // seeded random chaos: each fault type fires independently at pct/100
  private var rnd: java.util.Random = null
  private var pct: Int = 0
  def chaos(seed: Long, faultPct: Int): this.type = {
    rnd = new java.util.Random(seed); pct = faultPct; this
  }
  private def hit(): Boolean =
    rnd != null && rnd.synchronized(rnd.nextInt(100)) < pct

  // request accounting: full-history LISTs vs StartAfter tail LISTs (the
  // _last_checkpoint fast path's claim is observable here)
  val fullLists = new java.util.concurrent.atomic.AtomicInteger
  val tailLists = new java.util.concurrent.atomic.AtomicInteger

  def list(prefix: String): Seq[String] = {
    fullLists.incrementAndGet(): Unit
    objects.keySet().asScala.toSeq.filter(_.startsWith(prefix)).sorted
  }

  /** Native StartAfter (ListObjectsV2 semantics): keys with the prefix,
    * strictly after `startAfter`, lexicographic. */
  override def list(prefix: String, startAfter: String): Seq[String] = {
    tailLists.incrementAndGet(): Unit
    objects.keySet().asScala.toSeq
      .filter(k => k.startsWith(prefix) && k > startAfter).sorted
  }

  def get(key: String): Array[Byte] = {
    if (hit()) throw new RuntimeException(s"S3 500: transient GET failure for $key")
    val b = objects.get(key)
    if (b == null) throw new RuntimeException(s"NoSuchKey: $key")
    b
  }

  def put(key: String, body: Array[Byte]): Unit = {
    objects.put(key, body): Unit
    putTimes.put(key, System.currentTimeMillis()): Unit
  }

  def putIfNoneMatch(key: String, body: Array[Byte]): Boolean = {
    if (nextPutThrowsBeforeLanding || hit()) {
      nextPutThrowsBeforeLanding = false
      throw new RuntimeException("S3 503: request never reached the bucket")
    }
    val landed = objects.putIfAbsent(key, body) == null
    if (landed) putTimes.put(key, System.currentTimeMillis()): Unit
    if (landed && (nextPutLandsThenThrows || hit())) {
      nextPutLandsThenThrows = false
      throw new RuntimeException("S3 timeout: PUT landed, response lost")
    }
    if (landed && (nextPutLandsThen412s || hit())) {
      nextPutLandsThen412s = false
      return false // the SDK's internal retry observed its own object: 412
    }
    landed
  }

  def delete(key: String): Boolean = {
    putTimes.remove(key): Unit
    objects.remove(key) != null
  }

  override def modified(key: String): Option[Long] =
    Option(putTimes.get(key)).map(_.toLong)

  /** Test hook: rewrite an object's LastModified (age-gated sweeps). */
  def backdate(key: String, millis: Long): Unit =
    putTimes.put(key, millis): Unit

  def size: Int = objects.size()
}
