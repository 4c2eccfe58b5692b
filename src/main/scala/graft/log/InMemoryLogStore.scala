package graft.log

import java.nio.file.Path
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Object-store-shaped [[LogStore]]: no filesystem at all — log objects
  * live in an atomic map keyed by path, and `writeAtomic(overwrite=false)`
  * maps to `putIfAbsent`. This is exactly the surface an S3
  * conditional-PUT implementation has (list a prefix, GET an object, PUT
  * with `If-None-Match: *`): if the commit protocol is correct against
  * this store, it is correct on any store that can supply these three
  * calls — there is no rename, no hard link, and no directory to lean on.
  *
  * Two production roles:
  *   - the reference implementation an S3/GCS/ADLS store is written
  *     against (swap the map operations for the corresponding object-store
  *     calls — the CAS row is the conditional PUT); [[S3LogStore]] is that
  *     store, written over the five-call [[S3ObjectClient]] seam;
  *   - a real in-process store for ephemeral tables (tests, scratch
  *     pipelines) whose LOG should never touch disk. Data files are
  *     written by Spark wherever the table's `dir` points; only the
  *     transaction log is virtualized.
  *
  * The multi-writer contract ([[LogStore]] scaladoc) is inherited from
  * `ConcurrentHashMap`: `putIfAbsent` is linearizable, so exactly one
  * contending writer claims each version, and a stored byte array is
  * published whole (readers can never observe a partial object).
  *
  * Reference behavior contract: the concurrent-append demo at
  * notebooks/04_acid_operations.py:430-460 — both writers land, serialized
  * by optimistic retry.
  */
class InMemoryLogStore extends LogStore {
  private val objects = new ConcurrentHashMap[Path, Array[Byte]]()
  private val putTimes = new ConcurrentHashMap[Path, java.lang.Long]()

  def listFileNames(dir: Path): Seq[String] =
    objects.keySet().asScala.toSeq
      .filter(_.getParent == dir).map(_.getFileName.toString)

  def read(path: Path): Seq[String] =
    new String(readBytes(path), java.nio.charset.StandardCharsets.UTF_8)
      .split("\n", -1).toSeq

  override def readBytes(path: Path): Array[Byte] = {
    val bytes = objects.get(path)
    require(bytes != null, s"no such log object: $path")
    bytes
  }

  def writeAtomic(path: Path, body: Array[Byte], overwrite: Boolean): Boolean = {
    val landed =
      if (overwrite) { objects.put(path, body); true }
      else objects.putIfAbsent(path, body) == null
    if (landed) putTimes.put(path, System.currentTimeMillis()): Unit
    landed
  }

  def delete(path: Path): Boolean = {
    putTimes.remove(path): Unit
    objects.remove(path) != null
  }

  override def modifiedMillis(path: Path): Option[Long] =
    Option(putTimes.get(path)).map(_.toLong)

  /** Test hook: rewrite a stored object's put time (age-gated sweeps). */
  def setModifiedMillis(path: Path, millis: Long): Unit =
    putTimes.put(path, millis): Unit

  /** Number of stored log objects (diagnostics). */
  def size: Int = objects.size()
}
