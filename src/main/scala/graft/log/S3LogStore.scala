package graft.log

import java.nio.charset.StandardCharsets
import java.nio.file.Path

/** The minimal slice of the S3 object API the transaction log needs — five
  * calls, mirroring AWS SDK v2 1:1 so a production binding is a thin
  * adapter with no protocol logic in it. That binding EXISTS, as code:
  * `src/aws/scala/graft/log/AwsS3Client.scala` spells out the 1:1 SDK-v2
  * calls (paginator listing, conditional PUT with the 412/ambiguous-outcome
  * split) and is excluded from the default build only because the SDK jar
  * cannot resolve in the zero-egress environment — enabling it is the
  * two-line build.sbt change documented at the top of that file.
  *
  * Store-capability requirements (all true of the targets that have
  * conditional writes at all):
  *   - '''Conditional PUT''': `If-None-Match: *` fails with 412 when the
  *     key exists — S3 exposes it natively since Nov 2024; GCS has the
  *     equivalent `x-goog-if-generation-match: 0`; ADLS/ABFS has
  *     `If-None-Match: *` on create. This is the put-if-absent CAS the
  *     commit protocol rests on.
  *   - '''Strongly consistent listing''': the [[LogStore]] contract
  *     requires complete listings (S3 is read-after-write consistent for
  *     list since Dec 2020 — long before conditional PUT existed, so any
  *     conditional-PUT-capable store qualifies). [[TxLog]]'s
  *     ambiguous-outcome recovery additionally uses "absent from the
  *     listing" as proof that a contested PUT did not land.
  *
  * Failure-mode honesty: a conditional PUT on a real network can LAND and
  * then lie — response timeout after the mutation, or the SDK's internal
  * retry observing the first attempt's own object as a 412. This class
  * deliberately passes those outcomes straight through ([[TxLog]] owns the
  * recovery: commitId re-read + unresolved-version sweep); swallowing them
  * here would reintroduce the double-commit. The contract fake in the test
  * tree (`S3ClientFake`) injects exactly these faults, and the full
  * LogStore + LakeTable concurrency matrix runs against it — the protocol
  * is proven on the S3 semantics without a network.
  *
  * Reference behavior contract: concurrent writers both landing,
  * serialized by optimistic retry —
  * /root/reference/notebooks/04_acid_operations.py:430-460.
  */
trait S3ObjectClient {
  /** All keys with this prefix (complete, lexicographic — ListObjectsV2). */
  def list(prefix: String): Seq[String]
  /** Keys with this prefix strictly after `startAfter` — ListObjectsV2's
    * native `StartAfter`. The default filters a full listing; the SDK
    * adapter overrides so tail listings cost O(tail) requests. */
  def list(prefix: String, startAfter: String): Seq[String] =
    list(prefix).filter(_ > startAfter)
  /** Object bytes; throws (NoSuchKey) when absent — GetObject. */
  def get(key: String): Array[Byte]
  /** Unconditional write — PutObject. */
  def put(key: String, body: Array[Byte]): Unit
  /** Conditional create: false iff the key already exists (412) —
    * PutObject + If-None-Match: *. */
  def putIfNoneMatch(key: String, body: Array[Byte]): Boolean
  /** Remove one object; true iff it existed — DeleteObject (S3 returns
    * 204 either way; implementations may probe first or just return the
    * best-effort answer, the caller never depends on it). */
  def delete(key: String): Boolean
  /** Last-modified epoch millis — HeadObject's LastModified (also carried
    * by every ListObjectsV2 row). Default None: an adapter that cannot
    * answer makes age-gated sweeps skip, never delete. */
  def modified(key: String): Option[Long] = None
}

/** [[LogStore]] over an [[S3ObjectClient]]: log "paths" map to object keys
  * (the table path minus its leading slash), `writeAtomic(overwrite=false)`
  * is the conditional PUT, and checkpoints (idempotent, deterministic
  * content) publish with a plain PUT. Object stores have no partial-object
  * reads, so the atomic-publish half of the contract is inherent. */
class S3LogStore(client: S3ObjectClient) extends LogStore {

  private def keyOf(p: Path): String = p.toString.stripPrefix("/")

  def listFileNames(dir: Path): Seq[String] = {
    val prefix = keyOf(dir) + "/"
    client.list(prefix).flatMap { k =>
      val rest = k.stripPrefix(prefix)
      // direct children only: the log dir is flat, anything nested is not a
      // commit file (mirrors a delimiter-less listing filtered client-side)
      if (rest.nonEmpty && !rest.contains("/")) Some(rest) else None
    }
  }

  override def listFileNamesAfter(dir: Path, startAfter: String): Seq[String] = {
    val prefix = keyOf(dir) + "/"
    client.list(prefix, prefix + startAfter).flatMap { k =>
      val rest = k.stripPrefix(prefix)
      if (rest.nonEmpty && !rest.contains("/")) Some(rest) else None
    }
  }

  def read(path: Path): Seq[String] =
    new String(client.get(keyOf(path)), StandardCharsets.UTF_8)
      .split("\n", -1).toSeq

  override def readBytes(path: Path): Array[Byte] = client.get(keyOf(path))

  def writeAtomic(path: Path, body: Array[Byte], overwrite: Boolean): Boolean =
    if (overwrite) { client.put(keyOf(path), body); true }
    else client.putIfNoneMatch(keyOf(path), body)

  def delete(path: Path): Boolean = client.delete(keyOf(path))

  override def modifiedMillis(path: Path): Option[Long] =
    client.modified(keyOf(path))
}
