// NOT part of the default build: this directory (src/aws/scala) is outside
// sbt's source paths because the AWS SDK cannot resolve in the zero-egress
// build environment. To enable the production S3 binding, add to build.sbt:
//
//   Compile / unmanagedSourceDirectories += baseDirectory.value / "src" / "aws" / "scala"
//   libraryDependencies += "software.amazon.awssdk" % "s3" % "2.29.x"
//
// Nothing else changes — graft.log.S3LogStore(new AwsS3Client(s3, bucket))
// is a drop-in LogStore. The protocol itself (CAS commit, ambiguous-outcome
// recovery, truncation) is store-agnostic and fully covered by the
// S3ClientFake semantics tests; this file contains ONLY the 1:1 SDK calls.
package graft.log

import scala.jdk.CollectionConverters._

import software.amazon.awssdk.core.sync.RequestBody
import software.amazon.awssdk.services.s3.S3Client
import software.amazon.awssdk.services.s3.model.S3Exception

/** Production [[S3ObjectClient]] over AWS SDK v2.
  *
  * Capability requirements (see [[S3LogStore]]'s scaladoc): conditional PUT
  * (`If-None-Match: *` → 412 when the key exists, native on S3 since
  * Nov 2024) and strongly consistent listing (native since Dec 2020).
  *
  * Failure-mode honesty, deliberately preserved:
  *   - 412 (PreconditionFailed) is the ONLY outcome mapped to `false` — it
  *     is S3's definitive "the key already exists".
  *   - 409 (ConditionalRequestConflict: another conditional write on the
  *     same key was in flight) and every network/timeout failure PROPAGATE.
  *     They are ambiguous — the PUT may have landed — and [[TxLog]] owns
  *     that recovery (commitId re-read + unresolved-version sweep).
  *     Mapping them to `false` here would reintroduce the double-commit
  *     the recovery exists to prevent.
  */
final class AwsS3Client(s3: S3Client, bucket: String) extends S3ObjectClient {

  /** Complete listing via the ListObjectsV2 paginator (each page is
    * lexicographic and the paginator walks contiguous pages, so the
    * concatenation preserves the [[S3ObjectClient.list]] contract). */
  override def list(prefix: String): Seq[String] =
    s3.listObjectsV2Paginator(b => { b.bucket(bucket).prefix(prefix); () })
      .iterator().asScala
      .flatMap(_.contents().asScala.map(_.key()))
      .toSeq

  /** Tail listing via ListObjectsV2's native StartAfter — the primitive
    * behind the `_last_checkpoint` fast path: resolving a long-history
    * table's latest snapshot lists O(tail) keys, not O(history). */
  override def list(prefix: String, startAfter: String): Seq[String] =
    s3.listObjectsV2Paginator(
        b => { b.bucket(bucket).prefix(prefix).startAfter(startAfter); () })
      .iterator().asScala
      .flatMap(_.contents().asScala.map(_.key()))
      .toSeq

  /** GetObject; absent keys throw the SDK's NoSuchKeyException, which
    * satisfies the trait's "throws when absent" contract as-is. */
  override def get(key: String): Array[Byte] =
    s3.getObjectAsBytes(b => { b.bucket(bucket).key(key); () }).asByteArray()

  /** Unconditional PutObject (checkpoints and truncation markers — content
    * is deterministic, so last-writer-wins is safe). */
  override def put(key: String, body: Array[Byte]): Unit = {
    s3.putObject(b => { b.bucket(bucket).key(key); () },
      RequestBody.fromBytes(body))
    ()
  }

  /** The commit CAS: PutObject + `If-None-Match: *`. */
  override def putIfNoneMatch(key: String, body: Array[Byte]): Boolean =
    try {
      s3.putObject(b => { b.bucket(bucket).key(key).ifNoneMatch("*"); () },
        RequestBody.fromBytes(body))
      true
    } catch {
      // definitive loss: the key exists
      case e: S3Exception if e.statusCode() == 412 => false
      // anything else (409 conflict, timeouts, 5xx) is ambiguous by design:
      // propagate so TxLog's recovery classifies the outcome
    }

  /** DeleteObject returns 204 whether or not the key existed; the trait
    * documents the boolean as best-effort and no caller depends on it. */
  override def delete(key: String): Boolean = {
    s3.deleteObject(b => { b.bucket(bucket).key(key); () })
    true
  }

  /** HeadObject LastModified — the age source for age-gated sweeps
    * (TRUNCATE HISTORY's orphan-sidecar GC). NoSuchKey → None. */
  override def modified(key: String): Option[Long] =
    try Some(s3.headObject(b => { b.bucket(bucket).key(key); () })
      .lastModified.toEpochMilli)
    catch { case _: software.amazon.awssdk.services.s3.model.NoSuchKeyException => None }
}
