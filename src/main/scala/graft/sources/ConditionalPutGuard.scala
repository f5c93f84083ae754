package graft.sources

import java.util.UUID
import org.apache.hadoop.fs.{FileSystem, FSDataOutputStream, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** The shippable conditional-put [[CommitGuard]]: publishes a snapshot
  * document through the store's ATOMIC create-if-absent-with-content
  * primitive, expressed through the Hadoop API as
  * `fs.create(target, overwrite = false)` carrying the FULL staged body
  * and committing at `close()` — the S3 `If-None-Match: *` PUT shape
  * (body uploads, the conditional check happens when the object
  * completes; GCS `ifGenerationMatch: 0` behaves identically).
  *
  * Register under `spark.azof.commitGuard.<scheme>` for schemes whose
  * `create(path, overwrite = false)` commits atomically at close:
  *   - object-store connectors with conditional-write support
  *     (e.g. Hadoop's S3A `fs.s3a.create.conditional.enabled`, which
  *     maps exactly this call onto an `If-None-Match: *` PUT);
  *   - [[SimStoreFileSystem]], this repo's simulated conditional store
  *     (`simstore:` scheme), for testing the protocol end-to-end on a
  *     store whose RENAME is explicitly non-atomic.
  *
  * Do NOT register it for filesystems that materialize a VISIBLE EMPTY
  * file at `create()` and fill it afterwards (RawLocal, HDFS): there the
  * claim-then-write window violates the CommitGuard atomicity
  * requirement (a concurrent committer could classify the in-flight
  * document as crash debris), and the default rename guard is both
  * correct and stronger on those stores.
  *
  * Failure mapping per the [[CommitGuard]] contract: a
  * `FileAlreadyExistsException` from either the create call (fast-path
  * existence check) or the close (the authoritative conditional commit)
  * is a lost commit race → false; every other IOException is a store
  * fault → propagates. The staged `tmp` is left for the caller to
  * delete on every path.
  */
class ConditionalPutGuard extends CommitGuard {
  override def publish(fs: FileSystem, tmp: Path, target: Path): Boolean = {
    val in = fs.open(tmp)
    val bytes = try in.readAllBytes() finally in.close()
    try {
      val out = fs.create(target, false)
      try out.write(bytes)
      catch { case e: Throwable => abortQuietly(out); throw e }
      out.close() // the authoritative conditional commit
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.nio.file.FileAlreadyExistsException        => false
    }
  }

  /** Discard a failed write WITHOUT closing. On a conditional-put
    * stream `close()` IS the commit (S3A completes the upload;
    * [[SimStoreFileSystem]] links the staging file), so closing after a
    * mid-write failure would publish the partial buffer as a TORN
    * snapshot document that permanently occupies the version slot:
    * every retry of that version would then lose the create race to
    * the torn debris and the table could wedge. Hadoop's [[Abortable]]
    * is the discard primitive — S3A's conditional streams abort the
    * multipart upload, SimStore's wrapper unlinks its staging file. A
    * stream without abort support is deliberately left UNCLOSED:
    * leaking one handle on an already-failing store call beats
    * committing torn bytes. Exceptions from the abort itself are
    * swallowed so the original write failure propagates.
    */
  private def abortQuietly(out: FSDataOutputStream): Unit =
    try { out.abort(); () } catch { case _: Throwable => () }
}

/** A simulated S3-class object store over local disk — the deployment
  * model for [[ConditionalPutGuard]], exercised end-to-end by
  * CommitGuardSpec. Two deliberate semantics, each matching a real
  * object store and each the OPPOSITE of what the default rename-based
  * commit path assumes:
  *
  *   - '''rename is non-atomic and last-writer-wins''': a single-file
  *     rename is copy + delete that silently REPLACES an existing
  *     target and returns true (the plain-S3A shape — no
  *     first-writer-wins refusal, so an exists-check + rename commit is
  *     check-then-act and two racers can both "succeed", one clobbering
  *     the other). Directory renames delegate to the local
  *     implementation so Spark's file committers keep working.
  *   - '''create(path, overwrite = false) is an atomic conditional
  *     put''': bytes buffer into a hidden staging file and publish at
  *     `close()` via a hard link — the target appears with its COMPLETE
  *     content in one operation or the close throws
  *     `FileAlreadyExistsException` because a competing object landed
  *     first. No visible empty-file window, exactly the conditional-PUT
  *     contract the guard requires.
  *
  * Register with `fs.simstore.impl = graft.sources.SimStoreFileSystem`
  * (plus the `spark.hadoop.` prefix for Spark-side access) and point
  * lakehouse paths at `simstore:/...` URIs.
  */
class SimStoreFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "simstore"
  override def getUri: java.net.URI = java.net.URI.create("simstore:///")

  override def rename(src: Path, dst: Path): Boolean = {
    val s = pathToFile(src)
    val d = pathToFile(dst)
    if (!s.exists()) false
    else if (s.isDirectory) super.rename(src, dst)
    else {
      Option(d.getParentFile).filter(p => !p.exists()).foreach(_.mkdirs())
      java.nio.file.Files.copy(s.toPath, d.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      s.delete()
      true
    }
  }

  override def create(
      f: Path, overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream =
    if (overwrite)
      super.create(f, overwrite, bufferSize, replication, blockSize, progress)
    else conditionalCreate(f)

  override def create(
      f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    if (overwrite)
      super.create(f, permission, overwrite, bufferSize, replication,
        blockSize, progress)
    else conditionalCreate(f)

  /** Buffer to a staging file; publish atomically at close via
    * `link(2)` (complete content or `FileAlreadyExistsException`,
    * nothing in between). The early existence check is a fast-path
    * courtesy only — the close-time link is the authoritative
    * conditional, exactly as a real conditional PUT checks at object
    * completion, not upload start. The stream is [[Abortable]]
    * (matching S3A's conditional-write streams): `abort()` discards
    * the staging bytes WITHOUT linking, so a committer whose write
    * failed mid-stream can release the slot instead of publishing a
    * torn document; a `close()` after `abort()` is a no-op, never a
    * commit, per the Abortable contract.
    */
  private def conditionalCreate(f: Path): FSDataOutputStream = {
    val target = pathToFile(f)
    Option(target.getParentFile).foreach(_.mkdirs())
    if (target.exists())
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(
        s"$f already exists")
    val staging = new java.io.File(target.getParentFile,
      s".simstore_put_${UUID.randomUUID().toString}")
    val out = new java.io.FileOutputStream(staging)
    val wrapped = new java.io.FilterOutputStream(out)
        with org.apache.hadoop.fs.Abortable
        with org.apache.hadoop.fs.StreamCapabilities {
      private var closed = false
      private var aborted = false
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        out.write(b, off, len)
      override def abort(): org.apache.hadoop.fs.Abortable.AbortableResult = {
        val already = closed || aborted
        aborted = true
        var cleanup: java.io.IOException = null
        if (!already) {
          try out.close()
          catch { case e: java.io.IOException => cleanup = e }
          staging.delete()
        }
        val c = cleanup
        new org.apache.hadoop.fs.Abortable.AbortableResult {
          override def alreadyClosed(): Boolean = already
          override def anyCleanupException(): java.io.IOException = c
        }
      }
      override def hasCapability(capability: String): Boolean =
        capability.equalsIgnoreCase(
          org.apache.hadoop.fs.StreamCapabilities.ABORTABLE_STREAM)
      override def close(): Unit = {
        if (closed || aborted) return
        closed = true
        out.close()
        try java.nio.file.Files.createLink(target.toPath, staging.toPath)
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            throw new org.apache.hadoop.fs.FileAlreadyExistsException(
              s"$f already exists (conditional put lost the race at commit)")
        } finally { staging.delete(); () }
      }
    }
    new FSDataOutputStream(wrapped, statistics)
  }
}
