package graft.sources

import java.util.concurrent.ConcurrentHashMap
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Pluggable atomic-publish hook for snapshot documents — the seam that
  * closes [[AzofWriter.writeSnapshot]]'s check-then-act window on stores
  * whose rename is not create-if-absent-atomic.
  *
  * The default [[CommitGuard.Rename]] keeps the existing behavior:
  * exists-check + rename, exactly as strong as the store's rename
  * semantics (HDFS refuses a rename onto an existing file atomically;
  * Hadoop's local filesystem and plain S3A check-then-act). An S3-class
  * deployment registers a guard backed by its store's conditional
  * primitive — S3 `If-None-Match` PUT, a DynamoDB-style LogStore, GCS
  * `ifGenerationMatch: 0` — under
  * `spark.azof.commitGuard.<scheme> = <fully.qualified.ClassName>`;
  * every azof commit on paths of that scheme then publishes through it.
  *
  * IMPLEMENTATION CONTRACT: guards must have a zero-arg constructor and
  * be STATELESS and cheap to construct. Instances are cached per
  * (classloader, class) only as a weak best-effort — any GC may evict
  * one, and the next commit re-instantiates it — so a guard must not
  * carry state it cannot afford to lose (an open connection pool, a
  * rate limiter's counters, accumulated metrics). Keep per-deployment
  * resources in statics or an external registry the constructor merely
  * looks up.
  * [[ConditionalPutGuard]] is the shipped conditional-put
  * implementation; [[SimStoreFileSystem]] the simulated store to run it
  * against.
  */
trait CommitGuard {

  /** Publish the fully-staged document at `tmp` as `target` iff `target`
    * does not exist. Returns true when this writer won (target now holds
    * the staged bytes), false when the target already exists — a lost
    * commit race, which [[AzofWriter]] turns into a re-read-and-retry.
    * Any other failure (store fault) must THROW, never return false:
    * a false return tells the committer a competing snapshot exists at
    * this id, and it will silently retry at the next one.
    *
    * ATOMICITY REQUIREMENT: `target` must appear with its COMPLETE
    * content in one operation (rename, hard link, conditional PUT with
    * body) — claim-then-write publication (create an empty marker, copy
    * bytes after) is FORBIDDEN. The whole classification machinery
    * ([[graft.format.SnapshotCodec.classify]]) rests on the invariant
    * that a malformed `s{N}.json` was never committed: a guard that
    * exposes an empty/partial target between claim and content would
    * let a concurrent committer classify the winner's in-flight
    * snapshot as crash debris and fork its commit out of the chain, and
    * let a zero-retention vacuum delete it. Every real conditional
    * primitive (S3 `If-None-Match` PUT, GCS `ifGenerationMatch: 0`)
    * already carries the body with the claim.
    *
    * `tmp` cleanup on the false/throw paths is the caller's job; on the
    * true path the implementation consumes `tmp` (rename) or may leave
    * it for the caller to delete.
    */
  def publish(fs: FileSystem, tmp: Path, target: Path): Boolean
}

object CommitGuard {

  /** Default guard: exists-check + rename. A false rename re-checks the
    * target so a store fault surfaces as an IOException instead of a
    * phantom lost race (some Hadoop FS implementations return false on
    * transient failure).
    */
  object Rename extends CommitGuard {
    override def publish(fs: FileSystem, tmp: Path, target: Path): Boolean =
      if (fs.exists(target)) false
      else if (fs.rename(tmp, target)) true
      else if (fs.exists(target)) false
      else throw new java.io.IOException(
        s"rename $tmp -> $target returned false with no existing target (store fault, not a commit race)")
  }

  /** Atomic guard for LOCAL filesystems: publish by HARD-LINKING the
    * staged file to the target — one `link(2)` syscall that fails with
    * `FileAlreadyExistsException` when the target exists, so two
    * same-instant committers can never both pass (the window the
    * check-then-act [[Rename]] leaves open on local disk; observed as a
    * lost commit under 5-way racing DML). The link carries the COMPLETE
    * staged content, satisfying the atomicity requirement. Paths the
    * local scheme can't map to a real file (or stores without hard
    * links) fall back to [[Rename]].
    */
  object LocalLink extends CommitGuard {
    override def publish(fs: FileSystem, tmp: Path, target: Path): Boolean = {
      val tgt = Option(target.toUri.getPath)
      val src = Option(tmp.toUri.getPath)
      if (tgt.isEmpty || src.isEmpty) Rename.publish(fs, tmp, target)
      else
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(tgt.get), java.nio.file.Paths.get(src.get))
          // tmp (and its checksum sidecar) via the Hadoop FS so nothing
          // lingers; the published link is independent of it
          scala.util.Try(fs.delete(tmp, false))
          true
        } catch {
          // target exists = lost race, NEVER a fallback case: falling
          // back here would re-attempt publication over a committed
          // snapshot
          case _: java.nio.file.FileAlreadyExistsException => false
          // no-hard-link stores surface as UnsupportedOperationException
          // on some JDK/FS combinations but as a plain FileSystemException
          // (an IOException) on others — FAT/exFAT, some FUSE mounts —
          // and this guard is the default for every file:// path, so any
          // other link failure degrades to the rename guard rather than
          // failing the commit on a store limitation
          case _: UnsupportedOperationException =>
            Rename.publish(fs, tmp, target)
          case _: java.io.IOException =>
            Rename.publish(fs, tmp, target)
        }
    }
  }

  // keyed by (resolving classloader, class name), NOT class name alone:
  // in a long-lived multi-session server a later session can ship a
  // DIFFERENT version of the guard class through its own classloader,
  // and a name-only cache would silently reuse the first loader's
  // instance for every subsequent session. Both the loader key AND the
  // cached instance are held weakly — a guard instance strongly refs
  // its Class, which refs its defining loader, so a strong value would
  // pin the (weak) key forever and leak every session classloader in
  // exactly the long-lived server scenario the cache exists for.
  // Guards are stateless zero-arg singletons, so an occasionally
  // collected instance just re-instantiates on the next commit; a
  // racing double-instantiation is equally harmless (last put wins).
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[ClassLoader,
      ConcurrentHashMap[String, java.lang.ref.WeakReference[CommitGuard]]]())

  /** Resolve the guard for `target`'s URI scheme:
    * `spark.azof.commitGuard.<scheme>` names a [[CommitGuard]] class, or
    * [[Rename]] when unset. Scheme-less paths resolve as `file`.
    */
  def forPath(spark: SparkSession, target: Path): CommitGuard = {
    val scheme = Option(target.toUri.getScheme).getOrElse("file")
    spark.conf.getOption(s"spark.azof.commitGuard.$scheme") match {
      // local disk defaults to the atomic hard-link guard — the rename
      // default is exactly as strong as the store's rename, and local
      // rename is check-then-act
      case None if scheme == "file" => LocalLink
      case None => Rename
      case Some(cls) =>
        // context classloader first: guards typically ship in user
        // jars (--jars), visible to Spark's session classloader but
        // not to this class's defining loader
        val loader = Option(Thread.currentThread().getContextClassLoader)
          .getOrElse(getClass.getClassLoader)
        val byName = cache.computeIfAbsent(loader,
          _ => new ConcurrentHashMap[String,
            java.lang.ref.WeakReference[CommitGuard]]())
        Option(byName.get(cls)).flatMap(r => Option(r.get())).getOrElse {
          val g = Class.forName(cls, true, loader).getDeclaredConstructor()
            .newInstance().asInstanceOf[CommitGuard]
          byName.put(cls, new java.lang.ref.WeakReference(g))
          g
        }
    }
  }
}
