package graft.sources

import java.nio.charset.StandardCharsets
import java.util.UUID
import org.apache.hadoop.fs.{FileSystem, Path}

/** The one audited answer to "replace a small mutable pointer file
  * atomically on any Hadoop filesystem" — shared by the table's
  * `version.txt` writer and the change-feed consumer offset so the
  * replace-with-fallback protocol (and its failure handling) cannot
  * drift between them.
  */
private[sources] object AtomicReplace {

  /** Stage `content` in `dir` and move it over `target`.
    *
    * Returns true when `target` now holds `content`. Returns FALSE when
    * a different file survived at `target` through the fallback window —
    * on rename-refusing stores the replace is delete+rename, and a
    * CONCURRENT writer can land its own file in between; only the
    * caller knows whether that is benign (forward-only version
    * pointers: the racer's value wins) or an error (a single-consumer
    * checkpoint: nothing else may write it). Throws IOException when
    * the protocol leaves `target` absent entirely (store fault) and a
    * create-if-absent restore also fails.
    *
    * Local filesystems take a pure-NIO `ATOMIC_MOVE` path instead of
    * the Hadoop protocol: Hadoop's checksummed `LocalFileSystem.rename`
    * can return false AFTER the data file already moved (the crc
    * sidecar rename loses a race under concurrent replacers), which
    * cascades through the delete+rename fallback into the
    * create-if-absent restore and exposes readers to a truncated EMPTY
    * pointer — caught by AtomicReplaceSpec's contention hammer. POSIX
    * rename(2) replaces atomically with no sidecars to race.
    */
  def replace(
      fs: FileSystem, dir: Path, target: Path, content: String): Boolean =
    fs match {
      case _: org.apache.hadoop.fs.LocalFileSystem |
           _: org.apache.hadoop.fs.RawLocalFileSystem =>
        val t = java.nio.file.Paths.get(target.toUri.getPath)
        val tmp = t.resolveSibling(s"_tmp_ptr_${UUID.randomUUID().toString}")
        Option(t.getParent).foreach(p =>
          java.nio.file.Files.createDirectories(p))
        java.nio.file.Files.write(tmp,
          content.getBytes(StandardCharsets.UTF_8))
        try {
          java.nio.file.Files.move(tmp, t,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          // a checksum sidecar from a pre-NIO writer would fail future
          // checksummed reads of the new content — drop it
          scala.util.Try(java.nio.file.Files.deleteIfExists(
            t.resolveSibling("." + t.getFileName.toString + ".crc")))
          true
        } catch {
          case scala.util.control.NonFatal(e) =>
            scala.util.Try(java.nio.file.Files.deleteIfExists(tmp))
            throw new java.io.IOException(s"atomic move to $t failed", e)
        }
      case _ => hadoopReplace(fs, dir, target, content)
    }

  private def hadoopReplace(
      fs: FileSystem, dir: Path, target: Path, content: String): Boolean = {
    val tmp = new Path(dir, s"_tmp_ptr_${UUID.randomUUID().toString}")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // atomic replace where the store allows rename-onto-existing (POSIX)
    if (fs.rename(tmp, target)) return true
    // rename refused: HDFS-like semantics (target exists) or a fault
    if (fs.exists(target)) { fs.delete(target, false); () }
    if (fs.rename(tmp, target)) return true
    scala.util.Try(fs.delete(tmp, false))
    if (fs.exists(target)) return false // a concurrent writer's file survived
    // both renames failed with target ABSENT — the old value is already
    // deleted, so a bare failure would leave no pointer at all. Restore
    // via create-if-absent: winning restores our content; losing means a
    // concurrent writer landed theirs in this window (their call returns
    // false on their side only if OURS survived — exactly one wins).
    try {
      val o = fs.create(target, false)
      try o.write(content.getBytes(StandardCharsets.UTF_8))
      finally o.close()
      true
    } catch {
      case e: java.io.IOException =>
        if (fs.exists(target)) false
        else throw new java.io.IOException(
          s"failed to replace $target and no writer restored it", e)
    }
  }
}
