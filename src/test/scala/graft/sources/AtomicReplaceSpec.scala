package graft.sources

import graft.TestSpark
import java.nio.file.{Files, Paths}
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

class AtomicReplaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fs(p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  test("creates, replaces, and leaves no staging residue") {
    val dir = new Path(Files.createTempDirectory("azof-ptr").toString)
    val target = new Path(dir, "pointer")
    val f = fs(dir)

    assert(AtomicReplace.replace(f, dir, target, "1"))
    assert(Files.readString(Paths.get(target.toUri.getPath)) == "1")

    // replace over an existing value
    assert(AtomicReplace.replace(f, dir, target, "2"))
    assert(Files.readString(Paths.get(target.toUri.getPath)) == "2")

    // no _tmp_ptr_ staging files linger on either path
    val stray = Files.list(Paths.get(dir.toUri.getPath)).toArray
      .map(_.toString).filter(_.contains("_tmp_ptr_"))
    assert(stray.isEmpty, s"staging residue: ${stray.mkString(",")}")
  }

  test("concurrent replaces never tear the value") {
    // hammer one pointer from 8 threads; every intermediate read must be
    // a complete value some writer wrote — never empty, never partial
    val dir = new Path(Files.createTempDirectory("azof-ptr2").toString)
    val target = new Path(dir, "pointer")
    val f = fs(dir)
    AtomicReplace.replace(f, dir, target, "init")
    val valid = (1 to 8).map(i => s"writer-$i-value").toSet + "init"
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get()) {
        // a briefly-ABSENT pointer is the documented delete+rename
        // fallback window (readers retry in production, see
        // AzofTable.currentVersion); what must NEVER appear is a
        // PRESENT file with empty or partial content
        try {
          val s = Files.readString(Paths.get(target.toUri.getPath))
          if (!valid.contains(s)) { bad.add(s); () }
        } catch { case _: java.io.IOException => () }
      }
    })
    reader.start()
    val writers = (1 to 8).map { i =>
      new Thread(() => (1 to 20).foreach { _ =>
        AtomicReplace.replace(f, dir, target, s"writer-$i-value"); ()
      })
    }
    writers.foreach(_.start())
    writers.foreach(_.join(60000))
    stop.set(true)
    reader.join(10000)
    assert(bad.isEmpty, s"torn reads: ${bad.toArray.mkString(",")}")
    assert(valid.contains(
      Files.readString(Paths.get(target.toUri.getPath))))
  }
}
