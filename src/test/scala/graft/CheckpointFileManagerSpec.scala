package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.checkpointing.GraftLocalCheckpointFileManager
import org.scalatest.funsuite.AnyFunSuite

/** Atomic-visibility contract of the local checkpoint file manager that
  * GraftSession installs for `file:` checkpoint dirs: publish is
  * all-or-nothing, no-overwrite createAtomic FAILS on an existing
  * target (the metadata log's concurrent-writer detection), cancel
  * leaves nothing behind, and no CRC sidecars are minted.
  */
class CheckpointFileManagerSpec extends AnyFunSuite {

  private def freshManager(): (GraftLocalCheckpointFileManager, java.nio.file.Path) = {
    val dir = Files.createTempDirectory("graft_cfm")
    (new GraftLocalCheckpointFileManager(
      new Path(dir.toUri.toString), new Configuration()), dir)
  }

  private def writeVia(fm: GraftLocalCheckpointFileManager, p: Path,
      content: String, overwrite: Boolean): Unit = {
    val out = fm.createAtomic(p, overwrite)
    out.write(content.getBytes(StandardCharsets.UTF_8))
    out.close()
  }

  test("createAtomic publishes whole files and leaves no temp or crc residue") {
    val (fm, dir) = freshManager()
    val target = new Path(s"$dir/offsets/0")
    writeVia(fm, target, "batch-0", overwrite = false)
    assert(Files.readString(Paths.get(s"$dir/offsets/0")) == "batch-0")
    val residue = Files.list(Paths.get(s"$dir/offsets")).toArray.map(_.toString)
    assert(residue.length == 1, s"expected only the published file, got ${residue.toSeq}")
    // readable back through the manager's own open()
    val in = fm.open(target)
    try {
      val buf = new Array[Byte](16)
      val n = in.read(buf)
      assert(new String(buf, 0, n, StandardCharsets.UTF_8) == "batch-0")
    } finally in.close()
  }

  test("no-overwrite createAtomic fails on an existing target, keeping the original") {
    val (fm, dir) = freshManager()
    val target = new Path(s"$dir/commits/7")
    writeVia(fm, target, "first", overwrite = false)
    val err = intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
      writeVia(fm, target, "second", overwrite = false)
    }
    assert(err.getMessage.contains("already exists"))
    assert(Files.readString(Paths.get(s"$dir/commits/7")) == "first")
    // overwrite mode replaces it
    writeVia(fm, target, "third", overwrite = true)
    assert(Files.readString(Paths.get(s"$dir/commits/7")) == "third")
    // and no temp residue from the failed or successful publishes
    assert(Files.list(Paths.get(s"$dir/commits")).toArray.length == 1)
  }

  test("cancel discards the in-flight file") {
    val (fm, dir) = freshManager()
    val out = fm.createAtomic(new Path(s"$dir/state/1.delta"), true)
    out.write("partial".getBytes(StandardCharsets.UTF_8))
    out.cancel()
    assert(Files.list(Paths.get(s"$dir/state")).toArray.isEmpty)
    // cancel-after-close and close-after-cancel are both no-ops
    out.cancel()
    out.close()
  }

  test("list/exists/delete/mkdirs cover the metadata-log surface") {
    val (fm, dir) = freshManager()
    fm.mkdirs(new Path(s"$dir/offsets"))
    assert(fm.exists(new Path(s"$dir/offsets")))
    writeVia(fm, new Path(s"$dir/offsets/0"), "a", overwrite = false)
    writeVia(fm, new Path(s"$dir/offsets/1"), "b", overwrite = false)
    val names = fm.list(new Path(s"$dir/offsets")).map(_.getPath.getName).sorted
    assert(names.toSeq == Seq("0", "1"))
    fm.delete(new Path(s"$dir/offsets/0"))
    assert(!fm.exists(new Path(s"$dir/offsets/0")))
    fm.delete(new Path(s"$dir/offsets/0")) // deleting a missing path is a no-op
    assert(fm.isLocal)
  }
}
