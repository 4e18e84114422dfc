package org.apache.spark.sql.execution.streaming.checkpointing

import java.io.BufferedOutputStream
import java.net.URI
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileStatus, FSDataInputStream, Path, PathFilter, RawLocalFileSystem}

import CheckpointFileManager.CancellableFSDataOutputStream

/** Structured Streaming checkpoint file manager specialized for LOCAL
  * (`file:`) checkpoint directories, installed via the documented conf
  * `spark.sql.streaming.checkpointFileManagerClass`.
  *
  * Spark's default manager routes every offsets/commits/state file
  * through Hadoop's `FileContext` over the checksummed local
  * filesystem: each tiny checkpoint file costs a FileContext
  * resolution, a client-side CRC sidecar write, a temp file and a
  * rename — per micro-batch, per state partition. On a POSIX
  * filesystem `rename(2)` is already atomic, so this manager keeps the
  * exact write-visibility contract (no reader ever observes a partial
  * file; `createAtomic(overwrite = false)` fails with
  * `FileAlreadyExistsException` when the target exists, which is what
  * the metadata log's concurrent-writer detection relies on) while
  * writing through `java.nio` directly:
  *
  *  - atomic publish = write to a dot-temp sibling + `ATOMIC_MOVE`
  *    (overwrite) or `createLink` + delete (no-overwrite — a hard link
  *    creation is atomic and FAILS if the target exists, unlike POSIX
  *    rename which silently replaces);
  *  - reads/lists go through [[RawLocalFileSystem]] — the same local
  *    FS minus the `.crc` sidecar layer, so files written by the
  *    default manager in a pre-existing checkpoint remain readable;
  *  - no CRC sidecars: the files live exactly as long as one streaming
  *    query run and are re-derivable from the source, and production
  *    checkpoint dirs on HDFS/S3 never see this class (below).
  *
  * A NON-local checkpoint path (any scheme other than `file`)
  * delegates every call to Spark's default
  * [[FileContextBasedCheckpointFileManager]], so installing this class
  * session-wide is always correct: cluster deployments whose
  * checkpoints live on HDFS/S3/ABFS keep stock behavior, rename-less
  * object stores included.
  */
class GraftLocalCheckpointFileManager(path: Path, hadoopConf: Configuration)
    extends CheckpointFileManager {

  private val isFileScheme =
    Option(path.toUri.getScheme).forall(_ == "file")

  /** Stock manager for non-`file:` schemes — constructed lazily so a
    * purely local session never touches FileContext at all.
    */
  private lazy val delegate: CheckpointFileManager =
    new FileContextBasedCheckpointFileManager(path, hadoopConf)

  /** Raw local FS (no checksum layer) for open/list/delete — one
    * private instance per manager, not the shared Hadoop cache entry,
    * so closing or reconfiguring it can never affect other users.
    */
  private lazy val raw: RawLocalFileSystem = {
    val fs = new RawLocalFileSystem()
    fs.initialize(URI.create("file:///"), hadoopConf)
    fs
  }

  private def nio(p: Path): java.nio.file.Path = Paths.get(p.toUri.getPath)

  override def createAtomic(p: Path,
      overwriteIfPossible: Boolean): CancellableFSDataOutputStream = {
    if (!isFileScheme) return delegate.createAtomic(p, overwriteIfPossible)
    val dest = nio(p)
    if (dest.getParent != null) Files.createDirectories(dest.getParent)
    val tmp = dest.resolveSibling(
      s".${dest.getFileName}.${java.util.UUID.randomUUID()}.tmp")
    val underlying = new BufferedOutputStream(Files.newOutputStream(tmp))
    new CancellableFSDataOutputStream(underlying) {
      private var terminated = false
      override def cancel(): Unit = synchronized {
        if (!terminated) {
          terminated = true
          try underlying.close()
          finally { Files.deleteIfExists(tmp); () }
        }
      }
      override def close(): Unit = synchronized {
        if (!terminated) {
          terminated = true
          underlying.close()
          if (overwriteIfPossible) {
            // POSIX rename: atomic, silently replaces the target
            Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
          } else {
            // atomic fail-if-exists publish: hard-link creation is the
            // POSIX primitive that both creates atomically AND fails on
            // an existing target (rename would silently replace it)
            try {
              Files.createLink(dest, tmp)
              Files.deleteIfExists(tmp)
            } catch {
              case _: java.nio.file.FileAlreadyExistsException =>
                Files.deleteIfExists(tmp)
                throw new FileAlreadyExistsException(
                  s"Failed to rename $tmp to $dest as destination already exists")
            }
            ()
          }
        }
      }
    }
  }

  override def open(p: Path): FSDataInputStream =
    if (isFileScheme) raw.open(p) else delegate.open(p)

  override def list(p: Path, filter: PathFilter): Array[FileStatus] =
    if (isFileScheme) raw.listStatus(p, filter) else delegate.list(p, filter)

  override def mkdirs(p: Path): Unit =
    if (isFileScheme) { Files.createDirectories(nio(p)); () }
    else delegate.mkdirs(p)

  override def exists(p: Path): Boolean =
    if (isFileScheme) Files.exists(nio(p)) else delegate.exists(p)

  override def delete(p: Path): Unit =
    if (isFileScheme) {
      try { raw.delete(p, true); () }
      catch { case _: java.io.FileNotFoundException => () }
    } else delegate.delete(p)

  override def isLocal: Boolean = isFileScheme || delegate.isLocal

  override def createCheckpointDirectory(): Path =
    if (isFileScheme) { Files.createDirectories(nio(path)); path }
    else delegate.createCheckpointDirectory()
}
