package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Shared filesystem helpers — ONE copy of the recursive-delete idiom
  * (previously duplicated across the storage scratch dirs, the RTB
  * oracle fixture, and the ingest-oracle staging), with the
  * `Files.walk` stream properly closed (the inline copies leaked it).
  */
object FsUtil {

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }
}
