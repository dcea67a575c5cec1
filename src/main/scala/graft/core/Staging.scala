package graft.core

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Per-JVM temp staging. `File.deleteOnExit` only removes EMPTY
  * directories, so round-trip fixtures (CSV/JSONL/Derby copies) written
  * under java.io.tmpdir would leak one full copy per Verify/bench run.
  * Everything goes under ONE root that a shutdown hook deletes
  * recursively.
  */
object Staging {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_staging")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh temp directory (as a path string) removed on JVM exit. */
  def tmpDir(name: String): String =
    Files.createTempDirectory(root, s"graft_$name").toString

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { Files.deleteIfExists(f); () })
      finally walk.close()
    }
}
