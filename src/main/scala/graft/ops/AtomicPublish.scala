package graft.ops

/** Cross-process atomic single-writer publication for LOCAL filesystems.
  *
  * POSIX `rename(2)` silently OVERWRITES an existing destination, so the
  * probe-then-rename publish two processes can race is a TOCTOU: both
  * probe "absent", both rename, both believe they won, and one manifest
  * is silently lost. `link(2)` is the standard lock-file answer: creating
  * a HARD LINK to the destination is atomic and FAILS with EEXIST when
  * the destination already exists — a true compare-and-swap on the
  * directory entry, and because the link aliases a fully-written temp
  * file, a reader can never observe a torn destination. (HDFS-style
  * stores don't need this: their rename refuses existing destinations
  * atomically, which is the branch [[VersionedTable]] keeps for them.)
  *
  * Plain-JVM (no Spark, no Hadoop) on purpose: the multi-process race
  * spec drives THIS code from freshly spawned JVMs, so the property
  * proven is the property shipped.
  */
object AtomicPublish {

  /** Atomically publish `tmp` (a fully-written file) at `dest`.
    * Returns true iff THIS call created `dest`; false when a racer
    * already published it. `tmp` is always removed. Falls back to a
    * create-exclusive copy when the filesystem refuses hard links
    * (returns false only on a genuine lost race).
    */
  def publishLocal(tmp: java.nio.file.Path, dest: java.nio.file.Path): Boolean = {
    import java.nio.file.{Files, FileAlreadyExistsException, StandardCopyOption}
    try {
      try {
        Files.createLink(dest, tmp)
        true
      } catch {
        case _: UnsupportedOperationException =>
          // no-hardlink filesystem: create-exclusive claim file, then an
          // atomic same-directory rename onto it is still single-winner
          // because only the claimant reaches the rename
          val claim = dest.resolveSibling(dest.getFileName.toString + ".claim")
          Files.createFile(claim) // throws FileAlreadyExistsException on a lost race
          try {
            Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
            true
          } finally Files.deleteIfExists(claim)
      }
    } catch {
      case _: FileAlreadyExistsException => false
    } finally {
      Files.deleteIfExists(tmp)
    }
  }
}

/** Main for the multi-PROCESS race spec: each spawned JVM loops over
  * versions 1..n in a shared directory, writes a tmp file stamped with
  * its writer id, and tries to publish it as `v<N>.json`. It records the
  * versions it WON to `winner-<id>.txt`. The spec asserts that across
  * all processes every version has exactly one winner and the published
  * file's content matches that winner — the lost-update the in-JVM
  * monitor cannot prevent across processes.
  */
object PublishRacer {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(args(0))
    val id = args(1)
    val n = args(2).toInt
    val won = new StringBuilder
    var v = 1
    while (v <= n) {
      val tmp = dir.resolve(s".v$v.json.tmp-$id")
      java.nio.file.Files.write(tmp, s"""{"version":$v,"writer":"$id"}""".getBytes("UTF-8"))
      if (AtomicPublish.publishLocal(tmp, dir.resolve(s"v$v.json")))
        won.append(v).append('\n')
      v += 1
    }
    java.nio.file.Files.write(dir.resolve(s"winner-$id.txt"),
      won.toString.getBytes("UTF-8"))
  }
}
