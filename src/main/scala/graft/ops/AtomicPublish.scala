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
    * claim-file protocol ([[publishViaClaim]]) when the filesystem
    * refuses hard links.
    */
  def publishLocal(tmp: java.nio.file.Path, dest: java.nio.file.Path): Boolean = {
    import java.nio.file.{Files, FileAlreadyExistsException}
    try {
      try {
        Files.createLink(dest, tmp)
        true
      } catch {
        case _: UnsupportedOperationException => publishViaClaim(tmp, dest)
      }
    } catch {
      case _: FileAlreadyExistsException => false
    } finally {
      Files.deleteIfExists(tmp)
    }
  }

  /** No-hardlink fallback: a create-exclusive claim file serializes
    * publishers, and the publish itself is a CREATE-EXCLUSIVE write of
    * `tmp`'s bytes at `dest` (`CREATE_NEW` — atomic refuse-if-exists at
    * the syscall), NOT a rename: POSIX rename overwrites, so a claimant
    * PAUSED after its dest re-probe whose "stale" claim an operator
    * deleted would, on resume, silently clobber the publisher that won
    * in the meantime — with `CREATE_NEW` its late write fails with
    * EEXIST and it reports the lost race. The claim is thereby a pure
    * throughput serializer (it keeps racers from burning EEXIST
    * retries), never the safety mechanism. The cost of abandoning
    * rename: `dest` is visible before its bytes land, so a reader
    * racing THIS fallback path (no-hardlink filesystems only — the
    * primary `createLink` path stays fully atomic) can observe a
    * short-lived torn manifest; that fails a JSON parse LOUDLY and a
    * retry reads the complete file — strictly better than the silent
    * double-publish it replaces.
    *
    * Liveness: a process that crashes between `createFile(claim)` and the
    * `finally` leaves a stale claim that blocks the version forever. A
    * live claimant holds the claim only for the duration of one
    * same-directory write, so a later publisher that finds the claim held
    * polls up to `stalePollMs`: if `dest` appears the race was genuinely
    * lost (false); if the claim disappears it retries the acquisition;
    * if after the window the claim is still held with `dest` absent it
    * THROWS naming the stale claim — loud and actionable: deleting the
    * dead claim and retrying is SAFE, because even a paused (not dead)
    * claimant can no longer overwrite whatever the retry publishes.
    *
    * `beforePublish` is a spec-only hook between the dest re-probe and
    * the exclusive write — the paused-claimant interleaving is driven
    * through it, so the property proven is the property shipped.
    */
  private[graft] def publishViaClaim(tmp: java.nio.file.Path,
                                   dest: java.nio.file.Path,
                                   stalePollMs: Long = 5000L,
                                   beforePublish: () => Unit = () => ()): Boolean = {
    import java.nio.file.{Files, FileAlreadyExistsException, StandardOpenOption}
    val claim = dest.resolveSibling(dest.getFileName.toString + ".claim")
    val deadline = System.nanoTime() + stalePollMs * 1000000L
    while (true) {
      try {
        Files.createFile(claim) // throws FileAlreadyExistsException when held
        try {
          if (Files.exists(dest)) return false // lost: winner published before we claimed
          beforePublish()
          try {
            Files.write(dest, Files.readAllBytes(tmp),
              StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
            return true
          } catch {
            case _: FileAlreadyExistsException =>
              return false // a racer landed between the probe and the write
          }
        } finally Files.deleteIfExists(claim)
      } catch {
        case _: FileAlreadyExistsException =>
          if (Files.exists(dest)) return false // lost: winner already published
          if (System.nanoTime() > deadline)
            throw new IllegalStateException(
              s"AtomicPublish: claim $claim is held but $dest was never " +
                s"published within ${stalePollMs}ms — a publisher crashed " +
                "mid-claim. Verify no live writer owns it, delete the " +
                "claim file, and retry the commit")
          Thread.sleep(10) // live claimant: one file move away from resolution
      }
    }
    false // unreachable
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
