package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** Checkpoint-scoped TABLE-IDENTITY pin, shared by the streaming CDF
  * source and the vtable sink: both carry version (or batch-id) cursors
  * whose numbers restart when a table is dropped and recreated at the
  * same path, so each pins the table's identity UUID under the query's
  * checkpoint at first start and re-checks it per call.
  *
  * Crash-safe by construction: the pin is written to a tmp file and
  * RENAMED into place, so it is never observable partially written — the
  * naked create-then-write shape could crash between the two and leave an
  * EMPTY pin that reads as "no pin", silently disabling the identity
  * check forever. An empty pin found on disk (written by an older build)
  * is treated as absent, deleted, and re-pinned. Racing first-writers
  * pin the same table's id, so whichever rename lands the content is
  * identical.
  */
object TableIdPin {

  /** The pinned id at `pinPath`, or pin `currentId` there first. None
    * only when the table itself has no identity (legacy, pre-props).
    */
  def pinOrRead(fs: FileSystem, pinPath: Path,
                currentId: => Option[String]): Option[String] = {
    def readPin(): Option[String] =
      if (!fs.exists(pinPath)) None
      else {
        val in = fs.open(pinPath)
        val s = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
        val r = Option(s).filter(_.nonEmpty)
        if (r.isEmpty) fs.delete(pinPath, false) // crashed pre-rename-era writer
        r
      }
    readPin().orElse(currentId.map { id =>
      if (pinPath.getParent != null) fs.mkdirs(pinPath.getParent)
      val tmp = new Path(pinPath.getParent,
        s".${pinPath.getName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, true)
      try out.write(id.getBytes("UTF-8")) finally out.close()
      // POSIX rename overwrites (a racer's identical pin — harmless);
      // no-overwrite stores refuse and the racer's pin stands
      if (!fs.rename(tmp, pinPath)) fs.delete(tmp, false)
      readPin().getOrElse(id)
    })
  }

  /** Loud identity check against the pin; `what` names the caller. */
  def requireSame(pinned: Option[String], current: => Option[String],
                  what: String, dir: String, remedy: String): Unit =
    pinned.foreach { p =>
      val cur = current
      if (!cur.contains(p))
        throw new IllegalStateException(
          s"$what: $dir is no longer the table this stream uses — table id " +
            s"${cur.getOrElse("<none>")} vs pinned $p. The table was dropped " +
            s"and recreated; $remedy")
    }
}
