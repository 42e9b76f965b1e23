package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import com.fasterxml.jackson.databind.ObjectMapper

/** Name → directory catalog for versioned tables, so SQL users write
  * `graft_vtable('orders')` instead of carrying literal paths. One JSON
  * file (default `spark-warehouse/_graft_catalog.json`, relocatable via
  * `spark.graft.catalog.path`), updated by tmp-write + atomic rename,
  * with the read-modify-write serialized in-JVM by a monitor and
  * cross-process by a create-exclusive lock file (see
  * [[withCrossProcessLock]]). The catalog
  * stores LOCATIONS only; everything about a table (schema, stats
  * config, versions) stays self-described in its own `_vlog`, exactly
  * like Iceberg's catalog/metadata split — so a catalog entry can be
  * dropped and re-registered without touching table state, and a table
  * remains addressable by path regardless.
  *
  * Resolution rule ([[resolveDir]]): a reference containing a path
  * separator IS a path; anything else is a catalog name and must
  * resolve. Registering validates the target is (or becomes) a real
  * versioned table only at first read — the catalog is deliberately a
  * dumb map, not a second source of truth.
  */
object GraftCatalog {

  private val mapper = new ObjectMapper()

  private def catalogPath(spark: SparkSession): Path =
    new Path(spark.conf.getOption("spark.graft.catalog.path")
      .getOrElse("spark-warehouse/_graft_catalog.json"))

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All registered (name → dir) entries; empty when no catalog exists. */
  def entries(spark: SparkSession): Map[String, String] = {
    val p = catalogPath(spark)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return Map.empty
    import scala.jdk.CollectionConverters._
    val in = fs.open(p)
    val root = try mapper.readTree(in) finally in.close()
    root.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
  }

  /** In-JVM monitor serializing read-modify-write updates: concurrent
    * register/drop calls in ONE driver cannot lose each other's entries
    * (and keep the common path free of lock-file round-trips' failures).
    */
  private val updateLock = new Object

  /** Cross-PROCESS serialization of the catalog's read-modify-write: a
    * create-exclusive lock file beside the catalog (NIO `createFile` on
    * local filesystems — O_EXCL, atomic; `fs.create(overwrite = false)`
    * on HDFS-style stores, whose create is atomic server-side). Without
    * it, two processes interleaving read→write lose one process's entry
    * silently — the same lost-update the manifests' hard-link CAS closes,
    * but for a MUTABLE file, so exclusion (not CAS) is the right shape.
    * A lock held past `spark.graft.catalog.lockTimeoutMs` (default
    * 10 000 — catalog updates are one small JSON read + write) fails
    * LOUDLY naming the lock file: a crashed writer needs an operator
    * decision, not a heuristic steal that would reintroduce the race.
    */
  private def withCrossProcessLock[T](spark: SparkSession)(body: => T): T = {
    val p = catalogPath(spark)
    val fs = fsOf(spark, p)
    if (p.getParent != null) fs.mkdirs(p.getParent)
    val lock = new Path(p.getParent, s".${p.getName}.lock")
    val local = fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]
    val timeoutMs = spark.conf.getOption("spark.graft.catalog.lockTimeoutMs")
      .map(_.toLong).getOrElse(10000L)
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    def tryAcquire(): Boolean =
      try {
        if (local)
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(lock.toUri.getPath))
        else fs.create(lock, false).close()
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      }
    while (!tryAcquire()) {
      if (System.nanoTime() > deadline)
        throw new IllegalStateException(
          s"GraftCatalog: lock $lock held for >${timeoutMs}ms — a catalog " +
            "writer crashed mid-update? Verify no live writer owns it, " +
            "delete the lock file, and retry")
      Thread.sleep(20)
    }
    try body finally fs.delete(lock, false)
  }

  private def write(spark: SparkSession, all: Map[String, String]): Unit = {
    val p = catalogPath(spark)
    val fs = fsOf(spark, p)
    val root = mapper.createObjectNode()
    all.toSeq.sortBy(_._1).foreach { case (k, v) => root.put(k, v) }
    val bytes = mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root)
    if (p.getParent != null) fs.mkdirs(p.getParent)
    val tmp = new Path(p.getParent,
      s".${p.getName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    // rename-over first (atomic overwrite on POSIX — no window with no
    // catalog); filesystems that refuse to rename over an existing file
    // take a SIDESTEP fallback: the live catalog moves aside (never
    // deleted) so a failure at any point leaves a recoverable copy
    if (!fs.rename(tmp, p)) {
      val aside = new Path(p.getParent,
        s".${p.getName}.old-${java.util.UUID.randomUUID().toString.take(8)}")
      if (fs.exists(p) && !fs.rename(p, aside))
        throw new IllegalStateException(
          s"GraftCatalog: cannot sidestep the live catalog at $p — retry")
      if (!fs.rename(tmp, p)) {
        fs.rename(aside, p) // restore the previous catalog; nothing lost
        fs.delete(tmp, false)
        throw new IllegalStateException(
          s"GraftCatalog: lost the catalog publish race at $p — retry")
      }
      fs.delete(aside, false)
    }
  }

  /** Register (or re-point) `name` at `dir`. Names must not look like
    * paths — that would shadow the path addressing mode.
    */
  def register(spark: SparkSession, name: String, dir: String): Unit = {
    require(name.nonEmpty && !name.contains('/') && !name.contains('\\'),
      s"GraftCatalog.register: '$name' is not a valid table name " +
        "(no path separators; use the directory directly for path addressing)")
    updateLock.synchronized {
      withCrossProcessLock(spark) {
        write(spark, entries(spark) + (name -> dir))
      }
    }
  }

  def drop(spark: SparkSession, name: String): Unit =
    updateLock.synchronized {
      withCrossProcessLock(spark) {
        write(spark, entries(spark) - name)
      }
    }

  def lookup(spark: SparkSession, name: String): Option[String] =
    entries(spark).get(name)

  /** Default data directory for a SQL-created table: a `graft/<name>`
    * sibling of the catalog file, so relocating the catalog
    * (`spark.graft.catalog.path`) relocates managed table data with it.
    */
  def defaultTableDir(spark: SparkSession, name: String): String = {
    val p = catalogPath(spark)
    new Path(Option(p.getParent).getOrElse(new Path(".")),
      s"graft/$name").toString
  }

  /** Name-or-path resolution used by every vtable addressing surface. */
  def resolveDir(spark: SparkSession, ref: String): String =
    if (ref.contains('/') || ref.contains('\\')) ref
    else lookup(spark, ref).getOrElse(throw new IllegalArgumentException(
      s"GraftCatalog: no versioned table named '$ref' — register it with " +
        s"graft_register_vtable('$ref', '<dir>') or address it by path"))
}
