package graft.ops

/** Pluggable commit-publication primitive for [[VersionedTable]]: atomic
  * CREATE-IF-ABSENT of a complete manifest object. The whole optimistic-
  * concurrency protocol rests on this one primitive — "exactly one writer
  * creates version N" — and different storage systems offer it through
  * different syscalls:
  *
  *  - POSIX local filesystems: `link(2)` hard-link CAS ([[CommitStore
  *    .HardLink]] — the [[AtomicPublish]] protocol, with its claim-file
  *    fallback for no-hardlink filesystems).
  *  - HDFS-style stores: `rename` that atomically REFUSES an existing
  *    destination ([[RenameStore]]).
  *  - S3-class object stores: a conditional PUT — create-if-absent as a
  *    server-side precondition on the write itself (S3 `If-None-Match: *`,
  *    GCS `x-goog-if-generation-match: 0`, Azure `If-None-Match: *`) —
  *    [[CommitStore.ConditionalPut]]. No tmp object, no claim file: the
  *    precondition rides the put, so the claim-fallback protocol is
  *    RETIRED on stores that support it. The implementation shipped here
  *    realizes the precondition on a local filesystem via
  *    `O_CREAT|O_EXCL` (`CREATE_NEW` — the same refuse-if-exists decided
  *    atomically at the call) so the multi-process stress drives the
  *    exact protocol; a real object-store backend implements this same
  *    one-method trait with its SDK call and inherits every caller.
  *
  * Plain-JVM on purpose (no Spark, no Hadoop imports in the trait or the
  * local backends): the multi-process race spec spawns bare JVMs over
  * these classes, so the property proven is the property shipped.
  */
trait CommitStore {
  /** Atomically create `dest` holding exactly `bytes` iff absent.
    * Returns true iff THIS call created it; false when it already
    * exists (a racer won). Implementations must guarantee at most one
    * true return per destination across processes. Readers of a real
    * object store never observe a torn object; the local CREATE_NEW
    * realization has a visible-before-complete window one small write
    * wide, which [[VersionedTable.readMeta]]'s bounded re-read absorbs
    * (same contract as the claim fallback it replaces).
    */
  def putIfAbsent(dest: java.nio.file.Path, bytes: Array[Byte]): Boolean

  /** Backend name for logs and specs. */
  def name: String
}

object CommitStore {

  /** Current local protocol, unchanged: write a sibling tmp, hard-link
    * CAS it into place ([[AtomicPublish.publishLocal]], claim fallback
    * on filesystems without `link(2)`).
    */
  object HardLink extends CommitStore {
    override def name: String = "hardlink"
    override def putIfAbsent(dest: java.nio.file.Path,
                             bytes: Array[Byte]): Boolean = {
      import java.nio.file.Files
      if (Files.exists(dest)) return false // cheap fast-fail, not safety
      val tmp = dest.resolveSibling(
        s".${dest.getFileName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      Files.write(tmp, bytes)
      AtomicPublish.publishLocal(tmp, dest)
    }
  }

  /** Conditional-put: create-if-absent IS the write. One call, no tmp,
    * no claim protocol — the shape an S3-class backend implements with
    * `PUT + If-None-Match: *`.
    */
  object ConditionalPut extends CommitStore {
    override def name: String = "condput"
    override def putIfAbsent(dest: java.nio.file.Path,
                             bytes: Array[Byte]): Boolean = {
      import java.nio.file.{Files, FileAlreadyExistsException, StandardOpenOption}
      try {
        val ch = Files.newByteChannel(dest,
          StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
        try {
          val buf = java.nio.ByteBuffer.wrap(bytes)
          while (buf.hasRemaining) ch.write(buf)
        } finally ch.close()
        true
      } catch {
        case _: FileAlreadyExistsException => false
      }
    }
  }

  /** Spec-only wrapper: runs `beforePut` between the caller's decision
    * and the store's atomic primitive, so race specs can pin exact
    * interleavings (a paused writer, an operator intervention) instead
    * of hoping the scheduler produces them.
    */
  final class Injectable(inner: CommitStore, beforePut: () => Unit)
      extends CommitStore {
    override def name: String = s"injectable(${inner.name})"
    override def putIfAbsent(dest: java.nio.file.Path,
                             bytes: Array[Byte]): Boolean = {
      beforePut()
      inner.putIfAbsent(dest, bytes)
    }
  }

  /** The transient failure class a real object store throws: 503
    * SlowDown, throttling, connection reset. Retryable by contract —
    * [[graft.ops.VersionedTable]]'s publish path retries these with
    * bounded backoff; anything else propagates.
    */
  final class RetryableStoreException(msg: String)
      extends RuntimeException(msg)

  /** Fault-injection wrapper (spec-only): a deterministic schedule of
    * retryable failures around the inner put. `failBefore(n)` on the
    * n-th call (0-based) throws BEFORE delegating — the put never
    * happened; `failAfter(n)` delegates FIRST and then throws — the
    * write landed but the response was lost, the ambiguous outcome an
    * object-store client must disambiguate on retry (S3's "503 after
    * the PUT committed"). Call count is observable for convergence
    * assertions.
    */
  final class Flaky(inner: CommitStore,
                    failBefore: Long => Boolean = _ => false,
                    failAfter: Long => Boolean = _ => false)
      extends CommitStore {
    val calls = new java.util.concurrent.atomic.AtomicLong()
    override def name: String = s"flaky(${inner.name})"
    override def putIfAbsent(dest: java.nio.file.Path,
                             bytes: Array[Byte]): Boolean = {
      val n = calls.getAndIncrement()
      if (failBefore(n))
        throw new RetryableStoreException(
          s"injected 503 before put (call $n)")
      val won = inner.putIfAbsent(dest, bytes)
      if (failAfter(n))
        throw new RetryableStoreException(
          s"injected lost response after put (call $n, won=$won)")
      won
    }
  }
}

/** HDFS-style backend: write a sibling tmp through the (raw) filesystem,
  * then a no-overwrite rename. The probe is load-bearing on stores whose
  * rename moves INTO an existing destination instead of refusing. A
  * separate class (not an object inside [[CommitStore]]) so the bare-JVM
  * race mains never trigger Hadoop class loading.
  */
final class RenameStore(fs: org.apache.hadoop.fs.FileSystem)
    extends CommitStore {
  override def name: String = "rename"
  override def putIfAbsent(dest: java.nio.file.Path,
                           bytes: Array[Byte]): Boolean =
    putIfAbsentHadoop(new org.apache.hadoop.fs.Path(dest.toString), bytes)

  /** Hadoop-path entry ([[VersionedTable]] calls this directly — its
    * destinations may be scheme-qualified, which `java.nio` cannot name).
    */
  def putIfAbsentHadoop(dest: org.apache.hadoop.fs.Path,
                        bytes: Array[Byte]): Boolean = {
    if (fs.exists(dest)) return false
    val tmp = new org.apache.hadoop.fs.Path(dest.getParent,
      s".${dest.getName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    // raw write: local publish paths bypass ChecksumFileSystem, so the
    // tmp must too or every commit orphans a .crc sidecar (see
    // VersionedTable.writeManifest)
    val writeFs = fs match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }
    val out = writeFs.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (fs.rename(tmp, dest)) true
    else { fs.delete(tmp, false); false }
  }
}

/** Main for the multi-PROCESS race spec over a chosen backend — the
  * [[PublishRacer]] protocol (loop versions 1..n, record wins) with the
  * store pluggable, so the 4-process × 200-version stress proves the
  * conditional-put backend with the same assertions as the hard-link one.
  */
object CommitStoreRacer {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(args(0))
    val id = args(1)
    val n = args(2).toInt
    val store: CommitStore = args(3) match {
      case "condput" => CommitStore.ConditionalPut
      case "hardlink" => CommitStore.HardLink
      case other => throw new IllegalArgumentException(s"unknown store: $other")
    }
    val won = new StringBuilder
    var v = 1
    while (v <= n) {
      val bytes = s"""{"version":$v,"writer":"$id"}""".getBytes("UTF-8")
      if (store.putIfAbsent(dir.resolve(s"v$v.json"), bytes))
        won.append(v).append('\n')
      v += 1
    }
    java.nio.file.Files.write(dir.resolve(s"winner-$id.txt"),
      won.toString.getBytes("UTF-8"))
  }
}
