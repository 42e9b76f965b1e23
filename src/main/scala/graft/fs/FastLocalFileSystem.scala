package graft.fs

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import java.nio.file.attribute.PosixFilePermission

/** Local filesystem whose `setPermission` is a java.nio call instead of a
  * forked `chmod` subprocess.
  *
  * Hadoop's `RawLocalFileSystem.setPermission` shells out to `chmod` when
  * the native-hadoop library is absent (it is absent in this environment —
  * "NativeCodeLoader: Unable to load native-hadoop library"). Every file
  * CREATE on the local scheme applies a permission (`ChecksumFileSystem
  * .create` → `RawLocalFileSystem.create(perm,…)` → `setPermission`), so a
  * commit that writes N data files + N checksum sidecars forks 2N
  * processes — measured at ~15-20% of executor-pool samples during a
  * commit-heavy query loop (jstack histogram: `ProcessImpl.forkAndExec` ←
  * `Shell.execCommand` ← `RawLocalFileSystem.setPermission`). The NIO call
  * sets the same POSIX bits in-process.
  *
  * Semantics: identical bit pattern for the regular rwx bits; sticky/
  * setuid/setgid bits (not representable via
  * `Files.setPosixFilePermissions`) and any NIO failure fall back to the
  * stock shell path, so no permission request is ever silently dropped.
  *
  * Wire with `spark.hadoop.fs.file.impl = graft.fs.FastLocalFileSystem`
  * (the class keeps the checksum wrapper — only the permission syscall
  * changes). On a real cluster (HDFS/S3) the `file` scheme only carries
  * scratch traffic, where the same fork tax applies to shuffle/spill-
  * adjacent temp files.
  */
class FastLocalFileSystem extends LocalFileSystem(new FastRawLocalFileSystem)

class FastRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val bits: Int = permission.toShort.toInt & 0xfff
    if ((bits & 0xe00) != 0) { super.setPermission(p, permission); return }
    try {
      val set = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
      import PosixFilePermission._
      if ((bits & 0x100) != 0) set.add(OWNER_READ)
      if ((bits & 0x080) != 0) set.add(OWNER_WRITE)
      if ((bits & 0x040) != 0) set.add(OWNER_EXECUTE)
      if ((bits & 0x020) != 0) set.add(GROUP_READ)
      if ((bits & 0x010) != 0) set.add(GROUP_WRITE)
      if ((bits & 0x008) != 0) set.add(GROUP_EXECUTE)
      if ((bits & 0x004) != 0) set.add(OTHERS_READ)
      if ((bits & 0x002) != 0) set.add(OTHERS_WRITE)
      if ((bits & 0x001) != 0) set.add(OTHERS_EXECUTE)
      java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, set)
    } catch {
      case _: UnsupportedOperationException | _: java.io.IOException =>
        super.setPermission(p, permission)
    }
  }
}
