package graft

import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission
import java.nio.file.attribute.PosixFilePermission._

/** [[graft.fs.FastLocalFileSystem]]: the NIO setPermission must land the
  * same POSIX bits the stock shell path would, and unrepresentable bits
  * (sticky/setuid/setgid) must still take effect via the fallback.
  */
class FastLocalFileSystemSpec extends SparkSuite {

  private def freshFs() = {
    val fs = new graft.fs.FastRawLocalFileSystem
    fs.initialize(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
    fs
  }

  test("setPermission lands exact POSIX bits without a fork") {
    val fs = freshFs()
    val dir = java.nio.file.Files.createTempDirectory("fastfs").toFile
    val f = new java.io.File(dir, "x.bin")
    f.createNewFile()
    val p = new Path(f.getAbsolutePath)
    for (bits <- Seq(Integer.parseInt("600", 8), Integer.parseInt("644", 8),
        Integer.parseInt("755", 8), Integer.parseInt("421", 8))) {
      fs.setPermission(p, new FsPermission(bits.toShort))
      val got = java.nio.file.Files.getPosixFilePermissions(f.toPath)
      val want = java.util.EnumSet.noneOf(classOf[java.nio.file.attribute.PosixFilePermission])
      val flags = Seq(0x100 -> OWNER_READ, 0x80 -> OWNER_WRITE,
        0x40 -> OWNER_EXECUTE, 0x20 -> GROUP_READ, 0x10 -> GROUP_WRITE,
        0x8 -> GROUP_EXECUTE, 0x4 -> OTHERS_READ, 0x2 -> OTHERS_WRITE,
        0x1 -> OTHERS_EXECUTE)
      flags.foreach { case (m, e) => if ((bits & m) != 0) want.add(e) }
      assert(got == want, f"bits=${bits}%o")
    }
    // sticky bit is not representable via NIO — the shell fallback must
    // still apply it (01644 → rw-r--r-T)
    fs.setPermission(p, new FsPermission(Integer.parseInt("1644", 8).toShort))
    assert(fs.getFileStatus(p).getPermission.toShort ==
      Integer.parseInt("1644", 8).toShort)
    fs.setPermission(p, new FsPermission(Integer.parseInt("644", 8).toShort))
    f.delete(); dir.delete()
  }

  test("wrapped LocalFileSystem round-trips a write with checksums intact") {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("fs.file.impl", classOf[graft.fs.FastLocalFileSystem].getName)
    conf.setBoolean("fs.file.impl.disable.cache", true)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI("file:///"), conf)
    assert(fs.isInstanceOf[graft.fs.FastLocalFileSystem])
    val dir = java.nio.file.Files.createTempDirectory("fastfs2")
    val p = new Path(dir.resolve("payload.bin").toString)
    val out = fs.create(p, true)
    out.write(Array.tabulate[Byte](4096)(i => (i % 251).toByte)); out.close()
    // checksum sidecar written (ChecksumFileSystem behavior preserved)
    assert(new java.io.File(dir.toFile, ".payload.bin.crc").exists())
    val in = fs.open(p)
    val buf = new Array[Byte](4096)
    in.readFully(0L, buf); in.close()
    assert(buf.zipWithIndex.forall { case (b, i) => b == (i % 251).toByte })
    fs.delete(new Path(dir.toString), true)
  }
}
