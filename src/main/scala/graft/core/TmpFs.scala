package graft.core

/** Single source of truth for tmpfs-backed scratch space (benchmarks,
  * derived-table caches, pipeline demo outputs): /dev/shm when the host
  * has one — with 32 concurrent writers a disk-backed dir becomes the
  * bottleneck and inverts scaling curves — else the JVM temp dir. */
object TmpFs {
  def base: String =
    if (new java.io.File("/dev/shm").isDirectory) "/dev/shm"
    else System.getProperty("java.io.tmpdir")
}
