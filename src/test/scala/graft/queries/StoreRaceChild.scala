package graft.queries

/** Forked-JVM half of IndexStoreSpec's cross-process build race: runs one
  * [[StorePublish.buildOnce]] against the root/name the parent passes,
  * sleeping inside the build body so the two processes genuinely overlap,
  * and reports whether THIS process's build ran. No SparkSession — the
  * publish protocol is pure java.nio, which is exactly what makes a real
  * two-JVM test cheap enough to live in the suite. */
object StoreRaceChild {
  def main(args: Array[String]): Unit = {
    val vroot = new java.io.File(args(0))
    val name = args(1)
    val sleepMs = args(2).toLong
    val built = StorePublish.buildOnce(vroot, name) { tmp =>
      tmp.mkdirs()
      Thread.sleep(sleepMs)
      java.nio.file.Files.writeString(
        new java.io.File(tmp, "payload.txt").toPath, "child")
      java.nio.file.Files.writeString(
        new java.io.File(tmp, "_SUCCESS").toPath, "")
    }
    println(s"BUILT=$built")
  }
}
