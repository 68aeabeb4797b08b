package graft.core

import java.nio.file.Files

/** Scratch directories for declared queries that need throwaway on-disk
  * state (streaming warehouses/checkpoints, ANN index builds): a
  * per-invocation temp dir registered for recursive removal at JVM exit —
  * a dir that outlives the process was the round-9 advisory leak.
  */
object Scratch {
  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles()
        if (cs != null) cs.foreach(rm)
        f.delete(); ()
      }
      rm(p.toFile)
    }
    p.toString
  }
}
