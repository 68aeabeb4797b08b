package graft.core

import java.util.concurrent.ConcurrentHashMap

/** Per-JVM materialization cache for synthetic fixture substrates.
  *
  * The codec certification queries (q223/q263/q267/q296/q297/q302) encode a
  * GIF/MP4/WebP payload per corpus document as their INPUT fixture. The
  * encode is not the certified operator — decode → hash → vote is — yet the
  * bench pays it again on every warm rep (cold + 3 warm = 4 full corpus
  * encodes per query), which is a large share of what pushed the r17 driver
  * bench past its wall clock (VERDICT r17 "What's wrong #1" / next-round
  * task 1a). Encoding once per JVM into a keyed scratch parquet and
  * re-reading it on later executions keeps the certified path — container
  * walk, codec decode, banded vote, LSM lifecycle — fully exercised on
  * identical bytes while the fixture synthesis is paid once.
  *
  * Keys must include the sf dir (fixtures differ per scale factor). The
  * scratch dirs are [[Scratch]]-registered, so they are removed at JVM
  * exit; nothing outlives the process.
  */
object FixtureCache {
  private val built = new ConcurrentHashMap[String, String]()

  /** Build-once directory: `build(dir)` materializes the fixture under a
    * fresh scratch `dir` on first call for `key`; later calls return the
    * same dir. The caller reads it back (batch or readStream).
    */
  def dir(key: String)(build: String => Unit): String =
    built.computeIfAbsent(key, _ => {
      val p = Scratch.dir("graft-fx")
      build(p)
      p
    })
}
