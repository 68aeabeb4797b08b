package graft.streaming

import graft.scale.{Cluster, Multimodal}
import graft.write.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming image near-dup dedup over perceptual hashes — the q216 batch
  * pipeline (decode through the real codec → dHash → Hamming-banded
  * candidates) run as a continuous ingest: each arriving image batch is
  * deduplicated against every already-accepted image before its own hashes
  * join the index. The image sibling of [[NearDupIndex]] (text MinHash).
  *
  * State is one [[graft.write.VersionedTable]], `root/hashes`
  * (asset_id, dhash) — 16 bytes per accepted image. Payloads are decoded
  * ONCE, in the arriving batch's own tasks (bounded payload residency, the
  * [[graft.scale.Multimodal]] discipline); the cross-batch check is then a
  * banded equi-join of batch hashes against narrow longs — per-batch cost
  * O(batch pixels + matched-band index rows), never O(index pixels).
  *
  * Per batch ([[PhashIndex.processBatch]]):
  *   1. decode + dHash the arrivals;
  *   2. WITHIN-batch: Hamming-banded pairs → transitive components → keep
  *      each component's min id (the q216 clustering restricted to the
  *      batch, so two copies arriving together collapse exactly like the
  *      batch operator);
  *   3. CROSS-batch: a kept row drops iff some DIFFERENT accepted id's
  *      hash lies within `maxHamming` — the id-inequality guard is what
  *      lets a replayed batch, whose rows already sit in the index,
  *      re-accept identically instead of self-matching;
  *   4. GROW: accepted hashes append, batch-stamped (exactly-once under
  *      foreachBatch redelivery), chain-compacted past `maxChainDepth`.
  *
  * Semantics: greedy temporal, same as every accept-only crawl index here —
  * an image survives iff it is not within `maxHamming` of any
  * earlier-accepted image or of its own batch-component's min id. With
  * `bands > maxHamming` the banding is exhaustive (pigeonhole), so these
  * semantics are exact, not approximate — which is what lets the q219
  * oracle replay them value-for-value from the md5 fixture arithmetic.
  */
final class PhashIndex(spark: SparkSession, root: String,
                       bands: Int = 8, bandBits: Int = 7, maxHamming: Int = 6,
                       maxChainDepth: Int = 16) {

  val hashes = new VersionedTable(spark, s"$root/hashes")
  private val ts =
    new graft.write.TombstoneSet(spark, s"$root/tombstones", "asset_id",
      maxChainDepth)
  val tombstones: VersionedTable = ts.table

  /** Takedown-delete accepted image ids, the [[NearDupIndex]] LSM protocol
    * (q213/q222): an O(batch) tombstone append — the hash table is not
    * touched or versioned. Erased images leave BOTH serving surfaces at
    * once: [[served]] (the dedup output) and the index side of every
    * future batch's cross-batch banding — so an image resembling an erased
    * one is ADMITTED afterwards, exactly as if the erased image had never
    * been accepted. Unknown ids are legal no-ops; re-deletes are
    * idempotent. [[compactPurge]] physically drops the rows and truncates
    * the set; growth is append, so a tombstoned id is rejected at ingest
    * while its tombstone lives, and a post-purge re-crawl re-admits it
    * with a fresh history.
    */
  def delete(deletedIds: DataFrame, idCol: String = "asset_id"): Unit =
    ts.add(deletedIds, idCol)

  private def minusTombstones(df: DataFrame): DataFrame = ts.minus(df)

  /** The accepted hash relation minus erased images — what downstream
    * dedup reads AND what arriving batches band against. The tombstone
    * side is delete-batch-sized (AQE broadcasts the anti-join).
    */
  def served(): DataFrame = minusTombstones(hashes.read())

  /** Physically purge tombstoned rows, then truncate the tombstone set.
    * Two promotes; a crash between them leaves stale tombstones over
    * already-purged rows — the anti-join matches nothing and the next
    * purge clears them (convergent, the AnnIndex argument). The purge
    * promote carries the current batch stamp so replay protection
    * survives.
    */
  def compactPurge(): Unit = ts.purge(hashes)

  /** Bulk-accept an already-curated image set's hashes (asset_id, dhash):
    * the bootstrap never re-litigates its own history, exactly like
    * [[NearDupIndex.seed]].
    */
  def seed(h: DataFrame): Unit =
    hashes.promote(hashes.stage(h.select(col("asset_id").cast("long").as("asset_id"),
      col("dhash").cast("long").as("dhash"))))

  /** The accepted corpus's hash relation — what downstream dedup reads. */
  def accepted(): DataFrame = hashes.read()

  /** Drain one image batch: (asset_id, payload binary, fmt ∈ png|gif|jpeg). */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val tag = s"batch=$batchId"
    if (hashes.exists && hashes.currentTag.contains(tag)) return
    val ss = batch.sparkSession
    import ss.implicits._
    // spread the decode (the batch's CPU cost) across cores ONLY when the
    // batch carries enough payload bytes for the decode win to beat the
    // shuffle cost (r21, VERDICT item 3: the unconditional shuffle-to-cores
    // regressed the small-batch drain q219 — its per-batch shuffle + 32-task
    // overhead exceeded the decode saved). The split count derives from the
    // batch's OWN size (one decode task per ~MiB of payload, capped at the
    // core count), so a tiny batch moves zero bytes and a heavy one still
    // fans out — scale-adaptive in both directions (guide §2.1, §6).
    val src0 = batch.select(col("asset_id").cast("long"), col("payload"), col("fmt"))
    val src = PhashStream.decodeSpread(src0)
    val hashed = src
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (aid, bytes, fmt) =>
        (aid, Multimodal.decodeDhash(aid, bytes, fmt))
      })
      // lazy (r21): the decode runs once, inside the first consuming job
      // (the within-batch CC's edge count), and every later use reads the
      // persisted blocks — no dedicated checkpoint job
      .toDF("asset_id", "dhash").localCheckpoint(false)
    val pairs = Multimodal.phashPairs(hashed, "asset_id", "dhash",
      bands, bandBits, maxHamming)
    val labels = Cluster.connectedComponents(pairs)
      .withColumnRenamed("doc_id", "asset_id")
    val reps = hashed.join(labels, Seq("asset_id"), "left")
      .filter(col("cluster").isNull || col("cluster") === col("asset_id"))
      .select("asset_id", "dhash")
    val kept =
      (if (!hashes.exists) minusTombstones(reps)
       else {
         // an id already accepted is an id-level re-crawl, not a new image:
         // skip it outright (growth is append-only per id, like
         // PostingsIndex — raw table, so a tombstoned id cannot
         // resurrect-by-append while its tombstone lives); the CONTENT
         // check bands against [[served]], so erased images stop
         // suppressing near twins immediately
         val fresh = minusTombstones(reps.join(accepted().select("asset_id"),
           Seq("asset_id"), "left_anti"))
         fresh.join(
           Multimodal.phashCollisions(fresh, served(), "asset_id", "dhash",
             bands, bandBits, maxHamming),
           Seq("asset_id"), "left_anti")
       })
        .localCheckpoint(false) // materialized by the stage write (r21)
    if (hashes.exists) hashes.promote(hashes.stageAppend(kept), Some(tag))
    else hashes.promote(hashes.stage(kept), Some(tag))
    // bound the append chain; a rewrite that's being paid anyway also
    // clears pending tombstones (the NearDupIndex policy)
    if (hashes.chainDepth > maxChainDepth) compactPurge()
    ()
  }
}

/** Streaming VIDEO near-dup dedup — the q221 batch pipeline (animated-GIF
  * frame decode → per-frame dHash → Hamming-banded frame pairs →
  * ≥`minFrameVotes`-matching-frame vote) run as a continuous ingest, with
  * the [[PhashIndex]]/[[NearDupIndex]] LSM takedown protocol from day one.
  *
  * State is `root/frames` (asset_id, f, dhash) — 20 bytes per accepted
  * FRAME — plus `root/tombstones` (asset_id). Payloads decode ONCE in the
  * arriving batch's tasks; every cross-batch comparison is a banded
  * equi-join of narrow longs. Two videos match when at least
  * `minFrameVotes` of their frame PAIRS land within `maxHamming` — the
  * keyframe-majority rule, which single-hash schemes cannot express (a
  * frame-dropped or re-sampled re-upload still votes through its
  * surviving keyframes).
  *
  * Per batch: within-batch video components (frame-banded pairs → vote →
  * transitive min-id), then the cross-batch vote against the SERVED frame
  * relation (tombstoned videos excluded, so erased content stops
  * suppressing immediately), then an O(batch) stamped append. Replay and
  * delete semantics are exactly [[PhashIndex]]'s (same laws, spec'd in
  * VideoPhashStreamSpec).
  *
  * AUDIO FALLBACK (q297): real crawl video is overwhelmingly avc1, which
  * the frame path refuses — but those containers usually carry an audio
  * track the PCM subset can decode. Every asset with a decodable PCM
  * track also stores ONE envelope-hash row (f = [[VideoPhashIndex.AudioF]]);
  * an avc1 arrival whose frame path fails closed falls through to that
  * modality and can still be suppressed by its audio. Audio rows only
  * ever vote against audio rows (one match suffices — there is one
  * envelope per asset); frame votes keep the `minFrameVotes` rule.
  * Assets with neither path fail closed, as before.
  */
final class VideoPhashIndex(spark: SparkSession, root: String,
                            bands: Int = 8, bandBits: Int = 7,
                            maxHamming: Int = 6, minFrameVotes: Int = 2,
                            maxChainDepth: Int = 16) {

  val frames = new VersionedTable(spark, s"$root/frames")
  private val ts =
    new graft.write.TombstoneSet(spark, s"$root/tombstones", "asset_id",
      maxChainDepth)
  val tombstones: VersionedTable = ts.table

  /** Bulk-accept an already-curated corpus's frame hashes
    * (asset_id, f, dhash) without re-litigating it.
    */
  def seed(h: DataFrame): Unit =
    frames.promote(frames.stage(h.select(
      col("asset_id").cast("long").as("asset_id"),
      col("f").cast("int").as("f"),
      col("dhash").cast("long").as("dhash"))))

  /** Raw accepted frame relation (including tombstoned videos). */
  def accepted(): DataFrame = frames.read()

  private def minusTombstones(df: DataFrame): DataFrame = ts.minus(df)

  /** The frame relation minus erased videos — what downstream reads and
    * what arriving batches vote against.
    */
  def served(): DataFrame = minusTombstones(frames.read())

  /** Takedown-delete accepted video ids — O(batch) tombstone append,
    * idempotent, unknown ids legal; the [[PhashIndex.delete]] contract.
    */
  def delete(deletedIds: DataFrame, idCol: String = "asset_id"): Unit =
    ts.add(deletedIds, idCol)

  /** Physically purge tombstoned videos' frames, truncate the tombstone
    * set; convergent across crashes (the [[PhashIndex.compactPurge]]
    * argument).
    */
  def compactPurge(): Unit = ts.purge(frames)

  /** (p_id, i_id) video pairs — different id on each side — that collect
    * >= `minFrameVotes` matched frame pairs within `maxHamming`: the
    * keyframe-majority vote as a two-relation banded join of
    * (asset_id, f, dhash) frame rows. Exhaustive while
    * `bands > maxHamming` (pigeonhole), so a brute-force frame join
    * replays it exactly.
    */
  private def votePairs(probe: DataFrame, index: DataFrame): DataFrame = {
    val mask = (1L << bandBits) - 1
    def banded(df: DataFrame, side: String) = df.select(
        col("asset_id").as(s"${side}_id"), col("dhash").as(s"${side}_h"),
        col("f").as(s"${side}_f"),
        explode(array((0 until bands).map(i =>
          struct(lit(i).as("band"),
            shiftright(col("dhash"), bandBits * i).bitwiseAND(lit(mask)).as("bits"))): _*))
          .as("__b"))
      .select(col(s"${side}_id"), col(s"${side}_h"), col(s"${side}_f"),
        col("__b.band"), col("__b.bits"))
    // verify-then-distinct (the phashPairs order): the Hamming check runs
    // inside the join stage, so only verified frame pairs ride the
    // band-multiplicity dedup shuffle — not the whole candidate stream.
    // Modality purity: frame rows (f >= 0) only ever vote against frame
    // rows, the audio-envelope row (f == AudioF) only against audio rows —
    // a frame hash near an envelope hash is numerology, not similarity.
    // Frame matches need >= minFrameVotes; ONE audio-envelope match
    // suffices (there is one envelope per asset).
    banded(probe, "p").join(banded(index, "i"), Seq("band", "bits"))
      .filter(col("p_id") =!= col("i_id"))
      .filter((col("p_f") >= 0) === (col("i_f") >= 0))
      .filter(expr(s"bit_count(p_h ^ i_h) <= $maxHamming"))
      .select("p_id", "p_f", "i_id", "i_f").distinct()
      .groupBy("p_id", "i_id")
      .agg(count(when(col("p_f") >= 0, 1)).as("frame_votes"),
        count(when(col("p_f") < 0, 1)).as("audio_votes"))
      .filter(col("frame_votes") >= minFrameVotes || col("audio_votes") >= 1)
      .select("p_id", "i_id")
  }

  /** Drain one video batch: (asset_id, payload binary) — animated GIFs
    * and MJPEG MP4s share the sink ([[Multimodal.videoDecodeGrayFrames]]
    * dispatches on the container magic; frame keys are
    * container-invariant, so cross-container re-encodes vote).
    */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val tag = s"batch=$batchId"
    if (frames.exists && frames.currentTag.contains(tag)) return
    val ss = batch.sparkSession
    import ss.implicits._
    // byte-gated decode spread (see [[PhashIndex.processBatch]] — video
    // payloads are large, so heavy batches still fan out)
    val src0 = batch.select(col("asset_id").cast("long"), col("payload"))
    val src = PhashStream.decodeSpread(src0)
    val hashed = src
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (vid, bytes) =>
        // every decodable modality hashes: frames when the codec is in the
        // frame path's subset, PLUS the PCM audio track's envelope when
        // one exists (f = AudioF — its own modality row). That audio row
        // is what lets a LATER avc1 re-encode (frame path refuses the
        // codec) still vote against this asset. Assets with NEITHER path
        // stay fail-closed.
        val audio = Multimodal.mp4AudioEnvelopeHash(bytes)
          .map(h => (vid, VideoPhashIndex.AudioF, h))
        Multimodal.videoDecodeGrayFrames(bytes) match {
          case Some((w, h, fs)) =>
            fs.iterator.zipWithIndex.map { case (px, f) =>
              (vid, f, Multimodal.dHash56(px, w, h))
            } ++ audio.iterator
          case None =>
            audio.map(Iterator.single(_)).getOrElse(
              throw new IllegalStateException(s"undecodable video $vid"))
        }
      })
      // lazy decode checkpoint (see [[PhashIndex.processBatch]])
      .toDF("asset_id", "f", "dhash").localCheckpoint(false)
    // within-batch: frame-banded pairs → >= minFrameVotes vote → components
    // (votePairs emits both orientations of each unordered pair; keep one)
    val videoPairs = votePairs(hashed, hashed)
      .filter(col("p_id") < col("i_id"))
      .select(col("p_id").as("doc_a"), col("i_id").as("doc_b"))
    val labels = Cluster.connectedComponents(videoPairs)
      .withColumnRenamed("doc_id", "asset_id")
    val reps = hashed.join(labels, Seq("asset_id"), "left")
      .filter(col("cluster").isNull || col("cluster") === col("asset_id"))
      .select("asset_id", "f", "dhash")
    val kept =
      (if (!frames.exists) minusTombstones(reps)
       else {
         // id-level re-crawl skip against the RAW table (append-only per
         // id, no resurrection while a tombstone lives); the CONTENT vote
         // runs against [[served]] so erased videos stop suppressing
         val fresh = minusTombstones(reps.join(
           accepted().select("asset_id").distinct(),
           Seq("asset_id"), "left_anti"))
         fresh.join(
           votePairs(fresh, served()).select(col("p_id").as("asset_id")).distinct(),
           Seq("asset_id"), "left_anti")
       })
        .localCheckpoint(false) // materialized by the stage write (r21)
    if (frames.exists) frames.promote(frames.stageAppend(kept), Some(tag))
    else frames.promote(frames.stage(kept), Some(tag))
    if (frames.chainDepth > maxChainDepth) compactPurge()
    ()
  }
}

object VideoPhashIndex {
  /** The `f` sentinel of an audio-envelope row: one per asset whose video
    * codec the frame path refuses but whose PCM track still hashes.
    */
  val AudioF: Int = -1
}

object PhashStream {

  /** Per-decode-task payload granule: batches below it never shuffle. */
  private val SpreadBytesPerTask: Long = 1L << 20

  /** Repartition a payload batch for the decode mapPartitions, gated on the
    * batch's OWN byte size (driver-side plan stats — no job): target splits
    * = payload bytes / [[SpreadBytesPerTask]], capped at the core count,
    * and the shuffle only happens when that target exceeds what the scan
    * already provides. Small batches (the q219 regime) keep their 1–2
    * scan splits and move zero bytes; payload-heavy batches (video, packed
    * image feeds) fan out to one task per ~MiB — the decode is the batch's
    * CPU cost, and 1–2 splits starved the other cores (r20 measurement).
    */
  private[streaming] def decodeSpread(src: DataFrame): DataFrame =
    graft.scale.Multimodal.spreadForDecode(src, SpreadBytesPerTask)

  /** [[PhashIndex.processBatch]] as a streaming sink: drain an image
    * stream into the index; `index.accepted()` is the continuously-deduped
    * hash relation.
    */
  def phashDedupSink(images: DataFrame, index: PhashIndex,
                     checkpoint: String): StreamingQuery =
    images.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        index.processBatch(batch, batchId)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** [[VideoPhashIndex.processBatch]] as a streaming sink: drain an
    * animated-GIF video stream into the index; `index.served()` is the
    * continuously-deduped frame-hash relation.
    */
  def videoPhashDedupSink(videos: DataFrame, index: VideoPhashIndex,
                          checkpoint: String): StreamingQuery =
    videos.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        index.processBatch(batch, batchId)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
