package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale-slope harness (r12 verdict item 5): the bounded-cost
  * claims on the dedup/ANN/streaming paths are spec-pinned at one corpus
  * size; this MEASURES them across synthesized ×1/×2/×4/×8 corpora and
  * writes a SCALE_r*.json artifact, turning "the plan shape is linear"
  * into a bench-pinned number.
  *
  * Corpus synthesis preserves the claim being measured: each copy remaps
  * ids (disjoint ranges) and ROTATES the text alphabet (`translate` by a
  * per-copy Caesar shift), so copies share no shingles — near-dup density
  * per document stays constant as the corpus grows, which is exactly the
  * regime where the candidate-generation bounds claim linear total work.
  * (Cloning text verbatim would instead grow every identity bucket with
  * the scale factor and measure the hot-bucket cap, not the slope.)
  * Embedding copies shift by a small per-copy constant — same cluster
  * structure, disjoint ids.
  *
  * Workload expectations:
  *   - lsh_neardup (q26 core), containment (q144 core), exact_dedup (q25
  *     core): total work LINEAR in the corpus → wall ratio at ×8 ≈ 8
  *     (pass ≤ 16, i.e. visibly subquadratic; quadratic would read ~64).
  *   - ann_append (q93 core), streaming near-dup batch (q101 core): a
  *     FIXED batch against a ×8 index → O(batch)-dominated, near-FLAT
  *     (pass ≤ 3; linear-in-index would read ~8).
  *
  * r15 additions (r14 verdict item 3 — the new surfaces' strongest claims
  * were spec'd, not measured):
  *   - extract_text (q202 core): pure scan-local projection → LINEAR.
  *   - nndescent_build (q206 core): local-join work Σdeg² with the degree
  *     cap → LINEAR in the corpus (one rep; the loop dominates).
  *   - ivf_delete / ivfpq_delete (q205/q208 core): a FIXED delete batch
  *     against the ×8 index is an O(batch) tombstone append → FLAT.
  *   - ivf_delete_compact: the amortized physical purge rewrites the
  *     index → LINEAR, by design (that is the LSM trade being certified).
  *   - triangle_batch (q198 core): a FIXED edge batch against the ×8 edge
  *     table — delta join cost tracks batch × adjacency, and the r14
  *     O(batch) sink rewrite keeps the promote batch-sized → pass ≤ 4
  *     (the delta scan of the ×k old-edge relation is one pruned pass;
  *     the pre-r14 O(|E|)-rewrite sink would track the table and read ~8).
  *
  * r15 second-wave additions (the q216–q219 surfaces):
  *   - phash_pipeline (q216 core): encode → decode → dHash → banded pair
  *     join over a ×k image corpus of DISTINCT content → LINEAR.
  *   - phash_stream_batch (q219 core): a FIXED image batch against the ×k
  *     accepted-hash index — decode is batch-sized, the collision check
  *     joins 16-byte hash rows → FLAT.
  *   - nav_delete (q218 core): a FIXED takedown batch against the ×k
  *     navigable index — an O(batch) tombstone append → FLAT.
  *   - pagerank_delete (q217 core): a FIXED end-node takedown against a
  *     ×k path-structured PageRank index with nBuckets scaled to hold
  *     bucket size constant — the O(cone) repair → FLAT.
  *
  * r15 third-wave additions (the q220–q222 surfaces):
  *   - video_pipeline (q221 core): 4-frame animated-GIF encode → frame
  *     decode → per-frame dHash → banded frame-pair join → ≥2-frame vote,
  *     over ×k DISTINCT videos → LINEAR.
  *   - audio_pipeline (q220 core): WAV encode → PCM decode → envelope →
  *     dHash → banded pairs over ×k distinct clips → LINEAR.
  *   - phash_delete (q222 core): a FIXED takedown batch against the ×k
  *     perceptual-hash index — an O(batch) tombstone append → FLAT.
  *
  * r15 fourth-wave additions (the q226/q229 surfaces):
  *   - budget_mix (q226 core): token-budget admission with ×k budgets
  *     over ×k docs — one narrow bucketed prefix-sum shuffle → LINEAR.
  *   - ppl_buckets (q229 core): surprisal passes + histogram-sized
  *     bucketing → LINEAR.
  *
  * r17 additions (r16 verdict item 4 — the newest families' bounds were
  * spec'd, not slope-pinned):
  *   - eval_scrub (q268 core): span-level eval decontamination of ×k docs
  *     against a FIXED broadcast eval-gram set → LINEAR.
  *   - dup_token_profile (q269 core): the q253 doubling rounds measured
  *     as a coverage histogram instead of a cut → LINEAR.
  *   - collocation_stream (q276 core): a FIXED doc batch through the
  *     unigram+bigram count-monoid indexes seeded at ×k → FLAT.
  *
  * Also from r15 on, every scaled corpus is repartitioned to the session's
  * parallelism before timing: the ×k union otherwise inherits k× the
  * base's single input split, so ×1 ran SERIAL and every ratio read
  * artificially flat (the slope must measure work growth, not parallelism
  * growth) — the earlier rounds' bounds still held, but the r15 numbers
  * are the honest ones.
  */
object ScaleBench {

  private val Alpha = "abcdefghijklmnopqrstuvwxyz"

  private def scaleDocs(docs: DataFrame, k: Int): DataFrame =
    (0 until k).map { c =>
      val rot = Alpha.drop(c % 26) + Alpha.take(c % 26)
      docs.select((col("doc_id") + lit(c.toLong * 1000000L)).as("doc_id"),
        translate(col("text"), Alpha, rot).as("text"))
    }.reduce(_ unionByName _)

  private def scaleEmb(emb: DataFrame, k: Int): DataFrame =
    (0 until k).map { c =>
      emb.select((col("vec_id") + lit(c.toLong * 1000000L)).as("vec_id"),
        transform(col("embedding"), x => x + lit(c * 0.01f)).cast("array<float>")
          .as("embedding"))
    }.reduce(_ unionByName _)

  private def timeMin(reps: Int)(f: => Unit): Double =
    (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outPath = args.headOption.getOrElse("SCALE_r15.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config(graft.core.Tables.NanosConfKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.scale.{AnnIndex, Curation, Dedup, Graph, Multimodal, NnDescent, Pq}
    import spark.implicits._

    val baseDocs = graft.core.Tables.documents(spark, sfDir).select("doc_id", "text")
    val baseEmb = graft.core.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val scales = Seq(1, 2, 4, 8)
    val reps = 2

    // fixed batches, ids and vocab disjoint from every scaled copy
    val fixedDocBatch = baseDocs.limit(200)
      .select((col("doc_id") + 50000000L).as("doc_id"),
        translate(col("text"), Alpha, Alpha.drop(13) + Alpha.take(13)).as("text"))
      .localCheckpoint()
    val fixedVecBatch = baseEmb.filter(col("vec_id") < 64)
      .select((col("vec_id") + 50000000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.5f)).cast("array<float>")
          .as("embedding"))
      .localCheckpoint()

    val results = scales.map { k =>
      // constant parallelism across scales: the ×k union inherits k× the
      // base's (single) input split, so without this the ×1 corpus runs
      // SERIAL and every ratio reads artificially flat — the slope must
      // measure work growth, not parallelism growth
      val par = spark.sparkContext.defaultParallelism
      val docs = scaleDocs(baseDocs, k).repartition(par).localCheckpoint()
      val emb = scaleEmb(baseEmb, k).repartition(par).localCheckpoint()
      val nDocs = docs.count(); val nVecs = emb.count()

      val tDedup = timeMin(reps) { Dedup.exact(docs).queryExecution.toRdd.count() }
      val tLsh = timeMin(reps) {
        val sigs = Dedup.minhashSignatures(docs).localCheckpoint()
        Dedup.jaccardVerify(docs, Dedup.minhashCandidates(sigs))
          .queryExecution.toRdd.count()
      }
      val tContain = timeMin(reps) {
        Dedup.containmentPairs(docs).queryExecution.toRdd.count()
      }
      // index build is untimed setup; the measured number is the FIXED
      // batch's append/drain against the ×k index
      val annRoot = s"${graft.core.Scratch.dir(s"graft-scale-ann$k")}/ivf"
      AnnIndex.buildIvfIndex(emb, annRoot)
      val tAppend = timeMin(reps) { AnnIndex.appendToIvfIndex(fixedVecBatch, annRoot) }
      val ndRoot = s"${graft.core.Scratch.dir(s"graft-scale-nd$k")}/nd"
      val nd = new graft.streaming.NearDupIndex(spark, ndRoot)
      nd.seed(docs)
      // distinct batch ids per rep: replay gating would no-op rep 2
      var b = 0
      val tStream = timeMin(reps) { nd.processBatch(fixedDocBatch, { b += 1; b.toLong }) }

      // extractText over the q202 html fixture: scan-local projection
      val seeded = docs.select(col("doc_id"),
        graft.scale.Curation.htmlFixture(col("doc_id"), col("text")).as("text"))
      val tExtract = timeMin(reps) {
        Curation.extractText(seeded).queryExecution.toRdd.count()
      }

      // NN-descent k-NN-graph build, through the persistent NavIndex (same
      // descent work + two table stages; the loop checkpoints eagerly, so
      // the call IS the work); one rep — the multi-round build dominates.
      // metaCols: the lang tag rides the codes relation (one narrow string
      // column) so the SAME build serves the filtered-probe row below.
      val navRoot = s"${graft.core.Scratch.dir(s"graft-scale-nav$k")}/nav"
      val nav = new NnDescent.NavIndex(spark, navRoot, metaCols = Seq("lang"))
      val embLang = emb.withColumn("lang",
        when(col("vec_id") % 4 === 0, "en").otherwise("xx"))
      val tNnd = timeMin(1) { nav.build(embLang) }

      // q218 core: a FIXED takedown batch (copy-0 ids only, distinct per
      // rep) against the ×k navigable index — an O(batch) tombstone append
      var nv = 0
      val tNavDel = timeMin(reps) {
        nv += 1
        nav.delete(baseEmb.filter(col("vec_id") % 89 === nv).select("vec_id"))
      }

      // q300 core: predicate-filtered probes of the ×k navigable index at
      // a FIXED 32-query panel. The walk itself is probe-bounded (seeds +
      // rounds × beam × 2·graphK candidates per query), but each round's
      // scorer equi-joins the ×k codes relation, so the HONEST bound is
      // linear-with-a-small-constant, not flat — the scale fix for serving
      // is the hierarchical upper layer (q233), not this flat walk.
      val tNavFiltered = timeMin(reps) {
        nav.probe(baseEmb.filter(col("vec_id") < 32), 10,
            graft.scale.Recall.NavBeam, graft.scale.Recall.BeamRounds,
            graft.scale.Recall.Seeds, pred = Some(col("lang") === "en"))
          .queryExecution.toRdd.count()
      }

      // delete lifecycle: FIXED delete batches (distinct ids per rep — a
      // re-delete no-ops by design and would time the skip) against the
      // ×k index, then the amortized physical purge
      var dr = 0
      val tDelete = timeMin(reps) {
        dr += 1
        // base ids only (copy 0 keeps the original range): the delete
        // batch stays FIXED-size while the index grows ×k
        AnnIndex.deleteFromIvfIndex(
          baseEmb.filter(col("vec_id") % 97 === dr).select("vec_id"), annRoot)
      }
      val tCompact = timeMin(1) { AnnIndex.compactIvfIndex(spark, annRoot) }
      val pqRoot = s"${graft.core.Scratch.dir(s"graft-scale-pq$k")}/ivfpq"
      Pq.buildIvfPqIndex(emb, pqRoot)
      var dq = 0
      val tPqDelete = timeMin(reps) {
        dq += 1
        Pq.deleteFromIvfPqIndex(
          baseEmb.filter(col("vec_id") % 97 === dq).select("vec_id"), pqRoot)
      }

      // streaming triangle maintenance: FIXED edge batch (disjoint node
      // range per rep) against the ×k edge table — seed by direct stage
      // (setup, untimed), then time the drained batch
      val pairs = Graph.coSupplierPairs(spark, sfDir, minShared = 6L)
        .localCheckpoint()
      val scaledPairs = (0 until k).map { c =>
        pairs.select((col("u") + lit(c.toLong * 10000000L)).as("u"),
          (col("v") + lit(c.toLong * 10000000L)).as("v"))
      }.reduce(_ unionByName _)
      val triRoot = graft.core.Scratch.dir(s"graft-scale-tri$k")
      val te = new graft.write.VersionedTable(spark, s"$triRoot/edges")
      val ts = new graft.write.VersionedTable(spark, s"$triRoot/stats")
      te.promote(te.stage(scaledPairs))
      val sink = new graft.streaming.TriangleStream(te, ts)
      var tb = 0
      val tTri = timeMin(reps) {
        tb += 1
        sink.processBatch(
          pairs.select((col("u") + lit(90000000L + tb * 1000000L)).as("u"),
            (col("v") + lit(90000000L + tb * 1000000L)).as("v")).limit(200),
          tb.toLong)
      }

      // q216 core: real encode → decode → dHash → banded pair join over a
      // ×k image corpus (distinct content per id — constant near-dup
      // density, the linear regime the banding bounds claim)
      val tPhashPipe = timeMin(reps) {
        val hashes = docs.select("doc_id").as[Long].mapPartitions(_.map { id =>
          val bytes = Multimodal.pngEncodeGray(
            Multimodal.synthPixels(id, pert = false), 64, 64)
          (id, Multimodal.decodeDhash(id, bytes, "png"))
        }).toDF("asset_id", "dhash")
        Multimodal.phashPairs(hashes).queryExecution.toRdd.count()
      }

      // q219 core: a FIXED 200-image batch (fresh content per rep) against
      // the ×k accepted-hash index — decode is batch-sized, the collision
      // check joins narrow longs
      val phiRoot = s"${graft.core.Scratch.dir(s"graft-scale-phi$k")}/phi"
      val phi = new graft.streaming.PhashIndex(spark, phiRoot)
      phi.seed(docs.select("doc_id").as[Long].mapPartitions(_.map(id =>
          (id, Multimodal.dHash56(Multimodal.synthPixels(id, pert = false), 64, 64))))
        .toDF("asset_id", "dhash"))
      var pb = 0
      val tPhiBatch = timeMin(reps) {
        pb += 1
        val imgs = (0 until 200).map { i =>
          val aid = 60000000L + pb * 100000L + i
          (aid, Multimodal.pngEncodeGray(
            Multimodal.synthPixels(aid, pert = false), 64, 64), "png")
        }.toDF("asset_id", "payload", "fmt")
        phi.processBatch(imgs, pb.toLong)
      }

      // q222 core: a FIXED takedown batch (copy-0 ids, distinct per rep —
      // a re-delete no-ops by design) against the ×k phash index
      var pd = 0
      val tPhiDel = timeMin(reps) {
        pd += 1
        phi.delete(baseDocs.select(col("doc_id").as("asset_id"))
          .filter(col("asset_id") % 89 === pd))
      }

      // q221 core: animated encode → frame decode → per-frame dHash →
      // banded frame-pair join → ≥2-frame vote, ×k distinct videos
      val tVideoPipe = timeMin(reps) {
        val fh = docs.select("doc_id").as[Long].mapPartitions(_.flatMap { id =>
          val frames = Array.tabulate(4)(f =>
            Multimodal.synthFramePixels(id, f, pert = false))
          val gif = Multimodal.gifEncodeGrayAnimated(frames.toSeq, 64, 64)
          val (w, h, dec) = Multimodal.gifDecodeGrayFrames(gif).getOrElse(
            throw new IllegalStateException(s"undecodable video $id"))
          dec.iterator.zipWithIndex.map { case (px, f) =>
            (id * 4 + f, Multimodal.dHash56(px, w, h))
          }
        }).toDF("asset_id", "dhash")
        Multimodal.phashPairs(fh)
          .select(expr("doc_a div 4").as("va"), expr("doc_b div 4").as("vb"))
          .filter(col("va") =!= col("vb"))
          .groupBy("va", "vb").count().filter(col("count") >= 2)
          .queryExecution.toRdd.count()
      }

      // q296 core: lossy-VP8 WebP encode → container walk → full VP8
      // key-frame decode (bool coder, B_PRED, IDCT, deblock) → dHash →
      // banded pairs, ×k distinct images — per-image constant work, LINEAR
      val tWebpLossy = timeMin(reps) {
        val wh = docs.select("doc_id").as[Long].mapPartitions(_.map { id =>
          val px = Multimodal.synthPixels(id, pert = false)
          val bytes = Multimodal.webpEncodeGrayVp8(px, 64, 64, 8)
          val (w, h, dec) = Multimodal.webpDecodeGray(bytes).getOrElse(
            throw new IllegalStateException(s"undecodable lossy webp $id"))
          (id, Multimodal.dHash56(dec, w, h))
        }).toDF("asset_id", "dhash")
        Multimodal.phashPairs(wh).queryExecution.toRdd.count()
      }

      // q303/q308 core (r18 verdict item 6): COLOR + interlaced + tRNS
      // PNG near-dup over ×k distinct images — encode → the real decoder
      // (truecolor luma / Adam7 pass reconstruction / palette-tRNS LUT) →
      // dHash → banded pairs. Per-image constant work → LINEAR.
      val tColorNeardup = timeMin(reps) {
        val ch = docs.select("doc_id").as[Long].mapPartitions(_.map { id =>
          val px = Multimodal.synthPixels(id, pert = false)
          val bytes = (id % 3) match {
            case 0 => Multimodal.pngEncodeRgb(Multimodal.colorLiftPixels(px), 64, 64)
            case 1 => Multimodal.pngEncodeGrayAdam7(px, 64, 64)
            case _ => Multimodal.pngEncodePaletteTrns(px,
              Multimodal.ColorLiftPalette, Array.fill(128)(255.toByte), 64, 64)
          }
          (id, Multimodal.decodeDhash(id, bytes, "png"))
        }).toDF("asset_id", "dhash")
        Multimodal.phashPairs(ch).queryExecution.toRdd.count()
      }

      // q305 core (r18 verdict item 6): the WARC two-phase scan over ×k
      // archives — O(buffer) member-index skim (or its CDX sidecar), the
      // 3-column index shuffle, ranged scan-local gunzip+parse. Per-byte
      // constant work → LINEAR. Setup (untimed): the ×k corpus written as
      // 8 multi-member .warc.gz files.
      val warcDir = graft.core.Scratch.dir(s"graft-scale-warc$k")
      locally {
        docs.repartition(8, pmod(col("doc_id"), lit(8)))
          .sortWithinPartitions("doc_id")
          .as[(Long, String)]
          .mapPartitions { it =>
            val rows = it.toVector
            if (rows.isEmpty) Iterator.empty
            else {
              val part = org.apache.spark.TaskContext.getPartitionId()
              val recs = rows.map { case (id, text) =>
                graft.sources.Warc.Rec(s"https://site${id % 10}.com/page/$id",
                  f"2026-08-${id % 28 + 1}%02dT00:00:00Z",
                  "text/html", s"<p>$text</p>")
              }
              java.nio.file.Files.write(
                java.nio.file.Paths.get(s"$warcDir/part-$part.warc.gz"),
                graft.sources.Warc.warcFileBytes(recs))
              Iterator.single(1)
            }
          }.collect()
      }
      val tWarcScan = timeMin(reps) {
        graft.sources.Warc.readWarc(spark, warcDir)
          .queryExecution.toRdd.count()
      }

      // q297 core: a FIXED avc1 (frame-opaque) two-track batch voted
      // against the ×k video index via the AUDIO modality alone — the
      // banded probe is O(batch), so the vote stays FLAT as the index
      // grows. Setup (untimed): ×k synthetic frame+audio hash rows, plus
      // the 64 match targets' true PCM envelopes.
      val vpRoot = s"${graft.core.Scratch.dir(s"graft-scale-vp$k")}/vphi"
      val vp = new graft.streaming.VideoPhashIndex(spark, vpRoot)
      def q297Audio(md: java.security.MessageDigest)(src: Long): Array[Short] = {
        def b1(tag: String): Int = {
          md.reset(); md.digest(tag.getBytes("UTF-8"))(0).toInt & 0xff
        }
        Array.tabulate(1024)(t =>
          (b1(s"${src}_b${t / 16}") * 100 + b1(s"${src}_j$t") % 50).toShort)
      }
      locally {
        val bulk = docs.select(col("doc_id").as("asset_id")).as[Long]
          .mapPartitions { it =>
            val md = java.security.MessageDigest.getInstance("MD5")
            def h8(tag: String): Long = {
              md.reset()
              java.nio.ByteBuffer.wrap(md.digest(tag.getBytes("UTF-8")))
                .getLong & 0xffffffffffffffL // 56-bit, the dHash56 domain
            }
            it.flatMap { id =>
              (0 until 4).iterator.map(f => (id, f, h8(s"${id}_f$f"))) ++
                Iterator((id, -1, h8(s"${id}_a")))
            }
          }.toDF("asset_id", "f", "dhash")
        vp.seed(bulk)
        val targets = spark.range(64).as[Long].mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.map { i =>
            (70000000L + i, -1, Multimodal.dHash56(
              Multimodal.audioEnvelope64(q297Audio(md)(i)), 8, 8))
          }
        }.toDF("asset_id", "f", "dhash")
        vp.seed(targets)
      }
      var av = 0
      val tAvcVote = timeMin(reps) {
        av += 1
        val batch = spark.range(64).as[Long].mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          def b1(tag: String): Int = {
            md.reset(); md.digest(tag.getBytes("UTF-8"))(0).toInt & 0xff
          }
          val mkAudio = q297Audio(md) _
          it.map { i =>
            (80000000L + av * 100000L + i, Multimodal.mp4AvcPcmBytes(
              Seq(Array.tabulate(64)(j => b1(s"${i}_v$j").toByte)),
              64, 64, Some(mkAudio(i)), videoFourcc = "avc1"))
          }
        }.toDF("asset_id", "payload")
        vp.processBatch(batch, av.toLong)
      }


      // q309 core: avc1 re-encode -> from-scratch H.264 IDR decode ->
      // frame dHash -> banded pairs over the ×k corpus. Encode+decode are
      // per-asset scan-local work and the banded join is the q216 shape,
      // so the family is LINEAR like color_neardup.
      val tAvcNeardup = timeMin(reps) {
        val ch = docs.select("doc_id").as[Long].mapPartitions(_.map { id =>
          val px = Multimodal.synthPixels(id, pert = false)
          val annexb = graft.scale.Avc.encodeGrayIdr(px, 64, 64, 6)
          val (sp, pp, idr) = graft.scale.Avc.splitAnnexB(annexb)
          val mp4 = Multimodal.mp4AvcPcmBytes(
            Seq(graft.scale.Avc.toAvccSample(idr)), 64, 64, None, "avc1",
            graft.scale.Avc.avccPayload(sp, pp))
          val (w, h, frames) = Multimodal.mp4DecodeGrayFrames(mp4).get
          (id, Multimodal.dHash56(frames.head, w, h))
        }).toDF("asset_id", "dhash")
        Multimodal.phashPairs(ch).queryExecution.toRdd.count()
      }

      // q220 core: WAV encode → PCM decode → envelope → dHash → banded
      // pairs, ×k distinct clips
      val tAudioPipe = timeMin(reps) {
        val ah = docs.select("doc_id").as[Long].mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          def b1(tag: String): Int = {
            md.reset(); md.digest(tag.getBytes("UTF-8"))(0).toInt & 0xff
          }
          it.map { id =>
            val base = Array.tabulate(1024)(t =>
              (b1(s"${id}_b${t / 16}") * 100 + b1(s"${id}_j$t") % 50).toShort)
            val samples = Multimodal.wavPcmSamples(
              Multimodal.wavBytesPcm(8000, base)).getOrElse(
              throw new IllegalStateException(s"undecodable wav $id"))
            (id, Multimodal.dHash56(Multimodal.audioEnvelope64(samples), 8, 8))
          }
        }.toDF("asset_id", "dhash")
        Multimodal.phashPairs(ah).queryExecution.toRdd.count()
      }

      // q217 core: a FIXED node takedown against a ×k path-structured
      // PageRank index. nBuckets scales with the graph so a bucket stays
      // constant-size (the documented at-scale contract); the dirty cone
      // of an end-node delete is O(iters), so the repair must read flat.
      // (The dense trade graph would be the wrong fixture here: its
      // diameter-2 cone IS the graph — inherent to exact maintenance, not
      // a pruning defect.)
      val prN = 20000L * k
      val prPath = spark.range(prN - 1)
        .select(col("id").as("c"), (col("id") + 1).as("s"))
      val prRoot = s"${graft.core.Scratch.dir(s"graft-scale-pr$k")}/pr"
      val prIdx = new Graph.PageRankIndex(spark, prRoot, iters = 3,
        nBuckets = 16 * k)
      prIdx.build(Graph.undirected(prPath))
      var dpr = 0
      val tPrDel = timeMin(reps) {
        dpr += 1
        prIdx.delete(Seq(prN - dpr).toDF("node"))
      }

      // q226 core: token-budget admission over ×k docs with ×k budgets —
      // the bucketed two-level prefix sum is one narrow shuffle → LINEAR
      val langd = docs.withColumn("lang", pmod(col("doc_id"), lit(4)).cast("string"))
        .localCheckpoint()
      val budgets = (0 until 4).map(l => l.toString -> 10000L * k)
      val tBudget = timeMin(reps) {
        Curation.tokenBudgetMix(langd, "lang", budgets).queryExecution.toRdd.count()
      }

      // q229 core: surprisal passes + histogram-sized bucketing → LINEAR
      val tPpl = timeMin(reps) {
        Curation.perplexityBuckets(langd, "lang").queryExecution.toRdd.count()
      }

      // q253 core: suffix-array prefix doubling (4 rounds, 16-token
      // spans) — n log n sorts per round over the position relation, well
      // inside the LINEAR bound at ×8. The rounds localCheckpoint per
      // iteration, so snapshot the persistent-RDD set and unpersist the
      // new blocks afterwards: left to the async ContextCleaner they
      // survive into the NEXT scale and squeeze the decode pipelines'
      // working set (first measured as video_pipeline 12.2x -> 17.5x).
      val rddsBefore = spark.sparkContext.getPersistentRDDs.keySet
      val tSuffix = timeMin(reps) {
        graft.scale.SuffixArray.repeatedSpans(docs, rounds = 4)
          .queryExecution.toRdd.count()
      }

      // q260 core: winnowing fingerprints over ×k distinct docs — per-doc
      // windows + the bounded argmin re-join → LINEAR
      val tWinnow = timeMin(reps) {
        Curation.winnowFingerprints(docs).queryExecution.toRdd.count()
      }

      // q268 core: span-level eval scrub of ×k docs against a FIXED eval
      // set — the corpus positional-gram stream probes one broadcast
      // 16-byte gram set, per-doc windows only → LINEAR
      val planted = docs.select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" " + graft.scale.SuffixArray.PlantedPhrase)))
          .otherwise(col("text")).as("text"))
      val evalSet = Seq((0L, graft.scale.SuffixArray.PlantedPhrase))
        .toDF("doc_id", "text")
      val tScrub = timeMin(reps) {
        Curation.scrubEvalSpans(planted, evalSet, n = 8)
          .queryExecution.toRdd.count()
      }

      // q269 core: duplication-rate profile over ×k docs — the q253
      // doubling rounds, the coverage prefix sum, and the histogram-sized
      // decile agg → LINEAR (same suffix machinery as suffix_spans; runs
      // inside the same persistent-RDD bracket for its per-round
      // localCheckpoints)
      val tDupProfile = timeMin(reps) {
        graft.scale.SuffixArray.dupTokenProfile(planted, rounds = 4)
          .queryExecution.toRdd.count()
      }

      // q262 core: a FIXED doc batch (fresh content per rep) through the
      // winnow-keyed admission guard against the ×k fingerprint index —
      // O(batch) fingerprinting + chain-bounded semi-join → FLAT
      val wgRoot = s"${graft.core.Scratch.dir(s"graft-scale-wg$k")}/g"
      val wg = new graft.streaming.SpanGuardIndex(spark, wgRoot,
        spanFn = Some(b => Curation.winnowFingerprints(b)
          .select(col("doc_id"), col("h")).distinct()))
      wg.processBatch(docs, 0L)
      var wb = 0
      val tWinnowGuard = timeMin(reps) {
        wb += 1
        wg.processBatch(fixedDocBatch
          .select((col("doc_id") + wb * 1000L).as("doc_id"),
            concat(col("text"), lit(s" r$wb")).as("text")), 1000L + wb)
      }

      // q259/q251 cores (post the r16 window fix): term drift between two
      // ×k half-corpora, and the Zipf rank→bucket profile over the ×k
      // vocab — both ride the distributed dense rank / TakeOrdered cut
      // now, so the vocab relation never single-partitions → LINEAR
      val tDrift = timeMin(reps) {
        Curation.termDrift(docs.filter(col("doc_id") % 2 === 0),
            docs.filter(col("doc_id") % 2 === 1))
          .queryExecution.toRdd.count()
      }
      val tZipf = timeMin(reps) {
        Curation.zipfBuckets(docs).queryExecution.toRdd.count()
      }

      // q249 core: TextRank keywords — pooled per-doc co-occurrence
      // graphs, no cross-doc joins → LINEAR
      val tTextRank = timeMin(reps) {
        Curation.textRankKeywords(docs).queryExecution.toRdd.count()
      }

      // q212 serve core (r16 verdict item 3): a FIXED 3-term BM25 query
      // against a ×k postings index through the length/stats sidecars —
      // O(query-terms) postings + candidate-joined lengths + O(1) stats.
      // The Caesar-rotated copies keep the query terms' postings FIXED
      // while the index grows ×k, so the old O(index) doc-length
      // re-aggregation would read ~8 here; the sidecar path must be flat
      // (one narrow columnar scan of the (doc_id, len) sidecar is the
      // only ×k-touching step).
      val lexRoot = s"${graft.core.Scratch.dir(s"graft-scale-lex$k")}/lex"
      val lex = new graft.streaming.PostingsIndex(spark, lexRoot)
      lex.processBatch(docs, 0L)
      val bmTerms = Seq("spark", "merge", "dup")
      val tBmServe = timeMin(reps) {
        lex.bm25Serve(bmTerms).queryExecution.toRdd.count()
      }

      // q299 core: a FIXED 2-term BM25F query against a ×k FIELD-TAGGED
      // index — O(query-terms) field-tagged postings + the wide length
      // sidecar's projection-only scan → FLAT like bm25_serve
      val flexRoot = s"${graft.core.Scratch.dir(s"graft-scale-flex$k")}/flex"
      val flex = new graft.streaming.FieldedPostingsIndex(spark, flexRoot,
        Seq("title", "text"))
      flex.processBatch(docs.withColumn("title",
        when(pmod(col("doc_id"), lit(11)) === 0, "zebra guide")
          .otherwise("plain guide")), 0L)
      val tBmfServe = timeMin(reps) {
        flex.bm25fServe(Seq("title" -> 3L, "text" -> 1L), Seq("spark", "zebra"))
          .queryExecution.toRdd.count()
      }

      // q247 core: anchor-count partial for a FIXED batch against the ×k
      // index — additive-monoid append, O(batch) → FLAT
      val acRoot = s"${graft.core.Scratch.dir(s"graft-scale-ac$k")}/a"
      val ac = new graft.streaming.AnchorCountIndex(spark, acRoot)
      ac.processBatch(docs, 0L)
      var ab = 0
      val tAnchor = timeMin(reps) {
        ac.processBatch(fixedDocBatch, { ab += 1; 1000L + ab })
      }

      // q276 core: one FIXED doc batch through the collocation count
      // indexes (unigram + bigram monoid partials) seeded with the ×k
      // corpus — O(batch) counting + bounded appends → FLAT
      val coRoot = graft.core.Scratch.dir(s"graft-scale-co$k")
      val coUni = new graft.streaming.AnchorCountIndex(spark, s"$coRoot/uni",
        build = Curation.termCounts(_), keyCols = Seq("w"))
      val coBi = new graft.streaming.AnchorCountIndex(spark, s"$coRoot/bi",
        build = Curation.bigramCounts(_), keyCols = Seq("w1", "w2"))
      coUni.processBatch(docs, 0L); coBi.processBatch(docs, 0L)
      var cb = 0
      val tColloc = timeMin(reps) {
        cb += 1
        coUni.processBatch(fixedDocBatch, 1000L + cb)
        coBi.processBatch(fixedDocBatch, 1000L + cb)
      }

      // q280 core: KN bigram train on the ×k corpus + score a FIXED 200-doc
      // batch — dominated by the one training transition-count pass (the
      // rotated copies grow the vocab ×k, so ctx/bw stay corpus-bounded
      // aggregates) → LINEAR
      val tKn = timeMin(reps) {
        graft.scale.KneserNey.knBigramScore(docs, fixedDocBatch)
          .queryExecution.toRdd.count()
      }

      // q279 core: WordPiece train + serve over the ×k corpus — one
      // word-count shuffle, driver loop over the FIXED K-bounded cut, the
      // greedy kernel once per distinct word (×k under rotation) → LINEAR
      val tWp = timeMin(reps) {
        graft.scale.Wordpiece.wordpieceSegmentWords(docs)
          .queryExecution.toRdd.count()
      }

      // q282 core: a FIXED 50-anchor panel mined against the ×k corpus —
      // one corpus scan with the margin predicate scan-side, bounded heaps
      // after → LINEAR
      val hnLabels = baseEmb.filter(col("vec_id") % 40 === 0)
        .select(col("vec_id").as("qid"), (col("vec_id") + 1).as("pos_id"))
      val tHardNeg = timeMin(reps) {
        graft.scale.Similarity.semiHardNegatives(emb, hnLabels, 3, 9, 10)
          .queryExecution.toRdd.count()
      }
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => rddsBefore(id) }
        .values.foreach(_.unpersist(blocking = true))

      System.err.println(s"[scale] x$k docs=$nDocs vecs=$nVecs dedup=$tDedup lsh=$tLsh " +
        s"contain=$tContain append=$tAppend stream=$tStream extract=$tExtract " +
        s"nnd=$tNnd del=$tDelete compact=$tCompact pqdel=$tPqDelete tri=$tTri " +
        s"phash=$tPhashPipe phibatch=$tPhiBatch navdel=$tNavDel prdel=$tPrDel " +
        s"phidel=$tPhiDel video=$tVideoPipe audio=$tAudioPipe")
      (k, nDocs, nVecs, Map(
        "exact_dedup" -> tDedup, "lsh_neardup" -> tLsh, "containment" -> tContain,
        "ann_append" -> tAppend, "streaming_neardup_batch" -> tStream,
        "extract_text" -> tExtract, "nndescent_build" -> tNnd,
        "ivf_delete" -> tDelete, "ivf_delete_compact" -> tCompact,
        "ivfpq_delete" -> tPqDelete, "triangle_batch" -> tTri,
        "phash_pipeline" -> tPhashPipe, "phash_stream_batch" -> tPhiBatch,
        "nav_delete" -> tNavDel, "pagerank_delete" -> tPrDel,
        "phash_delete" -> tPhiDel, "video_pipeline" -> tVideoPipe,
        "audio_pipeline" -> tAudioPipe,
        "budget_mix" -> tBudget, "ppl_buckets" -> tPpl,
        "suffix_spans" -> tSuffix, "anchor_stream_batch" -> tAnchor,
        "winnow_fp" -> tWinnow, "winnow_guard_batch" -> tWinnowGuard,
        "term_drift" -> tDrift, "zipf_profile" -> tZipf,
        "textrank" -> tTextRank, "bm25_serve" -> tBmServe,
        "kn_score" -> tKn, "wordpiece_segment" -> tWp,
        "hard_negatives" -> tHardNeg,
        "eval_scrub" -> tScrub, "dup_token_profile" -> tDupProfile,
        "collocation_stream" -> tColloc, "bm25f_serve" -> tBmfServe,
        "webp_lossy" -> tWebpLossy, "avc1_audio_vote" -> tAvcVote,
        "nav_filtered" -> tNavFiltered,
        "color_neardup" -> tColorNeardup, "warc_scan" -> tWarcScan,
        "avc1_neardup" -> tAvcNeardup))
    }

    val expectations = Map(
      "exact_dedup" -> ("linear", 16.0), "lsh_neardup" -> ("linear", 16.0),
      "containment" -> ("linear", 16.0),
      "ann_append" -> ("flat", 3.0), "streaming_neardup_batch" -> ("flat", 3.0),
      "extract_text" -> ("linear", 16.0), "nndescent_build" -> ("linear", 16.0),
      "ivf_delete" -> ("flat", 3.0), "ivf_delete_compact" -> ("linear", 16.0),
      "ivfpq_delete" -> ("flat", 3.0), "triangle_batch" -> ("flat", 4.0),
      "phash_pipeline" -> ("linear", 16.0), "phash_stream_batch" -> ("flat", 3.0),
      "nav_delete" -> ("flat", 3.0), "pagerank_delete" -> ("flat", 4.0),
      "phash_delete" -> ("flat", 3.0), "video_pipeline" -> ("linear", 16.0),
      "audio_pipeline" -> ("linear", 16.0),
      "budget_mix" -> ("linear", 16.0), "ppl_buckets" -> ("linear", 16.0),
      "suffix_spans" -> ("linear", 16.0), "anchor_stream_batch" -> ("flat", 3.0),
      "winnow_fp" -> ("linear", 16.0), "winnow_guard_batch" -> ("flat", 3.0),
      "term_drift" -> ("linear", 16.0), "zipf_profile" -> ("linear", 16.0),
      "textrank" -> ("linear", 16.0), "bm25_serve" -> ("flat", 3.0),
      "kn_score" -> ("linear", 16.0), "wordpiece_segment" -> ("linear", 16.0),
      "hard_negatives" -> ("linear", 16.0),
      "eval_scrub" -> ("linear", 16.0), "dup_token_profile" -> ("linear", 16.0),
      "collocation_stream" -> ("flat", 3.0), "bm25f_serve" -> ("flat", 3.0),
      // r18 additions (r17 verdict item 5 — the three unpinned families)
      "webp_lossy" -> ("linear", 16.0), "avc1_audio_vote" -> ("flat", 3.0),
      "nav_filtered" -> ("linear", 16.0),
      // r19 additions (r18 verdict item 6 — the two unpinned r18 families)
      "color_neardup" -> ("linear", 16.0), "warc_scan" -> ("linear", 16.0),
      "avc1_neardup" -> ("linear", 16.0))
    def f(v: Double) = f"$v%.3f"
    val byQ = results.head._4.keys.toSeq.sorted.map { q =>
      val times = results.map { case (k, _, _, m) => k -> m(q) }
      val ratio = times.last._2 / math.max(times.head._2, 1e-9)
      val (exp, bound) = expectations(q)
      val series = times.map { case (k, t) => s""""x$k":${f(t)}""" }.mkString(",")
      s""""$q":{$series,"ratio_x8":${f(ratio)},"expect":"$exp","bound":$bound,"pass":${ratio <= bound}}"""
    }.mkString(",")
    val sizes = results.map { case (k, d, v, _) => s""""x$k":{"docs":$d,"vecs":$v}""" }.mkString(",")
    val allPass = results.head._4.keys.forall { q =>
      val times = results.map(_._4(q))
      times.last / math.max(times.head, 1e-9) <= expectations(q)._2
    }
    val json =
      s"""{"artifact":"scale_slope","sf_dir":"$sfDir","scales":{$sizes},"workloads":{$byQ},"all_pass":$allPass}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
    if (!allPass) sys.exit(3)
  }
}
