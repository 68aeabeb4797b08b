package graft

import graft.scale.{Avc, Multimodal}

/** Fixture side of tools/avc1_crosscheck.py — the certification harness of
  * the [[graft.scale.Avc]] H.264 I-frame codec.
  *
  * Unlike the VP8 harness, there is no system H.264 implementation in this
  * container to certify against (`ldconfig -p`: HEVC and AV1 only, no
  * libavcodec/x264/openh264). The strongest available substitute is a
  * SECOND, independently written decoder: `tools/avc1_crosscheck.py`
  * re-implements baseline I-frame decode in pure Python from the published
  * spec text and must reproduce this codec's luma plane byte-exactly on
  * every fixture bitstream. Agreement of two independent implementations
  * certifies the algorithmic semantics; the VLC code tables are shared
  * published constants (see the [[graft.scale.Avc]] scaladoc for the
  * precise certification boundary).
  *
  * `gen <dir>`: encode a grid of synthetic images (flat, gradients, md5
  * noise, odd dimensions, a QP span, deblocking on/off, real chroma) with
  * the repo encoder, decode each back with the repo decoder, and write
  * `<name>.264` (Annex-B bitstream), `<name>.src` (source luma) and
  * `<name>.gray` (repo-decoded luma) for the Python side.
  */
object AvcCrosscheck {

  private def md5b(tag: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(tag.getBytes("UTF-8"))(0).toInt & 0xff
  }

  private def cases: Seq[(String, Int, Int, Array[Byte], Int, Boolean, Int, Boolean, Boolean)] = {
    def noise(seed: Long, w: Int, h: Int): Array[Byte] =
      Array.tabulate(w * h)(i => md5b(s"${seed}_$i").toByte)
    def gradient(w: Int, h: Int): Array[Byte] =
      Array.tabulate(w * h)(i => (((i % w) * 255 / math.max(w - 1, 1) +
        (i / w) * 128 / math.max(h - 1, 1)) % 256).toByte)
    def flat(v: Int, w: Int, h: Int): Array[Byte] =
      Array.fill(w * h)(v.toByte)
    val synth = Multimodal.synthPixels(7L, pert = false) // 64x64 md5 pixels
    // (name, w, h, pixels, qp, realChroma, mbRowsPerSlice, deblock, cabac)
    val cav = Seq(
      ("flat128_q8", 64, 64, flat(128, 64, 64), 8, false, 0, true),
      ("flat7_q0", 32, 32, flat(7, 32, 32), 0, false, 0, true),
      ("grad_q8", 64, 64, gradient(64, 64), 8, true, 0, true),
      ("grad_q24", 64, 64, gradient(64, 64), 24, true, 0, true),
      ("grad_q36", 64, 64, gradient(64, 64), 36, true, 0, true),
      ("grad_q48", 64, 64, gradient(64, 64), 48, true, 0, true),
      ("noise_q4", 64, 64, noise(1, 64, 64), 4, true, 0, true),
      ("noise_q0", 64, 64, noise(2, 64, 64), 0, false, 0, true),
      ("noise_q30", 64, 64, noise(3, 64, 64), 30, true, 0, true),
      ("synth_q8", 64, 64, synth, 8, true, 0, true),
      ("odd50x34_q8", 50, 34, noise(4, 50, 34), 8, true, 0, true),
      ("tiny16x16_q8", 16, 16, noise(5, 16, 16), 8, true, 0, true),
      ("wide130x20_q20", 130, 20, noise(6, 130, 20), 20, true, 0, true),
      ("tall16x200_q20", 16, 200, gradient(16, 200), 20, true, 0, true),
      ("mb1x1_q10", 16, 16, gradient(16, 16), 10, false, 0, true),
      // slice-boundary paths: availability gating, per-slice qp chains,
      // and disable_deblocking_filter_idc 2 (slices2 below, via the
      // deblockIdc override) are all twin-certified
      ("slices1_q8", 64, 64, noise(7, 64, 64), 8, true, 1, true),
      ("slices2_q20", 64, 64, gradient(64, 64), 20, true, 2, true),
      ("nodeblock_q10", 64, 64, noise(8, 64, 64), 10, true, 0, false),
      ("slices1_nodeblock_q4", 48, 48, noise(9, 48, 48), 4, true, 1, false))
      .map { case (n, w, h, px, qp, c, r, d) => (n, w, h, px, qp, c, r, d, false) }
    // CABAC twins of the structurally hardest shapes: every syntax element
    // family (mb_type trees, chroma modes, cbp contexts, qp-delta chain,
    // all five residual categories incl. the UEG0 escape at qp 0),
    // multi-slice context re-init, odd crops, deblock idc variants
    val cab = Seq(
      ("cabac_flat128_q8", 64, 64, flat(128, 64, 64), 8, false, 0, true),
      ("cabac_grad_q8", 64, 64, gradient(64, 64), 8, true, 0, true),
      ("cabac_grad_q36", 64, 64, gradient(64, 64), 36, true, 0, true),
      ("cabac_noise_q0", 64, 64, noise(12, 64, 64), 0, true, 0, true),
      ("cabac_noise_q4", 64, 64, noise(11, 64, 64), 4, true, 0, true),
      ("cabac_noise_q30", 64, 64, noise(13, 64, 64), 30, true, 0, true),
      ("cabac_synth_q8", 64, 64, synth, 8, true, 0, true),
      ("cabac_odd50x34_q8", 50, 34, noise(14, 50, 34), 8, true, 0, true),
      ("cabac_wide130x20_q20", 130, 20, noise(16, 130, 20), 20, true, 0, true),
      ("cabac_slices1_q8", 64, 64, noise(17, 64, 64), 8, true, 1, true),
      ("cabac_slices2_q20", 64, 64, gradient(64, 64), 20, true, 2, true),
      ("cabac_nodeblock_q10", 64, 64, noise(18, 64, 64), 10, true, 0, false))
      .map { case (n, w, h, px, qp, c, r, d) => (n, w, h, px, qp, c, r, d, true) }
    cav ++ cab
  }

  /** GOP fixtures (r20, the P-frame lift): multi-AU Annex-B streams —
    * IDR + single-reference P pictures. `.264` concatenates the access
    * units (the twin splits at first_mb_in_slice == 0), `.src`/`.gray`
    * concatenate all frames' source/decoded luma. qp 20-30 entries run
    * the inter deblocking strengths (bS 2/1/0) with real filtering; the
    * multi-slice entry gates MV prediction and deblocking on slices.
    */
  private def gopCases: Seq[(String, Int, Int, Seq[Array[Byte]], Int, Int)] = {
    def noise(seed: Long, w: Int, h: Int): Array[Byte] =
      Array.tabulate(w * h)(i => md5b(s"${seed}_$i").toByte)
    def gradient(w: Int, h: Int): Array[Byte] =
      Array.tabulate(w * h)(i => (((i % w) * 255 / math.max(w - 1, 1) +
        (i / w) * 128 / math.max(h - 1, 1)) % 256).toByte)
    def shifted(px: Array[Byte], w: Int, h: Int, dx: Int, dy: Int): Array[Byte] =
      Array.tabulate(w * h) { i =>
        val x = math.max(0, math.min(w - 1, (i % w) + dx))
        val y = math.max(0, math.min(h - 1, (i / w) + dy))
        px(y * w + x)
      }
    val f0 = noise(21, 64, 64)
    val synthFrames = Array.tabulate(4)(f =>
      Multimodal.synthFramePixels(42L, f, pert = false)).toSeq
    // (name, w, h, frames, qp, mbRowsPerSlice)
    Seq(
      ("gop_synth_q6", 64, 64, synthFrames, 6, 0),
      ("gop_still_q8", 64, 64, Seq(f0, f0, f0), 8, 0),
      ("gop_shift_q6", 64, 64,
        Seq(f0, shifted(f0, 64, 64, 3, 2), shifted(f0, 64, 64, -2, 5)), 6, 0),
      ("gop_gradient_q30", 64, 64,
        Seq(gradient(64, 64), shifted(gradient(64, 64), 64, 64, 1, 0),
          noise(22, 64, 64)), 30, 0),
      ("gop_slices_q20", 64, 64,
        Seq(noise(23, 64, 64), shifted(noise(23, 64, 64), 64, 64, 4, -3),
          noise(24, 64, 64)), 20, 2),
      ("gop_odd50x34_q12", 50, 34,
        Seq(noise(25, 50, 34), shifted(noise(25, 50, 34), 50, 34, 2, 1)), 12, 0),
      ("gop_noise_q0", 64, 64, Seq(noise(26, 64, 64), noise(27, 64, 64)), 0, 0),
      ("gop_long_q10", 48, 48,
        Array.tabulate(6)(k =>
          if (k == 0) noise(28, 48, 48)
          else shifted(noise(28, 48, 48), 48, 48, k, (k * 2) % 5)).toSeq, 10, 0))
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("gen")
    val dir = java.nio.file.Paths.get(
      args.lift(1).getOrElse("/tmp/avc1check"))
    java.nio.file.Files.createDirectories(dir)
    mode match {
      case "gen" =>
        var fails = 0
        cases.foreach { case (name, w, h, px, qp, chroma, rows, deblock, cabac) =>
          // real chroma exercises the chroma DC/AC paths: a shifted copy
          // of the luma is enough to produce nonzero residuals everywhere
          val cw = w / 2
          val ch = h / 2
          val pu = if (!chroma) null
            else Array.tabulate(cw * ch)(i => ((px(
              math.min(h - 1, (i / cw) * 2) * w + math.min(w - 1, (i % cw) * 2)) & 0xff)
              / 2 + 32).toByte)
          val pv = if (!chroma) null
            else Array.tabulate(cw * ch)(i => (255 - (pu(i) & 0xff)).toByte)
          val bits = Avc.encodeGrayIdr(px, w, h, qp, pu, pv, deblock = deblock,
            mbRowsPerSlice = rows,
            deblockIdc = if (name.contains("slices2")) 2 else -1,
            cabac = cabac)
          Avc.decodeAnnexBGray(bits) match {
            case Some((dw, dh, gray)) if dw == w && dh == h =>
              java.nio.file.Files.write(dir.resolve(s"$name.264"), bits)
              java.nio.file.Files.write(dir.resolve(s"$name.src"), px)
              java.nio.file.Files.write(dir.resolve(s"$name.gray"), gray)
              println(s"[avc1check] wrote $name (${bits.length} bytes)")
            case other =>
              fails += 1
              println(s"[avc1check] FAIL $name: repo decode -> $other")
          }
        }
        gopCases.foreach { case (name, w, h, frames, qp, rows) =>
          val aus = Avc.encodeGrayGop(frames, w, h, qp,
            mbRowsPerSlice = rows, seed = name.hashCode & 0xffff)
          val (sps, pps, _) = Avc.splitAnnexB(aus.head)
          val samples = aus.map(a => Avc.toAvccSample(Avc.splitAnnexB(a)._3))
          Avc.decodeSamplesGray(sps, pps, 4, samples) match {
            case Some(decoded)
                if decoded.length == frames.length &&
                  decoded.forall(d => d._1 == w && d._2 == h) =>
              val bits = aus.reduce(_ ++ _)
              java.nio.file.Files.write(dir.resolve(s"$name.264"), bits)
              java.nio.file.Files.write(dir.resolve(s"$name.src"),
                frames.reduce(_ ++ _))
              java.nio.file.Files.write(dir.resolve(s"$name.gray"),
                decoded.map(_._3).reduce(_ ++ _))
              println(s"[avc1check] wrote $name (${bits.length} bytes, " +
                s"${frames.length} frames)")
            case other =>
              fails += 1
              println(s"[avc1check] FAIL $name: repo GOP decode -> " +
                other.map(d => s"${d.length} frames"))
          }
        }
        if (fails > 0) { println(s"[avc1check] $fails FAILURES"); sys.exit(2) }
      case m =>
        println(s"[avc1check] unknown mode $m (only `gen`; the reverse " +
          "direction needs a system H.264 encoder, which this container lacks)")
        sys.exit(2)
    }
  }
}
