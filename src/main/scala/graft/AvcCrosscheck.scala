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
        if (fails > 0) { println(s"[avc1check] $fails FAILURES"); sys.exit(2) }
      case m =>
        println(s"[avc1check] unknown mode $m (only `gen`; the reverse " +
          "direction needs a system H.264 encoder, which this container lacks)")
        sys.exit(2)
    }
  }
}
