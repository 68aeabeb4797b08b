package graft

import graft.scale.{Multimodal, Vp8}

/** Fixture side of tools/vp8_crosscheck.py — the external certification of
  * the [[graft.scale.Vp8]] codec against the system libwebp (the reference
  * VP8 implementation). Two modes:
  *
  *   `gen <dir>`: encode a grid of synthetic gray images (flat, gradients,
  *   md5 noise, odd dimensions, a span of quantizer indices) with the
  *   repo's encoder and decode each back with the repo's decoder. Writes
  *   `<name>.webp` (bitstream), `<name>.src` (original pixels), and
  *   `<name>.gray` (repo-decoded luma) for the Python side to compare
  *   against libwebp's decode of the same bitstream — byte-identical luma
  *   required.
  *
  *   `dec <dir>`: decode every `r_*.webp` the Python side produced with
  *   the REAL libwebp encoder (loop-filtered streams included — the
  *   deblocker is in the proven subset)
  *   through the repo decoder, writing `r_*.gray`, or `r_*.failclosed` if
  *   the stream is outside the proven subset. The Python side then
  *   requires byte equality against libwebp's own decode — the reverse
  *   direction of the same certification.
  */
object Vp8Crosscheck {

  private def md5b(tag: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(tag.getBytes("UTF-8"))(0).toInt & 0xff
  }

  private def cases: Seq[(String, Int, Int, Array[Byte], Int)] = {
    def noise(seed: Long, w: Int, h: Int): Array[Byte] =
      Array.tabulate(w * h)(i => md5b(s"${seed}_$i").toByte)
    def gradient(w: Int, h: Int): Array[Byte] =
      Array.tabulate(w * h)(i => (((i % w) * 255 / math.max(w - 1, 1) +
        (i / w) * 128 / math.max(h - 1, 1)) % 256).toByte)
    def flat(v: Int, w: Int, h: Int): Array[Byte] =
      Array.fill(w * h)(v.toByte)
    val synth = Multimodal.synthPixels(7L, pert = false) // 64x64 md5 pixels
    Seq(
      ("flat128_q8", 64, 64, flat(128, 64, 64), 8),
      ("flat7_q0", 32, 32, flat(7, 32, 32), 0),
      ("grad_q8", 64, 64, gradient(64, 64), 8),
      ("grad_q40", 64, 64, gradient(64, 64), 40),
      ("grad_q80", 64, 64, gradient(64, 64), 80),
      ("grad_q127", 64, 64, gradient(64, 64), 127),
      ("noise_q8", 64, 64, noise(1, 64, 64), 8),
      ("noise_q0", 64, 64, noise(2, 64, 64), 0),
      ("noise_q60", 64, 64, noise(3, 64, 64), 60),
      ("synth_q8", 64, 64, synth, 8),
      ("odd50x34_q8", 50, 34, noise(4, 50, 34), 8),
      ("tiny4x4_q8", 4, 4, noise(5, 4, 4), 8),
      ("wide130x20_q20", 130, 20, noise(6, 130, 20), 20),
      ("tall16x200_q20", 16, 200, gradient(16, 200), 20))
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("gen")
    val dir = java.nio.file.Paths.get(
      if (args.length > 1) args(1) else "/tmp/vp8check")
    java.nio.file.Files.createDirectories(dir)
    mode match {
      case "gen" =>
        var fails = 0
        cases.foreach { case (name, w, h, px, qi) =>
          val webp = Multimodal.webpEncodeGrayVp8(px, w, h, qi)
          java.nio.file.Files.write(dir.resolve(s"$name.webp"), webp)
          java.nio.file.Files.write(dir.resolve(s"$name.src"), px)
          Multimodal.webpDecodeGray(webp) match {
            case Some((dw, dh, gray)) if dw == w && dh == h =>
              java.nio.file.Files.write(dir.resolve(s"$name.gray"), gray)
              val maxErr = px.indices.map(i =>
                math.abs((px(i) & 0xff) - (gray(i) & 0xff))).max
              println(s"[gen] $name ${w}x$h qi=$qi bytes=${webp.length} maxErr=$maxErr")
            case other =>
              println(s"[gen] $name FAILED: $other")
              fails += 1
          }
        }
        if (fails > 0) { println(s"[gen] $fails failures"); sys.exit(1) }
      case "dec" =>
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(dir).iterator().asScala
          .filter(p => p.getFileName.toString.startsWith("r_") &&
            p.getFileName.toString.endsWith(".webp"))
          .foreach { p =>
            val name = p.getFileName.toString.stripSuffix(".webp")
            val bytes = java.nio.file.Files.readAllBytes(p)
            Multimodal.webpDecodeGray(bytes) match {
              case Some((w, h, gray)) =>
                java.nio.file.Files.write(dir.resolve(s"$name.gray"), gray)
                println(s"[dec] $name ${w}x$h ok")
              case None =>
                java.nio.file.Files.write(dir.resolve(s"$name.failclosed"),
                  Array.empty[Byte])
                println(s"[dec] $name failclosed")
            }
          }
      case "hamming" =>
        // distance profile of the q296 fixture law: lossy re-encode vs the
        // source pixels' hash, across the fixture id range
        val n = if (args.length > 2) args(2).toInt else 700
        var worst8 = 0
        var worst8p = 0
        (0 until n).foreach { id =>
          val base = Multimodal.synthPixels(id.toLong, pert = false)
          val pert = Multimodal.synthPixels(id.toLong, pert = true)
          val h0 = Multimodal.dHash56(base, 64, 64)
          def ham(h: Long) = java.lang.Long.bitCount(h0 ^ h)
          val l8 = Multimodal.webpDecodeGray(
            Multimodal.webpEncodeGrayVp8(base, 64, 64, 8)).get
          val l8p = Multimodal.webpDecodeGray(
            Multimodal.webpEncodeGrayVp8(pert, 64, 64, 8)).get
          worst8 = math.max(worst8, ham(Multimodal.dHash56(l8._3, 64, 64)))
          worst8p = math.max(worst8p, ham(Multimodal.dHash56(l8p._3, 64, 64)))
        }
        println(s"[hamming] n=$n worst qi8=$worst8 worst qi8+pert=$worst8p")
        // frame fixtures (the q302 animated-WebP law): per-frame distances
        var wf = 0
        var wfp = 0
        (0 until n).foreach { id =>
          (0 until 4).foreach { f =>
            val base = Multimodal.synthFramePixels(id.toLong, f, pert = false)
            val h0 = Multimodal.dHash56(base, 64, 64)
            def ham(px: Array[Byte]) =
              java.lang.Long.bitCount(h0 ^ Multimodal.dHash56(px, 64, 64))
            val l = Multimodal.webpDecodeGray(
              Multimodal.webpEncodeGrayVp8(base, 64, 64, 8)).get._3
            wf = math.max(wf, ham(l))
            val lp = Multimodal.webpDecodeGray(Multimodal.webpEncodeGrayVp8(
              Multimodal.synthFramePixels(id.toLong, f, pert = true), 64, 64, 8)).get._3
            wfp = math.max(wfp, ham(lp))
          }
        }
        println(s"[hamming] frames worst qi8=$wf worst qi8+pert=$wfp")
      case other =>
        Console.err.println(s"unknown mode $other (gen|dec|hamming)")
        sys.exit(2)
    }
    val _ = Vp8 // anchor the scaladoc link target
  }
}
