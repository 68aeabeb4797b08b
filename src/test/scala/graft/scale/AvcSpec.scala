package graft.scale

import org.scalatest.funsuite.AnyFunSuite

/** Laws for the from-scratch H.264 I-frame codec.
  *
  * Certification layers (strongest available without a system H.264 —
  * see the [[Avc]] scaladoc):
  *   1. structural pinning of the transcribed VLC tables (prefix-freeness
  *      by construction, Kraft completeness exactly where the published
  *      code is complete),
  *   2. exact-inverse transform/scaling laws,
  *   3. CAVLC write/read roundtrip over adversarial coefficient vectors,
  *   4. full encode -> decode roundtrip with QP-dependent error bounds,
  *   5. fail-closed laws (CABAC, P slices, truncation, bad dimensions),
  *   6. the independent Python twin (tools/avc1_crosscheck.py) — run by
  *      the crosscheck harness, not this suite.
  */
class AvcSpec extends AnyFunSuite {

  private def md5b(tag: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(tag.getBytes("UTF-8"))(0).toInt & 0xff
  }

  // ---- 1. table structure ------------------------------------------

  private def kraft(v: Avc.Vlc): Double =
    v.codes.map { case (s, _) => math.pow(2.0, -s.length) }.sum

  private def prefixFree(v: Avc.Vlc): Boolean = {
    val cs = v.codes.map(_._1)
    !cs.exists(a => cs.exists(b => a != b && b.startsWith(a)))
  }

  test("coeff_token tables: prefix-free, Kraft sums of the published code") {
    for (t <- Seq(Avc.CoeffTokenNc0, Avc.CoeffTokenNc2, Avc.CoeffTokenNc4,
        Avc.CoeffTokenChromaDc)) {
      assert(prefixFree(t))
      assert(t.codes.size == (if (t eq Avc.CoeffTokenChromaDc) 14 else 62))
    }
    // the three VLC columns are one codeword short of complete (the
    // all-zeros pattern of the maximum length is unused); chroma DC is
    // complete — these values pin the transcription
    assert(math.abs(kraft(Avc.CoeffTokenNc0) - 32767.0 / 32768) < 1e-12)
    assert(math.abs(kraft(Avc.CoeffTokenNc2) - 8191.0 / 8192) < 1e-12)
    assert(math.abs(kraft(Avc.CoeffTokenNc4) - 1023.0 / 1024) < 1e-12)
    assert(math.abs(kraft(Avc.CoeffTokenChromaDc) - 1.0) < 1e-12)
  }

  test("total_zeros tables: complete prefix codes (except the tc=1 row)") {
    Avc.TotalZeros4x4.zipWithIndex.foreach { case (t, i) =>
      assert(prefixFree(t), s"tc=${i + 1}")
      assert(t.codes.size == 16 - i, s"tc=${i + 1}")
      val expect = if (i == 0) 511.0 / 512 else 1.0
      assert(math.abs(kraft(t) - expect) < 1e-12, s"tc=${i + 1}")
    }
    Avc.TotalZerosChromaDc.zipWithIndex.foreach { case (t, i) =>
      assert(prefixFree(t) && math.abs(kraft(t) - 1.0) < 1e-12, s"cdc tc=${i + 1}")
    }
  }

  test("run_before table: complete prefix codes (except the zl>6 row)") {
    Avc.RunBefore.zipWithIndex.foreach { case (t, i) =>
      assert(prefixFree(t), s"zl=${i + 1}")
      val expect = if (i == 6) 2047.0 / 2048 else 1.0
      assert(math.abs(kraft(t) - expect) < 1e-12, s"zl=${i + 1}")
    }
  }

  test("deblock tables have the published shape") {
    assert(Avc.AlphaTable.length == 52 && Avc.BetaTable.length == 52)
    assert(Avc.AlphaTable.take(16).forall(_ == 0))
    assert(Avc.AlphaTable(51) == 255 && Avc.BetaTable(51) == 18)
    assert(Avc.Tc0Table.forall(_.length == 52))
    assert(Avc.Tc0Table(2)(51) == 23) // bS=3 tail — the row I-frames use
  }

  // ---- 2. bit io + exp-golomb ---------------------------------------

  test("ue/se write/read roundtrip") {
    val w = new Avc.BitWriter
    val ues = Seq(0, 1, 2, 3, 7, 8, 255, 65535)
    val ses = Seq(0, 1, -1, 2, -2, 25, -26, 1000, -1000)
    ues.foreach(w.ue)
    ses.foreach(w.se)
    w.rbspTrailing()
    val r = new Avc.BitReader(w.toBytes)
    ues.foreach(v => assert(r.ue() == v))
    ses.foreach(v => assert(r.se() == v))
  }

  test("emulation prevention roundtrips every dangerous pattern") {
    val payloads = Seq(
      Array[Byte](0, 0, 0, 0, 0, 0),
      Array[Byte](0, 0, 1, 2, 3),
      Array[Byte](0, 0, 2, 0, 0, 3, 0, 0, 0),
      Array.tabulate(64)(i => (i % 4).toByte))
    payloads.foreach { p =>
      val guarded = Avc.antiEmulate(p)
      // no forbidden 00 00 00 / 00 00 01 / 00 00 02 left (00 00 03 IS
      // the escape and is allowed)
      (0 until guarded.length - 2).foreach { i =>
        assert(!(guarded(i) == 0 && guarded(i + 1) == 0 &&
          (guarded(i + 2) & 0xff) <= 2), s"at $i")
      }
      assert(Avc.rbsp(guarded, 0, guarded.length).toSeq == p.toSeq)
    }
  }

  // ---- 3. transforms -------------------------------------------------

  test("itrans of the exact-inverse dequant reproduces flat blocks") {
    // flat residual x: W00 = 16x, lossless level path (class 0)
    for (x <- Seq(-64, -3, 1, 17, 80)) {
      val w = Avc.ftrans4x4(Array.fill(16)(x))
      assert(w(0) == 16 * x && w.drop(1).forall(_ == 0))
      // qp where 2^(qp/6) divides: qp=24 => step V(0)=13*16... use the
      // derived relation instead: dequant(level) with level from the
      // documented lossless formula must reconstruct x within 1
      val qp = 12
      val lvl = math.round(16.0 * x * 64 / (16 * 10 * (1 << 2))).toInt // V(12%6=0)=10? qp=12: qp%6=0 -> V=10, 2^(12/6)=4
      val d = new Array[Int](16)
      d(0) = Avc.dequant(lvl, qp, 0, 0)
      val res = Avc.itrans4x4(d)
      assert(res.forall(v => math.abs(v - x) <= 1), s"x=$x got ${res.toSeq}")
    }
  }

  test("chroma QP mapping matches the published table") {
    assert(Avc.chromaQp(29, 0) == 29)
    assert(Avc.chromaQp(30, 0) == 29)
    assert(Avc.chromaQp(39, 0) == 35)
    assert(Avc.chromaQp(51, 0) == 39)
    assert(Avc.chromaQp(51, 12) == 39)
    assert(Avc.chromaQp(0, -7) == 0)
  }

  // ---- 4. CAVLC residual roundtrip -----------------------------------

  private def roundtripBlock(coeffs: Array[Int], nC: Int): Unit = {
    val w = new Avc.BitWriter
    Avc.writeResidualBlock(w, nC, coeffs)
    w.rbspTrailing()
    val r = new Avc.BitReader(w.toBytes)
    val (got, tc) = Avc.readResidualBlock(r, nC, coeffs.length)
    assert(got.toSeq == coeffs.toSeq, s"nC=$nC in=${coeffs.toSeq}")
    assert(tc == coeffs.count(_ != 0))
  }

  test("CAVLC residual write/read roundtrip: adversarial vectors") {
    val cases = Seq(
      Array.fill(16)(0),
      Array(5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
      Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, -1),
      Array(1, -1, 1, -1, 1, -1, 1, -1, 1, -1, 1, -1, 1, -1, 1, -1),
      Array(-3000, 2000, -900, 300, -60, 12, -4, 2, -1, 1, 0, 0, 0, 0, 0, 1),
      Array(7, 0, -2, 0, 0, 3, 0, 0, 0, -1, 0, 0, 0, 0, 0, 1),
      Array.tabulate(16)(i => if (i % 3 == 0) i - 8 else 0))
    for (c <- cases; nC <- Seq(0, 1, 2, 3, 4, 7, 8, 20)) roundtripBlock(c, nC)
    // AC shape (15) and chroma DC shape (4, nC = -1)
    roundtripBlock(Array(0, 4, 0, -1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, -1), 2)
    roundtripBlock(Array.fill(15)(0), 0)
    for (c <- Seq(Array(0, 0, 0, 0), Array(3, 0, 0, -1), Array(1, 1, 1, 1),
        Array(-120, 3, 0, 1))) roundtripBlock(c, -1)
  }

  test("CAVLC residual roundtrip: pseudo-random sweep") {
    var seed = 12345L
    def rnd(n: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) % n).toInt
    }
    for (trial <- 0 until 400) {
      val size = Seq(16, 15, 4)(trial % 3)
      val nC = if (size == 4) -1 else Seq(0, 1, 2, 3, 4, 5, 8, 17)(trial % 8)
      val c = new Array[Int](size)
      val density = 1 + rnd(size)
      for (_ <- 0 until density) {
        val mag = Seq(1, 1, 2, 3, 9, 40, 700, 5000)(rnd(8))
        c(rnd(size)) = if (rnd(2) == 0) mag else -mag
      }
      roundtripBlock(c, nC)
    }
  }

  // ---- 5. SPS/PPS roundtrip ------------------------------------------

  test("encoder SPS/PPS parse back to the decoded subset") {
    val bits = Avc.encodeGrayIdr(Array.fill(32 * 32)(100.toByte), 32, 32, 10)
    val nals = Avc.annexBNals(bits).map { case (s, e) =>
      java.util.Arrays.copyOfRange(bits, s, e)
    }
    assert(nals.map(n => n(0) & 0x1f).toSeq == Seq(7, 8, 5))
    val sps = Avc.parseSps(new Avc.BitReader(Avc.rbsp(nals(0), 1, nals(0).length)))
    assert(sps.exists(s => s.width == 32 && s.height == 32 && s.profileIdc == 66))
    val pps = Avc.parsePps(new Avc.BitReader(Avc.rbsp(nals(1), 1, nals(1).length)))
    assert(pps.exists(p => !p.cabac && p.picInitQp == 10 && p.deblockCtrl))
  }

  // ---- 6. full roundtrip ----------------------------------------------

  private def noise(seed: Long, w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(i => md5b(s"${seed}_$i").toByte)

  private def maxErr(a: Array[Byte], b: Array[Byte]): Int =
    a.zip(b).map { case (x, y) => math.abs((x & 0xff) - (y & 0xff)) }.max

  test("encode/decode roundtrip: near-lossless at qp 0 without deblocking") {
    for ((w, h) <- Seq((64, 64), (48, 32), (16, 16))) {
      val px = noise(w.toLong * h, w, h)
      val bits = Avc.encodeGrayIdr(px, w, h, 0, deblock = false)
      val out = Avc.decodeAnnexBGray(bits)
      assert(out.isDefined, s"${w}x$h decode failed")
      val (dw, dh, gray) = out.get
      assert(dw == w && dh == h)
      assert(maxErr(px, gray) <= 2, s"${w}x$h maxErr=${maxErr(px, gray)}")
    }
  }

  test("encode/decode roundtrip: bounded error across the QP span, deblock on") {
    val px = noise(99, 64, 64)
    for ((qp, bound) <- Seq((0, 6), (8, 8), (16, 12), (24, 24), (32, 48))) {
      val bits = Avc.encodeGrayIdr(px, 64, 64, qp)
      val out = Avc.decodeAnnexBGray(bits)
      assert(out.isDefined, s"qp=$qp decode failed")
      assert(maxErr(px, out.get._3) <= bound,
        s"qp=$qp maxErr=${maxErr(px, out.get._3)}")
    }
  }

  test("roundtrip with odd (cropped) dimensions and real chroma") {
    val (w, h) = (50, 34)
    val px = noise(5034, w, h)
    val pu = Array.tabulate(25 * 17)(i => (i % 200).toByte)
    val pv = Array.tabulate(25 * 17)(i => (255 - i % 200).toByte)
    val bits = Avc.encodeGrayIdr(px, w, h, 4, pu, pv)
    val out = Avc.decodeAnnexBGray(bits)
    assert(out.exists(o => o._1 == w && o._2 == h))
    assert(maxErr(px, out.get._3) <= 6)
  }

  test("multi-slice pictures decode identically to single-slice sources") {
    val px = noise(77, 64, 64)
    val one = Avc.decodeAnnexBGray(Avc.encodeGrayIdr(px, 64, 64, 6)).get._3
    val four = Avc.decodeAnnexBGray(
      Avc.encodeGrayIdr(px, 64, 64, 6, mbRowsPerSlice = 1)).get._3
    // different prediction contexts at slice boundaries => not identical
    // bitstreams, but both must land within the qp-6 error budget
    assert(maxErr(px, one) <= 8 && maxErr(px, four) <= 8)
  }

  test("AVCC sample framing decodes (the avc1-in-MP4 shape)") {
    val px = noise(11, 32, 32)
    val bits = Avc.encodeGrayIdr(px, 32, 32, 4)
    val nals = Avc.annexBNals(bits).map { case (s, e) =>
      java.util.Arrays.copyOfRange(bits, s, e)
    }
    val sps = nals.filter(n => (n(0) & 0x1f) == 7)
    val pps = nals.filter(n => (n(0) & 0x1f) == 8)
    val idr = nals.filter(n => (n(0) & 0x1f) == 5)
    val sample = idr.flatMap { n =>
      Array[Byte](((n.length >> 24) & 0xff).toByte, ((n.length >> 16) & 0xff).toByte,
        ((n.length >> 8) & 0xff).toByte, (n.length & 0xff).toByte) ++ n
    }.toArray
    val out = Avc.decodeSampleGray(sps, pps, 4, sample)
    assert(out.exists(o => o._1 == 32 && o._2 == 32))
    assert(out.get._3.toSeq == Avc.decodeAnnexBGray(bits).get._3.toSeq)
  }

  // ---- 7. fail-closed laws --------------------------------------------

  // ---- CABAC -------------------------------------------------------

  test("CABAC engine: encode/decode roundtrip over adversarial bin sequences") {
    // deterministic pseudo-random mix of context decisions, bypass bins,
    // and terminate(0) probes, closed by terminate(1) + flush — the
    // decoder must reproduce every bin with an identically-evolving
    // context bank (fresh init, same QP)
    for (seed <- 1 to 8; qp <- Seq(0, 6, 26, 51)) {
      def rnd(i: Int): Int = md5b(s"cab_${seed}_$i")
      val n = 200 + rnd(0)
      val kinds = Array.tabulate(n)(i => rnd(i) % 10) // 0-5 decision, 6-8 bypass, 9 terminate0
      val ctxs = Array.tabulate(n)(i => Seq(3, 60, 68, 85, 105, 170, 230)(rnd(i + 7000) % 7) + rnd(i + 9000) % 3)
      val bins = Array.tabulate(n)(i => rnd(i + 5000) & 1)
      val w = new Avc.BitWriter
      val enc = new Cabac.Encoder(w, new Cabac.Contexts(qp))
      var i = 0
      while (i < n) {
        kinds(i) match {
          case k if k <= 5 => enc.decision(ctxs(i), bins(i))
          case k if k <= 8 => enc.bypass(bins(i))
          case _ => enc.terminate(0)
        }
        i += 1
      }
      enc.terminate(1)
      w.alignZero()
      val r = new Avc.BitReader(w.toBytes)
      val dec = new Cabac.Decoder(r, new Cabac.Contexts(qp))
      i = 0
      while (i < n) {
        val got = kinds(i) match {
          case k if k <= 5 => dec.decision(ctxs(i))
          case k if k <= 8 => dec.bypass()
          case _ => dec.terminate()
        }
        val want = if (kinds(i) == 9) 0 else bins(i)
        assert(got == want, s"seed=$seed qp=$qp bin $i kind=${kinds(i)}")
        i += 1
      }
      assert(dec.terminate() == 1, s"seed=$seed qp=$qp final terminate")
    }
  }

  test("CABAC: level magnitudes across the UEG0 escape roundtrip in-picture") {
    // a high-contrast 16x16 at QP 0 drives coeff_abs_level past the TU
    // cutoff into the EG0 bypass suffix on both encode and decode
    val px = Array.tabulate(16 * 16)(i => if ((i / 16 + i % 16) % 2 == 0) 0 else 255).map(_.toByte)
    val cav = Avc.decodeAnnexBGray(Avc.encodeGrayIdr(px, 16, 16, 0, allowPcm = false))
    val cab = Avc.decodeAnnexBGray(Avc.encodeGrayIdr(px, 16, 16, 0, cabac = true))
    assert(cav.isDefined && cab.isDefined)
    assert(cav.get._3.toSeq == cab.get._3.toSeq)
  }

  test("CABAC encode decodes pixel-identically to its CAVLC twin") {
    // the entropy layer carries the SAME quantized coefficients and
    // prediction decisions, so the reconstruction must match byte for
    // byte (PCM disabled on both sides: it is outside the CABAC subset)
    for ((wd, ht, qp, rows) <- Seq((64, 64, 6, 0), (64, 64, 28, 0),
        (48, 32, 10, 0), (64, 64, 6, 2), (60, 44, 16, 0))) {
      val px = Array.tabulate(wd * ht)(i => md5b(s"cabpix_${wd}_${ht}_$i").toByte)
      val cav = Avc.decodeAnnexBGray(
        Avc.encodeGrayIdr(px, wd, ht, qp, mbRowsPerSlice = rows, allowPcm = false))
      val cab = Avc.decodeAnnexBGray(
        Avc.encodeGrayIdr(px, wd, ht, qp, mbRowsPerSlice = rows, cabac = true))
      assert(cav.isDefined, s"$wd x $ht qp=$qp rows=$rows CAVLC")
      assert(cab.isDefined, s"$wd x $ht qp=$qp rows=$rows CABAC")
      assert(cav.get._1 == cab.get._1 && cav.get._2 == cab.get._2)
      assert(cav.get._3.toSeq == cab.get._3.toSeq, s"$wd x $ht qp=$qp rows=$rows")
    }
  }

  test("CABAC: chroma content rides the same law through the mp4 sample path") {
    val px = Array.tabulate(64 * 64)(i => md5b(s"cabc_$i").toByte)
    val pu = Array.tabulate(32 * 32)(i => md5b(s"cabu_$i").toByte)
    val pv = Array.tabulate(32 * 32)(i => md5b(s"cabv_$i").toByte)
    val cav = Avc.encodeGrayIdr(px, 64, 64, 8, pu, pv, allowPcm = false)
    val cab = Avc.encodeGrayIdr(px, 64, 64, 8, pu, pv, cabac = true)
    val (spA, ppA, idrA) = Avc.splitAnnexB(cav)
    val (spB, ppB, idrB) = Avc.splitAnnexB(cab)
    val a = Avc.decodeSampleGray(spA, ppA, 4, Avc.toAvccSample(idrA))
    val b = Avc.decodeSampleGray(spB, ppB, 4, Avc.toAvccSample(idrB))
    assert(a.isDefined && b.isDefined)
    assert(a.get._3.toSeq == b.get._3.toSeq)
  }

  test("CABAC fail-closed: truncation and partial pictures") {
    val px = Array.tabulate(64 * 64)(i => md5b(s"cabf_$i").toByte)
    val bits = Avc.encodeGrayIdr(px, 64, 64, 8, cabac = true)
    assert(Avc.decodeAnnexBGray(bits).isDefined)
    val nals = Avc.annexBNals(bits).map { case (s, e) =>
      java.util.Arrays.copyOfRange(bits, s, e)
    }
    // truncated CABAC slice: the engine reads zeros past the end and the
    // picture never completes -> None, no crash
    assert(Avc.decodeIdrNals(Seq(nals(0), nals(1),
      java.util.Arrays.copyOf(nals(2), nals(2).length / 2))).isEmpty)
    // multi-slice picture missing its second slice stays partial
    val two = Avc.encodeGrayIdr(px, 64, 64, 8, mbRowsPerSlice = 2, cabac = true)
    val tn = Avc.annexBNals(two).map { case (s, e) =>
      java.util.Arrays.copyOfRange(two, s, e)
    }
    assert(tn.count(n => (n(0) & 0x1f) == 5) == 2)
    assert(Avc.decodeIdrNals(tn.dropRight(1)).isEmpty)
    assert(Avc.decodeIdrNals(tn).isDefined)
  }

  test("fail closed: CABAC, P slices, truncation, garbage") {
    val px = noise(1, 32, 32)
    val bits = Avc.encodeGrayIdr(px, 32, 32, 8)
    // flip entropy_coding_mode in the PPS: re-build a CABAC PPS
    val w = new Avc.BitWriter
    w.ue(0); w.ue(0); w.u1(1) // cabac
    w.u1(0); w.ue(0); w.ue(0); w.ue(0); w.u1(0); w.u(2, 0)
    w.se(8 - 26); w.se(0); w.se(0); w.u1(0); w.u1(0); w.u1(0)
    w.rbspTrailing()
    assert(Avc.parsePps(new Avc.BitReader(w.toBytes)).exists(_.cabac))
    val nals = Avc.annexBNals(bits).map { case (s, e) =>
      java.util.Arrays.copyOfRange(bits, s, e)
    }
    val cabacPps = Array[Byte](0x68) ++ Avc.antiEmulate(w.toBytes)
    assert(Avc.decodeIdrNals(Seq(nals(0), cabacPps, nals(2))).isEmpty)
    // non-IDR slice NAL type: refuse (P/B content)
    val pNal = nals(2).clone()
    pNal(0) = ((pNal(0) & 0xe0) | 1).toByte
    assert(Avc.decodeIdrNals(Seq(nals(0), nals(1), pNal)).isEmpty)
    // truncated slice
    assert(Avc.decodeIdrNals(Seq(nals(0), nals(1),
      java.util.Arrays.copyOf(nals(2), nals(2).length / 2))).isEmpty)
    // garbage
    assert(Avc.decodeAnnexBGray(Array.fill[Byte](64)(0x5a)).isEmpty)
    assert(Avc.decodeAnnexBGray(Array.empty[Byte]).isEmpty)
  }

  test("crop comes from the SPS the slice selected, not the first config SPS") {
    // avcC sets may carry several SPS; the decoder keys them by sps_id and
    // the slice's PPS picks one. A foreign first SPS with a big top crop
    // must not steer the crop window (pre-fix: frameGray read past the
    // plane with the first SPS's offsets).
    val px = noise(3, 64, 64)
    val bits = Avc.encodeGrayIdr(px, 64, 64, 6)
    val (sp, pp, idr) = Avc.splitAnnexB(bits)
    val sample = Avc.toAvccSample(idr)
    val base = Avc.decodeSampleGray(sp, pp, 4, sample)
    assert(base.isDefined)
    // hand-written SPS, same sps_id 0, geometry 64x40 via cropT=12
    val w = new Avc.BitWriter
    w.u(8, 66); w.u(8, 0); w.u(8, 30) // profile/constraints/level
    w.ue(0) // sps_id 0 (collides with the real one; last writer wins)
    w.ue(0); w.ue(0); w.ue(0) // log2_max_frame_num, poc_type 0, log2_max_poc
    w.ue(0); w.u1(0) // max_num_ref_frames, gaps flag
    w.ue(3); w.ue(3) // 4x4 MBs
    w.u1(1); w.u1(0) // frame_mbs_only, direct_8x8
    w.u1(1); w.ue(0); w.ue(0); w.ue(12); w.ue(0) // crop: top 12 -> 64x40
    w.rbspTrailing()
    val fakeSps = Array[Byte](0x67) ++ Avc.antiEmulate(w.toBytes)
    assert(Avc.parseSps(new Avc.BitReader(Avc.rbsp(fakeSps, 1, fakeSps.length)))
      .exists(s => s.cropT == 12 && s.height == 40))
    // fake first, real second: the map keeps the real one (same id), and
    // the crop must follow it — identical pixels, no out-of-bounds read
    val got = Avc.decodeSampleGray(Seq(fakeSps) ++ sp, pp, 4, sample)
    assert(got.isDefined)
    assert(got.get._1 == base.get._1 && got.get._2 == base.get._2)
    assert(got.get._3.toSeq == base.get._3.toSeq)
  }

  test("fail closed: missing slices leave the picture partial") {
    val px = noise(2, 64, 64)
    val bits = Avc.encodeGrayIdr(px, 64, 64, 8, mbRowsPerSlice = 2)
    val nals = Avc.annexBNals(bits).map { case (s, e) =>
      java.util.Arrays.copyOfRange(bits, s, e)
    }
    assert(nals.count(n => (n(0) & 0x1f) == 5) == 2)
    assert(Avc.decodeIdrNals(nals.dropRight(1)).isEmpty)
    assert(Avc.decodeIdrNals(nals).isDefined)
  }

  test("I_PCM macroblocks roundtrip exactly (every 23rd MB)") {
    // 8x3 MBs = 24 > 23: MB 7 is PCM by the encoder's policy
    val (w, h) = (128, 48)
    val px = noise(4242, w, h)
    val bits = Avc.encodeGrayIdr(px, w, h, 0, deblock = false)
    val out = Avc.decodeAnnexBGray(bits)
    assert(out.isDefined)
    // the PCM MB (mx=7, my=0) must be EXACT
    val gray = out.get._3
    for (yy <- 0 until 16; xx <- 0 until 16) {
      val p = yy * w + 7 * 16 + xx
      assert(gray(p) == px(p), s"PCM pixel ($xx,$yy)")
    }
  }
}
