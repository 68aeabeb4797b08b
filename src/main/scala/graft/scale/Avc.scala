package graft.scale

/** From-scratch H.264/AVC (ITU-T Rec. H.264 / ISO 14496-10) I-frame codec —
  * the `avc1` lift (r18 verdict "next round" #5): baseline-profile
  * IDR-picture decode so the dominant crawl video codec's keyframes hash
  * into the video near-dup family instead of falling back to the audio
  * envelope, plus a matching encoder that emits spec-valid SPS/PPS/IDR
  * bitstreams for fixtures.
  *
  * Decode subset (everything else returns None — fail closed, measured by
  * the q298/q306 coverage report, never silent):
  *   - BOTH entropy coders: CAVLC (`entropy_coding_mode_flag == 0`) and,
  *     since r20, CABAC (`== 1`, the default for main/high-profile web
  *     video) — the arithmetic engine, I-slice context models, and
  *     binarizations live in [[Cabac]]; see its scaladoc for the
  *     context-init provenance caveat.
  *   - I slices only (IDR pictures); P/B slices fail closed. A crawl
  *     near-dup vote needs keyframes, not full GOP reconstruction.
  *   - 4:2:0, 8-bit, `frame_mbs_only_flag == 1`, one slice group.
  *     Multi-slice pictures are supported (neighbor availability is gated
  *     on slice identity per 8.3).
  *   - Macroblock types I_4x4, I_16x16 (all 24 variants), I_PCM. In CABAC
  *     slices I_PCM stays fail-closed (the engine re-initialization around
  *     raw samples is out of subset; real-web encoders do not emit it).
  *   - The full in-loop deblocking filter (8.7). In an I-only picture the
  *     boundary strength is 4 on macroblock edges and 3 on internal edges,
  *     so only the intra rows of Table 8-17 are carried.
  *
  * CERTIFICATION BOUNDARY (read before trusting): unlike [[Vp8]], which is
  * cross-checked bidirectionally against the system libwebp
  * (`tools/vp8_crosscheck.py`), NO independent H.264 implementation exists
  * in this container — no ffmpeg/x264/openh264/avcodec binary or library
  * (`ldconfig -p` has HEVC and AV1 codecs only). The strongest available
  * certification is implemented instead: `tools/avc1_crosscheck.py` is a
  * SECOND, independently written I-frame decoder (pure Python, written
  * from the published spec text, no shared code) that must reproduce this
  * decoder's luma plane byte-exactly on every fixture bitstream
  * (`graft.AvcCrosscheck`). Agreement certifies the algorithmic semantics
  * — parse flow, intra prediction, scaling, transforms, deblocking. The
  * static VLC code tables (9-5, 9-7/9-8, 9-10) are published constants
  * transcribed from the spec and additionally pinned by structural laws in
  * AvcSpec (prefix-freeness; Kraft completeness where the spec code is
  * complete); a transcription slip that survives BOTH the structural laws
  * and two independent transcriptions remains possible and is documented
  * here rather than hidden.
  *
  * Reference behavior anchor: the reference pipeline (HyeM207/
  * Programmers-DATA) stores media URLs and never decodes video; this
  * engine decodes because 100 TB-scale near-dup curation needs content
  * hashes, not URLs (SURVEY.md "LLM-data-pipeline operators").
  */
object Avc {

  // ------------------------------------------------------------------
  // RBSP extraction / NAL framing
  // ------------------------------------------------------------------

  /** Strip emulation-prevention bytes (00 00 03 -> 00 00) from a NAL
    * payload slice [from, to). Spec 7.4.1.1.
    */
  private[scale] def rbsp(b: Array[Byte], from: Int, to: Int): Array[Byte] = {
    val out = new Array[Byte](to - from)
    var n = 0
    var i = from
    var zeros = 0
    while (i < to) {
      val v = b(i) & 0xff
      if (zeros >= 2 && v == 3) {
        zeros = 0 // emulation-prevention byte: drop
      } else {
        out(n) = b(i); n += 1
        zeros = if (v == 0) zeros + 1 else 0
      }
      i += 1
    }
    java.util.Arrays.copyOf(out, n)
  }

  /** Insert emulation-prevention bytes into a raw RBSP (encoder side). */
  private[scale] def antiEmulate(p: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(p.length + 8)
    var zeros = 0
    var i = 0
    while (i < p.length) {
      val v = p(i) & 0xff
      if (zeros >= 2 && v <= 3) { out.write(3); zeros = 0 }
      out.write(v)
      zeros = if (v == 0) zeros + 1 else 0
      i += 1
    }
    out.toByteArray
  }

  /** Split an Annex-B byte stream (00 00 01 / 00 00 00 01 start codes)
    * into NAL units (header byte included, emulation NOT yet stripped).
    */
  private[scale] def annexBNals(b: Array[Byte]): Seq[(Int, Int)] = {
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i + 3 <= b.length) {
      if (b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1) { starts += i + 3; i += 3 }
      else i += 1
    }
    starts.toSeq.zipAll(starts.toSeq.drop(1).map(_ - 3), -1, b.length).collect {
      case (s, e0) if s >= 0 =>
        // trim trailing zeros: a 4-byte start code's leading 00, plus any
        // cabac_zero_word-style padding
        var e = e0
        while (e > s && (b(e - 1) == 0)) e -= 1
        (s, e)
    }
  }

  /** Exp-Golomb bit reader over an RBSP (emulation already stripped). */
  private[scale] final class BitReader(val b: Array[Byte]) {
    var pos = 0 // bit position
    def bitsLeft: Int = b.length * 8 - pos
    def u1(): Int = {
      if (pos >= b.length * 8) throw new IllegalStateException("rbsp overrun")
      val v = (b(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      v
    }
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | u1(); i += 1 }
      v
    }
    def flag(): Boolean = u1() == 1
    def ue(): Int = {
      var zeros = 0
      while (u1() == 0) {
        zeros += 1
        if (zeros > 31) throw new IllegalStateException("ue overrun")
      }
      (1 << zeros) - 1 + (if (zeros == 0) 0 else u(zeros))
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 0) -(k / 2) else (k + 1) / 2
    }
    def byteAlign(): Unit = { pos = (pos + 7) & ~7 }
    /** more_rbsp_data(): true if bits remain before the rbsp_stop_bit. */
    def moreRbspData(): Boolean = {
      if (pos >= b.length * 8) return false
      // find last set bit in the stream (the stop bit)
      var last = b.length * 8 - 1
      while (last >= 0 && ((b(last >> 3) >> (7 - (last & 7))) & 1) == 0) last -= 1
      pos < last
    }
  }

  /** Bit writer with Exp-Golomb helpers (encoder side). */
  private[scale] final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream(256)
    private var cur = 0
    private var nbits = 0
    def u1(v: Int): Unit = {
      cur = (cur << 1) | (v & 1); nbits += 1
      if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
    }
    def u(n: Int, v: Int): Unit = {
      var i = n - 1
      while (i >= 0) { u1((v >> i) & 1); i -= 1 }
    }
    def ue(v: Int): Unit = {
      val k = v + 1
      val nb = 32 - Integer.numberOfLeadingZeros(k)
      u(nb - 1, 0); u(nb, k)
    }
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    def rbspTrailing(): Unit = { u1(1); while (nbits != 0) u1(0) }
    /** pcm_alignment_zero_bit padding (7.3.5). */
    def alignZero(): Unit = { while (nbits != 0) u1(0) }
    /** cabac_alignment_one_bit padding (7.3.4). */
    def alignOnes(): Unit = { while (nbits != 0) u1(1) }
    def toBytes: Array[Byte] = {
      require(nbits == 0, "unaligned bit writer")
      out.toByteArray
    }
  }

  // ------------------------------------------------------------------
  // Parameter sets (7.3.2.1 / 7.3.2.2) — the decoded subset only
  // ------------------------------------------------------------------

  private[scale] final case class Sps(
      profileIdc: Int, levelIdc: Int, spsId: Int,
      log2MaxFrameNum: Int, pocType: Int, log2MaxPocLsb: Int,
      pocDeltaZero: Boolean,
      widthMbs: Int, heightMbs: Int,
      cropL: Int, cropR: Int, cropT: Int, cropB: Int) {
    def width: Int = widthMbs * 16 - 2 * (cropL + cropR)
    def height: Int = heightMbs * 16 - 2 * (cropT + cropB)
  }

  private[scale] final case class Pps(
      ppsId: Int, spsId: Int, cabac: Boolean, picInitQp: Int,
      chromaQpOffset: Int, deblockCtrl: Boolean, constrainedIntra: Boolean,
      redundantPicCnt: Boolean, picOrderPresent: Boolean,
      weightedPred: Boolean, numRefL0Default: Int)

  /** Parse a seq_parameter_set RBSP. None = outside the decoded subset
    * (chroma != 4:2:0, >8 bit, fields, separate planes, multiple slice
    * groups downstream...).
    */
  private[scale] def parseSps(r: BitReader): Option[Sps] = {
    val profile = r.u(8)
    r.u(8) // constraint flags + reserved
    val level = r.u(8)
    val spsId = r.ue()
    if (profile == 100 || profile == 110 || profile == 122 || profile == 244 ||
        profile == 44 || profile == 83 || profile == 86 || profile == 118 ||
        profile == 128 || profile == 138 || profile == 139 || profile == 134) {
      val chromaFormat = r.ue()
      if (chromaFormat != 1) return None // 4:2:0 only
      if (r.ue() != 0) return None // bit_depth_luma_minus8
      if (r.ue() != 0) return None // bit_depth_chroma_minus8
      r.flag() // qpprime_y_zero_transform_bypass
      if (r.flag()) return None // seq_scaling_matrix_present: fail closed
    }
    val log2MaxFrameNum = r.ue() + 4
    val pocType = r.ue()
    var pocDeltaZero = true
    val log2MaxPocLsb =
      if (pocType == 0) r.ue() + 4
      else if (pocType == 1) {
        pocDeltaZero = r.flag() // delta_pic_order_always_zero_flag
        r.se(); r.se()
        val n = r.ue()
        var i = 0
        while (i < n) { r.se(); i += 1 }
        0
      } else 0
    r.ue() // max_num_ref_frames
    r.flag() // gaps_in_frame_num_value_allowed
    val widthMbs = r.ue() + 1
    val heightMapUnits = r.ue() + 1
    val frameMbsOnly = r.flag()
    if (!frameMbsOnly) return None // fields: fail closed
    r.flag() // direct_8x8_inference
    var (cl, cr, ct, cb) = (0, 0, 0, 0)
    if (r.flag()) { cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue() }
    // vui ignored (nothing in it affects sample reconstruction)
    if (widthMbs <= 0 || heightMapUnits <= 0 || widthMbs > 1024 ||
        heightMapUnits > 1024) return None
    val sps = Sps(profile, level, spsId, log2MaxFrameNum, pocType,
      log2MaxPocLsb, pocDeltaZero, widthMbs, heightMapUnits, cl, cr, ct, cb)
    if (sps.width <= 0 || sps.height <= 0) None else Some(sps)
  }

  private[scale] def parsePps(r: BitReader): Option[Pps] = {
    val ppsId = r.ue()
    val spsId = r.ue()
    val cabac = r.flag()
    val picOrderPresent = r.flag() // bottom_field_pic_order_in_frame_present
    if (r.ue() != 0) return None // num_slice_groups_minus1: FMO fails closed
    val numRefL0Default = r.ue() // num_ref_idx_l0_default_active_minus1
    r.ue() // num_ref_idx_l1_default_active_minus1
    val weightedPred = r.flag() // weighted_pred_flag
    r.u(2) // weighted_bipred_idc
    val picInitQp = r.se() + 26
    r.se() // pic_init_qs
    val chromaQpOffset = r.se()
    val deblockCtrl = r.flag()
    val constrainedIntra = r.flag()
    val redundant = r.flag()
    // transform_8x8_mode_flag etc. (more_rbsp_data) — if the 8x8 transform
    // is enabled the residual syntax changes: fail closed
    if (r.moreRbspData()) {
      if (r.flag()) return None // transform_8x8_mode_flag
      if (r.flag()) return None // pic_scaling_matrix_present
      r.se() // second_chroma_qp_index_offset
    }
    if (picInitQp < 0 || picInitQp > 51) return None
    Some(Pps(ppsId, spsId, cabac, picInitQp, chromaQpOffset, deblockCtrl,
      constrainedIntra, redundant, picOrderPresent, weightedPred,
      numRefL0Default))
  }

  // ------------------------------------------------------------------
  // Scaling + transforms (8.5)
  // ------------------------------------------------------------------

  /** normAdjust4x4 (Table 8-15 columns for the three position classes):
    * class 0 = both indices even, class 1 = both odd, class 2 = mixed.
    */
  private val NormAdjust: Array[Array[Int]] = Array(
    Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
    Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))

  @inline private def posClass(i: Int, j: Int): Int =
    if ((i & 1) == 0 && (j & 1) == 0) 0 else if ((i & 1) == 1 && (j & 1) == 1) 1 else 2

  /** LevelScale4x4(m, i, j) with flat (16) weight scale — 8.5.9. */
  @inline private def levelScale(m: Int, i: Int, j: Int): Int =
    16 * NormAdjust(m)(posClass(i, j))

  /** Scale one AC (or I_4x4 full) coefficient — 8.5.12.1 with flat lists. */
  @inline private[scale] def dequant(c: Int, qp: Int, i: Int, j: Int): Int = {
    val ls = levelScale(qp % 6, i, j)
    if (qp >= 24) (c * ls) << (qp / 6 - 4)
    else (c * ls + (1 << (3 - qp / 6))) >> (4 - qp / 6)
  }

  /** Inverse 4x4 integer transform (8.5.12.2). `d` is 16 coeffs in raster
    * order; returns residual AFTER the final (x + 32) >> 6 rounding.
    */
  private[scale] def itrans4x4(d: Array[Int]): Array[Int] = {
    val e = new Array[Int](16)
    var i = 0
    while (i < 4) { // rows
      val d0 = d(4 * i); val d1 = d(4 * i + 1); val d2 = d(4 * i + 2); val d3 = d(4 * i + 3)
      val e0 = d0 + d2; val e1 = d0 - d2
      val e2 = (d1 >> 1) - d3; val e3 = d1 + (d3 >> 1)
      e(4 * i) = e0 + e3; e(4 * i + 1) = e1 + e2
      e(4 * i + 2) = e1 - e2; e(4 * i + 3) = e0 - e3
      i += 1
    }
    val out = new Array[Int](16)
    var j = 0
    while (j < 4) { // cols
      val d0 = e(j); val d1 = e(4 + j); val d2 = e(8 + j); val d3 = e(12 + j)
      val e0 = d0 + d2; val e1 = d0 - d2
      val e2 = (d1 >> 1) - d3; val e3 = d1 + (d3 >> 1)
      out(j) = (e0 + e3 + 32) >> 6; out(4 + j) = (e1 + e2 + 32) >> 6
      out(8 + j) = (e1 - e2 + 32) >> 6; out(12 + j) = (e0 - e3 + 32) >> 6
      j += 1
    }
    out
  }

  /** Inverse 4x4 Hadamard for the Intra_16x16 luma DC block (8.5.10),
    * including the QP-dependent scaling of the result.
    */
  private[scale] def lumaDcDequant(c: Array[Int], qp: Int): Array[Int] = {
    val f = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val d0 = c(4 * i); val d1 = c(4 * i + 1); val d2 = c(4 * i + 2); val d3 = c(4 * i + 3)
      val e0 = d0 + d2; val e1 = d0 - d2; val e2 = d1 - d3; val e3 = d1 + d3
      f(4 * i) = e0 + e3; f(4 * i + 1) = e1 + e2
      f(4 * i + 2) = e1 - e2; f(4 * i + 3) = e0 - e3
      i += 1
    }
    val g = new Array[Int](16)
    var j = 0
    while (j < 4) {
      val d0 = f(j); val d1 = f(4 + j); val d2 = f(8 + j); val d3 = f(12 + j)
      val e0 = d0 + d2; val e1 = d0 - d2; val e2 = d1 - d3; val e3 = d1 + d3
      g(j) = e0 + e3; g(4 + j) = e1 + e2; g(8 + j) = e1 - e2; g(12 + j) = e0 - e3
      j += 1
    }
    val ls = levelScale(qp % 6, 0, 0)
    val out = new Array[Int](16)
    var k = 0
    while (k < 16) {
      out(k) =
        if (qp >= 36) (g(k) * ls) << (qp / 6 - 6)
        else (g(k) * ls + (1 << (5 - qp / 6))) >> (6 - qp / 6)
      k += 1
    }
    out
  }

  /** Chroma DC 2x2 inverse transform + scaling (8.5.11). `c` is 4 coeffs
    * raster (c00 c01 c10 c11).
    */
  private[scale] def chromaDcDequant(c: Array[Int], qp: Int): Array[Int] = {
    val f0 = c(0) + c(1) + c(2) + c(3)
    val f1 = c(0) - c(1) + c(2) - c(3)
    val f2 = c(0) + c(1) - c(2) - c(3)
    val f3 = c(0) - c(1) - c(2) + c(3)
    val ls = levelScale(qp % 6, 0, 0)
    Array(f0, f1, f2, f3).map(v => ((v * ls) << (qp / 6)) >> 5)
  }

  /** QPc from QPy + offset — Table 8-15's qPi -> QPc mapping. */
  private val QpcTable =
    Array(29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37, 38, 38,
      38, 39, 39, 39, 39)
  private[scale] def chromaQp(qpY: Int, offset: Int): Int = {
    val qpi = math.max(0, math.min(51, qpY + offset))
    if (qpi < 30) qpi else QpcTable(qpi - 30)
  }

  /** Zig-zag scan for 4x4 blocks (Table 8-13, frame coding). */
  private[scale] val Zigzag4x4: Array[Int] =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  @inline private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v
  @inline private[scale] def clamp255Pub(v: Int): Int = clamp255(v)

  // ------------------------------------------------------------------
  // CAVLC code tables (9.2) — transcribed from the published spec tables
  // as literal bit strings so they are directly diffable against the
  // standard. AvcSpec pins prefix-freeness of every table and Kraft
  // completeness of the rows where the published code is complete.
  // ------------------------------------------------------------------

  /** One VLC: bidirectional map between bit strings and symbols. */
  private[scale] final class Vlc(entries: Seq[(String, Int)]) {
    val maxLen: Int = entries.map(_._1.length).max
    // (len, value) -> symbol
    private val dec: Map[(Int, Int), Int] =
      entries.map { case (s, sym) => (s.length, Integer.parseInt(s, 2)) -> sym }.toMap
    private val enc: Map[Int, (Int, Int)] =
      entries.map { case (s, sym) => sym -> ((s.length, Integer.parseInt(s, 2))) }.toMap
    require(dec.size == entries.size && enc.size == entries.size,
      "duplicate VLC entry")
    def read(r: BitReader): Int = {
      var len = 0
      var acc = 0
      while (len < maxLen) {
        acc = (acc << 1) | r.u1()
        len += 1
        dec.get((len, acc)).foreach(sym => return sym)
      }
      throw new IllegalStateException("invalid VLC code")
    }
    def write(w: BitWriter, sym: Int): Unit = {
      val (len, v) = enc.getOrElse(sym,
        throw new IllegalStateException(s"unencodable symbol $sym"))
      w.u(len, v)
    }
    def codes: Seq[(String, Int)] = entries
  }

  /** coeff_token symbol packing: TrailingOnes * 32 + TotalCoeff. */
  @inline private[scale] def ctSym(t1s: Int, tc: Int): Int = t1s * 32 + tc

  /** Table 9-5, column 0 <= nC < 2. Entries are (code, (T1s, TC)). */
  private[scale] val CoeffTokenNc0: Vlc = new Vlc(Seq(
    "1" -> ctSym(0, 0),
    "000101" -> ctSym(0, 1), "01" -> ctSym(1, 1),
    "00000111" -> ctSym(0, 2), "000100" -> ctSym(1, 2), "001" -> ctSym(2, 2),
    "000000111" -> ctSym(0, 3), "00000110" -> ctSym(1, 3),
    "0000101" -> ctSym(2, 3), "00011" -> ctSym(3, 3),
    "0000000111" -> ctSym(0, 4), "000000110" -> ctSym(1, 4),
    "00000101" -> ctSym(2, 4), "000011" -> ctSym(3, 4),
    "00000000111" -> ctSym(0, 5), "0000000110" -> ctSym(1, 5),
    "000000101" -> ctSym(2, 5), "0000100" -> ctSym(3, 5),
    "0000000001111" -> ctSym(0, 6), "00000000110" -> ctSym(1, 6),
    "0000000101" -> ctSym(2, 6), "00000100" -> ctSym(3, 6),
    "0000000001011" -> ctSym(0, 7), "0000000001110" -> ctSym(1, 7),
    "00000000101" -> ctSym(2, 7), "000000100" -> ctSym(3, 7),
    "0000000001000" -> ctSym(0, 8), "0000000001010" -> ctSym(1, 8),
    "0000000001101" -> ctSym(2, 8), "0000000100" -> ctSym(3, 8),
    "00000000001111" -> ctSym(0, 9), "00000000001110" -> ctSym(1, 9),
    "0000000001001" -> ctSym(2, 9), "00000000100" -> ctSym(3, 9),
    "00000000001011" -> ctSym(0, 10), "00000000001010" -> ctSym(1, 10),
    "00000000001101" -> ctSym(2, 10), "0000000001100" -> ctSym(3, 10),
    "000000000001111" -> ctSym(0, 11), "000000000001110" -> ctSym(1, 11),
    "00000000001001" -> ctSym(2, 11), "00000000001100" -> ctSym(3, 11),
    "000000000001011" -> ctSym(0, 12), "000000000001010" -> ctSym(1, 12),
    "000000000001101" -> ctSym(2, 12), "00000000001000" -> ctSym(3, 12),
    "0000000000001111" -> ctSym(0, 13), "000000000000001" -> ctSym(1, 13),
    "000000000001001" -> ctSym(2, 13), "000000000001100" -> ctSym(3, 13),
    "0000000000001011" -> ctSym(0, 14), "0000000000001110" -> ctSym(1, 14),
    "0000000000001101" -> ctSym(2, 14), "000000000001000" -> ctSym(3, 14),
    "0000000000000111" -> ctSym(0, 15), "0000000000001010" -> ctSym(1, 15),
    "0000000000001001" -> ctSym(2, 15), "0000000000001100" -> ctSym(3, 15),
    "0000000000000100" -> ctSym(0, 16), "0000000000000110" -> ctSym(1, 16),
    "0000000000000101" -> ctSym(2, 16), "0000000000001000" -> ctSym(3, 16)))

  /** Table 9-5, column 2 <= nC < 4. */
  private[scale] val CoeffTokenNc2: Vlc = new Vlc(Seq(
    "11" -> ctSym(0, 0),
    "001011" -> ctSym(0, 1), "10" -> ctSym(1, 1),
    "000111" -> ctSym(0, 2), "00111" -> ctSym(1, 2), "011" -> ctSym(2, 2),
    "0000111" -> ctSym(0, 3), "001010" -> ctSym(1, 3),
    "001001" -> ctSym(2, 3), "0101" -> ctSym(3, 3),
    "00000111" -> ctSym(0, 4), "000110" -> ctSym(1, 4),
    "000101" -> ctSym(2, 4), "0100" -> ctSym(3, 4),
    "00000100" -> ctSym(0, 5), "0000110" -> ctSym(1, 5),
    "0000101" -> ctSym(2, 5), "00110" -> ctSym(3, 5),
    "000000111" -> ctSym(0, 6), "00000110" -> ctSym(1, 6),
    "00000101" -> ctSym(2, 6), "001000" -> ctSym(3, 6),
    "00000001111" -> ctSym(0, 7), "000000110" -> ctSym(1, 7),
    "000000101" -> ctSym(2, 7), "000100" -> ctSym(3, 7),
    "00000001011" -> ctSym(0, 8), "00000001110" -> ctSym(1, 8),
    "00000001101" -> ctSym(2, 8), "0000100" -> ctSym(3, 8),
    "000000001111" -> ctSym(0, 9), "00000001010" -> ctSym(1, 9),
    "00000001001" -> ctSym(2, 9), "000000100" -> ctSym(3, 9),
    "000000001011" -> ctSym(0, 10), "000000001110" -> ctSym(1, 10),
    "000000001101" -> ctSym(2, 10), "00000001100" -> ctSym(3, 10),
    "000000001000" -> ctSym(0, 11), "000000001010" -> ctSym(1, 11),
    "000000001001" -> ctSym(2, 11), "00000001000" -> ctSym(3, 11),
    "0000000001111" -> ctSym(0, 12), "0000000001110" -> ctSym(1, 12),
    "0000000001101" -> ctSym(2, 12), "000000001100" -> ctSym(3, 12),
    "0000000001011" -> ctSym(0, 13), "0000000001010" -> ctSym(1, 13),
    "0000000001001" -> ctSym(2, 13), "0000000001100" -> ctSym(3, 13),
    "0000000000111" -> ctSym(0, 14), "00000000001011" -> ctSym(1, 14),
    "0000000000110" -> ctSym(2, 14), "0000000001000" -> ctSym(3, 14),
    "00000000001001" -> ctSym(0, 15), "00000000001000" -> ctSym(1, 15),
    "00000000001010" -> ctSym(2, 15), "0000000000001" -> ctSym(3, 15),
    "00000000000111" -> ctSym(0, 16), "00000000000110" -> ctSym(1, 16),
    "00000000000101" -> ctSym(2, 16), "00000000000100" -> ctSym(3, 16)))

  /** Table 9-5, column 4 <= nC < 8. */
  private[scale] val CoeffTokenNc4: Vlc = new Vlc(Seq(
    "1111" -> ctSym(0, 0),
    "001111" -> ctSym(0, 1), "1110" -> ctSym(1, 1),
    "001011" -> ctSym(0, 2), "01111" -> ctSym(1, 2), "1101" -> ctSym(2, 2),
    "001000" -> ctSym(0, 3), "01100" -> ctSym(1, 3),
    "01110" -> ctSym(2, 3), "1100" -> ctSym(3, 3),
    "0001111" -> ctSym(0, 4), "01010" -> ctSym(1, 4),
    "01011" -> ctSym(2, 4), "1011" -> ctSym(3, 4),
    "0001011" -> ctSym(0, 5), "01000" -> ctSym(1, 5),
    "01001" -> ctSym(2, 5), "1010" -> ctSym(3, 5),
    "0001001" -> ctSym(0, 6), "001110" -> ctSym(1, 6),
    "001101" -> ctSym(2, 6), "1001" -> ctSym(3, 6),
    "0001000" -> ctSym(0, 7), "001010" -> ctSym(1, 7),
    "001001" -> ctSym(2, 7), "1000" -> ctSym(3, 7),
    "00001111" -> ctSym(0, 8), "0001110" -> ctSym(1, 8),
    "0001101" -> ctSym(2, 8), "01101" -> ctSym(3, 8),
    "00001011" -> ctSym(0, 9), "00001110" -> ctSym(1, 9),
    "0001010" -> ctSym(2, 9), "001100" -> ctSym(3, 9),
    "000001111" -> ctSym(0, 10), "00001010" -> ctSym(1, 10),
    "00001101" -> ctSym(2, 10), "0001100" -> ctSym(3, 10),
    "000001011" -> ctSym(0, 11), "000001110" -> ctSym(1, 11),
    "00001001" -> ctSym(2, 11), "00001100" -> ctSym(3, 11),
    "000001000" -> ctSym(0, 12), "000001010" -> ctSym(1, 12),
    "000001101" -> ctSym(2, 12), "00001000" -> ctSym(3, 12),
    "0000001101" -> ctSym(0, 13), "000000111" -> ctSym(1, 13),
    "000001001" -> ctSym(2, 13), "000001100" -> ctSym(3, 13),
    "0000001001" -> ctSym(0, 14), "0000001100" -> ctSym(1, 14),
    "0000001011" -> ctSym(2, 14), "0000001010" -> ctSym(3, 14),
    "0000000101" -> ctSym(0, 15), "0000001000" -> ctSym(1, 15),
    "0000000111" -> ctSym(2, 15), "0000000110" -> ctSym(3, 15),
    "0000000001" -> ctSym(0, 16), "0000000100" -> ctSym(1, 16),
    "0000000011" -> ctSym(2, 16), "0000000010" -> ctSym(3, 16)))

  /** Table 9-5, chroma DC column (nC == -1, 4:2:0). */
  private[scale] val CoeffTokenChromaDc: Vlc = new Vlc(Seq(
    "01" -> ctSym(0, 0),
    "000111" -> ctSym(0, 1), "1" -> ctSym(1, 1),
    "000100" -> ctSym(0, 2), "000110" -> ctSym(1, 2), "001" -> ctSym(2, 2),
    "000011" -> ctSym(0, 3), "0000011" -> ctSym(1, 3),
    "0000010" -> ctSym(2, 3), "000101" -> ctSym(3, 3),
    "000010" -> ctSym(0, 4), "00000011" -> ctSym(1, 4),
    "00000010" -> ctSym(2, 4), "0000000" -> ctSym(3, 4)))

  /** Read coeff_token: returns (TrailingOnes, TotalCoeff). nC >= 8 is the
    * 6-bit FLC of 9.2.1; nC == -1 selects the chroma DC table.
    */
  private[scale] def readCoeffToken(r: BitReader, nC: Int): (Int, Int) = {
    if (nC >= 8) {
      val v = r.u(6)
      if (v == 3) (0, 0)
      else {
        val tc = (v >> 2) + 1
        val t1s = v & 3
        if (t1s > math.min(3, tc)) throw new IllegalStateException("bad FLC coeff_token")
        (t1s, tc)
      }
    } else {
      val t = if (nC == -1) CoeffTokenChromaDc
        else if (nC < 2) CoeffTokenNc0
        else if (nC < 4) CoeffTokenNc2
        else CoeffTokenNc4
      val sym = t.read(r)
      (sym / 32, sym % 32)
    }
  }

  private[scale] def writeCoeffToken(w: BitWriter, nC: Int, t1s: Int, tc: Int): Unit = {
    if (nC >= 8) {
      if (tc == 0) w.u(6, 3) else w.u(6, ((tc - 1) << 2) | t1s)
    } else {
      val t = if (nC == -1) CoeffTokenChromaDc
        else if (nC < 2) CoeffTokenNc0
        else if (nC < 4) CoeffTokenNc2
        else CoeffTokenNc4
      t.write(w, ctSym(t1s, tc))
    }
  }

  /** Table 9-7 / 9-8: total_zeros for 4x4 blocks, indexed by tzVlcIndex
    * (= TotalCoeff) 1..15; symbol = totalZeros.
    */
  private[scale] val TotalZeros4x4: Array[Vlc] = {
    val rows: Seq[Seq[String]] = Seq(
      Seq("1", "011", "010", "0011", "0010", "00011", "00010", "000011",
        "000010", "0000011", "0000010", "00000011", "00000010", "000000011",
        "000000010", "000000001"),
      Seq("111", "110", "101", "100", "011", "0101", "0100", "0011", "0010",
        "00011", "00010", "000011", "000010", "000001", "000000"),
      Seq("0101", "111", "110", "101", "0100", "0011", "100", "011", "0010",
        "00011", "00010", "000001", "00001", "000000"),
      Seq("00011", "111", "0101", "0100", "110", "101", "100", "0011", "011",
        "0010", "00010", "00001", "00000"),
      Seq("0101", "0100", "0011", "111", "110", "101", "100", "011", "0010",
        "00001", "0001", "00000"),
      Seq("000001", "00001", "111", "110", "101", "100", "011", "010", "0001",
        "001", "000000"),
      Seq("000001", "00001", "101", "100", "011", "11", "010", "0001", "001",
        "000000"),
      Seq("000001", "0001", "00001", "011", "11", "10", "010", "001", "000000"),
      Seq("000001", "000000", "0001", "11", "10", "001", "01", "00001"),
      Seq("00001", "00000", "001", "11", "10", "01", "0001"),
      Seq("0000", "0001", "001", "010", "1", "011"),
      Seq("0000", "0001", "01", "1", "001"),
      Seq("000", "001", "1", "01"),
      Seq("00", "01", "1"),
      Seq("0", "1"))
    rows.map(r => new Vlc(r.zipWithIndex)).toArray // index tc-1
  }

  /** Table 9-9 (a): total_zeros for chroma DC 2x2 blocks (4:2:0). */
  private[scale] val TotalZerosChromaDc: Array[Vlc] = Array(
    new Vlc(Seq("1" -> 0, "01" -> 1, "001" -> 2, "000" -> 3)),
    new Vlc(Seq("1" -> 0, "01" -> 1, "00" -> 2)),
    new Vlc(Seq("1" -> 0, "0" -> 1)))

  /** Table 9-10: run_before, indexed by min(zerosLeft, 7) - 1. */
  private[scale] val RunBefore: Array[Vlc] = Array(
    new Vlc(Seq("1" -> 0, "0" -> 1)),
    new Vlc(Seq("1" -> 0, "01" -> 1, "00" -> 2)),
    new Vlc(Seq("11" -> 0, "10" -> 1, "01" -> 2, "00" -> 3)),
    new Vlc(Seq("11" -> 0, "10" -> 1, "01" -> 2, "001" -> 3, "000" -> 4)),
    new Vlc(Seq("11" -> 0, "10" -> 1, "011" -> 2, "010" -> 3, "001" -> 4,
      "000" -> 5)),
    new Vlc(Seq("11" -> 0, "000" -> 1, "001" -> 2, "011" -> 3, "010" -> 4,
      "101" -> 5, "100" -> 6)),
    new Vlc(Seq("111" -> 0, "110" -> 1, "101" -> 2, "100" -> 3, "011" -> 4,
      "010" -> 5, "001" -> 6, "0001" -> 7, "00001" -> 8, "000001" -> 9,
      "0000001" -> 10, "00000001" -> 11, "000000001" -> 12,
      "0000000001" -> 13, "00000000001" -> 14)))

  // ------------------------------------------------------------------
  // CAVLC residual block parse / emit (9.2.2 - 9.2.4)
  // ------------------------------------------------------------------

  /** Parse one CAVLC residual block. Returns the coefficients in SCAN
    * order (index 0 = lowest frequency actually coded; for AC blocks the
    * caller offsets into the zig-zag) and TotalCoeff. `maxNumCoeff` is 16
    * (I_4x4 luma / luma DC), 15 (AC blocks) or 4 (chroma DC).
    */
  private[scale] def readResidualBlock(r: BitReader, nC: Int,
                                       maxNumCoeff: Int): (Array[Int], Int) = {
    val out = new Array[Int](maxNumCoeff)
    val (t1s, tc) = readCoeffToken(r, nC)
    if (tc == 0) return (out, 0)
    if (tc > maxNumCoeff) throw new IllegalStateException("tc > maxNumCoeff")
    val levels = new Array[Int](tc)
    var suffixLength = if (tc > 10 && t1s < 3) 1 else 0
    var i = 0
    while (i < t1s) { // trailing ones: sign bits only
      levels(i) = if (r.u1() == 1) -1 else 1
      i += 1
    }
    while (i < tc) {
      // level_prefix: zeros before the 1
      var prefix = 0
      while (r.u1() == 0) {
        prefix += 1
        if (prefix > 31) throw new IllegalStateException("level_prefix overrun")
      }
      val suffixSize =
        if (prefix == 14 && suffixLength == 0) 4
        else if (prefix >= 15) prefix - 3
        else suffixLength
      var levelCode = math.min(15, prefix) << suffixLength
      if (suffixSize > 0) levelCode += r.u(suffixSize)
      if (prefix >= 15 && suffixLength == 0) levelCode += 15
      if (prefix >= 16) levelCode += (1 << (prefix - 3)) - 4096
      if (i == t1s && t1s < 3) levelCode += 2
      levels(i) =
        if (levelCode % 2 == 0) (levelCode + 2) >> 1
        else -((levelCode + 1) >> 1)
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(levels(i)) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    var totalZeros = 0
    if (tc < maxNumCoeff) {
      totalZeros =
        if (maxNumCoeff == 4) TotalZerosChromaDc(tc - 1).read(r)
        else TotalZeros4x4(tc - 1).read(r)
    }
    // place levels: levels(0) is the HIGHEST-frequency coefficient
    var zerosLeft = totalZeros
    var pos = tc - 1 + totalZeros
    i = 0
    while (i < tc) {
      if (pos < 0 || pos >= maxNumCoeff)
        throw new IllegalStateException("coeff position out of range")
      out(pos) = levels(i)
      if (i < tc - 1) {
        val runBefore =
          if (zerosLeft > 0) RunBefore(math.min(zerosLeft, 7) - 1).read(r) else 0
        if (runBefore > zerosLeft) throw new IllegalStateException("run_before > zerosLeft")
        zerosLeft -= runBefore
        pos -= 1 + runBefore
      }
      i += 1
    }
    (out, tc)
  }

  /** Emit one CAVLC residual block (encoder twin of [[readResidualBlock]]).
    * `coeffs` is in scan order, length maxNumCoeff. Returns TotalCoeff.
    */
  private[scale] def writeResidualBlock(w: BitWriter, nC: Int,
                                        coeffs: Array[Int]): Int = {
    val maxNumCoeff = coeffs.length
    val nz = coeffs.zipWithIndex.filter(_._1 != 0)
    val tc = nz.length
    // trailing ones: up to 3 consecutive +-1 at the high-frequency end
    var t1s = 0
    while (t1s < math.min(3, tc) &&
        math.abs(nz(tc - 1 - t1s)._1) == 1) t1s += 1
    writeCoeffToken(w, nC, t1s, tc)
    if (tc == 0) return 0
    var i = 0
    while (i < t1s) { // signs, highest frequency first
      w.u1(if (nz(tc - 1 - i)._1 < 0) 1 else 0)
      i += 1
    }
    var suffixLength = if (tc > 10 && t1s < 3) 1 else 0
    while (i < tc) {
      val level = nz(tc - 1 - i)._1
      var levelCode = if (level > 0) (level - 1) * 2 else -level * 2 - 1
      if (i == t1s && t1s < 3) levelCode -= 2
      // Shortest valid (prefix, suffix) per the 9.2.2.1 decode rules:
      // regular prefixes 0..13 (or 0..14 when suffixLength > 0), then the
      // prefix-14 4-bit form (suffixLength == 0 only), then the escapes
      // (prefix 15 => 12-bit suffix; prefix p >= 16 adds (1<<(p-3))-4096).
      if (suffixLength == 0) {
        if (levelCode < 14) w.u(levelCode + 1, 1)
        else if (levelCode < 30) { w.u(15, 1); w.u(4, levelCode - 14) }
        else {
          val rem = levelCode - 30 // prefix-15 decode: 15 + suffix + 15
          writeEscape(w, rem)
        }
      } else {
        if (levelCode < (15 << suffixLength)) {
          val prefix = levelCode >> suffixLength
          w.u(prefix + 1, 1)
          w.u(suffixLength, levelCode & ((1 << suffixLength) - 1))
        } else writeEscape(w, levelCode - (15 << suffixLength))
      }
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(level) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    val totalZeros = nz.last._2 + 1 - tc
    if (tc < maxNumCoeff) {
      if (maxNumCoeff == 4) TotalZerosChromaDc(tc - 1).write(w, totalZeros)
      else TotalZeros4x4(tc - 1).write(w, totalZeros)
    }
    // runs, highest-frequency coefficient first
    var zerosLeft = totalZeros
    val positions = nz.map(_._2)
    var k = tc - 1
    while (k > 0) {
      val runBefore = positions(k) - positions(k - 1) - 1
      if (zerosLeft > 0) {
        RunBefore(math.min(zerosLeft, 7) - 1).write(w, runBefore)
        zerosLeft -= runBefore
      } else require(runBefore == 0, "run with no zeros left")
      k -= 1
    }
    tc
  }

  /** Escape-code emitter shared by both suffixLength branches: `rem` is
    * levelCode minus the escape base. prefix 15 carries a 12-bit suffix;
    * each further prefix p carries p-3 bits offset by (1<<(p-3)) - 4096.
    */
  private def writeEscape(w: BitWriter, rem: Int): Unit = {
    if (rem < 4096) { w.u(16, 1); w.u(12, rem) }
    else {
      var prefix = 16
      while (rem - ((1 << (prefix - 3)) - 4096) >= (1 << (prefix - 3)))
        prefix += 1
      val suffix = rem - ((1 << (prefix - 3)) - 4096)
      w.u(prefix + 1, 1); w.u(prefix - 3, suffix)
    }
  }

  // ------------------------------------------------------------------
  // Table 9-4: coded_block_pattern me(v) mapping, intra column
  // (codeNum -> cbp). Encoder uses the inverse.
  // ------------------------------------------------------------------
  private[scale] val CbpIntra: Array[Int] = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)
  private[scale] val CbpIntraInv: Array[Int] = {
    val inv = new Array[Int](48)
    var i = 0
    while (i < 48) { inv(CbpIntra(i)) = i; i += 1 }
    inv
  }

  /** luma4x4BlkIdx -> (x, y) offset inside the macroblock (6.4.3). */
  private[scale] val Blk4x4Off: Array[(Int, Int)] = Array.tabulate(16) { i =>
    val qx = ((i >> 2) & 1) * 8
    val qy = ((i >> 3) & 1) * 8
    (qx + (i & 1) * 4, qy + ((i >> 1) & 1) * 4)
  }
  /** (x, y) in 4-pel units inside the MB -> luma4x4BlkIdx. */
  private[scale] val Blk4x4Idx: Array[Array[Int]] = {
    val m = Array.ofDim[Int](4, 4)
    var i = 0
    while (i < 16) {
      val (x, y) = Blk4x4Off(i)
      m(x / 4)(y / 4) = i
      i += 1
    }
    m
  }

  /** Table 9-4 inter column (codeNum -> cbp) for P-macroblock
    * coded_block_pattern; the intra column is [[CbpIntra]] above.
    */
  private[scale] val CbpInter: Array[Int] = Array(
    0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
    14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
    17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41)
  private[scale] val CbpInterInv: Array[Int] = {
    val inv = new Array[Int](48)
    var i = 0
    while (i < 48) { inv(CbpInter(i)) = i; i += 1 }
    inv
  }

  // ------------------------------------------------------------------
  // Inter prediction machinery (8.4), shared by the decoder and the
  // fixture encoder so motion-vector prediction cannot diverge.
  // ------------------------------------------------------------------

  /** Per-4x4-block motion field of the picture being (de)coded.
    * `blkRef`: -2 = block not yet coded (unavailable for prediction),
    * -1 = coded intra/PCM (available, no motion), 0 = inter with the
    * single reference picture of the decoded subset. Motion vectors are
    * in quarter-luma-sample units.
    */
  private[scale] final class MotionField(val wMb: Int, val hMb: Int) {
    val blkRef: Array[Byte] = Array.fill[Byte](wMb * hMb * 16)(-2)
    val mvX = new Array[Short](wMb * hMb * 16)
    val mvY = new Array[Short](wMb * hMb * 16)
    /** Index of the 4x4 block at global block coords (raster in MB). */
    @inline def idx(bx: Int, by: Int): Int =
      ((by >> 2) * wMb + (bx >> 2)) * 16 + (by & 3) * 4 + (bx & 3)
    /** Assign one partition's motion to every 4x4 block it covers
      * (`x0`,`y0`,`w`,`h` in luma samples, picture-absolute).
      */
    def setBlocks(x0: Int, y0: Int, w: Int, h: Int, mvx: Int, mvy: Int): Unit = {
      var by = y0 >> 2
      while (by < ((y0 + h) >> 2)) {
        var bx = x0 >> 2
        while (bx < ((x0 + w) >> 2)) {
          val i = idx(bx, by)
          blkRef(i) = 0
          mvX(i) = mvx.toShort
          mvY(i) = mvy.toShort
          bx += 1
        }
        by += 1
      }
    }
    /** Mark a whole macroblock intra-coded (no motion). */
    def setIntraMb(addr: Int): Unit = {
      var i = addr * 16
      val e = i + 16
      while (i < e) { blkRef(i) = -1; i += 1 }
    }
  }

  /** Neighbor descriptor for MV prediction: `avail` per 6.4 (decoded, in
    * picture, same slice, already coded in block decode order); `ref` is
    * -1 for intra/unavailable, else the reference index (always 0 here).
    */
  private[scale] final case class MvN(avail: Boolean, ref: Int, mvx: Int, mvy: Int)

  /** The motion info of the 4x4 block containing luma sample (xN, yN).
    * `mbOk(addr)` answers MB-level availability (decoded + same slice).
    */
  private[scale] def mvNeighbor(mf: MotionField, mbOk: Int => Boolean,
                                xN: Int, yN: Int): MvN = {
    if (xN < 0 || yN < 0 || xN >= mf.wMb * 16 || yN >= mf.hMb * 16)
      return MvN(avail = false, -1, 0, 0)
    val mb = (yN >> 4) * mf.wMb + (xN >> 4)
    if (!mbOk(mb)) return MvN(avail = false, -1, 0, 0)
    val i = mf.idx(xN >> 2, yN >> 2)
    val r = mf.blkRef(i)
    if (r == -2) MvN(avail = false, -1, 0, 0) // not yet coded
    else if (r < 0) MvN(avail = true, -1, 0, 0) // intra: no motion
    else MvN(avail = true, r, mf.mvX(i), mf.mvY(i))
  }

  @inline private def med3(a: Int, b: Int, c: Int): Int =
    math.max(math.min(a, b), math.min(math.max(a, b), c))

  /** Luma motion-vector prediction (8.4.1.3) for the partition at
    * (`x0`,`y0`) of size `w`x`h` (picture-absolute luma samples).
    * `partKind`: 0 general median rule, 1 = 16x8 top, 2 = 16x8 bottom,
    * 3 = 8x16 left, 4 = 8x16 right (the directional shortcuts apply to
    * macroblock partitions only, never to 8x8 sub-partitions).
    */
  private[scale] def mvPredict(mf: MotionField, mbOk: Int => Boolean,
                               x0: Int, y0: Int, w: Int, h: Int,
                               partKind: Int): (Int, Int) = {
    val a = mvNeighbor(mf, mbOk, x0 - 1, y0)
    val b = mvNeighbor(mf, mbOk, x0, y0 - 1)
    var c = mvNeighbor(mf, mbOk, x0 + w, y0 - 1)
    if (!c.avail) c = mvNeighbor(mf, mbOk, x0 - 1, y0 - 1) // D substitutes
    partKind match {
      case 1 => if (b.ref == 0) return (b.mvx, b.mvy)
      case 2 => if (a.ref == 0) return (a.mvx, a.mvy)
      case 3 => if (a.ref == 0) return (a.mvx, a.mvy)
      case 4 => if (c.ref == 0) return (c.mvx, c.mvy)
      case _ => ()
    }
    if (!b.avail && !c.avail && a.avail) return (a.mvx, a.mvy)
    val nMatch = (if (a.ref == 0) 1 else 0) + (if (b.ref == 0) 1 else 0) +
      (if (c.ref == 0) 1 else 0)
    if (nMatch == 1) {
      if (a.ref == 0) (a.mvx, a.mvy)
      else if (b.ref == 0) (b.mvx, b.mvy)
      else (c.mvx, c.mvy)
    } else
      (med3(a.mvx, b.mvx, c.mvx), med3(a.mvy, b.mvy, c.mvy))
  }

  /** P_Skip motion vector (8.4.1.1): zero when either MB neighbor is
    * outside the picture/slice or carries a zero vector with ref 0; the
    * 16x16 median prediction otherwise.
    */
  private[scale] def mvSkip(mf: MotionField, mbOk: Int => Boolean,
                            mx: Int, my: Int): (Int, Int) = {
    val a = mvNeighbor(mf, mbOk, mx * 16 - 1, my * 16)
    val b = mvNeighbor(mf, mbOk, mx * 16, my * 16 - 1)
    if (!a.avail || !b.avail ||
        (a.ref == 0 && a.mvx == 0 && a.mvy == 0) ||
        (b.ref == 0 && b.mvx == 0 && b.mvy == 0)) (0, 0)
    else mvPredict(mf, mbOk, mx * 16, my * 16, 16, 16, 0)
  }

  /** Quarter-sample luma motion compensation (8.4.2.2.1) of a `bw`x`bh`
    * block at picture position (`x0`,`y0`) displaced by (`mvx`,`mvy`) in
    * quarter samples. Out-of-picture reads clamp to the nearest edge
    * sample. Output into `out` at `outOff` with row stride `outStride`.
    */
  private[scale] def interpLumaBlock(ref: Array[Byte], stride: Int, picH: Int,
                                     x0: Int, y0: Int, bw: Int, bh: Int,
                                     mvx: Int, mvy: Int, out: Array[Int],
                                     outStride: Int, outOff: Int): Unit = {
    val fx = mvx & 3
    val fy = mvy & 3
    val bx = x0 + (mvx >> 2)
    val by = y0 + (mvy >> 2)
    @inline def at(x: Int, y: Int): Int = {
      val cx = if (x < 0) 0 else if (x >= stride) stride - 1 else x
      val cy = if (y < 0) 0 else if (y >= picH) picH - 1 else y
      ref(cy * stride + cx) & 0xff
    }
    // 6-tap (1,-5,20,20,-5,1) intermediate sums; the half-sample between
    // (x,y) and its right/below neighbor
    @inline def hSum(x: Int, y: Int): Int =
      at(x - 2, y) - 5 * at(x - 1, y) + 20 * at(x, y) + 20 * at(x + 1, y) -
        5 * at(x + 2, y) + at(x + 3, y)
    @inline def vSum(x: Int, y: Int): Int =
      at(x, y - 2) - 5 * at(x, y - 1) + 20 * at(x, y) + 20 * at(x, y + 1) -
        5 * at(x, y + 2) + at(x, y + 3)
    @inline def hHalf(x: Int, y: Int): Int = clamp255((hSum(x, y) + 16) >> 5)
    @inline def vHalf(x: Int, y: Int): Int = clamp255((vSum(x, y) + 16) >> 5)
    /** Center half-sample j: 6-tap across the unrounded vertical sums. */
    @inline def jHalf(x: Int, y: Int): Int =
      clamp255((vSum(x - 2, y) - 5 * vSum(x - 1, y) + 20 * vSum(x, y) +
        20 * vSum(x + 1, y) - 5 * vSum(x + 2, y) + vSum(x + 3, y) + 512) >> 10)
    var j = 0
    while (j < bh) {
      val y = by + j
      var i = 0
      while (i < bw) {
        val x = bx + i
        val v = (fy * 4 + fx) match {
          case 0  => at(x, y)                                    // G
          case 1  => (at(x, y) + hHalf(x, y) + 1) >> 1           // a
          case 2  => hHalf(x, y)                                 // b
          case 3  => (at(x + 1, y) + hHalf(x, y) + 1) >> 1       // c
          case 4  => (at(x, y) + vHalf(x, y) + 1) >> 1           // d
          case 5  => (hHalf(x, y) + vHalf(x, y) + 1) >> 1        // e
          case 6  => (hHalf(x, y) + jHalf(x, y) + 1) >> 1        // f
          case 7  => (hHalf(x, y) + vHalf(x + 1, y) + 1) >> 1    // g
          case 8  => vHalf(x, y)                                 // h
          case 9  => (vHalf(x, y) + jHalf(x, y) + 1) >> 1        // i
          case 10 => jHalf(x, y)                                 // j
          case 11 => (jHalf(x, y) + vHalf(x + 1, y) + 1) >> 1    // k
          case 12 => (at(x, y + 1) + vHalf(x, y) + 1) >> 1       // n
          case 13 => (vHalf(x, y) + hHalf(x, y + 1) + 1) >> 1    // p
          case 14 => (jHalf(x, y) + hHalf(x, y + 1) + 1) >> 1    // q
          case _  => (vHalf(x + 1, y) + hHalf(x, y + 1) + 1) >> 1 // r
        }
        out(outOff + j * outStride + i) = v
        i += 1
      }
      j += 1
    }
  }

  /** Eighth-sample chroma motion compensation (8.4.2.2.2): bilinear with
    * 1/8 weights; `mvx`/`mvy` are the LUMA quarter-sample vectors.
    */
  private[scale] def interpChromaBlock(ref: Array[Byte], stride: Int, picH: Int,
                                       x0: Int, y0: Int, bw: Int, bh: Int,
                                       mvx: Int, mvy: Int, out: Array[Int],
                                       outStride: Int, outOff: Int): Unit = {
    val dx = mvx & 7
    val dy = mvy & 7
    val bx = x0 + (mvx >> 3)
    val by = y0 + (mvy >> 3)
    @inline def at(x: Int, y: Int): Int = {
      val cx = if (x < 0) 0 else if (x >= stride) stride - 1 else x
      val cy = if (y < 0) 0 else if (y >= picH) picH - 1 else y
      ref(cy * stride + cx) & 0xff
    }
    var j = 0
    while (j < bh) {
      var i = 0
      while (i < bw) {
        val x = bx + i
        val y = by + j
        out(outOff + j * outStride + i) =
          ((8 - dx) * (8 - dy) * at(x, y) + dx * (8 - dy) * at(x + 1, y) +
            (8 - dx) * dy * at(x, y + 1) + dx * dy * at(x + 1, y + 1) + 32) >> 6
        i += 1
      }
      j += 1
    }
  }

  /** P_8x8 sub-partition geometry by sub_mb_type (Table 7-17):
    * (dx, dy, w, h) offsets inside the 8x8 block, in decode order.
    */
  private[scale] val SubMbParts: Array[Array[(Int, Int, Int, Int)]] = Array(
    Array((0, 0, 8, 8)),
    Array((0, 0, 8, 4), (0, 4, 8, 4)),
    Array((0, 0, 4, 8), (4, 0, 4, 8)),
    Array((0, 0, 4, 4), (4, 0, 4, 4), (0, 4, 4, 4), (4, 4, 4, 4)))

  /** Shared all-zero residual block (read-only). */
  private val ZeroRes16 = new Array[Int](16)

  // ------------------------------------------------------------------
  // IDR picture decoder
  // ------------------------------------------------------------------

  /** Per-slice deblocking controls. */
  private[scale] final case class SliceDeblock(disableIdc: Int, alphaOff: Int, betaOff: Int)

  private[scale] final class Decoder(val sps: Sps, val pps: Pps,
                                     val ref: Frame = null) {
    val wMb: Int = sps.widthMbs
    val hMb: Int = sps.heightMbs
    val yStride: Int = wMb * 16
    val cStride: Int = wMb * 8
    val yPlane = new Array[Byte](yStride * hMb * 16)
    val uPlane = new Array[Byte](cStride * hMb * 8)
    val vPlane = new Array[Byte](cStride * hMb * 8)
    val nMb: Int = wMb * hMb
    // per-MB bookkeeping
    val mbSlice = Array.fill(nMb)(-1) // slice index that decoded the MB
    val mbIsI4x4 = new Array[Boolean](nMb)
    val mbIsPcm = new Array[Boolean](nMb)
    val mbIsInter = new Array[Boolean](nMb)
    val mbQp = new Array[Int](nMb)
    // per-4x4 motion field (P slices; intra MBs mark themselves)
    val mf = new MotionField(wMb, hMb)
    // per-4x4-block nonzero coeff counts (for nC) and I4x4 pred modes
    val lumaNz = new Array[Byte](nMb * 16)
    val cbNz = new Array[Byte](nMb * 4)
    val crNz = new Array[Byte](nMb * 4)
    val i4Modes = Array.fill[Byte](nMb * 16)(-1)
    // CABAC context-neighbor state (also kept by the CAVLC path so a
    // picture's bookkeeping is uniform): per-MB chroma pred mode, coded
    // block patterns, and the DC coded_block_flags per transform class
    val mbChromaMode = new Array[Byte](nMb)
    val mbCbpLuma = new Array[Byte](nMb)
    val mbCbpChroma = new Array[Byte](nMb)
    val lumaDcNz = new Array[Byte](nMb)
    val cbDcNz = new Array[Byte](nMb)
    val crDcNz = new Array[Byte](nMb)
    val sliceDeblock = scala.collection.mutable.ArrayBuffer.empty[SliceDeblock]

    @inline private def mbAt(mx: Int, my: Int): Int = my * wMb + mx

    /** Is the MB at (mx,my) decoded and in the same slice as `slice`? */
    @inline private def mbAvail(mx: Int, my: Int, slice: Int): Boolean =
      mx >= 0 && my >= 0 && mx < wMb && my < hMb && mbSlice(mbAt(mx, my)) == slice

    /** nC for the luma 4x4 block at absolute block coords (bx, by). */
    private def lumaNc(bx: Int, by: Int, slice: Int): Int = {
      def nzAt(x: Int, y: Int): Int = {
        val mb = mbAt(x / 4, y / 4)
        if (mbIsPcm(mb)) 16
        else lumaNz(mb * 16 + Blk4x4Idx(x % 4)(y % 4))
      }
      val aAvail = bx > 0 && mbAvail((bx - 1) / 4, by / 4, slice)
      val bAvail = by > 0 && mbAvail(bx / 4, (by - 1) / 4, slice)
      if (aAvail && bAvail) (nzAt(bx - 1, by) + nzAt(bx, by - 1) + 1) >> 1
      else if (aAvail) nzAt(bx - 1, by)
      else if (bAvail) nzAt(bx, by - 1)
      else 0
    }

    /** nC for a chroma AC 4x4 block at absolute chroma block coords. */
    private def chromaNc(bx: Int, by: Int, cb: Boolean, slice: Int): Int = {
      def nzAt(x: Int, y: Int): Int = {
        val mb = mbAt(x / 2, y / 2)
        if (mbIsPcm(mb)) 16
        else {
          val idx = (y % 2) * 2 + (x % 2)
          if (cb) cbNz(mb * 4 + idx) else crNz(mb * 4 + idx)
        }
      }
      val aAvail = bx > 0 && mbAvail((bx - 1) / 2, by / 2, slice)
      val bAvail = by > 0 && mbAvail(bx / 2, (by - 1) / 2, slice)
      if (aAvail && bAvail) (nzAt(bx - 1, by) + nzAt(bx, by - 1) + 1) >> 1
      else if (aAvail) nzAt(bx - 1, by)
      else if (bAvail) nzAt(bx, by - 1)
      else 0
    }

    // ---- intra prediction helpers -----------------------------------

    @inline private def yAt(x: Int, y: Int): Int = yPlane(y * yStride + x) & 0xff

    /** Decode one slice's macroblocks from `r`. Throws on any
      * out-of-subset or non-conforming construct (caller maps to None).
      */
    def decodeSlice(r: BitReader, firstMb: Int, sliceQpY: Int,
                    deblock: SliceDeblock): Unit = {
      val sliceIdx = sliceDeblock.length
      sliceDeblock += deblock
      var qpPrev = sliceQpY
      var addr = firstMb
      var more = true
      while (more) {
        if (addr >= nMb) throw new IllegalStateException("MB address overrun")
        qpPrev = decodeMb(r, addr, qpPrev, sliceIdx)
        addr += 1
        more = r.moreRbspData()
      }
    }

    // ---- P-slice decode (7.3.4 slice data, CAVLC) --------------------

    /** Decode one P slice: mb_skip_run before every coded macroblock,
      * P_Skip reconstruction for the run, inter/intra macroblocks via
      * [[decodeMbP]]. The single reference picture is `ref` (the
      * previously decoded, deblocked frame) — the decoded subset is
      * one-reference baseline P, so ref_idx syntax never appears.
      */
    def decodeSliceP(r: BitReader, firstMb: Int, sliceQpY: Int,
                     deblock: SliceDeblock): Unit = {
      if (ref == null || ref.yStride != yStride ||
          ref.y.length != yPlane.length)
        throw new IllegalStateException("P slice without a matching reference")
      val sliceIdx = sliceDeblock.length
      sliceDeblock += deblock
      var qpPrev = sliceQpY
      var addr = firstMb
      while (r.moreRbspData()) {
        val skipRun = r.ue()
        var k = 0
        while (k < skipRun) {
          if (addr >= nMb) throw new IllegalStateException("MB address overrun")
          reconSkipMb(addr, qpPrev, sliceIdx)
          addr += 1
          k += 1
        }
        if (r.moreRbspData()) {
          if (addr >= nMb) throw new IllegalStateException("MB address overrun")
          qpPrev = decodeMbP(r, addr, qpPrev, sliceIdx)
          addr += 1
        }
      }
    }

    /** Reconstruct a P_Skip macroblock: derived skip vector, motion
      * compensation only, QPy unchanged.
      */
    private def reconSkipMb(addr: Int, qpPrev: Int, slice: Int): Unit = {
      val mx = addr % wMb
      val my = addr / wMb
      mbSlice(addr) = slice
      mbIsInter(addr) = true
      mbQp(addr) = qpPrev
      val mbOk: Int => Boolean = a => mbSlice(a) == slice
      val (mvx, mvy) = mvSkip(mf, mbOk, mx, my)
      mf.setBlocks(mx * 16, my * 16, 16, 16, mvx, mvy)
      val pred = new Array[Int](256)
      interpLumaBlock(ref.y, yStride, hMb * 16, mx * 16, my * 16, 16, 16,
        mvx, mvy, pred, 16, 0)
      var yy = 0
      while (yy < 16) {
        var xx = 0
        while (xx < 16) {
          yPlane((my * 16 + yy) * yStride + mx * 16 + xx) = pred(yy * 16 + xx).toByte
          xx += 1
        }
        yy += 1
      }
      val cPred = new Array[Int](64)
      var comp = 0
      while (comp < 2) {
        val rp = if (comp == 0) ref.u else ref.v
        val plane = if (comp == 0) uPlane else vPlane
        interpChromaBlock(rp, cStride, hMb * 8, mx * 8, my * 8, 8, 8,
          mvx, mvy, cPred, 8, 0)
        var cy = 0
        while (cy < 8) {
          var cx = 0
          while (cx < 8) {
            plane((my * 8 + cy) * cStride + mx * 8 + cx) = cPred(cy * 8 + cx).toByte
            cx += 1
          }
          cy += 1
        }
        comp += 1
      }
    }

    /** Decode one P-slice macroblock (inter P_L0 partitions, P_8x8 sub
      * partitions, or intra with mb_type offset 5); returns new qpPrev.
      */
    private def decodeMbP(r: BitReader, addr: Int, qpPrev: Int, slice: Int): Int = {
      val mbType = r.ue()
      if (mbType >= 5) { // intra in a P slice: types shift by 5 (7.4.5)
        if (mbType > 30) throw new IllegalStateException(s"bad P mb_type $mbType")
        return decodeIntraMbBody(r, addr, mbType - 5, qpPrev, slice)
      }
      val mx = addr % wMb
      val my = addr / wMb
      mbSlice(addr) = slice
      mbIsInter(addr) = true
      val mbOk: Int => Boolean = a => mbSlice(a) == slice
      val x0 = mx * 16
      val y0 = my * 16
      // ---- partitions + motion vectors (ref_idx never coded: 1 ref)
      mbType match {
        case 0 =>
          val p = mvPredict(mf, mbOk, x0, y0, 16, 16, 0)
          val mvx = p._1 + r.se()
          val mvy = p._2 + r.se()
          mf.setBlocks(x0, y0, 16, 16, mvx, mvy)
        case 1 =>
          var part = 0
          while (part < 2) {
            val py0 = y0 + part * 8
            val p = mvPredict(mf, mbOk, x0, py0, 16, 8, 1 + part)
            val mvx = p._1 + r.se()
            val mvy = p._2 + r.se()
            mf.setBlocks(x0, py0, 16, 8, mvx, mvy)
            part += 1
          }
        case 2 =>
          var part = 0
          while (part < 2) {
            val px0 = x0 + part * 8
            val p = mvPredict(mf, mbOk, px0, y0, 8, 16, 3 + part)
            val mvx = p._1 + r.se()
            val mvy = p._2 + r.se()
            mf.setBlocks(px0, y0, 8, 16, mvx, mvy)
            part += 1
          }
        case _ => // 3 = P_8x8, 4 = P_8x8ref0 (identical with one reference)
          val subTypes = new Array[Int](4)
          var b8 = 0
          while (b8 < 4) {
            val t = r.ue()
            if (t > 3) throw new IllegalStateException(s"bad sub_mb_type $t")
            subTypes(b8) = t
            b8 += 1
          }
          b8 = 0
          while (b8 < 4) {
            val ox = x0 + (b8 % 2) * 8
            val oy = y0 + (b8 / 2) * 8
            val parts = SubMbParts(subTypes(b8))
            var sp = 0
            while (sp < parts.length) {
              val (dx, dy, pw, ph) = parts(sp)
              val p = mvPredict(mf, mbOk, ox + dx, oy + dy, pw, ph, 0)
              val mvx = p._1 + r.se()
              val mvy = p._2 + r.se()
              mf.setBlocks(ox + dx, oy + dy, pw, ph, mvx, mvy)
              sp += 1
            }
            b8 += 1
          }
      }
      // ---- coded block pattern (inter me(v) column) + qp delta
      val codeNum = r.ue()
      if (codeNum > 47) throw new IllegalStateException("bad inter cbp")
      val cbp = CbpInter(codeNum)
      val cbpLuma = cbp & 15
      val cbpChroma = cbp >> 4
      var qpY = qpPrev
      if (cbp != 0) {
        val delta = r.se()
        if (delta < -26 || delta > 25) throw new IllegalStateException("bad qp delta")
        qpY = (qpPrev + delta + 52) % 52
      }
      mbQp(addr) = qpY
      mbCbpLuma(addr) = cbpLuma.toByte
      mbCbpChroma(addr) = cbpChroma.toByte
      // ---- residuals (CAVLC; inter luma blocks carry all 16 coeffs)
      val lumaCoeffs = Array.ofDim[Int](16, 16)
      var i8 = 0
      while (i8 < 4) {
        if ((cbpLuma & (1 << i8)) != 0) {
          var j = 0
          while (j < 4) {
            val b = i8 * 4 + j
            val (ox, oy) = Blk4x4Off(b)
            val nC = lumaNc(mx * 4 + ox / 4, my * 4 + oy / 4, slice)
            val (c, tc) = readResidualBlock(r, nC, 16)
            System.arraycopy(c, 0, lumaCoeffs(b), 0, 16)
            lumaNz(addr * 16 + b) = tc.toByte
            j += 1
          }
        }
        i8 += 1
      }
      val cbDc = new Array[Int](4)
      val crDc = new Array[Int](4)
      if (cbpChroma != 0) {
        val (c0, cbTc) = readResidualBlock(r, -1, 4)
        System.arraycopy(c0, 0, cbDc, 0, 4)
        val (c1, crTc) = readResidualBlock(r, -1, 4)
        System.arraycopy(c1, 0, crDc, 0, 4)
        cbDcNz(addr) = (if (cbTc != 0) 1 else 0).toByte
        crDcNz(addr) = (if (crTc != 0) 1 else 0).toByte
      }
      val cbAc = Array.ofDim[Int](4, 16)
      val crAc = Array.ofDim[Int](4, 16)
      if (cbpChroma == 2) {
        var comp = 0
        while (comp < 2) {
          var b = 0
          while (b < 4) {
            val bx = mx * 2 + b % 2
            val by = my * 2 + b / 2
            val nC = chromaNc(bx, by, comp == 0, slice)
            val (c, tc) = readResidualBlock(r, nC, 15)
            if (comp == 0) {
              System.arraycopy(c, 0, cbAc(b), 1, 15)
              cbNz(addr * 4 + b) = tc.toByte
            } else {
              System.arraycopy(c, 0, crAc(b), 1, 15)
              crNz(addr * 4 + b) = tc.toByte
            }
            b += 1
          }
          comp += 1
        }
      }
      reconInter(mx, my, lumaCoeffs, cbpLuma, cbDc, crDc, cbAc, crAc,
        cbpChroma, qpY)
      qpY
    }

    /** Reconstruct an inter macroblock: per-4x4 motion compensation from
      * the stored motion field (pointwise MC makes per-block prediction
      * identical to per-partition prediction) plus the coded residual.
      */
    private def reconInter(mx: Int, my: Int, lumaCoeffs: Array[Array[Int]],
                           cbpLuma: Int, cbDc: Array[Int], crDc: Array[Int],
                           cbAc: Array[Array[Int]], crAc: Array[Array[Int]],
                           cbpChroma: Int, qpY: Int): Unit = {
      val pred = new Array[Int](16)
      var b4y = 0
      while (b4y < 4) {
        var b4x = 0
        while (b4x < 4) {
          val i = mf.idx(mx * 4 + b4x, my * 4 + b4y)
          interpLumaBlock(ref.y, yStride, hMb * 16, mx * 16 + b4x * 4,
            my * 16 + b4y * 4, 4, 4, mf.mvX(i), mf.mvY(i), pred, 4, 0)
          val zIdx = Blk4x4Idx(b4x)(b4y)
          val res =
            if ((cbpLuma & (1 << (zIdx / 4))) != 0) {
              val d = new Array[Int](16)
              var k = 0
              while (k < 16) {
                val c = lumaCoeffs(zIdx)(k)
                if (c != 0) {
                  val rpos = Zigzag4x4(k)
                  d(rpos) = dequant(c, qpY, rpos / 4, rpos % 4)
                }
                k += 1
              }
              itrans4x4(d)
            } else ZeroRes16
          var yy = 0
          while (yy < 4) {
            var xx = 0
            while (xx < 4) {
              yPlane((my * 16 + b4y * 4 + yy) * yStride + mx * 16 + b4x * 4 + xx) =
                clamp255(pred(yy * 4 + xx) + res(yy * 4 + xx)).toByte
              xx += 1
            }
            yy += 1
          }
          b4x += 1
        }
        b4y += 1
      }
      // chroma: MC per 2x2 sub-block from the co-located luma block's
      // vector (the chroma partition grid is the luma grid at half size)
      val qpC = chromaQp(qpY, pps.chromaQpOffset)
      val cPred = new Array[Int](64) // 8x8 per component
      var comp = 0
      while (comp < 2) {
        val rp = if (comp == 0) ref.u else ref.v
        val plane = if (comp == 0) uPlane else vPlane
        var b4y2 = 0
        while (b4y2 < 4) {
          var b4x2 = 0
          while (b4x2 < 4) {
            val i = mf.idx(mx * 4 + b4x2, my * 4 + b4y2)
            interpChromaBlock(rp, cStride, hMb * 8, mx * 8 + b4x2 * 2,
              my * 8 + b4y2 * 2, 2, 2, mf.mvX(i), mf.mvY(i), cPred, 8,
              b4y2 * 2 * 8 + b4x2 * 2)
            b4x2 += 1
          }
          b4y2 += 1
        }
        val dcIn = if (comp == 0) cbDc else crDc
        val acIn = if (comp == 0) cbAc else crAc
        val dcVals =
          if (cbpChroma != 0) chromaDcDequant(dcIn, qpC) else new Array[Int](4)
        var b = 0
        while (b < 4) {
          val ox = (b % 2) * 4
          val oy = (b / 2) * 4
          val d = new Array[Int](16)
          d(0) = dcVals(b)
          if (cbpChroma == 2) {
            var k = 1
            while (k < 16) {
              val c = acIn(b)(k)
              if (c != 0) {
                val rpos = Zigzag4x4(k)
                d(rpos) = dequant(c, qpC, rpos / 4, rpos % 4)
              }
              k += 1
            }
          }
          val res = itrans4x4(d)
          var yy = 0
          while (yy < 4) {
            var xx = 0
            while (xx < 4) {
              plane((my * 8 + oy + yy) * cStride + mx * 8 + ox + xx) =
                clamp255(cPred((oy + yy) * 8 + ox + xx) + res(yy * 4 + xx)).toByte
              xx += 1
            }
            yy += 1
          }
          b += 1
        }
        comp += 1
      }
    }

    /** Decode one macroblock; returns the updated QPy "previous" value. */
    private def decodeMb(r: BitReader, addr: Int, qpPrev: Int, slice: Int): Int = {
      val mbType = r.ue()
      if (mbType > 25) throw new IllegalStateException(s"bad I mb_type $mbType")
      decodeIntraMbBody(r, addr, mbType, qpPrev, slice)
    }

    /** Body of an intra macroblock, `mbType` already mapped into the I
      * range (0..25): shared by I-slice decode and intra MBs inside P
      * slices (where mb_type arrives offset by 5).
      */
    private def decodeIntraMbBody(r: BitReader, addr: Int, mbType: Int,
                                  qpPrev: Int, slice: Int): Int = {
      val mx = addr % wMb
      val my = addr / wMb
      mbSlice(addr) = slice
      mf.setIntraMb(addr)
      if (mbType == 25) { // I_PCM
        mbIsPcm(addr) = true
        mbQp(addr) = 0 // spec 8.7: QPy of an I_PCM MB is 0 for deblocking
        r.byteAlign()
        var i = 0
        while (i < 256) {
          yPlane((my * 16 + i / 16) * yStride + mx * 16 + i % 16) = r.u(8).toByte
          i += 1
        }
        i = 0
        while (i < 64) {
          uPlane((my * 8 + i / 8) * cStride + mx * 8 + i % 8) = r.u(8).toByte
          i += 1
        }
        i = 0
        while (i < 64) {
          vPlane((my * 8 + i / 8) * cStride + mx * 8 + i % 8) = r.u(8).toByte
          i += 1
        }
        return qpPrev
      }
      val isI4x4 = mbType == 0
      mbIsI4x4(addr) = isI4x4
      // ---- prediction modes
      val i4 = new Array[Int](16)
      if (isI4x4) {
        var b = 0
        while (b < 16) {
          val (ox, oy) = Blk4x4Off(b)
          val bx = mx * 4 + ox / 4
          val by = my * 4 + oy / 4
          def ctxMode(nx: Int, ny: Int): Int = {
            if (nx < 0 || ny < 0) return -1
            val nmb = mbAt(nx / 4, ny / 4)
            if (!mbAvail(nx / 4, ny / 4, slice)) -1
            else if (nmb == addr) i4(Blk4x4Idx((nx % 4))((ny % 4)))
            else if (!mbIsI4x4(nmb)) 2 // non-I4x4 intra neighbor predicts DC
            else i4Modes(nmb * 16 + Blk4x4Idx(nx % 4)(ny % 4))
          }
          val a = ctxMode(bx - 1, by)
          val t = ctxMode(bx, by - 1)
          val pred = if (a < 0 || t < 0) 2 else math.min(a, t)
          val mode =
            if (r.flag()) pred
            else {
              val rem = r.u(3)
              if (rem < pred) rem else rem + 1
            }
          i4(b) = mode
          i4Modes(addr * 16 + b) = mode.toByte
          b += 1
        }
      }
      val predMode16 = if (isI4x4) -1 else (mbType - 1) % 4
      val chromaMode = r.ue()
      if (chromaMode > 3) throw new IllegalStateException("bad chroma mode")
      // ---- coded block pattern + qp
      var cbpLuma = 0
      var cbpChroma = 0
      if (isI4x4) {
        val codeNum = r.ue()
        if (codeNum > 47) throw new IllegalStateException("bad cbp")
        val cbp = CbpIntra(codeNum)
        cbpLuma = cbp & 15
        cbpChroma = cbp >> 4
      } else {
        val v = mbType - 1
        cbpChroma = (v / 4) % 3
        cbpLuma = if (v >= 12) 15 else 0
      }
      var qpY = qpPrev
      if (cbpLuma != 0 || cbpChroma != 0 || !isI4x4) {
        val delta = r.se()
        if (delta < -26 || delta > 25) throw new IllegalStateException("bad qp delta")
        qpY = (qpPrev + delta + 52) % 52
      }
      mbQp(addr) = qpY
      mbChromaMode(addr) = chromaMode.toByte
      mbCbpLuma(addr) = cbpLuma.toByte
      mbCbpChroma(addr) = cbpChroma.toByte
      // ---- residuals (CAVLC)
      val lumaCoeffs = Array.ofDim[Int](16, 16) // per block, zig-zag order
      val dcCoeffs = new Array[Int](16)
      if (!isI4x4) {
        // Intra16x16DCLevel: nC from luma block 0's neighbors
        val (dc, dcTc) = readResidualBlock(r, lumaNc(mx * 4, my * 4, slice), 16)
        System.arraycopy(dc, 0, dcCoeffs, 0, 16)
        lumaDcNz(addr) = (if (dcTc != 0) 1 else 0).toByte
      }
      var i8 = 0
      while (i8 < 4) {
        if ((cbpLuma & (1 << i8)) != 0) {
          var j = 0
          while (j < 4) {
            val b = i8 * 4 + j
            val (ox, oy) = Blk4x4Off(b)
            val bx = mx * 4 + ox / 4
            val by = my * 4 + oy / 4
            val nC = lumaNc(bx, by, slice)
            if (isI4x4) {
              val (c, tc) = readResidualBlock(r, nC, 16)
              System.arraycopy(c, 0, lumaCoeffs(b), 0, 16)
              lumaNz(addr * 16 + b) = tc.toByte
            } else {
              val (c, tc) = readResidualBlock(r, nC, 15)
              System.arraycopy(c, 0, lumaCoeffs(b), 1, 15)
              lumaNz(addr * 16 + b) = tc.toByte
            }
            j += 1
          }
        }
        i8 += 1
      }
      val cbDc = new Array[Int](4)
      val crDc = new Array[Int](4)
      if (cbpChroma != 0) {
        val (c0, cbTc) = readResidualBlock(r, -1, 4)
        System.arraycopy(c0, 0, cbDc, 0, 4)
        val (c1, crTc) = readResidualBlock(r, -1, 4)
        System.arraycopy(c1, 0, crDc, 0, 4)
        cbDcNz(addr) = (if (cbTc != 0) 1 else 0).toByte
        crDcNz(addr) = (if (crTc != 0) 1 else 0).toByte
      }
      val cbAc = Array.ofDim[Int](4, 16)
      val crAc = Array.ofDim[Int](4, 16)
      if (cbpChroma == 2) {
        var comp = 0
        while (comp < 2) {
          var b = 0
          while (b < 4) {
            val bx = mx * 2 + b % 2
            val by = my * 2 + b / 2
            val nC = chromaNc(bx, by, comp == 0, slice)
            val (c, tc) = readResidualBlock(r, nC, 15)
            if (comp == 0) {
              System.arraycopy(c, 0, cbAc(b), 1, 15)
              cbNz(addr * 4 + b) = tc.toByte
            } else {
              System.arraycopy(c, 0, crAc(b), 1, 15)
              crNz(addr * 4 + b) = tc.toByte
            }
            b += 1
          }
          comp += 1
        }
      }
      // ---- reconstruction
      if (isI4x4) reconI4x4(mx, my, i4, lumaCoeffs, qpY, slice)
      else reconI16x16(mx, my, predMode16, dcCoeffs, lumaCoeffs, cbpLuma, qpY, slice)
      reconChroma(mx, my, chromaMode, cbDc, crDc, cbAc, crAc, cbpChroma, qpY, slice)
      qpY
    }

    // ---- CABAC slice decode (9.3) ------------------------------------

    /** Decode one CABAC slice: alignment ones, context init at the slice
      * QP, then macroblocks each followed by end_of_slice_flag. The
      * decoded subset matches the CAVLC path except I_PCM (the engine
      * re-initialization around raw samples is out of subset — real-web
      * encoders do not emit I_PCM; terminate==1 on mb_type fails closed).
      */
    def decodeSliceCabac(r: BitReader, firstMb: Int, sliceQpY: Int,
                         deblock: SliceDeblock): Unit = {
      val sliceIdx = sliceDeblock.length
      sliceDeblock += deblock
      while (r.pos % 8 != 0)
        if (r.u1() != 1) throw new IllegalStateException("cabac alignment")
      val ctx = new Cabac.Contexts(sliceQpY)
      val cd = new Cabac.Decoder(r, ctx)
      var qpPrev = sliceQpY
      var prevQpDelta = 0
      var addr = firstMb
      var more = true
      while (more) {
        if (addr >= nMb) throw new IllegalStateException("MB address overrun")
        val (qpNew, deltaNew) = decodeMbCabac(cd, addr, qpPrev, sliceIdx, prevQpDelta)
        qpPrev = qpNew
        prevQpDelta = deltaNew
        addr += 1
        more = cd.terminate() == 0
      }
    }

    /** condTermFlag sum for a luma 4x4 coded_block_flag (cats 1/2):
      * condA + 2*condB over the left/above 4x4 blocks in absolute block
      * coords. Unavailable neighbors count 1 (all MBs here are intra),
      * I_PCM counts 1, an uncoded block counts 0.
      */
    private def cbfIncLuma(bx: Int, by: Int, slice: Int): Int = {
      def cond(x: Int, y: Int): Int = {
        if (x < 0 || y < 0) return 1
        if (!mbAvail(x / 4, y / 4, slice)) return 1
        val nmb = mbAt(x / 4, y / 4)
        if (mbIsPcm(nmb)) 1
        else if (lumaNz(nmb * 16 + Blk4x4Idx(x % 4)(y % 4)) != 0) 1
        else 0
      }
      cond(bx - 1, by) + 2 * cond(bx, by - 1)
    }

    /** condTermFlag sum for MB-granular coded_block_flags: cat 0 (the
      * Intra16x16 DC block — exists only in I_16x16 neighbors) and cat 3
      * (the chroma DC block — decoded only when the neighbor's chroma
      * cbp is nonzero; the flag arrays default to 0 otherwise).
      */
    private def cbfIncMb(mx: Int, my: Int, slice: Int,
                         flagOf: Int => Int): Int = {
      def cond(x: Int, y: Int): Int = {
        if (x < 0 || y < 0) return 1
        if (!mbAvail(x, y, slice)) return 1
        val nmb = mbAt(x, y)
        if (mbIsPcm(nmb)) 1 else flagOf(nmb)
      }
      cond(mx - 1, my) + 2 * cond(mx, my - 1)
    }

    private def cbfIncChromaAc(bx: Int, by: Int, cb: Boolean, slice: Int): Int = {
      def cond(x: Int, y: Int): Int = {
        if (x < 0 || y < 0) return 1
        if (!mbAvail(x / 2, y / 2, slice)) return 1
        val nmb = mbAt(x / 2, y / 2)
        if (mbIsPcm(nmb)) 1
        else {
          val idx = (y % 2) * 2 + (x % 2)
          if ((if (cb) cbNz(nmb * 4 + idx) else crNz(nmb * 4 + idx)) != 0) 1 else 0
        }
      }
      cond(bx - 1, by) + 2 * cond(bx, by - 1)
    }

    /** residual_block_cabac (7.3.5.3.3): coded_block_flag, significance
      * map, then levels in reverse scan order. Returns (coeffs in scan
      * order, totalCoeff).
      */
    private def readResidualCabac(cd: Cabac.Decoder, cat: Int, cbfInc: Int,
                                  maxCoeff: Int): (Array[Int], Int) = {
      val coeffs = new Array[Int](maxCoeff)
      val cbf = cd.decision(Cabac.CtxCbf + Cabac.CatOffCbf(cat) + cbfInc)
      if (cbf == 0) return (coeffs, 0)
      val sigBase = Cabac.CtxSig + Cabac.CatOffSig(cat)
      val lastBase = Cabac.CtxLast + Cabac.CatOffSig(cat)
      val sig = new Array[Boolean](maxCoeff)
      var i = 0
      var done = false
      while (i < maxCoeff - 1 && !done) {
        val inc = if (cat == 3) math.min(i, 2) else i
        if (cd.decision(sigBase + inc) == 1) {
          sig(i) = true
          if (cd.decision(lastBase + inc) == 1) done = true
        }
        i += 1
      }
      if (!done) sig(maxCoeff - 1) = true
      val absBase = Cabac.CtxAbs + Cabac.CatOffAbs(cat)
      var numEq1 = 0
      var numGt1 = 0
      var tc = 0
      var k = maxCoeff - 1
      while (k >= 0) {
        if (sig(k)) {
          // UEG0 prefix: TU cMax 14 with contexts, suffix EG0 bypass
          val inc0 = if (numGt1 != 0) 0 else math.min(4, 1 + numEq1)
          val incN = 5 + math.min(4 - (if (cat == 3) 1 else 0), numGt1)
          var m = 0
          if (cd.decision(absBase + inc0) == 1) {
            m = 1
            var cont = true
            while (cont && m < 14) {
              if (cd.decision(absBase + incN) == 1) m += 1 else cont = false
            }
            if (m == 14) {
              // EG0 suffix, bypass
              var kk = 0
              while (cd.bypass() == 1) {
                m += 1 << kk
                kk += 1
                if (kk > 30) throw new IllegalStateException("EG0 overrun")
              }
              while (kk > 0) { kk -= 1; m += cd.bypass() << kk }
            }
          }
          val level = m + 1
          val neg = cd.bypass() == 1
          coeffs(k) = if (neg) -level else level
          if (level == 1) numEq1 += 1 else numGt1 += 1
          tc += 1
        }
        k -= 1
      }
      (coeffs, tc)
    }

    /** Decode one CABAC macroblock; returns (new qpPrev, this MB's
      * mb_qp_delta — 0 when the syntax element was absent, feeding the
      * next MB's bin-0 context).
      */
    private def decodeMbCabac(cd: Cabac.Decoder, addr: Int, qpPrev: Int,
                              slice: Int, prevQpDelta: Int): (Int, Int) = {
      val mx = addr % wMb
      val my = addr / wMb
      mbSlice(addr) = slice
      mf.setIntraMb(addr) // CABAC slices are I-only in the decoded subset
      // ---- mb_type (prefix ctx by I_NxN-ness of A/B)
      def condNotI4(x: Int, y: Int): Int =
        if (!mbAvail(x, y, slice)) 0
        else if (!mbIsI4x4(mbAt(x, y))) 1
        else 0
      val mbTypeInc = condNotI4(mx - 1, my) + condNotI4(mx, my - 1)
      var mbType = 0
      if (cd.decision(Cabac.CtxMbTypeI + mbTypeInc) == 1) {
        if (cd.terminate() == 1)
          throw new IllegalStateException("I_PCM in CABAC slice: out of subset")
        val lumaBit = cd.decision(Cabac.CtxMbTypeI + 3)
        var ch = 0
        if (cd.decision(Cabac.CtxMbTypeI + 4) == 1)
          ch = if (cd.decision(Cabac.CtxMbTypeI + 5) == 1) 2 else 1
        val pm = (cd.decision(Cabac.CtxMbTypeI + 6) << 1) |
          cd.decision(Cabac.CtxMbTypeI + 7)
        mbType = 1 + pm + 4 * ch + 12 * lumaBit
      }
      val isI4x4 = mbType == 0
      mbIsI4x4(addr) = isI4x4
      // ---- prediction modes
      val i4 = new Array[Int](16)
      if (isI4x4) {
        var b = 0
        while (b < 16) {
          val (ox, oy) = Blk4x4Off(b)
          val bx = mx * 4 + ox / 4
          val by = my * 4 + oy / 4
          def ctxMode(nx: Int, ny: Int): Int = {
            if (nx < 0 || ny < 0) return -1
            val nmb = mbAt(nx / 4, ny / 4)
            if (!mbAvail(nx / 4, ny / 4, slice)) -1
            else if (nmb == addr) i4(Blk4x4Idx((nx % 4))((ny % 4)))
            else if (!mbIsI4x4(nmb)) 2
            else i4Modes(nmb * 16 + Blk4x4Idx(nx % 4)(ny % 4))
          }
          val a = ctxMode(bx - 1, by)
          val t = ctxMode(bx, by - 1)
          val pred = if (a < 0 || t < 0) 2 else math.min(a, t)
          val mode =
            if (cd.decision(Cabac.CtxPrevI4Mode) == 1) pred
            else {
              // rem_intra4x4_pred_mode: FL, LSB first (9.3.2.4)
              var rem = 0
              var j = 0
              while (j < 3) {
                rem |= cd.decision(Cabac.CtxRemI4Mode) << j
                j += 1
              }
              if (rem < pred) rem else rem + 1
            }
          i4(b) = mode
          i4Modes(addr * 16 + b) = mode.toByte
          b += 1
        }
      }
      val predMode16 = if (isI4x4) -1 else (mbType - 1) % 4
      // ---- intra_chroma_pred_mode (TU cMax 3; bin0 ctx by neighbors)
      def condChroma(x: Int, y: Int): Int =
        if (!mbAvail(x, y, slice)) 0
        else {
          val nmb = mbAt(x, y)
          if (mbIsPcm(nmb) || mbChromaMode(nmb) == 0) 0 else 1
        }
      val chromaInc = condChroma(mx - 1, my) + condChroma(mx, my - 1)
      var chromaMode = 0
      if (cd.decision(Cabac.CtxIntraChroma + chromaInc) == 1) {
        chromaMode = 1
        if (cd.decision(Cabac.CtxIntraChroma + 3) == 1) {
          chromaMode = 2
          if (cd.decision(Cabac.CtxIntraChroma + 3) == 1) chromaMode = 3
        }
      }
      // ---- coded block pattern + qp
      var cbpLuma = 0
      var cbpChroma = 0
      if (isI4x4) {
        // luma: 4 bins, one per 8x8; neighbor 8x8s with a ZERO bit raise
        // the context (9.3.3.1.1.4); PCM counts as coded
        var b8 = 0
        while (b8 < 4) {
          def cond(nmbOpt: Int, nb: Int, cur: Boolean): Int = {
            if (cur) return if ((cbpLuma & (1 << nb)) != 0) 0 else 1
            if (nmbOpt < 0) 0
            else {
              val nmb = nmbOpt
              if (mbIsPcm(nmb)) 0
              else if ((mbCbpLuma(nmb) & (1 << nb)) != 0) 0
              else 1
            }
          }
          val condA =
            if (b8 % 2 == 1) cond(-1, b8 - 1, cur = true)
            else if (mbAvail(mx - 1, my, slice)) cond(mbAt(mx - 1, my), b8 + 1, cur = false)
            else 0
          val condB =
            if (b8 >= 2) cond(-1, b8 - 2, cur = true)
            else if (mbAvail(mx, my - 1, slice)) cond(mbAt(mx, my - 1), b8 + 2, cur = false)
            else 0
          val bit = cd.decision(Cabac.CtxCbpLuma + condA + 2 * condB)
          cbpLuma |= bit << b8
          b8 += 1
        }
        // chroma: 2 bins (TU cMax 2); PCM neighbors count as cbp 2
        def condC0(x: Int, y: Int): Int =
          if (!mbAvail(x, y, slice)) 0
          else {
            val nmb = mbAt(x, y)
            if (mbIsPcm(nmb) || mbCbpChroma(nmb) != 0) 1 else 0
          }
        def condC1(x: Int, y: Int): Int =
          if (!mbAvail(x, y, slice)) 0
          else {
            val nmb = mbAt(x, y)
            if (mbIsPcm(nmb) || mbCbpChroma(nmb) == 2) 1 else 0
          }
        val inc0 = condC0(mx - 1, my) + 2 * condC0(mx, my - 1)
        if (cd.decision(Cabac.CtxCbpChroma + inc0) == 1) {
          val inc1 = 4 + condC1(mx - 1, my) + 2 * condC1(mx, my - 1)
          cbpChroma = if (cd.decision(Cabac.CtxCbpChroma + inc1) == 1) 2 else 1
        }
      } else {
        val v = mbType - 1
        cbpChroma = (v / 4) % 3
        cbpLuma = if (v >= 12) 15 else 0
      }
      var qpY = qpPrev
      var qpDelta = 0
      if (cbpLuma != 0 || cbpChroma != 0 || !isI4x4) {
        // mb_qp_delta: unary of the mapped value, ctx by prev MB's delta
        var mapped = 0
        if (cd.decision(Cabac.CtxMbQpDelta + (if (prevQpDelta != 0) 1 else 0)) == 1) {
          mapped = 1
          if (cd.decision(Cabac.CtxMbQpDelta + 2) == 1) {
            mapped = 2
            while (mapped <= 52 && cd.decision(Cabac.CtxMbQpDelta + 3) == 1)
              mapped += 1
            if (mapped > 52) throw new IllegalStateException("qp delta overrun")
          }
        }
        qpDelta = if (mapped % 2 == 1) (mapped + 1) / 2 else -(mapped / 2)
        if (qpDelta < -26 || qpDelta > 25) throw new IllegalStateException("bad qp delta")
        qpY = (qpPrev + qpDelta + 52) % 52
      }
      mbQp(addr) = qpY
      mbChromaMode(addr) = chromaMode.toByte
      mbCbpLuma(addr) = cbpLuma.toByte
      mbCbpChroma(addr) = cbpChroma.toByte
      // ---- residuals
      val lumaCoeffs = Array.ofDim[Int](16, 16)
      val dcCoeffs = new Array[Int](16)
      if (!isI4x4) {
        val inc = cbfIncMb(mx, my, slice, nmb =>
          if (!mbIsI4x4(nmb) && lumaDcNz(nmb) != 0) 1 else 0)
        val (dc, dcTc) = readResidualCabac(cd, 0, inc, 16)
        System.arraycopy(dc, 0, dcCoeffs, 0, 16)
        lumaDcNz(addr) = (if (dcTc != 0) 1 else 0).toByte
      }
      var i8 = 0
      while (i8 < 4) {
        if ((cbpLuma & (1 << i8)) != 0) {
          var j = 0
          while (j < 4) {
            val b = i8 * 4 + j
            val (ox, oy) = Blk4x4Off(b)
            val bx = mx * 4 + ox / 4
            val by = my * 4 + oy / 4
            val inc = cbfIncLuma(bx, by, slice)
            if (isI4x4) {
              val (c, tc) = readResidualCabac(cd, 2, inc, 16)
              System.arraycopy(c, 0, lumaCoeffs(b), 0, 16)
              lumaNz(addr * 16 + b) = tc.toByte
            } else {
              val (c, tc) = readResidualCabac(cd, 1, inc, 15)
              System.arraycopy(c, 0, lumaCoeffs(b), 1, 15)
              lumaNz(addr * 16 + b) = tc.toByte
            }
            j += 1
          }
        }
        i8 += 1
      }
      val cbDc = new Array[Int](4)
      val crDc = new Array[Int](4)
      if (cbpChroma != 0) {
        val incCb = cbfIncMb(mx, my, slice, nmb => cbDcNz(nmb).toInt)
        val (c0, cbTc) = readResidualCabac(cd, 3, incCb, 4)
        System.arraycopy(c0, 0, cbDc, 0, 4)
        cbDcNz(addr) = (if (cbTc != 0) 1 else 0).toByte
        val incCr = cbfIncMb(mx, my, slice, nmb => crDcNz(nmb).toInt)
        val (c1, crTc) = readResidualCabac(cd, 3, incCr, 4)
        System.arraycopy(c1, 0, crDc, 0, 4)
        crDcNz(addr) = (if (crTc != 0) 1 else 0).toByte
      }
      val cbAc = Array.ofDim[Int](4, 16)
      val crAc = Array.ofDim[Int](4, 16)
      if (cbpChroma == 2) {
        var comp = 0
        while (comp < 2) {
          var b = 0
          while (b < 4) {
            val bx = mx * 2 + b % 2
            val by = my * 2 + b / 2
            val inc = cbfIncChromaAc(bx, by, comp == 0, slice)
            val (c, tc) = readResidualCabac(cd, 4, inc, 15)
            if (comp == 0) {
              System.arraycopy(c, 0, cbAc(b), 1, 15)
              cbNz(addr * 4 + b) = tc.toByte
            } else {
              System.arraycopy(c, 0, crAc(b), 1, 15)
              crNz(addr * 4 + b) = tc.toByte
            }
            b += 1
          }
          comp += 1
        }
      }
      // ---- reconstruction (shared with the CAVLC path)
      if (isI4x4) reconI4x4(mx, my, i4, lumaCoeffs, qpY, slice)
      else reconI16x16(mx, my, predMode16, dcCoeffs, lumaCoeffs, cbpLuma, qpY, slice)
      reconChroma(mx, my, chromaMode, cbDc, crDc, cbAc, crAc, cbpChroma, qpY, slice)
      (qpY, if (cbpLuma != 0 || cbpChroma != 0 || !isI4x4) qpDelta else 0)
    }

    // ---- luma 4x4 intra prediction + reconstruction ------------------

    /** Reconstruct an Intra_4x4 macroblock: per-block predict (from
      * unfiltered reconstructed neighbors, including earlier blocks of
      * this MB), inverse-transform, add, clamp (8.3.1, 8.5).
      */
    private def reconI4x4(mx: Int, my: Int, modes: Array[Int],
                          coeffs: Array[Array[Int]], qp: Int, slice: Int): Unit = {
      var b = 0
      while (b < 16) {
        val (ox, oy) = Blk4x4Off(b)
        val x0 = mx * 16 + ox
        val y0 = my * 16 + oy
        val pred = predict4x4(x0, y0, b, modes(b), slice)
        // dequant + itrans (all 16 coeffs; zig-zag -> raster)
        val d = new Array[Int](16)
        var k = 0
        while (k < 16) {
          val c = coeffs(b)(k)
          if (c != 0) {
            val rpos = Zigzag4x4(k)
            d(rpos) = dequant(c, qp, rpos / 4, rpos % 4)
          }
          k += 1
        }
        val res = itrans4x4(d)
        var yy = 0
        while (yy < 4) {
          var xx = 0
          while (xx < 4) {
            val p = (y0 + yy) * yStride + x0 + xx
            yPlane(p) = clamp255(pred(yy * 4 + xx) + res(yy * 4 + xx)).toByte
            xx += 1
          }
          yy += 1
        }
        b += 1
      }
    }


    /** 4x4 luma intra prediction (8.3.1.2). Returns 16 predicted samples.
      * Throws if the mode needs unavailable neighbors (non-conforming).
      */
    private def predict4x4(x0: Int, y0: Int, blkIdx: Int, mode: Int,
                           slice: Int): Array[Int] = {
      val leftAvail = x0 > 0 && mbAvail((x0 - 1) / 16, y0 / 16, slice)
      val aboveAvail = y0 > 0 && mbAvail(x0 / 16, (y0 - 1) / 16, slice)
      val cornerAvail = x0 > 0 && y0 > 0 && mbAvail((x0 - 1) / 16, (y0 - 1) / 16, slice)
      // above-right: the 4x4 block holding sample (x0+4, y0-1) must be
      // decoded BEFORE this block (picture raster for other MBs, z-scan
      // within this MB)
      val arAvail = {
        if (y0 == 0 || x0 + 4 >= wMb * 16) false
        else {
          val nmx = (x0 + 4) / 16
          val nmy = (y0 - 1) / 16
          val cmx = x0 / 16
          val cmy = y0 / 16
          if (nmx == cmx && nmy == cmy) {
            // same MB: earlier in z-scan?
            val nIdx = Blk4x4Idx(((x0 + 4) % 16) / 4)(((y0 - 1) % 16) / 4)
            nIdx < blkIdx && mbAvail(nmx, nmy, slice)
          } else {
            val nAddr = nmy * wMb + nmx
            val cAddr = cmy * wMb + cmx
            nAddr < cAddr && mbAvail(nmx, nmy, slice)
          }
        }
      }
      // pa = above row p[0..7,-1]; pl = left col p[-1,0..3]; pc = corner
      val pa = new Array[Int](8)
      val pl = new Array[Int](4)
      var pc = 0
      if (aboveAvail) {
        var i = 0
        while (i < 4) { pa(i) = yAt(x0 + i, y0 - 1); i += 1 }
        if (arAvail) {
          i = 4
          while (i < 8) { pa(i) = yAt(x0 + i, y0 - 1); i += 1 }
        } else {
          i = 4
          while (i < 8) { pa(i) = pa(3); i += 1 }
        }
      }
      if (leftAvail) {
        var j = 0
        while (j < 4) { pl(j) = yAt(x0 - 1, y0 + j); j += 1 }
      }
      if (cornerAvail) pc = yAt(x0 - 1, y0 - 1)
predI4(mode, pa, pl, pc, aboveAvail, leftAvail, cornerAvail)
    }

    /** Reconstruct an Intra_16x16 macroblock (8.3.3 + 8.5.10). */
    private def reconI16x16(mx: Int, my: Int, mode: Int, dc: Array[Int],
                            ac: Array[Array[Int]], cbpLuma: Int, qp: Int,
                            slice: Int): Unit = {
      val x0 = mx * 16
      val y0 = my * 16
      val leftAvail = x0 > 0 && mbAvail(mx - 1, my, slice)
      val aboveAvail = y0 > 0 && mbAvail(mx, my - 1, slice)
      val cornerAvail = leftAvail && aboveAvail && mbAvail(mx - 1, my - 1, slice)
      val top = new Array[Int](16)
      val left = new Array[Int](16)
      if (aboveAvail) { var i = 0; while (i < 16) { top(i) = yAt(x0 + i, y0 - 1); i += 1 } }
      if (leftAvail) { var i = 0; while (i < 16) { left(i) = yAt(x0 - 1, y0 + i); i += 1 } }
      val corner = if (cornerAvail) yAt(x0 - 1, y0 - 1) else 0
      val pred = predI16(mode, top, left, corner, aboveAvail, leftAvail, cornerAvail)
      // luma DC: inverse zig-zag scan (8.5.6), then Hadamard + scaling;
      // the results scatter into the 16 blocks' position 0
      val dcRaster = new Array[Int](16)
      var zk = 0
      while (zk < 16) { dcRaster(Zigzag4x4(zk)) = dc(zk); zk += 1 }
      val dcVals = lumaDcDequant(dcRaster, qp)
      var b = 0
      while (b < 16) {
        val (ox, oy) = Blk4x4Off(b)
        val d = new Array[Int](16)
        // raster index of this block inside the DC 4x4 array: the DC
        // block is laid out in RASTER order of 4x4 blocks (8.5.6)
        d(0) = dcVals((oy / 4) * 4 + ox / 4)
        if ((cbpLuma & (1 << (b / 4))) != 0) {
          var k = 1
          while (k < 16) {
            val c = ac(b)(k)
            if (c != 0) {
              val rpos = Zigzag4x4(k)
              d(rpos) = dequant(c, qp, rpos / 4, rpos % 4)
            }
            k += 1
          }
        }
        val res = itrans4x4(d)
        var yy = 0
        while (yy < 4) {
          var xx = 0
          while (xx < 4) {
            val px = x0 + ox + xx
            val py = y0 + oy + yy
            yPlane(py * yStride + px) =
              clamp255(pred((oy + yy) * 16 + ox + xx) + res(yy * 4 + xx)).toByte
            xx += 1
          }
          yy += 1
        }
        b += 1
      }
    }

    /** Reconstruct both chroma components (8.3.4 + 8.5.11). */
    private def reconChroma(mx: Int, my: Int, mode: Int, cbDc: Array[Int],
                            crDc: Array[Int], cbAc: Array[Array[Int]],
                            crAc: Array[Array[Int]], cbpChroma: Int, qpY: Int,
                            slice: Int): Unit = {
      val qpC = chromaQp(qpY, pps.chromaQpOffset)
      val x0 = mx * 8
      val y0 = my * 8
      val leftAvail = x0 > 0 && mbAvail(mx - 1, my, slice)
      val aboveAvail = y0 > 0 && mbAvail(mx, my - 1, slice)
      val cornerAvail = leftAvail && aboveAvail && mbAvail(mx - 1, my - 1, slice)
      var comp = 0
      while (comp < 2) {
        val plane = if (comp == 0) uPlane else vPlane
        @inline def cAt(x: Int, y: Int): Int = plane(y * cStride + x) & 0xff
        val top = new Array[Int](8)
        val left = new Array[Int](8)
        if (aboveAvail) { var i = 0; while (i < 8) { top(i) = cAt(x0 + i, y0 - 1); i += 1 } }
        if (leftAvail) { var i = 0; while (i < 8) { left(i) = cAt(x0 - 1, y0 + i); i += 1 } }
        val corner = if (cornerAvail) cAt(x0 - 1, y0 - 1) else 0
        val pred = predChroma(mode, top, left, corner, aboveAvail, leftAvail, cornerAvail)
        // residual: DC (always when cbpChroma != 0) + AC (cbpChroma == 2)
        val dcIn = if (comp == 0) cbDc else crDc
        val acIn = if (comp == 0) cbAc else crAc
        val dcVals =
          if (cbpChroma != 0) chromaDcDequant(dcIn, qpC) else new Array[Int](4)
        var b = 0
        while (b < 4) {
          val ox = (b % 2) * 4
          val oy = (b / 2) * 4
          val d = new Array[Int](16)
          d(0) = dcVals(b)
          if (cbpChroma == 2) {
            var k = 1
            while (k < 16) {
              val c = acIn(b)(k)
              if (c != 0) {
                val rpos = Zigzag4x4(k)
                d(rpos) = dequant(c, qpC, rpos / 4, rpos % 4)
              }
              k += 1
            }
          }
          val res = itrans4x4(d)
          var yy = 0
          while (yy < 4) {
            var xx = 0
            while (xx < 4) {
              val px = x0 + ox + xx
              val py = y0 + oy + yy
              plane(py * cStride + px) =
                clamp255(pred((oy + yy) * 8 + ox + xx) + res(yy * 4 + xx)).toByte
              xx += 1
            }
            yy += 1
          }
          b += 1
        }
        comp += 1
      }
    }

    // ---- in-loop deblocking (8.7) ------------------------------------

    /** Apply the deblocking filter across the whole picture: macroblocks
      * in raster order, each MB's vertical edges left-to-right then its
      * horizontal edges top-to-bottom. In an I-only picture bS is 4 on MB
      * edges and 3 on internal transform edges.
      */
    def deblockPicture(): Unit = {
      var my = 0
      while (my < hMb) {
        var mx = 0
        while (mx < wMb) {
          val addr = mbAt(mx, my)
          val db = sliceDeblock(mbSlice(addr))
          if (db.disableIdc != 1) {
            val sameSliceOnly = db.disableIdc == 2
            def edgeAllowed(nmx: Int, nmy: Int): Boolean = {
              val n = mbAt(nmx, nmy)
              mbSlice(n) >= 0 && (!sameSliceOnly || mbSlice(n) == mbSlice(addr))
            }
            val qpCur = mbQp(addr)
            // vertical edges (filter across columns)
            var e = 0
            while (e < 4) {
              val isMbEdge = e == 0
              if (!isMbEdge || (mx > 0 && edgeAllowed(mx - 1, my))) {
                val qpLeft = if (isMbEdge) mbQp(mbAt(mx - 1, my)) else qpCur
                val qpAv = (qpLeft + qpCur + 1) >> 1
                val qBx = mx * 4 + e
                val bs4 = new Array[Int](4)
                var g = 0
                while (g < 4) {
                  bs4(g) = boundaryStrength(qBx - 1, my * 4 + g, qBx,
                    my * 4 + g, isMbEdge)
                  g += 1
                }
                var row = 0
                while (row < 16) {
                  val bS = bs4(row / 4)
                  if (bS > 0)
                    filterLumaLine(yPlane, (my * 16 + row) * yStride + mx * 16 + e * 4,
                      1, bS, qpAv, db)
                  row += 1
                }
                if (e == 0 || e == 2) {
                  val ce = e * 2 // chroma x offset 0 or 4
                  val qpcAv = (chromaQp(qpLeft, pps.chromaQpOffset) +
                    chromaQp(qpCur, pps.chromaQpOffset) + 1) >> 1
                  var crow = 0
                  while (crow < 8) {
                    val bS = bs4(crow / 2)
                    if (bS > 0) {
                      filterChromaLine(uPlane, (my * 8 + crow) * cStride + mx * 8 + ce,
                        1, bS, qpcAv, db)
                      filterChromaLine(vPlane, (my * 8 + crow) * cStride + mx * 8 + ce,
                        1, bS, qpcAv, db)
                    }
                    crow += 1
                  }
                }
              }
              e += 1
            }
            // horizontal edges (filter across rows)
            e = 0
            while (e < 4) {
              val isMbEdge = e == 0
              if (!isMbEdge || (my > 0 && edgeAllowed(mx, my - 1))) {
                val qpTop = if (isMbEdge) mbQp(mbAt(mx, my - 1)) else qpCur
                val qpAv = (qpTop + qpCur + 1) >> 1
                val qBy = my * 4 + e
                val bs4 = new Array[Int](4)
                var g = 0
                while (g < 4) {
                  bs4(g) = boundaryStrength(mx * 4 + g, qBy - 1, mx * 4 + g,
                    qBy, isMbEdge)
                  g += 1
                }
                var colI = 0
                while (colI < 16) {
                  val bS = bs4(colI / 4)
                  if (bS > 0)
                    filterLumaLine(yPlane, (my * 16 + e * 4) * yStride + mx * 16 + colI,
                      yStride, bS, qpAv, db)
                  colI += 1
                }
                if (e == 0 || e == 2) {
                  val ce = e * 2
                  val qpcAv = (chromaQp(qpTop, pps.chromaQpOffset) +
                    chromaQp(qpCur, pps.chromaQpOffset) + 1) >> 1
                  var ccol = 0
                  while (ccol < 8) {
                    val bS = bs4(ccol / 2)
                    if (bS > 0) {
                      filterChromaLine(uPlane, (my * 8 + ce) * cStride + mx * 8 + ccol,
                        cStride, bS, qpcAv, db)
                      filterChromaLine(vPlane, (my * 8 + ce) * cStride + mx * 8 + ccol,
                        cStride, bS, qpcAv, db)
                    }
                    ccol += 1
                  }
                }
              }
              e += 1
            }
          }
          mx += 1
        }
        my += 1
      }
    }

    /** Boundary strength (8.7.2.1, frame-picture subset): `q` is the 4x4
      * block at global block coords (qBx,qBy), `p` its left (vertical
      * edge) or upper (horizontal edge) neighbor. Either side intra
      * (incl. I_PCM) gives the fixed 4/3 of an all-intra picture; both
      * inter compares coded residual, then motion distance (the single
      * reference picture of the decoded subset never differs).
      */
    private def boundaryStrength(pBx: Int, pBy: Int, qBx: Int, qBy: Int,
                                 mbEdge: Boolean): Int = {
      val pMb = (pBy / 4) * wMb + pBx / 4
      val qMb = (qBy / 4) * wMb + qBx / 4
      if (!mbIsInter(pMb) || !mbIsInter(qMb)) {
        if (mbEdge) 4 else 3
      } else {
        val pNz = lumaNz(pMb * 16 + Blk4x4Idx(pBx % 4)(pBy % 4)) != 0
        val qNz = lumaNz(qMb * 16 + Blk4x4Idx(qBx % 4)(qBy % 4)) != 0
        if (pNz || qNz) 2
        else {
          val pi = mf.idx(pBx, pBy)
          val qi = mf.idx(qBx, qBy)
          if (math.abs(mf.mvX(pi) - mf.mvX(qi)) >= 4 ||
              math.abs(mf.mvY(pi) - mf.mvY(qi)) >= 4) 1
          else 0
        }
      }
    }

    /** Filter one luma line across an edge: px(base-1*step)=p0,
      * px(base)=q0. p side is the LOWER address side (left/top).
      */
    private def filterLumaLine(px: Array[Byte], base: Int, step: Int, bS: Int,
                               qpAv: Int, db: SliceDeblock): Unit = {
      val idxA = math.max(0, math.min(51, qpAv + db.alphaOff))
      val idxB = math.max(0, math.min(51, qpAv + db.betaOff))
      val alpha = AlphaTable(idxA)
      val beta = BetaTable(idxB)
      @inline def g(i: Int): Int = px(base + i * step) & 0xff // q side: i>=0
      @inline def gp(i: Int): Int = px(base - (i + 1) * step) & 0xff // p side
      val p0 = gp(0); val q0 = g(0)
      val p1 = gp(1); val q1 = g(1)
      if (math.abs(p0 - q0) >= alpha || math.abs(p1 - p0) >= beta ||
          math.abs(q1 - q0) >= beta) return
      val p2 = gp(2); val q2 = g(2)
      val ap = math.abs(p2 - p0) < beta
      val aq = math.abs(q2 - q0) < beta
      if (bS == 4) {
        val smallGap = math.abs(p0 - q0) < ((alpha >> 2) + 2)
        if (ap && smallGap) {
          val p3 = gp(3)
          px(base - step) = ((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3).toByte
          px(base - 2 * step) = ((p2 + p1 + p0 + q0 + 2) >> 2).toByte
          px(base - 3 * step) = ((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3).toByte
        } else {
          px(base - step) = ((2 * p1 + p0 + q1 + 2) >> 2).toByte
        }
        if (aq && smallGap) {
          val q3 = g(3)
          px(base) = ((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3).toByte
          px(base + step) = ((q2 + q1 + q0 + p0 + 2) >> 2).toByte
          px(base + 2 * step) = ((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3).toByte
        } else {
          px(base) = ((2 * q1 + q0 + p1 + 2) >> 2).toByte
        }
      } else {
        val tc0 = Tc0Table(bS - 1)(idxA)
        val tc = tc0 + (if (ap) 1 else 0) + (if (aq) 1 else 0)
        val delta0 = (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3
        val delta = math.max(-tc, math.min(tc, delta0))
        px(base - step) = clamp255(p0 + delta).toByte
        px(base) = clamp255(q0 - delta).toByte
        if (ap) {
          val dp = math.max(-tc0, math.min(tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1))
          px(base - 2 * step) = (p1 + dp).toByte
        }
        if (aq) {
          val dq = math.max(-tc0, math.min(tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1))
          px(base + step) = (q1 + dq).toByte
        }
      }
    }

    private def filterChromaLine(px: Array[Byte], base: Int, step: Int, bS: Int,
                                 qpcAv: Int, db: SliceDeblock): Unit = {
      val idxA = math.max(0, math.min(51, qpcAv + db.alphaOff))
      val idxB = math.max(0, math.min(51, qpcAv + db.betaOff))
      val alpha = AlphaTable(idxA)
      val beta = BetaTable(idxB)
      val p1 = px(base - 2 * step) & 0xff
      val p0 = px(base - step) & 0xff
      val q0 = px(base) & 0xff
      val q1 = px(base + step) & 0xff
      if (math.abs(p0 - q0) >= alpha || math.abs(p1 - p0) >= beta ||
          math.abs(q1 - q0) >= beta) return
      if (bS == 4) {
        px(base - step) = ((2 * p1 + p0 + q1 + 2) >> 2).toByte
        px(base) = ((2 * q1 + q0 + p1 + 2) >> 2).toByte
      } else {
        val tc = Tc0Table(bS - 1)(idxA) + 1
        val delta0 = (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3
        val delta = math.max(-tc, math.min(tc, delta0))
        px(base - step) = clamp255(p0 + delta).toByte
        px(base) = clamp255(q0 - delta).toByte
      }
    }
  }

  /** Table 8-16: alpha' by index 0..51. */
  private[scale] val AlphaTable: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
    32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182,
    203, 226, 255, 255)

  /** Table 8-16: beta' by index 0..51. */
  private[scale] val BetaTable: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8,
    9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16,
    17, 17, 18, 18)

  /** Table 8-17: t'C0 by (bS-1)(index). Only bS=3 (and trivially 4 via the
    * strong filter) occurs in an I-only picture; rows 1 and 2 are carried
    * for completeness of the published table.
    */
  private[scale] val Tc0Table: Array[Array[Int]] = Array(
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1,
      1, 1, 2, 2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 6, 6, 7,
      8, 9, 10, 11),
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
      2, 2, 2, 2, 3, 3, 3, 4, 4, 5, 5, 6, 7, 8, 8, 10,
      11, 12, 13, 15),
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2,
      3, 3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14,
      16, 18, 20, 23))

  /** 4x4 luma intra prediction over gathered neighbor samples (8.3.1.2):
    * `pa` = above row p[0..7,-1] (above-right already substituted),
    * `pl` = left column p[-1,0..3], `pc` = p[-1,-1]. Shared by the decoder
    * and the encoder's reconstruction loop. Throws if `mode` needs
    * unavailable samples.
    */
  private[scale] def predI4(mode: Int, pa: Array[Int], pl: Array[Int], pc: Int,
                            aboveAvail: Boolean, leftAvail: Boolean,
                            cornerAvail: Boolean): Array[Int] = {
      val out = new Array[Int](16)
      @inline def put(x: Int, y: Int, v: Int): Unit = out(y * 4 + x) = v
      def need(cond: Boolean): Unit =
        if (!cond) throw new IllegalStateException(s"i4 mode $mode needs unavailable samples")
      mode match {
        case 0 => // Vertical
          need(aboveAvail)
          var y = 0
          while (y < 4) { var x = 0; while (x < 4) { put(x, y, pa(x)); x += 1 }; y += 1 }
        case 1 => // Horizontal
          need(leftAvail)
          var y = 0
          while (y < 4) { var x = 0; while (x < 4) { put(x, y, pl(y)); x += 1 }; y += 1 }
        case 2 => // DC
          val v =
            if (aboveAvail && leftAvail)
              (pa(0) + pa(1) + pa(2) + pa(3) + pl(0) + pl(1) + pl(2) + pl(3) + 4) >> 3
            else if (aboveAvail) (pa(0) + pa(1) + pa(2) + pa(3) + 2) >> 2
            else if (leftAvail) (pl(0) + pl(1) + pl(2) + pl(3) + 2) >> 2
            else 128
          java.util.Arrays.fill(out, v)
        case 3 => // Diagonal-Down-Left
          need(aboveAvail)
          var y = 0
          while (y < 4) {
            var x = 0
            while (x < 4) {
              val v =
                if (x == 3 && y == 3) (pa(6) + 3 * pa(7) + 2) >> 2
                else (pa(x + y) + 2 * pa(x + y + 1) + pa(x + y + 2) + 2) >> 2
              put(x, y, v); x += 1
            }
            y += 1
          }
        case 4 => // Diagonal-Down-Right
          need(aboveAvail && leftAvail && cornerAvail)
          @inline def a4(i: Int): Int = if (i < 0) pc else pa(i)
          @inline def l4(j: Int): Int = if (j < 0) pc else pl(j)
          var y = 0
          while (y < 4) {
            var x = 0
            while (x < 4) {
              val v =
                if (x > y) (a4(x - y - 2) + 2 * a4(x - y - 1) + a4(x - y) + 2) >> 2
                else if (x < y) (l4(y - x - 2) + 2 * l4(y - x - 1) + l4(y - x) + 2) >> 2
                else (pa(0) + 2 * pc + pl(0) + 2) >> 2
              put(x, y, v); x += 1
            }
            y += 1
          }
        case 5 => // Vertical-Right
          need(aboveAvail && leftAvail && cornerAvail)
          @inline def a(i: Int): Int = if (i < 0) pc else pa(i)
          var y = 0
          while (y < 4) {
            var x = 0
            while (x < 4) {
              val z = 2 * x - y
              val v =
                if (z >= 0 && z % 2 == 0) (a(x - (y >> 1) - 1) + a(x - (y >> 1)) + 1) >> 1
                else if (z >= 0) (a(x - (y >> 1) - 2) + 2 * a(x - (y >> 1) - 1) + a(x - (y >> 1)) + 2) >> 2
                else if (z == -1) (pl(0) + 2 * pc + pa(0) + 2) >> 2
                else { // zVR = -2, -3: left column with the corner at -1
                  @inline def l5(j: Int): Int = if (j < 0) pc else pl(j)
                  (l5(y - 1) + 2 * l5(y - 2) + l5(y - 3) + 2) >> 2
                }
              put(x, y, v); x += 1
            }
            y += 1
          }
        case 6 => // Horizontal-Down
          need(aboveAvail && leftAvail && cornerAvail)
          @inline def l(j: Int): Int = if (j < 0) pc else pl(j)
          @inline def a6(i: Int): Int = if (i < 0) pc else pa(i)
          var y = 0
          while (y < 4) {
            var x = 0
            while (x < 4) {
              val z = 2 * y - x
              val v =
                if (z >= 0 && z % 2 == 0) (l(y - (x >> 1) - 1) + l(y - (x >> 1)) + 1) >> 1
                else if (z >= 0) (l(y - (x >> 1) - 2) + 2 * l(y - (x >> 1) - 1) + l(y - (x >> 1)) + 2) >> 2
                else if (z == -1) (pl(0) + 2 * pc + pa(0) + 2) >> 2
                else (a6(x - 1) + 2 * a6(x - 2) + a6(x - 3) + 2) >> 2
              put(x, y, v); x += 1
            }
            y += 1
          }
        case 7 => // Vertical-Left
          need(aboveAvail)
          var y = 0
          while (y < 4) {
            var x = 0
            while (x < 4) {
              val v =
                if (y % 2 == 0) (pa(x + (y >> 1)) + pa(x + (y >> 1) + 1) + 1) >> 1
                else (pa(x + (y >> 1)) + 2 * pa(x + (y >> 1) + 1) + pa(x + (y >> 1) + 2) + 2) >> 2
              put(x, y, v); x += 1
            }
            y += 1
          }
        case 8 => // Horizontal-Up
          need(leftAvail)
          var y = 0
          while (y < 4) {
            var x = 0
            while (x < 4) {
              val z = x + 2 * y
              val v =
                if (z < 5 && z % 2 == 0) (pl(y + (x >> 1)) + pl(y + (x >> 1) + 1) + 1) >> 1
                else if (z < 5) (pl(y + (x >> 1)) + 2 * pl(y + (x >> 1) + 1) + pl(y + (x >> 1) + 2) + 2) >> 2
                else if (z == 5) (pl(2) + 3 * pl(3) + 2) >> 2
                else pl(3)
              put(x, y, v); x += 1
            }
            y += 1
          }
        case m => throw new IllegalStateException(s"bad i4 mode $m")
      }
      out
  }

  /** 16x16 luma intra prediction over gathered neighbors (8.3.3):
    * `top` = p[0..15,-1], `left` = p[-1,0..15], `corner` = p[-1,-1].
    */
  private[scale] def predI16(mode: Int, top: Array[Int], left: Array[Int],
                             corner: Int, aboveAvail: Boolean,
                             leftAvail: Boolean, cornerAvail: Boolean): Array[Int] = {
    val pred = new Array[Int](256)
    mode match {
      case 0 =>
        if (!aboveAvail) throw new IllegalStateException("i16 V needs above")
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) { pred(y * 16 + x) = top(x); x += 1 }
          y += 1
        }
      case 1 =>
        if (!leftAvail) throw new IllegalStateException("i16 H needs left")
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) { pred(y * 16 + x) = left(y); x += 1 }
          y += 1
        }
      case 2 =>
        var sum = 0
        if (aboveAvail && leftAvail) {
          var i = 0
          while (i < 16) { sum += top(i) + left(i); i += 1 }
          sum = (sum + 16) >> 5
        } else if (aboveAvail) {
          var i = 0
          while (i < 16) { sum += top(i); i += 1 }
          sum = (sum + 8) >> 4
        } else if (leftAvail) {
          var i = 0
          while (i < 16) { sum += left(i); i += 1 }
          sum = (sum + 8) >> 4
        } else sum = 128
        java.util.Arrays.fill(pred, sum)
      case 3 =>
        if (!(aboveAvail && leftAvail && cornerAvail))
          throw new IllegalStateException("i16 plane needs all neighbors")
        var hh = 0
        var vv = 0
        var i = 0
        while (i < 8) {
          val ra = if (6 - i >= 0) top(6 - i) else corner
          val la = if (6 - i >= 0) left(6 - i) else corner
          hh += (i + 1) * (top(8 + i) - ra)
          vv += (i + 1) * (left(8 + i) - la)
          i += 1
        }
        val a = 16 * (left(15) + top(15))
        val b = (5 * hh + 32) >> 6
        val c = (5 * vv + 32) >> 6
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) {
            pred(y * 16 + x) = clamp255Pub((a + b * (x - 7) + c * (y - 7) + 16) >> 5)
            x += 1
          }
          y += 1
        }
      case m => throw new IllegalStateException(s"bad i16 mode $m")
    }
    pred
  }

  /** 8x8 chroma intra prediction over gathered neighbors (8.3.4):
    * `top` = p[0..7,-1], `left` = p[-1,0..7], `corner` = p[-1,-1].
    */
  private[scale] def predChroma(mode: Int, top: Array[Int], left: Array[Int],
                                corner: Int, aboveAvail: Boolean,
                                leftAvail: Boolean, cornerAvail: Boolean): Array[Int] = {
    val pred = new Array[Int](64)
    mode match {
      case 0 => // DC, per 4x4 block (8.3.4.1)
        var by = 0
        while (by < 2) {
          var bx = 0
          while (bx < 2) {
            var sumTop = 0
            var sumLeft = 0
            var i = 0
            while (i < 4) {
              sumTop += top(bx * 4 + i)
              sumLeft += left(by * 4 + i)
              i += 1
            }
            val v =
              if (bx == by) {
                if (aboveAvail && leftAvail) (sumTop + sumLeft + 4) >> 3
                else if (aboveAvail) (sumTop + 2) >> 2
                else if (leftAvail) (sumLeft + 2) >> 2
                else 128
              } else if (bx == 1) {
                if (aboveAvail) (sumTop + 2) >> 2
                else if (leftAvail) (sumLeft + 2) >> 2
                else 128
              } else {
                if (leftAvail) (sumLeft + 2) >> 2
                else if (aboveAvail) (sumTop + 2) >> 2
                else 128
              }
            var j = 0
            while (j < 4) {
              var k = 0
              while (k < 4) { pred((by * 4 + j) * 8 + bx * 4 + k) = v; k += 1 }
              j += 1
            }
            bx += 1
          }
          by += 1
        }
      case 1 => // Horizontal
        if (!leftAvail) throw new IllegalStateException("chroma H needs left")
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) { pred(y * 8 + x) = left(y); x += 1 }
          y += 1
        }
      case 2 => // Vertical
        if (!aboveAvail) throw new IllegalStateException("chroma V needs above")
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) { pred(y * 8 + x) = top(x); x += 1 }
          y += 1
        }
      case 3 => // Plane
        if (!(aboveAvail && leftAvail && cornerAvail))
          throw new IllegalStateException("chroma plane needs all neighbors")
        var hh = 0
        var vv = 0
        var i = 0
        while (i < 4) {
          val ra = if (2 - i >= 0) top(2 - i) else corner
          val la = if (2 - i >= 0) left(2 - i) else corner
          hh += (i + 1) * (top(4 + i) - ra)
          vv += (i + 1) * (left(4 + i) - la)
          i += 1
        }
        val a = 16 * (left(7) + top(7))
        val b = (17 * hh + 16) >> 5
        val c = (17 * vv + 16) >> 5
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            pred(y * 8 + x) = clamp255Pub((a + b * (x - 3) + c * (y - 3) + 16) >> 5)
            x += 1
          }
          y += 1
        }
      case m => throw new IllegalStateException(s"bad chroma mode $m")
    }
    pred
  }

  // ------------------------------------------------------------------
  // Top-level decode
  // ------------------------------------------------------------------

  /** A decoded frame: 4:2:0 planes at macroblock-aligned size plus the
    * display crop from the SPS.
    */
  private[scale] final case class Frame(width: Int, height: Int,
                                        y: Array[Byte], u: Array[Byte],
                                        v: Array[Byte], yStride: Int,
                                        cStride: Int, sps: Sps)

  /** Result of decoding one access unit: the picture, its frame_num (for
    * reference-chain continuity checks), whether it was an IDR, and
    * whether any slice was marked as a reference (nal_ref_idc != 0).
    */
  private[scale] final case class AuResult(frame: Frame, frameNum: Int,
                                           isIdr: Boolean, isRef: Boolean)

  /** Decode one access unit from a sequence of NAL units (each with its
    * 1-byte header at offset 0, emulation bytes still present). SPS/PPS
    * may arrive in-band or via `extraSps`/`extraPps` (the avcC path).
    * `ref` is the previously decoded reference picture — required by P
    * slices, ignored by I slices. None = outside the decoded subset
    * (CABAC P, B slices, weighted prediction, >1 active reference,
    * reference-list modification, adaptive marking) or non-conforming.
    */
  private[scale] def decodeAuNals(nals: Seq[Array[Byte]],
                                  extraSps: Seq[Array[Byte]] = Nil,
                                  extraPps: Seq[Array[Byte]] = Nil,
                                  ref: Frame = null): Option[AuResult] = {
    try {
      val spsMap = scala.collection.mutable.Map.empty[Int, Sps]
      val ppsMap = scala.collection.mutable.Map.empty[Int, Pps]
      def addSps(payload: Array[Byte], from: Int): Boolean =
        parseSps(new BitReader(rbsp(payload, from, payload.length))) match {
          case Some(s) => spsMap(s.spsId) = s; true
          case None => false
        }
      def addPps(payload: Array[Byte], from: Int): Boolean =
        parsePps(new BitReader(rbsp(payload, from, payload.length))) match {
          case Some(p) => ppsMap(p.ppsId) = p; true
          case None => false
        }
      extraSps.foreach(s => if (!addSps(s, if ((s(0) & 0x1f) == 7) 1 else 0)) return None)
      extraPps.foreach(p => if (!addPps(p, if ((p(0) & 0x1f) == 8) 1 else 0)) return None)
      var dec: Decoder = null
      var mbCovered = 0
      var auFrameNum = -1
      var sawIdr = false
      var sawNonIdr = false
      var sawRef = false
      nals.foreach { nal =>
        if (nal.length >= 1) {
          if ((nal(0) & 0x80) != 0) return None // forbidden_zero_bit
          val nalType = nal(0) & 0x1f
          val refIdc = (nal(0) >> 5) & 3
          nalType match {
            case 7 => if (!addSps(nal, 1)) return None
            case 8 => if (!addPps(nal, 1)) return None
            case 5 | 1 => // coded slice (IDR / non-IDR)
              val isIdr = nalType == 5
              if (isIdr && refIdc == 0) return None // 7.4.1: IDR is a reference
              if (isIdr) sawIdr = true else sawNonIdr = true
              if (sawIdr && sawNonIdr) return None // mixed AU: non-conforming
              if (refIdc != 0) sawRef = true
              val r = new BitReader(rbsp(nal, 1, nal.length))
              val firstMb = r.ue()
              val sliceType = r.ue()
              val isP = sliceType == 0 || sliceType == 5
              val isI = sliceType == 2 || sliceType == 7
              if (!isI && !isP) return None // B/SP/SI: out of subset
              if (isIdr && !isI) return None
              val ppsId = r.ue()
              val pps = ppsMap.getOrElse(ppsId, return None)
              val sps = spsMap.getOrElse(pps.spsId, return None)
              val frameNum = r.u(sps.log2MaxFrameNum)
              if (auFrameNum >= 0 && frameNum != auFrameNum) return None
              auFrameNum = frameNum
              if (isIdr) r.ue() // idr_pic_id
              if (sps.pocType == 0) {
                r.u(sps.log2MaxPocLsb)
                if (pps.picOrderPresent) r.se()
              } else if (sps.pocType == 1 && !sps.pocDeltaZero) {
                r.se() // delta_pic_order_cnt[0]
                if (pps.picOrderPresent) r.se() // delta_pic_order_cnt[1]
              }
              if (pps.redundantPicCnt && r.ue() != 0) return None
              if (isP) {
                if (pps.cabac) return None // CABAC P: out of subset
                if (pps.weightedPred) return None
                if (pps.constrainedIntra) return None
                if (ref == null) return None
                // one active reference only (the decoded subset)
                val active =
                  if (r.flag()) r.ue() + 1 // num_ref_idx_active_override
                  else pps.numRefL0Default + 1
                if (active != 1) return None
                if (r.flag()) return None // ref_pic_list_modification_flag_l0
              }
              if (isIdr) {
                r.u1() // no_output_of_prior_pics
                r.u1() // long_term_reference_flag
              } else if (refIdc != 0) {
                if (r.flag()) return None // adaptive_ref_pic_marking: out of subset
              }
              val sliceQp = pps.picInitQp + r.se()
              if (sliceQp < 0 || sliceQp > 51) return None
              var disableIdc = 0
              var aOff = 0
              var bOff = 0
              if (pps.deblockCtrl) {
                disableIdc = r.ue()
                if (disableIdc > 2) return None
                if (disableIdc != 1) { aOff = 2 * r.se(); bOff = 2 * r.se() }
              }
              if (dec == null) dec = new Decoder(sps, pps, ref)
              else if (dec.sps != sps || dec.pps != pps) return None
              val before = dec.mbSlice.count(_ >= 0)
              val db = SliceDeblock(disableIdc, aOff, bOff)
              if (isP) dec.decodeSliceP(r, firstMb, sliceQp, db)
              else if (pps.cabac) dec.decodeSliceCabac(r, firstMb, sliceQp, db)
              else dec.decodeSlice(r, firstMb, sliceQp, db)
              mbCovered = dec.mbSlice.count(_ >= 0)
              if (mbCovered == before) return None
            case _ => () // SEI / AUD / filler: ignored
          }
        }
      }
      if (dec == null || mbCovered != dec.nMb) return None // partial picture
      dec.deblockPicture()
      Some(AuResult(Frame(dec.sps.width, dec.sps.height, dec.yPlane,
        dec.uPlane, dec.vPlane, dec.yStride, dec.cStride, dec.sps),
        auFrameNum, sawIdr, sawRef))
    } catch {
      case e @ (_: IllegalStateException | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException | _: NoSuchElementException) =>
        if (sys.env.contains("AVC_DEBUG")) e.printStackTrace()
        None
    }
  }

  /** Decode one IDR access unit (the single-keyframe shape): rejects any
    * AU that is not an IDR picture. See [[decodeAuNals]].
    */
  private[scale] def decodeIdrNals(nals: Seq[Array[Byte]],
                                   extraSps: Seq[Array[Byte]] = Nil,
                                   extraPps: Seq[Array[Byte]] = Nil): Option[Frame] =
    decodeAuNals(nals, extraSps, extraPps, null).filter(_.isIdr).map(_.frame)

  /** Crop a decoded frame's luma to the display rectangle as 8-bit gray
    * (the near-dup ingest shape shared with [[Vp8.decodeGray]]). The crop
    * window comes from the SPS the decoder actually selected for the
    * slice (carried in [[Frame]]), never from a caller-supplied parse of
    * the first config SPS — an avcC with two SPS of different geometry
    * cannot misalign or overrun the plane.
    */
  private[scale] def frameGray(f: Frame): Array[Byte] = {
    val out = new Array[Byte](f.width * f.height)
    var y = 0
    while (y < f.height) {
      System.arraycopy(f.y, (y + 2 * f.sps.cropT) * f.yStride + 2 * f.sps.cropL,
        out, y * f.width, f.width)
      y += 1
    }
    out
  }

  /** Split one AVCC-framed (length-prefixed) sample into NAL units, or
    * None on malformed framing.
    */
  private def avccSampleNals(lengthSize: Int,
                             sample: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (lengthSize < 1 || lengthSize > 4) return None
    val nals = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var i = 0
    while (i + lengthSize <= sample.length) {
      var len = 0L
      var k = 0
      while (k < lengthSize) { len = (len << 8) | (sample(i + k) & 0xff); k += 1 }
      i += lengthSize
      if (len <= 0 || i + len > sample.length) return None
      nals += java.util.Arrays.copyOfRange(sample, i, i + len.toInt)
      i += len.toInt
    }
    if (i != sample.length || nals.isEmpty) None else Some(nals.toSeq)
  }

  /** Decode one AVCC-framed sample (length-prefixed NALs) using the
    * codec-config SPS/PPS sets. Returns the cropped luma as 8-bit gray.
    * IDR pictures only — a sample sequence with P frames goes through
    * [[decodeSamplesGray]], which carries the reference chain.
    */
  def decodeSampleGray(sps: Seq[Array[Byte]], pps: Seq[Array[Byte]],
                       lengthSize: Int, sample: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    avccSampleNals(lengthSize, sample).flatMap(nals =>
      decodeIdrNals(nals, sps, pps).map(f => (f.width, f.height, frameGray(f))))

  /** Decode an ORDERED sequence of AVCC-framed samples with the
    * single-reference P chain of the decoded subset: every non-IDR
    * picture predicts from the previously decoded reference picture,
    * frame_num must step by one between reference pictures (a gap means
    * a lost reference — fail closed, never misdecode), and the first
    * sample must be an IDR. Returns each frame's cropped luma. None if
    * ANY sample falls outside the subset — a partially decodable track
    * never votes.
    */
  def decodeSamplesGray(sps: Seq[Array[Byte]], pps: Seq[Array[Byte]],
                        lengthSize: Int, samples: Seq[Array[Byte]])
      : Option[Seq[(Int, Int, Array[Byte])]] = {
    var prev: Frame = null
    var prevFn = -1
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Array[Byte])]
    samples.foreach { sample =>
      val nals = avccSampleNals(lengthSize, sample).getOrElse(return None)
      decodeAuNals(nals, sps, pps, prev) match {
        case None => return None
        case Some(res) =>
          if (!res.isIdr) {
            if (prev == null) return None // open-GOP start: out of subset
            val m = 1 << res.frame.sps.log2MaxFrameNum
            if (res.frameNum != (prevFn + 1) % m) return None
          }
          out += ((res.frame.width, res.frame.height, frameGray(res.frame)))
          if (res.isIdr || res.isRef) { prev = res.frame; prevFn = res.frameNum }
      }
    }
    Some(out.toSeq)
  }

  /** Decode an Annex-B byte stream containing SPS+PPS+IDR (the raw
    * `.h264` shape). Returns cropped luma gray.
    */
  def decodeAnnexBGray(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val ranges = annexBNals(b)
    if (ranges.isEmpty) return None
    val nals = ranges.map { case (s, e) => java.util.Arrays.copyOfRange(b, s, e) }
    decodeIdrNals(nals).map(f => (f.width, f.height, frameGray(f)))
  }

  // ------------------------------------------------------------------
  // Encoder (fixture generator)
  // ------------------------------------------------------------------
  // Quantizer scales derived from THIS decoder's exact dequant formulas
  // (see the scaling derivations above): the inverse-transform pair
  // satisfies itrans(W ⊙ 64/(t_i t_j)) = X with t = (4,5,4,5), so the
  // lossless level for forward coefficient W at position class k is
  // W * 64 / (t² * V[qp%6][k] * 2^(qp/6)). Any quantizer is spec-valid
  // (conformance constrains only syntax + decoder math); this one is the
  // exact inverse at qp%6-aligned magnitudes, so low-QP fixtures are
  // near-lossless.

  /** Forward 4x4 core transform W = C X C^T, C per 8.5.12's inverse pair. */
  private[scale] def ftrans4x4(x: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a = x(4 * i); val b = x(4 * i + 1); val c = x(4 * i + 2); val d = x(4 * i + 3)
      val s0 = a + d; val s1 = b + c; val s2 = b - c; val s3 = a - d
      t(4 * i) = s0 + s1; t(4 * i + 1) = 2 * s3 + s2
      t(4 * i + 2) = s0 - s1; t(4 * i + 3) = s3 - 2 * s2
      i += 1
    }
    val w = new Array[Int](16)
    var j = 0
    while (j < 4) {
      val a = t(j); val b = t(4 + j); val c = t(8 + j); val d = t(12 + j)
      val s0 = a + d; val s1 = b + c; val s2 = b - c; val s3 = a - d
      w(j) = s0 + s1; w(4 + j) = 2 * s3 + s2
      w(8 + j) = s0 - s1; w(12 + j) = s3 - 2 * s2
      j += 1
    }
    w
  }

  /** Forward 4x4 Hadamard (luma DC), plain butterflies. */
  private def fhadamard4(x: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a = x(4 * i); val b = x(4 * i + 1); val c = x(4 * i + 2); val d = x(4 * i + 3)
      val s0 = a + d; val s1 = b + c; val s2 = b - c; val s3 = a - d
      t(4 * i) = s0 + s1; t(4 * i + 1) = s3 + s2
      t(4 * i + 2) = s0 - s1; t(4 * i + 3) = s3 - s2
      i += 1
    }
    val w = new Array[Int](16)
    var j = 0
    while (j < 4) {
      val a = t(j); val b = t(4 + j); val c = t(8 + j); val d = t(12 + j)
      val s0 = a + d; val s1 = b + c; val s2 = b - c; val s3 = a - d
      w(j) = s0 + s1; w(4 + j) = s3 + s2; w(8 + j) = s0 - s1; w(12 + j) = s3 - s2
      j += 1
    }
    w
  }

  @inline private def quantLevel(w: Int, qp: Int, i: Int, j: Int): Int = {
    val cls = posClass(i, j)
    val t2 = if (cls == 0) 16.0 else if (cls == 1) 25.0 else 20.0
    val step = t2 * NormAdjust(qp % 6)(cls) * (1L << (qp / 6)) / 64.0
    math.round(w / step).toInt
  }

  /** Encoder state: mirrors the decoder's reconstruction so intra
    * prediction feeds back decoder-identical samples.
    */
  private final class EncState(val wMb: Int, val hMb: Int) {
    val yStride = wMb * 16
    val cStride = wMb * 8
    val y = new Array[Byte](yStride * hMb * 16)
    val u = new Array[Byte](cStride * hMb * 8)
    val v = new Array[Byte](cStride * hMb * 8)
    val lumaNz = new Array[Byte](wMb * hMb * 16)
    val cbNz = new Array[Byte](wMb * hMb * 4)
    val crNz = new Array[Byte](wMb * hMb * 4)
    val i4Modes = Array.fill[Byte](wMb * hMb * 16)(-1)
    val isI4x4 = new Array[Boolean](wMb * hMb)
    val isPcm = new Array[Boolean](wMb * hMb)
    val sliceId = Array.fill(wMb * hMb)(-1)
    // CABAC context-neighbor state, mirroring the decoder's arrays
    val chromaModeE = new Array[Byte](wMb * hMb)
    val cbpLumaE = new Array[Byte](wMb * hMb)
    val cbpChromaE = new Array[Byte](wMb * hMb)
    val lumaDcNzE = new Array[Byte](wMb * hMb)
    val cbDcNzE = new Array[Byte](wMb * hMb)
    val crDcNzE = new Array[Byte](wMb * hMb)
    /** nC for a luma block at absolute 4-pel coords, decoder-identical
      * (neighbors in another slice are unavailable, like the decoder).
      */
    def lumaNc(bx: Int, by: Int, slice: Int): Int = {
      def nzAt(x: Int, y: Int): Int = {
        val mb = (y / 4) * wMb + x / 4
        if (isPcm(mb)) 16 else lumaNz(mb * 16 + Blk4x4Idx(x % 4)(y % 4))
      }
      val a = bx > 0 && sliceId(((by / 4) * wMb) + (bx - 1) / 4) == slice
      val b = by > 0 && sliceId((((by - 1) / 4) * wMb) + bx / 4) == slice
      if (a && b) (nzAt(bx - 1, by) + nzAt(bx, by - 1) + 1) >> 1
      else if (a) nzAt(bx - 1, by)
      else if (b) nzAt(bx, by - 1)
      else 0
    }
    def chromaNcE(bx: Int, by: Int, cb: Boolean, slice: Int): Int = {
      def nzAt(x: Int, y: Int): Int = {
        val mb = (y / 2) * wMb + x / 2
        if (isPcm(mb)) 16
        else {
          val idx = (y % 2) * 2 + (x % 2)
          if (cb) cbNz(mb * 4 + idx) else crNz(mb * 4 + idx)
        }
      }
      val a = bx > 0 && sliceId(((by / 2) * wMb) + (bx - 1) / 2) == slice
      val b = by > 0 && sliceId((((by - 1) / 2) * wMb) + bx / 2) == slice
      if (a && b) (nzAt(bx - 1, by) + nzAt(bx, by - 1) + 1) >> 1
      else if (a) nzAt(bx - 1, by)
      else if (b) nzAt(bx, by - 1)
      else 0
    }
  }

  // ------------------------------------------------------------------
  // Entropy-layer sink: encodeMb emits macroblock syntax through this
  // interface so one MB encoder drives both the CAVLC and CABAC
  // backends (decode-side mirror: decodeMb / decodeMbCabac).
  // ------------------------------------------------------------------
  private trait MbSink {
    def mbTypeI(v: Int, addr: Int): Unit
    def pcmSamples(sy: Array[Int], su: Array[Int], sv: Array[Int]): Unit
    def i4Mode(predFlag: Boolean, rem: Int): Unit
    def chromaMode(mode: Int, addr: Int): Unit
    def cbpI4(luma: Int, chroma: Int, addr: Int): Unit
    def qpDelta(delta: Int): Unit
    /** cat 0 I16DC / 1 I16AC / 2 Luma4x4 / 3 ChromaDC / 4 ChromaAC;
      * `coeffs` in scan order sized maxNumCoeff (AC: 15).
      */
    def residual(cat: Int, coeffs: Array[Int], addr: Int, blk: Int, cb: Boolean): Unit
    def endMb(last: Boolean): Unit
    def finish(): Unit
  }

  private final class CavlcSink(w: BitWriter, st: EncState, slice: Int) extends MbSink {
    def mbTypeI(v: Int, addr: Int): Unit = w.ue(v)
    def pcmSamples(sy: Array[Int], su: Array[Int], sv: Array[Int]): Unit = {
      w.alignZero()
      sy.foreach(v => w.u(8, v))
      su.foreach(v => w.u(8, v))
      sv.foreach(v => w.u(8, v))
    }
    def i4Mode(predFlag: Boolean, rem: Int): Unit =
      if (predFlag) w.u1(1) else { w.u1(0); w.u(3, rem) }
    def chromaMode(mode: Int, addr: Int): Unit = w.ue(mode)
    def cbpI4(luma: Int, chroma: Int, addr: Int): Unit =
      w.ue(CbpIntraInv(luma | (chroma << 4)))
    def qpDelta(delta: Int): Unit = w.se(delta)
    def residual(cat: Int, coeffs: Array[Int], addr: Int, blk: Int, cb: Boolean): Unit = {
      val mx = addr % st.wMb
      val my = addr / st.wMb
      val nC = cat match {
        case 0 => st.lumaNc(mx * 4, my * 4, slice)
        case 1 | 2 =>
          val (ox, oy) = Blk4x4Off(blk)
          st.lumaNc(mx * 4 + ox / 4, my * 4 + oy / 4, slice)
        case 3 => -1
        case _ => st.chromaNcE(mx * 2 + blk % 2, my * 2 + blk / 2, cb, slice)
      }
      writeResidualBlock(w, nC, coeffs)
    }
    def endMb(last: Boolean): Unit = ()
    def finish(): Unit = w.rbspTrailing()
  }

  /** CABAC backend: context-increment derivations mirror the decoder's
    * (decodeMbCabac and its cbfInc helpers) against the encoder state.
    */
  private final class CabacSink(w: BitWriter, st: EncState, slice: Int,
                                sliceQp: Int) extends MbSink {
    private val ctx = new Cabac.Contexts(sliceQp)
    private val enc = new Cabac.Encoder(w, ctx)
    private var prevQpDelta = 0
    private var sawQpDelta = false

    @inline private def availMb(mx: Int, my: Int): Boolean =
      mx >= 0 && my >= 0 && mx < st.wMb &&
        st.sliceId(my * st.wMb + mx) == slice

    def mbTypeI(v: Int, addr: Int): Unit = {
      val mx = addr % st.wMb
      val my = addr / st.wMb
      def cond(x: Int, y: Int): Int =
        if (availMb(x, y) && !st.isI4x4(y * st.wMb + x)) 1 else 0
      val inc = cond(mx - 1, my) + cond(mx, my - 1)
      if (v == 0) enc.decision(Cabac.CtxMbTypeI + inc, 0)
      else {
        require(v != 25, "I_PCM is outside the CABAC subset")
        enc.decision(Cabac.CtxMbTypeI + inc, 1)
        enc.terminate(0)
        val t = v - 1
        enc.decision(Cabac.CtxMbTypeI + 3, if (t >= 12) 1 else 0)
        val ch = (t / 4) % 3
        if (ch == 0) enc.decision(Cabac.CtxMbTypeI + 4, 0)
        else {
          enc.decision(Cabac.CtxMbTypeI + 4, 1)
          enc.decision(Cabac.CtxMbTypeI + 5, if (ch == 2) 1 else 0)
        }
        val pm = t % 4
        enc.decision(Cabac.CtxMbTypeI + 6, pm >> 1)
        enc.decision(Cabac.CtxMbTypeI + 7, pm & 1)
      }
    }

    def pcmSamples(sy: Array[Int], su: Array[Int], sv: Array[Int]): Unit =
      throw new IllegalStateException("I_PCM is outside the CABAC subset")

    def i4Mode(predFlag: Boolean, rem: Int): Unit = {
      enc.decision(Cabac.CtxPrevI4Mode, if (predFlag) 1 else 0)
      if (!predFlag) {
        var j = 0
        while (j < 3) { // FL, LSB first (9.3.2.4)
          enc.decision(Cabac.CtxRemI4Mode, (rem >> j) & 1)
          j += 1
        }
      }
    }

    def chromaMode(mode: Int, addr: Int): Unit = {
      val mx = addr % st.wMb
      val my = addr / st.wMb
      def cond(x: Int, y: Int): Int =
        if (!availMb(x, y)) 0
        else {
          val nmb = y * st.wMb + x
          if (st.isPcm(nmb) || st.chromaModeE(nmb) == 0) 0 else 1
        }
      val inc = cond(mx - 1, my) + cond(mx, my - 1)
      if (mode == 0) enc.decision(Cabac.CtxIntraChroma + inc, 0)
      else {
        enc.decision(Cabac.CtxIntraChroma + inc, 1)
        enc.decision(Cabac.CtxIntraChroma + 3, if (mode >= 2) 1 else 0)
        if (mode >= 2)
          enc.decision(Cabac.CtxIntraChroma + 3, if (mode == 3) 1 else 0)
      }
    }

    def cbpI4(luma: Int, chroma: Int, addr: Int): Unit = {
      val mx = addr % st.wMb
      val my = addr / st.wMb
      var b8 = 0
      while (b8 < 4) {
        val condA =
          if (b8 % 2 == 1) { if (((luma >> (b8 - 1)) & 1) != 0) 0 else 1 }
          else if (availMb(mx - 1, my)) {
            val nmb = my * st.wMb + mx - 1
            if (st.isPcm(nmb) || ((st.cbpLumaE(nmb) >> (b8 + 1)) & 1) != 0) 0 else 1
          } else 0
        val condB =
          if (b8 >= 2) { if (((luma >> (b8 - 2)) & 1) != 0) 0 else 1 }
          else if (availMb(mx, my - 1)) {
            val nmb = (my - 1) * st.wMb + mx
            if (st.isPcm(nmb) || ((st.cbpLumaE(nmb) >> (b8 + 2)) & 1) != 0) 0 else 1
          } else 0
        enc.decision(Cabac.CtxCbpLuma + condA + 2 * condB, (luma >> b8) & 1)
        b8 += 1
      }
      def condC0(x: Int, y: Int): Int =
        if (!availMb(x, y)) 0
        else {
          val nmb = y * st.wMb + x
          if (st.isPcm(nmb) || st.cbpChromaE(nmb) != 0) 1 else 0
        }
      def condC1(x: Int, y: Int): Int =
        if (!availMb(x, y)) 0
        else {
          val nmb = y * st.wMb + x
          if (st.isPcm(nmb) || st.cbpChromaE(nmb) == 2) 1 else 0
        }
      val inc0 = condC0(mx - 1, my) + 2 * condC0(mx, my - 1)
      enc.decision(Cabac.CtxCbpChroma + inc0, if (chroma != 0) 1 else 0)
      if (chroma != 0) {
        val inc1 = 4 + condC1(mx - 1, my) + 2 * condC1(mx, my - 1)
        enc.decision(Cabac.CtxCbpChroma + inc1, if (chroma == 2) 1 else 0)
      }
    }

    def qpDelta(delta: Int): Unit = {
      sawQpDelta = true
      val mapped = if (delta > 0) 2 * delta - 1 else -2 * delta
      val inc0 = if (prevQpDelta != 0) 1 else 0
      if (mapped == 0) enc.decision(Cabac.CtxMbQpDelta + inc0, 0)
      else {
        enc.decision(Cabac.CtxMbQpDelta + inc0, 1)
        if (mapped == 1) enc.decision(Cabac.CtxMbQpDelta + 2, 0)
        else {
          enc.decision(Cabac.CtxMbQpDelta + 2, 1)
          var j = 2
          while (j < mapped) { enc.decision(Cabac.CtxMbQpDelta + 3, 1); j += 1 }
          enc.decision(Cabac.CtxMbQpDelta + 3, 0)
        }
      }
      prevQpDelta = delta
    }

    private def cbfIncLuma(bx: Int, by: Int): Int = {
      def cond(x: Int, y: Int): Int = {
        if (x < 0 || y < 0) return 1
        if (!availMb(x / 4, y / 4)) return 1
        val nmb = (y / 4) * st.wMb + x / 4
        if (st.isPcm(nmb)) 1
        else if (st.lumaNz(nmb * 16 + Blk4x4Idx(x % 4)(y % 4)) != 0) 1
        else 0
      }
      cond(bx - 1, by) + 2 * cond(bx, by - 1)
    }

    private def cbfIncMb(mx: Int, my: Int, flagOf: Int => Int): Int = {
      def cond(x: Int, y: Int): Int = {
        if (x < 0 || y < 0) return 1
        if (!availMb(x, y)) return 1
        val nmb = y * st.wMb + x
        if (st.isPcm(nmb)) 1 else flagOf(nmb)
      }
      cond(mx - 1, my) + 2 * cond(mx, my - 1)
    }

    private def cbfIncChromaAc(bx: Int, by: Int, cb: Boolean): Int = {
      def cond(x: Int, y: Int): Int = {
        if (x < 0 || y < 0) return 1
        if (!availMb(x / 2, y / 2)) return 1
        val nmb = (y / 2) * st.wMb + x / 2
        if (st.isPcm(nmb)) 1
        else {
          val idx = (y % 2) * 2 + (x % 2)
          if ((if (cb) st.cbNz(nmb * 4 + idx) else st.crNz(nmb * 4 + idx)) != 0) 1
          else 0
        }
      }
      cond(bx - 1, by) + 2 * cond(bx, by - 1)
    }

    def residual(cat: Int, coeffs: Array[Int], addr: Int, blk: Int, cb: Boolean): Unit = {
      val mx = addr % st.wMb
      val my = addr / st.wMb
      val inc = cat match {
        case 0 => cbfIncMb(mx, my, nmb =>
          if (!st.isI4x4(nmb) && st.lumaDcNzE(nmb) != 0) 1 else 0)
        case 1 | 2 =>
          val (ox, oy) = Blk4x4Off(blk)
          cbfIncLuma(mx * 4 + ox / 4, my * 4 + oy / 4)
        case 3 => cbfIncMb(mx, my, nmb =>
          (if (cb) st.cbDcNzE(nmb) else st.crDcNzE(nmb)).toInt)
        case _ => cbfIncChromaAc(mx * 2 + blk % 2, my * 2 + blk / 2, cb)
      }
      val maxCoeff = coeffs.length
      var lastNz = -1
      var k = 0
      while (k < maxCoeff) { if (coeffs(k) != 0) lastNz = k; k += 1 }
      enc.decision(Cabac.CtxCbf + Cabac.CatOffCbf(cat) + inc,
        if (lastNz >= 0) 1 else 0)
      if (lastNz < 0) return
      val sigBase = Cabac.CtxSig + Cabac.CatOffSig(cat)
      val lastBase = Cabac.CtxLast + Cabac.CatOffSig(cat)
      var i = 0
      while (i < maxCoeff - 1 && i <= lastNz) {
        val sInc = if (cat == 3) math.min(i, 2) else i
        if (coeffs(i) != 0) {
          enc.decision(sigBase + sInc, 1)
          enc.decision(lastBase + sInc, if (i == lastNz) 1 else 0)
        } else enc.decision(sigBase + sInc, 0)
        i += 1
      }
      val absBase = Cabac.CtxAbs + Cabac.CatOffAbs(cat)
      var numEq1 = 0
      var numGt1 = 0
      var k2 = lastNz
      while (k2 >= 0) {
        val c = coeffs(k2)
        if (c != 0) {
          val m = math.abs(c) - 1
          val inc0 = if (numGt1 != 0) 0 else math.min(4, 1 + numEq1)
          val incN = 5 + math.min(4 - (if (cat == 3) 1 else 0), numGt1)
          if (m == 0) enc.decision(absBase + inc0, 0)
          else {
            enc.decision(absBase + inc0, 1)
            var j = 1
            while (j < math.min(m, 14)) { enc.decision(absBase + incN, 1); j += 1 }
            if (m < 14) enc.decision(absBase + incN, 0)
            else { // TU prefix saturated at 14 ones; EG0 suffix, bypass
              var v = m - 14
              var kk = 0
              while (v >= (1 << kk)) { enc.bypass(1); v -= 1 << kk; kk += 1 }
              enc.bypass(0)
              while (kk > 0) { kk -= 1; enc.bypass((v >> kk) & 1) }
            }
          }
          enc.bypass(if (c < 0) 1 else 0)
          if (math.abs(c) == 1) numEq1 += 1 else numGt1 += 1
        }
        k2 -= 1
      }
    }

    def endMb(last: Boolean): Unit = {
      if (!sawQpDelta) prevQpDelta = 0
      sawQpDelta = false
      enc.terminate(if (last) 1 else 0)
    }

    def finish(): Unit = w.alignZero()
  }

  /** Encode one IDR picture as an Annex-B stream (SPS + PPS + one IDR
    * slice). `py` is the full-resolution luma; `pu`/`pv` the 4:2:0 chroma
    * (pass null for neutral 128 gray). Dimensions may be any multiple the
    * SPS crop can express (even values).
    *
    * The MB mode policy is deterministic and exercises every decode path:
    * I_PCM every 23rd MB, I_4x4 on a (mx+my) % 3 == 1 lattice with the
    * block mode cycling through all nine 4x4 modes (availability
    * permitting), I_16x16 otherwise cycling V/H/DC/Plane.
    */
  def encodeGrayIdr(py: Array[Byte], w: Int, h: Int, qp: Int,
                    pu: Array[Byte] = null, pv: Array[Byte] = null,
                    deblock: Boolean = true,
                    mbRowsPerSlice: Int = 0,
                    deblockIdc: Int = -1,
                    cabac: Boolean = false,
                    allowPcm: Boolean = true): Array[Byte] =
    encodeIdrFull(py, w, h, qp, pu, pv, deblock, mbRowsPerSlice,
      deblockIdc, cabac, allowPcm)._1

  /** Pad source planes to the MB grid by edge replication. */
  private def padSources(py: Array[Byte], w: Int, h: Int,
                         pu: Array[Byte], pv: Array[Byte],
                         st: EncState): (Array[Int], Array[Int], Array[Int]) = {
    val hMb = st.hMb
    val wMb = st.wMb
    val cw = w / 2
    val ch = h / 2
    val srcY = new Array[Int](st.yStride * hMb * 16)
    val srcU = new Array[Int](st.cStride * hMb * 8)
    val srcV = new Array[Int](st.cStride * hMb * 8)
    var yy = 0
    while (yy < hMb * 16) {
      val sy = math.min(yy, h - 1)
      var xx = 0
      while (xx < wMb * 16) {
        val sx = math.min(xx, w - 1)
        srcY(yy * st.yStride + xx) = py(sy * w + sx) & 0xff
        xx += 1
      }
      yy += 1
    }
    yy = 0
    while (yy < hMb * 8) {
      val sy = math.min(yy, ch - 1)
      var xx = 0
      while (xx < wMb * 8) {
        val sx = math.min(xx, cw - 1)
        srcU(yy * st.cStride + xx) = if (pu == null) 128 else pu(sy * cw + sx) & 0xff
        srcV(yy * st.cStride + xx) = if (pv == null) 128 else pv(sy * cw + sx) & 0xff
        xx += 1
      }
      yy += 1
    }
    (srcY, srcU, srcV)
  }

  private def encodeIdrFull(py: Array[Byte], w: Int, h: Int, qp: Int,
                            pu: Array[Byte], pv: Array[Byte],
                            deblock: Boolean,
                            mbRowsPerSlice: Int,
                            deblockIdc: Int,
                            cabac: Boolean,
                            allowPcm: Boolean): (Array[Byte], EncState) = {
    require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0 && py.length == w * h)
    require(qp >= 0 && qp <= 51)
    val wMb = (w + 15) / 16
    val hMb = (h + 15) / 16
    val st = new EncState(wMb, hMb)
    val (srcY, srcU, srcV) = padSources(py, w, h, pu, pv, st)
    // --- SPS / PPS
    val spsW = new BitWriter
    spsW.u(8, 66) // baseline profile
    spsW.u(8, 0xc0) // constraint_set0+1
    spsW.u(8, 30) // level 3.0
    spsW.ue(0) // sps id
    spsW.ue(0) // log2_max_frame_num_minus4
    spsW.ue(2) // pic_order_cnt_type 2 (no POC syntax in slices)
    spsW.ue(1) // max_num_ref_frames
    spsW.u1(0) // gaps allowed
    spsW.ue(wMb - 1)
    spsW.ue(hMb - 1)
    spsW.u1(1) // frame_mbs_only
    spsW.u1(0) // direct_8x8
    val cropR = (wMb * 16 - w) / 2
    val cropB = (hMb * 16 - h) / 2
    if (cropR > 0 || cropB > 0) {
      spsW.u1(1); spsW.ue(0); spsW.ue(cropR); spsW.ue(0); spsW.ue(cropB)
    } else spsW.u1(0)
    spsW.u1(0) // vui
    spsW.rbspTrailing()
    val ppsW = new BitWriter
    ppsW.ue(0) // pps id
    ppsW.ue(0) // sps id
    ppsW.u1(if (cabac) 1 else 0) // entropy_coding_mode_flag
    ppsW.u1(0) // pic_order_present
    ppsW.ue(0) // one slice group
    ppsW.ue(0); ppsW.ue(0) // ref idx defaults
    ppsW.u1(0); ppsW.u(2, 0) // weighted pred
    ppsW.se(qp - 26) // pic_init_qp
    ppsW.se(0) // pic_init_qs
    ppsW.se(0) // chroma_qp_index_offset
    ppsW.u1(1) // deblocking_filter_control_present
    ppsW.u1(0) // constrained_intra_pred
    ppsW.u1(0) // redundant_pic_cnt_present
    ppsW.rbspTrailing()
    // --- slices (contiguous MB-row bands; 0 = one slice for the picture)
    val rowsPerSlice = if (mbRowsPerSlice <= 0) hMb else mbRowsPerSlice
    val out = new java.io.ByteArrayOutputStream()
    def nal(refIdc: Int, typ: Int, payload: Array[Byte]): Unit = {
      out.write(Array[Byte](0, 0, 0, 1), 0, 4)
      out.write((refIdc << 5) | typ)
      val guarded = antiEmulate(payload)
      out.write(guarded, 0, guarded.length)
    }
    nal(3, 7, spsW.toBytes)
    nal(3, 8, ppsW.toBytes)
    var sliceIdx = 0
    var row0 = 0
    while (row0 < hMb) {
      val rows = math.min(rowsPerSlice, hMb - row0)
      val firstMb = row0 * wMb
      val sw = new BitWriter
      sw.ue(firstMb) // first_mb_in_slice
      sw.ue(7) // slice_type I (all slices of picture)
      sw.ue(0) // pps id
      sw.u(4, 0) // frame_num (log2_max_frame_num = 4)
      sw.ue(0) // idr_pic_id (constant: all slices of one IDR picture)
      sw.u1(0); sw.u1(0) // dec_ref_pic_marking
      sw.se(0) // slice_qp_delta
      val idc = if (deblockIdc >= 0) deblockIdc else if (deblock) 0 else 1
      sw.ue(idc) // disable_deblocking_filter_idc
      if (idc != 1) { sw.se(0); sw.se(0) } // alpha/beta offsets
      if (cabac) sw.alignOnes() // cabac_alignment_one_bit
      val sink: MbSink =
        if (cabac) new CabacSink(sw, st, sliceIdx, qp)
        else new CavlcSink(sw, st, sliceIdx)
      var qpPrev = qp
      var addr = firstMb
      val endMb = firstMb + rows * wMb
      while (addr < endMb) {
        // I_PCM is outside the CABAC subset (see decodeSliceCabac)
        qpPrev = encodeMb(sink, st, srcY, srcU, srcV, addr, qp, qpPrev,
          sliceIdx, allowPcm && !cabac)
        sink.endMb(addr == endMb - 1)
        addr += 1
      }
      sink.finish()
      nal(3, 5, sw.toBytes)
      sliceIdx += 1
      row0 += rows
    }
    (out.toByteArray, st)
  }

  // ------------------------------------------------------------------
  // P-frame fixture encoder
  // ------------------------------------------------------------------

  /** Encode a gray GOP: `frames.head` as an IDR picture (the
    * [[encodeGrayIdr]] path), every later frame as a single-reference P
    * picture predicting from the previously DECODED picture. Returns one
    * Annex-B chunk per access unit (element 0 carries SPS+PPS+IDR).
    *
    * The reference chain is decoder-exact by construction: after each
    * access unit the encoder decodes its own bytes through
    * [[decodeAuNals]] and predicts the next frame from that (deblocked)
    * reconstruction — at any qp, prediction drift is impossible.
    *
    * Macroblock policy (deterministic, exercising every P decode path):
    * P_Skip wherever the derived skip vector predicts the source to zero
    * coded residual, an intra lattice (mb_type offset 5), and otherwise
    * inter MBs cycling 16x16 / 16x8 / 8x16 / P_8x8 (mixed sub-partition
    * types) around a full-range integer motion search, with
    * deterministic half/quarter-sample offset classes driving the 6-tap
    * and bilinear interpolation paths.
    */
  def encodeGrayGop(frames: Seq[Array[Byte]], w: Int, h: Int, qp: Int,
                    mbRowsPerSlice: Int = 0, searchRange: Int = 8,
                    seed: Int = 0): Seq[Array[Byte]] = {
    require(frames.nonEmpty)
    val idr = encodeGrayIdr(frames.head, w, h, qp, allowPcm = false)
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]](idr)
    val (spsNals, ppsNals, idrSlices) = splitAnnexB(idr)
    var ref = decodeAuNals(idrSlices, spsNals, ppsNals, null).getOrElse(
      throw new IllegalStateException("GOP IDR feedback decode failed")).frame
    var frameNum = 0
    var k = 1
    while (k < frames.length) {
      frameNum = (frameNum + 1) % 16 // encoder SPS: log2_max_frame_num = 4
      val pBytes = encodePFrame(ref, frames(k), w, h, qp, frameNum,
        mbRowsPerSlice, searchRange, seed * 31 + k)
      val pNals = splitAnnexB(pBytes)._3
      ref = decodeAuNals(pNals, spsNals, ppsNals, ref).getOrElse(
        throw new IllegalStateException(s"GOP P[$k] feedback decode failed")).frame
      out += pBytes
      k += 1
    }
    out.toSeq
  }

  /** Delegating sink for intra macroblocks inside a P slice: mb_type
    * arrives offset by 5 (7.4.5), everything else is the CAVLC backend.
    */
  private final class PIntraSink(inner: MbSink, w: BitWriter) extends MbSink {
    def mbTypeI(v: Int, addr: Int): Unit = w.ue(v + 5)
    def pcmSamples(sy: Array[Int], su: Array[Int], sv: Array[Int]): Unit =
      inner.pcmSamples(sy, su, sv)
    def i4Mode(predFlag: Boolean, rem: Int): Unit = inner.i4Mode(predFlag, rem)
    def chromaMode(mode: Int, addr: Int): Unit = inner.chromaMode(mode, addr)
    def cbpI4(luma: Int, chroma: Int, addr: Int): Unit =
      inner.cbpI4(luma, chroma, addr)
    def qpDelta(delta: Int): Unit = inner.qpDelta(delta)
    def residual(cat: Int, coeffs: Array[Int], addr: Int, blk: Int, cb: Boolean): Unit =
      inner.residual(cat, coeffs, addr, blk, cb)
    def endMb(last: Boolean): Unit = inner.endMb(last)
    def finish(): Unit = inner.finish()
  }

  /** Encode one P picture against `ref` (the decoded previous frame). */
  private def encodePFrame(ref: Frame, py: Array[Byte], w: Int, h: Int,
                           qp: Int, frameNum: Int, mbRowsPerSlice: Int,
                           searchRange: Int, seed: Int): Array[Byte] = {
    val wMb = (w + 15) / 16
    val hMb = (h + 15) / 16
    require(ref.yStride == wMb * 16 && ref.y.length == wMb * 16 * hMb * 16)
    val st = new EncState(wMb, hMb)
    val (srcY, srcU, srcV) = padSources(py, w, h, null, null, st)
    val mfE = new MotionField(wMb, hMb)
    val out = new java.io.ByteArrayOutputStream()
    def nal(refIdc: Int, typ: Int, payload: Array[Byte]): Unit = {
      out.write(Array[Byte](0, 0, 0, 1), 0, 4)
      out.write((refIdc << 5) | typ)
      val g = antiEmulate(payload)
      out.write(g, 0, g.length)
    }
    val rowsPerSlice = if (mbRowsPerSlice <= 0) hMb else mbRowsPerSlice
    var sliceIdx = 0
    var row0 = 0
    while (row0 < hMb) {
      val rows = math.min(rowsPerSlice, hMb - row0)
      val firstMb = row0 * wMb
      val endMb = firstMb + rows * wMb
      val sw = new BitWriter
      sw.ue(firstMb) // first_mb_in_slice
      sw.ue(5) // slice_type P (all slices of the picture)
      sw.ue(0) // pps id
      sw.u(4, frameNum) // frame_num (log2_max_frame_num = 4)
      sw.u1(0) // num_ref_idx_active_override_flag (PPS default: 1 active)
      sw.u1(0) // ref_pic_list_modification_flag_l0
      sw.u1(0) // dec_ref_pic_marking: sliding window (1-frame DPB)
      sw.se(0) // slice_qp_delta
      sw.ue(0) // disable_deblocking_filter_idc
      sw.se(0); sw.se(0) // alpha/beta offsets
      val sink = new CavlcSink(sw, st, sliceIdx)
      val slice = sliceIdx
      val mbOk: Int => Boolean = a => st.sliceId(a) == slice
      var qpPrev = qp
      var skipRun = 0
      var addr = firstMb
      while (addr < endMb) {
        st.sliceId(addr) = slice
        val (q2, s2) = encodePMb(sw, sink, st, mfE, mbOk, ref, srcY, srcU,
          srcV, addr, qp, qpPrev, slice, searchRange, seed, skipRun)
        qpPrev = q2
        skipRun = s2
        addr += 1
      }
      if (skipRun > 0) sw.ue(skipRun) // trailing skipped macroblocks
      sw.rbspTrailing()
      nal(2, 1, sw.toBytes)
      sliceIdx += 1
      row0 += rows
    }
    out.toByteArray
  }

  /** Encode one P-slice macroblock; returns (new qpPrev, new skip run). */
  private def encodePMb(w: BitWriter, sink: MbSink, st: EncState,
                        mfE: MotionField, mbOk: Int => Boolean, ref: Frame,
                        srcY: Array[Int], srcU: Array[Int], srcV: Array[Int],
                        addr: Int, qp: Int, qpPrev: Int, slice: Int,
                        searchRange: Int, seed: Int, skipRunIn: Int): (Int, Int) = {
    val wMb = st.wMb
    val mx = addr % wMb
    val my = addr / wMb
    val x0 = mx * 16
    val y0 = my * 16
    val picH = st.hMb * 16
    val picHC = st.hMb * 8

    def quantBlock(diff: Array[Int], q: Int): (Array[Int], Int) = {
      val wc = ftrans4x4(diff)
      val scan = new Array[Int](16)
      var tc = 0
      var kk = 0
      while (kk < 16) {
        val rpos = Zigzag4x4(kk)
        val lev = quantLevel(wc(rpos), q, rpos / 4, rpos % 4)
        scan(kk) = lev
        if (lev != 0) tc += 1
        kk += 1
      }
      (scan, tc)
    }
    // per-4x4 MC prediction over the MB (z-scan block index -> vector)
    def lumaPredMb(mvOf: Int => (Int, Int)): Array[Int] = {
      val pred = new Array[Int](256)
      var b = 0
      while (b < 16) {
        val (ox, oy) = Blk4x4Off(b)
        val (mvx, mvy) = mvOf(b)
        interpLumaBlock(ref.y, st.yStride, picH, x0 + ox, y0 + oy, 4, 4,
          mvx, mvy, pred, 16, oy * 16 + ox)
        b += 1
      }
      pred
    }
    def chromaPredMb(mvOf: Int => (Int, Int)): Array[Array[Int]] = {
      val preds = Array.ofDim[Int](2, 64)
      var comp = 0
      while (comp < 2) {
        val rp = if (comp == 0) ref.u else ref.v
        var b = 0
        while (b < 16) {
          val (ox, oy) = Blk4x4Off(b)
          val (mvx, mvy) = mvOf(b)
          interpChromaBlock(rp, st.cStride, picHC, mx * 8 + ox / 2,
            my * 8 + oy / 2, 2, 2, mvx, mvy, preds(comp), 8,
            (oy / 2) * 8 + ox / 2)
          b += 1
        }
        comp += 1
      }
      preds
    }
    def lumaDiff(pred: Array[Int], b: Int): Array[Int] = {
      val (ox, oy) = Blk4x4Off(b)
      val diff = new Array[Int](16)
      var kk = 0
      while (kk < 16) {
        diff(kk) = srcY((y0 + oy + kk / 4) * st.yStride + x0 + ox + kk % 4) -
          pred((oy + kk / 4) * 16 + ox + kk % 4)
        kk += 1
      }
      diff
    }

    val wantIntra = ((addr * 7) ^ seed) % 13 == 5
    // ---- P_Skip probe: zero coded residual at the derived skip vector
    if (!wantIntra) {
      val (skx, sky) = mvSkip(mfE, mbOk, mx, my)
      val skipPredY = lumaPredMb(_ => (skx, sky))
      var skipOk = true
      var b = 0
      while (b < 16 && skipOk) {
        if (quantBlock(lumaDiff(skipPredY, b), qp)._2 != 0) skipOk = false
        b += 1
      }
      lazy val skipPredC = chromaPredMb(_ => (skx, sky))
      if (skipOk)
        skipOk = chromaResidualZero(st, srcU, srcV, addr, qp, skipPredC)
      if (skipOk) {
        mfE.setBlocks(x0, y0, 16, 16, skx, sky)
        writeInterRecon(st, addr, skipPredY, skipPredC, null, 0, qp)
        return (qpPrev, skipRunIn + 1)
      }
    }
    w.ue(skipRunIn) // mb_skip_run before this coded macroblock
    if (wantIntra) {
      val qpOut = encodeMb(new PIntraSink(sink, w), st, srcY, srcU, srcV,
        addr, qp, qpPrev, slice, allowPcm = false)
      mfE.setIntraMb(addr)
      return (qpOut, 0)
    }
    // ---- integer motion search (SAD, deterministic first-min)
    @inline def refAt(x: Int, y: Int): Int = {
      val cx = if (x < 0) 0 else if (x >= st.yStride) st.yStride - 1 else x
      val cy = if (y < 0) 0 else if (y >= picH) picH - 1 else y
      ref.y(cy * st.yStride + cx) & 0xff
    }
    def sadInt(dx: Int, dy: Int): Int = {
      var s = 0
      var yy = 0
      while (yy < 16) {
        var xx = 0
        while (xx < 16) {
          s += math.abs(srcY((y0 + yy) * st.yStride + x0 + xx) -
            refAt(x0 + xx + dx, y0 + yy + dy))
          xx += 1
        }
        yy += 1
      }
      s
    }
    var bestDx = 0
    var bestDy = 0
    var bestSad = sadInt(0, 0)
    var sdy = -searchRange
    while (sdy <= searchRange) {
      var sdx = -searchRange
      while (sdx <= searchRange) {
        if (sdx != 0 || sdy != 0) {
          val s = sadInt(sdx, sdy)
          if (s < bestSad) { bestSad = s; bestDx = sdx; bestDy = sdy }
        }
        sdx += 1
      }
      sdy += 1
    }
    val bmx = bestDx * 4
    val bmy = bestDy * 4
    // ---- deterministic partition/fraction class
    val cls = ((addr * 5) ^ (seed * 3)) % 8
    // (x, y, w, h, partKind, mvx, mvy) in picture-absolute luma samples
    var mbTypeCode = 0
    var subTypes: Array[Int] = null
    val parts = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Int, Int, Int, Int)]
    cls match {
      case 0 | 1 => parts += ((x0, y0, 16, 16, 0, bmx, bmy))
      case 2 => parts += ((x0, y0, 16, 16, 0, bmx + 2, bmy)) // half-sample
      case 3 => parts += ((x0, y0, 16, 16, 0, bmx + 1, bmy + 3)) // quarter
      case 4 =>
        mbTypeCode = 1
        parts += ((x0, y0, 16, 8, 1, bmx, bmy))
        parts += ((x0, y0 + 8, 16, 8, 2, bmx, bmy + 2))
      case 5 =>
        mbTypeCode = 2
        parts += ((x0, y0, 8, 16, 3, bmx, bmy))
        parts += ((x0 + 8, y0, 8, 16, 4, bmx + 2, bmy + 2))
      case _ =>
        mbTypeCode = 3
        subTypes = Array.tabulate(4)(b8 => (b8 + addr) % 4)
        var b8 = 0
        while (b8 < 4) {
          val ox = x0 + (b8 % 2) * 8
          val oy = y0 + (b8 / 2) * 8
          val sub = SubMbParts(subTypes(b8))
          var sp = 0
          while (sp < sub.length) {
            val (dx, dy, pw, ph) = sub(sp)
            parts += ((ox + dx, oy + dy, pw, ph, 0,
              bmx + ((b8 + sp) & 3), bmy + ((b8 ^ sp) & 3)))
            sp += 1
          }
          b8 += 1
        }
    }
    // ---- assign motion (prediction mirrors the decoder exactly)
    val mvds = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    parts.foreach { case (px, py2, pw, ph, kind, mvx, mvy) =>
      val pr = mvPredict(mfE, mbOk, px, py2, pw, ph, kind)
      mvds += ((mvx - pr._1, mvy - pr._2))
      mfE.setBlocks(px, py2, pw, ph, mvx, mvy)
    }
    def mvOf(b: Int): (Int, Int) = {
      val (ox, oy) = Blk4x4Off(b)
      val i = mfE.idx((x0 + ox) >> 2, (y0 + oy) >> 2)
      (mfE.mvX(i), mfE.mvY(i))
    }
    // ---- residuals
    val predY = lumaPredMb(mvOf)
    val blockCoefs = Array.ofDim[Int](16, 16)
    val blockTc = new Array[Int](16)
    var b = 0
    while (b < 16) {
      val (scan, tc) = quantBlock(lumaDiff(predY, b), qp)
      blockCoefs(b) = scan
      blockTc(b) = tc
      b += 1
    }
    var cbpLuma = 0
    var i8 = 0
    while (i8 < 4) {
      var any = false
      var j = 0
      while (j < 4) { if (blockTc(i8 * 4 + j) != 0) any = true; j += 1 }
      if (any) cbpLuma |= 1 << i8
      i8 += 1
    }
    // decoder-final nz state BEFORE emission (dropped 8x8s decode as 0)
    b = 0
    while (b < 16) {
      st.lumaNz(addr * 16 + b) =
        (if ((cbpLuma & (1 << (b / 4))) != 0) blockTc(b) else 0).toByte
      b += 1
    }
    val cPreds = chromaPredMb(mvOf)
    val (_, cbpChroma, chromaEmit) = encodeChroma(st, srcU, srcV, addr, qp,
      aboveAvail = false, leftAvail = false, cornerAvail = false, slice,
      interPred = cPreds)
    st.cbpLumaE(addr) = cbpLuma.toByte
    st.cbpChromaE(addr) = cbpChroma.toByte
    val cbp = cbpLuma | (cbpChroma << 4)
    // ---- emit
    w.ue(mbTypeCode)
    if (subTypes != null) subTypes.foreach(w.ue)
    mvds.foreach { case (mdx, mdy) => w.se(mdx); w.se(mdy) }
    w.ue(CbpInterInv(cbp))
    var qpOut = qpPrev
    if (cbp != 0) { w.se(qp - qpPrev); qpOut = qp }
    i8 = 0
    while (i8 < 4) {
      if ((cbpLuma & (1 << i8)) != 0) {
        var j = 0
        while (j < 4) {
          val b2 = i8 * 4 + j
          sink.residual(2, blockCoefs(b2), addr, b2, cb = false)
          j += 1
        }
      }
      i8 += 1
    }
    chromaEmit(sink)
    // ---- reconstruct luma decoder-identically (chroma reconstructed
    // inside encodeChroma against the inter prediction)
    writeInterRecon(st, addr, predY, null, blockCoefs, cbpLuma, qp)
    (qpOut, 0)
  }

  /** Write an inter MB's reconstruction into the encoder state: luma
    * pred + dequantized residual (skip: `coefs == null`, pure
    * prediction); chroma pure prediction when `predC != null` (the coded
    * chroma path reconstructs inside [[encodeChroma]]).
    */
  private def writeInterRecon(st: EncState, addr: Int, predY: Array[Int],
                              predC: Array[Array[Int]],
                              coefs: Array[Array[Int]], cbpLuma: Int,
                              qp: Int): Unit = {
    val mx = addr % st.wMb
    val my = addr / st.wMb
    var b = 0
    while (b < 16) {
      val (ox, oy) = Blk4x4Off(b)
      if (coefs == null) {
        var yy = 0
        while (yy < 4) {
          var xx = 0
          while (xx < 4) {
            st.y((my * 16 + oy + yy) * st.yStride + mx * 16 + ox + xx) =
              predY((oy + yy) * 16 + ox + xx).toByte
            xx += 1
          }
          yy += 1
        }
      } else {
        val d = new Array[Int](16)
        if ((cbpLuma & (1 << (b / 4))) != 0) {
          var kk = 0
          while (kk < 16) {
            if (coefs(b)(kk) != 0) {
              val rpos = Zigzag4x4(kk)
              d(rpos) = dequant(coefs(b)(kk), qp, rpos / 4, rpos % 4)
            }
            kk += 1
          }
        }
        val res = itrans4x4(d)
        var yy = 0
        while (yy < 4) {
          var xx = 0
          while (xx < 4) {
            st.y((my * 16 + oy + yy) * st.yStride + mx * 16 + ox + xx) =
              clamp255Pub(predY((oy + yy) * 16 + ox + xx) + res(yy * 4 + xx)).toByte
            xx += 1
          }
          yy += 1
        }
      }
      b += 1
    }
    if (predC != null) {
      var comp = 0
      while (comp < 2) {
        val plane = if (comp == 0) st.u else st.v
        var cy = 0
        while (cy < 8) {
          var cx = 0
          while (cx < 8) {
            plane((my * 8 + cy) * st.cStride + mx * 8 + cx) =
              predC(comp)(cy * 8 + cx).toByte
            cx += 1
          }
          cy += 1
        }
        comp += 1
      }
    }
  }

  /** Does the chroma residual against `preds` quantize to all-zero
    * levels (DC Hadamard included)? The P_Skip eligibility check,
    * mirroring [[encodeChroma]]'s quantization exactly.
    */
  private def chromaResidualZero(st: EncState, srcU: Array[Int],
                                 srcV: Array[Int], addr: Int, qpY: Int,
                                 preds: Array[Array[Int]]): Boolean = {
    val mx = addr % st.wMb
    val my = addr / st.wMb
    val x0 = mx * 8
    val y0 = my * 8
    val qpC = chromaQp(qpY, 0)
    var comp = 0
    while (comp < 2) {
      val srcP = if (comp == 0) srcU else srcV
      val pred = preds(comp)
      val dcW = new Array[Int](4)
      var b = 0
      while (b < 4) {
        val ox = (b % 2) * 4
        val oy = (b / 2) * 4
        val diff = new Array[Int](16)
        var kk = 0
        while (kk < 16) {
          diff(kk) = srcP((y0 + oy + kk / 4) * st.cStride + x0 + ox + kk % 4) -
            pred((oy + kk / 4) * 8 + ox + kk % 4)
          kk += 1
        }
        val wc = ftrans4x4(diff)
        dcW(b) = wc(0)
        kk = 1
        while (kk < 16) {
          val rpos = Zigzag4x4(kk)
          if (quantLevel(wc(rpos), qpC, rpos / 4, rpos % 4) != 0) return false
          kk += 1
        }
        b += 1
      }
      val vdc = NormAdjust(qpC % 6)(0).toDouble * (1L << (qpC / 6))
      val hs = Array(dcW(0) + dcW(1) + dcW(2) + dcW(3),
        dcW(0) - dcW(1) + dcW(2) - dcW(3),
        dcW(0) + dcW(1) - dcW(2) - dcW(3),
        dcW(0) - dcW(1) - dcW(2) + dcW(3))
      var kk = 0
      while (kk < 4) {
        if (math.round(2.0 * hs(kk) / vdc).toInt != 0) return false
        kk += 1
      }
      comp += 1
    }
    true
  }

  /** Encode one macroblock; returns the updated qpPrev. */
  private def encodeMb(sink: MbSink, st: EncState, srcY: Array[Int],
                       srcU: Array[Int], srcV: Array[Int], addr: Int,
                       qp: Int, qpPrev: Int, slice: Int,
                       allowPcm: Boolean): Int = {
    val wMb = st.wMb
    val mx = addr % wMb
    val my = addr / wMb
    st.sliceId(addr) = slice
    val leftAvail = mx > 0 && st.sliceId(addr - 1) == slice
    val aboveAvail = my > 0 && st.sliceId(addr - wMb) == slice
    val cornerAvail = mx > 0 && my > 0 && st.sliceId(addr - wMb - 1) == slice
    if (allowPcm && addr % 23 == 7) { // I_PCM: raw samples, recon == source
      st.isPcm(addr) = true
      val sy = new Array[Int](256)
      val su = new Array[Int](64)
      val sv = new Array[Int](64)
      var i = 0
      while (i < 256) {
        val p = (my * 16 + i / 16) * st.yStride + mx * 16 + i % 16
        sy(i) = srcY(p); st.y(p) = srcY(p).toByte
        i += 1
      }
      i = 0
      while (i < 64) {
        val p = (my * 8 + i / 8) * st.cStride + mx * 8 + i % 8
        su(i) = srcU(p); st.u(p) = srcU(p).toByte
        sv(i) = srcV(p); st.v(p) = srcV(p).toByte
        i += 1
      }
      sink.mbTypeI(25, addr)
      sink.pcmSamples(sy, su, sv)
      return qpPrev
    }
    val useI4 = (mx + my) % 3 == 1
    // ---- luma: predict, transform, quantize, reconstruct -------------
    val x0 = mx * 16
    val y0 = my * 16
    @inline def yAt(x: Int, y: Int): Int = st.y(y * st.yStride + x) & 0xff
    var qpOut = qpPrev
    if (useI4) {
      st.isI4x4(addr) = true
      // parse-order buffers: modes + coefficients, then the actual bits
      // (mb_type, modes, chroma mode, cbp, qp delta, residuals) — CBP
      // depends on which blocks quantize to zero, so compute first
      val modes = new Array[Int](16)
      val predFlags = new Array[Boolean](16)
      val remBits = new Array[Int](16)
      val blockCoefs = Array.ofDim[Int](16, 16)
      val blockTc = new Array[Int](16)
      var b = 0
      while (b < 16) {
        val (ox, oy) = Blk4x4Off(b)
        val bx0 = x0 + ox
        val by0 = y0 + oy
        val blkLeft = bx0 > 0 &&
          st.sliceId((by0 / 16) * wMb + (bx0 - 1) / 16) == slice
        val blkAbove = by0 > 0 &&
          st.sliceId(((by0 - 1) / 16) * wMb + bx0 / 16) == slice
        val blkCorner = bx0 > 0 && by0 > 0 &&
          st.sliceId(((by0 - 1) / 16) * wMb + (bx0 - 1) / 16) == slice
        // above-right availability, encoder raster order (single slice)
        val arAvail = {
          if (by0 == 0 || bx0 + 4 >= st.yStride) false
          else {
            val nmx = (bx0 + 4) / 16
            val nmy = (by0 - 1) / 16
            if (nmx == mx && nmy == my) {
              Blk4x4Idx(((bx0 + 4) % 16) / 4)(((by0 - 1) % 16) / 4) < b
            } else nmy * wMb + nmx < addr && st.sliceId(nmy * wMb + nmx) == slice
          }
        }
        // choose a mode the availability permits, cycling through all 9
        val wanted = (addr * 16 + b) % 9
        val mode = pickI4Mode(wanted, blkAbove, blkLeft, blkCorner)
        modes(b) = mode
        // context for the prev_intra4x4_pred_mode flag
        def ctxMode(nx: Int, ny: Int): Int = {
          if (nx < 0 || ny < 0) return -1
          val nmb = (ny / 4) * wMb + nx / 4
          if (nmb != addr && st.sliceId(nmb) != slice) -1
          else if (nmb == addr) modes(Blk4x4Idx(nx % 4)(ny % 4))
          else if (st.isPcm(nmb) || !st.isI4x4(nmb)) 2
          else st.i4Modes(nmb * 16 + Blk4x4Idx(nx % 4)(ny % 4))
        }
        val bxa = bx0 / 4
        val bya = by0 / 4
        val aMode = if (bx0 == 0) -1 else ctxMode(bxa - 1, bya)
        val tMode = if (by0 == 0) -1 else ctxMode(bxa, bya - 1)
        val predMode = if (aMode < 0 || tMode < 0) 2 else math.min(aMode, tMode)
        if (mode == predMode) predFlags(b) = true
        else remBits(b) = if (mode < predMode) mode else mode - 1
        // predict from RECONSTRUCTED samples
        val pa = new Array[Int](8)
        val pl = new Array[Int](4)
        var pc = 0
        if (blkAbove) {
          var i = 0
          while (i < 4) { pa(i) = yAt(bx0 + i, by0 - 1); i += 1 }
          if (arAvail) { i = 4; while (i < 8) { pa(i) = yAt(bx0 + i, by0 - 1); i += 1 } }
          else { i = 4; while (i < 8) { pa(i) = pa(3); i += 1 } }
        }
        if (blkLeft) { var j = 0; while (j < 4) { pl(j) = yAt(bx0 - 1, by0 + j); j += 1 } }
        if (blkCorner) pc = yAt(bx0 - 1, by0 - 1)
        val pred = predI4(mode, pa, pl, pc, blkAbove, blkLeft, blkCorner)
        // residual -> transform -> quant (zig-zag order out)
        val diff = new Array[Int](16)
        var k = 0
        while (k < 16) {
          diff(k) = srcY((by0 + k / 4) * st.yStride + bx0 + k % 4) - pred(k)
          k += 1
        }
        val wCoef = ftrans4x4(diff)
        val scan = new Array[Int](16)
        var tc = 0
        k = 0
        while (k < 16) {
          val rpos = Zigzag4x4(k)
          val lev = quantLevel(wCoef(rpos), qp, rpos / 4, rpos % 4)
          scan(k) = lev
          if (lev != 0) tc += 1
          k += 1
        }
        blockCoefs(b) = scan
        blockTc(b) = tc
        st.lumaNz(addr * 16 + b) = tc.toByte // provisional; zeroed if CBP drops the 8x8
        // reconstruct decoder-identically
        val d = new Array[Int](16)
        k = 0
        while (k < 16) {
          if (scan(k) != 0) {
            val rpos = Zigzag4x4(k)
            d(rpos) = dequant(scan(k), qp, rpos / 4, rpos % 4)
          }
          k += 1
        }
        val res = itrans4x4(d)
        var yy2 = 0
        while (yy2 < 4) {
          var xx2 = 0
          while (xx2 < 4) {
            st.y((by0 + yy2) * st.yStride + bx0 + xx2) =
              clamp255Pub(pred(yy2 * 4 + xx2) + res(yy2 * 4 + xx2)).toByte
            xx2 += 1
          }
          yy2 += 1
        }
        st.i4Modes(addr * 16 + b) = mode.toByte
        b += 1
      }
      // CBP luma: an 8x8 bit is set iff any of its blocks has coeffs.
      // NOTE: a dropped bit would lose residual and desync the encoder's
      // recon — so keep every 8x8 whose blocks have any coeffs AND re-zero
      // nz for fully-zero 8x8s (the decoder will see them uncoded).
      var cbpLuma = 0
      var i8 = 0
      while (i8 < 4) {
        var any = false
        var j = 0
        while (j < 4) { if (blockTc(i8 * 4 + j) != 0) any = true; j += 1 }
        if (any) cbpLuma |= 1 << i8
        i8 += 1
      }
      // chroma: compute now (needs cbpChroma before CBP bits)
      val (chromaMode, cbpChroma, chromaBits) =
        encodeChroma(st, srcU, srcV, addr, qp, aboveAvail, leftAvail,
          cornerAvail, slice)
      // neighbor-context state must be decoder-final BEFORE emission:
      // the decoder sees dropped 8x8s as uncoded (nz 0), and later-block
      // contexts consult only left/above (already-coded) positions
      i8 = 0
      while (i8 < 4) {
        if ((cbpLuma & (1 << i8)) == 0) {
          var j = 0
          while (j < 4) { st.lumaNz(addr * 16 + i8 * 4 + j) = 0; j += 1 }
        }
        i8 += 1
      }
      st.chromaModeE(addr) = chromaMode.toByte
      st.cbpLumaE(addr) = cbpLuma.toByte
      st.cbpChromaE(addr) = cbpChroma.toByte
      // ---- emit
      sink.mbTypeI(0, addr) // mb_type I_NxN
      b = 0
      while (b < 16) {
        sink.i4Mode(predFlags(b), remBits(b))
        b += 1
      }
      sink.chromaMode(chromaMode, addr)
      sink.cbpI4(cbpLuma, cbpChroma, addr)
      if (cbpLuma != 0 || cbpChroma != 0) {
        sink.qpDelta(qp - qpPrev) // mb_qp_delta (same qp each MB -> usually 0)
        qpOut = qp
      }
      i8 = 0
      while (i8 < 4) {
        if ((cbpLuma & (1 << i8)) != 0) {
          var j = 0
          while (j < 4) {
            val b2 = i8 * 4 + j
            sink.residual(2, blockCoefs(b2), addr, b2, cb = false)
            j += 1
          }
        }
        i8 += 1
      }
      chromaBits(sink)
    } else {
      st.isI4x4(addr) = false
      // I_16x16: choose mode by availability, cycle V/H/DC/Plane
      val want = (mx + 2 * my) % 4
      val mode = pickI16Mode(want, aboveAvail, leftAvail, cornerAvail)
      val top = new Array[Int](16)
      val left = new Array[Int](16)
      if (aboveAvail) { var i = 0; while (i < 16) { top(i) = yAt(x0 + i, y0 - 1); i += 1 } }
      if (leftAvail) { var i = 0; while (i < 16) { left(i) = yAt(x0 - 1, y0 + i); i += 1 } }
      val corner = if (cornerAvail) yAt(x0 - 1, y0 - 1) else 0
      val pred = predI16(mode, top, left, corner, aboveAvail, leftAvail, cornerAvail)
      // per-block forward transforms; DC coefficients go to the Hadamard
      val acScan = Array.ofDim[Int](16, 16) // scan order, index 0 unused (DC)
      val dcW = new Array[Int](16) // raster over blocks
      val acTc = new Array[Int](16)
      var anyAc = false
      var b = 0
      while (b < 16) {
        val (ox, oy) = Blk4x4Off(b)
        val diff = new Array[Int](16)
        var k = 0
        while (k < 16) {
          diff(k) = srcY((y0 + oy + k / 4) * st.yStride + x0 + ox + k % 4) -
            pred((oy + k / 4) * 16 + ox + k % 4)
          k += 1
        }
        val wCoef = ftrans4x4(diff)
        dcW((oy / 4) * 4 + ox / 4) = wCoef(0)
        k = 1
        while (k < 16) {
          val rpos = Zigzag4x4(k)
          val lev = quantLevel(wCoef(rpos), qp, rpos / 4, rpos % 4)
          acScan(b)(k) = lev
          if (lev != 0) acTc(b) += 1
          k += 1
        }
        if (acTc(b) != 0) anyAc = true
        b += 1
      }
      val cbpLuma = if (anyAc) 15 else 0
      // luma DC: forward Hadamard + the derived DC quant (L = H/(V*2^(qp/6)))
      val had = fhadamard4(dcW)
      val dcScanLevels = new Array[Int](16)
      val vdc = NormAdjust(qp % 6)(0).toDouble * (1L << (qp / 6))
      var k = 0
      while (k < 16) {
        val rpos = Zigzag4x4(k)
        dcScanLevels(k) = math.round(had(rpos) / vdc).toInt
        k += 1
      }
      val (chromaMode, cbpChroma, chromaBits) =
        encodeChroma(st, srcU, srcV, addr, qp, aboveAvail, leftAvail,
          cornerAvail, slice)
      // neighbor-context state must be decoder-final BEFORE emission
      st.chromaModeE(addr) = chromaMode.toByte
      st.cbpLumaE(addr) = cbpLuma.toByte
      st.cbpChromaE(addr) = cbpChroma.toByte
      st.lumaDcNzE(addr) =
        (if (dcScanLevels.exists(_ != 0)) 1 else 0).toByte
      if (cbpLuma != 0) {
        var bz = 0
        while (bz < 16) {
          st.lumaNz(addr * 16 + bz) = acTc(bz).toByte
          bz += 1
        }
      }
      // mb_type for I_16x16: 1 + predMode + 4*cbpChroma + 12*(cbpLuma/15)
      sink.mbTypeI(1 + mode + 4 * cbpChroma + 12 * (cbpLuma / 15), addr)
      sink.chromaMode(chromaMode, addr)
      sink.qpDelta(qp - qpPrev)
      qpOut = qp
      // DC block: nC from luma block 0 context
      sink.residual(0, dcScanLevels, addr, 0, cb = false)
      // reconstruct luma decoder-identically (DC scatter + AC)
      val dcRaster = new Array[Int](16)
      k = 0
      while (k < 16) { dcRaster(Zigzag4x4(k)) = dcScanLevels(k); k += 1 }
      val dcVals = lumaDcDequant(dcRaster, qp)
      var i8 = 0
      while (i8 < 4) {
        if (cbpLuma != 0) {
          var j = 0
          while (j < 4) {
            val b2 = i8 * 4 + j
            val full = new Array[Int](15)
            System.arraycopy(acScan(b2), 1, full, 0, 15)
            sink.residual(1, full, addr, b2, cb = false)
            j += 1
          }
        }
        i8 += 1
      }
      b = 0
      while (b < 16) {
        val (ox, oy) = Blk4x4Off(b)
        val d = new Array[Int](16)
        d(0) = dcVals((oy / 4) * 4 + ox / 4)
        if (cbpLuma != 0) {
          var k2 = 1
          while (k2 < 16) {
            if (acScan(b)(k2) != 0) {
              val rpos = Zigzag4x4(k2)
              d(rpos) = dequant(acScan(b)(k2), qp, rpos / 4, rpos % 4)
            }
            k2 += 1
          }
        }
        val res = itrans4x4(d)
        var yy2 = 0
        while (yy2 < 4) {
          var xx2 = 0
          while (xx2 < 4) {
            st.y((y0 + oy + yy2) * st.yStride + x0 + ox + xx2) =
              clamp255Pub(pred((oy + yy2) * 16 + ox + xx2) + res(yy2 * 4 + xx2)).toByte
            xx2 += 1
          }
          yy2 += 1
        }
        b += 1
      }
      chromaBits(sink)
    }
    qpOut
  }

  /** First availability-legal 4x4 mode at or cycling from `want`. */
  private def pickI4Mode(want: Int, above: Boolean, left: Boolean,
                         corner: Boolean): Int = {
    def ok(m: Int): Boolean = m match {
      case 0 | 3 | 7 => above
      case 1 | 8 => left
      case 2 => true
      case _ => above && left && corner
    }
    var m = want
    var tries = 0
    while (!ok(m) && tries < 9) { m = (m + 1) % 9; tries += 1 }
    if (ok(m)) m else 2
  }

  private def pickI16Mode(want: Int, above: Boolean, left: Boolean,
                          corner: Boolean): Int = {
    def ok(m: Int): Boolean = m match {
      case 0 => above
      case 1 => left
      case 2 => true
      case 3 => above && left && corner
      case _ => false
    }
    var m = want
    var tries = 0
    while (!ok(m) && tries < 4) { m = (m + 1) % 4; tries += 1 }
    if (ok(m)) m else 2
  }

  /** Encode one MB's chroma: predicts from the reconstructed planes,
    * quantizes DC (2x2 Hadamard) + AC with the chroma QP, reconstructs
    * decoder-identically into the state, and returns
    * (intra_chroma_pred_mode, CodedBlockPatternChroma, bit emitter).
    * The emitter runs AFTER the luma residual bits (syntax order) and
    * computes each AC block's nC at write time.
    */
  private def encodeChroma(st: EncState, srcU: Array[Int], srcV: Array[Int],
                           addr: Int, qpY: Int, aboveAvail: Boolean,
                           leftAvail: Boolean, cornerAvail: Boolean,
                           slice: Int,
                           interPred: Array[Array[Int]] = null): (Int, Int, MbSink => Unit) = {
    val wMb = st.wMb
    val mx = addr % wMb
    val my = addr / wMb
    val x0 = mx * 8
    val y0 = my * 8
    val qpC = chromaQp(qpY, 0) // encoder writes chroma_qp_index_offset = 0
    val mode = if (interPred != null) -1
    else pickI16Mode((mx + 3 * my) % 4, aboveAvail, leftAvail, cornerAvail) match {
      case 0 => 2 // chroma numbering: 2 = vertical
      case 1 => 1
      case 2 => 0 // 0 = DC
      case 3 => 3
    }
    val dcScan = Array.ofDim[Int](2, 4)
    val acScan = Array.ofDim[Int](2, 4, 16)
    val acTc = Array.ofDim[Int](2, 4)
    val preds = new Array[Array[Int]](2)
    var anyDc = false
    var anyAc = false
    var comp = 0
    while (comp < 2) {
      val plane = if (comp == 0) st.u else st.v
      val srcP = if (comp == 0) srcU else srcV
      @inline def cAt(x: Int, y: Int): Int = plane(y * st.cStride + x) & 0xff
      val pred = if (interPred != null) interPred(comp)
      else {
        val top = new Array[Int](8)
        val left = new Array[Int](8)
        if (aboveAvail) { var i = 0; while (i < 8) { top(i) = cAt(x0 + i, y0 - 1); i += 1 } }
        if (leftAvail) { var i = 0; while (i < 8) { left(i) = cAt(x0 - 1, y0 + i); i += 1 } }
        val corner = if (cornerAvail) cAt(x0 - 1, y0 - 1) else 0
        predChroma(mode, top, left, corner, aboveAvail, leftAvail, cornerAvail)
      }
      preds(comp) = pred
      val dcW = new Array[Int](4)
      var b = 0
      while (b < 4) {
        val ox = (b % 2) * 4
        val oy = (b / 2) * 4
        val diff = new Array[Int](16)
        var k = 0
        while (k < 16) {
          diff(k) = srcP((y0 + oy + k / 4) * st.cStride + x0 + ox + k % 4) -
            pred((oy + k / 4) * 8 + ox + k % 4)
          k += 1
        }
        val wCoef = ftrans4x4(diff)
        dcW(b) = wCoef(0)
        k = 1
        while (k < 16) {
          val rpos = Zigzag4x4(k)
          val lev = quantLevel(wCoef(rpos), qpC, rpos / 4, rpos % 4)
          acScan(comp)(b)(k) = lev
          if (lev != 0) { acTc(comp)(b) += 1; anyAc = true }
          k += 1
        }
        b += 1
      }
      // 2x2 forward Hadamard + derived DC quant: L = 2H/(V*2^(qp/6))
      val h0 = dcW(0) + dcW(1) + dcW(2) + dcW(3)
      val h1 = dcW(0) - dcW(1) + dcW(2) - dcW(3)
      val h2 = dcW(0) + dcW(1) - dcW(2) - dcW(3)
      val h3 = dcW(0) - dcW(1) - dcW(2) + dcW(3)
      val vdc = NormAdjust(qpC % 6)(0).toDouble * (1L << (qpC / 6))
      var k = 0
      val hs = Array(h0, h1, h2, h3)
      while (k < 4) {
        dcScan(comp)(k) = math.round(2.0 * hs(k) / vdc).toInt
        if (dcScan(comp)(k) != 0) anyDc = true
        k += 1
      }
      comp += 1
    }
    val cbpChroma = if (anyAc) 2 else if (anyDc) 1 else 0
    // ---- reconstruct with exactly what the decoder will see
    comp = 0
    while (comp < 2) {
      val plane = if (comp == 0) st.u else st.v
      val pred = preds(comp)
      val dcVals =
        if (cbpChroma != 0) chromaDcDequant(dcScan(comp), qpC) else new Array[Int](4)
      var b = 0
      while (b < 4) {
        val ox = (b % 2) * 4
        val oy = (b / 2) * 4
        val d = new Array[Int](16)
        d(0) = dcVals(b)
        if (cbpChroma == 2) {
          var k = 1
          while (k < 16) {
            if (acScan(comp)(b)(k) != 0) {
              val rpos = Zigzag4x4(k)
              d(rpos) = dequant(acScan(comp)(b)(k), qpC, rpos / 4, rpos % 4)
            }
            k += 1
          }
          val nzIdx = addr * 4 + b
          if (comp == 0) st.cbNz(nzIdx) = acTc(comp)(b).toByte
          else st.crNz(nzIdx) = acTc(comp)(b).toByte
        }
        val res = itrans4x4(d)
        var yy = 0
        while (yy < 4) {
          var xx = 0
          while (xx < 4) {
            plane((y0 + oy + yy) * st.cStride + x0 + ox + xx) =
              clamp255Pub(pred((oy + yy) * 8 + ox + xx) + res(yy * 4 + xx)).toByte
            xx += 1
          }
          yy += 1
        }
        b += 1
      }
      comp += 1
    }
    // neighbor-context state, decoder-final before any emission
    if (cbpChroma != 0) {
      st.cbDcNzE(addr) = (if (dcScan(0).exists(_ != 0)) 1 else 0).toByte
      st.crDcNzE(addr) = (if (dcScan(1).exists(_ != 0)) 1 else 0).toByte
    }
    val emit: MbSink => Unit = { sink =>
      if (cbpChroma != 0) {
        sink.residual(3, dcScan(0), addr, 0, cb = true)
        sink.residual(3, dcScan(1), addr, 0, cb = false)
      }
      if (cbpChroma == 2) {
        var c2 = 0
        while (c2 < 2) {
          var b = 0
          while (b < 4) {
            val full = new Array[Int](15)
            System.arraycopy(acScan(c2)(b), 1, full, 0, 15)
            sink.residual(4, full, addr, b, cb = c2 == 0)
            b += 1
          }
          c2 += 1
        }
      }
    }
    (mode, cbpChroma, emit)
  }

  // ------------------------------------------------------------------
  // AVCDecoderConfigurationRecord (ISO 14496-15 5.3.3.1) — the `avcC`
  // payload carried inside the avc1 sample entry
  // ------------------------------------------------------------------

  /** Build an avcC payload from raw SPS/PPS NAL units (header byte
    * included). `lengthSize` is the per-sample NAL length prefix width.
    */
  def avccPayload(sps: Seq[Array[Byte]], pps: Seq[Array[Byte]],
                  lengthSize: Int = 4): Array[Byte] = {
    require(sps.nonEmpty && pps.nonEmpty && lengthSize >= 1 && lengthSize <= 4)
    val out = new java.io.ByteArrayOutputStream()
    out.write(1) // configurationVersion
    out.write(sps.head(1) & 0xff) // AVCProfileIndication (SPS byte 1)
    out.write(sps.head(2) & 0xff) // profile_compatibility
    out.write(sps.head(3) & 0xff) // AVCLevelIndication
    out.write(0xfc | (lengthSize - 1))
    out.write(0xe0 | sps.length)
    sps.foreach { n => out.write(n.length >> 8); out.write(n.length & 0xff); out.write(n, 0, n.length) }
    out.write(pps.length)
    pps.foreach { n => out.write(n.length >> 8); out.write(n.length & 0xff); out.write(n, 0, n.length) }
    out.toByteArray
  }

  /** Parse an avcC payload -> (SPS NALs, PPS NALs, NAL length size).
    * None on any structural violation (fail closed, never a guess).
    */
  def parseAvcc(p: Array[Byte]): Option[(Seq[Array[Byte]], Seq[Array[Byte]], Int)] = {
    if (p.length < 7 || (p(0) & 0xff) != 1) return None
    val lengthSize = (p(4) & 3) + 1
    var i = 5
    def takeSet(n: Int): Option[Seq[Array[Byte]]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var k = 0
      while (k < n) {
        if (i + 2 > p.length) return None
        val len = ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
        i += 2
        if (len <= 0 || i + len > p.length) return None
        out += java.util.Arrays.copyOfRange(p, i, i + len)
        i += len
        k += 1
      }
      Some(out.toSeq)
    }
    val nSps = p(5) & 0x1f
    i = 6
    val sps = takeSet(nSps).getOrElse(return None)
    if (i >= p.length) return None
    val nPps = p(i) & 0xff
    i += 1
    val pps = takeSet(nPps).getOrElse(return None)
    if (sps.isEmpty || pps.isEmpty) None else Some((sps, pps, lengthSize))
  }

  /** Split an Annex-B stream into (spsNals, ppsNals, idrNals) — the
    * encoder-output shape the MP4 fixture builders repackage as avcC +
    * length-prefixed samples.
    */
  def splitAnnexB(b: Array[Byte]): (Seq[Array[Byte]], Seq[Array[Byte]], Seq[Array[Byte]]) = {
    val nals = annexBNals(b).map { case (s, e) => java.util.Arrays.copyOfRange(b, s, e) }
    (nals.filter(n => (n(0) & 0x1f) == 7),
      nals.filter(n => (n(0) & 0x1f) == 8),
      nals.filter(n => { val t = n(0) & 0x1f; t == 5 || t == 1 })) // slices
  }

  /** Length-prefix a set of NALs as one AVCC sample. Fails loudly when a
    * NAL's length does not fit the declared prefix width.
    */
  def toAvccSample(nals: Seq[Array[Byte]], lengthSize: Int = 4): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    nals.foreach { n =>
      require(lengthSize == 4 || n.length < (1L << (8 * lengthSize)),
        s"NAL of ${n.length} bytes does not fit a $lengthSize-byte length prefix")
      var k = lengthSize - 1
      while (k >= 0) { out.write((n.length >> (8 * k)) & 0xff); k -= 1 }
      out.write(n, 0, n.length)
    }
    out.toByteArray
  }
}
