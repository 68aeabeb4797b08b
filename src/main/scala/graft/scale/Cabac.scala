package graft.scale

/** CABAC — the H.264 context-adaptive binary arithmetic coder (ITU-T
  * H.264 clause 9.3), scoped to what IDR I-slice coding needs. Written
  * from the published spec structure; no reference-repo counterpart
  * exists (the reference is an Airflow repo; cf. SURVEY.md §2.10's
  * multimodal extension family).
  *
  * Engine (9.3.3.2 decode / 9.3.4 encode): 9-bit range [256, 510] with a
  * 64-state LPS probability ladder. [[RangeTabLps]] (Table 9-44) and
  * [[TransIdxLps]] (Table 9-45) are the published constants.
  *
  * Context models: two parallel byte arrays (pStateIdx, valMPS), indexed
  * by the spec's ctxIdx space, initialized per slice QP from the I-slice
  * (m, n) init pairs via the spec's preCtxState formula (9.3.1.1).
  *
  * PROVENANCE / residual risk (mirrors the CAVLC VLC-table caveat in
  * [[Avc]]): the engine tables, binarizations, and context-increment
  * derivations are structural and are exercised end to end by the
  * encoder↔decoder↔Python-twin agreement (AvcSpec + tools/
  * avc1_crosscheck.py). The (m, n) INIT pairs are transcribed from
  * memory of the published tables; a mis-recalled pair cannot affect any
  * in-repo certification (encoder, decoder, and twin share the table by
  * spec design — init values only seed probabilities), but WOULD
  * desynchronize against a third-party encoder's bitstream. No
  * independent H.264 implementation exists in this container to validate
  * against (ldconfig: HEVC/AV1 only), so that residual risk is
  * documented rather than discharged; the high-confidence blocks are the
  * engine tables and the significance/last/level runs (ctx 105-275).
  */
private[scale] object Cabac {

  /** Table 9-44: rangeTabLPS[pStateIdx][qCodIRangeIdx]. */
  val RangeTabLps: Array[Array[Int]] = Array(
    Array(128, 176, 208, 240), Array(128, 167, 197, 227),
    Array(128, 158, 187, 216), Array(123, 150, 178, 205),
    Array(116, 142, 169, 195), Array(111, 135, 160, 185),
    Array(105, 128, 152, 175), Array(100, 122, 144, 166),
    Array(95, 116, 137, 158), Array(90, 110, 130, 150),
    Array(85, 104, 123, 142), Array(81, 99, 117, 135),
    Array(77, 94, 111, 128), Array(73, 89, 105, 122),
    Array(69, 85, 100, 116), Array(66, 80, 95, 110),
    Array(62, 76, 90, 104), Array(59, 72, 86, 99),
    Array(56, 69, 81, 94), Array(53, 65, 77, 89),
    Array(51, 62, 73, 85), Array(48, 59, 69, 80),
    Array(46, 56, 66, 76), Array(43, 53, 63, 72),
    Array(41, 50, 59, 69), Array(39, 48, 56, 65),
    Array(37, 45, 54, 62), Array(35, 43, 51, 59),
    Array(33, 41, 48, 56), Array(32, 39, 46, 53),
    Array(30, 37, 43, 50), Array(29, 35, 41, 48),
    Array(27, 33, 39, 45), Array(26, 31, 37, 43),
    Array(24, 30, 35, 41), Array(23, 28, 33, 39),
    Array(22, 27, 32, 37), Array(21, 26, 30, 35),
    Array(20, 24, 29, 33), Array(19, 23, 27, 31),
    Array(18, 22, 26, 30), Array(17, 21, 25, 28),
    Array(16, 20, 23, 27), Array(15, 19, 22, 25),
    Array(14, 18, 21, 24), Array(14, 17, 20, 23),
    Array(13, 16, 19, 22), Array(12, 15, 18, 21),
    Array(12, 14, 17, 20), Array(11, 14, 16, 19),
    Array(11, 13, 15, 18), Array(10, 12, 15, 17),
    Array(10, 12, 14, 16), Array(9, 11, 13, 15),
    Array(9, 11, 12, 14), Array(8, 10, 12, 14),
    Array(8, 9, 11, 13), Array(7, 9, 11, 12),
    Array(7, 9, 10, 12), Array(7, 8, 10, 11),
    Array(6, 8, 9, 11), Array(6, 7, 9, 10),
    Array(6, 7, 8, 9), Array(2, 2, 2, 2))

  /** Table 9-45: transIdxLPS (MPS transition is min(s+1, 62)). */
  val TransIdxLps: Array[Int] = Array(
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 23, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63)

  // ---- ctxIdx layout (the I-slice subset) --------------------------
  val CtxMbTypeI = 3 // +0..2 bin0 (neighbor inc), +3 cbpL, +4/+5 chroma, +6/+7 predmode
  val CtxMbQpDelta = 60 // +0/1 bin0, +2 bin1, +3 bins>=2
  val CtxIntraChroma = 64 // +0..2 bin0, +3 bins 1..2
  val CtxPrevI4Mode = 68
  val CtxRemI4Mode = 69
  val CtxCbpLuma = 73 // +condA+2*condB
  val CtxCbpChroma = 77 // bin0 +0..3, bin1 +4..7
  val CtxCbf = 85 // + catOffCbf + condA + 2*condB
  val CtxSig = 105 // + catOffSig + scanIdx
  val CtxLast = 166 // + catOffSig + scanIdx
  val CtxAbs = 227 // + catOffAbs + inc

  /** ctxBlockCatOffset per block category (0 I16DC, 1 I16AC, 2 Luma4x4,
    * 3 ChromaDC, 4 ChromaAC) for coded_block_flag / sig+last / abs level.
    */
  val CatOffCbf: Array[Int] = Array(0, 4, 8, 12, 16)
  val CatOffSig: Array[Int] = Array(0, 15, 29, 44, 47)
  val CatOffAbs: Array[Int] = Array(0, 10, 20, 30, 39)

  val NCtx = 277

  /** I-slice (m, n) context-init pairs for the ctxIdx subset above (see
    * the object scaladoc's provenance note). Unused indices are (0, 64)
    * — a neutral uniform state that no I-slice syntax element reaches.
    */
  val InitI: Array[(Int, Int)] = {
    val t = Array.fill[(Int, Int)](NCtx)((0, 64))
    def put(from: Int, vs: (Int, Int)*): Unit =
      vs.zipWithIndex.foreach { case (v, i) => t(from + i) = v }
    // 0..10: mb_type (SI prefix mirrors I)
    put(0, (20, -15), (2, 54), (3, 74), (20, -15), (2, 54), (3, 74),
      (-28, 127), (-23, 104), (-6, 53), (-1, 54), (7, 51))
    // 60..63: mb_qp_delta
    put(60, (0, 41), (0, 63), (0, 63), (0, 63))
    // 64..67: intra_chroma_pred_mode
    put(64, (0, 45), (-4, 78), (-3, 96), (-27, 126))
    // 68..69: prev_intra4x4_pred_mode_flag / rem_intra4x4_pred_mode
    put(68, (-28, 98), (-25, 101))
    // 73..76: coded_block_pattern luma
    put(73, (-16, 83), (-22, 110), (-21, 91), (-18, 102))
    // 77..84: coded_block_pattern chroma
    put(77, (-13, 93), (-29, 127), (-7, 92), (-5, 89), (-7, 96),
      (-13, 108), (-3, 46), (-1, 65))
    // 85..104: coded_block_flag (5 categories x 4 increments)
    put(85, (-17, 123), (-12, 115), (-16, 122), (-11, 115),
      (-12, 63), (-2, 68), (-15, 84), (-13, 104),
      (-3, 70), (-8, 93), (-10, 90), (-30, 127),
      (-1, 74), (-6, 97), (-7, 91), (-20, 127),
      (-4, 56), (-5, 82), (-7, 76), (-22, 125))
    // 105..165: significant_coeff_flag (frame)
    put(105, (-7, 93), (-11, 87), (-3, 77), (-5, 71), (-4, 63),
      (-4, 68), (-12, 84), (-7, 62), (-7, 65), (8, 61),
      (5, 56), (-2, 66), (1, 64), (0, 61), (-2, 78),
      (1, 50), (7, 52), (10, 35), (0, 44), (11, 38),
      (1, 45), (0, 46), (5, 44), (31, 17), (1, 51),
      (7, 50), (28, 19), (16, 33), (14, 62), (-13, 108),
      (-15, 100), (-13, 101), (-13, 91), (-12, 94), (-10, 88),
      (-16, 84), (-10, 86), (-7, 83), (-13, 87), (-19, 94),
      (1, 70), (0, 72), (-5, 74), (18, 59), (-8, 102),
      (-15, 100), (0, 95), (-4, 75), (2, 72), (-11, 75),
      (-3, 71), (15, 46), (-13, 69), (0, 62), (0, 65),
      (21, 37), (-15, 72), (9, 57), (16, 54), (0, 62),
      (12, 72))
    // 166..226: last_significant_coeff_flag (frame)
    put(166, (24, 0), (15, 9), (8, 25), (13, 18), (15, 9),
      (13, 19), (10, 37), (12, 18), (6, 29), (20, 33),
      (15, 30), (4, 45), (1, 58), (0, 62), (7, 61),
      (12, 38), (11, 45), (15, 39), (11, 42), (13, 44),
      (16, 45), (12, 41), (10, 49), (30, 34), (18, 42),
      (10, 55), (17, 51), (17, 46), (0, 89), (26, -19),
      (22, -17), (26, -17), (30, -25), (28, -20), (33, -23),
      (37, -27), (33, -23), (40, -28), (38, -17), (33, -11),
      (40, -15), (41, -6), (38, 1), (41, 17), (30, -6),
      (27, 3), (26, 22), (37, -16), (35, -4), (38, -8),
      (38, -3), (37, 3), (38, 5), (42, 0), (35, 16),
      (39, 22), (14, 48), (27, 37), (21, 60), (12, 68),
      (2, 97))
    // 227..275: coeff_abs_level_minus1
    put(227, (-3, 71), (-6, 42), (-5, 50), (-3, 54), (-2, 62),
      (0, 58), (1, 63), (-2, 72), (-1, 74), (-9, 91),
      (-5, 67), (-4, 76), (-4, 77), (-4, 65), (-9, 88),
      (-4, 66), (-3, 77), (-3, 76), (-6, 76), (10, 58),
      (-1, 76), (-1, 83), (-7, 99), (-14, 95), (2, 95),
      (0, 76), (-5, 74), (0, 70), (-11, 75), (1, 68),
      (0, 65), (-14, 73), (3, 62), (4, 62), (-1, 68),
      (-13, 75), (11, 55), (5, 64), (12, 70), (15, 6),
      (6, 19), (7, 16), (12, 14), (18, 13), (13, 11),
      (13, 15), (15, 16), (12, 23), (13, 23))
    t
  }

  @inline private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v

  /** Per-slice context state: (pStateIdx, valMPS) per ctxIdx, seeded from
    * [[InitI]] at the slice QP (9.3.1.1).
    */
  final class Contexts(sliceQp: Int) {
    val state = new Array[Byte](NCtx)
    val mps = new Array[Byte](NCtx)
    private val qp = clip3(0, 51, sliceQp)
    var i = 0
    while (i < NCtx) {
      val (m, n) = InitI(i)
      val pre = clip3(1, 126, ((m * qp) >> 4) + n)
      if (pre <= 63) { state(i) = (63 - pre).toByte; mps(i) = 0 }
      else { state(i) = (pre - 64).toByte; mps(i) = 1 }
      i += 1
    }
  }

  /** Arithmetic decoder over an [[Avc.BitReader]] (RBSP domain — the
    * emulation bytes are already removed). Bits past the stream end read
    * as 0 (the rbsp trailing alignment supplies the legitimate tail; a
    * truncated stream then fails on a syntax check downstream, exactly
    * like the CAVLC path).
    */
  final class Decoder(r: Avc.BitReader, ctx: Contexts) {
    private var range = 0
    private var offset = 0

    @inline private def readBit(): Int = if (r.bitsLeft > 0) r.u1() else 0

    def init(): Unit = {
      range = 510
      offset = 0
      var i = 0
      while (i < 9) { offset = (offset << 1) | readBit(); i += 1 }
    }
    init()

    /** Re-initialize after PCM sample data (9.3.1.2). */
    def reinit(): Unit = init()

    def decision(ctxIdx: Int): Int = {
      val s = ctx.state(ctxIdx)
      val rLps = RangeTabLps(s)((range >> 6) & 3)
      range -= rLps
      var bin = 0
      if (offset >= range) {
        bin = 1 - ctx.mps(ctxIdx)
        offset -= range
        range = rLps
        if (s == 0) ctx.mps(ctxIdx) = (1 - ctx.mps(ctxIdx)).toByte
        ctx.state(ctxIdx) = TransIdxLps(s).toByte
      } else {
        bin = ctx.mps(ctxIdx)
        if (s < 62) ctx.state(ctxIdx) = (s + 1).toByte
      }
      while (range < 256) {
        range <<= 1
        offset = (offset << 1) | readBit()
      }
      bin
    }

    def bypass(): Int = {
      offset = (offset << 1) | readBit()
      if (offset >= range) { offset -= range; 1 } else 0
    }

    def terminate(): Int = {
      range -= 2
      if (offset >= range) 1
      else {
        while (range < 256) {
          range <<= 1
          offset = (offset << 1) | readBit()
        }
        0
      }
    }
  }

  /** Arithmetic encoder emitting into an [[Avc.BitWriter]] (RBSP domain;
    * the caller anti-emulates afterwards). 9.3.4: PutBit with the
    * first-bit suppression and outstanding-bit accounting.
    */
  final class Encoder(w: Avc.BitWriter, ctx: Contexts) {
    private var low = 0
    private var range = 510
    private var firstBit = true
    private var outstanding = 0

    private def putBit(b: Int): Unit = {
      if (firstBit) firstBit = false else w.u1(b)
      while (outstanding > 0) { w.u1(1 - b); outstanding -= 1 }
    }

    // WNC carry accounting in the spec's 10-bit low register: a low at
    // or above HALF (0x200) is a resolved carry (emit 1), below QUARTER
    // (0x100) a resolved 0; the middle defers via bitsOutstanding.
    private def renorm(): Unit = {
      while (range < 256) {
        if (low >= 0x200) { putBit(1); low -= 0x200 }
        else if (low < 0x100) putBit(0)
        else { low -= 0x100; outstanding += 1 }
        range <<= 1
        low <<= 1
      }
    }

    def decision(ctxIdx: Int, bin: Int): Unit = {
      val s = ctx.state(ctxIdx)
      val rLps = RangeTabLps(s)((range >> 6) & 3)
      range -= rLps
      if (bin == ctx.mps(ctxIdx)) {
        if (s < 62) ctx.state(ctxIdx) = (s + 1).toByte
      } else {
        low += range
        range = rLps
        if (s == 0) ctx.mps(ctxIdx) = (1 - ctx.mps(ctxIdx)).toByte
        ctx.state(ctxIdx) = TransIdxLps(s).toByte
      }
      renorm()
    }

    def bypass(bin: Int): Unit = {
      low <<= 1
      if (bin != 0) low += range
      if (low >= 0x400) { putBit(1); low -= 0x400 }
      else if (low < 0x200) putBit(0)
      else { low -= 0x200; outstanding += 1 }
    }

    def terminate(bin: Int): Unit = {
      range -= 2
      if (bin != 0) {
        low += range
        range = 2
        renorm()
        flush()
      } else renorm()
    }

    /** 9.3.4.6 EncodeFlush — called by terminate(1). After this, the
      * caller byte-aligns with zero bits (the final written 1 is the
      * rbsp stop bit) or, for PCM, writes the raw samples and re-inits.
      */
    private def flush(): Unit = {
      range = 2
      renorm()
      putBit((low >> 9) & 1)
      w.u1((low >> 8) & 1)
      w.u1(1)
    }

    /** Re-initialize after PCM sample data (9.3.4.1). */
    def reinit(): Unit = {
      low = 0
      range = 510
      firstBit = true
      outstanding = 0
    }
  }
}
