package graft.scale

/** Lossy WebP (VP8 key-frame) gray codec — RFC 6386, the intra-frame
  * subset. This is the companion to the VP8L lossless path in
  * [[Multimodal]]: most crawl WebP is lossy VP8, which previously failed
  * closed and never reached the perceptual-hash near-dup path.
  *
  * Decoder ([[decodeGray]]): a faithful key-frame decoder — bool coder
  * (§7), segmentation (§10), mode parsing with the key-frame trees (§11),
  * token decoding with per-frame probability updates (§13), dequantization
  * (§14), the exact integer inverse DCT/WHT (§14.3-.4), all intra
  * predictors, 16x16/chroma (§12.2) and the ten 4x4 B_PRED modes (§12.3),
  * and the in-loop deblocking filter, simple and normal forms with
  * segment/delta-adjusted levels (§15) — which is what makes
  * DEFAULT-encoded crawl WebP (libwebp writes filter_strength 60)
  * decodable, not just filter-free streams. It returns the luma plane as
  * 8-bit gray. FAILS CLOSED (None) on anything outside the proven subset:
  * inter frames and truncated streams.
  *
  * Encoder ([[encodeGray]]): a minimal spec-valid key-frame encoder used
  * by the fixture corpus — 16x16 intra modes chosen per macroblock by SAD,
  * flat chroma, loop filter off, a single token partition, default token
  * probabilities. Spec-validity is certified OUTSIDE this repo's own
  * machinery: tools/vp8_crosscheck.py decodes [[encodeGray]] streams with
  * the system libwebp and requires byte-identical luma against
  * [[decodeGray]], and conversely decodes libwebp-encoded streams with
  * [[decodeGray]] — either direction would surface a drifted constant,
  * bool-coder edge, or predictor bug.
  *
  * Everything is integer-exact; there is no floating point anywhere.
  */
object Vp8 {

  // ---- bool coder (RFC 6386 §7) -------------------------------------------

  private[scale] final class BoolDecoder(b: Array[Byte], start: Int, end: Int) {
    private var range = 255
    private var value = 0
    private var bitCount = 0
    private var pos = start

    /** True once any read went past the partition end: a well-formed
      * stream never does (the encoder's stop sequence leaves slack), so a
      * decode that overran was TRUNCATED and must fail closed rather than
      * hash zero-padded pixels.
      */
    private[scale] var overran = false

    /** True once the decode loop assigned this token partition a MB row.
      * A legal stream may carry EMPTY trailing partitions (mbh < nParts
      * leaves high partitions unassigned; libwebp emits them as 0 bytes),
      * and the eager 2-byte priming below flags `overran` on those at
      * construction — so the fail-closed check must ignore partitions
      * that no row ever read (r17 ADVICE item 2).
      */
    private[scale] var used = false

    // two-byte priming window (§7.3); short partitions read as zeros
    value = (nextByte() << 8) | nextByte()

    private def nextByte(): Int =
      if (pos < end) { val v = b(pos) & 0xff; pos += 1; v }
      else { overran = true; 0 }

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      val ret = if (value >= bigSplit) {
        range -= split; value -= bigSplit; 1
      } else { range = split; 0 }
      while (range < 128) {
        value <<= 1
        range <<= 1
        bitCount += 1
        if (bitCount == 8) { bitCount = 0; value |= nextByte() }
      }
      ret
    }

    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }

    /** Literal magnitude then sign bit (§9.3 "signed" fields). */
    def signedLiteral(n: Int): Int = {
      val v = literal(n)
      if (bool(128) == 1) -v else v
    }

    def flag(): Boolean = bool(128) == 1

    /** Token-tree walk: positive entries are edge indexes, negative entries
      * are -(leaf+1). `probs(o + node/2)` drives each branch.
      */
    def tree(t: Array[Int], probs: Array[Int], o: Int, start: Int = 0): Int = {
      var i = t(start + bool(probs(o + (start >> 1))))
      while (i > 0) i = t(i + bool(probs(o + (i >> 1))))
      -i - 1
    }
  }

  private[scale] final class BoolEncoder {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var range = 255
    private var bottom = 0L
    private var bitCount = 24

    private def carry(): Unit = {
      var i = buf.length - 1
      while (buf(i) == -1) { buf(i) = 0; i -= 1 }
      buf(i) = (buf(i) + 1).toByte
    }

    def bool(prob: Int, v: Boolean): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (v) { bottom += split; range -= split } else range = split
      while (range < 128) {
        range <<= 1
        if ((bottom & (1L << 31)) != 0L) carry()
        bottom = (bottom << 1) & 0xffffffffL
        bitCount -= 1
        if (bitCount == 0) {
          buf += ((bottom >> 24) & 0xff).toByte
          bottom &= 0xffffffL
          bitCount = 8
        }
      }
    }

    def literal(n: Int, v: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bool(128, ((v >> i) & 1) == 1); i -= 1 }
    }

    /** Emit the branch bits that reach `leaf` (trees are tiny — the
      * containing subtree is probed by recursion).
      */
    def tree(t: Array[Int], probs: Array[Int], o: Int, leaf: Int,
             start: Int = 0): Unit = {
      def contains(i: Int): Boolean =
        if (i <= 0) -i - 1 == leaf
        else contains(t(i)) || contains(t(i + 1))
      var i = start
      while (i >= 0) {
        val goRight = !contains(t(i))
        bool(probs(o + (i >> 1)), goRight)
        val nxt = if (goRight) t(i + 1) else t(i)
        if (nxt <= 0) {
          require(-nxt - 1 == leaf, s"tree walk missed leaf $leaf")
          i = -1
        } else i = nxt
      }
    }

    /** Terminate: push 32 zero bits so every meaningful `bottom` bit lands
      * in the buffer (the standard stop sequence).
      */
    def finish(): Array[Byte] = {
      var i = 0
      while (i < 32) { bool(128, v = false); i += 1 }
      buf.toArray
    }
  }

  // ---- trees and small constant tables (RFC 6386 §11, §13.2) --------------

  // tokens: 0..4 literal values, 5..10 categories, 11 = EOB
  private val TokEob = 11
  private val CoefTree = Array(
    -(TokEob + 1), 2, // EOB | more
    -1, 4, // ZERO (token 0 stored as -(0+1)) | more
    -2, 6, // ONE
    8, 12,
    -3, 10, // TWO
    -4, -5, // THREE FOUR
    14, 16,
    -6, -7, // CAT1 CAT2
    18, 20,
    -8, -9, // CAT3 CAT4
    -10, -11) // CAT5 CAT6
  private val CatBase = Array(5, 7, 11, 19, 35, 67)
  private val CatProbs: Array[Array[Int]] = Array(
    Array(159), Array(165, 145), Array(173, 148, 140),
    Array(176, 155, 140, 135), Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))

  private val Zigzag = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
  private val Bands = Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

  // 16x16 / chroma modes: 0=DC 1=V 2=H 3=TM, 4=B_PRED (luma only)
  private val ModeBPred = 4
  private val KfYmodeTree = Array(-(ModeBPred + 1), 2, 4, 6, -1, -2, -3, -4)
  private val KfYmodeProbs = Array(145, 156, 163, 128)
  private val UvModeTree = Array(-1, 2, -2, 4, -3, -4)
  private val KfUvModeProbs = Array(142, 114, 183)

  // 4x4 modes: 0=B_DC 1=B_TM 2=B_VE 3=B_HE 4=B_LD 5=B_RD 6=B_VR 7=B_VL 8=B_HD 9=B_HU
  private val BmodeTree = Array(
    -1, 2, // B_DC
    -2, 4, // B_TM
    -3, 6, // B_VE
    8, 12,
    -4, 10, // B_HE
    -6, -7, // B_RD B_VR
    -5, 14, // B_LD
    -8, 16, // B_VL
    -9, -10) // B_HD B_HU
  private val SegTree = Array(2, 4, -1, -2, -3, -4)

  // 16x16-mode to implied 4x4 mode for the B_PRED neighbor context (§11.5)
  private val ImpliedBmode = Array(0, 2, 3, 1) // DC->B_DC V->B_VE H->B_HE TM->B_TM

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  private def clampQ(v: Int): Int = if (v < 0) 0 else if (v > 127) 127 else v

  // ---- dequantization factors (RFC 6386 §14.1) -----------------------------

  private[scale] final case class Dequant(y1dc: Int, y1ac: Int, y2dc: Int,
                                          y2ac: Int, uvdc: Int, uvac: Int)

  private def dequantFor(qi: Int, ydc: Int, y2dc: Int, y2ac: Int,
                         uvdc: Int, uvac: Int): Dequant = {
    import Vp8Tables.{AcQLookup => Ac, DcQLookup => Dc}
    val y2acV = {
      val v = Ac(clampQ(qi + y2ac)) * 155 / 100
      if (v < 8) 8 else v
    }
    val uvdcV = {
      val v = Dc(clampQ(qi + uvdc))
      if (v > 132) 132 else v
    }
    Dequant(Dc(clampQ(qi + ydc)), Ac(clampQ(qi)),
      Dc(clampQ(qi + y2dc)) * 2, y2acV, uvdcV, Ac(clampQ(qi + uvac)))
  }

  // ---- exact inverse transforms (RFC 6386 §14.3-.4) ------------------------

  private val C1 = 20091 // cos(pi/8)*sqrt(2) - 1, Q16
  private val C2 = 35468 // sin(pi/8)*sqrt(2), Q16

  private[scale] def idct4x4(in: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) { // columns
      val a1 = in(i) + in(i + 8)
      val b1 = in(i) - in(i + 8)
      val t1 = (in(i + 4) * C2) >> 16
      val t2 = in(i + 12) + ((in(i + 12) * C1) >> 16)
      val c1 = t1 - t2
      val t3 = in(i + 4) + ((in(i + 4) * C1) >> 16)
      val t4 = (in(i + 12) * C2) >> 16
      val d1 = t3 + t4
      tmp(i) = a1 + d1; tmp(i + 12) = a1 - d1
      tmp(i + 4) = b1 + c1; tmp(i + 8) = b1 - c1
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) { // rows
      val o = i * 4
      val a1 = tmp(o) + tmp(o + 2)
      val b1 = tmp(o) - tmp(o + 2)
      val t1 = (tmp(o + 1) * C2) >> 16
      val t2 = tmp(o + 3) + ((tmp(o + 3) * C1) >> 16)
      val c1 = t1 - t2
      val t3 = tmp(o + 1) + ((tmp(o + 1) * C1) >> 16)
      val t4 = (tmp(o + 3) * C2) >> 16
      val d1 = t3 + t4
      out(o) = (a1 + d1 + 4) >> 3; out(o + 3) = (a1 - d1 + 4) >> 3
      out(o + 1) = (b1 + c1 + 4) >> 3; out(o + 2) = (b1 - c1 + 4) >> 3
      i += 1
    }
    out
  }

  private[scale] def iwht4x4(in: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = in(i) + in(i + 12)
      val b1 = in(i + 4) + in(i + 8)
      val c1 = in(i + 4) - in(i + 8)
      val d1 = in(i) - in(i + 12)
      tmp(i) = a1 + b1; tmp(i + 4) = c1 + d1
      tmp(i + 8) = a1 - b1; tmp(i + 12) = d1 - c1
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) {
      val o = i * 4
      val a1 = tmp(o) + tmp(o + 3)
      val b1 = tmp(o + 1) + tmp(o + 2)
      val c1 = tmp(o + 1) - tmp(o + 2)
      val d1 = tmp(o) - tmp(o + 3)
      out(o) = (a1 + b1 + 3) >> 3; out(o + 1) = (c1 + d1 + 3) >> 3
      out(o + 2) = (a1 - b1 + 3) >> 3; out(o + 3) = (d1 - c1 + 3) >> 3
      i += 1
    }
    out
  }

  // ---- forward transforms (encoder only — any invertible pair is valid;
  // these are the reference pair matched to the exact inverses above) ------

  private def fdct4x4(in: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) { // rows
      val o = i * 4
      val a1 = (in(o) + in(o + 3)) * 8
      val b1 = (in(o + 1) + in(o + 2)) * 8
      val c1 = (in(o + 1) - in(o + 2)) * 8
      val d1 = (in(o) - in(o + 3)) * 8
      tmp(o) = a1 + b1; tmp(o + 2) = a1 - b1
      tmp(o + 1) = (c1 * 2217 + d1 * 5352 + 14500) >> 12
      tmp(o + 3) = (d1 * 2217 - c1 * 5352 + 7500) >> 12
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) { // columns
      val a1 = tmp(i) + tmp(i + 12)
      val b1 = tmp(i + 4) + tmp(i + 8)
      val c1 = tmp(i + 4) - tmp(i + 8)
      val d1 = tmp(i) - tmp(i + 12)
      out(i) = (a1 + b1 + 7) >> 4
      out(i + 8) = (a1 - b1 + 7) >> 4
      out(i + 4) = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (if (d1 != 0) 1 else 0)
      out(i + 12) = (d1 * 2217 - c1 * 5352 + 51000) >> 16
      i += 1
    }
    out
  }

  /** Forward Walsh-Hadamard matched to [[iwht4x4]]: the inverse applies the
    * (unnormalized) butterfly twice and divides by 8, a total gain of 16/8;
    * applying the same butterflies and halving inverts it.
    */
  private def fwht4x4(in: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val o = i * 4
      val a1 = in(o) + in(o + 3)
      val b1 = in(o + 1) + in(o + 2)
      val c1 = in(o + 1) - in(o + 2)
      val d1 = in(o) - in(o + 3)
      tmp(o) = a1 + b1; tmp(o + 1) = c1 + d1
      tmp(o + 2) = a1 - b1; tmp(o + 3) = d1 - c1
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) {
      val a1 = tmp(i) + tmp(i + 12)
      val b1 = tmp(i + 4) + tmp(i + 8)
      val c1 = tmp(i + 4) - tmp(i + 8)
      val d1 = tmp(i) - tmp(i + 12)
      def half(v: Int): Int = if (v >= 0) (v + 1) >> 1 else -((-v + 1) >> 1)
      out(i) = half(a1 + b1); out(i + 4) = half(c1 + d1)
      out(i + 8) = half(a1 - b1); out(i + 12) = half(d1 - c1)
      i += 1
    }
    out
  }

  // ---- intra predictors ----------------------------------------------------

  /** 16x16 / 8x8 whole-block prediction (§12.2) into `dst` at (x0,y0).
    * `have*` gate the frame borders: absent above rows read 127, absent
    * left columns read 129.
    */
  private def predictBlock(dst: Array[Byte], stride: Int, x0: Int, y0: Int,
                           n: Int, mode: Int, haveAbove: Boolean,
                           haveLeft: Boolean): Unit = {
    def above(dx: Int): Int =
      if (haveAbove) dst((y0 - 1) * stride + x0 + dx) & 0xff else 127
    def left(dy: Int): Int =
      if (haveLeft) dst((y0 + dy) * stride + x0 - 1) & 0xff else 129
    // corner default follows its ROW: a missing above row is all 127
    // (corner included); with above present but left missing the corner
    // sits on the 129 left border
    val aboveLeft: Int =
      if (!haveAbove) 127
      else if (!haveLeft) 129
      else dst((y0 - 1) * stride + x0 - 1) & 0xff
    mode match {
      case 0 => // DC
        var sum = 0
        var shift = if (n == 16) 3 else 2
        var cnt = 0
        if (haveAbove) { var i = 0; while (i < n) { sum += above(i); i += 1 }; cnt += 1 }
        if (haveLeft) { var i = 0; while (i < n) { sum += left(i); i += 1 }; cnt += 1 }
        val dc =
          if (cnt == 0) 128
          else { shift += cnt; (sum + (1 << (shift - 1))) >> shift }
        var y = 0
        while (y < n) {
          var x = 0
          while (x < n) { dst((y0 + y) * stride + x0 + x) = dc.toByte; x += 1 }
          y += 1
        }
      case 1 => // V
        var y = 0
        while (y < n) {
          var x = 0
          while (x < n) { dst((y0 + y) * stride + x0 + x) = above(x).toByte; x += 1 }
          y += 1
        }
      case 2 => // H
        var y = 0
        while (y < n) {
          val l = left(y)
          var x = 0
          while (x < n) { dst((y0 + y) * stride + x0 + x) = l.toByte; x += 1 }
          y += 1
        }
      case 3 => // TM
        var y = 0
        while (y < n) {
          val l = left(y)
          var x = 0
          while (x < n) {
            dst((y0 + y) * stride + x0 + x) = clamp255(l + above(x) - aboveLeft).toByte
            x += 1
          }
          y += 1
        }
      case other => throw new IllegalStateException(s"16x16 mode $other")
    }
  }

  /** 4x4 B_PRED prediction (§12.3) into `dst` at (x0,y0). `a` holds the 8
    * pixels above (4 above + 4 above-right), `l` the 4 left pixels, `al`
    * the above-left corner.
    */
  private def predict4x4(dst: Array[Byte], stride: Int, x0: Int, y0: Int,
                         mode: Int, a: Array[Int], l: Array[Int], al: Int): Unit = {
    def put(x: Int, y: Int, v: Int): Unit =
      dst((y0 + y) * stride + x0 + x) = v.toByte
    def avg3(x: Int, y: Int, z: Int): Int = (x + 2 * y + z + 2) >> 2
    def avg2(x: Int, y: Int): Int = (x + y + 1) >> 1
    mode match {
      case 0 => // B_DC: average of the 4 above + 4 left, always rounded /8
        var sum = 4
        var i = 0
        while (i < 4) { sum += a(i) + l(i); i += 1 }
        val dc = sum >> 3
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { put(x, y, dc); x += 1 }; y += 1 }
      case 1 => // B_TM
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) { put(x, y, clamp255(l(y) + a(x) - al)); x += 1 }
          y += 1
        }
      case 2 => // B_VE: filtered vertical
        val p = Array(avg3(al, a(0), a(1)), avg3(a(0), a(1), a(2)),
          avg3(a(1), a(2), a(3)), avg3(a(2), a(3), a(4)))
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { put(x, y, p(x)); x += 1 }; y += 1 }
      case 3 => // B_HE: filtered horizontal
        val p = Array(avg3(al, l(0), l(1)), avg3(l(0), l(1), l(2)),
          avg3(l(1), l(2), l(3)), avg3(l(2), l(3), l(3)))
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { put(x, y, p(y)); x += 1 }; y += 1 }
      case 4 => // B_LD (down-left)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val i = x + y
            put(x, y,
              if (i < 6) avg3(a(i), a(i + 1), a(i + 2))
              else avg3(a(6), a(7), a(7)))
            x += 1
          }
          y += 1
        }
      case 5 => // B_RD (down-right)
        val e = Array(l(3), l(2), l(1), l(0), al, a(0), a(1), a(2), a(3))
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val i = 3 + x - y // 0..6 over e's interior
            put(x, y, avg3(e(i), e(i + 1), e(i + 2)))
            x += 1
          }
          y += 1
        }
      case 6 => // B_VR (vertical-right)
        val e = Array(l(3), l(2), l(1), l(0), al, a(0), a(1), a(2), a(3))
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val d = 2 * x - y
            val v =
              if (d >= 0 && d % 2 == 0) avg2(e(4 + d / 2), e(5 + d / 2))
              else if (d >= -1) avg3(e(3 + (d + 1) / 2), e(4 + (d + 1) / 2), e(5 + (d + 1) / 2))
              else avg3(e(4 + d), e(5 + d), e(6 + d))
            put(x, y, v)
            x += 1
          }
          y += 1
        }
      case 7 => // B_VL (vertical-left)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val v =
              if (y % 2 == 0) avg2(a(x + y / 2), a(x + y / 2 + 1))
              else avg3(a(x + y / 2), a(x + y / 2 + 1), a(x + y / 2 + 2))
            // the two bottom-right corner pixels use dedicated taps
            val vv =
              if (x == 3 && y == 2) avg3(a(4), a(5), a(6))
              else if (x == 3 && y == 3) avg3(a(5), a(6), a(7))
              else v
            put(x, y, vv)
            x += 1
          }
          y += 1
        }
      case 8 => // B_HD (horizontal-down)
        // rows fill left-to-right; columns >= 2 repeat the row above,
        // shifted two to the left (the spec's diagonal replication)
        val e = Array(l(3), l(2), l(1), l(0), al, a(0), a(1), a(2))
        val p = Array.ofDim[Int](4, 4)
        var y = 0
        while (y < 4) {
          val i = 3 - y // index of l(y) within e
          p(y)(0) = avg2(e(i), e(i + 1))
          p(y)(1) = avg3(e(i), e(i + 1), e(i + 2))
          var x = 2
          while (x < 4) {
            p(y)(x) =
              if (y == 0) avg3(e(2 + x), e(3 + x), e(4 + x))
              else p(y - 1)(x - 2)
            x += 1
          }
          y += 1
        }
        y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) { put(x, y, p(y)(x)); x += 1 }
          y += 1
        }
      case 9 => // B_HU (horizontal-up)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val i = x + 2 * y
            put(x, y,
              if (i < 6 && i % 2 == 0) avg2(l(i / 2), l(i / 2 + 1))
              else if (i < 5) avg3(l(i / 2), l(i / 2 + 1), l(i / 2 + 2))
              else if (i == 5) avg3(l(2), l(3), l(3))
              else l(3))
            x += 1
          }
          y += 1
        }
      case other => throw new IllegalStateException(s"4x4 mode $other")
    }
  }

  // ---- token (coefficient) codec (RFC 6386 §13) ----------------------------

  /** Decode one 4x4 block's coefficients into natural order, dequantized.
    * Returns the count of decoded coefficients (0 = the block is empty;
    * nonzero context for neighbors is `count > 0`... see caller).
    */
  private def decodeCoeffs(bd: BoolDecoder, probs: Array[Int], plane: Int,
                           ctx0: Int, first: Int, dqDc: Int, dqAc: Int,
                           out: Array[Int]): Int = {
    java.util.Arrays.fill(out, 0)
    var n = first
    var ctx = ctx0
    var nz = 0
    var skipEob = false
    while (n < 16) {
      val o = ((plane * 8 + Bands(n)) * 3 + ctx) * 11
      val tok = bd.tree(CoefTree, probs, o, start = if (skipEob) 2 else 0)
      if (tok == TokEob) return nz
      if (tok == 0) { // ZERO
        ctx = 0; skipEob = true; n += 1
      } else {
        val mag =
          if (tok <= 4) tok
          else {
            val cat = tok - 5
            val cp = CatProbs(cat)
            var extra = 0
            var i = 0
            while (i < cp.length) { extra = (extra << 1) | bd.bool(cp(i)); i += 1 }
            CatBase(cat) + extra
          }
        val v = if (bd.bool(128) == 1) -mag else mag
        val pos = Zigzag(n)
        out(pos) = v * (if (pos == 0) dqDc else dqAc)
        nz = n + 1
        ctx = if (mag == 1) 1 else 2
        skipEob = false
        n += 1
      }
    }
    nz
  }

  /** Encode one block's QUANTIZED coefficients (natural order). Mirror of
    * [[decodeCoeffs]].
    */
  private def encodeCoeffs(be: BoolEncoder, probs: Array[Int], plane: Int,
                           ctx0: Int, first: Int, q: Array[Int]): Int = {
    var last = -1
    var i = first
    while (i < 16) { if (q(Zigzag(i)) != 0) last = i; i += 1 }
    var n = first
    var ctx = ctx0
    var skipEob = false
    while (n <= last) {
      val v = q(Zigzag(n))
      val mag = math.abs(v)
      val o = ((plane * 8 + Bands(n)) * 3 + ctx) * 11
      val start = if (skipEob) 2 else 0
      if (mag == 0) {
        be.tree(CoefTree, probs, o, 0, start)
        ctx = 0; skipEob = true
      } else {
        val tok =
          if (mag <= 4) mag
          else {
            var cat = 5
            while (cat < 10 && mag >= CatBase(cat - 5 + 1)) cat += 1
            // cat in 5..10 where CatBase(cat-5) <= mag
            cat
          }
        be.tree(CoefTree, probs, o, tok, start)
        if (tok >= 5) {
          val cat = tok - 5
          val cp = CatProbs(cat)
          val extra = mag - CatBase(cat)
          var i2 = 0
          while (i2 < cp.length) {
            be.bool(cp(i2), ((extra >> (cp.length - 1 - i2)) & 1) == 1)
            i2 += 1
          }
        }
        be.bool(128, v < 0)
        ctx = if (mag == 1) 1 else 2
        skipEob = false
      }
      n += 1
    }
    if (last < 15) {
      val o = ((plane * 8 + Bands(if (last < first) first else last + 1)) * 3 + ctx) * 11
      be.tree(CoefTree, probs, o, TokEob, start = if (skipEob) 2 else 0)
    }
    if (last >= first) last + 1 else 0
  }

  // ---- frame decode ---------------------------------------------------------

  /** Decode a VP8 key frame ("VP8 " chunk payload) to its luma plane as
    * 8-bit gray. None = outside the proven subset (see object scaladoc).
    */
  def decodeGray(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try decodeGrayUnsafe(b)
    catch { case scala.util.control.NonFatal(_) => None }
  }

  private def decodeGrayUnsafe(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < 10) return None
    val tag = (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16)
    val keyFrame = (tag & 1) == 0
    val version = (tag >> 1) & 7
    val firstPartSize = tag >> 5
    if (!keyFrame || version > 3) return None
    if ((b(3) & 0xff) != 0x9d || (b(4) & 0xff) != 0x01 || (b(5) & 0xff) != 0x2a)
      return None
    val w = ((b(6) & 0xff) | ((b(7) & 0xff) << 8)) & 0x3fff
    val h = ((b(8) & 0xff) | ((b(9) & 0xff) << 8)) & 0x3fff
    if (w == 0 || h == 0) return None
    if (10 + firstPartSize > b.length) return None

    val bd = new BoolDecoder(b, 10, 10 + firstPartSize)
    val colorSpace = bd.bool(128)
    bd.bool(128) // clamping type: both values decode identically here
    if (colorSpace != 0) return None

    // segmentation (§9.3)
    val segEnabled = bd.flag()
    var updateMap = false
    val segTreeProbs = Array(255, 255, 255)
    val segQ = new Array[Int](4)
    val segLf = new Array[Int](4)
    var segQAbs = false
    if (segEnabled) {
      updateMap = bd.flag()
      val updateData = bd.flag()
      if (updateData) {
        segQAbs = bd.flag()
        var i = 0
        while (i < 4) { if (bd.flag()) segQ(i) = bd.signedLiteral(7); i += 1 }
        i = 0
        while (i < 4) { if (bd.flag()) segLf(i) = bd.signedLiteral(6); i += 1 }
      }
      if (updateMap) {
        var i = 0
        while (i < 3) { if (bd.flag()) segTreeProbs(i) = bd.literal(8); i += 1 }
      }
    }

    // loop filter header (§9.4)
    val simpleFilter = bd.flag() // filter type: 1 = simple, 0 = normal
    val filterLevel = bd.literal(6)
    val sharpness = bd.literal(3)
    var refDelta0 = 0 // INTRA_FRAME delta — the only ref on a key frame
    var modeDelta0 = 0 // B_PRED delta — the only intra mode with one
    var lfDeltaEnabled = false
    if (bd.flag()) { // lf delta enabled
      lfDeltaEnabled = true
      if (bd.flag()) { // delta update
        val ref = new Array[Int](4)
        val mode = new Array[Int](4)
        var i = 0
        while (i < 4) { if (bd.flag()) ref(i) = bd.signedLiteral(6); i += 1 }
        i = 0
        while (i < 4) { if (bd.flag()) mode(i) = bd.signedLiteral(6); i += 1 }
        refDelta0 = ref(0)
        modeDelta0 = mode(0)
      }
    }

    // token partitions (§9.5)
    val nParts = 1 << bd.literal(2)
    val partTable = 10 + firstPartSize
    val partDataStart = partTable + 3 * (nParts - 1)
    if (partDataStart > b.length) return None
    val parts = new Array[BoolDecoder](nParts)
    var off = partDataStart
    var pi = 0
    while (pi < nParts) {
      val size =
        if (pi == nParts - 1) b.length - off
        else (b(partTable + 3 * pi) & 0xff) |
          ((b(partTable + 3 * pi + 1) & 0xff) << 8) |
          ((b(partTable + 3 * pi + 2) & 0xff) << 16)
      if (size < 0 || off + size > b.length) return None
      parts(pi) = new BoolDecoder(b, off, off + size)
      off += size
      pi += 1
    }

    // quantizers (§9.6)
    val yacQi = bd.literal(7)
    def delta(): Int = if (bd.flag()) bd.signedLiteral(4) else 0
    val ydcD = delta(); val y2dcD = delta(); val y2acD = delta()
    val uvdcD = delta(); val uvacD = delta()
    val dequants: Array[Dequant] = Array.tabulate(4) { s =>
      val qi =
        if (!segEnabled) yacQi
        else if (segQAbs) segQ(s)
        else yacQi + segQ(s)
      dequantFor(clampQ(qi), ydcD, y2dcD, y2acD, uvdcD, uvacD)
    }

    bd.flag() // refresh entropy probs (keyframe: no effect on this frame)

    // token probability updates (§13.4)
    val probs = Vp8Tables.CoefProbs.clone()
    var t = 0
    while (t < 1056) {
      if (bd.bool(Vp8Tables.CoefUpdateProbs(t)) == 1) probs(t) = bd.literal(8)
      t += 1
    }

    val skipEnabled = bd.flag()
    val skipProb = if (skipEnabled) bd.literal(8) else 0

    val mbw = (w + 15) / 16
    val mbh = (h + 15) / 16

    // mode parse (first partition, all MBs in raster order)
    val ymodes = new Array[Int](mbw * mbh)
    val segIds = new Array[Int](mbw * mbh)
    val skips = new Array[Boolean](mbw * mbh)
    val bmodes = new Array[Array[Int]](mbw * mbh) // non-null only for B_PRED
    // 4x4-mode context rows for kf bmode probs
    val aboveB = Array.fill(mbw * 4)(0)
    var mb = 0
    var mby = 0
    while (mby < mbh) {
      val leftB = Array.fill(4)(0)
      var mbx = 0
      while (mbx < mbw) {
        if (segEnabled && updateMap)
          segIds(mb) = {
            var i = SegTree(bd.bool(segTreeProbs(0)))
            while (i > 0) i = SegTree(i + bd.bool(segTreeProbs(i >> 1)))
            -i - 1
          }
        if (skipEnabled) skips(mb) = bd.bool(skipProb) == 1
        val ym = bd.tree(KfYmodeTree, KfYmodeProbs, 0)
        ymodes(mb) = ym
        if (ym == ModeBPred) {
          val bm = new Array[Int](16)
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              val above = if (r == 0) aboveB(mbx * 4 + c) else bm((r - 1) * 4 + c)
              val left = if (c == 0) leftB(r) else bm(r * 4 + c - 1)
              val o = (above * 10 + left) * 9
              bm(r * 4 + c) = bd.tree(BmodeTree, Vp8Tables.KfBmodeProbs, o)
              c += 1
            }
            r += 1
          }
          bmodes(mb) = bm
          var i = 0
          while (i < 4) {
            aboveB(mbx * 4 + i) = bm(12 + i)
            leftB(i) = bm(i * 4 + 3)
            i += 1
          }
        } else {
          val imp = ImpliedBmode(ym)
          var i = 0
          while (i < 4) { aboveB(mbx * 4 + i) = imp; leftB(i) = imp; i += 1 }
        }
        // uv mode is parsed and discarded — gray output never renders chroma
        bd.tree(UvModeTree, KfUvModeProbs, 0)
        mb += 1
        mbx += 1
      }
      mby += 1
    }

    // residual decode + reconstruction
    val stride = mbw * 16
    val yPlane = new Array[Byte](stride * mbh * 16)
    // nonzero contexts
    val aboveNzY = new Array[Int](mbw * 4)
    val aboveNzU = new Array[Int](mbw * 2)
    val aboveNzV = new Array[Int](mbw * 2)
    val aboveNzY2 = new Array[Int](mbw)
    val coeffs = new Array[Int](16)
    // per-MB "any nonzero coefficient" (Y2 + Y + chroma) — drives the
    // loop filter's inner-edge decision
    val hasCoeffs = new Array[Boolean](mbw * mbh)

    mb = 0
    mby = 0
    while (mby < mbh) {
      val bdTok = parts(mby % nParts)
      bdTok.used = true
      val leftNzY = new Array[Int](4)
      val leftNzU = new Array[Int](2)
      val leftNzV = new Array[Int](2)
      var leftNzY2 = 0
      var mbx = 0
      while (mbx < mbw) {
        val ym = ymodes(mb)
        val isB = ym == ModeBPred
        val dq = dequants(segIds(mb))
        val yCoeffs = new Array[Array[Int]](16)
        var hasY2 = false
        val y2out = new Array[Int](16)

        if (skips(mb)) {
          java.util.Arrays.fill(leftNzY, 0)
          java.util.Arrays.fill(leftNzU, 0)
          java.util.Arrays.fill(leftNzV, 0)
          var i = 0
          while (i < 4) { aboveNzY(mbx * 4 + i) = 0; i += 1 }
          i = 0
          while (i < 2) {
            aboveNzU(mbx * 2 + i) = 0; aboveNzV(mbx * 2 + i) = 0; i += 1
          }
          if (!isB) { leftNzY2 = 0; aboveNzY2(mbx) = 0 }
        } else {
          if (!isB) {
            val ctx = aboveNzY2(mbx) + leftNzY2
            val n = decodeCoeffs(bdTok, probs, 1, ctx, 0, dq.y2dc, dq.y2ac, coeffs)
            val nz = if (n > 0) 1 else 0
            if (nz == 1) hasCoeffs(mb) = true
            aboveNzY2(mbx) = nz; leftNzY2 = nz
            hasY2 = true
            val wht = iwht4x4(coeffs)
            System.arraycopy(wht, 0, y2out, 0, 16)
          }
          val plane = if (isB) 3 else 0
          val first = if (isB) 0 else 1
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              val ctx = aboveNzY(mbx * 4 + c) + leftNzY(r)
              val out = new Array[Int](16)
              val n = decodeCoeffs(bdTok, probs, plane, ctx, first,
                dq.y1dc, dq.y1ac, out)
              if (hasY2) out(0) = y2out(r * 4 + c)
              yCoeffs(r * 4 + c) = out
              val nz = if (n > 0) 1 else 0
              if (nz == 1) hasCoeffs(mb) = true
              aboveNzY(mbx * 4 + c) = nz; leftNzY(r) = nz
              c += 1
            }
            r += 1
          }
          // chroma coefficients keep the stream in sync; pixels unused
          var pl = 0
          while (pl < 2) {
            val aNz = if (pl == 0) aboveNzU else aboveNzV
            val lNz = if (pl == 0) leftNzU else leftNzV
            var r2 = 0
            while (r2 < 2) {
              var c2 = 0
              while (c2 < 2) {
                val ctx = aNz(mbx * 2 + c2) + lNz(r2)
                val n = decodeCoeffs(bdTok, probs, 2, ctx, 0,
                  dq.uvdc, dq.uvac, coeffs)
                val nz = if (n > 0) 1 else 0
                if (nz == 1) hasCoeffs(mb) = true
                aNz(mbx * 2 + c2) = nz; lNz(r2) = nz
                c2 += 1
              }
              r2 += 1
            }
            pl += 1
          }
        }

        // reconstruction
        val x0 = mbx * 16
        val y0 = mby * 16
        if (!isB) {
          predictBlock(yPlane, stride, x0, y0, 16, ym, mby > 0, mbx > 0)
          if (!skips(mb)) {
            var r = 0
            while (r < 4) {
              var c = 0
              while (c < 4) {
                val res = idct4x4(yCoeffs(r * 4 + c))
                addBlock(yPlane, stride, x0 + c * 4, y0 + r * 4, res)
                c += 1
              }
              r += 1
            }
          }
        } else {
          // B_PRED: subblock-sequential predict+add. The above-right pixels
          // of the rightmost column come from the MB-top row (the above
          // MB's bottom row), the spec's stale-row rule; at the frame's
          // right edge they replicate the top row's last pixel.
          val bm = bmodes(mb)
          val a = new Array[Int](8)
          val l = new Array[Int](4)
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              val bx = x0 + c * 4
              val by = y0 + r * 4
              var i = 0
              while (i < 4) {
                a(i) = if (by > 0) yPlane((by - 1) * stride + bx + i) & 0xff else 127
                l(i) = if (bx > 0) yPlane((by + i) * stride + bx - 1) & 0xff else 129
                i += 1
              }
              // above-right 4: fresh within the MB for c<3; the stale
              // MB-top row for c==3 (every subblock row)
              if (c < 3) {
                var j = 0
                while (j < 4) {
                  a(4 + j) = if (by > 0) yPlane((by - 1) * stride + bx + 4 + j) & 0xff else 127
                  j += 1
                }
              } else {
                var j = 0
                while (j < 4) {
                  a(4 + j) =
                    if (y0 == 0) 127
                    else {
                      val xx = math.min(x0 + 16 + j, stride - 1)
                      // at the right frame edge the above MB row ends; the
                      // stale rule replicates its last pixel
                      val cap = if (mbx == mbw - 1) x0 + 15 else xx
                      yPlane((y0 - 1) * stride + math.min(xx, cap)) & 0xff
                    }
                  j += 1
                }
              }
              val al =
                if (by == 0) 127
                else if (bx == 0) 129
                else yPlane((by - 1) * stride + bx - 1) & 0xff
              predict4x4(yPlane, stride, bx, by, bm(r * 4 + c), a, l, al)
              if (!skips(mb)) {
                val res = idct4x4(yCoeffs(r * 4 + c))
                addBlock(yPlane, stride, bx, by, res)
              }
              c += 1
            }
            r += 1
          }
        }
        mb += 1
        mbx += 1
      }
      mby += 1
    }

    // a truncated stream decodes zeros past its end — refuse it (empty
    // UNUSED trailing partitions are legal: see BoolDecoder.used)
    if (bd.overran || parts.exists(p => p.used && p.overran)) return None

    // in-loop deblocking (§15), luma only — key-frame intra prediction
    // reads the UNFILTERED reconstruction (already done above), so one
    // raster-order post-pass is exactly the per-row filtering of a
    // streaming decoder
    if (filterLevel > 0) {
      mb = 0
      mby = 0
      while (mby < mbh) {
        var mbx = 0
        while (mbx < mbw) {
          val isB = ymodes(mb) == ModeBPred
          val base =
            if (segEnabled) {
              if (segQAbs) segLf(segIds(mb)) else filterLevel + segLf(segIds(mb))
            } else filterLevel
          var lvl = base
          if (lfDeltaEnabled) {
            lvl += refDelta0
            if (isB) lvl += modeDelta0
          }
          if (lvl < 0) lvl = 0
          if (lvl > 63) lvl = 63
          if (lvl > 0)
            filterMbLuma(yPlane, stride, mbx, mby, lvl, sharpness,
              simpleFilter, inner = isB || hasCoeffs(mb))
          mb += 1
          mbx += 1
        }
        mby += 1
      }
    }

    // crop
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      System.arraycopy(yPlane, y * stride, out, y * w, w)
      y += 1
    }
    Some((w, h, out))
  }

  // ---- in-loop deblocking filter (RFC 6386 §15), luma ----------------------

  private def c127(v: Int): Int = if (v < -128) -128 else if (v > 127) 127 else v

  /** Filter one 8-pixel line across an edge at `base` (q0's index), pixels
    * `step` apart: p3..p0 before the edge, q0..q3 after. Normal filter
    * (§15.2-.3): the six-tap mb-edge form or the subblock form under the
    * interior/edge limits and the high-edge-variance switch; simple filter
    * (§15.4): p0/q0 only under the edge limit. Signed arithmetic is int8
    * with saturation, exactly the spec's `c()`/`s2u` ops.
    */
  private def filterLine(px: Array[Byte], base: Int, step: Int, mbEdge: Boolean,
                         il: Int, el: Int, hevT: Int, simple: Boolean): Unit = {
    def g(i: Int): Int = px(base + i * step) & 0xff
    def put(i: Int, v: Int): Unit = px(base + i * step) = v.toByte
    val p1 = g(-2); val p0 = g(-1); val q0 = g(0); val q1 = g(1)
    if (math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 > el) return
    // signed views
    val sp1 = p1 - 128; val sp0 = p0 - 128; val sq0 = q0 - 128; val sq1 = q1 - 128
    def commonAdjust(useOuter: Boolean): Int = {
      val a = c127((if (useOuter) c127(sp1 - sq1) else 0) + 3 * (sq0 - sp0))
      val f1 = c127(a + 4) >> 3
      val f2 = c127(a + 3) >> 3
      put(0, c127(sq0 - f1) + 128)
      put(-1, c127(sp0 + f2) + 128)
      f1
    }
    if (simple) { commonAdjust(useOuter = true); return }
    val p3 = g(-4); val p2 = g(-3); val q2 = g(2); val q3 = g(3)
    if (math.abs(p3 - p2) > il || math.abs(p2 - p1) > il ||
        math.abs(p1 - p0) > il || math.abs(q1 - q0) > il ||
        math.abs(q2 - q1) > il || math.abs(q3 - q2) > il) return
    val hev = math.abs(p1 - p0) > hevT || math.abs(q1 - q0) > hevT
    if (!mbEdge) {
      val f1 = commonAdjust(hev)
      if (!hev) {
        val a = (f1 + 1) >> 1
        put(1, c127(sq1 - a) + 128)
        put(-2, c127(sp1 + a) + 128)
      }
    } else if (hev) {
      commonAdjust(useOuter = true)
    } else {
      val sp2 = p2 - 128; val sq2 = q2 - 128
      val w = c127(c127(sp1 - sq1) + 3 * (sq0 - sp0))
      var a = c127((27 * w + 63) >> 7)
      put(0, c127(sq0 - a) + 128)
      put(-1, c127(sp0 + a) + 128)
      a = c127((18 * w + 63) >> 7)
      put(1, c127(sq1 - a) + 128)
      put(-2, c127(sp1 + a) + 128)
      a = c127((9 * w + 63) >> 7)
      put(2, c127(sq2 - a) + 128)
      put(-3, c127(sp2 + a) + 128)
    }
  }

  /** [[filterLine]] exposed for kernel-level spec assertions. */
  private[scale] def filterLineForTest(px: Array[Byte], base: Int, step: Int,
                                       mbEdge: Boolean, il: Int, el: Int,
                                       hevT: Int, simple: Boolean): Unit =
    filterLine(px, base, step, mbEdge, il, el, hevT, simple)

  /** One macroblock's luma filtering at effective level `lvl` (§15.1-.2):
    * left MB edge, inner vertical edges, top MB edge, inner horizontal
    * edges — the reference order. Inner edges filter only when the MB has
    * coefficients or is B_PRED.
    */
  private def filterMbLuma(y: Array[Byte], stride: Int, mbx: Int, mby: Int,
                           lvl: Int, sharpness: Int, simple: Boolean,
                           inner: Boolean): Unit = {
    var il = lvl
    if (sharpness > 0) {
      il >>= (if (sharpness > 4) 2 else 1)
      if (il > 9 - sharpness) il = 9 - sharpness
    }
    if (il < 1) il = 1
    val eli = 2 * lvl + il
    val elm = eli + 4
    val hevT = if (lvl >= 40) 2 else if (lvl >= 15) 1 else 0
    val x0 = mbx * 16
    val y0 = mby * 16
    var i = 0
    if (mbx > 0) {
      i = 0
      while (i < 16) {
        filterLine(y, (y0 + i) * stride + x0, 1, mbEdge = true, il, elm, hevT, simple)
        i += 1
      }
    }
    if (inner) {
      var c = 4
      while (c < 16) {
        i = 0
        while (i < 16) {
          filterLine(y, (y0 + i) * stride + x0 + c, 1, mbEdge = false, il, eli, hevT, simple)
          i += 1
        }
        c += 4
      }
    }
    if (mby > 0) {
      i = 0
      while (i < 16) {
        filterLine(y, y0 * stride + x0 + i, stride, mbEdge = true, il, elm, hevT, simple)
        i += 1
      }
    }
    if (inner) {
      var r = 4
      while (r < 16) {
        i = 0
        while (i < 16) {
          filterLine(y, (y0 + r) * stride + x0 + i, stride, mbEdge = false, il, eli, hevT, simple)
          i += 1
        }
        r += 4
      }
    }
  }

  private def addBlock(dst: Array[Byte], stride: Int, x0: Int, y0: Int,
                       res: Array[Int]): Unit = {
    var y = 0
    while (y < 4) {
      var x = 0
      while (x < 4) {
        val p = (y0 + y) * stride + x0 + x
        dst(p) = clamp255((dst(p) & 0xff) + res(y * 4 + x)).toByte
        x += 1
      }
      y += 1
    }
  }

  // ---- frame encode ---------------------------------------------------------

  /** Encode 8-bit gray as a spec-valid VP8 key frame ("VP8 " chunk
    * payload): 16x16 intra modes by SAD, flat chroma, no loop filter, one
    * token partition, default probabilities. `qIndex` 0..127 trades size
    * for distortion (the fixture queries use low values so lossy re-encodes
    * stay inside the near-dup Hamming budget).
    */
  def encodeGray(pixels: Array[Byte], w: Int, h: Int, qIndex: Int = 8): Array[Byte] = {
    require(w > 0 && h > 0 && w < 16384 && h < 16384 && pixels.length == w * h)
    val qi = clampQ(qIndex)
    val dq = dequantFor(qi, 0, 0, 0, 0, 0)
    val mbw = (w + 15) / 16
    val mbh = (h + 15) / 16
    val stride = mbw * 16

    // padded source (edge replication)
    val src = new Array[Byte](stride * mbh * 16)
    var y = 0
    while (y < mbh * 16) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < stride) {
        src(y * stride + x) = pixels(sy * w + math.min(x, w - 1))
        x += 1
      }
      y += 1
    }
    val recon = new Array[Byte](stride * mbh * 16)

    val probs = Vp8Tables.CoefProbs
    val tokens = new BoolEncoder
    val header = new BoolEncoder

    // ---- per-MB encode ----
    val aboveNzY = new Array[Int](mbw * 4)
    val aboveNzY2 = new Array[Int](mbw)
    val ymodesOut = new Array[Int](mbw * mbh)

    var mb = 0
    var mby = 0
    while (mby < mbh) {
      val leftNzY = new Array[Int](4)
      var leftNzY2 = 0
      var mbx = 0
      while (mbx < mbw) {
        val x0 = mbx * 16
        val y0 = mby * 16
        // pick the best 16x16 mode by SAD on the source
        var bestMode = 0
        var bestSad = Int.MaxValue
        val pred = new Array[Byte](stride * mbh * 16)
        var m = 0
        while (m < 4) {
          if ((m != 1 || mby > 0) && (m != 2 || mbx > 0) &&
              (m != 3 || (mby > 0 && mbx > 0))) {
            System.arraycopy(recon, 0, pred, 0, recon.length)
            predictBlock(pred, stride, x0, y0, 16, m, mby > 0, mbx > 0)
            var sad = 0
            var yy = 0
            while (yy < 16 && sad < bestSad) {
              var xx = 0
              while (xx < 16) {
                sad += math.abs((src((y0 + yy) * stride + x0 + xx) & 0xff) -
                  (pred((y0 + yy) * stride + x0 + xx) & 0xff))
                xx += 1
              }
              yy += 1
            }
            if (sad < bestSad) { bestSad = sad; bestMode = m }
          }
          m += 1
        }
        ymodesOut(mb) = bestMode
        predictBlock(recon, stride, x0, y0, 16, bestMode, mby > 0, mbx > 0)

        // residual → fdct per 4x4, collect DCs → fwht → quantize
        val rawDc = new Array[Int](16)
        val quantized = new Array[Array[Int]](16)
        val block = new Array[Int](16)
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            var yy = 0
            while (yy < 4) {
              var xx = 0
              while (xx < 4) {
                val p = (y0 + r * 4 + yy) * stride + x0 + c * 4 + xx
                block(yy * 4 + xx) = (src(p) & 0xff) - (recon(p) & 0xff)
                xx += 1
              }
              yy += 1
            }
            val f = fdct4x4(block)
            rawDc(r * 4 + c) = f(0)
            val q = new Array[Int](16)
            var i = 1
            while (i < 16) {
              q(i) = quantize(f(i), dq.y1ac)
              i += 1
            }
            quantized(r * 4 + c) = q
            c += 1
          }
          r += 1
        }
        val y2f = fwht4x4(rawDc)
        val y2q = new Array[Int](16)
        var i = 0
        while (i < 16) {
          y2q(i) = quantize(y2f(i), if (i == 0) dq.y2dc else dq.y2ac)
          i += 1
        }

        // tokens (this also fixes the reconstruction): y2 then 16 Y blocks
        {
          val ctx = aboveNzY2(mbx) + leftNzY2
          val n = encodeCoeffs(tokens, probs, 1, ctx, 0, y2q)
          val nz = if (n > 0) 1 else 0
          aboveNzY2(mbx) = nz; leftNzY2 = nz
        }
        val y2deq = new Array[Int](16)
        i = 0
        while (i < 16) {
          y2deq(i) = y2q(i) * (if (i == 0) dq.y2dc else dq.y2ac)
          i += 1
        }
        val y2rec = iwht4x4(y2deq)
        r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val q = quantized(r * 4 + c)
            val ctx = aboveNzY(mbx * 4 + c) + leftNzY(r)
            val n = encodeCoeffs(tokens, probs, 0, ctx, 1, q)
            val nz = if (n > 0) 1 else 0
            aboveNzY(mbx * 4 + c) = nz; leftNzY(r) = nz
            // reconstruct exactly as the decoder will
            val deq = new Array[Int](16)
            var k = 1
            while (k < 16) { deq(k) = q(k) * dq.y1ac; k += 1 }
            deq(0) = y2rec(r * 4 + c)
            addBlock(recon, stride, x0 + c * 4, y0 + r * 4, idct4x4(deq))
            c += 1
          }
          r += 1
        }
        // chroma: all-zero residual blocks (flat gray), still coded
        val zeroQ = new Array[Int](16)
        var ch = 0
        while (ch < 8) {
          encodeCoeffs(tokens, probs, 2, 0, 0, zeroQ)
          ch += 1
        }
        mb += 1
        mbx += 1
      }
      mby += 1
    }

    // ---- first partition: frame header + per-MB modes ----
    header.bool(128, v = false) // color space 0
    header.bool(128, v = false) // clamping 0
    header.bool(128, v = false) // segmentation off
    header.bool(128, v = false) // filter type 0
    header.literal(6, 0) // filter level 0 (no loop filter)
    header.literal(3, 0) // sharpness
    header.bool(128, v = false) // lf delta off
    header.literal(2, 0) // one token partition
    header.literal(7, qi) // y_ac_qi
    var d = 0
    while (d < 5) { header.bool(128, v = false); d += 1 } // no q deltas
    header.bool(128, v = true) // refresh entropy probs
    var t = 0
    while (t < 1056) {
      header.bool(Vp8Tables.CoefUpdateProbs(t), v = false)
      t += 1
    }
    header.bool(128, v = false) // mb_no_coeff_skip off
    mb = 0
    while (mb < mbw * mbh) {
      header.tree(KfYmodeTree, KfYmodeProbs, 0, ymodesOut(mb))
      header.tree(UvModeTree, KfUvModeProbs, 0, 0) // chroma DC
      mb += 1
    }

    val part1 = header.finish()
    val tok = tokens.finish()
    val tag = (0) | (0 << 1) | (1 << 4) | (part1.length << 5)
    val outBuf = new scala.collection.mutable.ArrayBuffer[Byte](
      10 + part1.length + tok.length)
    outBuf += (tag & 0xff).toByte += ((tag >> 8) & 0xff).toByte +=
      ((tag >> 16) & 0xff).toByte
    outBuf += 0x9d.toByte += 0x01.toByte += 0x2a.toByte
    outBuf += (w & 0xff).toByte += ((w >> 8) & 0x3f).toByte
    outBuf += (h & 0xff).toByte += ((h >> 8) & 0x3f).toByte
    outBuf ++= part1
    outBuf ++= tok
    outBuf.toArray
  }

  /** Round-to-nearest quantization, ties toward zero — encoder freedom. */
  private def quantize(v: Int, q: Int): Int =
    if (v >= 0) (v + q / 2) / q else -((-v + q / 2) / q)
}
