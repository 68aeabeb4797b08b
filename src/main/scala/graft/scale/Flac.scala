package graft.scale

/** From-scratch FLAC (xiph.org / RFC 9639) codec — the lossless audio
  * lift (r19 verdict "next round" #6): real-web audio re-uploads are
  * dominantly FLAC/MP3; FLAC is lossless, so decoding it extends the
  * audio envelope near-dup family ([[Multimodal.audioEnvelope64]]) with
  * an INTEGER-EXACT oracle — a FLAC re-encode of a WAV original decodes
  * to bit-identical samples and clusters at Hamming 0 (q317).
  *
  * Decode subset (everything else None — fail closed): mono, 16 bits per
  * sample, fixed blocking strategy; subframe types CONSTANT, VERBATIM,
  * FIXED (orders 0-4) and LPC (any order), wasted bits, both Rice
  * residual methods (4- and 5-bit parameters) with any partition order,
  * including escaped raw partitions. Frame-header CRC-8 and frame CRC-16
  * are VERIFIED — a corrupted frame fails closed rather than decoding
  * garbage (RFC 9639 §9.1/§9.3 polynomials x^8+x^2+x+1 and
  * x^16+x^15+x^2+1).
  *
  * The encoder is the fixture side: per frame it codes the best of
  * CONSTANT / FIXED 0-4 (Rice, single partition) / VERBATIM, or an LPC
  * subframe on request (the `lpc` knob re-expresses the order-2 fixed
  * predictor as quantized LPC so the LPC decode path runs inside
  * certified queries). Reference behavior anchor: the reference repo
  * (HyeM207/Programmers-DATA) stores URLs and never decodes audio; this
  * engine decodes because near-dup curation needs content hashes
  * (SURVEY.md "LLM-data-pipeline operators").
  */
object Flac {

  // ---- CRCs (RFC 9639 §9) ------------------------------------------
  private val Crc8Tab: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var k = 0
      while (k < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff; k += 1 }
      t(i) = c
      i += 1
    }
    t
  }

  private val Crc16Tab: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8
      var k = 0
      while (k < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff; k += 1 }
      t(i) = c
      i += 1
    }
    t
  }

  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc8Tab(c ^ (b(i) & 0xff)); i += 1 }
    c
  }

  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc16Tab(((c >> 8) ^ (b(i) & 0xff)) & 0xff) ^ ((c << 8) & 0xffff); i += 1 }
    c
  }

  // ---- fixed predictors (RFC 9639 §10.2.2) -------------------------
  @inline private def fixedPred(order: Int, s: Array[Int], i: Int): Int =
    order match {
      case 0 => 0
      case 1 => s(i - 1)
      case 2 => 2 * s(i - 1) - s(i - 2)
      case 3 => 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
      case _ => 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
    }

  // ------------------------------------------------------------------
  // Decoder
  // ------------------------------------------------------------------

  /** Decode a mono 16-bit FLAC stream to its PCM samples — the
    * [[Multimodal.wavPcmSamples]] shape for the audio near-dup ingest.
    * None on anything outside the subset, malformed syntax, or a CRC
    * mismatch.
    */
  def decodeSamples(b: Array[Byte]): Option[Array[Short]] = {
    try {
      if (b.length < 42 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C')
        return None
      val r = new Avc.BitReader(b)
      r.pos = 32
      // metadata blocks; STREAMINFO must come first
      var last = false
      var rate = 0
      var totalSamples = 0L
      var first = true
      while (!last) {
        last = r.flag()
        val typ = r.u(7)
        val len = r.u(24)
        if (first) {
          if (typ != 0 || len != 34) return None
          r.u(16); r.u(16) // min/max blocksize
          r.u(24); r.u(24) // min/max framesize
          rate = r.u(20)
          if (r.u(3) != 0) return None // channels-1: mono only
          if (r.u(5) != 15) return None // bps-1: 16-bit only
          totalSamples = (r.u(4).toLong << 32) | (r.u(16).toLong << 16) | r.u(16).toLong
          var i = 0
          while (i < 16) { r.u(8); i += 1 } // md5
          first = false
        } else {
          var i = 0
          while (i < len) { r.u(8); i += 1 }
        }
      }
      if (rate <= 0 || totalSamples <= 0 || totalSamples > (1L << 26)) return None
      val out = new Array[Short](totalSamples.toInt)
      var produced = 0L
      while (produced < totalSamples) {
        val frameStart = r.pos / 8
        if (r.pos % 8 != 0) return None
        if (r.u(14) != 0x3ffe) return None // sync
        if (r.u1() != 0) return None // reserved
        if (r.u1() != 0) return None // blocking strategy: fixed
        val bsCode = r.u(4)
        val srCode = r.u(4)
        if (r.u(4) != 0) return None // channel assignment: mono
        val ssCode = r.u(3)
        if (ssCode != 4 && ssCode != 0) return None // 16-bit (or streaminfo)
        if (r.u1() != 0) return None // reserved
        // coded frame number (UTF-8-style)
        val b0 = r.u(8)
        if (b0 >= 0x80) {
          var cont = 0
          var m = b0
          while ((m & 0x40) != 0) { cont += 1; m <<= 1 }
          if (cont < 1 || cont > 6) return None
          var i = 0
          while (i < cont) { if ((r.u(8) & 0xc0) != 0x80) return None; i += 1 }
        }
        val blockSize = bsCode match {
          case 0 => return None
          case 1 => 192
          case c if c <= 5 => 576 << (c - 2)
          case 6 => r.u(8) + 1
          case 7 => r.u(16) + 1
          case c => 256 << (c - 8)
        }
        srCode match {
          case 0 => () // streaminfo
          case 12 => r.u(8)
          case 13 | 14 => r.u(16)
          case 15 => return None
          case _ => () // direct table codes carry no extra bits
        }
        val headerEnd = r.pos / 8
        if (r.pos % 8 != 0) return None
        if (r.u(8) != crc8(b, frameStart, headerEnd)) return None
        // ---- one mono subframe
        if (r.u1() != 0) return None // padding
        val typ = r.u(6)
        val wasted =
          if (r.u1() == 0) 0
          else {
            var k = 1
            while (r.u1() == 0) { k += 1; if (k > 32) return None }
            k
          }
        val bps = 16 - wasted
        if (bps <= 0) return None
        @inline def signed(n: Int): Int = {
          val v = r.u(n)
          (v << (32 - n)) >> (32 - n)
        }
        val s = new Array[Int](blockSize)
        def residual(order: Int): Boolean = {
          val method = r.u(2)
          if (method > 1) return false
          val pBits = if (method == 0) 4 else 5
          val esc = (1 << pBits) - 1
          val pOrder = r.u(4)
          val nPart = 1 << pOrder
          if (blockSize % nPart != 0) return false
          var part = 0
          var i = order
          while (part < nPart) {
            val cnt = (blockSize >> pOrder) - (if (part == 0) order else 0)
            if (cnt < 0) return false
            val k = r.u(pBits)
            var j = 0
            if (k == esc) {
              val raw = r.u(5)
              while (j < cnt) {
                s(i) = if (raw == 0) 0 else signed(raw)
                i += 1; j += 1
              }
            } else {
              while (j < cnt) {
                var q = 0
                while (r.u1() == 0) { q += 1; if (q > (1 << 20)) return false }
                val v = (q << k) | (if (k > 0) r.u(k) else 0)
                s(i) = (v >>> 1) ^ -(v & 1)
                i += 1; j += 1
              }
            }
            part += 1
          }
          true
        }
        if (typ == 0) { // CONSTANT
          val v = signed(bps)
          java.util.Arrays.fill(s, v)
        } else if (typ == 1) { // VERBATIM
          var i = 0
          while (i < blockSize) { s(i) = signed(bps); i += 1 }
        } else if ((typ & 0x38) == 8 && (typ & 7) <= 4) { // FIXED 0..4
          val order = typ & 7
          if (order > blockSize) return None
          var i = 0
          while (i < order) { s(i) = signed(bps); i += 1 }
          if (!residual(order)) return None
          i = order
          while (i < blockSize) { s(i) += fixedPred(order, s, i); i += 1 }
        } else if ((typ & 0x20) != 0) { // LPC
          val order = (typ & 0x1f) + 1
          if (order > blockSize) return None
          var i = 0
          while (i < order) { s(i) = signed(bps); i += 1 }
          val prec = r.u(4) + 1
          if (prec > 15) return None
          val shift = signed(5)
          if (shift < 0) return None
          val coef = new Array[Int](order)
          i = 0
          while (i < order) { coef(i) = signed(prec); i += 1 }
          if (!residual(order)) return None
          i = order
          while (i < blockSize) {
            var acc = 0L
            var j = 0
            while (j < order) { acc += coef(j).toLong * s(i - 1 - j); j += 1 }
            s(i) += (acc >> shift).toInt
            i += 1
          }
        } else return None
        r.byteAlign()
        val bodyEnd = r.pos / 8
        if (r.u(16) != crc16(b, frameStart, bodyEnd)) return None
        // emit (undo wasted-bit shift)
        var i = 0
        while (i < blockSize && produced < totalSamples) {
          val v = s(i) << wasted
          if (v < Short.MinValue || v > Short.MaxValue) return None
          out(produced.toInt) = v.toShort
          produced += 1
          i += 1
        }
        if (i < blockSize) return None // more samples than STREAMINFO declared
      }
      Some(out)
    } catch {
      case _: IllegalStateException | _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ------------------------------------------------------------------
  // Encoder (fixture side)
  // ------------------------------------------------------------------

  /** Encode mono 16-bit PCM as a spec-valid FLAC stream. Per frame the
    * best of CONSTANT / FIXED 0-4 / VERBATIM is chosen; with `lpc` the
    * order-2 fixed predictor is re-expressed as a quantized LPC subframe
    * (coefficients (2,-1), shift 0) so decode exercises the LPC path on
    * identical samples.
    */
  def encode(samples: Array[Short], rate: Int, blockSize: Int = 512,
             lpc: Boolean = false): Array[Byte] = {
    require(samples.nonEmpty && rate > 0 && blockSize >= 16 && blockSize <= 65536)
    val w = new Avc.BitWriter
    w.u(8, 'f'); w.u(8, 'L'); w.u(8, 'a'); w.u(8, 'C')
    // STREAMINFO, last-metadata-block
    w.u1(1); w.u(7, 0); w.u(24, 34)
    w.u(16, blockSize); w.u(16, blockSize)
    w.u(24, 0); w.u(24, 0)
    w.u(20, rate); w.u(3, 0); w.u(5, 15)
    val n = samples.length
    w.u(4, 0); w.u(16, (n >> 16) & 0xffff); w.u(16, n & 0xffff)
    (0 until 16).foreach(_ => w.u(8, 0)) // md5 unset (spec-legal zeros)
    val head = w
    var frameIdx = 0
    var off = 0
    while (off < n) {
      val bs = math.min(blockSize, n - off)
      val fw = new Avc.BitWriter
      fw.u(14, 0x3ffe); fw.u1(0); fw.u1(0)
      // blocksize: power-of-two code when expressible, else 16-bit-1
      val bsCode =
        if (bs == 192) 1
        else if (Seq(576, 1152, 2304, 4608).contains(bs)) 2 + Integer.numberOfTrailingZeros(bs / 576)
        else if (bs >= 256 && (bs & (bs - 1)) == 0 && bs <= 32768) 8 + Integer.numberOfTrailingZeros(bs / 256)
        else 7
      fw.u(4, bsCode)
      fw.u(4, 0) // rate: streaminfo
      fw.u(4, 0) // mono
      fw.u(3, 4) // 16-bit
      fw.u1(0)
      // frame number, UTF-8
      if (frameIdx < 0x80) fw.u(8, frameIdx)
      else {
        require(frameIdx < 0x800, "fixture streams stay short")
        fw.u(8, 0xc0 | (frameIdx >> 6)); fw.u(8, 0x80 | (frameIdx & 0x3f))
      }
      if (bsCode == 7) fw.u(16, bs - 1)
      val headerBytes = { fw.alignZero(); fw.toBytes }
      require(fw.toBytes.length == headerBytes.length)
      val body = new Avc.BitWriter
      val s = Array.tabulate(bs)(i => samples(off + i).toInt)
      // pick the cheapest subframe: residual cost per fixed order
      def riceK(res: Array[Int], from: Int): Int = {
        var sum = 0L
        var i = from
        while (i < res.length) { sum += math.abs(res(i)); i += 1 }
        val mean = if (res.length - from <= 0) 0L else sum / math.max(1, res.length - from)
        var k = 0
        while ((1L << (k + 1)) < mean + 1 && k < 14) k += 1
        k
      }
      def riceCost(res: Array[Int], from: Int, k: Int): Long = {
        var bits = 0L
        var i = from
        while (i < res.length) {
          val v = res(i)
          val u = (v << 1) ^ (v >> 31)
          bits += (u >>> k) + 1 + k
          i += 1
        }
        bits
      }
      val constant = s.forall(_ == s(0))
      if (constant) {
        body.u1(0); body.u(6, 0); body.u1(0)
        body.u(16, s(0) & 0xffff)
      } else {
        val candidates = (0 to 4).filter(_ < bs).map { order =>
          val res = new Array[Int](bs)
          var i = order
          while (i < bs) { res(i) = s(i) - fixedPred(order, s, i); i += 1 }
          val k = riceK(res, order)
          (order, res, k, 16L * order + 6 + riceCost(res, order, k))
        }
        val (order, res, k, cost) = candidates.minBy(_._4)
        if (cost >= 16L * bs) { // VERBATIM wins
          body.u1(0); body.u(6, 1); body.u1(0)
          var i = 0
          while (i < bs) { body.u(16, s(i) & 0xffff); i += 1 }
        } else {
          val asLpc = lpc && order >= 1
          if (asLpc) {
            // the fixed predictor re-expressed as quantized LPC: binomial
            // coefficients, shift 0 — residuals identical by construction
            val coefs = order match {
              case 1 => Seq(1)
              case 2 => Seq(2, -1)
              case 3 => Seq(3, -3, 1)
              case _ => Seq(4, -6, 4, -1)
            }
            body.u1(0); body.u(6, 0x20 | (order - 1)); body.u1(0)
            var i = 0
            while (i < order) { body.u(16, s(i) & 0xffff); i += 1 }
            body.u(4, 14); body.u(5, 0) // precision 15, shift 0
            coefs.foreach(c => body.u(15, c & 0x7fff))
          } else {
            body.u1(0); body.u(6, 8 | order); body.u1(0)
            var i = 0
            while (i < order) { body.u(16, s(i) & 0xffff); i += 1 }
          }
          body.u(2, 0); body.u(4, 0) // Rice method 0, one partition
          body.u(4, k)
          var i = order
          while (i < bs) {
            val v = res(i)
            val u = (v << 1) ^ (v >> 31)
            var q = u >>> k
            while (q > 0) { body.u1(0); q -= 1 }
            body.u1(1)
            if (k > 0) body.u(k, u & ((1 << k) - 1))
            i += 1
          }
        }
      }
      body.alignZero()
      val frameNoCrc = headerBytes ++ Array(crc8(headerBytes, 0, headerBytes.length).toByte) ++ body.toBytes
      val c16 = crc16(frameNoCrc, 0, frameNoCrc.length)
      val full = frameNoCrc ++ Array(((c16 >> 8) & 0xff).toByte, (c16 & 0xff).toByte)
      full.foreach(byte => head.u(8, byte & 0xff))
      frameIdx += 1
      off += bs
    }
    head.toBytes
  }
}
