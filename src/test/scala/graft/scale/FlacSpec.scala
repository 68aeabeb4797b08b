package graft.scale

import org.scalatest.funsuite.AnyFunSuite

/** Laws for the from-scratch FLAC codec: lossless roundtrip across every
  * subframe family the encoder can emit (CONSTANT, FIXED 0-4, VERBATIM,
  * LPC), block-size independence, and the fail-closed surface (CRC
  * corruption, truncation, out-of-subset shapes).
  */
class FlacSpec extends AnyFunSuite {

  private def md5b(tag: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(tag.getBytes("UTF-8"))(0).toInt & 0xff
  }

  private def noise(seed: Int, n: Int): Array[Short] =
    Array.tabulate(n)(i => (md5b(s"f${seed}_$i") * 100 +
      md5b(s"g${seed}_$i") % 50 - 12800).toShort)

  test("lossless roundtrip: noise, ramps, silence, full-scale, odd lengths") {
    val cases = Seq[Array[Short]](
      noise(1, 1024),
      Array.tabulate(1000)(i => (i * 13 - 6000).toShort), // linear ramp: FIXED-2 exact
      Array.fill(700)(0.toShort), // silence: CONSTANT
      Array.fill(512)(1234.toShort), // nonzero constant
      Array.tabulate(513)(i => if (i % 2 == 0) Short.MaxValue else Short.MinValue),
      noise(2, 100), // shorter than one block
      Array.tabulate(2048)(i => (2000.0 * math.sin(i / 10.0)).toShort))
    for ((s, ci) <- cases.zipWithIndex; bs <- Seq(256, 512)) {
      val enc = Flac.encode(s, 8000, bs)
      val dec = Flac.decodeSamples(enc)
      assert(dec.isDefined, s"case $ci bs=$bs")
      assert(dec.get.toSeq == s.toSeq, s"case $ci bs=$bs")
    }
  }

  test("block size does not change the decoded samples") {
    val s = noise(3, 1500)
    val a = Flac.decodeSamples(Flac.encode(s, 8000, 256)).get
    val b = Flac.decodeSamples(Flac.encode(s, 8000, 1024)).get
    assert(a.toSeq == b.toSeq && a.toSeq == s.toSeq)
  }

  test("LPC subframes decode to the same samples as their fixed twins") {
    val s = noise(4, 1024)
    val fixed = Flac.encode(s, 8000, 512)
    val lpc = Flac.encode(s, 8000, 512, lpc = true)
    assert(lpc.toSeq != fixed.toSeq, "LPC knob must change the bitstream")
    assert(Flac.decodeSamples(lpc).exists(_.toSeq == s.toSeq))
  }

  test("fail closed: CRC corruption, truncation, garbage, out-of-subset") {
    val s = noise(5, 1024)
    val enc = Flac.encode(s, 8000, 512)
    assert(Flac.decodeSamples(enc).isDefined)
    // flip one bit in the middle of the stream (residual territory):
    // the frame CRC-16 must catch it
    val bad = enc.clone()
    bad(enc.length / 2) = (bad(enc.length / 2) ^ 0x10).toByte
    assert(Flac.decodeSamples(bad) === None)
    // flip a header byte: CRC-8 catches it
    val badH = enc.clone()
    badH(44) = (badH(44) ^ 0x01).toByte
    assert(Flac.decodeSamples(badH) === None)
    // truncation: fewer samples than STREAMINFO declares
    assert(Flac.decodeSamples(enc.dropRight(enc.length / 3)) === None)
    // garbage and empty
    assert(Flac.decodeSamples(Array.fill[Byte](64)(0x55)) === None)
    assert(Flac.decodeSamples(Array.empty[Byte]) === None)
    // stereo STREAMINFO: outside the mono subset. Byte layout: [0..3]
    // fLaC, [4..7] block header, [8..11] min/max blocksize, [12..17]
    // frame sizes, then rate(20 bits) + channels-1(3) + bps-1 hi(1) in
    // bytes 18..20 — the channel field is bits 3..1 of byte 20.
    val enc2 = Flac.encode(noise(6, 64), 8000, 256)
    val withStereo = enc2.clone()
    withStereo(20) = ((withStereo(20) & 0xf1) | 0x02).toByte
    assert(Flac.decodeSamples(withStereo) === None)
  }

  test("the audio envelope of a FLAC re-encode equals the WAV original's") {
    val s = noise(7, 1024)
    val wavEnv = Multimodal.audioEnvelope64(
      Multimodal.wavPcmSamples(Multimodal.wavBytesPcm(8000, s)).get)
    val flacEnv = Multimodal.audioEnvelope64(
      Flac.decodeSamples(Flac.encode(s, 8000, 512)).get)
    assert(wavEnv.toSeq == flacEnv.toSeq)
  }
}
