package graft.scale

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir).limit(50)

  test("assets carry the payload bytes and typed metadata") {
    val a = Multimodal.assets(docs).cache()
    assert(a.count() === 50)
    val row = a.head()
    assert(row.content.length.toLong === row.n_bytes)
    assert(Set("png", "jpeg", "webp").contains(row.format))
  }

  test("decodeStub is deterministic and partition-parallel") {
    val a = Multimodal.assets(docs)
    val f1 = Multimodal.decodeStub(a).collect().sortBy(_.asset_id)
    val f2 = Multimodal.decodeStub(a.repartition(7)).collect().sortBy(_.asset_id)
    assert(f1.toSeq === f2.toSeq) // partitioning must not change results
    assert(f1.forall(f => f.width >= 16 && f.height >= 16))
  }

  test("imageDims parses PNG IHDR and JPEG SOF0, including fill bytes and EOI") {
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val png = bytes(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, // signature
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 1, 0, /* width 256 */ 0, 0, 0, 64 /* height 64 */) ++ new Array[Byte](8)
    assert(Multimodal.imageDims(png) === Some((256, 64)))
    // SOI, APP0 (16-byte segment), SOF0 with height=48 width=320
    val jpeg = bytes(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x10) ++ new Array[Byte](14) ++
      bytes(0xFF, 0xC0, 0x00, 0x11, 8, 0x00, 0x30, 0x01, 0x40) ++ new Array[Byte](16)
    assert(Multimodal.imageDims(jpeg) === Some((320, 48)))
    // 0xFF fill bytes between SOI and SOF0 must be skipped one at a time —
    // the pre-fix walk advanced two and aborted on the misaligned C0
    val padded = bytes(0xFF, 0xD8, 0xFF, 0xFF, 0xFF, 0xC0, 0x00, 0x11, 8,
      0x00, 0x30, 0x01, 0x40) ++ new Array[Byte](16)
    assert(Multimodal.imageDims(padded) === Some((320, 48)))
    // EOI before any SOF: no frame header exists; must not read a phantom
    // length field past the marker
    val eoi = bytes(0xFF, 0xD8, 0xFF, 0xD9) ++ new Array[Byte](16)
    assert(Multimodal.imageDims(eoi) === None)
  }

  test("sampleChunks yields n fixed-stride slices per asset") {
    val chunks = Multimodal.sampleChunks(Multimodal.assets(docs).toDF(), n = 4)
    val counts = chunks.groupBy("asset_id").count().select("count").distinct().collect()
    assert(counts.map(_.getLong(0)).toSet === Set(4L))
    // chunk payloads are bounded at 64 bytes
    assert(chunks.filter(octet_length(col("chunk")) > 64).count() === 0)
  }
}
