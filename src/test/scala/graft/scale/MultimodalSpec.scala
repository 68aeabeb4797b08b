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

  test("sampleChunks yields n fixed-stride slices per asset") {
    val chunks = Multimodal.sampleChunks(Multimodal.assets(docs).toDF(), n = 4)
    val counts = chunks.groupBy("asset_id").count().select("count").distinct().collect()
    assert(counts.map(_.getLong(0)).toSet === Set(4L))
    // chunk payloads are bounded at 64 bytes
    assert(chunks.filter(octet_length(col("chunk")) > 64).count() === 0)
  }
}
