package graft.scale

import graft.core.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, processed partition-parallel.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake — but the Spark-side plumbing (schema,
  * batched per-partition processing, bounded memory per task) is real: the
  * binary payload stays columnar in parquet, only the partitions being
  * processed are resident, and the decode runs inside `mapPartitions` exactly
  * where a JNI/codec call would sit in production.
  */
object Multimodal {

  final case class Asset(asset_id: Long, content: Array[Byte], format: String, n_bytes: Long)
  final case class AssetFeatures(asset_id: Long, format: String, n_bytes: Long,
                                 width: Int, height: Int, checksum: Long)

  /** Manufacture a binary-asset table from the documents corpus (payload =
    * UTF-8 bytes standing in for an encoded image).
    */
  def assets(docs: DataFrame): Dataset[Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("content"),
      when(col("doc_id") % 3 === 0, "png").when(col("doc_id") % 3 === 1, "jpeg")
        .otherwise("webp").as("format"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      .as[Asset]
  }

  /** STUB decode: in production this calls the image codec on each payload.
    * Here it derives deterministic fake dimensions/checksum from the bytes so
    * the pipeline is testable end-to-end. The fake is a position-weighted
    * byte sum — overflow-free (≤ 255·n²/2, far under Long.Max for any real
    * payload) and re-expressible in the DuckDB oracle, so the declared q34
    * gets a full value-level correctness check, not just rows>0. Batch
    * shape: one iterator pass per partition, constant memory beyond the
    * current record.
    */
  def decodeStub(in: Dataset[Asset]): Dataset[AssetFeatures] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.mapPartitions { assets =>
      assets.map { a =>
        // ??? <- real codec call goes here; deterministic fake below
        var h = 0L
        var i = 0
        while (i < a.content.length) { h += (a.content(i) & 0xff).toLong * (i + 1); i += 1 }
        AssetFeatures(a.asset_id, a.format, a.n_bytes,
          width = 16 + (h % 1024).toInt,
          height = 16 + ((h / 1024) % 1024).toInt,
          checksum = h)
      }
    }
  }

  /** Frame sampling stub: slice the payload into `n` fixed-stride chunks
    * (the video-frame-sampling access pattern) — pure column ops.
    */
  def sampleChunks(assetsDf: DataFrame, n: Int): DataFrame =
    assetsDf.select(col("asset_id"),
      posexplode(transform(sequence(lit(0), lit(n - 1)),
        i => col("content").substr((i * (col("n_bytes") / n)).cast("int") + 1, lit(64))))
        .as(Seq("chunk_idx", "chunk")))

  val queries: Seq[Q] = Seq(

    // Binary-column plumbing that IS oracle-checkable: payload byte length
    // and a content signature over the manufactured asset table.
    Q("q33_multimodal_meta",
      """SELECT doc_id AS asset_id,
        | CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'jpeg'
        |      ELSE 'webp' END AS format,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | substring(md5(text), 1, 8) AS sig
        |FROM documents ORDER BY asset_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id").as("asset_id"),
        when(col("doc_id") % 3 === 0, "png").when(col("doc_id") % 3 === 1, "jpeg")
          .otherwise("webp").as("format"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        substring(md5(col("text")), 1, 8).as("sig"))
        .orderBy("asset_id")
    },

    // Full stubbed decode pipeline (binary → features) — fake dims, real
    // partition-parallel plumbing. Oracled: the stub's position-weighted
    // byte sum is re-derived in SQL (documents are ASCII, so unicode(char)
    // == utf-8 byte; list_sum of an empty text is NULL, hence coalesce).
    Q("q34_multimodal_decode",
      """WITH h AS (
        |  SELECT doc_id, text,
        |    coalesce(list_sum(list_transform(range(1, length(text)+1),
        |      i -> unicode(text[i]) * i)), 0) AS hsum
        |  FROM documents)
        |SELECT doc_id AS asset_id,
        | CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'jpeg'
        |      ELSE 'webp' END AS format,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(16 + (hsum % 1024) AS INT) AS width,
        | CAST(16 + ((hsum // 1024) % 1024) AS INT) AS height,
        | CAST(hsum AS BIGINT) AS checksum
        |FROM h ORDER BY asset_id""".stripMargin) { (s, d) =>
      decodeStub(assets(Tables.documents(s, d))).toDF()
        .select("asset_id", "format", "n_bytes", "width", "height", "checksum")
        .orderBy("asset_id")
    },
  )
}
