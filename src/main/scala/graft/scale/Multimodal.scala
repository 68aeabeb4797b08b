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

  /** Header-only image dimension decode from the payload's magic bytes —
    * real, deterministic, and codec-free:
    *   - PNG: the IHDR chunk is mandatory and first, so width/height are the
    *     big-endian u32 pair at offsets 16/20 after the 8-byte signature
    *     (PNG spec §5.2/§11.2.2);
    *   - JPEG: walk the marker segments from SOI to the first SOFn frame
    *     header (C0-CF except DHT C4, JPG C8, DAC CC), whose payload is
    *     [len:2][precision:1][height:2][width:2] (JPEG Annex B).
    * None for anything that is not a parsable PNG/JPEG — the caller falls
    * back to the deterministic fake so the pipeline stays total.
    */
  def imageDims(b: Array[Byte]): Option[(Int, Int)] = {
    def u16(i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def u32(i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    val pngSig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    if (b.length >= 24 && b.take(8).sameElements(pngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some((u32(16), u32(20)))
    else if (b.length >= 4 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) {
      var i = 2
      while (i + 9 < b.length && b(i) == 0xFF.toByte) {
        val m = b(i + 1) & 0xff
        // 0xFF is a fill byte before a marker, not a 2-byte marker itself:
        // advance one so FF FF C0 parses as fill + SOF0. D9 (EOI) ends the
        // stream with no length field — no frame header was found.
        if (m == 0xFF) i += 1
        else if (m == 0xD9) return None
        else if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) i += 2
        else {
          val len = u16(i + 2)
          if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC && len >= 7)
            return Some((u16(i + 7), u16(i + 5)))
          if (len < 2) return None
          i += 2 + len
        }
      }
      None
    } else None
  }

  /** Decode: header-only dimension parse for real PNG/JPEG payloads
    * ([[imageDims]]); payloads with no parsable header (e.g. the
    * text-derived fixtures — this container ships no codecs for full pixel
    * decode) get deterministic fake dimensions from a position-weighted byte
    * sum — overflow-free (≤ 255·n²/2, far under Long.Max for any real
    * payload) and re-expressible in the DuckDB oracle, so the declared q34
    * gets a full value-level correctness check, not just rows>0. Batch
    * shape: one iterator pass per partition, constant memory beyond the
    * current record — exactly where a full JNI codec call would sit.
    */
  def decodeStub(in: Dataset[Asset]): Dataset[AssetFeatures] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.mapPartitions { assets =>
      assets.map { a =>
        var h = 0L
        var i = 0
        while (i < a.content.length) { h += (a.content(i) & 0xff).toLong * (i + 1); i += 1 }
        val (w, ht) = imageDims(a.content)
          .getOrElse((16 + (h % 1024).toInt, 16 + ((h / 1024) % 1024).toInt))
        AssetFeatures(a.asset_id, a.format, a.n_bytes, width = w, height = ht, checksum = h)
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

    // Full decode pipeline (binary → features) — header-only dims for real
    // PNG/JPEG, deterministic fake for these text payloads, real
    // partition-parallel plumbing. Oracled: the fake's position-weighted
    // byte sum is re-derived in SQL. The SQL weights per-CHARACTER codepoints
    // while the engine weights per-UTF-8-BYTE values — identical only on
    // ASCII text, so MultimodalSpec asserts the documents corpus is pure
    // ASCII at every driver SF (true today; the assert turns a silent hash
    // divergence into a loud failure). list_sum of an empty text is NULL,
    // hence coalesce.
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
