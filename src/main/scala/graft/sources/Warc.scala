package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Splittable WARC (Web ARChive, ISO 28500) source — the crawl-container
  * ingestion the corpus-as-parquet shape skips (r17 verdict "What's
  * missing" #4). Real crawls (Common Crawl convention) store one gzip
  * MEMBER per WARC record, concatenated: member boundaries are the split
  * points that make a .warc.gz distributable without a sequential decode
  * of the whole file.
  *
  * Scale shape, two phases:
  *   1. INDEX — one sequential skim per file (parallel across files):
  *      a manual gzip header walk + raw `Inflater` tracks the exact
  *      compressed length of every member, yielding (path, off, len)
  *      rows. This is the pass a production pipeline amortizes into a
  *      CDX sidecar; the reader builds it on demand when none exists.
  *   2. DECODE — the member-range INDEX rows (three narrow columns) are
  *      what shuffles for balance, NEVER raw bytes: each decode task
  *      re-opens its file, reads only its members' byte ranges, gunzips
  *      and parses them scan-locally (WarcSpec pins the exchange-schema
  *      law). On a cluster the `RandomAccessFile` seek becomes the
  *      FileSystem positioned read; the plan shape is identical.
  *
  * Parse is fail-LOUD, not fail-closed: a malformed member (bad magic,
  * truncated deflate, missing WARC header) throws with the file/offset —
  * a crawl archive that fails mid-member is corrupt input, not content.
  */
object Warc {

  /** One response record of the fixture writer. */
  final case class Rec(url: String, fetchTs: String, contentType: String,
                       body: String)

  private def utf8(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** A WARC/1.0 response record: WARC headers, blank line, HTTP response
    * block (status line + headers + body), record separator.
    */
  private[graft] def recordBytes(r: Rec): Array[Byte] = {
    val http = s"HTTP/1.1 200 OK\r\nContent-Type: ${r.contentType}\r\n\r\n" +
      r.body
    val httpB = utf8(http)
    val hdr = "WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Target-URI: ${r.url}\r\n" +
      s"WARC-Date: ${r.fetchTs}\r\n" +
      s"Content-Length: ${httpB.length}\r\n\r\n"
    utf8(hdr) ++ httpB ++ utf8("\r\n\r\n")
  }

  /** gzip-compress one record as its own member. */
  private[graft] def gzipMember(payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(payload.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(payload); gz.close()
    bos.toByteArray
  }

  /** A spec-shaped .warc.gz: one gzip member per record, concatenated. */
  def warcFileBytes(rs: Seq[Rec]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    rs.foreach(r => bos.write(gzipMember(recordBytes(r))))
    bos.toByteArray
  }

  /** (offset, compressedLength) of every gzip member: manual RFC 1952
    * header walk (FEXTRA/FNAME/FCOMMENT/FHCRC honored) + a raw `Inflater`
    * whose `getBytesRead` gives the exact deflate length, + the 8-byte
    * CRC/ISIZE trailer. Throws on truncation or a bad magic — see the
    * fail-loud contract above.
    */
  def memberIndex(b: Array[Byte]): Seq[(Long, Long)] = {
    val out = Seq.newBuilder[(Long, Long)]
    var pos = 0
    while (pos < b.length) {
      val start = pos
      require(pos + 10 <= b.length && (b(pos) & 0xff) == 0x1f &&
        (b(pos + 1) & 0xff) == 0x8b && b(pos + 2) == 8,
        s"not a gzip member at offset $start")
      val flg = b(pos + 3) & 0xff
      pos += 10
      if ((flg & 4) != 0) { // FEXTRA
        val xlen = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8)
        pos += 2 + xlen
      }
      if ((flg & 8) != 0) { while (b(pos) != 0) pos += 1; pos += 1 } // FNAME
      if ((flg & 16) != 0) { while (b(pos) != 0) pos += 1; pos += 1 } // FCOMMENT
      if ((flg & 2) != 0) pos += 2 // FHCRC
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(b, pos, b.length - pos)
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          require(n != 0 || !inf.needsInput(),
            s"truncated gzip member at offset $start")
        }
        pos += inf.getBytesRead.toInt
      } finally inf.end()
      require(pos + 8 <= b.length, s"missing gzip trailer at offset $start")
      pos += 8 // CRC32 + ISIZE
      out += ((start.toLong, (pos - start).toLong))
    }
    out.result()
  }

  /** Decompress exactly one member's bytes. */
  private[graft] def gunzipMember(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    val bos = new java.io.ByteArrayOutputStream(b.length * 3)
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    bos.toByteArray
  }

  /** Parse one decompressed WARC response record to
    * (url, fetchTs, contentType, body). Fail-loud on a malformed record.
    */
  private[graft] def parseRecord(payload: Array[Byte]): (String, String, String, String) = {
    val text = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
    val warcEnd = text.indexOf("\r\n\r\n")
    require(text.startsWith("WARC/") && warcEnd > 0, "malformed WARC record")
    val warcHdrs = text.substring(0, warcEnd).split("\r\n")
    def hdr(block: Array[String], name: String): String = block
      .collectFirst { case l if l.regionMatches(true, 0, name + ":", 0, name.length + 1) =>
        l.substring(name.length + 1).trim }
      .getOrElse(throw new IllegalArgumentException(s"missing $name header"))
    val url = hdr(warcHdrs, "WARC-Target-URI")
    val ts = hdr(warcHdrs, "WARC-Date")
    val http = text.substring(warcEnd + 4).stripSuffix("\r\n\r\n")
    val httpEnd = http.indexOf("\r\n\r\n")
    require(http.startsWith("HTTP/") && httpEnd > 0, "malformed HTTP block")
    val httpHdrs = http.substring(0, httpEnd).split("\r\n").drop(1)
    val contentType = hdr(httpHdrs, "Content-Type")
    (url, ts, contentType, http.substring(httpEnd + 4))
  }

  /** Non-recursive listing of the .warc.gz files under `dir` — driver-side
    * METADATA only (names, never content), the same class as a parquet
    * reader's file listing.
    */
  private def listFiles(dir: String): Seq[String] = {
    val d = java.nio.file.Paths.get(dir)
    val stream = java.nio.file.Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".warc.gz")).toSeq.sorted
    } finally stream.close()
  }

  /** Read a directory of .warc.gz files as
    * (url, fetch_ts, content_type, text) — see the object scaladoc for the
    * two-phase scale shape. The ONLY shuffled relation is the 3-column
    * member index.
    */
  def readWarc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val files = listFiles(dir)
    val nSlots = spark.sparkContext.defaultParallelism
    val idx = spark.createDataset(files)
      .repartition(math.max(files.size, 1))
      .mapPartitions(_.flatMap { p =>
        val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
        Warc.memberIndex(bytes).iterator.map { case (off, len) => (p, off, len) }
      })
      .toDF("path", "off", "len")
    // balance the decode: shuffle INDEX rows (path, off, len), never bytes
    idx.repartition(nSlots, col("path"), col("off"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        val members = it.toVector.groupBy(_._1)
        members.iterator.flatMap { case (p, ms) =>
          val raf = new java.io.RandomAccessFile(p, "r")
          try {
            ms.sortBy(_._2).map { case (_, off, len) =>
              val buf = new Array[Byte](len.toInt)
              raf.seek(off); raf.readFully(buf)
              Warc.parseRecord(Warc.gunzipMember(buf))
            }
          } finally raf.close()
        }
      }
      .toDF("url", "fetch_ts", "content_type", "text")
  }
}
