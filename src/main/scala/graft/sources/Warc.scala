package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, File, FileOutputStream, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500) source + sink — the container format of
  * CommonCrawl, i.e. THE input format of a web-scale training-data
  * pipeline. Minimal but real: record framing (`WARC/1.0` + headers +
  * `Content-Length` payload + CRLF CRLF), gzip members, malformed-record
  * resync.
  *
  * Scale shape: WARC.gz members are not block-splittable, so production
  * parallelism is FILE-level — CommonCrawl ships ~10^5 x ~1 GB files per
  * snapshot, far more files than executors, which is exactly the
  * granularity `binaryFiles` hands out. Records stream off the
  * (decompressed) input one at a time — nothing buffers a whole file.
  * This is one of the sanctioned RDD uses: genuine per-partition
  * imperative record parsing; everything downstream is DataFrame.
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("src_file", StringType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("url", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = false)))

  /** Read every record of every WARC file under `path` (glob ok;
    * `.gz` files are decompressed as a single gzip stream — the
    * per-record-member and whole-file layouts both parse). Malformed
    * records are skipped by resyncing to the next `WARC/` magic rather
    * than failing the file.
    */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    val rdd = spark.sparkContext.binaryFiles(path).flatMap { case (file, pds) =>
      val raw: InputStream = pds.open()
      val in = if (file.endsWith(".gz")) new GZIPInputStream(raw) else raw
      new WarcRecordIterator(file, new BufferedInputStream(in, 1 << 16))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** The body of an `application/http` response payload: everything past
    * the first CRLF CRLF (the HTTP headers); the payload itself when no
    * header break exists (already-bare content).
    */
  val httpBody: UserDefinedFunction = udf { (payload: Array[Byte]) =>
    if (payload == null) null
    else {
      var i = 0
      var cut = -1
      while (cut < 0 && i + 3 < payload.length) {
        if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') cut = i + 4
        i += 1
      }
      if (cut < 0) payload else java.util.Arrays.copyOfRange(payload, cut, payload.length)
    }
  }

  /** Write `(urlCol, textCol)` rows as WARC response records, one file
    * per partition under `dir` (`part-NNNNN.warc[.gz]`) — the sink twin
    * of [[readWarc]], executor-side and append-free. Local-filesystem
    * paths here (the sandbox has no HDFS); a cluster deployment swaps
    * the `FileOutputStream` for a Hadoop `FileSystem.create` — the
    * record bytes are the contract, pinned by the round-trip gate.
    */
  def writeCorpus(
      docs: DataFrame,
      urlCol: String,
      textCol: String,
      dir: String,
      gzip: Boolean = false): Unit = {
    new File(dir).mkdirs()
    docs.select(urlCol, textCol).foreachPartition {
      (rows: Iterator[Row]) =>
        if (rows.hasNext) {
          val pid = TaskContext.getPartitionId()
          val name = f"part-$pid%05d.warc" + (if (gzip) ".gz" else "")
          val fos = new FileOutputStream(new File(dir, name))
          val out = new BufferedOutputStream(
            if (gzip) new GZIPOutputStream(fos) else fos, 1 << 16)
          try {
            rows.foreach { r =>
              val url = r.getString(0)
              val text = r.getString(1)
              if (url != null && text != null) {
                val body = text.getBytes(StandardCharsets.UTF_8)
                val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8\r\n" +
                  s"Content-Length: ${body.length}\r\n\r\n").getBytes(StandardCharsets.US_ASCII)
                val payload = http ++ body
                val head = ("WARC/1.0\r\n" +
                  "WARC-Type: response\r\n" +
                  s"WARC-Target-URI: $url\r\n" +
                  "WARC-Date: 2024-01-01T00:00:00Z\r\n" +
                  "Content-Type: application/http; msgtype=response\r\n" +
                  s"Content-Length: ${payload.length}\r\n\r\n").getBytes(StandardCharsets.US_ASCII)
                out.write(head)
                out.write(payload)
                out.write("\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
              }
            }
          } finally out.close()
        }
    }
  }
}

/** Streaming record iterator over one (decompressed) WARC stream.
  * Tolerant: a record whose header block is unparsable (no
  * `Content-Length`, truncated payload) is dropped and the scan resyncs
  * at the next line starting with `WARC/`.
  */
private[sources] class WarcRecordIterator(file: String, in: BufferedInputStream)
    extends Iterator[Row] {

  private var nextRow: Row = _
  private var done = false

  /** Read one \n-terminated line as ASCII-ish string (CR stripped);
    * null at EOF.
    */
  private def readLine(): String = {
    val sb = new java.lang.StringBuilder(64)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    sb.toString
  }

  private def readFully(buf: Array[Byte]): Boolean = {
    var off = 0
    while (off < buf.length) {
      val n = in.read(buf, off, buf.length - off)
      if (n < 0) return false
      off += n
    }
    true
  }

  private def advance(): Unit = {
    nextRow = null
    while (nextRow == null && !done) {
      // resync: scan lines until a WARC/ version line
      var line = readLine()
      while (line != null && !line.startsWith("WARC/")) line = readLine()
      if (line == null) { done = true; in.close(); return }
      // headers until blank line
      val headers = scala.collection.mutable.Map.empty[String, String]
      var ok = true
      var h = readLine()
      while (ok && h != null && h.nonEmpty) {
        val i = h.indexOf(':')
        if (i > 0) headers.update(h.substring(0, i).trim.toLowerCase, h.substring(i + 1).trim)
        else ok = false // malformed header line: drop the record, resync
        h = readLine()
      }
      if (h == null) { done = true; in.close(); return }
      if (ok) {
        headers.get("content-length").flatMap(s => s.toLongOption) match {
          case Some(len) if len >= 0 && len <= Int.MaxValue =>
            val payload = new Array[Byte](len.toInt)
            if (readFully(payload)) {
              nextRow = Row(
                file,
                headers.getOrElse("warc-type", null),
                headers.getOrElse("warc-target-uri", null),
                headers.getOrElse("warc-date", null),
                headers.getOrElse("content-type", null),
                payload)
            } else { done = true; in.close() } // truncated tail: drop
          case _ => () // no usable length: resync at next WARC/
        }
      }
    }
  }

  advance()

  override def hasNext: Boolean = nextRow != null

  override def next(): Row = {
    if (!hasNext) throw new NoSuchElementException
    val r = nextRow
    advance()
    r
  }
}
