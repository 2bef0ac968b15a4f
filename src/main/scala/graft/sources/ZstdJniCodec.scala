package graft.sources

import java.io.{InputStream, OutputStream}

import com.github.luben.zstd.{ZstdInputStream, ZstdOutputStream}
import org.apache.hadoop.io.compress.{
  CompressionCodec, CompressionInputStream, CompressionOutputStream,
  Compressor, Decompressor}

/** A pure-JVM Hadoop `CompressionCodec` for zstandard, backed by the
  * zstd-jni streams Spark already ships for parquet. Needed because
  * Hadoop's own `ZStandardCodec` requires native libhadoop (absent in
  * plain-JVM deployments — `NativeCodeLoader` warns and the codec
  * throws), which is why Spark's text writer rejects
  * `compression=zstd` outright: `.jsonl.zst` interchange shards would
  * otherwise be unreachable from the JSONL seam.
  *
  * Usage: [[Jsonl]] passes this class's FQCN as the text datasource
  * `compression` option (Spark accepts a codec class name wherever it
  * accepts a short name) and registers it in `io.compression.codecs`
  * so `CompressionCodecFactory` resolves the `.zst` extension to THIS
  * codec (not the native one) on read.
  *
  * The `Compressor`/`Decompressor` surface exists only to satisfy
  * `CodecPool` borrowing (Hadoop's line reader borrows one before
  * opening the stream); the actual byte work happens in the wrapped
  * zstd-jni streams, so the pooled objects are inert placeholders —
  * the same shape Hadoop itself uses for stream-only codecs.
  */
final class ZstdJniCodec extends CompressionCodec {

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new ZstdJniCodec.ZstdCompressionOutputStream(out)

  override def createOutputStream(
      out: OutputStream, compressor: Compressor): CompressionOutputStream =
    createOutputStream(out)

  override def createCompressor(): Compressor = new ZstdJniCodec.NullCompressor

  override def getCompressorType: Class[_ <: Compressor] =
    classOf[ZstdJniCodec.NullCompressor]

  override def createInputStream(in: InputStream): CompressionInputStream =
    new ZstdJniCodec.ZstdCompressionInputStream(in)

  override def createInputStream(
      in: InputStream, decompressor: Decompressor): CompressionInputStream =
    createInputStream(in)

  override def createDecompressor(): Decompressor = new ZstdJniCodec.NullDecompressor

  override def getDecompressorType: Class[_ <: Decompressor] =
    classOf[ZstdJniCodec.NullDecompressor]

  override def getDefaultExtension: String = ".zst"
}

object ZstdJniCodec {

  private final class ZstdCompressionOutputStream(raw: OutputStream)
      extends CompressionOutputStream(raw) {
    // closeFrameOnFlush is construction-time-only in zstd-jni (changing
    // it after the first write throws IllegalStateException), and it is
    // the only way finish() can write the frame epilogue WITHOUT
    // closing the raw stream — the Hadoop contract: a component may
    // finish() and then close the raw stream itself, and the payload
    // must be complete (the old flush-only finish() left a truncated
    // frame that ZstdInputStream rejects with "Truncated source").
    // Cost: every flush() ends the current frame and the next write
    // starts a new one — concatenated frames decode transparently, and
    // Spark's text writer only flushes at task end, so shards stay
    // single-frame in practice.
    private val zout = new ZstdOutputStream(raw)
    zout.setCloseFrameOnFlush(true)
    override def write(b: Int): Unit = zout.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      zout.write(b, off, len)
    override def flush(): Unit = zout.flush()
    override def finish(): Unit = zout.flush()
    override def resetState(): Unit = ()
    override def close(): Unit = zout.close()
  }

  private final class ZstdCompressionInputStream(raw: InputStream)
      extends CompressionInputStream(raw) {
    private val zin = new ZstdInputStream(raw)
    override def read(): Int = zin.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      zin.read(b, off, len)
    override def resetState(): Unit = ()
    override def close(): Unit = zin.close()
  }

  /** Inert pool placeholder — never receives bytes (streams above do
    * the work) but must be reflectively instantiable for `CodecPool`.
    */
  final class NullCompressor extends Compressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def needsInput(): Boolean = false
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def getBytesRead: Long = 0L
    override def getBytesWritten: Long = 0L
    override def finish(): Unit = ()
    override def finished(): Boolean = true
    override def compress(b: Array[Byte], off: Int, len: Int): Int = 0
    override def reset(): Unit = ()
    override def end(): Unit = ()
    override def reinit(conf: org.apache.hadoop.conf.Configuration): Unit = ()
  }

  /** Inert pool placeholder, see [[NullCompressor]]. */
  final class NullDecompressor extends Decompressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def needsInput(): Boolean = false
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def needsDictionary(): Boolean = false
    override def finished(): Boolean = true
    override def decompress(b: Array[Byte], off: Int, len: Int): Int = 0
    override def getRemaining: Int = 0
    override def reset(): Unit = ()
    override def end(): Unit = ()
  }
}
