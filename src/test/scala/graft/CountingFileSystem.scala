package graft

import java.net.URI
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FSDataInputStream, Path, PositionedReadable, RawLocalFileSystem, Seekable}

/** A `cfs://` Hadoop filesystem over local disk that counts every
  * byte actually read — the byte-accounting harness for the index
  * row-group-skipping specs.
  *
  * Why not task input metrics or FileSystem.getAllStatistics: Spark
  * 4's parquet reader recognizes the local filesystem and reads data
  * pages through java.nio directly, bypassing both accounting
  * layers. A distinct scheme defeats that shortcut, so every footer,
  * bloom bitset, dictionary page and data page flows through
  * [[CountingFileSystem.bytesRead]] — the honest total a remote
  * object store would serve.
  */
class CountingFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("cfs:///")

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    new FSDataInputStream(new CountingFileSystem.CountingStream(super.open(f, bufferSize)))
}

object CountingFileSystem {
  val bytesRead = new AtomicLong(0L)

  /** Registers the scheme on the session's hadoop conf (idempotent)
    * and returns the `cfs://` rendering of a local path.
    */
  def route(spark: org.apache.spark.sql.SparkSession, localPath: String): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.cfs.impl", classOf[CountingFileSystem].getName)
    s"cfs://$localPath"
  }

  private final class CountingStream(in: FSDataInputStream)
      extends java.io.InputStream with Seekable with PositionedReadable {
    private def add(n: Int): Int = { if (n > 0) bytesRead.addAndGet(n.toLong); n }
    override def read(): Int = { val b = in.read(); if (b >= 0) bytesRead.incrementAndGet(); b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = add(in.read(b, off, len))
    override def read(pos: Long, buf: Array[Byte], off: Int, len: Int): Int =
      add(in.read(pos, buf, off, len))
    override def readFully(pos: Long, buf: Array[Byte], off: Int, len: Int): Unit = {
      in.readFully(pos, buf, off, len); bytesRead.addAndGet(len.toLong)
    }
    override def readFully(pos: Long, buf: Array[Byte]): Unit = {
      in.readFully(pos, buf); bytesRead.addAndGet(buf.length.toLong)
    }
    override def seek(pos: Long): Unit = in.seek(pos)
    override def getPos: Long = in.getPos
    override def seekToNewSource(targetPos: Long): Boolean = in.seekToNewSource(targetPos)
    override def skip(n: Long): Long = in.skip(n)
    override def available(): Int = in.available()
    override def close(): Unit = in.close()
  }
}
