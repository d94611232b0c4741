package graft

import java.net.URI

import org.apache.hadoop.fs.{FSDataInputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** A non-`file:` Hadoop filesystem for end-to-end source tests: the
  * `mockfs://` scheme delegates storage to the local disk but is resolved
  * purely through the Hadoop FS registry (`fs.mockfs.impl`), exactly like
  * s3a/gs/abfs would be on a real cluster. Instrumented with open/create
  * counters so a spec can prove traffic really flowed through the scheme
  * rather than silently falling back to `file:`. */
class MockFs extends RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: URI = URI.create("mockfs:///")

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    MockFs.opens.incrementAndGet()
    super.open(f, bufferSize)
  }

  // every create/append variant in RawLocalFileSystem funnels through this
  // single protected hook, so it counts them all exactly once
  override protected def createOutputStreamWithMode(f: Path, append: Boolean,
                                                    permission: FsPermission): java.io.OutputStream = {
    MockFs.creates.incrementAndGet()
    super.createOutputStreamWithMode(f, append, permission)
  }
}

/** Counters are JVM-global statics and MockFsSpec mutates the shared
  * sparkContext hadoopConfiguration — valid only because suites run
  * sequentially in one JVM (the default here). Under parallel suite
  * execution, key counters per scheme instance instead. */
object MockFs {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val creates = new java.util.concurrent.atomic.AtomicInteger(0)
}
