package graft.sources

import java.io.{InputStream, OutputStream}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Single-file IO through the Hadoop FileSystem of the path's scheme —
  * the non-parquet sinks' analog of [[graft.streaming.StreamIO]]: the
  * xlsx/xsd/manifest/media writers produce driver-side or per-partition
  * files beside the parquet artifacts, and on a cluster those land on
  * HDFS/S3 where `java.nio.file` rejects the URI outright. Everything
  * here is a thin wrapper; the point is that NO format writer in the
  * library speaks `java.nio.file` for artifact paths (local tooling —
  * plan dumps, BENCH_ORDER regeneration — rightly still does).
  */
object FsIO {

  /** The session Hadoop Configuration shipped into an executor closure:
    * `Configuration` is not java-serializable, so per-partition writers
    * ([[XlsxTables.write]], media exports) carry this wrapper and
    * resolve their FileSystem on the executor with the DRIVER's
    * settings (credentials, scheme impls) intact. */
  class SerializableConf(@transient private var conf: Configuration)
      extends Serializable {
    def value: Configuration = conf
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new Configuration(false)
      conf.readFields(in)
    }
  }
  def serializable(conf: Configuration): SerializableConf =
    new SerializableConf(conf)

  def fs(path: String, conf: Configuration): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(conf), p)
  }

  def exists(path: String, conf: Configuration): Boolean = {
    val (f, p) = fs(path, conf)
    f.exists(p)
  }

  def mkdirs(path: String, conf: Configuration): Unit = {
    val (f, p) = fs(path, conf)
    f.mkdirs(p)
    ()
  }

  /** Recursive delete; no-op when absent. */
  def delete(path: String, conf: Configuration): Unit = {
    val (f, p) = fs(path, conf)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  /** Overwriting create (caller closes). */
  def create(path: String, conf: Configuration): OutputStream = {
    val (f, p) = fs(path, conf)
    f.create(p, true)
  }

  def open(path: String, conf: Configuration): InputStream = {
    val (f, p) = fs(path, conf)
    f.open(p)
  }

  def writeBytes(path: String, bytes: Array[Byte],
                 conf: Configuration): Unit = {
    val out = create(path, conf)
    try out.write(bytes) finally out.close()
  }

  def writeString(path: String, s: String, conf: Configuration): Unit =
    writeBytes(path, s.getBytes("UTF-8"), conf)

  def readBytes(path: String, conf: Configuration): Array[Byte] = {
    val in = open(path, conf)
    try in.readAllBytes() finally in.close()
  }

  def readString(path: String, conf: Configuration): String =
    new String(readBytes(path, conf), "UTF-8")

  /** Delete the direct children of `dir` whose names satisfy `pred` —
    * overwrite semantics for non-parquet directory sinks. */
  def clearChildren(dir: String, conf: Configuration)
                   (pred: String => Boolean): Unit = {
    val (f, p) = fs(dir, conf)
    if (f.exists(p))
      f.listStatus(p).foreach { st =>
        if (pred(st.getPath.getName)) f.delete(st.getPath, true)
      }
  }
}
