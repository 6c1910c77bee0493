package graft.util

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Serializable carrier for the session's Hadoop `Configuration`, so
  * task-side filesystem access (bundle loads, task-direct CSV writes)
  * sees the SAME `spark.hadoop.*` settings as the driver — object-store
  * credentials, `fs.defaultFS`, connector tuning. A bare
  * `new Configuration()` on an executor silently drops all of them
  * (works on a local-FS sandbox, breaks on a real deployment).
  *
  * `Configuration` itself is `Writable` but not `Serializable`; this is
  * the standard wrapper shape (write via `Writable` inside Java
  * serialization). Spark ships the equivalent internally.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
