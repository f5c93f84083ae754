package graft.util

import java.io.{ObjectInputStream, ObjectOutputStream}
import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper shipping the driver's Hadoop configuration
  * to executor-side writers (task-landed DML delta files need the same
  * filesystem credentials/settings the driver's commits use). Spark's
  * own equivalent is `private[spark]`, hence this four-line stand-in.
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
