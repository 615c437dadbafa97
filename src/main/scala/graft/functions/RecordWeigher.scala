package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Record-size accounting — the engine form of the reference's Weigher
  * surface (api/record/weigher/Weigher.java:3-9, RecordWeigher.java:47-65):
  * record weight = key bytes + value bytes + topic chars + fixed JVM
  * overhead. The reference uses it for queue admission control; Spark's
  * memory manager subsumes that, so here it is an analytics column (skew
  * detection, size-based routing, maxBytesPerTrigger planning).
  *
  * The 256-byte constant matches the reference's measured WorkerRecord
  * shell (WeigherHelperTest.java:15-22).
  */
object RecordWeigher {
  val RecordOverheadBytes = 256L

  /** Byte weight of a record given its key/value/topic columns. Binary or
    * string inputs both work (octet_length of the UTF-8 form).
    * @param overheadBytes the fixed per-record JVM shell cost; defaults to
    *   the reference's measured WorkerRecord shell, or derive one for your
    *   own record class with [[estimateInstanceSize]]. */
  def recordWeight(key: Column, value: Column, topic: Column,
                   overheadBytes: Long = RecordOverheadBytes): Column =
    coalesce(octet_length(key.cast("binary")), lit(0L)).cast("long") +
      coalesce(octet_length(value.cast("binary")), lit(0L)).cast("long") +
      coalesce(octet_length(topic.cast("binary")), lit(0L)).cast("long") +
      lit(overheadBytes)

  /** Estimated heap size of an instance of `clazz` — the engine form of the
    * reference's reflection sizing (api/record/weigher/WeigherHelpers.java:
    * 36-53): header + all non-static fields over the class hierarchy,
    * assuming reference fields are non-null; arrays counted as empty; no
    * concrete type substituted for abstract/interface field types; shallow
    * size padded to 8 bytes. Field/header widths follow the same
    * large-heap rule (compressed oops off at >= 32 GiB max heap).
    *
    * One deliberate hardening over the reference: recursion tracks the
    * types on the current descent path, so a self-referential class (e.g. a
    * linked node) terminates instead of overflowing the stack; acyclic
    * shapes — all the reference ever sizes — produce identical numbers. */
  def estimateInstanceSize(
      clazz: Class[_],
      largeHeap: Boolean =
        Runtime.getRuntime.maxMemory >= 32L * 1024 * 1024 * 1024): Int = {
    def size(c: Class[_], path: Set[Class[_]]): Int = {
      require(!c.isPrimitive, s"$c is primitive")
      val refSize = if (largeHeap) 8 else 4
      var shallow = if (c.isArray && largeHeap) 24 else 16
      var deep = 0
      var cur: Class[_] = c
      while (cur != null) {
        cur.getDeclaredFields.foreach { f =>
          if (!java.lang.reflect.Modifier.isStatic(f.getModifiers)) {
            val t = f.getType
            if (t.isPrimitive) shallow += primitiveSize(t)
            else {
              shallow += refSize
              if (!t.isEnum && !path.contains(t))
                deep += size(t, path + t)
            }
          }
        }
        cur = cur.getSuperclass
      }
      val pad = { val r = shallow % 8; if (r == 0) 0 else 8 - r }
      shallow + pad + deep
    }
    size(clazz, Set(clazz))
  }

  private def primitiveSize(t: Class[_]): Int = t match {
    case java.lang.Boolean.TYPE | java.lang.Byte.TYPE => 1
    case java.lang.Character.TYPE | java.lang.Short.TYPE => 2
    case java.lang.Integer.TYPE | java.lang.Float.TYPE => 4
    case java.lang.Long.TYPE | java.lang.Double.TYPE => 8
    case _ => throw new IllegalArgumentException(s"not primitive: $t")
  }
}
