package graft.io

import scala.collection.concurrent.TrieMap

/** The reference's writer surface (rapid_doc/data/data_reader_writer/
  * base.py + main.py:44-67): a byte sink keyed by relative path, with a
  * memory variant for in-process callers and a fan-out that mirrors every
  * write to N sinks. The extraction job drives these per document from
  * inside executors ([[ExtractJob.writeOutputs]]), so implementations
  * must be serializable; [[MemoryWriter]] collects into a JVM-local map —
  * the reference's MemoryDataWriter is equally in-process (it exists to
  * hand results back to the caller), so on a real cluster it is a test/
  * driver-side sink while [[FileWriter]] targets any shared filesystem. */
trait DataWriter extends Serializable {
  def write(path: String, data: Array[Byte]): Unit
  final def writeString(path: String, s: String): Unit =
    write(path, s.getBytes("UTF-8"))
}

/** Filesystem sink rooted at `parent` (filebase.py FileBasedDataWriter):
  * parent directories are created on demand; path separators normalize
  * to '/'. */
final class FileWriter(parent: String) extends DataWriter {
  def write(path: String, data: Array[Byte]): Unit = {
    val p = java.nio.file.Paths.get(parent, path.replace("\\", "/"))
    val dir = p.getParent
    if (dir != null) java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(p, data)
  }
}

/** In-memory sink (MemoryDataWriter, main.py:44-51): writes land in a
  * concurrent map keyed by the normalized path. The map lives in a
  * JVM-global registry keyed per writer instance, so the copies Spark
  * deserializes into each task all write through to the instance the
  * caller holds — a SINGLE-JVM sink (local mode / tests), exactly the
  * in-process role the reference's MemoryDataWriter plays. */
final class MemoryWriter extends DataWriter {
  private val key: String = java.util.UUID.randomUUID().toString
  MemoryWriter.registry.putIfAbsent(key, TrieMap.empty)
  def data: TrieMap[String, Array[Byte]] =
    MemoryWriter.registry.getOrElseUpdate(key, TrieMap.empty)
  def write(path: String, bytes: Array[Byte]): Unit =
    data.put(path.replace("\\", "/"), bytes)
  /** Release the registry entry — the static map would otherwise pin the
    * written bytes for the JVM lifetime. Call when done reading. */
  def close(): Unit = { MemoryWriter.registry.remove(key); () }
}

object MemoryWriter {
  private val registry: TrieMap[String, TrieMap[String, Array[Byte]]] =
    TrieMap.empty
}

/** Fan-out to several writers (FanoutDataWriter, main.py:54-67): null
  * members are silently dropped, exactly the reference's filter. */
final class FanoutWriter(writers: DataWriter*) extends DataWriter {
  private val ws: Vector[DataWriter] = writers.filter(_ != null).toVector
  def write(path: String, data: Array[Byte]): Unit =
    ws.foreach(_.write(path, data))
}
