package graft.util

/** Shared JDK-DOM plumbing. r6 (guide §1.2 per-task work): profiling the
  * office tier showed a large share of wall time in
  * DocumentBuilderFactory/DocumentBuilder CONSTRUCTION (SPI lookup +
  * Xerces pipeline configuration) because a fresh builder was built per
  * parsed part. Builders are not thread-safe but are reusable — one per
  * task thread, reset() before each use, same parse semantics. */
object Xml {
  private val builders = new ThreadLocal[javax.xml.parsers.DocumentBuilder] {
    override def initialValue(): javax.xml.parsers.DocumentBuilder = {
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      f.setNamespaceAware(false)
      f.newDocumentBuilder()
    }
  }

  /** A reset, reusable per-thread DocumentBuilder. */
  def builder(): javax.xml.parsers.DocumentBuilder = {
    val b = builders.get()
    b.reset()
    b
  }
}
