package graft.core

import java.util.concurrent.atomic.AtomicBoolean

/** Global debug toggle — reference `set_debug(bool)` (src/helpers.rs:12-21),
  * an atomic flag consulted by verbose paths; also drops the engine's
  * log4j level when enabled.
  */
object Debug {
  private val flag = new AtomicBoolean(false)

  def setDebug(enabled: Boolean): Unit = {
    flag.set(enabled)
    val level = if (enabled) org.apache.logging.log4j.Level.DEBUG
                else org.apache.logging.log4j.Level.WARN
    org.apache.logging.log4j.core.config.Configurator.setLevel("graft", level)
  }

  def isDebug: Boolean = flag.get()
}
