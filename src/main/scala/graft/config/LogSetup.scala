package graft.config

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.appender.ConsoleAppender
import org.apache.logging.log4j.core.layout.PatternLayout

/** Applies a parsed [[LoggingConfig]] to the process's log4j2 runtime —
  * the Spark-native form of the reference's
  * `logging.config.dictConfig(config["logging"])` (`run.py:28-29`).
  *
  * dictConfig semantics mapped onto log4j2:
  *  - `root: level:` → `Configurator.setRootLevel`-equivalent on the live
  *    LoggerContext, with Python level names (WARNING/CRITICAL/NOTSET)
  *    translated to their log4j equivalents.
  *  - a `formatters: … format:` pattern → the console appender's layout is
  *    replaced: dictConfig *replaces* handler config wholesale, so the
  *    existing console appender(s) on the root logger are swapped for one
  *    carrying the converted pattern (not duplicated alongside — that
  *    would double every line).
  *
  * Everything runs against the in-JVM LoggerContext; no files are written
  * and Spark's own log4j2.properties remains the fallback when the job
  * config has no `logging:` section.
  */
object LogSetup {

  /** Python `logging` level name → log4j2 [[Level]]. Unknown names fall
    * back to INFO rather than throwing: a typo'd level in a job config
    * should degrade to default verbosity, not kill the run.
    */
  def toLog4jLevel(name: String): Level = name.trim.toUpperCase match {
    case "CRITICAL" | "FATAL" => Level.FATAL
    case "ERROR" => Level.ERROR
    case "WARNING" | "WARN" => Level.WARN
    case "INFO" => Level.INFO
    case "DEBUG" => Level.DEBUG
    case "NOTSET" | "TRACE" => Level.TRACE
    case _ => Level.INFO
  }

  /** Python %-style format → log4j2 pattern. Covers the conversion
    * specifiers the reference's formatter uses plus the common ones;
    * literal text passes through unchanged and a trailing newline is
    * appended (Python handlers terminate records implicitly).
    */
  def toLog4jPattern(pyFormat: String): String = {
    val converted = pyFormat
      .replace("%(asctime)s", "%d{yyyy-MM-dd HH:mm:ss,SSS}")
      .replace("%(levelname)s", "%p")
      .replace("%(name)s", "%c")
      .replace("%(message)s", "%m")
      .replace("%(threadName)s", "%t")
      .replace("%(module)s", "%C{1}")
    converted + "%n"
  }

  /** Apply `cfg` to the current log4j2 context. No-op for `None` — the
    * session keeps Spark's defaults untouched.
    */
  def configure(cfg: Option[LoggingConfig]): Unit = cfg.foreach { lc =>
    val ctx = LogManager.getContext(false) match {
      case c: LoggerContext => c
      case _ => return // non-core backend (e.g. test shim): nothing to drive
    }
    val conf = ctx.getConfiguration
    val rootCfg = conf.getRootLogger
    lc.pattern.foreach { py =>
      val layout = PatternLayout.newBuilder()
        .withPattern(toLog4jPattern(py))
        .withConfiguration(conf)
        .build()
      val replacement: ConsoleAppender =
        ConsoleAppenderFactory.create("graft-console", layout, conf)
      replacement.start()
      // dictConfig replaces handlers: drop the existing console appender(s)
      // from root, keep non-console ones (e.g. a file appender) intact
      import scala.jdk.CollectionConverters._
      rootCfg.getAppenders.asScala.values
        .filter(_.isInstanceOf[ConsoleAppender])
        .foreach(a => rootCfg.removeAppender(a.getName))
      conf.addAppender(replacement)
      rootCfg.addAppender(replacement, null, null)
    }
    lc.rootLevel.foreach(l => rootCfg.setLevel(toLog4jLevel(l)))
    ctx.updateLoggers()
  }
}
