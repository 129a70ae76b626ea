package graft

import graft.config.{Configs, LoggingConfig, LogSetup}
import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.scalatest.funsuite.AnyFunSuite

/** Logging-config parity (round-8 verdict #4, reference `run.py:28-29`):
  * the YAML `logging:` section must actually drive log4j2 — a configured
  * root level changes which records REACH appenders, not just a stored
  * field.
  */
class LogSetupSpec extends AnyFunSuite {

  private val referenceYaml =
    """source:
      |  src_uri: file:///tmp/src
      |logging:
      |  version: 1
      |  formatters:
      |    xetra:
      |      format: "Xetra Transformer - %(asctime)s - %(levelname)s - %(message)s"
      |  handlers:
      |    console:
      |      class: logging.StreamHandler
      |      formatter: xetra
      |      level: DEBUG
      |  root:
      |    level: WARNING
      |    handlers: [ console ]
      |""".stripMargin

  test("parseLogging reads the reference dictConfig shape, root level wins") {
    val lc = Configs.parseLogging(referenceYaml)
    assert(lc.contains(LoggingConfig(Some("WARNING"),
      Some("Xetra Transformer - %(asctime)s - %(levelname)s - %(message)s"))),
      "root.level (WARNING) must be read, not the handler's DEBUG")
  }

  test("a config without a logging section maps to None (defaults kept)") {
    assert(Configs.parseLogging("source:\n  src_uri: x\n").isEmpty)
  }

  test("Python level names map onto log4j levels") {
    assert(LogSetup.toLog4jLevel("CRITICAL") == Level.FATAL)
    assert(LogSetup.toLog4jLevel("WARNING") == Level.WARN)
    assert(LogSetup.toLog4jLevel("debug") == Level.DEBUG)
    assert(LogSetup.toLog4jLevel("bogus") == Level.INFO)
  }

  test("Python %-format converts to a log4j pattern") {
    val p = LogSetup.toLog4jPattern(
      "Xetra Transformer - %(asctime)s - %(levelname)s - %(message)s")
    assert(p == "Xetra Transformer - %d{yyyy-MM-dd HH:mm:ss,SSS} - %p - %m%n")
  }

  test("a configured root level changes which records are emitted") {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val conf = ctx.getConfiguration
    val rootCfg = conf.getRootLogger
    val prevLevel = rootCfg.getLevel
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val capture = new AbstractAppender("r9-capture", null, null, true,
        org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit =
        seen.add(e.getLevel + ":" + e.getMessage.getFormattedMessage)
    }
    capture.start()
    conf.addAppender(capture)
    rootCfg.addAppender(capture, null, null)
    ctx.updateLoggers()
    try {
      val logger = LogManager.getLogger("graft.LogSetupSpec.probe")

      LogSetup.configure(Some(LoggingConfig(Some("WARNING"), None)))
      logger.info("suppressed-info")
      logger.warn("passed-warn")
      assert(!seen.contains("INFO:suppressed-info"),
        "INFO emitted although the configured root level is WARNING")
      assert(seen.contains("WARN:passed-warn"),
        "WARN suppressed although the configured root level is WARNING")

      LogSetup.configure(Some(LoggingConfig(Some("DEBUG"), None)))
      logger.info("now-visible-info")
      assert(seen.contains("INFO:now-visible-info"),
        "INFO still suppressed after reconfiguring the root level to DEBUG")

      LogSetup.configure(None)
      assert(rootCfg.getLevel == Level.DEBUG,
        "configure(None) must be a no-op, not a reset")
    } finally {
      rootCfg.removeAppender("r9-capture")
      rootCfg.setLevel(prevLevel)
      ctx.updateLoggers()
    }
  }

  test("a formatter pattern replaces the console appender, not duplicates it") {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val conf = ctx.getConfiguration
    val rootCfg = conf.getRootLogger
    import scala.jdk.CollectionConverters._
    val before = rootCfg.getAppenders.asScala.toMap // name -> appender
    try {
      LogSetup.configure(Some(LoggingConfig(None,
        Some("Xetra Transformer - %(message)s"))))
      val after = rootCfg.getAppenders.asScala
      assert(after.contains("graft-console"),
        "configured console appender missing from root")
      val consoles = after.values.count(
        _.isInstanceOf[org.apache.logging.log4j.core.appender.ConsoleAppender])
      assert(consoles == 1,
        s"dictConfig semantics replace the console handler; found $consoles")
      assert(after("graft-console").getLayout.toString
        .contains("Xetra Transformer - %m%n"),
        "converted pattern not applied to the console layout")
    } finally {
      rootCfg.removeAppender("graft-console")
      before.foreach { case (n, a) =>
        if (!rootCfg.getAppenders.containsKey(n)) rootCfg.addAppender(a, null, null)
      }
      ctx.updateLoggers()
    }
  }
}
