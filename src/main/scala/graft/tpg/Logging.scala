package graft.tpg

import java.nio.file.{Files, Paths}
import java.util.logging.{ConsoleHandler, FileHandler, Formatter, Level, LogRecord, Logger}

/** Namespaced rotating-file + console logging ≙ reference
  * `src/utils_logging.py:10-51` — the one reference component with no
  * engine analog (Spark's own log4j covers executor/driver internals; this
  * is the PIPELINE-side job log the reference writes next to its data).
  * Pure-JDK `java.util.logging`: a size-rotating FileHandler (the JUL
  * `%g` generation counter plays RotatingFileHandler's backupCount role)
  * plus an optional console handler, same line format, and the same
  * idempotence contract — calling setup twice for one name must not stack
  * duplicate handlers.
  */
object Logging {

  // JUL's LogManager holds named loggers only WEAKLY (JDK-6274920): if the
  // caller drops the returned reference, a GC can collect the logger and
  // its handlers, silently swallowing subsequent log lines (and a re-setup
  // would open a second FileHandler against the stale lock file). Pinning
  // every configured logger here mirrors the reference's module-level
  // logger lifetime.
  private val pinned = new java.util.concurrent.ConcurrentHashMap[String, Logger]()

  /** `ts [LEVEL] name: message` — the reference's format string
    * (`utils_logging.py:29`) minus python's funcName, which JUL does not
    * reliably carry.
    */
  private final class LineFormatter extends Formatter {
    private val ts = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
    override def format(r: LogRecord): String =
      s"${ts.format(r.getInstant)} [${r.getLevel}] ${r.getLoggerName}: " +
        s"${formatMessage(r)}${System.lineSeparator}" +
        Option(r.getThrown).map { t =>
          val sw = new java.io.StringWriter()
          t.printStackTrace(new java.io.PrintWriter(sw))
          sw.toString
        }.getOrElse("")
  }

  /** Configure (idempotently) and return the named logger.
    *
    * @param maxBytes    rotate the active file at this size
    * @param backupCount number of rotated generations kept (JUL writes
    *                    `log_<name>.0.log … .<backupCount>.log` round-robin)
    */
  def setup(
      name: String = "etl",
      level: String = "INFO",
      toFile: Boolean = true,
      toConsole: Boolean = true,
      logDir: String = "logs",
      maxBytes: Int = 5000000,
      backupCount: Int = 3): Logger = {
    val logger = Logger.getLogger(name)
    pinned.putIfAbsent(name, logger)
    if (logger.getHandlers.nonEmpty) return logger // idempotent, like the reference

    val lvl = level.toUpperCase match {
      case "DEBUG"             => Level.FINE
      case "WARNING" | "WARN"  => Level.WARNING
      case "ERROR" | "SEVERE"  => Level.SEVERE
      case _                   => Level.INFO
    }
    logger.setLevel(lvl)
    logger.setUseParentHandlers(false) // our handlers only — no root double-print
    val fmt = new LineFormatter

    if (toConsole) {
      val ch = new ConsoleHandler
      ch.setLevel(lvl)
      ch.setFormatter(fmt)
      logger.addHandler(ch)
    }
    if (toFile) {
      Files.createDirectories(Paths.get(logDir))
      // one generation counter plays the backup role; +1 keeps the active
      // file outside the backup budget, mirroring RotatingFileHandler
      val fh = new FileHandler(
        s"$logDir/log_$name.%g.log", maxBytes, backupCount + 1, true)
      fh.setLevel(lvl)
      fh.setFormatter(fmt)
      logger.addHandler(fh)
    }
    logger
  }
}
