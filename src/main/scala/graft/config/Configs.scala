package graft.config

import scala.io.Source

/** Job configuration — the reference's YAML sections
  * (`configs/xetra_report1_config.yaml`) as case classes (≅ the
  * `XetraSourceConfig`/`XetraTargetConfig` NamedTuples,
  * `xetra_transformer.py:13-66`). Storage endpoints are plain URIs: the
  * engine doesn't care whether they're file://, s3a://, or hdfs://.
  */
final case class SourceConfig(
    uri: String,
    firstExtractDate: String,
    columns: Seq[String],
    colDate: String, colIsin: String, colTime: String,
    colStartPrice: String, colMinPrice: String, colMaxPrice: String,
    colTradedVol: String,
    /** Non-role numeric columns typed DoubleType in the declared schema
      * (`src_extra_double_cols`, optional). Default covers the reference's
      * EndPrice, which is read but never used by the report.
      */
    extraDoubleCols: Seq[String] = Seq("EndPrice"))

final case class TargetConfig(
    uri: String,
    key: String,
    keyDateFormat: String,
    format: String,
    colIsin: String, colDate: String,
    colOpPrice: String, colClosPrice: String,
    colMinPrice: String, colMaxPrice: String,
    colDailyTradedVol: String, colChPrevClos: String)

final case class MetaConfig(metaUri: String)

/** The reference's `logging:` dictConfig section (`run.py:28-29`) reduced
  * to the two knobs that have a log4j2 meaning in a Spark process: the
  * root level and the console format pattern (Python %-style, converted by
  * [[LogSetup.toLog4jPattern]]). Handler topology (which is Python
  * `logging`-machinery-specific) has no analogue and is not modeled.
  */
final case class LoggingConfig(rootLevel: Option[String],
    pattern: Option[String])

final case class JobConfig(source: SourceConfig, target: TargetConfig,
    meta: MetaConfig, logging: Option[LoggingConfig] = None)

/** Minimal YAML-subset loader for the flat two-level config shape the
  * reference uses (sections → scalar or inline-list values). No external
  * YAML dependency exists in this build (zero-egress, Spark jars only), and
  * the config grammar genuinely needed is this small. The one nested
  * section, the reference's `logging:` dictConfig, gets a dedicated scan
  * ([[Configs.parseLogging]]) and is applied to log4j2 by [[LogSetup]].
  */
object Configs {

  def load(path: String): JobConfig = {
    val text = Source.fromFile(path, "UTF-8").mkString
    val sections = parse(text)
    val s = sections.getOrElse("source",
      sys.error("config: missing 'source' section"))
    val t = sections.getOrElse("target",
      sys.error("config: missing 'target' section"))
    val m = sections.getOrElse("meta",
      sys.error("config: missing 'meta' section"))
    def one(sec: Map[String, Either[String, Seq[String]]], k: String): String =
      sec.getOrElse(k, sys.error(s"config: missing key '$k'")) match {
        case Left(v) => v
        case Right(_) => sys.error(s"config: key '$k' should be scalar")
      }
    def list(sec: Map[String, Either[String, Seq[String]]], k: String): Seq[String] =
      sec.getOrElse(k, sys.error(s"config: missing key '$k'")) match {
        case Right(v) => v
        case Left(_) => sys.error(s"config: key '$k' should be a list")
      }
    JobConfig(
      SourceConfig(
        uri = one(s, "src_uri"),
        firstExtractDate = one(s, "src_first_extract_date"),
        columns = list(s, "src_columns"),
        colDate = one(s, "src_col_date"),
        colIsin = one(s, "src_col_isin"),
        colTime = one(s, "src_col_time"),
        colStartPrice = one(s, "src_col_start_price"),
        colMinPrice = one(s, "src_col_min_price"),
        colMaxPrice = one(s, "src_col_max_price"),
        colTradedVol = one(s, "src_col_traded_vol"),
        extraDoubleCols = s.get("src_extra_double_cols") match {
          case Some(Right(v)) => v
          case Some(Left(v)) => Seq(v)
          case None => Seq("EndPrice")
        }),
      TargetConfig(
        uri = one(t, "trg_uri"),
        key = one(t, "trg_key"),
        keyDateFormat = one(t, "trg_key_date_format"),
        format = one(t, "trg_format"),
        colIsin = one(t, "trg_col_isin"),
        colDate = one(t, "trg_col_date"),
        colOpPrice = one(t, "trg_col_op_price"),
        colClosPrice = one(t, "trg_col_clos_price"),
        colMinPrice = one(t, "trg_col_min_price"),
        colMaxPrice = one(t, "trg_col_max_price"),
        colDailyTradedVol = one(t, "trg_col_dail_trad_vol"),
        colChPrevClos = one(t, "trg_col_ch_prev_clos")),
      MetaConfig(metaUri = one(m, "meta_uri")),
      logging = parseLogging(text))
  }

  /** Extract root level + formatter pattern from a nested `logging:`
    * dictConfig section. The main [[parse]] grammar is deliberately
    * two-level; this is a targeted indentation-aware scan of just the
    * `logging:` block, so `level:` keys inside handler definitions are NOT
    * confused with `root: → level:` (dictConfig semantics: the root level
    * is what gates emission; handler levels only filter further).
    */
  private[graft] def parseLogging(text: String): Option[LoggingConfig] = {
    var inLogging = false
    var path = List.empty[(Int, String)] // (indent, blockKey), innermost first
    var rootLevel: Option[String] = None
    var pattern: Option[String] = None
    for (raw <- text.linesIterator) {
      val line = stripComment(raw).replaceAll("\\s+$", "")
      if (line.trim.nonEmpty) {
        val indent = line.takeWhile(_ == ' ').length
        if (indent == 0) {
          inLogging = line == "logging:"
          path = Nil
        } else if (inLogging && line.contains(":")) {
          val Array(k, v) = line.split(":", 2)
          val key = k.trim
          val value = v.trim
          path = path.dropWhile(_._1 >= indent)
          if (value.isEmpty) path = (indent, key) :: path
          else {
            val parents = path.map(_._2)
            if (key == "level" && parents.headOption.contains("root"))
              rootLevel = Some(unquote(value))
            if (key == "format" && parents.contains("formatters"))
              pattern = Some(unquote(value))
          }
        }
      }
    }
    if (rootLevel.isEmpty && pattern.isEmpty) None
    else Some(LoggingConfig(rootLevel, pattern))
  }

  /** section → key → scalar | list. Inline lists only (`[a, b, c]`);
    * comments and blank lines skipped; quotes stripped.
    */
  private[config] def parse(text: String)
      : Map[String, Map[String, Either[String, Seq[String]]]] = {
    var section: String = null
    val out = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Map[String, Either[String, Seq[String]]]]
    for (raw <- text.linesIterator) {
      val noComment = stripComment(raw)
      val line = noComment.replaceAll("\\s+$", "")
      if (line.trim.nonEmpty) {
        if (!line.startsWith(" ") && line.endsWith(":")) {
          section = line.dropRight(1).trim
          out.getOrElseUpdate(section,
            scala.collection.mutable.Map.empty)
        } else if (line.startsWith(" ") && section != null && line.contains(":")) {
          val Array(k, v) = line.split(":", 2)
          val key = k.trim
          val value = v.trim
          if (value.startsWith("[") && value.endsWith("]")) {
            val items = value.substring(1, value.length - 1).split(",")
              .map(i => unquote(i.trim)).filter(_.nonEmpty).toSeq
            out(section)(key) = Right(items)
          } else if (value.nonEmpty) {
            out(section)(key) = Left(unquote(value))
          } // bare "key:" with nested block → ignored (unsupported depth)
        }
      }
    }
    out.map { case (k, v) => k -> v.toMap }.toMap
  }

  /** Strip a trailing comment, respecting quotes. */
  private def stripComment(line: String): String = {
    var inS = false; var inD = false
    val b = new StringBuilder
    for (c <- line) {
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      if (c == '#' && !inS && !inD) return b.toString
      b.append(c)
    }
    b.toString
  }

  private def unquote(s: String): String =
    if (s.length >= 2 &&
      ((s.head == '\'' && s.last == '\'') || (s.head == '"' && s.last == '"')))
      s.substring(1, s.length - 1)
    else s
}
