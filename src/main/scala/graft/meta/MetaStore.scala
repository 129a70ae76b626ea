package graft.meta

import java.time.{Clock, LocalDate}
import java.time.format.DateTimeFormatter
import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Raised when an existing meta file's column set doesn't match the expected
  * (source_date, datetime_of_processing) — reference
  * `custom_exceptions.py:13-19` / `meta_process.py:47-50`.
  */
class WrongMetaFileException(msg: String) extends RuntimeException(msg)

/** The incremental-progress watermark ("meta file") — a small CSV of
  * (source_date, datetime_of_processing) rows at a fixed key, reproducing the
  * reference's `MetaProcess` exactly (`xetra/common/meta_process.py:20-125`),
  * including the quirks its tests pin:
  *
  *  - `pendingDates` starts one day *before* first_date (the extra day feeds
  *    the report's lag column), resumes from `min(missing)` with the list
  *    beginning at `min(missing) − 1`, and returns the `2200-01-01` sentinel
  *    with an empty list when nothing is missing.
  *  - `commit` unions new rows after the old ones with **no dedup**
  *    (duplicate dates accumulate — reference U1) and rewrites the whole
  *    file; an empty union writes nothing (reference S4 empty-write skip).
  *  - The read-modify-write is not atomic — preserved for parity; at scale
  *    swap the file for a transactional table without changing this API.
  *
  * I/O goes through the Hadoop FileSystem API directly (not a Spark job):
  * the watermark is a single tiny driver-side object, exactly like the
  * reference's boto3 get/put — spinning up tasks for it would serialize a
  * whole stage onto a few hundred bytes. Works on any Hadoop-supported URI
  * (file://, s3a://, hdfs://).
  *
  * @param metaUri full URI of the meta CSV
  * @param clock   injected so "today" is deterministic in tests (the
  *                reference's three wall-clock call sites are its main
  *                testability gap — SURVEY.md §7.4.4)
  */
final class MetaStore(metaUri: String, conf: Configuration, clock: Clock) {
  import MetaStore._

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[MetaStore])

  private def fs: FileSystem = new Path(metaUri).getFileSystem(conf)

  private def today: LocalDate = LocalDate.now(clock)

  /** (resume_date, dates to extract) — reference `return_date_list`
    * (`meta_process.py:61-125`).
    */
  def pendingDates(firstDate: String): (String, Seq[String]) = {
    val start = LocalDate.parse(firstDate).minusDays(1)
    val all: Seq[LocalDate] =
      Iterator.iterate(start)(_.plusDays(1)).takeWhile(!_.isAfter(today)).toSeq
    readProcessedDates() match {
      case None =>
        log.info("no meta file at {} - cold start, {} dates from {}",
          metaUri, all.size.toString, firstDate)
        // cold start: full backfill from first_date − 1
        (firstDate, all.map(_.format(DateFmt)))
      case Some(processed) =>
        val missing = all.drop(1).toSet -- processed
        if (missing.nonEmpty) {
          val minDate = missing.min(Ordering.by[LocalDate, Long](_.toEpochDay))
            .minusDays(1)
          val resume = minDate.plusDays(1).format(DateFmt)
          (resume, all.filter(!_.isBefore(minDate)).map(_.format(DateFmt)))
        } else {
          log.info("meta file {} is complete - sentinel, nothing to process",
            metaUri)
          (Sentinel, Seq.empty)
        }
    }
  }

  /** Append processed dates (+ a processing timestamp) — reference
    * `update_meta_file` (`meta_process.py:20-59`).
    */
  def commit(dates: Seq[String]): Unit = {
    val stamp = java.time.LocalDateTime.now(clock).format(StampFmt)
    val newRows = dates.map(d => (d, stamp))
    val allRows = readRows() match {
      case None => newRows
      case Some((header, oldRows)) =>
        if (header.sorted != Columns.sorted)
          throw new WrongMetaFileException(
            s"meta file columns ${header.mkString(",")} != expected ${Columns.mkString(",")}")
        oldRows ++ newRows
    }
    if (allRows.nonEmpty) {
      log.info("committing {} rows ({} new dates) to {}",
        allRows.size.toString, dates.size.toString, metaUri)
      writeRows(allRows)
    } else log.info("empty meta union - nothing written (reference S4 skip)")
  }

  // ------------------------------------------------------------------ IO
  private def readProcessedDates(): Option[Set[LocalDate]] =
    readRows().map { case (header, rows) =>
      val idx = header.indexOf(SourceDateCol)
      if (idx < 0)
        throw new WrongMetaFileException(
          s"meta file has no '$SourceDateCol' column (found: ${header.mkString(",")})")
      rows.map(r => LocalDate.parse(if (idx == 0) r._1 else r._2)).toSet
    }

  /** None when the meta file doesn't exist (the reference's NoSuchKey
    * branch); Some((header, rows)) otherwise.
    */
  private def readRows(): Option[(Seq[String], Seq[(String, String)])] = {
    val p = new Path(metaUri)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    if (lines.isEmpty) return Some((Columns, Vector.empty))
    val header = lines.head.split(",", -1).toSeq
    val rows = lines.tail.filter(_.nonEmpty).map { l =>
      val parts = l.split(",", -1)
      (parts(0), if (parts.length > 1) parts(1) else "")
    }
    Some((header, rows))
  }

  private def writeRows(rows: Seq[(String, String)]): Unit = {
    val sb = new StringBuilder(Columns.mkString(",")).append('\n')
    rows.foreach { case (d, t) => sb.append(d).append(',').append(t).append('\n') }
    val out = fs.create(new Path(metaUri), true)
    try out.write(sb.toString.getBytes("UTF-8"))
    finally out.close()
  }
}

object MetaStore {
  /** Column names and formats — reference `constants.py:22-26`. */
  val SourceDateCol = "source_date"
  val ProcessCol = "datetime_of_processing"
  val Columns: Seq[String] = Seq(SourceDateCol, ProcessCol)
  val Sentinel = "2200-01-01"
  val DateFmt: DateTimeFormatter = DateTimeFormatter.ofPattern("yyyy-MM-dd")
  val StampFmt: DateTimeFormatter =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
}
