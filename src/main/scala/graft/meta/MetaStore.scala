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
  *    `atomic = true` does exactly that swap (SURVEY §7.4.5): commits
  *    become immutable VERSION files under `<metaUri>.v/`, each claimed by
  *    an optimistic rename-if-absent CAS (the Delta-LogStore pattern —
  *    write a temp file, rename to `v<N+1>.csv`, fail if the version
  *    already exists, re-read and retry). Two interleaved commits can no
  *    longer lose dates: the loser's rename fails and its retry unions the
  *    winner's rows (MetaStoreSpec pins the exact interleaving that loses
  *    a date in parity mode and keeps both here). Reads resolve the
  *    highest version, falling back to the legacy single file, so a plain
  *    store's history is adopted as version 0's base without migration.
  *    Guarantees by store: HDFS-class filesystems make the rename CAS
  *    atomic at the namenode; for same-process racers (two jobs in one
  *    driver) a JVM-wide claim registry closes the local-FS TOCTOU window;
  *    a raw object store would swap the rename for a conditional PUT —
  *    same loop, different primitive.
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
class MetaStore(metaUri: String, conf: Configuration, clock: Clock,
    atomic: Boolean = false) {
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
    if (atomic) commitAtomic(newRows, dates.size)
    else commitPlain(newRows, dates.size)
  }

  private def commitPlain(newRows: Seq[(String, String)], nNew: Int): Unit = {
    val allRows = readRows() match {
      case None => newRows
      case Some((header, oldRows)) =>
        checkHeader(header)
        oldRows ++ newRows
    }
    if (allRows.nonEmpty) {
      log.info("committing {} rows ({} new dates) to {}",
        allRows.size.toString, nNew.toString, metaUri)
      writeRows(allRows)
    } else log.info("empty meta union - nothing written (reference S4 skip)")
  }

  private def checkHeader(header: Seq[String]): Unit =
    if (header.sorted != Columns.sorted)
      throw new WrongMetaFileException(
        s"meta file columns ${header.mkString(",")} != expected ${Columns.mkString(",")}")

  // --------------------------------------------------------- atomic mode
  /** Optimistic CAS loop: read the latest version, union, claim version
    * N+1 by rename-if-absent. A lost race re-reads (now seeing the
    * winner's rows) and retries, so no commit's dates can be dropped.
    */
  private def commitAtomic(newRows: Seq[(String, String)], nNew: Int): Unit = {
    var attempts = 0
    var lastSeen = -2L // below any real version, so the first read resets
    while (true) {
      val n = currentVersion()
      // progress-bounded, not wall-clock-bounded: every time SOMEONE
      // commits (the version advanced since our last attempt) the budget
      // resets — under heavy contention the loser keeps retrying as long
      // as the system is healthy, and starvation only triggers after
      // MaxCasAttempts losses with NO global progress (a genuine fault)
      if (n > lastSeen) { lastSeen = n; attempts = 0 }
      val base = readVersioned(n) match {
        case None => Seq.empty
        case Some((header, oldRows)) => checkHeader(header); oldRows
      }
      val allRows = base ++ newRows
      if (allRows.isEmpty) {
        log.info("empty meta union - nothing written (reference S4 skip)")
        return
      }
      beforeAtomicWrite()
      if (tryWriteVersion(n + 1, allRows)) {
        log.info("committed version {} ({} rows, {} new dates) to {}",
          (n + 1).toString, allRows.size.toString, nNew.toString, metaUri)
        return
      }
      attempts += 1
      if (attempts >= MaxCasAttempts)
        throw new java.io.IOException(
          s"meta CAS starvation after $MaxCasAttempts attempts at $metaUri")
      // a lost race means a competitor is mid-write; back off (growing,
      // capped at 100ms — total budget ~5.5s over the 64 attempts) so the
      // retry reads its committed version instead of spinning out the
      // attempt budget while a slow-store writer is still mid-commit
      Thread.sleep(math.min(5L * attempts, 100L))
    }
  }

  /** Test seam: runs between the read and the version claim, where the
    * plain mode's lost-update window sits.
    */
  protected def beforeAtomicWrite(): Unit = ()

  /** Test seam: runs after the temp file is written, before the rename —
    * where a transient I/O failure must release the version claim.
    */
  protected def beforeVersionRename(): Unit = ()

  private def versionsDir = new Path(metaUri + ".v")

  private def versionPath(n: Long) = new Path(versionsDir, f"v$n%012d.csv")

  /** Highest committed version, or -1 when none exist yet. */
  private def currentVersion(): Long = {
    val dir = versionsDir
    if (!fs.exists(dir)) return -1L
    fs.listStatus(dir).iterator.map(_.getPath.getName)
      .collect { case VersionName(n) => n.toLong }
      .foldLeft(-1L)(math.max)
  }

  /** Rows visible at version n; version -1 falls back to the legacy
    * single-file layout, adopting a plain store's history unmigrated.
    */
  private def readVersioned(n: Long): Option[(Seq[String], Seq[(String, String)])] =
    if (n < 0) readLegacyRows() else readCsv(versionPath(n))

  /** Write the full union as version n via temp-file + rename-if-absent.
    * False = another committer claimed n first (CAS lost). The JVM-wide
    * claim registry serializes same-process racers even on local
    * filesystems whose rename lacks a no-overwrite mode; across processes
    * the no-overwrite rename is atomic on HDFS-class stores.
    */
  private def tryWriteVersion(n: Long, rows: Seq[(String, String)]): Boolean = {
    val target = versionPath(n)
    // key the claim on the FULLY QUALIFIED version path, not the raw
    // metaUri string: two same-JVM stores addressing one file through
    // different spellings ('file:///x' vs '/x', qualified vs default-FS
    // HDFS URIs) must contend for the same claim or the local-FS TOCTOU
    // the registry exists to close reopens between them
    val claimKey = fs.makeQualified(target).toString
    if (!claimVersion(claimKey)) return false
    var committed = false
    var tmp: Path = null
    try {
      if (fs.exists(target)) return false
      fs.mkdirs(versionsDir)
      tmp = new Path(versionsDir,
        s".tmp-${java.util.UUID.randomUUID().toString}")
      val out = fs.create(tmp, false)
      try out.write(csvBytes(rows))
      finally out.close()
      beforeVersionRename()
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          target.toUri, conf)
        fc.rename(tmp, target)
        committed = true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => ()
        case e: java.io.IOException if fs.exists(target) => ()
      }
      committed
    } finally {
      if (!committed) {
        // a claim becomes permanent only once its version file exists: a
        // writer that claimed n but failed to commit it (transient I/O,
        // lost cross-process rename, exception mid-write) must release
        // the claim, or every future commit to this store in this JVM
        // would starve on an unwritable version number — and its temp
        // file must not leak
        if (tmp != null) { try fs.delete(tmp, false) catch
          { case _: java.io.IOException => () } }
        releaseVersion(claimKey)
      }
    }
  }

  /** (resume_date, dates) and commits agree on layout in atomic mode via
    * this dispatch; plain mode reads the legacy file byte-for-byte.
    */
  private def readRows(): Option[(Seq[String], Seq[(String, String)])] =
    if (atomic) readVersioned(currentVersion()) else readLegacyRows()

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
  private def readLegacyRows(): Option[(Seq[String], Seq[(String, String)])] =
    readCsv(new Path(metaUri))

  private def readCsv(p: Path): Option[(Seq[String], Seq[(String, String)])] = {
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

  private def csvBytes(rows: Seq[(String, String)]): Array[Byte] = {
    val sb = new StringBuilder(Columns.mkString(",")).append('\n')
    rows.foreach { case (d, t) => sb.append(d).append(',').append(t).append('\n') }
    sb.toString.getBytes("UTF-8")
  }

  private def writeRows(rows: Seq[(String, String)]): Unit = {
    val out = fs.create(new Path(metaUri), true)
    try out.write(csvBytes(rows))
    finally out.close()
  }
}

object MetaStore {
  private val VersionName = """v(\d{12})\.csv""".r

  private val MaxCasAttempts = 64

  /** JVM-wide version-claim registry: putIfAbsent on (metaUri, version)
    * serializes same-process committers racing for one version even where
    * the store's rename cannot refuse an existing destination (local FS).
    * A claim is permanent once its version file is committed — so the set
    * stays bounded by committed history — but a FAILED writer releases its
    * claim (see tryWriteVersion), or the unwritten version number would
    * starve every later commit in this JVM.
    */
  private val claimedVersions =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def claimVersion(key: String): Boolean = claimedVersions.add(key)

  private def releaseVersion(key: String): Unit = claimedVersions.remove(key)

  /** Column names and formats — reference `constants.py:22-26`. */
  val SourceDateCol = "source_date"
  val ProcessCol = "datetime_of_processing"
  val Columns: Seq[String] = Seq(SourceDateCol, ProcessCol)
  val Sentinel = "2200-01-01"
  val DateFmt: DateTimeFormatter = DateTimeFormatter.ofPattern("yyyy-MM-dd")
  val StampFmt: DateTimeFormatter =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
}
