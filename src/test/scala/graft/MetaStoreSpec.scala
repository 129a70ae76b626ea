package graft

import java.nio.file.{Files, Path}
import java.time.{Clock, Instant, ZoneOffset}

import graft.meta.{MetaStore, WrongMetaFileException}
import org.apache.hadoop.conf.Configuration

/** Ports the reference's eight `MetaProcess` cases
  * (`tests/common/test_meta_process.py:58-314`) against a fixed clock —
  * cold start, partial progress, fully-processed sentinel, wrong schema on
  * both paths, duplicate accumulation, empty-commit skip.
  */
class MetaStoreSpec extends SparkSpec {

  // "today" pinned to 2021-04-19 (the golden fixture's last trading day)
  private val clock =
    Clock.fixed(Instant.parse("2021-04-19T10:00:00Z"), ZoneOffset.UTC)

  private def store(dir: Path): MetaStore =
    new MetaStore(dir.resolve("meta.csv").toUri.toString,
      new Configuration(), clock)

  private def tmp(): Path = Files.createTempDirectory("metastore")

  private def write(dir: Path, content: String): Unit =
    Files.writeString(dir.resolve("meta.csv"), content)

  private def read(dir: Path): String =
    Files.readString(dir.resolve("meta.csv"))

  test("cold start: no meta file → full backfill from first_date − 1") {
    val (resume, dates) = store(tmp()).pendingDates("2021-04-17")
    assert(resume == "2021-04-17")
    assert(dates == Seq("2021-04-16", "2021-04-17", "2021-04-18", "2021-04-19"))
  }

  test("partial progress: resume = min missing, list starts one day earlier") {
    val dir = tmp()
    write(dir, "source_date,datetime_of_processing\n" +
      "2021-04-16,2021-04-16 10:00:00\n2021-04-17,2021-04-17 10:00:00\n")
    val (resume, dates) = store(dir).pendingDates("2021-04-16")
    assert(resume == "2021-04-18")
    assert(dates == Seq("2021-04-17", "2021-04-18", "2021-04-19"))
  }

  test("gap in the middle resumes from the gap, not the tail") {
    val dir = tmp()
    write(dir, "source_date,datetime_of_processing\n" +
      "2021-04-16,x\n2021-04-18,x\n")
    val (resume, dates) = store(dir).pendingDates("2021-04-16")
    assert(resume == "2021-04-17")
    assert(dates == Seq("2021-04-16", "2021-04-17", "2021-04-18", "2021-04-19"))
  }

  test("all processed → 2200-01-01 sentinel and empty list") {
    val dir = tmp()
    write(dir, "source_date,datetime_of_processing\n" +
      (16 to 19).map(d => s"2021-04-$d,x").mkString("\n") + "\n")
    val (resume, dates) = store(dir).pendingDates("2021-04-16")
    assert(resume == "2200-01-01")
    assert(dates.isEmpty)
  }

  test("wrong meta columns on the read path throw") {
    val dir = tmp()
    write(dir, "wrong_column,datetime_of_processing\n2021-04-16,x\n")
    intercept[WrongMetaFileException](store(dir).pendingDates("2021-04-16"))
  }

  test("commit creates the meta file with header and stamped rows") {
    val dir = tmp()
    store(dir).commit(Seq("2021-04-17", "2021-04-18"))
    assert(read(dir) ==
      "source_date,datetime_of_processing\n" +
      "2021-04-17,2021-04-19 10:00:00\n2021-04-18,2021-04-19 10:00:00\n")
  }

  test("commit unions after existing rows without dedup (reference U1)") {
    val dir = tmp()
    val s = store(dir)
    s.commit(Seq("2021-04-17"))
    s.commit(Seq("2021-04-17")) // same date again — must accumulate
    val lines = read(dir).trim.split("\n").toSeq
    assert(lines.count(_.startsWith("2021-04-17,")) == 2)
  }

  test("commit with wrong existing schema throws WrongMetaFileException") {
    val dir = tmp()
    write(dir, "bad,columns\nx,y\n")
    intercept[WrongMetaFileException](store(dir).commit(Seq("2021-04-17")))
  }

  test("empty commit on a cold store writes nothing (empty-write skip)") {
    val dir = tmp()
    store(dir).commit(Seq.empty)
    assert(!Files.exists(dir.resolve("meta.csv")))
  }

  test("idempotence: after commit, pendingDates returns the sentinel") {
    val dir = tmp()
    val s = store(dir)
    val (resume, dates) = s.pendingDates("2021-04-16")
    s.commit(dates.filter(_ >= resume))
    val (again, more) = s.pendingDates("2021-04-16")
    assert(again == "2200-01-01" && more.isEmpty)
  }

  // ------------------------------------------------------- atomic mode
  // SURVEY §7.4.5: the parity-mode RMW race, pinned, then closed by the
  // versioned CAS. Both cases drive the SAME interleaving through the
  // beforeAtomicWrite / explicit-gap seam: committer A reads, committer B
  // commits fully, then A writes.

  private def atomicStore(dir: Path,
      gate: Option[() => Unit] = None): MetaStore =
    new MetaStore(dir.resolve("meta.csv").toUri.toString,
      new Configuration(), clock, atomic = true) {
      override protected def beforeAtomicWrite(): Unit = gate.foreach(_())
    }

  test("parity mode LOSES a date under the interleaved RMW (the race)") {
    // this is the documented reference quirk the atomic mode exists to
    // close: A reads (no file), B commits d2, A writes only d1 → d2 gone
    val dir = tmp()
    val a = store(dir); val b = store(dir)
    // interleave by hand: both commit against the same empty store, B
    // finishing inside A's read→write window — with a plain file the
    // last writer wins and B's date is silently dropped
    b.commit(Seq("2021-04-17"))
    // A's read happened "before" B's commit: simulate by writing what A
    // computed from the empty snapshot
    val aOnly = "source_date,datetime_of_processing\n" +
      "2021-04-16,2021-04-19 10:00:00\n"
    Files.writeString(dir.resolve("meta.csv"), aOnly)
    Files.deleteIfExists(dir.resolve(".meta.csv.crc")) // direct overwrite
    val processed = store(dir).pendingDates("2021-04-16")._2
    assert(processed.contains("2021-04-17"),
      "precondition: 2021-04-17 must be pending again — it was lost")
  }

  test("atomic mode: the same interleaving loses nothing (CAS retry)") {
    val dir = tmp()
    val b = atomicStore(dir)
    // A's gate runs B's full commit inside A's read→write window, exactly
    // once — the second entry is A's retry after its CAS loss
    var fired = false
    val a = atomicStore(dir, Some(() =>
      if (!fired) { fired = true; b.commit(Seq("2021-04-17")) }))
    a.commit(Seq("2021-04-16", "2021-04-18", "2021-04-19"))
    assert(fired, "the interleaving gate never ran")
    // every date through "today" is committed across A and B, so only the
    // sentinel remains — B's interleaved date survived A's write
    val (resume, pending) = atomicStore(dir).pendingDates("2021-04-16")
    assert(resume == "2200-01-01" && pending.isEmpty,
      s"dates lost under interleaved atomic commits: still pending $pending")
  }

  test("atomic mode: a failed write releases its version claim (no starvation)") {
    // a writer that claims version n and then dies mid-commit (transient
    // I/O between temp write and rename) must release the claim — before
    // the fix the orphaned claim starved EVERY later commit to this store
    // in the JVM with 'meta CAS starvation', even with zero concurrency
    val dir = tmp()
    var failures = 0
    val flaky = new MetaStore(dir.resolve("meta.csv").toUri.toString,
      new Configuration(), clock, atomic = true) {
      override protected def beforeVersionRename(): Unit =
        if (failures == 0) {
          failures += 1
          throw new java.io.IOException("injected transient write failure")
        }
    }
    intercept[java.io.IOException] { flaky.commit(Seq("2021-04-16")) }
    // the SAME store (and any other committer in this JVM) must succeed
    // on retry at the same version number
    flaky.commit(Seq("2021-04-16"))
    atomicStore(dir).commit(Seq("2021-04-17"))
    // U2's −1-day dance legitimately re-offers the day before the first
    // gap (it feeds the lag), so only assert the committed dates' own
    // absence of loss: resume advanced past both commits
    val (resume, processed) = atomicStore(dir).pendingDates("2021-04-16")
    assert(!processed.contains("2021-04-16") && resume == "2021-04-18",
      s"commits after the failed write did not land (resume=$resume)")
    // and the failed attempt's temp file did not leak into the log dir
    val leftovers = Files.list(dir.resolve("meta.csv.v")).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (leftovers.hasNext) names += leftovers.next().getFileName.toString
    // local-FS .crc sidecars are Hadoop's own; only tmp files are leaks
    assert(!names.exists(_.contains(".tmp-")),
      s"failed attempt's temp file leaked into the commit log: $names")
  }

  test("atomic mode: 10 concurrent committers, zero lost dates") {
    val dir = tmp()
    val dates = (10 to 19).map(d => s"2021-04-$d")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(10)
    try {
      val tasks = dates.map { d =>
        pool.submit(new Runnable {
          def run(): Unit = atomicStore(dir).commit(Seq(d))
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    val (resume, pending) = atomicStore(dir).pendingDates("2021-04-10")
    assert(resume == "2200-01-01" && pending.isEmpty,
      s"concurrent commits lost dates: $pending")
    // serialization proof: every commit produced exactly one version
    val versions = Files.list(dir.resolve("meta.csv.v")).toArray
      .map(_.toString).filter(_.endsWith(".csv"))
    assert(versions.length == 10,
      s"expected 10 committed versions, found ${versions.length}")
  }

  test("atomic mode adopts a legacy plain file as its base") {
    val dir = tmp()
    write(dir, "source_date,datetime_of_processing\n" +
      "2021-04-16,2021-04-19 09:00:00\n")
    val s = atomicStore(dir)
    s.commit(Seq("2021-04-17"))
    val (_, pending) = s.pendingDates("2021-04-16")
    assert(pending == Seq("2021-04-17", "2021-04-18", "2021-04-19"))
    // the legacy file itself is untouched (reads moved to the version log)
    assert(read(dir).linesIterator.size == 2)
  }

  test("atomic mode keeps the no-dedup union and wrong-schema quirks") {
    val dir = tmp()
    val s = atomicStore(dir)
    s.commit(Seq("2021-04-16"))
    s.commit(Seq("2021-04-16"))
    val latest = Files.list(dir.resolve("meta.csv.v")).toArray
      .map(_.toString).filter(_.endsWith(".csv")).sorted.last
    val rows = Files.readString(java.nio.file.Paths.get(latest))
      .linesIterator.toSeq
    assert(rows.count(_.startsWith("2021-04-16,")) == 2,
      "atomic union must preserve duplicate accumulation (reference U1)")
    val bad = tmp()
    write(bad, "wrong,cols\n2021-04-16,x\n")
    intercept[WrongMetaFileException] {
      atomicStore(bad).commit(Seq("2021-04-17"))
    }
  }
}
