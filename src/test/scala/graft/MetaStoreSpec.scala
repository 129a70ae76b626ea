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
}
