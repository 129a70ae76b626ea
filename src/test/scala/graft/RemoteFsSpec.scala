package graft

import java.nio.file.{Files, Path}
import java.time.{Clock, Instant, ZoneOffset}

import graft.config.Configs
import graft.jobs.Report1Job

/** The golden e2e of JobSpec over a REMOTE-scheme FileSystem: source,
  * target, and meta all live behind [[WebHdfsStub]]'s HTTP endpoint, so
  * every byte the job moves goes through URI-resolved Hadoop FS calls —
  * redirect-based creates, ranged reads, list/rename/delete — exactly the
  * path an `s3a://bucket` deployment takes (the sandbox has no hadoop-aws
  * jar or network, so webhdfs:// is the closest protocol-faithful stand-in;
  * see the Connector's s3a coverage note).
  */
class RemoteFsSpec extends SparkSpec {

  private val clock =
    Clock.fixed(Instant.parse("2021-04-19T12:30:00Z"), ZoneOffset.UTC)

  private val fixtureRows = Seq(
    ("2021-04-15", "12", "AT0000A0E9W5,SANT,2021-04-15,12:00,20.19,18.45,18.20,20.33,877"),
    ("2021-04-16", "15", "AT0000A0E9W5,SANT,2021-04-16,15:00,18.27,21.19,18.27,21.34,987"),
    ("2021-04-17", "13", "AT0000A0E9W5,SANT,2021-04-17,13:00,20.21,18.27,18.21,20.42,633"),
    ("2021-04-17", "14", "AT0000A0E9W5,SANT,2021-04-17,14:00,18.27,21.19,18.27,21.34,455"),
    ("2021-04-18", "07", "AT0000A0E9W5,SANT,2021-04-18,07:00,20.58,19.27,18.89,20.58,9066"),
    ("2021-04-18", "08", "AT0000A0E9W5,SANT,2021-04-18,08:00,19.27,21.14,19.27,21.14,1220"),
    ("2021-04-19", "07", "AT0000A0E9W5,SANT,2021-04-19,07:00,23.58,23.58,23.58,23.58,1035"),
    ("2021-04-19", "08", "AT0000A0E9W5,SANT,2021-04-19,08:00,23.58,24.22,23.31,24.34,1028"),
    ("2021-04-19", "09", "AT0000A0E9W5,SANT,2021-04-19,09:00,24.22,22.21,22.21,25.01,1523"))

  private val header =
    "ISIN,Mnemonic,Date,Time,StartPrice,EndPrice,MinPrice,MaxPrice,TradedVolume"

  private def layout(src: Path): Unit =
    fixtureRows.groupBy(r => (r._1, r._2)).foreach { case ((date, hour), rows) =>
      val dir = src.resolve(date)
      Files.createDirectories(dir)
      Files.writeString(dir.resolve(s"${date}_BINS_XETR$hour.csv"),
        header + "\n" + rows.map(_._3).mkString("\n") + "\n")
    }

  private def configFile(root: Path, base: String): Path = {
    val yaml =
      s"""source:
         |  src_uri: '$base/src/'
         |  src_first_extract_date: '2021-04-17'
         |  src_columns: ['ISIN', 'Mnemonic', 'Date', 'Time', 'StartPrice', 'EndPrice', 'MinPrice', 'MaxPrice', 'TradedVolume']
         |  src_col_date: 'Date'
         |  src_col_isin: 'ISIN'
         |  src_col_time: 'Time'
         |  src_col_start_price: 'StartPrice'
         |  src_col_min_price: 'MinPrice'
         |  src_col_max_price: 'MaxPrice'
         |  src_col_traded_vol: 'TradedVolume'
         |target:
         |  trg_uri: '$base/trg/'
         |  trg_key: 'report1/xetra_daily_report1_'
         |  trg_key_date_format: 'yyyyMMdd_HHmmss'
         |  trg_format: 'parquet'
         |  trg_col_isin: 'isin'
         |  trg_col_date: 'date'
         |  trg_col_op_price: 'opening_price_eur'
         |  trg_col_clos_price: 'closing_price_eur'
         |  trg_col_min_price: 'minimum_price_eur'
         |  trg_col_max_price: 'maximum_price_eur'
         |  trg_col_dail_trad_vol: 'daily_traded_volume'
         |  trg_col_ch_prev_clos: 'change_prev_closing_%'
         |meta:
         |  meta_uri: '$base/trg/meta/meta.csv'
         |""".stripMargin
    val f = root.resolve("config.yaml")
    Files.writeString(f, yaml)
    f
  }

  test("golden e2e over webhdfs:// — the remote object-store code path") {
    val root = Files.createTempDirectory("graftwebhdfs")
    layout(root.resolve("src"))
    val stub = new WebHdfsStub(root)
    stub.start()
    try {
      val cfg = Configs.load(configFile(root, stub.uri).toString)
      val job = new Report1Job(spark, cfg, clock)
      assert(job.extractDates ==
        Seq("2021-04-16", "2021-04-17", "2021-04-18", "2021-04-19"))
      job.run()

      // read the report BACK through webhdfs (ranged parquet footer reads)
      val outDirLocal = root.resolve("trg").resolve("report1")
      val written = Files.list(outDirLocal).toArray.map(_.toString)
      assert(written.exists(_.contains("xetra_daily_report1_20210419_123000")),
        s"missing timestamped report dir, got: ${written.mkString(",")}")
      val reportUri = s"${stub.uri}/trg/report1/" +
        written.head.split('/').last
      val report = spark.read.parquet(reportUri)
        .orderBy("ISIN", "Date").collect().toSeq.map(_.toSeq)
      assert(report == Seq(
        Seq("AT0000A0E9W5", "2021-04-17", 20.21, 18.27, 18.21, 21.34, 1088L, 10.62),
        Seq("AT0000A0E9W5", "2021-04-18", 20.58, 19.27, 18.89, 21.14, 10286L, 1.83),
        Seq("AT0000A0E9W5", "2021-04-19", 23.58, 24.22, 22.21, 25.01, 3586L, 14.58)))

      // meta was committed through the stub (RMW create over HTTP); assert
      // on the stub's backing store — same bytes the remote now holds
      val meta = Files.readString(
        root.resolve("trg").resolve("meta").resolve("meta.csv"))
      assert(meta ==
        "source_date,datetime_of_processing\n" +
        "2021-04-17,2021-04-19 12:30:00\n" +
        "2021-04-18,2021-04-19 12:30:00\n" +
        "2021-04-19,2021-04-19 12:30:00\n")

      // second run: watermark read back over HTTP → sentinel no-op
      val job2 = new Report1Job(spark, cfg, clock)
      assert(job2.extractDate == "2200-01-01")
      assert(job2.extractDates.isEmpty)
      job2.run()
      assert(Files.list(outDirLocal).toArray.length == written.length,
        "no-op run must not write a new report")
    } finally stub.stop()
  }
}
