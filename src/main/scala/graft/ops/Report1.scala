package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Source-side column names of the minute-bar table (reference:
  * `xetra/transformers/xetra_transformer.py:13-36` — `XetraSourceConfig`).
  * Defaults mirror `configs/xetra_report1_config.yaml:13-20`.
  */
final case class Report1SourceCols(
    isin: String = "ISIN",
    date: String = "Date",
    time: String = "Time",
    startPrice: String = "StartPrice",
    minPrice: String = "MinPrice",
    maxPrice: String = "MaxPrice",
    tradedVolume: String = "TradedVolume",
    /** Projection list (reference `src_columns`); order preserved. */
    columns: Seq[String] = Seq("ISIN", "Mnemonic", "Date", "Time",
      "StartPrice", "EndPrice", "MinPrice", "MaxPrice", "TradedVolume"))

/** Target-side column names (reference: `xetra_transformer.py:39-66` —
  * `XetraTargetConfig`; defaults from `configs/xetra_report1_config.yaml:27-34`).
  * Note the report keeps the *source* names for the two group keys — the
  * reference's groupBy passes them through unrenamed
  * (`xetra_transformer.py:175-185`).
  */
final case class Report1TargetCols(
    openingPrice: String = "opening_price_eur",
    closingPrice: String = "closing_price_eur",
    minPrice: String = "minimum_price_eur",
    maxPrice: String = "maximum_price_eur",
    dailyTradedVolume: String = "daily_traded_volume",
    changePrevClosing: String = "change_prev_closing_%")

/** The analytic core: minute bars → daily per-instrument OHLCV report.
  *
  * Same semantics as the reference's `transform_report1`
  * (`xetra/transformers/xetra_transformer.py:127-208`), re-expressed as one
  * lazy Column-expression chain (operator order P1→P2→W1→W2→P4→A1→W3→E1→E2→P3
  * per SURVEY.md §2.7 C2) so Catalyst fuses projection/filter into the scan
  * and reuses the (isin, date) exchange between the two windows and the
  * aggregation.
  *
  * Parity traps handled here (SURVEY.md §4.4):
  *  - W1/W2 need an explicit full frame: pandas `transform("first"/"last")`
  *    broadcasts the group scalar to every row; Spark's default window frame
  *    (unboundedPreceding→currentRow) silently disagrees for `last`.
  *  - E2 rounding is `bround` (HALF_EVEN, = numpy banker's rounding), never
  *    `round` (HALF_UP).
  *  - P3 compares the date column as an ISO *string* (lexicographic), exactly
  *    as the reference does (`xetra_transformer.py:203-206`).
  *  - `tradedVolume` stays integral through `sum` (LongType, not double).
  *  - W3 lags the *opening* price despite the "change_prev_closing" target
  *    name — reference quirk pinned by its golden tests
  *    (`tests/transformers/test_xetra_transformer.py:252-256`); do not "fix".
  */
object Report1 {

  /** Pure transform: apply to any DataFrame holding the source schema.
    *
    * @param extractDate ISO `yyyy-MM-dd`; rows strictly before it are read
    *                    only to feed the lag (W3) and dropped at the end (P3).
    */
  def transform(
      bars: DataFrame,
      src: Report1SourceCols = Report1SourceCols(),
      trg: Report1TargetCols = Report1TargetCols(),
      extractDate: String): DataFrame = {
    if (bars.isEmpty) return emptyReport(bars, src, trg)

    // W1/W2: group-constant first/last StartPrice by Time over (isin, date).
    // Explicit full frame — see scaladoc above.
    val grp = Window
      .partitionBy(col(src.isin), col(src.date))
      .orderBy(col(src.time))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // W3: previous trading day's *opening* price per isin.
    val byDate = Window.partitionBy(col(src.isin)).orderBy(col(src.date))

    val prevOp = "__prev_opening"
    val daily = bars
      .select(src.columns.map(col): _*)                       // P1 projection
      .na.drop("any")                                         // P2 dropna
      .withColumn(trg.openingPrice, first(col(src.startPrice)).over(grp)) // W1
      .withColumn(trg.closingPrice, last(col(src.startPrice)).over(grp))  // W2
      .withColumnsRenamed(Map(                                 // P4 renames
        src.minPrice -> trg.minPrice,
        src.maxPrice -> trg.maxPrice,
        src.tradedVolume -> trg.dailyTradedVolume))
      .groupBy(col(src.isin), col(src.date))                   // A1 agg
      .agg(
        // min() of a group-constant — kept (not first()) for exact parity
        // with the reference's agg dict (`xetra_transformer.py:176-184`).
        min(trg.openingPrice).as(trg.openingPrice),
        min(trg.closingPrice).as(trg.closingPrice),
        min(trg.minPrice).as(trg.minPrice),
        max(trg.maxPrice).as(trg.maxPrice),
        sum(trg.dailyTradedVolume).as(trg.dailyTradedVolume))
      .withColumn(prevOp, lag(col(trg.openingPrice), 1).over(byDate)) // W3
      .withColumn(trg.changePrevClosing,                       // E1 pct change
        pctChange(col(trg.openingPrice), col(prevOp)))
      .drop(prevOp)

    val rounded = daily.select(daily.schema.fields.map { f =>  // E2 bround(2)
      if (f.dataType == DoubleType) bround(col(f.name), 2).as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)

    rounded.filter(col(src.date) >= lit(extractDate))          // P3 string cmp
  }

  /** Empty-input guard (reference S4: `xetra_transformer.py:136-140`) —
    * unlike the reference's schemaless `pd.DataFrame()`, we keep the output
    * schema so downstream writers stay type-stable.
    */
  private def emptyReport(
      bars: DataFrame, src: Report1SourceCols, trg: Report1TargetCols): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField(src.isin, StringType),
      StructField(src.date, StringType),
      StructField(trg.openingPrice, DoubleType),
      StructField(trg.closingPrice, DoubleType),
      StructField(trg.minPrice, DoubleType),
      StructField(trg.maxPrice, DoubleType),
      StructField(trg.dailyTradedVolume, LongType),
      StructField(trg.changePrevClosing, DoubleType)))
    bars.sparkSession.createDataFrame(
      bars.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Percent change vs the lagged value. Null when the previous value is 0
    * or null — an explicit guard so the plan is ANSI-safe (Spark 4's default
    * ANSI mode raises DIVIDE_BY_ZERO) and engine-independent (pandas would
    * give ±inf here; documented deviation, the reference's price data never
    * contains zeros).
    */
  def pctChange(cur: Column, prev: Column): Column =
    when(prev =!= 0.0, (cur - prev) / prev * 100)
}
