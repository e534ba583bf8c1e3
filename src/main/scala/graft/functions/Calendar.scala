package graft.functions

import java.time.LocalDate

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Brazilian calendar semantics from the reference's time ETL
  * (`ETL/ETL for time.ktr` "Script 1" JS, ~lines 682-815):
  * Easter via Meeus/Jones/Butcher computus, the 9 fixed federal
  * holidays + Good Friday (Easter−2), Dia da Consciência Negra
  * national from 2024, Carnival/Corpus Christi excluded
  * (`includeCarnival=false`, `includeCorpusChristi=false` in the JS),
  * and the southern-hemisphere season bucket (~line 853).
  *
  * Holidays are a per-year pure function (driver-side, a handful of
  * dates) surfaced to Spark as an `isin` literal list — codegen'd,
  * no UDF, broadcast-free.
  */
object Calendar {

  /** Easter Sunday, Meeus/Jones/Butcher (pure integer arithmetic). */
  def easterSunday(year: Int): LocalDate = {
    val a = year % 19
    val b = year / 100
    val c = year % 100
    val d = b / 4
    val e = b % 4
    val f = (b + 8) / 25
    val g = (b - f + 1) / 3
    val h = (19 * a + b - d - g + 15) % 30
    val i = c / 4
    val k = c % 4
    val l = (32 + 2 * e + 2 * i - h - k) % 7
    val m = (a + 11 * h + 22 * l) / 451
    val month = (h + l - 7 * m + 114) / 31
    val day   = (h + l - 7 * m + 114) % 31 + 1
    LocalDate.of(year, month, day)
  }

  /** Brazilian federal holidays for one year (reference's enabled set). */
  def brHolidays(year: Int): Seq[LocalDate] = {
    val fixed = Seq((1, 1), (4, 21), (5, 1), (9, 7), (10, 12),
      (11, 2), (11, 15), (12, 25)).map { case (m, d) => LocalDate.of(year, m, d) }
    val goodFriday = easterSunday(year).minusDays(2)
    val conscienciaNegra =
      if (year >= 2024) Seq(LocalDate.of(year, 11, 20)) else Seq.empty
    fixed ++ Seq(goodFriday) ++ conscienciaNegra
  }

  /** is_holiday as a literal `isin` over the years covered by the range. */
  def isHolidayCol(date: Column, startYear: Int, endYear: Int): Column = {
    val dates = (startYear to endYear)
      .flatMap(brHolidays).map(java.sql.Date.valueOf)
    date.isin(dates: _*)
  }

  /** Southern-hemisphere season (ref JS ~line 853): 12/1/2 Summer,
    * 3-5 Autumn, 6-8 Winter, 9-11 Spring.
    */
  def seasonCol(month: Column): Column =
    when(month.isin(12, 1, 2), "Summer")
      .when(month.isin(3, 4, 5), "Autumn")
      .when(month.isin(6, 7, 8), "Winter")
      .otherwise("Spring")
}
