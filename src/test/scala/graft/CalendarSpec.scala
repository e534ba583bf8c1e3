package graft

import java.time.{DayOfWeek, LocalDate}

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Calendar

class CalendarSpec extends AnyFunSuite {

  test("computus matches published Easter dates") {
    val known = Map(
      2016 -> "2016-03-27", 2017 -> "2017-04-16", 2018 -> "2018-04-01",
      2019 -> "2019-04-21", 2020 -> "2020-04-12", 2021 -> "2021-04-04",
      2024 -> "2024-03-31", 2025 -> "2025-04-20", 2038 -> "2038-04-25",
      1943 -> "1943-04-25", 2049 -> "2049-04-18")
    known.foreach { case (y, d) =>
      assert(Calendar.easterSunday(y) == LocalDate.parse(d), s"year $y")
    }
  }

  test("easter is always a Sunday between Mar 22 and Apr 25") {
    (1900 to 2199).foreach { y =>
      val e = Calendar.easterSunday(y)
      assert(e.getDayOfWeek == DayOfWeek.SUNDAY, s"$y: $e not Sunday")
      assert(!e.isBefore(LocalDate.of(y, 3, 22)) &&
        !e.isAfter(LocalDate.of(y, 4, 25)), s"$y: $e out of range")
    }
  }

  test("holiday set: 9 per year before 2024, 10 from 2024, good friday present") {
    (2016 to 2030).foreach { y =>
      val h = Calendar.brHolidays(y)
      assert(h.size == (if (y >= 2024) 10 else 9), s"year $y: ${h.size}")
      assert(h.contains(Calendar.easterSunday(y).minusDays(2)))
      assert(h.forall(_.getYear == y))
      assert(h.distinct.size == h.size)
    }
  }
}
