package graft

import org.apache.spark.sql.functions._
import graft.ops.{Transforms => T}

/** Edge cases from SURVEY §1.4/§1.5 (null convention, domain guards,
  * epoch-millis dates, float-leak precinct).
  */
class TransformsSpec extends SparkSuite {
  import spark.implicits._

  test("normalizeColumnCase renames upper→lower only when lower absent") {
    val df = Seq((1, "x")).toDF("ARREST_KEY", "other")
    assert(T.normalizeColumnCase(df).columns.toSeq == Seq("arrest_key", "other"))
    val both = Seq((1, 2)).toDF("KEY", "key")
    assert(T.normalizeColumnCase(both).columns.toSeq == Seq("KEY", "key"))
  }

  test("lawCategoryGuard: F/M/V/I pass (uppercased), everything else → U") {
    val df = Seq("F", "f", "M", "V", "I", "NONE", "", "9", null)
      .toDF("c").select(T.lawCategoryGuard($"c").as("r"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("F", "F", "M", "V", "I", "U", "U", "U", "U"))
  }

  test("sexGuard: M/F pass, else U") {
    val df = Seq("m", "F", "U", "Z", null).toDF("c").select(T.sexGuard($"c").as("r"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("M", "F", "U", "U", "U"))
  }

  test("mapWithPassthrough: borough codes map, unmapped pass through") {
    val df = Seq("B", "K", "M", "Q", "S", "X", null).toDF("c")
      .select(T.mapWithPassthrough($"c", T.BoroughMap).as("r"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("Bronx", "Brooklyn", "Manhattan", "Queens", "Staten Island", "X", null))
  }

  test("dateOrEpochMillis: ISO dates, epoch millis (string), junk → null") {
    val df = Seq("2023-01-02", "1672617600000", "not-a-date", null).toDF("c")
      .select(date_format(T.dateOrEpochMillis($"c"), "yyyy-MM-dd").as("r"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("2023-01-02", "2023-01-02", null, null))
  }

  test("lenientInt fixes the float-leak quirk: '73.0' → 73, junk → null") {
    val df = Seq("73", "73.0", "abc", null).toDF("c").select(T.lenientInt($"c").as("r"))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(73), Some(73), None, None))
  }

  test("filterNonBlank drops whitespace-only keys") {
    val df = Seq(("a", "ok"), ("  ", "blank"), ("", "empty")).toDF("k", "v")
    assert(T.filterNonBlank(df, Seq("k")).collect().map(_.getString(1)).toSeq == Seq("ok"))
  }

  test("projectReorder fills absent columns and fixes order") {
    val df = Seq((1, "a")).toDF("b", "a")
    val out = T.projectReorder(df, Seq("a", "b", "c"), lit(""))
    assert(out.columns.toSeq == Seq("a", "b", "c"))
    assert(out.collect().head.toSeq == Seq("a", 1, ""))
  }
}
