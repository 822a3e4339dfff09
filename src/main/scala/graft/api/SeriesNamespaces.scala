package graft.api

import org.apache.spark.sql.types.{DataType, StringType}
import graft.expr.Expr

/** Series-side namespaces (reference: lib/polars/date_time_name_space.rb,
  * string_name_space.rb, list_name_space.rb, cat_name_space.rb,
  * struct_name_space.rb, binary_expr.rb — the reference materializes each of
  * these by dispatching every method through the expression engine,
  * lib/polars/expr_dispatch.rb:10). Same shape here: every op forwards to
  * the Expr namespace through `Series.map`, so the column kernels stay the
  * single implementation and the Series layer adds no compute of its own.
  * Only the documented high-traffic surface is forwarded; anything else is
  * reachable as `s.map(_.dt.<op>)`.
  */
final class SeriesDtNS(private val s: Series) {
  private def m(f: Expr => Expr): Series = s.map(f)
  def year: Series = m(_.dt.year)
  def isoYear: Series = m(_.dt.isoYear)
  def quarter: Series = m(_.dt.quarter)
  def month: Series = m(_.dt.month)
  def week: Series = m(_.dt.week)
  def weekday: Series = m(_.dt.weekday)
  def day: Series = m(_.dt.day)
  def ordinalDay: Series = m(_.dt.ordinalDay)
  def hour: Series = m(_.dt.hour)
  def minute: Series = m(_.dt.minute)
  def second: Series = m(_.dt.second)
  def second(fractional: Boolean): Series = m(_.dt.second(fractional))
  def millisecond: Series = m(_.dt.millisecond)
  def microsecond: Series = m(_.dt.microsecond)
  def nanosecond: Series = m(_.dt.nanosecond)
  def strftime(fmt: String): Series = m(_.dt.strftime(fmt))
  def toString(fmt: String): Series = strftime(fmt)
  def isLeapYear: Series = m(_.dt.isLeapYear)
  def date: Series = m(_.dt.date)
  def epoch(unit: String = "us"): Series = m(_.dt.epoch(unit))
  def timestamp(unit: String = "us"): Series = m(_.dt.timestamp(unit))
  def truncate(every: String): Series = m(_.dt.truncate(every))
  def round(every: String): Series = m(_.dt.round(every))
  def offsetBy(by: String): Series = m(_.dt.offsetBy(by))
  def monthStart: Series = m(_.dt.monthStart)
  def monthEnd: Series = m(_.dt.monthEnd)
  def convertTimeZone(tz: String): Series = m(_.dt.convertTimeZone(tz))
  def replaceTimeZone(tz: String): Series = m(_.dt.replaceTimeZone(tz))
  def totalDays: Series = m(_.dt.totalDays)
  def totalHours: Series = m(_.dt.totalHours)
  def totalMinutes: Series = m(_.dt.totalMinutes)
  def totalSeconds: Series = m(_.dt.totalSeconds)
  def totalMilliseconds: Series = m(_.dt.totalMilliseconds)
  def totalMicroseconds: Series = m(_.dt.totalMicroseconds)
  def totalNanoseconds: Series = m(_.dt.totalNanoseconds)
  // eager scalar forms (date_time_name_space.rb:29-84 min/max return the
  // underlying scalar, not a Series)
  def min: Any = s.min
  def max: Any = s.max
}

final class SeriesStrNS(private val s: Series) {
  private def m(f: Expr => Expr): Series = s.map(f)
  def toUppercase: Series = m(_.str.toUppercase)
  def toLowercase: Series = m(_.str.toLowercase)
  def toTitlecase: Series = m(_.str.toTitlecase)
  def lenChars: Series = m(_.str.lenChars)
  def lenBytes: Series = m(_.str.lenBytes)
  def nChars: Series = lenChars
  def contains(pat: String, literal: Boolean = false): Series =
    m(_.str.contains(pat, literal))
  def startsWith(p: String): Series = m(_.str.startsWith(p))
  def endsWith(p: String): Series = m(_.str.endsWith(p))
  def stripChars: Series = m(_.str.stripChars)
  def stripChars(chars: String): Series = m(_.str.stripChars(chars))
  def stripCharsStart: Series = m(_.str.stripCharsStart)
  def stripCharsEnd: Series = m(_.str.stripCharsEnd)
  def stripPrefix(p: String): Series = m(_.str.stripPrefix(p))
  def stripSuffix(p: String): Series = m(_.str.stripSuffix(p))
  def padStart(n: Int, fill: String = " "): Series = m(_.str.padStart(n, fill))
  def padEnd(n: Int, fill: String = " "): Series = m(_.str.padEnd(n, fill))
  def zfill(n: Int): Series = m(_.str.zfill(n))
  def replace(pat: String, repl: String): Series = m(_.str.replace(pat, repl))
  def replaceAll(pat: String, repl: String): Series = m(_.str.replaceAll(pat, repl))
  def slice(offset: Int, length: Option[Int] = None): Series = m(_.str.slice(offset, length))
  def split(by: String): Series = m(_.str.split(by))
  def extract(pat: String, group: Int = 1): Series = m(_.str.extract(pat, group))
  def extractAll(pat: String): Series = m(_.str.extractAll(pat))
  def countMatches(pat: String): Series = m(_.str.countMatches(pat))
  def jsonPathMatch(path: String): Series = m(_.str.jsonPathMatch(path))
  def decode(encoding: String): Series = m(_.str.decode(encoding))
  def encode(encoding: String): Series = m(_.str.encode(encoding))
  def toDate(format: String = "%Y-%m-%d"): Series = m(_.str.toDate(format))
  def toDatetime(format: String = "%Y-%m-%d %H:%M:%S"): Series = m(_.str.toDatetime(format))
  def reverse: Series = m(_.str.reverse)
  /** Vertical join to one value. The reference example feeds an INT series
    * (string_name_space.rb:244) — its engine stringifies first, so the
    * forwarder casts to str before joining. */
  def join(sep: String = "-", ignoreNulls: Boolean = true): Series =
    m(_.cast(StringType).str.join(sep, ignoreNulls))
  def concat(sep: String = "-", ignoreNulls: Boolean = true): Series =
    join(sep, ignoreNulls)
}

final class SeriesListNS(private val s: Series) {
  private def m(f: Expr => Expr): Series = s.map(f)
  def all: Series = m(_.list.all)
  def any: Series = m(_.list.any)
  def len: Series = m(_.list.len)
  def lengths: Series = len
  def dropNulls: Series = m(_.list.dropNulls)
  def sum: Series = m(_.list.sum)
  def max: Series = m(_.list.max)
  def min: Series = m(_.list.min)
  def mean: Series = m(_.list.mean)
  def sort(descending: Boolean = false): Series = m(_.list.sort(descending))
  def reverse: Series = m(_.list.reverse)
  def unique: Series = m(_.list.unique)
  def get(i: Int): Series = m(_.list.get(i))
  def first: Series = m(_.list.first)
  def last: Series = m(_.list.last)
  def contains(v: Any): Series = m(_.list.contains(v))
  def join(sep: String): Series = m(_.list.join(sep))
  def diff(n: Int = 1): Series = m(_.list.diff(n))
  def shift(n: Int = 1): Series = m(_.list.shift(n))
  def slice(offset: Int, length: Int): Series = m(_.list.slice(offset, length))
  def head(n: Int): Series = m(_.list.head(n))
  def tail(n: Int): Series = m(_.list.tail(n))
  def explode: Series = Series(s.name, s.df.select(
    org.apache.spark.sql.functions.explode_outer(
      org.apache.spark.sql.functions.col(s.name)).as(s.name)))
  def argMin: Series = m(_.list.argMin)
  def argMax: Series = m(_.list.argMax)
  def eval(f: Expr => Expr): Series = m(_.list.eval(f))
}

final class SeriesBinNS(private val s: Series) {
  private def m(f: Expr => Expr): Series = s.map(f)
  def contains(sub: Array[Byte]): Series = m(_.bin.contains(sub))
  def startsWith(p: Array[Byte]): Series = m(_.bin.startsWith(p))
  def endsWith(p: Array[Byte]): Series = m(_.bin.endsWith(p))
  def encode(enc: String): Series = m(_.bin.encode(enc))
  def decode(enc: String): Series = m(_.bin.decode(enc))
  def size: Series = m(_.bin.size)
}

final class SeriesCatNS(private val s: Series) {
  /** cat.get_categories in FIRST-APPEARANCE order (cat_name_space.rb:7
    * golden: [foo, bar, foo, foo, ham] → foo, bar, ham — polars assigns
    * category ids in encounter order, so the listing is row-ordered, which
    * a bare distinct() would scramble). */
  def getCategories: Series = {
    import org.apache.spark.sql.{functions => F}
    val IDX = graft.kernel.RowIndex.name
    val d = graft.kernel.RowIndex.attachDense(s.df)
    Series(s.name, d.filter(F.col(s.name).isNotNull)
      .groupBy(F.col(s.name)).agg(F.min(F.col(IDX)).as("__o__"))
      .orderBy("__o__").select(F.col(s.name)))
  }
  def isLocal: Boolean = true
  def usesLexicalOrdering: Boolean = true
}

final class SeriesStructNS(private val s: Series) {
  private def m(f: Expr => Expr): Series = s.map(f)
  def field(name: String): Series =
    Series(name, s.df.select(org.apache.spark.sql.functions.col(s.name)
      .getField(name).as(name)))
  def jsonEncode: Series = m(_.struct.jsonEncode)
  /** Expand the struct fields into a DataFrame (reference
    * struct_name_space.rb unnest — series.rb rle golden:
    * `s.rle.struct.unnest` renders the len/value table). */
  def unnest: DataFrame = DataFrame(s.toFrame.toSpark).unnest(s.name)
  /** Field names from the schema (struct_name_space.rb fields). */
  def fields: Seq[String] = s.dtype match {
    case st: org.apache.spark.sql.types.StructType => st.fieldNames.toSeq
    case d => throw new IllegalArgumentException(s"struct.fields on non-struct dtype $d")
  }
  def schema: Map[String, DataType] = s.dtype match {
    case st: org.apache.spark.sql.types.StructType =>
      st.fields.map(f => f.name -> f.dataType).toMap
    case d => throw new IllegalArgumentException(s"struct.schema on non-struct dtype $d")
  }
}
