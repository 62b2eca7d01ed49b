package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level helpers shared by all operators.
  *
  * Money/rate math is done on exact DECIMAL types so results are
  * bit-deterministic across engines and across shuffle orderings —
  * floating-point sums depend on reduction order, decimals don't.
  * This matters at 100 TB: a re-run or a different partition count
  * must not change a published aggregate.
  */
object ColUtil {

  /** Exact money: source doubles carry 2dp values. */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact rate (discount/tax in [0,1], 2dp). */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))

  /** (1 - rate) kept tight so decimal products never overflow p=38. */
  def oneMinus(r: Column): Column = (lit(1) - rate(r)).cast(DecimalType(4, 2))
  def onePlus(r: Column): Column = (lit(1) + rate(r)).cast(DecimalType(4, 2))

  def dbl(c: Column): Column = c.cast(DoubleType)

  /** yyyymmdd integer date key (reference: complete_dimension_builder.py:82). */
  def dateKey(d: Column): Column =
    (year(d) * 10000 + month(d) * 100 + dayofmonth(d)).cast(LongType)

  /** Deterministic, distributed surrogate key: md5 of the tagged natural
    * key. No global row_number → no single-partition bottleneck at scale;
    * stable across runs/engines (reference uses DB sequences instead:
    * loaders/database_loader.py).
    */
  def surrogate(tag: String, natural: Column): Column =
    md5(concat(lit(tag + ":"), natural.cast(StringType)).cast(BinaryType))

  /** [1..stop] as an int array, EMPTY when stop < 1. Spark's
    * `sequence(1, stop)` generates a DESCENDING [1, 0, …] when
    * stop < 1 (step defaults to -1), which feeds gram/shingle lambdas
    * a 0 index — `slice`/`element_at` then kill the task on any
    * document shorter than the gram width (probed r7.4; the fixture
    * corpora never trip it, a 100 TB corpus with short docs would on
    * the first partition). DuckDB's `range(1, stop+1)` is already
    * empty for stop < 1, so the guarded form is what every gram
    * oracle has been stating all along.
    */
  def posRange(stop: Column): Column =
    when(stop >= 1, sequence(lit(1), stop))
      .otherwise(array().cast(ArrayType(IntegerType)))

  /** ISO day-of-week 1=Mon..7=Sun (Spark dayofweek is 1=Sun..7=Sat). */
  def isoDow(d: Column): Column =
    ((dayofweek(d) + 5) % 7 + 1).cast(LongType)

  /** English day/month names via CASE (locale-independent, oracle-parity). */
  def dowName(iso: Column): Column = {
    val names = Seq("Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday")
    names.zipWithIndex.foldLeft(lit(null).cast(StringType)) { case (acc, (n, i)) =>
      when(iso === (i + 1), n).otherwise(acc)
    }
  }
  def monthName(m: Column): Column = {
    val names = Seq("January", "February", "March", "April", "May", "June",
      "July", "August", "September", "October", "November", "December")
    names.zipWithIndex.foldLeft(lit(null).cast(StringType)) { case (acc, (n, i)) =>
      when(m === (i + 1), n).otherwise(acc)
    }
  }
}
