package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * A table sorted by one column skips row groups only for filters on
  * THAT column; filters on a second dimension scan everything. Writing
  * in Z-value order interleaves the bit patterns of several columns'
  * rank buckets, so each output file covers a small hyper-rectangle of
  * the key space — parquet min/max footer stats become selective for
  * EVERY clustered column at once, and ordinary predicate pushdown
  * (no new reader code) skips most files for a filter on any of them.
  * This is the standard lakehouse OPTIMIZE ZORDER BY layout, built
  * from public Spark primitives: approx quantile ranks → bit
  * interleave expression (codegen'd) → repartitionByRange + sort.
  *
  * Ranks come from `approxQuantile` cut points (one cheap pass over
  * the clustered columns), so skew cannot starve the bucket grid: each
  * rank bucket holds ~1/B of the rows regardless of value
  * distribution.
  */
object ZOrder {

  /** Bits per dimension. 8 bits = 256 rank buckets per dimension —
    * plenty of grid resolution for any realistic file count (a file
    * covers ≥ 1/256 of each dimension only beyond 256^nDims files),
    * while keeping the cut-point array the bucket expression folds
    * over small (255 literals; 2^16 buckets made the projection and
    * the quantile pass dominate the whole write).
    */
  private def bitsPerDim(nDims: Int): Int = math.min(8, 63 / math.max(nDims, 1))

  /** Rank-bucket expression: value → [0, 2^bits) via the column's
    * approximate quantile cut points (computed by [[zvalue]]).
    */
  private def bucketExpr(c: Column, cuts: Array[Double], bits: Int): Column = {
    // binary-search the cut points declaratively: a width_bucket over
    // an UNEVEN grid is a chained `when`, but B cut points as a chain
    // is O(B) comparisons per row — use array + filter instead:
    // bucket = #cuts below value (codegen'd aggregate over a small
    // array literal).
    val arr = array(cuts.map(lit(_)): _*)
    val cnt = aggregate(arr, lit(0),
      (acc, cut) => acc + when(c.cast("double") >= cut, 1).otherwise(0))
    least(cnt, lit((1 << bits) - 1)).cast("long")
  }

  /** The dimension's numeric ranking expression. Numerics rank
    * directly; dates/timestamps through their epoch value (range
    * locality preserved); strings through xxhash64 — lexicographic
    * locality is NOT preserved, but equal values cluster into the same
    * files, so footer min/max on the string column still prunes
    * equality filters. Anything else fails loudly — a silent cast to
    * null would quietly disable clustering for that dimension.
    */
  private def rankExpr(df: DataFrame, c: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(df.schema.fieldIndex(c)).dataType match {
      case _: NumericType => col(c).cast("double")
      case DateType => col(c).cast("timestamp").cast("double")
      case _: TimestampType | _: TimestampNTZType => col(c).cast("double")
      case BooleanType => col(c).cast("int").cast("double")
      case StringType => xxhash64(col(c)).cast("double")
      case other => throw new IllegalArgumentException(
        s"cannot z-order on column '$c' of type $other")
    }
  }

  /** The Z-value column for `cols` over `df`'s value distribution.
    * One `approxQuantile` pass computes the rank grids; the returned
    * expression is a pure codegen'd projection (bit interleave).
    */
  def zvalue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty, "zorder needs at least one column")
    val bits = bitsPerDim(cols.length)
    val nCuts = (1 << bits) - 1
    // evenly spaced quantiles; relativeError trades the extra scan cost
    // against grid skew — 1/(4*nCuts) keeps buckets within ~25% of even
    val probs = (1 to nCuts).map(_.toDouble / (nCuts + 1)).toArray
    val castCols = cols.map(c => rankExpr(df, c).as(c))
    val cutsPerCol = df.select(castCols: _*).stat
      .approxQuantile(cols.toArray, probs, 1.0 / (4.0 * nCuts))
    val buckets = cols.zip(cutsPerCol).map { case (c, cuts) =>
      bucketExpr(rankExpr(df, c), cuts.distinct.sorted, bits)
    }
    // interleave: bit i of dimension d lands at position i*nDims + d
    val n = cols.length
    val terms = for {
      d <- 0 until n
      i <- 0 until bits
    } yield shiftleft(shiftright(buckets(d), i).bitwiseAND(lit(1L)), i * n + d)
    terms.reduce(_.bitwiseOR(_)).as("__zvalue")
  }

  /** Repartition + sort `df` into Z-value order over `cols` with
    * `numFiles` range partitions — ready for a parquet write where
    * every file covers a compact hyper-rectangle of the clustered
    * key space.
    *
    * Cost shape: one approxQuantile pass (rank grids), one
    * repartitionByRange sampling pass (z-value boundaries — sampled,
    * not a full scan), then the shuffle+write. Contiguous z-ranges
    * per file are what keep every file a compact hyper-rectangle;
    * hash-assigning precomputed z-blocks would save the sampling pass
    * but scatter distant blocks into the same file, widening its
    * min/max span.
    */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int,
              within: Seq[String] = Nil): DataFrame = {
    // `within` = directory-partition columns: range-partitioning on
    // (partition cols, zvalue) keeps each task inside few partition
    // values with a contiguous z-range — one clustered file per
    // (task, partition) instead of the zorderFiles × |partitions|
    // explosion that z-only ranges would hand the dynamic-partition
    // writer.
    val keys = within.map(col) :+ col("__zvalue")
    df.withColumn("__zvalue", zvalue(df, cols))
      .repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .drop("__zvalue")
  }
}
