package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/**
 * Contiguous global ordering without a single-partition window.
 *
 * Spark's `row_number() OVER (ORDER BY …)` with no PARTITION BY moves
 * the whole input to ONE task — the textbook scale-killer for any
 * corpus-sized ranking. The scalable shape is the TeraSort discipline:
 * range-repartition on the sort key (each partition owns a contiguous
 * key range), sort within partitions, then assign indices per
 * partition and add per-partition offsets. `RDD.zipWithIndex` is
 * exactly that two-pass offset scheme (one count job over partition
 * sizes, one map job attaching indices), so ranking cost is two linear
 * passes at any scale and the only full-data shuffle is the range
 * exchange itself.
 */
object Ranks {

  /** Attach a contiguous 0-based global rank in `sortCols` order.
   *  `sortCols` must be a total order (include a unique tiebreaker,
   *  e.g. the row id) or ranks within ties are partition-placement
   *  dependent. The RDD hop deserializes rows once; downstream plans
   *  restart whole-stage codegen from the produced DataFrame.
   */
  def withGlobalRank(
      df: DataFrame,
      rankCol: String,
      sortCols: Seq[Column]): DataFrame = {
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(indexed, schema)
  }
}
