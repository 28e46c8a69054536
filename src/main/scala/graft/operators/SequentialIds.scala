package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Deterministic sequential id assignment — the Spark re-expression of
  * the reference's single-threaded id generator (`_id_gen`,
  * changegen/generator.py:161-166: sequential ids from `id_offset`,
  * optionally descending for negative-id workflows).
  *
  * A global counter is inherently serial; the distributed equivalent is
  * a total order on a (unique) sort key. Implementation: range-partition
  * by the key, sort within partitions, then add per-partition offsets
  * computed from partition sizes (one lightweight count job — the
  * classic zipWithIndex contract). No single-partition window, no
  * driver-side loop: scales to arbitrary row counts.
  */
object SequentialIds {

  /** Assign `idCol` = offset + rank (or offset - rank when `negative`),
    * rank starting at 0 in ascending order of `orderCol` (must be
    * unique for determinism).
    */
  def assign(df: DataFrame, orderCol: String, idCol: String, offset: Long, negative: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(df.rdd.getNumPartitions, 1)
    val sorted = df.repartitionByRange(parts, col(orderCol)).sortWithinPartitions(orderCol)
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      val id = if (negative) offset - i else offset + i
      Row.fromSeq(row.toSeq :+ id)
    }
    val schema = StructType(sorted.schema.fields :+ StructField(idCol, LongType, nullable = false))
    spark.createDataFrame(indexed, schema)
  }
}
