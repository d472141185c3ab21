package graft.store

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Dictionary encoding — rebuild of the reference's term/predicate
  * bimaps (reference: src/datastore/graph.rs:23-35, built in
  * src/rdf/parser.rs:22-87). The mutable BiBTreeMap becomes a derived
  * dimension DataFrame `(…term cols…, id)`; reverse lookup is a join
  * the other way. Tombstones/`dict_max` disappear: ids are derived from
  * the live data, never mutated in place.
  *
  * Ids are DENSE and DETERMINISTIC (sorted order → 0..n-1): the rows
  * are range-sorted and then indexed with `zipWithIndex`, which is a
  * two-pass distributed operation (count per partition, then offset) —
  * no single-partition bottleneck, unlike a global row_number() window.
  * This determinism is what lets the DuckDB oracle reproduce the ids.
  */
object Dict {

  /** Append a dense `startAt..startAt+n-1` long index column in the
    * given sort order: range-sort + zipWithIndex (count per partition,
    * then offset) — the distributed dense-numbering shape, shared by
    * dictionary encoding and any op needing global positions. */
  def denseIndex(df: DataFrame, sortCols: Seq[String], idxCol: String,
      startAt: Long = 0L): DataFrame = {
    val sorted = df.orderBy(sortCols.map(df(_)): _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(idxCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (startAt + idx))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Assign dense ids 0..n-1 to the distinct rows of `df`, ordered by
    * the given sort columns. Output schema: df.schema + (id: long). */
  def encode(df: DataFrame, sortCols: Seq[String]): DataFrame =
    denseIndex(df.distinct(), sortCols, "id")
}
