package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.columnar.{CachedBatch, CachedBatchSerializer}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.storage.StorageLevel

/** One cached batch = the raw UnsafeRow images of up to `batchSize`
  * rows. numRows/sizeInBytes feed InMemoryRelation's stats. */
case class RowsCachedBatch(numRows: Int, rows: Array[Array[Byte]],
    sizeInBytes: Long) extends CachedBatch

/** Row-image cache serializer for the [[CorpusPin]] tier
  * (`spark.sql.cache.serializer` — static conf, set by the graft host
  * sessions; the class needs this no-arg constructor).
  *
  * WHY: Spark's default cache serializer builds COLUMNAR batches —
  * per-column encode on build, column-to-row decode per consumer. That
  * is the right trade for long-lived, scan-heavy, memory-pressured
  * caches; it is the wrong one for CorpusPin frames, which live for ONE
  * query, are consumed 2–4 times by row-based operators (joins, hash
  * aggregates), and are often dominated by array<float> embedding
  * columns whose columnar encode is element-wise. Measured on the
  * pinned tier before this class: persist cost 8–35% per query over the
  * raw-block localCheckpoint it replaced (SCALING.md r16). This
  * serializer stores the UnsafeRow byte images verbatim: build is a
  * memcpy per row, read is pointTo (+ an UnsafeProjection only when the
  * consumer prunes columns) — the localCheckpoint cost profile WITH
  * recomputable lineage.
  *
  * Trade declared: no cache-level predicate pruning (buildFilter is
  * identity — pins are full-frame reads by construction) and no
  * columnar output (consumers here are row-based; a vectorized-scan
  * workload should keep the default serializer). */
class RowCacheSerializer extends CachedBatchSerializer {

  override def supportsColumnarInput(schema: Seq[Attribute]): Boolean = false
  override def supportsColumnarOutput(schema: StructType): Boolean = false

  override def convertInternalRowToCachedBatch(input: RDD[InternalRow],
      schema: Seq[Attribute], storageLevel: StorageLevel,
      conf: SQLConf): RDD[CachedBatch] = {
    val batchSize = conf.columnBatchSize
    val types = schema.map(_.dataType).toArray
    input.mapPartitions { it =>
      // codegen hands us a REUSED UnsafeRow buffer — every kept row must
      // be copied into its own byte image; non-unsafe rows (local
      // relations) are converted first
      lazy val toUnsafe = UnsafeProjection.create(types)
      new Iterator[CachedBatch] {
        override def hasNext: Boolean = it.hasNext
        override def next(): CachedBatch = {
          val buf = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
          var bytes = 0L
          while (it.hasNext && buf.length < batchSize) {
            val ur = it.next() match {
              case u: UnsafeRow => u
              case other => toUnsafe(other)
            }
            val img = new Array[Byte](ur.getSizeInBytes)
            ur.writeToMemory(img, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
            buf += img
            bytes += img.length
          }
          RowsCachedBatch(buf.length, buf.toArray, bytes)
        }
      }
    }
  }

  override def convertColumnarBatchToCachedBatch(input: RDD[ColumnarBatch],
      schema: Seq[Attribute], storageLevel: StorageLevel,
      conf: SQLConf): RDD[CachedBatch] =
    throw new IllegalStateException(
      "RowCacheSerializer declares supportsColumnarInput=false")

  override def buildFilter(predicates: Seq[Expression],
      cachedAttributes: Seq[Attribute]):
      (Int, Iterator[CachedBatch]) => Iterator[CachedBatch] =
    (_, it) => it

  override def convertCachedBatchToColumnarBatch(input: RDD[CachedBatch],
      cacheAttributes: Seq[Attribute], selectedAttributes: Seq[Attribute],
      conf: SQLConf): RDD[ColumnarBatch] =
    throw new IllegalStateException(
      "RowCacheSerializer declares supportsColumnarOutput=false")

  override def convertCachedBatchToInternalRow(input: RDD[CachedBatch],
      cacheAttributes: Seq[Attribute], selectedAttributes: Seq[Attribute],
      conf: SQLConf): RDD[InternalRow] = {
    val pruned = selectedAttributes != cacheAttributes
    val nCache = cacheAttributes.length
    input.mapPartitions { batches =>
      val row = new UnsafeRow(nCache)
      val rows: Iterator[InternalRow] = batches.flatMap { b =>
        b.asInstanceOf[RowsCachedBatch].rows.iterator.map { img =>
          row.pointTo(img, img.length)
          row: InternalRow
        }
      }
      if (!pruned) rows
      else {
        val proj = UnsafeProjection.create(selectedAttributes, cacheAttributes)
        rows.map(proj)
      }
    }
  }
}
