package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra-Gries heavy-hitters summary over LONG keys, capacity `m`:
  * at most m (key → count) entries; when a new key arrives with the
  * summary full, ALL counts decrement by 1 (zeros evicted) and the new
  * key is discarded — each eviction consumes m+1 count units, so after N
  * updates any key's count is an UNDERestimate by at most N/(m+1), and
  * every key with true count > N/(m+1) is guaranteed present (Misra &
  * Gries 1982). Merging follows Agarwal et al. (PODS'12, "Mergeable
  * summaries"): sum counts, then subtract the (m+1)-th largest count from
  * every entry and drop the non-positives — the combined summary keeps
  * the SAME N/(m+1) bound, which is what makes this a valid partial
  * aggregate under Spark's arbitrary partial/merge tree.
  */
final class FreqSketch(val m: Int) {
  val map = new scala.collection.mutable.LongMap[Long](math.min(m * 2, 1 << 16))

  def add(key: Long): Unit = {
    val cur = map.getOrElse(key, 0L) // counts in the map are always ≥ 1
    if (cur > 0L) map.update(key, cur + 1L)
    else if (map.size < m) map.update(key, 1L)
    else decrementAll(1L)
  }

  /** Subtract `d` from every count, evicting non-positives. */
  private def decrementAll(d: Long): Unit = {
    val keys = map.keys.toArray // snapshot: LongMap mutation-during-foreach is undefined
    var i = 0
    while (i < keys.length) {
      val k = keys(i)
      val c = map(k) - d
      if (c > 0) map.update(k, c) else map.remove(k)
      i += 1
    }
  }

  def mergeFrom(other: FreqSketch): Unit = {
    other.map.foreach { case (k, c) =>
      map.update(k, map.getOrElse(k, 0L) + c)
    }
    if (map.size > m) {
      // subtract the (m+1)-th largest count; ≤ m survivors by construction
      val counts = map.values.toArray
      java.util.Arrays.sort(counts)
      decrementAll(counts(counts.length - (m + 1)))
    }
  }

  /** Entries as (key, estimate), estimate desc then key asc — a total
    * order, so output is deterministic under any merge order.
    */
  def sorted: Array[(Long, Long)] =
    map.toArray.sortBy { case (k, c) => (-c, k) }
}

/** `freq_items(key, m)` — aggregate a LONG key column to the Misra-Gries
  * heavy-hitters summary as `array<struct<key:bigint, est:bigint>>`.
  *
  * THE scale shape for corpus-wide frequent-item questions (boilerplate
  * n-grams, hot tool names, dominant error codes): an exact
  * `groupBy(key).count()` shuffles one row per DISTINCT key — at 100 TB
  * the n-gram key space is itself TB-scale — while this aggregate's
  * partial buffers are ≤ m entries per task and the exchange carries
  * #tasks × m rows total, independent of corpus size. The summary is a
  * guaranteed SUPERSET of every key with count > N/(m+1); pair with one
  * exact recount of the ≤ m candidates for provably-exact top-k
  * ([[graft.ops.Curation.topNgramsSketch]]).
  */
case class FreqItems(
    child: Expression, m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch] with UnaryLike[Expression] {

  require(m > 0, s"freq_items: capacity must be positive, got $m")

  override def prettyName: String = "freq_items"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != LongType) TypeCheckFailure("key must be BIGINT")
    else TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): FreqSketch = new FreqSketch(m)

  override def update(buf: FreqSketch, input: InternalRow): FreqSketch = {
    val k = child.eval(input)
    if (k != null) buf.add(k.asInstanceOf[Long])
    buf
  }

  override def merge(buf: FreqSketch, other: FreqSketch): FreqSketch = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: FreqSketch): Any =
    new GenericArrayData(buf.sorted.map { case (k, c) =>
      new GenericInternalRow(Array[Any](k, c))
    })

  override def serialize(buf: FreqSketch): Array[Byte] = {
    val entries = buf.sorted
    val bb = ByteBuffer.allocate(4 + entries.length * 16)
    bb.putInt(entries.length)
    entries.foreach { case (k, c) => bb.putLong(k); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new FreqSketch(m)
    var i = 0
    while (i < n) { buf.map.update(bb.getLong(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqItems =
    copy(child = newChild)
}

object FreqItems {
  /** Column-API entry point. */
  def freq_items(key: Column, capacity: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(FreqItems(GraftBridge.expression(key), capacity)
      .toAggregateExpression())
  }
}
