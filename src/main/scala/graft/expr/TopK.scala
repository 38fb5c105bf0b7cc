package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a binary min-heap of (score, id) with the WORST
  * entry at the root, so insertion beyond k is replace-root + sift-down.
  * Ordering: higher score wins; ties broken by smaller id (deterministic
  * under any merge order / task retry).
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  // Rank comparison, matching Spark's SQL double ordering: NaN greater
  // than everything (java.lang.Double.compare totally orders NaN — a
  // plain `<`/`==` returns false both ways on NaN, so the id tie-break
  // would never fire among NaN-scored candidates and the retained set at
  // the k boundary would depend on encounter/retry order), ±0.0 equal
  // (normalized before compare; Double.compare alone puts -0.0 < 0.0,
  // which would split a tie Spark's window ordering treats as equal).
  // Returns <0 / 0 / >0 for (s1,i1) ranking better / equal / worse.
  @inline private def cmp(s1: Double, i1: Long, s2: Double, i2: Long): Int = {
    val a = if (s1 == 0.0) 0.0 else s1
    val b = if (s2 == 0.0) 0.0 else s2
    val c = java.lang.Double.compare(b, a) // desc: higher score ranks first
    if (c != 0) c else java.lang.Long.compare(i1, i2) // ties: smaller id
  }

  // a is worse than b ⇔ a loses the top-k comparison
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    cmp(s1, i1, s2, i2) > 0

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(scores(i), ids(i), scores(p), ids(p))) {
        val ts = scores(i); scores(i) = scores(p); scores(p) = ts
        val ti = ids(i); ids(i) = ids(p); ids(p) = ti
        i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i // worst of (i, l, r)
      if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) return
      val ts = scores(i); scores(i) = scores(w); scores(w) = ts
      val ti = ids(i); ids(i) = ids(w); ids(w) = ti
      i = w
    }
  }

  def add(score: Double, id: Long): Unit =
    if (n < k) {
      scores(n) = score; ids(n) = id; n += 1; siftUp(n - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id; siftDown()
    }

  /** Entries sorted best-first — the SAME total order as `worse()` (via
    * shared `cmp`), so retention and output ordering can never disagree on
    * NaN/±0.0 edge cases.
    */
  def sorted: Array[(Double, Long)] =
    (0 until n).map(i => (scores(i), ids(i))).toArray
      .sorted(new Ordering[(Double, Long)] {
        def compare(a: (Double, Long), b: (Double, Long)): Int =
          cmp(a._1, a._2, b._1, b._2)
      })
}

/** `topk_by_score(score, id, k)` — aggregate to the k (score desc, id asc)
  * best (id, score) pairs as `array<struct<id:bigint, score:double>>`.
  *
  * THE scale shape for per-query ANN top-k: a window
  * `row_number() over (partition by query_id)` ships EVERY scored candidate
  * to one reducer per query; this aggregate's partial buffers hold at most
  * k entries, so the map side reduces each task's candidates to k before
  * the exchange and the reducer merges #tasks × k tiny buffers. Shuffle
  * bytes: O(queries × tasks × k) instead of O(all candidates).
  * (SURVEY.md §2.13 top-k; same role as the collector's bounded batch
  * buffers — fixed-size state regardless of input volume.)
  */
case class TopKByScore(
    left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0, s"topk_by_score: k must be positive, got $k")

  override def prettyName: String = "topk_by_score"
  private def score: Expression = left
  private def id: Expression = right

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (score.dataType != DoubleType) TypeCheckFailure("score must be DOUBLE")
    else if (id.dataType != LongType) TypeCheckFailure("id must be BIGINT")
    else TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.n) { buf.add(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](i, s))
    })

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { val s = bb.getDouble(); val id = bb.getLong(); buf.add(s, id); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(left = newLeft, right = newRight)
}

object TopKByScore {
  /** Column-API entry point. */
  def topk_by_score(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(TopKByScore(GraftBridge.expression(score),
      GraftBridge.expression(id), k).toAggregateExpression())
  }
}
