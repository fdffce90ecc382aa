package graft.fuzzy

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Fixed-capacity binary heap of (score, id) pairs keeping the k BEST under
  * the total order (score desc, id asc) — the aggregation buffer of
  * [[BoundedTopK]]. The root is the WORST kept entry, so insertion beyond
  * capacity is an O(log k) evict-or-drop and memory is hard-capped at
  * `k * 16` bytes regardless of input volume.
  *
  * Backing arrays GROW LAZILY (start at 8, double up to k): memory per
  * group is proportional to the entries actually held, not to k. With a
  * large k (e.g. the LSH candidate top-N, k=500) an eager 8 KB per group
  * multiplied by millions of groups held concurrently in an
  * ObjectHashAggregate map was a measured executor OOM at the sf1 tier —
  * most groups hold a handful of candidates and now pay tens of bytes.
  *
  * The (score, id) comparator is a strict total order over distinct ids, so
  * the surviving set — and the sorted order [[BoundedTopK.eval]] emits — is
  * independent of insertion and merge order: partial aggregation cannot
  * change the answer.
  */
final class TopKHeap(val k: Int) {
  var size: Int = 0
  var scores: Array[Double] = new Array[Double](math.min(k, 8))
  var ids: Array[Long] = new Array[Long](math.min(k, 8))

  private def grow(): Unit = {
    val cap = math.min(k, math.max(scores.length * 2, 8))
    scores = java.util.Arrays.copyOf(scores, cap)
    ids = java.util.Arrays.copyOf(ids, cap)
  }

  // "entry i is worse than entry j" under (score desc, id asc) ranking
  @inline private def worse(si: Double, ii: Long, sj: Double, ij: Long): Boolean =
    si < sj || (si == sj && ii > ij)

  @inline private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  def insert(s: Double, id: Long): Unit = {
    if (size < k) {
      if (size == scores.length) grow()
      var i = size
      scores(i) = s; ids(i) = id; size += 1
      var cont = true
      while (cont && i > 0) {
        val p = (i - 1) >> 1
        if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
        else cont = false
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0
      var cont = true
      while (cont) {
        val l = 2 * i + 1
        val r = l + 1
        var w = i
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) cont = false else { swap(i, w); i = w }
      }
    }
  }
}

/** Map-side-combining bounded top-k aggregate: per group, keep the k pairs
  * with the highest `score` (ties broken by lowest `id`) and emit them
  * best-first as `array<struct<id: bigint, score: double>>`.
  *
  * This is the scale-safe replacement for the
  * `Window.partitionBy(group).orderBy(score desc)` + `row_number <= k`
  * ranking idiom: a window must SHUFFLE AND SORT every scored candidate
  * (at sf10 ANN volumes, ~5e8 rows through one exchange — the measured 19×
  * super-linear row in SCALE.md), whereas a TypedImperativeAggregate runs
  * partial aggregation before the exchange, capping shuffle volume at
  * `groups × mapPartitions × k` fixed-size buffers and the reduce side at
  * an O(n log k) heap merge with no sort.
  */
case class BoundedTopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {

  require(k >= 1, s"topk_pairs needs k >= 1 (got $k)")

  override def left: Expression = score
  override def right: Expression = id
  override def prettyName: String = "topk_pairs"
  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_pairs requires (double, bigint) children, got ($s, $i)")
    }

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    // NaN is outside the heap's (score desc, id asc) total order — every
    // `worse` comparison on it is false, so one NaN at the root would block
    // all later inserts for the group. Null and NaN scores are both
    // un-rankable: drop the row, never the group.
    if (s != null && i != null && !s.asInstanceOf[Double].isNaN)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) { buf.insert(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKHeap): Any = {
    val idx = Array.range(0, buf.size).sortWith { (a, b) =>
      buf.scores(a) > buf.scores(b) ||
        (buf.scores(a) == buf.scores(b) && buf.ids(a) < buf.ids(b))
    }
    new GenericArrayData(idx.map { j =>
      new GenericInternalRow(Array[Any](buf.ids(j), buf.scores(j))): Any
    })
  }

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 16)
    bb.putInt(buf.k)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val h = new TopKHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { val s = bb.getDouble(); val d = bb.getLong(); h.insert(s, d); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(score = l, id = r)
}
