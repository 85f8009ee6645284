package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k accumulator: one (score, id) candidate per input row,
  * k best kept per group under the total order (score DESC, id ASC).
  *
  * Why an aggregate and not `row_number().over(Window) <= k`: the window
  * form shuffles and sorts the ENTIRE scored stream — for a brute-force
  * similarity join that is the full O(n²) pair stream through one exchange.
  * This aggregate partial-aggregates map-side like any hash aggregate, so
  * each map partition contributes at most k rows per group to the shuffle:
  * at 1000 executors the exchange carries ~k·partitions rows per group
  * instead of the pair stream. Same rows out, same order, ~none of the
  * shuffle.
  *
  * The order is total (id breaks score ties), so results are deterministic
  * and identical to the window formulation the oracle mirrors.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(score, id, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: score must be double, got ${score.dataType.sql}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: id must be bigint, got ${id.dataType.sql}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType || k <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be a positive int literal")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "top_k_pairs"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.foreach((s, i) => buf.offer(s, i))
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sortedDescending.map { case (s, i) =>
      InternalRow(s, i)
    })

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) { buf.offer(in.readDouble(), in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}

/** Bounded min-heap on the total order (score DESC, id ASC): the root is
  * the WORST kept entry, evicted when a better candidate arrives. Flat
  * primitive arrays — no boxing on the hot path.
  */
final class TopKBuffer(k: Int) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  def size: Int = n

  /** a=(s1,i1) is worse than b=(s2,i2) under (score DESC, id ASC).
    * Score comparison matches Spark's double ORDER BY exactly
    * (SQLOrderingUtil.compareDoubles, SPARK-32110): -0.0 and 0.0 compare
    * EQUAL (raw Double.compare would order -0.0 < 0.0) and fall through to
    * the id tiebreak, while NaN still sorts as the greatest score — so the
    * kept rows are identical to the row_number window formulation.
    */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = if (s1 == s2) 0 else java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }

  def offer(s: Double, i: Long): Unit = {
    if (n < k) {
      scores(n) = s; ids(n) = i; n += 1
      siftUp(n - 1)
    } else if (worse(scores(0), ids(0), s, i)) {
      scores(0) = s; ids(0) = i
      siftDown(0)
    }
  }

  private def siftUp(start: Int): Unit = {
    var c = start
    while (c > 0) {
      val p = (c - 1) >> 1
      if (worse(scores(c), ids(c), scores(p), ids(p))) { swap(c, p); c = p }
      else return
    }
  }

  private def siftDown(start: Int): Unit = {
    var p = start
    while (true) {
      val l = 2 * p + 1
      val r = l + 1
      var w = p // index of worst among p and children
      if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == p) return
      swap(p, w)
      p = w
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def foreach(f: (Double, Long) => Unit): Unit = {
    var j = 0
    while (j < n) { f(scores(j), ids(j)); j += 1 }
  }

  /** Entries best-first: (score DESC, id ASC); ±0.0 tie like [[worse]]. */
  def sortedDescending: Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](n)
    var j = 0
    while (j < n) { out(j) = (scores(j), ids(j)); j += 1 }
    out.sortWith { case ((s1, i1), (s2, i2)) =>
      val c = if (s1 == s2) 0 else java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && i1 < i2)
    }
  }
}

object TopKPairs {
  /** `topKPairs(score, id, k)`: array<struct<score,id>> of the k best
    * (score DESC, id ASC) pairs in the group.
    */
  def topKPairs(score: Column, id: Column, k: Int): Column =
    Bridge.toColumn(
      TopKPairs(Bridge.toExpression(score), Bridge.toExpression(id), Literal(k))
        .toAggregateExpression())
}
