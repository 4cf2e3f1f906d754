package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.{Column, GraftColumnBridge => B}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Deterministic mergeable quantile sketch — the custom-AGGREGATE tier
  * of the native extension surface (SURVEY §2 row 28 covers scalar
  * Expressions; this is the `TypedImperativeAggregate` counterpart,
  * the mechanism behind Spark's own approx_percentile).
  *
  * The sketch is the DDSketch idea (Masson et al., VLDB 2019) with
  * IEEE-754 buckets: a positive double maps to its biased exponent
  * plus the top `MantissaBits` mantissa bits — i.e. log-spaced buckets
  * with relative width 2^-MantissaBits — extracted by ONE shift of the
  * raw bit pattern (no transcendentals, no branches). Negatives mirror
  * below -1-id (the positive-double bit pattern is order-preserving,
  * so bucket ids sort exactly like values). The buffer is a sparse
  * (bucket → count) map.
  *
  * Properties that matter at 100 TB:
  *  - MERGEABLE: merge = counter addition, so partial aggregation
  *    works and the shuffle carries one small map per group;
  *  - DETERMINISTIC: bucket ids are pure bit arithmetic and merges
  *    commute, so the result is identical across partitionings, task
  *    orders, and retries — unlike rank-based sketches (t-digest, GK)
  *    whose results depend on merge order;
  *  - BOUNDED ERROR: the returned quantile is its bucket's lower
  *    bound, within relative 2^-MantissaBits (= 1/128 < 1%) of the
  *    true element for normal doubles;
  *  - BOUNDED SIZE: ≤ one entry per occupied bucket, ≤ a few thousand
  *    for any physically plausible value range.
  */
case class QuantileSketch(
    child: Expression,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    "quantiles must be in [0, 1]")
  // numeric inputs are cast to double at construction
  // ([[QuantileSketch.of]]); AbstractDataType (the ImplicitCastInputTypes
  // contract) is private[sql] in Spark 4, so the cast happens here
  require(child.dataType == DoubleType, s"expected double input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "graft_quantile_sketch"

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      if (!x.isNaN) {
        val id = QuantileSketch.bucketOf(x)
        buf.update(id, buf.getOrElse(id, 0L) + 1L)
      }
    }
    buf
  }

  override def merge(a: mutable.LongMap[Long], b: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    b.foreach { case (id, c) => a.update(id, a.getOrElse(id, 0L) + c) }
    a
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val total = buf.values.sum
    if (total == 0L) return null
    val sorted = buf.toArray.sortBy(_._1)
    // "lower" interpolation: the element at 0-based rank floor(q·(N−1))
    val out = qs.map { q =>
      val target = math.floor(q * (total - 1)).toLong
      var cum = 0L
      var i = 0
      while (cum + sorted(i)._2 <= target) { cum += sorted(i)._2; i += 1 }
      QuantileSketch.valueOf(sorted(i)._1)
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (k, v) => bb.putLong(k); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { m.update(bb.getLong, bb.getLong); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketch =
    copy(child = newChildren.head)
}

object QuantileSketch {
  /** Log-bucket resolution: relative bucket width 2^-7 = 1/128. */
  val MantissaBits: Int = 7

  /** Construct over any numeric child: non-double inputs get an
    * explicit cast (the stand-in for ImplicitCastInputTypes, whose
    * AbstractDataType signature is private[sql] in Spark 4).
    */
  def of(child: Expression, qs: Seq[Double]): QuantileSketch =
    QuantileSketch(
      if (child.dataType == DoubleType) child else Cast(child, DoubleType), qs)

  /** value → orderable bucket id: biased exponent and top mantissa
    * bits of the magnitude, mirrored below -1-id for negatives. Pure
    * bit arithmetic, monotone in the value. (+0.0 → id 0; -0.0 → -1.)
    */
  def bucketOf(x: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(x)
    val pos = (bits & Long.MaxValue) >>> (52 - MantissaBits)
    if (bits >= 0) pos else -1L - pos
  }

  /** bucket id → the bucket's bound nearest zero (so the estimate's
    * magnitude never exceeds the true element's): reconstruct the
    * double whose exponent/mantissa-prefix the id encodes.
    */
  def valueOf(id: Long): Double = {
    val pos = if (id < 0) -1L - id else id
    val v = java.lang.Double.longBitsToDouble(pos << (52 - MantissaBits))
    if (id < 0) -v else v
  }
}

/** Misra-Gries frequent-items summary — the heavy-hitters aggregate of
  * the native tier (the mechanism behind every engine's `frequent
  * items` / topK sketch; Misra & Gries 1982, merge rule from Agarwal
  * et al., "Mergeable Summaries", PODS 2012).
  *
  * The buffer is ≤ k (item → counter) entries. Update: increment a
  * present item; insert at 1 if there is room; otherwise decrement ALL
  * counters by one and drop zeros (each such step retires k+1 units of
  * stream mass, which is where the error bound comes from). Merge:
  * add counters, then subtract the (k+1)-th largest counter value from
  * every entry and drop non-positives — at most k survive, and the
  * subtracted value is exactly the mass the bound charges.
  *
  * Guarantees, under ANY merge order / partitioning / retry:
  *  - UNDERCOUNT ONLY: est(x) ≤ true(x);
  *  - BOUNDED ERROR:   true(x) − est(x) ≤ N/(k+1);
  *  - GUARANTEED PRESENCE: every x with true(x) > N/(k+1) is in the
  *    summary (its estimate is positive by the two bounds above).
  * The estimates themselves may differ across merge orders (unlike
  * [[QuantileSketch]] this sketch is not value-deterministic) — so
  * catalog queries emit the theorem-guaranteed BOOLEAN verdicts next
  * to exact counts, which are deterministic in every engine, and the
  * shuffle carries one ≤ k-entry map per group either way.
  */
case class FreqSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, "k must be positive")

  private val entryType = new org.apache.spark.sql.types.StructType()
    .add("term", org.apache.spark.sql.types.StringType, nullable = false)
    .add("est", org.apache.spark.sql.types.LongType, nullable = false)
  override def dataType: DataType = ArrayType(entryType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "graft_freq_sketch"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1L)
        case None if buf.size < k => buf.update(s, 1L)
        case None => // Misra-Gries step: charge one unit to everyone
          val dead = new mutable.ArrayBuffer[String](4)
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.foreach { case (t, c) => if (c <= 0L) dead += t }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest counter value; ≤ k survive
      val vals = a.values.toArray
      java.util.Arrays.sort(vals)
      val sub = vals(vals.length - (k + 1))
      val dead = new mutable.ArrayBuffer[String](a.size - k)
      a.mapValuesInPlace((_, c) => c - sub)
      a.foreach { case (t, c) => if (c <= 0L) dead += t }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic emission order for a given buffer: est desc, term
    val rows = buf.toArray.sortBy { case (t, c) => (-c, t) }.map { case (t, c) =>
      InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(t), c)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  // length-prefixed raw UTF-8, NOT writeUTF: modified-UTF-8 caps a
  // string at 65535 encoded bytes and throws past it — a single
  // unbroken >64 KB token (base64 blob, crawler URL) must not crash
  // the aggregation that exists to summarize exactly such data
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      m.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(child = newChildren.head)
}

object FreqSketch {
  /** Construct over any child: non-string inputs get an explicit cast
    * (the [[QuantileSketch.of]] convention — unresolved Column-API
    * attributes report NullType until analysis, so the cast also
    * carries the declared type through construction).
    */
  def of(child: Expression, k: Int): FreqSketch =
    FreqSketch(
      if (child.dataType == org.apache.spark.sql.types.StringType) child
      else Cast(child, org.apache.spark.sql.types.StringType), k)
}

/** Second-moment aggregate over fixed-dimension integer vectors: ONE
  * compiled pass accumulates the dim×dim product matrix Σxxᵀ, the
  * per-dim sums Σx and the row count into a single flat buffer —
  * the state behind the PCA scatter M = n·Σxxᵀ − SSᵀ.
  *
  * Why native: the HOF form (inline/flatten/transform building dim²
  * structs per row) is interpreted and allocates dim² boxed structs
  * per row — measured 2.7× slower at sf0.1 than the self-join it
  * replaced; this loop is allocation-free. Mergeable (elementwise
  * add) → partial aggregation; the exchange carries ONE
  * (dim²+dim+1)-long buffer per partition — no corpus shuffle, the
  * map-side promise kept. Deterministic: integer adds commute.
  *
  * Output layout: array<long> of length dim²+dim+1 —
  * [g(0,0)…g(dim-1,dim-1) row-major, s(0)…s(dim-1), n].
  */
case class VectorScatterAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim >= 1 && dim <= 256, s"unreasonable dim $dim")

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "graft_vector_scatter"

  private val len = dim * dim + dim + 1

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      // a malformed embedding must FAIL the job, not skew the scatter
      // silently: a short/long vector would zero-pad/truncate, and a
      // null element reads undefined bytes through getLong
      if (a.numElements() != dim)
        throw new IllegalArgumentException(
          s"graft_vector_scatter: expected $dim-dim vector, got ${a.numElements()}")
      var j = 0
      while (j < dim) {
        if (a.isNullAt(j))
          throw new IllegalArgumentException(
            s"graft_vector_scatter: null element at dim $j")
        val xj = a.getLong(j)
        val base = j * dim
        var k = 0
        while (k < dim) {
          buf(base + k) += xj * a.getLong(k)
          k += 1
        }
        buf(dim * dim + j) += xj
        j += 1
      }
      buf(len - 1) += 1L
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * len)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](len)
    var i = 0
    while (i < len) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorScatterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorScatterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorScatterAgg =
    copy(child = newChildren.head)
}

/** Column-API entry points for the sketch aggregates. */
object Sketches {
  /** Quantile estimates at `qs` from one deterministic mergeable
    * sketch pass — see [[QuantileSketch]].
    */
  def quantileSketch(c: Column, qs: Seq[Double]): Column =
    B.column(QuantileSketch.of(B.expression(c), qs).toAggregateExpression())

  /** ≤ k frequent-item candidates as array<struct<term, est>> — see
    * [[FreqSketch]] for the three merge-order-independent guarantees.
    */
  def freqSketch(c: Column, k: Int): Column =
    B.column(FreqSketch.of(B.expression(c), k).toAggregateExpression())

  /** Flat [Σxxᵀ row-major, Σx, n] scatter buffer over a fixed-dim
    * long-array column in one compiled mergeable pass — see
    * [[VectorScatterAgg]].
    */
  def vectorScatter(c: Column, dim: Int): Column =
    B.column(VectorScatterAgg(B.expression(c), dim).toAggregateExpression())
}
