package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge => B}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter file-skipping primitives — the data-skipping index
  * tier of the snapshot format (Delta's bloom filter index, Iceberg's
  * bloom column metrics): parquet footer min/max answers RANGE
  * pruning (the Z-order path), the bloom answers POINT lookups on
  * high-cardinality keys that clustering was not spent on.
  *
  * [[BloomAgg]] builds one filter per group (per file, in
  * [[graft.sources.Snapshots.bloomSkipIndex]]) in a single aggregate
  * pass; [[BloomContains]] tests a key against the serialized filter
  * so index *filtering* runs distributed — only matching file paths
  * ever reach the driver.
  *
  * Determinism: bit positions are pure splitmix64 arithmetic
  * (Kirsch–Mitzenmacher double hashing), and merge is bitwise OR —
  * commutative and associative — so the built filter is bit-identical
  * across partitionings, task orders, and retries.
  */
object BloomUtil {
  /** Serialized layout: [numHashes: int][words: long…] big-endian. */
  def mightContain(bytes: Array[Byte], key: Long): Boolean = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val words = (bytes.length - 4) / 8
    val mBits = words.toLong * 64
    val h1 = splitmix(key)
    val h2 = splitmix(key ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, mBits)
      val word = bb.getLong(4 + 8 * (pos >>> 6).toInt)
      if ((word & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def set(words: Array[Long], k: Int, key: Long): Unit = {
    val mBits = words.length.toLong * 64
    val h1 = splitmix(key)
    val h2 = splitmix(key ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, mBits)
      words((pos >>> 6).toInt) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** splitmix64 finalizer — full-avalanche 64-bit mixing. */
  def splitmix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}

/** Per-group bloom filter over a long key column: `numBits` filter
  * bits (rounded up to whole words), `numHashes` probes per key.
  * Mergeable (bitwise OR) → partial aggregation works; the shuffle
  * carries one filter per group, never keys.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && numHashes >= 1, "need >= 64 bits and >= 1 hash")
  require(child.dataType == LongType, s"expected long key, got ${child.dataType}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "graft_bloom"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long]((numBits + 63) / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.set(buf, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.getInt // numHashes is fixed by the expression
    val out = new Array[Long]((bytes.length - 4) / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

/** `mightContain(filterBytes, key)` — codegen'd probe against a
  * serialized [[BloomAgg]] filter. Runs once per index row (one per
  * file), so the index filter is a distributed scan whose output —
  * matching file paths — is the only thing collected.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(bloom: Any, key: Any): Any =
    BloomUtil.mightContain(bloom.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, k) => s"graft.functions.BloomUtil.mightContain($b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points. */
object Bloom {
  /** One bloom filter per group over a (castable-to-)long key. */
  def bloomAgg(key: Column, numBits: Int = 1 << 20, numHashes: Int = 5): Column = {
    val e = B.expression(key)
    val keyL = if (e.dataType == LongType) e else Cast(e, LongType)
    B.column(BloomAgg(keyL, numBits, numHashes).toAggregateExpression())
  }

  def bloomContains(bloom: Column, key: Column): Column =
    B.column(BloomContains(B.expression(bloom), B.expression(key)))
}
