package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge => B}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (SURVEY §3: preference tier (b) —
  * a codegen'd `Expression` beats a Scala UDF). Both participate in
  * whole-stage codegen via a static-helper call, so they run inside
  * the generated loop with no boxing or interpreter dispatch — the
  * hot-path form for 100 TB map work.
  */
object Native {

  /** 60-bit SimHash of whitespace-tokenized text (Charikar 2002):
    * per-token md5-derived 60-bit hashes vote on each bit; the sign of
    * each vote total becomes the bit. 60 bits (not 64) so the value —
    * and every intermediate — stays positive in a signed 64-bit
    * integer, which makes the whole computation reproducible in the
    * DuckDB oracle (md5 hex → integer is exact arithmetic there).
    */
  def simhash60(c: Column): Column = B.column(SimHash60(B.expression(c)))

  /** Sequential-order cosine similarity of two float vectors —
    * deterministic (no parallel-reduction reordering), single pass.
    */
  def cosineF32(a: Column, b: Column): Column =
    B.column(CosineF32(B.expression(a), B.expression(b)))

  /** |A ∩ B| for two SORTED distinct long arrays: merge-intersect,
    * O(|A|+|B|), zero allocation — vs `array_intersect`'s per-call
    * hash-set build. The pairwise-set-similarity hot path.
    */
  def sortedIntersectSize(a: Column, b: Column): Column =
    B.column(SortedIntersectSize(B.expression(a), B.expression(b)))

  /** Sorted distinct md5-derived 60-bit hashes of the word n-grams of
    * a text column, in one pass over the bytes. The composable-HOF
    * equivalent (`transform(sequence(...), i => crc32(concat_ws(
    * element_at(toks, i), ...)))`) re-evaluates the tokenizer per
    * element because common-subexpression elimination does not cross
    * lambda boundaries — O(tokens²) per document. This is the case
    * where a custom Expression is the only efficient form.
    */
  def wordNGramHashes(text: Column, n: Int): Column =
    B.column(WordNGramHashes(B.expression(text), n))

  /** Positional (per-window-start, duplicates kept) word-n-gram h60
    * hashes — the winnow/CDC rung's tokenizer in one compiled pass;
    * <n tokens → empty array. See [[WordNGramPosHashes]].
    */
  def wordNGramPosHashes(text: Column, n: Int): Column =
    B.column(WordNGramPosHashes(B.expression(text), n))

  /** Scalar h60 (first 15 hex chars of md5 as a 60-bit int) computed
    * straight off the digest bytes — see [[Md5Hash60]].
    */
  def h60(text: Column): Column = B.column(Md5Hash60(B.expression(text)))

  /** Sign bits of `planes` deterministic hyperplane dot products over
    * an integer vector, packed into one Long (bit j = plane j). The
    * lambda form (zip_with + aggregate per plane) is interpreted, not
    * codegen'd, and re-walks the vector once per plane through boxed
    * HOF dispatch; this runs all planes in one compiled pass.
    */
  def planeSignBits(q: Column, planes: Int): Column =
    B.column(PlaneSignBits(B.expression(q), planes))

  /** K-row minhash signature of a non-negative hash array:
    * sig[k] = min over h of ((2k+1)·(h mod p) + (k·2654435761 mod p))
    * mod p. One compiled pass over the array for all K rows — the
    * transform(seq, k -> array_min(transform(hs, …))) form evaluates
    * K·|hs| interpreted lambda calls per document, which dominated
    * the dedup bench once the sink stopped pruning the signature.
    */
  def minhashSignature(hashes: Column, k: Int, p: Long): Column =
    B.column(MinhashSignature(B.expression(hashes), k, p))

  /** Σ aᵢ·bᵢ over two long arrays — exact integer arithmetic in one
    * compiled pass. The `zip_with + aggregate` lambda form is
    * interpreted (HOFs never enter codegen) and walks the 64-dim
    * vectors through boxed dispatch per candidate pair — the ANN
    * scoring hot path.
    */
  /** Six Gopher-rule repetition scalars in one compiled pass per
    * document — see [[RepetitionStats]]. */
  def repetitionStats(text: Column): Column =
    B.column(RepetitionStats(B.expression(text)))

  def dotLong(a: Column, b: Column): Column =
    B.column(DotLong(B.expression(a), B.expression(b)))

  /** Σ (scale·aᵢ − bᵢ)² over two long arrays — exact integer
    * arithmetic, one compiled pass. With scale = 1 this is plain
    * squared L2; with scale = n and b = a cluster's component-sum
    * vector it compares a point against an un-divided centroid
    * (n·x − s)², avoiding inexact mean division entirely (divide the
    * final scalar by n² instead — exact in a double up to 2^53).
    */
  def sqDistScaled(a: Column, b: Column, scale: Column): Column =
    B.column(SqDistScaled(B.expression(a), B.expression(b), B.expression(scale)))

  /** Hilbert-curve index of a 2-D point on a 2^bits × 2^bits grid —
    * the higher-locality alternative to the Morton interleave for
    * clustered layouts (adjacent curve positions are always adjacent
    * cells, so range-partition boundaries cut fewer neighborhoods).
    */
  def hilbertIndex(x: Column, y: Column, bits: Int): Column =
    B.column(HilbertIndex(B.expression(x), B.expression(y), bits))
}

/** Engine-portable 60-bit hash: the first 15 hex characters of the
  * md5 digest, parsed as an integer (equivalently: the first 8 digest
  * bytes, big-endian, shifted right by 4). Both Spark and DuckDB
  * expose md5; 60 bits keeps every value — and any affine re-hash of
  * it — positive in signed 64-bit arithmetic, so the DuckDB oracle
  * reproduces it exactly with
  * `list_sum(list_transform(range(0,15), i -> hexdigit * 16^(14-i)))`.
  */
object Md5Hash60Util {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash60(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = digest.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  def hash60(s: UTF8String): Long = {
    val b = s.getBytes
    hash60(b, 0, b.length)
  }
}

/** Scalar h60: the codegen'd form of the SQL chain
  * `cast(conv(substr(md5(x), 1, 15), 16, 10) as bigint)` — identical
  * value (first 15 hex chars of the md5 digest as a 60-bit int), but
  * computed straight off the digest bytes instead of materializing the
  * 32-char hex string, substring-copying it, and re-parsing it through
  * conv's arbitrary-base decimal loop. The checksum/fingerprint map
  * stages are pure per-row work at 100 TB; this removes three string
  * allocations per row from them.
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_h60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash60Util.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash60Util.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object SimHash60Util {

  /** One-pass simhash over UTF-8 bytes; tokens split on ASCII space,
    * hashed with [[Md5Hash60Util]], voting on 60 bits.
    */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val votes = new Array[Int](60)
    var tokStart = -1
    var i = 0
    while (i <= bytes.length) {
      val isSpace = i == bytes.length || bytes(i) == ' '.toByte
      if (isSpace) {
        if (tokStart >= 0) {
          vote(votes, Md5Hash60Util.hash60(bytes, tokStart, i - tokStart))
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (votes(b) >= 0) out |= (1L << b); b += 1 }
    out
  }

  private def vote(votes: Array[Int], h: Long): Unit = {
    var b = 0
    while (b < 60) {
      if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
      b += 1
    }
  }
}

case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimHash60Util.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash60Util.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object WordNGramHashesUtil {

  /** Sorted distinct [[Md5Hash60Util]] hashes of word n-grams (tokens
    * split on runs of ASCII space, joined by a single space). Fewer
    * than n tokens → one hash of all tokens.
    */
  def compute(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = s.getBytes
    // token boundaries
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    var inTok = false
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) {
        if (inTok) { ends.add(i); inTok = false }
      } else if (!inTok) { starts.add(i); inTok = true }
      i += 1
    }
    if (inTok) ends.add(bytes.length)
    val t = starts.size()
    val win = if (t == 0) 0 else math.max(t - n + 1, 1)
    val out = new Array[Long](win)
    var buf = new Array[Byte](64)
    var w = 0
    while (w < win) {
      var blen = 0
      var j = w
      val jEnd = math.min(w + n, t)
      while (j < jEnd) {
        val st = starts.get(j).intValue()
        val e = ends.get(j).intValue()
        val need = blen + (e - st) + 1
        if (need > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
        System.arraycopy(bytes, st, buf, blen, e - st)
        blen += e - st
        if (j < jEnd - 1) { buf(blen) = ' '.toByte; blen += 1 }
        j += 1
      }
      out(w) = Md5Hash60Util.hash60(buf, 0, blen)
      w += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedup
    var m = 0
    var k = 0
    while (k < out.length) {
      if (m == 0 || out(k) != out(m - 1)) { out(m) = out(k); m += 1 }
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, m))
  }
}

object WordNGramPosHashesUtil {

  /** POSITIONAL [[Md5Hash60Util]] hashes of word n-grams (tokens split
    * on runs of ASCII space, joined by a single space): one hash per
    * window start, in token order, duplicates kept. Fewer than n
    * tokens → EMPTY array — this matches the HOF form
    * `if(size(tk) >= n, transform(sequence(1, size(tk)-n+1), …),
    * array())` that the positional dedup rungs (winnow/CDC) were
    * written in, which is a different <n-token convention from
    * [[WordNGramHashesUtil]]'s hash-of-all-tokens.
    */
  def compute(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = s.getBytes
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    var inTok = false
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) {
        if (inTok) { ends.add(i); inTok = false }
      } else if (!inTok) { starts.add(i); inTok = true }
      i += 1
    }
    if (inTok) ends.add(bytes.length)
    val t = starts.size()
    val win = if (t >= n) t - n + 1 else 0
    val out = new Array[Long](win)
    var buf = new Array[Byte](64)
    var w = 0
    while (w < win) {
      var blen = 0
      var j = w
      val jEnd = w + n
      while (j < jEnd) {
        val st = starts.get(j).intValue()
        val e = ends.get(j).intValue()
        val need = blen + (e - st) + 1
        if (need > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
        System.arraycopy(bytes, st, buf, blen, e - st)
        blen += e - st
        if (j < jEnd - 1) { buf(blen) = ' '.toByte; blen += 1 }
        j += 1
      }
      out(w) = Md5Hash60Util.hash60(buf, 0, blen)
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Positional word-n-gram h60 hashes — the winnowing/CDC tokenizer
  * hot path in one compiled pass over the bytes. The HOF form it
  * replaces (`transform(sequence(…), gp -> conv(substr(md5(array_join(
  * slice(tk, gp, n), ' ')), 1, 15), 16, 10))`) re-slices and re-joins
  * the token array per gram through interpreted lambda dispatch and
  * parses a hex string per hash.
  */
// NULL contract (r15 advice, documented): a NULL text yields SQL NULL
// (UnaryExpression null propagation), whereas the HOF chain this
// replaced returned an EMPTY ARRAY for null (size(null) = -1 failed
// its >= n gate). The corpus contract is documents.text IS NOT NULL
// (the generator never emits null text; posexplode drops both shapes
// identically on the winnow path) — a consumer over nullable text
// must coalesce(graft_word_ngrams_pos(...), array()) itself.
case class WordNGramPosHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams_pos"

  override protected def nullSafeEval(input: Any): Any =
    WordNGramPosHashesUtil.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordNGramPosHashesUtil.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNGramPosHashes =
    copy(child = newChild)
}

case class WordNGramHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    WordNGramHashesUtil.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordNGramHashesUtil.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNGramHashes =
    copy(child = newChild)
}

object PlaneSignBitsUtil {
  /** Bit j = 1 iff dot(q, plane_j) >= 0, where plane_j[i] =
    * ((i*(31+2j) + 17j) mod 13) - 6 — the derandomized Charikar
    * construction shared with the DuckDB oracle
    * (operators/Similarity.scala bandBucketSql).
    */
  def compute(q: ArrayData, planes: Int): Long = {
    val n = q.numElements()
    var out = 0L
    var j = 0
    while (j < planes) {
      val a = 31 + 2 * j
      val b = 17 * j
      var dot = 0L
      var i = 0
      while (i < n) {
        dot += q.getLong(i) * (((i * a + b) % 13) - 6)
        i += 1
      }
      if (dot >= 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

case class PlaneSignBits(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_plane_sign_bits"

  override protected def nullSafeEval(input: Any): Any =
    PlaneSignBitsUtil.compute(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PlaneSignBitsUtil.compute($c, $planes)")

  override protected def withNewChildInternal(newChild: Expression): PlaneSignBits =
    copy(child = newChild)
}

object MinhashSignatureUtil {
  /** Empty input mirrors array_min(empty) = null per row (and DuckDB
    * list_min), so both engines agree on degenerate documents.
    */
  def compute(hashes: ArrayData, k: Int, p: Long): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = hashes.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](k))
    val out = new Array[Long](k)
    var kk = 0
    while (kk < k) {
      val a = 2L * kk + 1
      val b = (kk * 2654435761L) % p
      var mn = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (a * (hashes.getLong(i) % p) + b) % p
        if (v < mn) mn = v
        i += 1
      }
      out(kk) = mn
      kk += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class MinhashSignature(child: Expression, k: Int, p: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    MinhashSignatureUtil.compute(input.asInstanceOf[ArrayData], k, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinhashSignatureUtil.compute($c, $k, ${p}L)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object SqDistScaledUtil {
  def compute(a: ArrayData, b: ArrayData, scale: Long): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = scale * a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }
}

case class SqDistScaled(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sqdist_scaled"

  override protected def nullSafeEval(a: Any, b: Any, s: Any): Any =
    SqDistScaledUtil.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      s.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, s) => s"graft.functions.SqDistScaledUtil.compute($a, $b, $s)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): SqDistScaled =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object HilbertIndexUtil {
  /** Classic xy→d conversion (public-domain algorithm): walk square
    * sizes from 2^(bits-1) down, accumulating the sub-square index
    * and rotating the frame. One compiled loop, no allocation.
    */
  def compute(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert_index"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndexUtil.compute(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.HilbertIndexUtil.compute($x, $y, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object CosineF32Util {
  /** Deterministic left-to-right accumulation in doubles. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }
}

object DotLongUtil {
  /** Σ aᵢ·bᵢ over two long arrays — exact integer arithmetic. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var s = 0L
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }
}

case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotLongUtil.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotLongUtil.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSizeUtil {
  /** Merge-intersection count; inputs must be sorted ascending. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}

case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectSizeUtil.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedIntersectSizeUtil.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

case class CosineF32(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine_f32"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineF32Util.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineF32Util.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineF32 =
    copy(left = newLeft, right = newRight)
}

object RepetitionStatsUtil {
  private def bump(m: java.util.HashMap[String, Long], k: String): Long = {
    val c = m.merge(k, 1L, (a, b) => a + b)
    c
  }

  /** One pass over a (pre-lowercased) document: unigram/bigram/5-gram
    * occurrence counts folded into the six Gopher-rule scalars. Local
    * hash maps replace the explode + (doc_id, gram) shuffle — the
    * whole repetition query becomes map work.
    */
  def compute(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val text = s.toString
    // tokens = runs of non-space (== split(' ') + filter nonEmpty)
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && text.charAt(i) == ' ') i += 1
      val st = i
      while (i < n && text.charAt(i) != ' ') i += 1
      if (i > st) toks.add(text.substring(st, i))
    }
    val t = toks.size()
    val uni = new java.util.HashMap[String, Long]()
    var topWord = 0L
    i = 0
    while (i < t) {
      val c = bump(uni, toks.get(i))
      if (c > topWord) topWord = c
      i += 1
    }
    val bi = new java.util.HashMap[String, Long]()
    var topBi = 0L
    i = 0
    while (i < t - 1) {
      val c = bump(bi, toks.get(i) + " " + toks.get(i + 1))
      if (c > topBi) topBi = c
      i += 1
    }
    val five = new java.util.HashMap[String, Long]()
    i = 0
    while (i < t - 4) {
      val sb = new java.lang.StringBuilder(toks.get(i))
      var j = i + 1
      while (j < i + 5) { sb.append(' ').append(toks.get(j)); j += 1 }
      bump(five, sb.toString)
      i += 1
    }
    // occurrences belonging to grams seen more than once
    var dup5 = 0L
    val it = five.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > 1) dup5 += c }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](topWord, t.toLong,
        topBi, math.max(t - 1, 0).toLong,
        dup5, math.max(t - 4, 0).toLong))
  }
}

/** Six repetition scalars (top-word count, token count, top-bigram
  * count, bigram count, duplicated-5-gram occurrences, 5-gram count)
  * in ONE compiled pass per document — the Gopher-rule hot path as
  * pure map work: no explode, no (doc_id, gram) shuffle, gram counts
  * live in task-local maps exactly as long as one document.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("top_word_c", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("top_bigram_c", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("dup5_c", LongType, nullable = false),
    StructField("n_5grams", LongType, nullable = false)))
  override def prettyName: String = "graft_repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStatsUtil.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionStatsUtil.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}
