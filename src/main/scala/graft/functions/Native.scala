package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge => B}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

  /** 64-bit SimHash of whitespace-tokenized text (Charikar 2002):
    * per-token FNV-1a 64 hashes vote on each bit; the sign of each
    * vote total becomes the bit. One pass over the bytes, zero
    * allocation.
    */
  def simhash64(c: Column): Column = B.column(SimHash64(B.expression(c)))

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

  /** Sorted distinct FNV-1a64 hashes of the lowercase word n-grams of
    * a text column, in one pass over the bytes. The composable-HOF
    * equivalent (`transform(sequence(...), i => crc32(concat_ws(
    * element_at(toks, i), ...)))`) re-evaluates the tokenizer per
    * element because common-subexpression elimination does not cross
    * lambda boundaries — O(tokens²) per document. This is the case
    * where a custom Expression is the only efficient form.
    */
  def wordNGramHashes(text: Column, n: Int): Column =
    B.column(WordNGramHashes(B.expression(text), n))
}

object SimHash64Util {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** One-pass simhash over UTF-8 bytes; tokens split on ASCII space. */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val votes = new Array[Int](64)
    var h = FnvOffset
    var inToken = false
    var i = 0
    while (i <= bytes.length) {
      val isSpace = i == bytes.length || bytes(i) == ' '.toByte
      if (isSpace) {
        if (inToken) { vote(votes, h); h = FnvOffset; inToken = false }
      } else {
        h = (h ^ (bytes(i) & 0xff)) * FnvPrime
        inToken = true
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) >= 0) out |= (1L << b); b += 1 }
    out
  }

  private def vote(votes: Array[Int], h: Long): Unit = {
    var b = 0
    while (b < 64) {
      if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
      b += 1
    }
  }
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64Util.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Util.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object WordNGramHashesUtil {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** Sorted distinct non-negative FNV-1a64 hashes of word n-grams
    * (tokens split on ASCII space, ASCII-lowercased, joined by a
    * single space). Fewer than n tokens → one hash of all tokens.
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
    var w = 0
    while (w < win) {
      var h = FnvOffset
      var j = w
      val jEnd = math.min(w + n, t)
      while (j < jEnd) {
        var p = starts.get(j).intValue()
        val e = ends.get(j).intValue()
        while (p < e) {
          val b = bytes(p)
          val lower = if (b >= 'A'.toByte && b <= 'Z'.toByte) (b + 32).toByte else b
          h = (h ^ (lower & 0xff)) * FnvPrime
          p += 1
        }
        if (j < jEnd - 1) h = (h ^ ' '.toInt) * FnvPrime
        j += 1
      }
      out(w) = h & Long.MaxValue
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
