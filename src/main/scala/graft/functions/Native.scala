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
