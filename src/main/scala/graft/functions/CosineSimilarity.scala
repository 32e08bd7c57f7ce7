package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over two
  * Array[Float] columns — the codegen'd replacement for a Scala UDF in
  * the ANN/near-dup hot paths: `doGenCode` reads floats straight out of
  * the columnar ArrayData (no Seq[Float] boxing, no serialization
  * round-trip), and the expression stays inside whole-stage codegen.
  *
  * Arithmetic contract (shared with the DuckDB oracles and the previous
  * UDF): each accumulator (dot, |a|², |b|²) folds in index order in
  * DOUBLE precision; result = dot / (√na · √nb). Bit-identical to the
  * scalar loop, so oracle hash-matches are unaffected.
  *
  * Zero-norm guard: a zero vector has no direction, so its cosine with
  * anything is defined as 0.0 — NEVER the raw 0/0 = NaN, which Spark
  * orders ABOVE +Infinity: one all-zero embedding in a corpus would
  * silently rank #1 for every query in every top-k window.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // inferred result type: AbstractDataType is private[sql] in Spark 4
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // locals via ctx.freshName: two instances of this expression can land
      // in ONE whole-stage-codegen function (nullSafeExec adds no scoping
      // braces for non-nullable inputs), so fixed names would collide and
      // fail janino compilation → silent interpreted fallback.
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 :
         |  $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** column-level entry point: `cosine(col("a"), col("b"))` */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
