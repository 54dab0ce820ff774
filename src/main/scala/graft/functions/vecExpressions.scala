package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

private object vkernel { final val V = "graft.functions.VecTextOps" }
import vkernel.V

/** vec_cosine(array<float>, array<float>) → double. */
case class VecCosine(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_cosine"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecTextOps.cosineFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"$V.cosineFF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ivf_cells(array<float>) → array<int>: the `nprobe` nearest IVF centroid
  * indices by dot product. The centroid matrix is a plan-time constant
  * (trained driver-side on a bounded sample — [[graft.operators.Similarity.trainIvf]])
  * carried as a constructor field and shipped to codegen as a reference
  * object, so the kernel reads a raw double[] — no per-row ArrayData
  * re-extraction of a 4096-element literal. */
case class IvfCells(child: Expression, centroids: Array[Double], dim: Int,
                    nprobe: Int)
    extends UnaryExpression {
  override def prettyName: String = "ivf_cells"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VecTextOps.ivfCells(v.asInstanceOf[ArrayData], centroids, dim, nprobe)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[]")
    defineCodeGen(ctx, ev, v => s"$V.ivfCells($v, $cRef, $dim, $nprobe)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** simhash64(array<string>) → long. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash64"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    VecTextOps.simhash64(v.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"$V.simhash64($v)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** word_shingles(text, k) → array<string> (distinct word k-grams). */
case class WordShingles(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "word_shingles"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(text: Any, k: Any): Any =
    VecTextOps.wordShingles(text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      k.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) => s"$V.wordShingles($t, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** minhash_sig(array<string>, num_hashes) → array<long>. */
case class MinhashSig(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "minhash_sig"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(sh: Any, n: Any): Any =
    VecTextOps.minhashSig(sh.asInstanceOf[ArrayData], n.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"$V.minhashSig($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** hyperplane_sig(array<float>, planes, seed) → long (cosine-LSH bucket). */
case class HyperplaneSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def prettyName: String = "hyperplane_sig"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any, p: Any, s: Any): Any =
    VecTextOps.hyperplaneSig(v.asInstanceOf[ArrayData], p.asInstanceOf[Int],
      s.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"$V.hyperplaneSig($a, $b, $c)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}
