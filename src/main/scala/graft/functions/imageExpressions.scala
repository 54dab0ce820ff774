package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

private object ikernel { final val I = "graft.functions.ImageOps" }
import ikernel.I

/** img_psnr(a, b) — decoded-pixel fidelity (BASELINE.json invariant:
  * PSNR ≥ 40 dB for lossy formats). */
case class ImgPsnr(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "img_psnr"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    ImageOps.psnr(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"$I.psnr($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** img_phash(bytes) — 64-bit average perceptual hash. */
case class ImgPhash(child: Expression) extends UnaryExpression {
  override def prettyName: String = "img_phash"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = ImageOps.phash(v.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"$I.phash($v)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class ImgWidth(child: Expression) extends UnaryExpression {
  override def prettyName: String = "img_width"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any = ImageOps.width(v.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"$I.width($v)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class ImgHeight(child: Expression) extends UnaryExpression {
  override def prettyName: String = "img_height"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any = ImageOps.height(v.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"$I.height($v)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** img_reencode(bytes, fmt) — decode + re-encode (tile sink path, SURVEY L6/L7). */
case class ImgReencode(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "img_reencode"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any, f: Any): Any =
    ImageOps.reencode(a.asInstanceOf[Array[Byte]], f.toString)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, f) => s"$I.reencode($a, $f.toString())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** img_synth(k, patterns) — encoded bytes of the deterministic synthetic
  * image for key k (the Images table's `bytes` column as a prunable,
  * codegen projection: consumers that never read the bytes never pay the
  * encode). */
case class ImgSynth(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "img_synth"
  override def nullIntolerant: Boolean = true
  // declared input types so a SQL call with integer literals coerces
  // instead of CCE-ing in the interpreted path (round-7 review)
  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(k: Any, p: Any): Any =
    ImageOps.synthBytes(k.asInstanceOf[Long], p.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, p) => s"$I.synthBytes($k, $p)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** img_synth_phash(k, patterns) — perceptual hash of the synthetic image
  * for key k (the Images table's `phash` column, prunable like img_synth). */
case class ImgSynthPhash(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "img_synth_phash"
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def dataType: DataType = LongType
  override def nullSafeEval(k: Any, p: Any): Any =
    ImageOps.synthPhash(k.asInstanceOf[Long], p.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, p) => s"$I.synthPhash($k, $p)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** hamming64(a, b) — bit distance between 64-bit hashes (SimHash/pHash dedup). */
case class Hamming64(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "hamming64"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    ImageOps.hamming(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** img_resize(bytes, w, h, fmt) → binary — area-average box resize. */
case class ImgResize(first: Expression, second: Expression, third: Expression,
                     fourth: Expression) extends QuaternaryExpression {
  override def prettyName: String = "img_resize"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType
  override def nullSafeEval(b: Any, w: Any, h: Any, f: Any): Any =
    ImageOps.resize(b.asInstanceOf[Array[Byte]], w.asInstanceOf[Int],
      h.asInstanceOf[Int], f.toString)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, w, h, f) =>
      s"graft.functions.ImageOps.resize($b, $w, $h, $f.toString())")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression) = copy(a, b, c, d)
}
