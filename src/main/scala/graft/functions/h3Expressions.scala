package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

private object hkernel { final val C = "graft.functions.CatalystHelpers" }
import hkernel.C

/** h3_cell(lng, lat, res) → cell id (scalar point fast path, like s2_cell). */
case class H3CellExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def prettyName: String = "h3_cell"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(lng: Any, lat: Any, res: Any): Any =
    CatalystHelpers.h3Cell(lng.asInstanceOf[Double], lat.asInstanceOf[Double],
      res.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"$C.h3Cell($a, $b, $c)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** Lowercase hex string — srai's H3 region ids (srai/h3.py:88). */
case class H3Str(child: Expression) extends UnaryExpression {
  override def prettyName: String = "h3_str"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = CatalystHelpers.h3Str(v.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"$C.h3Str($v)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class H3FromStr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "h3_from_str"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    CatalystHelpers.h3FromStr(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"$C.h3FromStr($v)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** h3_cover(wkb, res, contains_centroid) — R1's two containment modes
  * (srai/h3.py:78: Covers / ContainsCentroid). */
case class H3Cover(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def prettyName: String = "h3_cover"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(wkb: Any, res: Any, cc: Any): Any =
    CatalystHelpers.h3Cover(wkb.asInstanceOf[Array[Byte]], res.asInstanceOf[Int],
      cc.asInstanceOf[Boolean])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"$C.h3Cover($a, $b, $c)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

case class H3BoundaryExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "h3_boundary"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any = CatalystHelpers.h3Boundary(v.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"$C.h3Boundary($v)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** h3_grid_disk(cell, k) — N2 filled disk. */
case class H3GridDisk(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "h3_grid_disk"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(id: Any, k: Any): Any =
    CatalystHelpers.h3GridDisk(id.asInstanceOf[Long], k.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"$C.h3GridDisk($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** h3_grid_ring(cell, k) — N3 hollow ring. */
case class H3GridRing(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "h3_grid_ring"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(id: Any, k: Any): Any =
    CatalystHelpers.h3GridRing(id.asInstanceOf[Long], k.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"$C.h3GridRing($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class H3ParentExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "h3_parent"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(id: Any, res: Any): Any =
    CatalystHelpers.h3Parent(id.asInstanceOf[Long], res.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"$C.h3Parent($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class H3ChildrenExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "h3_children"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(id: Any, res: Any): Any =
    CatalystHelpers.h3Children(id.asInstanceOf[Long], res.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"$C.h3Children($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** h3_local_ij(origin, cell) → array<int>[i, j] (N7; errors on pentagons). */
/** h3_grid_disk_distances(id, k) → array<struct<cell, distance>> — every
  * disk member with its MIN hop distance from ONE BFS (h3Closure's
  * generator; per-ring calls re-ran every inner disk k times). */
case class H3GridDiskDistances(left: Expression, right: Expression)
    extends BinaryExpression with codegen.CodegenFallback {
  override def prettyName: String = "h3_grid_disk_distances"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(new StructType()
    .add("cell", LongType, nullable = false)
    .add("distance", IntegerType, nullable = false), containsNull = false)
  override def nullSafeEval(id: Any, k: Any): Any =
    CatalystHelpers.h3GridDiskDistances(id.asInstanceOf[Long], k.asInstanceOf[Int])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** h3_local_ij_try — like h3_local_ij but null on pentagon distortion, so
  * planetary cell sets DROP affected anchors instead of failing the job. */
case class H3LocalIjTryExpr(left: Expression, right: Expression)
    extends BinaryExpression with codegen.CodegenFallback {
  override def prettyName: String = "h3_local_ij_try"
  override def nullIntolerant: Boolean = true
  // CAN return null on non-null inputs (pentagon) — without this override
  // BinaryExpression derives nullable from the children and the optimizer
  // folds downstream IsNotNull guards away, silently keeping bad rows
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(o: Any, c: Any): Any =
    CatalystHelpers.h3LocalIjTry(o.asInstanceOf[Long], c.asInstanceOf[Long])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class H3LocalIjExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "h3_local_ij"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(o: Any, c: Any): Any =
    CatalystHelpers.h3LocalIj(o.asInstanceOf[Long], c.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"$C.h3LocalIj($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
