package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Two-level IVF cell assignment against a CLUSTER-BROADCAST grouped
  * centroid set — the 2¹⁴⁺-cells sibling of [[IvfNearestCells]]:
  * level 1 scans the group centroids, level 2 runs the exact per-cell
  * d2 over only the probed groups' members
  * ([[IvfAssignKernel.topCellsTwoLevel]]), dropping per-row assignment
  * arithmetic from O(cells × dim) to O((groups + probed members) ×
  * dim). With `groupProbes >= numGroups` the result is bit-identical
  * to [[IvfNearestCells]]'s (spec-pinned); below that, a cell is
  * missed only when its whole group outranks the probed set — the
  * recall trade SURVEY §6.2 measures.
  *
  * Same broadcast-handle stance as [[IvfNearestCells]]/[[BloomProbe]]
  * (megabyte matrix rides a `Broadcast` handle, executors torrent it
  * once, codegen caches the deserialized payload in a field), and like
  * them constructed programmatically only.
  */
case class IvfNearestCellsTwoLevel(bc: Broadcast[IvfGroupedCentroidSet],
    left: Expression, right: Expression, m: Int, groupProbes: Int)
    extends BinaryExpression {

  require(m >= 1, s"m=$m — need at least the home cell")
  require(groupProbes >= 1, s"groupProbes=$groupProbes")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, double), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("d2", DoubleType, nullable = false))), containsNull = false)

  override def nullIntolerant: Boolean = true

  override def nullable: Boolean = true

  override def prettyName: String = "graft_ivf_nearest_cells_2l"

  override def nullSafeEval(v: Any, nrm: Any): Any =
    IvfAssignKernel.topCellsTwoLevel(v.asInstanceOf[ArrayData],
      nrm.asInstanceOf[Double], bc.value, m, groupProbes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftIvfGroupedBc", bc,
      classOf[Broadcast[IvfGroupedCentroidSet]].getName)
    val csClass = classOf[IvfGroupedCentroidSet].getName
    val csField = ctx.addMutableState(csClass, "graftIvfGrouped",
      v => s"$v = ($csClass) $bcRef.value();", forceInline = true)
    val kernel = IvfAssignKernel.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (v, nrm) => s"""
      |${ev.value} = $kernel.topCellsTwoLevel($v, $nrm, $csField, $m, $groupProbes);
      |${ev.isNull} = (${ev.value} == null);
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IvfNearestCellsTwoLevel =
    copy(left = newLeft, right = newRight)
}
