package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest centroid by squared L2 over INTEGER grid codes — the Lloyd
  * E-step kernel. Returns `struct(cid int, dist bigint)`: the id of the
  * closest centroid (ties broken toward the SMALLEST id, the natural SQL
  * `ORDER BY dist, cid LIMIT 1` order) and the exact integer squared
  * distance to it, so one fused scan yields both the assignment and the
  * inertia contribution.
  *
  * `centroids` is the row-major flattened (nCentroids × dim) matrix,
  * shipped once per task as a reference object (k × dim longs — metadata,
  * never per row), exactly like [[NearestCentroids]]'s dot-product twin.
  * All arithmetic is Long over bounded grid codes (|code| ≤ 2¹⁰ after
  * [[graft.scale.Kmeans.quantizeGrid]]), so per-row distances stay far
  * inside 2⁶³ and the result is value-exact on any engine — unlike float
  * distances, whose low bits depend on accumulation order.
  *
  * A vector whose length differs from `dim` evaluates to null (fail-visible
  * downstream: null cids survive to the grouping key instead of silently
  * ranking a truncated distance).
  */
case class ArgMinCentroidL2(child: Expression, centroids: Array[Long],
                            nCentroids: Int, dim: Int)
  extends UnaryExpression {

  require(centroids.length == nCentroids * dim,
    s"centroids length ${centroids.length} != $nCentroids x $dim")
  require(nCentroids >= 1, "need at least one centroid")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"argmin_centroid_l2 expects array<bigint>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("dist", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def prettyName: String = "argmin_centroid_l2"

  override protected def nullSafeEval(input: Any): Any =
    ArgMinCentroidL2.nearest(input.asInstanceOf[ArrayData], centroids, nCentroids, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", centroids, "long[]")
    // the kernel itself returns null on a dim mismatch, so ev.isNull is
    // re-derived from the result rather than inherited from the child alone
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.expressions.ArgMinCentroidL2.nearest(
         |  $c, $centsRef, $nCentroids, $dim);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArgMinCentroidL2 {

  /** Kernel (public static for generated code). Returns null on a
    * dimension mismatch, else an InternalRow of (cid, dist) with the
    * SMALLEST id winning distance ties.
    */
  def nearest(vec: ArrayData, cents: Array[Long], nCentroids: Int,
              dim: Int): InternalRow = {
    if (vec.numElements() != dim) return null
    var bestId = 0
    var bestDist = Long.MaxValue
    var c = 0
    while (c < nCentroids) {
      val base = c * dim
      var d = 0L
      var i = 0
      while (i < dim) {
        val diff = vec.getLong(i) - cents(base + i)
        d += diff * diff
        i += 1
      }
      // strict < keeps the FIRST (smallest) id on ties
      if (d < bestDist) { bestDist = d; bestId = c }
      c += 1
    }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    row.setInt(0, bestId)
    row.setLong(1, bestDist)
    row
  }
}
