package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Top-`topN` centroid ids by dot product for an `array<double>` vector —
  * the IVF assignment/probe kernel. `centroids` is the row-major flattened
  * (nCentroids × dim) matrix, shipped once per task as a reference object
  * (metadata-sized: 100s of centroids × dim doubles), never per row.
  *
  * Replaces the composable form `transform(slice(reverse(array_sort(array(
  * struct(aggregate(zip_with(...)))))), ...)` whose lambdas are interpreted
  * per centroid per row (Spark's higher-order functions never reach codegen)
  * — one fused primitive loop instead of nCentroids interpreted folds.
  * Order matches that form exactly: dot desc, centroid id desc on ties.
  * Selection is repeated argmax — O(nCentroids · topN) with topN <= probes,
  * cheaper than a full sort for the small topN IVF uses.
  */
case class NearestCentroids(child: Expression, centroids: Array[Double],
                            nCentroids: Int, dim: Int, topN: Int)
  extends UnaryExpression {

  require(centroids.length == nCentroids * dim,
    s"centroids length ${centroids.length} != $nCentroids x $dim")
  require(topN >= 1 && topN <= nCentroids, s"topN=$topN out of range [1, $nCentroids]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids expects array<double>, got $t")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "nearest_centroids"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(NearestCentroids.topIds(
      input.asInstanceOf[ArrayData], centroids, nCentroids, dim, topN)
      .asInstanceOf[Array[Int]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.NearestCentroids.topIds($c, $centsRef, $nCentroids, $dim, $topN));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroids {

  /** Kernel (public static for generated code): ids of the topN centroids by
    * dot product, ordered (dot desc, id desc) to match the array_sort-based
    * reference form. A vector whose length differs from `dim` gets NaN dots
    * for every centroid — the HOF form's zip_with null-pads the shorter side
    * so every product (hence the fold) is null there, and an all-null sim
    * column sorts exactly like an all-NaN one (total tie, ids descending);
    * partial dots over min(dim, len) would silently rank garbage instead.
    */
  def topIds(vec: ArrayData, cents: Array[Double], nCentroids: Int,
             dim: Int, topN: Int): Array[Int] = {
    val dots = new Array[Double](nCentroids)
    if (vec.numElements() != dim) {
      java.util.Arrays.fill(dots, Double.NaN)
    } else {
      var c = 0
      while (c < nCentroids) {
        var dot = 0d
        val base = c * dim
        var i = 0
        while (i < dim) { dot += cents(base + i) * vec.getDouble(i); i += 1 }
        dots(c) = dot
        c += 1
      }
    }
    val out = new Array[Int](topN)
    val taken = new Array[Boolean](nCentroids)
    var k = 0
    while (k < topN) {
      var best = -1
      var bestDot = Double.NegativeInfinity
      var c2 = 0
      while (c2 < nCentroids) {
        // exact reverse(array_sort) order of the struct(sim, cid) reference
        // form: Spark's nan-safe double ordering (NaN greatest, -0.0 == 0.0),
        // ties prefer the LARGER id
        if (!taken(c2) &&
            (best < 0 || { val cmp = nanSafeCompare(dots(c2), bestDot)
                           cmp > 0 || (cmp == 0 && c2 > best) })) {
          best = c2
          bestDot = dots(c2)
        }
        c2 += 1
      }
      taken(best) = true
      out(k) = best
      k += 1
    }
    out
  }

  /** Spark SQL's double ordering (Utils.nanSafeCompareDoubles semantics):
    * NaN compares greater than everything incl. itself as a tie, and
    * -0.0 == 0.0 — NOT java.lang.Double.compare, which splits zeros.
    */
  private def nanSafeCompare(a: Double, b: Double): Int =
    if (a < b) -1
    else if (a > b) 1
    else {
      val an = java.lang.Double.isNaN(a)
      val bn = java.lang.Double.isNaN(b)
      if (an == bn) 0 else if (an) 1 else -1
    }
}
