package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Banded sign-LSH keys for an `array<double>` embedding in ONE fused pass:
  * output[b] packs the sign bits of the projections onto hyperplanes
  * [b*rowsPerBand, (b+1)*rowsPerBand) — `aggregate(slice(transform(...)))`
  * over a literal plane matrix runs as interpreted higher-order lambdas per
  * element (the dominant cost of the X4 LSH stage); here the plane matrix
  * rides along as a reference object and the loop participates in
  * whole-stage codegen.
  *
  * Bit packing (MSB-first within a band: key = key*2 + sign) matches
  * `SimSearch.lshBandKeysFolds`, which the spec cross-checks.
  */
case class SignLshKeys(child: Expression, planes: Array[Array[Double]],
                       bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  require(planes.length >= bands * rowsPerBand, "not enough planes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_sign_lsh_keys"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var r = 0
      while (r < rowsPerBand) {
        val p = planes(b * rowsPerBand + r)
        val n = math.min(x.numElements(), p.length)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += x.getDouble(i) * p(i); i += 1 }
        key = key * 2 + (if (dot > 0) 1L else 0L)
        r += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, x => {
      val keys = ctx.freshName("keys")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val dotV = ctx.freshName("dot")
      val key = ctx.freshName("key")
      s"""
         |long[] $keys = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $key = 0L;
         |  for (int $r = 0; $r < $rowsPerBand; $r++) {
         |    double[] $p = $planesRef[$b * $rowsPerBand + $r];
         |    int $n = java.lang.Math.min($x.numElements(), $p.length);
         |    double $dotV = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dotV += $x.getDouble($i) * $p[$i];
         |    }
         |    $key = $key * 2 + ($dotV > 0 ? 1L : 0L);
         |  }
         |  $keys[$b] = $key;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($keys);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
