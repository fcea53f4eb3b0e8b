package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native codegen'd embedding kernels. The similarity queries quantize
  * per-element products to integers (`CAST(round(x*y*1e12) AS BIGINT)`,
  * summed exactly) so results are cross-engine reproducible; expressed
  * as nested higher-order functions that arithmetic is interpreted —
  * per-element lambda dispatch and boxing dominate the embedding-query
  * tail of the bench. These expressions generate the same arithmetic as
  * a tight scalar loop inside whole-stage codegen.
  *
  * Rounding parity: Spark's `round(double)` rounds half AWAY FROM ZERO
  * (verified: round(-2.5) = -3) and handles the 0.49999999999999994
  * near-tie exactly like `Math.round`; `p >= 0 ? Math.round(p) :
  * -Math.round(-p)` reproduces it bit-for-bit, and the HOF's final
  * `CAST(integral double AS BIGINT)` is the identity on these values.
  */
object QuantKernels {
  /** Shared by interpreted eval paths. */
  @inline def qround(p: Double): Long =
    if (p >= 0) Math.round(p) else -Math.round(-p)
  /** Java source for the same, with `p` spliced in. */
  def qroundJava(p: String): String =
    s"(($p) >= 0 ? Math.round($p) : -Math.round(-($p)))"
}

/** Σᵢ round(xᵢ·yᵢ·1e12) :: long — the quantized inner product; the
  * quantized squared norm is `qdot(e, e)`. Null on length mismatch
  * (mirroring zip_with's null padding propagation). */
case class QuantizedDotE12(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qdot_e12 expects two array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "qdot_e12"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var acc = 0L
      var i = 0
      while (i < n) {
        // a null element nulls the whole sum, matching the zip_with /
        // aggregate HOF chain this kernel claims bit-parity with
        // (zip_with emits a null product, aggregate's `acc + null` → null)
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += QuantKernels.qround(
          a.getFloat(i).toDouble * b.getFloat(i).toDouble * 1e12)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $p = ((double) $a.getFloat($i)) * ((double) $b.getFloat($i)) * 1e12;
         |    $acc += ${QuantKernels.qroundJava(p)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): QuantizedDotE12 =
    copy(left = newLeft, right = newRight)
}

/** IVF coarse-quantizer cell: argmin over centroids of the quantized
  * squared euclidean distance Σ_d round((x_d − c_d)²·1e12), ties →
  * lowest cell id — the codegen form of the nested-HOF argmin in
  * `sim.Ivf.withCell` (same arithmetic, same tie rule). Centroids ride
  * along as a reference object, not a literal tree, so the generated
  * code is one tight double loop. Null if the vector's dimensionality
  * does not match the centroids'. */
case class IvfCellE12(child: Expression, centroids: Array[Array[Double]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_cell_e12 expects array<float>, got $other")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_cell_e12"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val dim = centroids(0).length
    if (a.numElements() != dim) null
    else if ((0 until dim).exists(a.isNullAt)) null
    // a null element nulls every cell distance in the HOF form, so the
    // argmin itself is null (array_position(ds, null) → null)
    else {
      var best = Long.MaxValue
      var bestC = 0
      var c = 0
      while (c < centroids.length) {
        val cent = centroids(c)
        var acc = 0L
        var d = 0
        // early abandonment: each quantized term is >= 0, so acc only
        // grows — once it reaches the running best this cell cannot
        // win (and an equal later cell never replaces an earlier one,
        // so the ties-to-lowest rule is preserved exactly). At
        // production geometry (nlist ≈ √N) most cells abandon within
        // a few dims, turning the O(nlist·dim) scan sub-linear in dim.
        while (d < dim && acc < best) {
          val diff = a.getFloat(d).toDouble - cent(d)
          acc += QuantKernels.qround(diff * diff * 1e12)
          d += 1
        }
        if (acc < best) { best = acc; bestC = c }
        c += 1
      }
      bestC
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val p = ctx.freshName("p")
      val dim = centroids(0).length
      val hasNull = ctx.freshName("hasNull")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $hasNull = false;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    if ($a.isNullAt($d)) { $hasNull = true; break; }
         |  }
         |  if ($hasNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |    long $best = Long.MAX_VALUE;
         |    int $bestC = 0;
         |    for (int $c = 0; $c < ${centroids.length}; $c++) {
         |      long $acc = 0L;
         |      // early abandonment (terms >= 0; equal-later never wins,
         |      // preserving ties-to-lowest exactly)
         |      for (int $d = 0; $d < $dim && $acc < $best; $d++) {
         |        final double $diff = ((double) $a.getFloat($d)) - $cents[$c][$d];
         |        final double $p = $diff * $diff * 1e12;
         |        $acc += ${QuantKernels.qroundJava(p)};
         |      }
         |      if ($acc < $best) { $best = $acc; $bestC = $c; }
         |    }
         |    ${ev.value} = $bestC;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): IvfCellE12 =
    copy(child = newChild)
}

/** Minimum quantized squared distance to any centroid — the companion
  * of [[IvfCellE12]] (identical loop, identical arithmetic and null
  * rules; it returns `best` where the cell kernel returns `bestC`).
  * Because the assignment rule is "argmin with ties to the lowest
  * cell", this IS the distance to the assigned centroid, which is what
  * prototype-based pruning (Sorscher et al. 2022) ranks by and what
  * the kmeans‖ oversampling rounds (Bahmani et al. 2011) sample
  * proportionally to — both per-row map-only, no join against a
  * centroid table. Equals `array_min` of the HOF distance list
  * (parity pinned in EmbeddingKernelSpec). */
case class IvfMinDistE12(child: Expression, centroids: Array[Array[Double]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_min_dist_e12 expects array<float>, got $other")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_min_dist_e12"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val dim = centroids(0).length
    if (a.numElements() != dim) null
    else if ((0 until dim).exists(a.isNullAt)) null
    else {
      var best = Long.MaxValue
      var c = 0
      while (c < centroids.length) {
        val cent = centroids(c)
        var acc = 0L
        var d = 0
        // early abandonment — same monotone-accumulator argument as
        // IvfCellE12 (the min over full evaluations is unchanged)
        while (d < dim && acc < best) {
          val diff = a.getFloat(d).toDouble - cent(d)
          acc += QuantKernels.qround(diff * diff * 1e12)
          d += 1
        }
        if (acc < best) best = acc
        c += 1
      }
      best
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val best = ctx.freshName("best")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val p = ctx.freshName("p")
      val dim = centroids(0).length
      val hasNull = ctx.freshName("hasNull")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $hasNull = false;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    if ($a.isNullAt($d)) { $hasNull = true; break; }
         |  }
         |  if ($hasNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |    long $best = Long.MAX_VALUE;
         |    for (int $c = 0; $c < ${centroids.length}; $c++) {
         |      long $acc = 0L;
         |      // early abandonment (terms >= 0, min unchanged)
         |      for (int $d = 0; $d < $dim && $acc < $best; $d++) {
         |        final double $diff = ((double) $a.getFloat($d)) - $cents[$c][$d];
         |        final double $p = $diff * $diff * 1e12;
         |        $acc += ${QuantKernels.qroundJava(p)};
         |      }
         |      if ($acc < $best) { $best = $acc; }
         |    }
         |    ${ev.value} = $best;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): IvfMinDistE12 =
    copy(child = newChild)
}

/** Two-level residual-VQ cell (coarse-then-fine, both argmin with ties
  * to the lowest index): c = argmin over `coarse` of the quantized
  * squared distance, then j = argmin over `fine` of
  * Σ_d round((x_d − coarse_c_d − fine_j_d)²·1e12) — the fine stage
  * quantizes the RESIDUAL x − coarse_c without materializing it (the
  * distance to coarse_c + fine_j is algebraically the residual's
  * distance to fine_j). Result = c·|fine| + j: |coarse|·|fine|
  * effective cells at (|coarse| + |fine|)·dim cost per row — the
  * anti-quadratic knob for cluster-bucketed SemDeDup/ANN past the flat
  * argmin's k·dim wall (k=50k flat is 3.2M ops/row; 224×224 RVQ covers
  * the same cell count at 28k). One self-contained expression so
  * CollapseProject cannot duplicate the two-stage loop across
  * self-joins. Null rules identical to [[IvfCellE12]]. */
case class RvqCellE12(child: Expression, coarse: Array[Array[Double]],
                      fine: Array[Array[Double]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rvq_cell_e12 expects array<float>, got $other")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "rvq_cell_e12"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val dim = coarse(0).length
    if (a.numElements() != dim) null
    else if ((0 until dim).exists(a.isNullAt)) null
    else {
      var best = Long.MaxValue
      var bestC = 0
      var c = 0
      while (c < coarse.length) {
        val cent = coarse(c)
        var acc = 0L
        var d = 0
        while (d < dim) {
          val diff = a.getFloat(d).toDouble - cent(d)
          acc += QuantKernels.qround(diff * diff * 1e12)
          d += 1
        }
        if (acc < best) { best = acc; bestC = c }
        c += 1
      }
      val cc = coarse(bestC)
      var bestF = Long.MaxValue
      var bestJ = 0
      var j = 0
      while (j < fine.length) {
        val f = fine(j)
        var acc = 0L
        var d = 0
        while (d < dim) {
          val diff = a.getFloat(d).toDouble - cc(d) - f(d)
          acc += QuantKernels.qround(diff * diff * 1e12)
          d += 1
        }
        if (acc < bestF) { bestF = acc; bestJ = j }
        j += 1
      }
      bestC * fine.length + bestJ
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val co = ctx.addReferenceObj("rvqCoarse", coarse, "double[][]")
    val fi = ctx.addReferenceObj("rvqFine", fine, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val bestF = ctx.freshName("bestF")
      val bestJ = ctx.freshName("bestJ")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val p = ctx.freshName("p")
      val cc = ctx.freshName("cc")
      val dim = coarse(0).length
      val hasNull = ctx.freshName("hasNull")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $hasNull = false;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    if ($a.isNullAt($d)) { $hasNull = true; break; }
         |  }
         |  if ($hasNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |    long $best = Long.MAX_VALUE;
         |    int $bestC = 0;
         |    for (int $c = 0; $c < ${coarse.length}; $c++) {
         |      long $acc = 0L;
         |      for (int $d = 0; $d < $dim; $d++) {
         |        final double $diff = ((double) $a.getFloat($d)) - $co[$c][$d];
         |        final double $p = $diff * $diff * 1e12;
         |        $acc += ${QuantKernels.qroundJava(p)};
         |      }
         |      if ($acc < $best) { $best = $acc; $bestC = $c; }
         |    }
         |    final double[] $cc = $co[$bestC];
         |    long $bestF = Long.MAX_VALUE;
         |    int $bestJ = 0;
         |    for (int $j = 0; $j < ${fine.length}; $j++) {
         |      long $acc = 0L;
         |      for (int $d = 0; $d < $dim; $d++) {
         |        final double $diff = ((double) $a.getFloat($d)) - $cc[$d] - $fi[$j][$d];
         |        final double $p = $diff * $diff * 1e12;
         |        $acc += ${QuantKernels.qroundJava(p)};
         |      }
         |      if ($acc < $bestF) { $bestF = $acc; $bestJ = $j; }
         |    }
         |    ${ev.value} = $bestC * ${fine.length} + $bestJ;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RvqCellE12 =
    copy(child = newChild)
}

/** Sign-random-projection (SimHash-LSH) bucket: bit p of the result is
  * set iff Σ_d planes[p][d] · round(x_d·1e6) > 0 — the codegen,
  * per-row form of the explode + 8-way-sum aggregate the similarity
  * queries originally bucketed with (same integer arithmetic, same
  * strict `> 0` sign rule, so bucket ids are bit-identical to the
  * DuckDB oracle's md5-projection SQL). Turning bucket assignment into
  * a scalar expression removes a corpus-wide explode(×dim) + groupBy +
  * join-back from every ANN/near-dup/decontamination plan — at 100 TB
  * that was the only shuffle in otherwise map-only candidate
  * generation. The projection matrix rides along as a reference
  * object. Null if the vector's dimensionality does not match the
  * matrix's, or any element is null (the aggregate form's null
  * propagation). */
case class SignLshBucketE12(child: Expression, planes: Array[Array[Long]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh_bucket_e12 expects array<float>, got $other")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sign_lsh_bucket_e12"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val dim = planes(0).length
    if (a.numElements() != dim) null
    else if ((0 until dim).exists(a.isNullAt)) null
    else {
      var bucket = 0L
      var p = 0
      while (p < planes.length) {
        val proj = planes(p)
        var acc = 0L
        var d = 0
        while (d < dim) {
          acc += proj(d) * QuantKernels.qround(a.getFloat(d).toDouble * 1e6)
          d += 1
        }
        if (acc > 0) bucket |= (1L << p)
        p += 1
      }
      bucket
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("lshPlanes", planes, "long[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val hasNull = ctx.freshName("hasNull")
      val dim = planes(0).length
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $hasNull = false;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    if ($a.isNullAt($d)) { $hasNull = true; break; }
         |  }
         |  if ($hasNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |    long $bucket = 0L;
         |    for (int $p = 0; $p < ${planes.length}; $p++) {
         |      long $acc = 0L;
         |      for (int $d = 0; $d < $dim; $d++) {
         |        final double $x = ((double) $a.getFloat($d)) * 1e6;
         |        $acc += $mat[$p][$d] * ${QuantKernels.qroundJava(x)};
         |      }
         |      if ($acc > 0) $bucket |= (1L << $p);
         |    }
         |    ${ev.value} = $bucket;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBucketE12 =
    copy(child = newChild)
}

/** Top-`nprobe` nearest cell ids in (distance, cell-id) ascending order
  * — the probe list as ONE codegen'd kernel: distance computation and
  * the nprobe-sized insertion select fuse into a single tight loop
  * with early abandonment against the current nprobe-th best, so no
  * nlist-length distance array is materialized and no interpreted
  * array_sort runs (the HOF pair-sort chain measured ~1.8 s PER
  * INVOCATION on a 16-row frame at nlist=1414 — per-invocation
  * interpreter overhead, not row work). Order and tie rule are
  * identical to `sim.Ivf.withProbes`'s lexicographic (dist, id)
  * pair-sort: cells iterate in id order and an equal-distance later
  * cell inserts AFTER the earlier one (equality spec-pinned).
  * Requires nprobe ≤ nlist; null rules match the other IVF kernels. */
case class IvfProbesE12(child: Expression, centroids: Array[Array[Double]],
                        nprobe: Int)
  extends UnaryExpression {

  require(nprobe >= 1 && nprobe <= centroids.length,
    s"nprobe must be in [1, nlist=${centroids.length}], got $nprobe")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_probes_e12 expects array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_probes_e12"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val dim = centroids(0).length
    if (a.numElements() != dim) null
    else if ((0 until dim).exists(a.isNullAt)) null
    else {
      val bd = Array.fill(nprobe)(Long.MaxValue)
      val bi = new Array[Int](nprobe)
      var c = 0
      while (c < centroids.length) {
        val cent = centroids(c)
        var acc = 0L
        var d = 0
        // abandon once this cell can no longer displace the nprobe-th
        // best (equal distance inserts after, so >= is safe)
        while (d < dim && acc < bd(nprobe - 1)) {
          val diff = a.getFloat(d).toDouble - cent(d)
          acc += QuantKernels.qround(diff * diff * 1e12)
          d += 1
        }
        if (acc < bd(nprobe - 1)) {
          var p = nprobe - 1
          while (p > 0 && bd(p - 1) > acc) {
            bd(p) = bd(p - 1); bi(p) = bi(p - 1); p -= 1
          }
          bd(p) = acc; bi(p) = c
        }
        c += 1
      }
      new GenericArrayData(bi)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val bd = ctx.freshName("bd")
      val bi = ctx.freshName("bi")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val p = ctx.freshName("p")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val pr = ctx.freshName("pr")
      val hasNull = ctx.freshName("hasNull")
      val dim = centroids(0).length
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $hasNull = false;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    if ($a.isNullAt($d)) { $hasNull = true; break; }
         |  }
         |  if ($hasNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |    long[] $bd = new long[$nprobe];
         |    int[] $bi = new int[$nprobe];
         |    java.util.Arrays.fill($bd, Long.MAX_VALUE);
         |    for (int $c = 0; $c < ${centroids.length}; $c++) {
         |      long $acc = 0L;
         |      for (int $d = 0; $d < $dim && $acc < $bd[$nprobe - 1]; $d++) {
         |        final double $diff = ((double) $a.getFloat($d)) - $cents[$c][$d];
         |        final double $pr = $diff * $diff * 1e12;
         |        $acc += ${QuantKernels.qroundJava(pr)};
         |      }
         |      if ($acc < $bd[$nprobe - 1]) {
         |        int $p = $nprobe - 1;
         |        while ($p > 0 && $bd[$p - 1] > $acc) {
         |          $bd[$p] = $bd[$p - 1]; $bi[$p] = $bi[$p - 1]; $p--;
         |        }
         |        $bd[$p] = $acc; $bi[$p] = $c;
         |      }
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bi);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): IvfProbesE12 =
    copy(child = newChild)
}

/** Residual vector x − centroid(cell) as array<double> — the reference-
  * object form of `sim.Pq.withResidual`'s `zip_with(embedding,
  * element_at(cents, cell + 1), (x, c) -> CAST(x AS DOUBLE) - c)`
  * (bit-parity pinned: both are exact double subtraction, no
  * quantization — the PQ encode/ADC kernels quantize downstream). At
  * production geometry the HOF form's centroid literal is the same
  * ~90k-node tree [[IvfProbesE12]] avoids; this kernel also evaluates
  * per-PROBED-cell residuals in multi-probe ADC, where the `cell`
  * column is an exploded probe id rather than the assigned cell.
  * Null if the cell id is outside [0, nlist) or the dims mismatch. */
case class IvfResidualE12(emb: Expression, cell: Expression,
                          centroids: Array[Array[Double]])
  extends BinaryExpression {

  override def left: Expression = emb
  override def right: Expression = cell

  override def checkInputDataTypes(): TypeCheckResult = (emb.dataType, cell.dataType) match {
    case (ArrayType(FloatType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"ivf_residual_e12 expects (array<float>, int), got ($l, $r)")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_residual_e12"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val c = r.asInstanceOf[Int]
    val dim = centroids(0).length
    if (a.numElements() != dim || c < 0 || c >= centroids.length) null
    else if ((0 until dim).exists(a.isNullAt)) null
    else {
      val cent = centroids(c)
      val out = new Array[Double](dim)
      var d = 0
      while (d < dim) {
        out(d) = a.getFloat(d).toDouble - cent(d)
        d += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, (a, c) => {
      val out = ctx.freshName("out")
      val d = ctx.freshName("d")
      val hasNull = ctx.freshName("hasNull")
      val dim = centroids(0).length
      s"""
         |if ($a.numElements() != $dim || $c < 0 || $c >= ${centroids.length}) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $hasNull = false;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    if ($a.isNullAt($d)) { $hasNull = true; break; }
         |  }
         |  if ($hasNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |    double[] $out = new double[$dim];
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $out[$d] = ((double) $a.getFloat($d)) - $cents[$c][$d];
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IvfResidualE12 =
    copy(emb = newLeft, cell = newRight)
}
