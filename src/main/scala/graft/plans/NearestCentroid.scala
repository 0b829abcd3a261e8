package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the k-means E-step: nearest centroid
  * (by 4-dp-rounded cosine) of an `array<double>` vector against a
  * BOUNDED broadcast codebook, evaluated as a pure per-row MAP.
  *
  * Why this exists: the declarative E-step
  * (`crossJoin(broadcast(cents)) → groupBy(vec_id) → max(struct)`)
  * is semantically right but physically wrong past small k — a
  * `max(struct)` / `first(array)` buffer is not hash-aggregable, so
  * Spark plans a SORT aggregate over n·k rows each carrying the full
  * embedding array. At the semantic family's adaptive k = ⌊√n⌋ that
  * intermediate is Θ(n^1.5) ROWS of ~0.5 KB (45 GB at the round-9
  * sf10 scaling point, externally sorted — measured 398 s vs the
  * ~120 s a linear-in-pairs build predicts). This expression keeps the
  * same n·k·dim flops but moves them into one whole-stage-codegen'd
  * loop per row: no join, no shuffle, no sort, no intermediate — the
  * E-step output is exactly n rows, and build time scales with the
  * flop count at any k.
  *
  * The codebook rides along as reference objects (ids + row-major
  * flattened matrix), the same way Spark MLlib's KMeans broadcasts its
  * centers each Lloyd iteration — it is a bounded MODEL (≤ 4096 × dim
  * doubles ≈ 2 MB under Similarity.adaptiveCells' clamp), not data.
  *
  * Bit-compatibility with the declarative form it replaces (pinned by
  * NearestCentroidSpec against the old plan shape):
  *  - cosine = the CosineSimilarity fused loop: index-ordered dot and
  *    norm sums, `dot / (sqrt(nx) * sqrt(ny))`; the centroid norm and
  *    the vector norm are each still a pure index-ordered sum, so
  *    hoisting them out of the per-centroid loop changes no bits;
  *  - rounding = Spark's `round(x, 4)` double semantics:
  *    `BigDecimal.valueOf(x).setScale(4, HALF_UP)`, NaN/±Inf pass
  *    through unrounded;
  *  - argmax = `java.lang.Double.compare` (NaN greatest, 0.0 > -0.0 —
  *    Spark's double ordering), ascending centroid order with strict
  *    improvement, so ties keep the SMALLEST centroid_id exactly like
  *    `max(struct(cos_r, -centroid_id))`;
  *  - a malformed vector (length ≠ dim, or a null element) scores no
  *    centroid and yields `(smallest id, null cos)` — the value the
  *    old aggregate produced when every pair's cosine was null.
  */
case class NearestCentroid(
    child: Expression,
    ids: Array[Long],
    flat: Array[Double],
    dim: Int)
    extends UnaryExpression {

  require(ids.nonEmpty, "NearestCentroid needs a non-empty codebook")
  require(flat.length == ids.length * dim,
    s"codebook matrix ${flat.length} != k=${ids.length} x dim=$dim")

  // per-centroid squared norms, precomputed once per expression in the
  // same index order the fused cosine loop uses (bit-identical hoist)
  private lazy val normSq: Array[Double] = {
    val k = ids.length
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      var ny = 0.0
      var i = 0
      val base = c * dim
      while (i < dim) { val yv = flat(base + i); ny += yv * yv; i += 1 }
      out(c) = ny
      c += 1
    }
    out
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<double> input, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("centroid_id", LongType, nullable = false),
    StructField("cos_r", DoubleType, nullable = true)))

  // null input vector → null struct (the data contract forbids null
  // embeddings; anything downstream of one surfaces as a null cell)
  override def nullable: Boolean = child.nullable

  override def prettyName: String = "nearest_centroid"

  override def toString: String =
    s"nearest_centroid($child, k=${ids.length}, dim=$dim)"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val k = ids.length
    var bestId = ids(0)
    var bestCos = 0.0
    var bestNull = true
    if (x.numElements() == dim) {
      var hasNull = false
      var j = 0
      while (j < dim && !hasNull) { if (x.isNullAt(j)) hasNull = true; j += 1 }
      if (!hasNull) {
        val xs = new Array[Double](dim)
        var nx = 0.0
        var i = 0
        while (i < dim) {
          val xv = x.getDouble(i); xs(i) = xv; nx += xv * xv; i += 1
        }
        var c = 0
        while (c < k) {
          var dot = 0.0
          var i2 = 0
          val base = c * dim
          while (i2 < dim) { dot += xs(i2) * flat(base + i2); i2 += 1 }
          val r = NearestCentroid.round4(
            dot / (math.sqrt(nx) * math.sqrt(normSq(c))))
          if (bestNull || java.lang.Double.compare(r, bestCos) > 0) {
            bestNull = false; bestCos = r; bestId = ids(c)
          }
          c += 1
        }
      }
    }
    new GenericInternalRow(Array[Any](bestId, if (bestNull) null else bestCos))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("ncIds", ids, "long[]")
    val flatRef = ctx.addReferenceObj("ncFlat", flat, "double[]")
    val normRef = ctx.addReferenceObj("ncNorm", normSq, "double[]")
    // one per-expression scratch buffer, allocated once per task — the
    // vector is copied out of ArrayData once per row so the k-centroid
    // loop reads a flat double[]
    val xbuf = ctx.addMutableState("double[]", "ncXbuf",
      v => s"$v = new double[$dim];")
    val k = ids.length
    val bestId = ctx.freshName("bestId")
    val bestCos = ctx.freshName("bestCos")
    val bestNull = ctx.freshName("bestNull")
    val hasNull = ctx.freshName("hasNull")
    val nx = ctx.freshName("nx")
    val c = ctx.freshName("c")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val i2 = ctx.freshName("i2")
    val dot = ctx.freshName("dot")
    val xv = ctx.freshName("xv")
    val r = ctx.freshName("r")
    val cosv = ctx.freshName("cosv")
    val base = ctx.freshName("base")
    val vals = ctx.freshName("vals")
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |long $bestId = $idsRef[0];
         |double $bestCos = 0.0;
         |boolean $bestNull = true;
         |if ($a.numElements() == $dim) {
         |  boolean $hasNull = false;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if ($a.isNullAt($j)) { $hasNull = true; break; }
         |  }
         |  if (!$hasNull) {
         |    double $nx = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      double $xv = $a.getDouble($i);
         |      $xbuf[$i] = $xv;
         |      $nx += $xv * $xv;
         |    }
         |    for (int $c = 0; $c < $k; $c++) {
         |      double $dot = 0.0;
         |      int $base = $c * $dim;
         |      for (int $i2 = 0; $i2 < $dim; $i2++) {
         |        $dot += $xbuf[$i2] * $flatRef[$base + $i2];
         |      }
         |      double $cosv = $dot /
         |        (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($normRef[$c]));
         |      double $r;
         |      if (Double.isNaN($cosv) || Double.isInfinite($cosv)) {
         |        $r = $cosv;
         |      } else {
         |        $r = java.math.BigDecimal.valueOf($cosv)
         |          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue();
         |      }
         |      if ($bestNull || java.lang.Double.compare($r, $bestCos) > 0) {
         |        $bestNull = false; $bestCos = $r; $bestId = $idsRef[$c];
         |      }
         |    }
         |  }
         |}
         |Object[] $vals = new Object[2];
         |$vals[0] = (Object) $bestId;
         |$vals[1] = $bestNull ? null : (Object) $bestCos;
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($vals);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  /** Spark's `round(x, 4)` double semantics, replicated exactly so the
    * map-form E-step is bit-identical to the `round(cosine_similarity)`
    * column it replaces: NaN/±Inf pass through (they cannot enter a
    * BigDecimal), everything else rounds HALF_UP at 4 decimals via the
    * same `BigDecimal.valueOf` path Spark's Round codegen emits.
    */
  def round4(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Column-API entry point. `ids` must be sorted ascending (the
    * tie-break contract: first strict improvement wins ⇒ smallest id
    * on rounded-cosine ties); `flat` is the row-major (k × dim)
    * centroid matrix in the same order.
    */
  def nearestCentroid(emb: Column, ids: Array[Long], flat: Array[Double],
                      dim: Int): Column = {
    require(ids.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
      "centroid ids must be strictly ascending")
    GraftBridge.column(NearestCentroid(GraftBridge.expression(emb), ids, flat, dim))
  }
}
