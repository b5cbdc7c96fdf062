package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** hyperplane_sig(vec: array<float|double>) -> long: sign bits of `planes`
  * seeded hyperplanes against a precomputed plane matrix — one tight loop
  * per row instead of planes literal-array HOF folds. */
case class HyperplaneSigExpr(child: Expression, planes: Int, dim: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float|double>")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"
  @transient private lazy val planeMat: Array[Double] = {
    val m = new Array[Double](planes * dim)
    var p = 0
    while (p < planes) {
      var i = 0
      while (i < dim) { m(p * dim + i) = Similarity.planeComponent(p, i, seed); i += 1 }
      p += 1
    }
    m
  }
  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    var sig = 0L
    var p = 0
    while (p < planes) {
      val off = p * dim
      var acc = 0.0
      var i = 0
      if (isFloat) while (i < n) { acc += arr.getFloat(i).toDouble * planeMat(off + i); i += 1 }
      else while (i < n) { acc += arr.getDouble(i) * planeMat(off + i); i += 1 }
      if (acc >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Similarity search over an embedding column (array<float>).
  *
  * Baseline: brute-force cosine top-k — one scan, no shuffle except the
  * final top-k (orderBy + limit is a distributed TakeOrdered, not a full
  * sort). Scale path: random-hyperplane LSH buckets so each query probes
  * one bucket (plus neighbors) instead of the full corpus.
  * Dot products via `functions.aggregate`/`zip_with` (codegen'd, no UDF).
  */
object Similarity {

  /** Dot product of two array<float/double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n > 0, d / n).otherwise(0.0)
  }

  /** Deterministic pseudo-random hyperplane component (plane p, dim i). */
  private[pipeline] def planeComponent(p: Int, i: Int, seed: Long): Double = {
    var x = seed ^ (p.toLong * 0x9E3779B97F4A7C15L) ^ (i.toLong * 0xBF58476D1CE4E5B9L)
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x = x ^ (x >>> 31)
    // map to [-1, 1)
    (x >>> 11).toDouble / (1L << 52).toDouble - 1.0
  }

  /** Sign-bit signature of `planes` seeded hyperplanes (as a long).
    * A custom expression with a precomputed plane matrix: the equivalent
    * higher-order-function column (per-plane literal array + zip_with +
    * aggregate) walks Catalyst's interpreted eval per element — ~100x
    * slower for planes*dim multiply-adds. Bit math is identical
    * (sequential double fold, float->double per element), so signatures —
    * and every LSH bucket/oracle downstream — are unchanged. */
  def hyperplaneSignature(vec: Column, planes: Int, dim: Int, seed: Long): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      HyperplaneSigExpr(org.apache.spark.sql.GraftColumnBridge.expression(vec),
        planes, dim, seed))

  /** Reference (HOF-column) formulation, kept for the differential spec. */
  private[pipeline] def hyperplaneSignatureHof(vec: Column, planes: Int, dim: Int, seed: Long): Column = {
    val bits = (0 until planes).map { p =>
      val plane = array((0 until dim).map(i => lit(planeComponent(p, i, seed))): _*)
      when(dot(vec, plane) >= 0, lit(1L << p)).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Brute-force cosine top-k for one query vector. Deterministic
    * tie-break on id. Plan: scan -> project cosine -> TakeOrdered(k). */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Float], k: Int): DataFrame = {
    val qArr = array(query.map(v => lit(v.toDouble)): _*)
    corpus.select(col(idCol), cosine(col(vecCol), qArr).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** LSH-bucketed ANN: probe the query's bucket plus all 1-bit-flip
    * neighbor buckets (multi-probe), then exact-rank within candidates.
    * At corpus scale the bucketed table is precomputed/persisted once. */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
              query: Seq[Float], k: Int, planes: Int = 12,
              dim: Int = 64, seed: Long = 42L): DataFrame = {
    val bucketed = corpus.withColumn("__sig",
      hyperplaneSignature(col(vecCol), planes, dim, seed))
    // compute the query signature on the driver with the same math
    val qsig = (0 until planes).map { p =>
      val d = (0 until dim).map(i => query(i).toDouble * planeComponent(p, i, seed)).sum
      if (d >= 0) 1L << p else 0L
    }.reduce(_ | _)
    val probes = qsig +: (0 until planes).map(b => qsig ^ (1L << b))
    val qArr = array(query.map(v => lit(v.toDouble)): _*)
    bucketed.filter(col("__sig").isin(probes.map(Long.box): _*))
      .select(col(idCol), cosine(col(vecCol), qArr).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }
}
