package org.apache.spark.ml.graft.loss

import org.apache.spark.ml.impl.Utils.{softmax, EPSILON}
import org.apache.spark.ml.linalg.{DenseVector, Vector, Vectors}

/** Pluggable GBM loss algebra (reference: boosting/GBMLoss.scala —
  * re-derived from the published formulas: Friedman 2001 for the
  * regression family, Friedman/Hastie/Tibshirani 2000 for the
  * classification family).
  *
  * `dim` is the dimension of the additive model: 1 for every regression
  * loss and for margin-coded binary losses (exponential/bernoulli), K for
  * multinomial logloss.
  */
sealed trait GBMLoss extends Serializable {
  def dim: Int
  def encodeLabel(label: Double): Array[Double]
  def loss(label: Array[Double], prediction: Array[Double]): Double
  def gradient(label: Array[Double], prediction: Array[Double]): Array[Double]
  def negativeGradient(label: Array[Double], prediction: Array[Double]): Array[Double] = {
    val g = gradient(label, prediction)
    var i = 0
    while (i < g.length) { g(i) = -g(i); i += 1 }
    g
  }
}

trait HasHessian { self: GBMLoss =>
  def hessian(label: Array[Double], prediction: Array[Double]): Array[Double]
}

/** Losses whose full dim x dim hessian is cheap to form per row. The
  * K-dimensional step-vector search needs the cross-class terms (the
  * diagonal alone would make coordinate Newton unsound for softmax); with
  * the full matrix a damped Newton solve replaces ~20 L-BFGS-B objective
  * passes with 2-3.
  */
trait HasFullHessian { self: GBMLoss =>
  /** Row-major dim x dim hessian of the loss at `prediction`. */
  def fullHessian(label: Array[Double], prediction: Array[Double]): Array[Double]
}

/** Scalar (dim=1) convenience layer. */
trait GBMScalarLoss extends GBMLoss {
  final override def dim: Int = 1
  def loss(y: Double, f: Double): Double
  def gradient(y: Double, f: Double): Double
  override def encodeLabel(label: Double): Array[Double] = Array(label)
  final override def loss(label: Array[Double], prediction: Array[Double]): Double =
    loss(label(0), prediction(0))
  final override def gradient(label: Array[Double], prediction: Array[Double]): Array[Double] =
    Array(gradient(label(0), prediction(0)))
}

trait HasScalarHessian extends HasHessian { self: GBMScalarLoss =>
  def hessian(y: Double, f: Double): Double
  final override def hessian(label: Array[Double], prediction: Array[Double]): Array[Double] =
    Array(hessian(label(0), prediction(0)))
}

sealed trait GBMRegressionLoss extends GBMScalarLoss

sealed trait GBMClassificationLoss extends GBMLoss {
  /** Map the accumulated raw score vector to class probabilities. */
  def raw2probabilityInPlace(raw: DenseVector): DenseVector
  /** Raw score vector from the (possibly scalar) additive model output. */
  def toRaw(accumulated: Array[Double], numClasses: Int): Vector
}

/** 1/2 (y-f)^2 */
case object SquaredLoss extends GBMRegressionLoss with HasScalarHessian {
  override def loss(y: Double, f: Double): Double = 0.5 * (y - f) * (y - f)
  override def gradient(y: Double, f: Double): Double = f - y
  override def hessian(y: Double, f: Double): Double = 1.0
}

/** |y-f| */
case object AbsoluteLoss extends GBMRegressionLoss {
  override def loss(y: Double, f: Double): Double = math.abs(y - f)
  override def gradient(y: Double, f: Double): Double = math.signum(f - y)
}

/** log cosh(y-f) — smooth absolute loss. */
case object LogCoshLoss extends GBMRegressionLoss with HasScalarHessian {
  override def loss(y: Double, f: Double): Double = {
    val r = y - f
    // numerically-stable log cosh: |r| + log1p(exp(-2|r|)) - log 2
    math.abs(r) + math.log1p(math.exp(-2.0 * math.abs(r))) - math.log(2.0)
  }
  override def gradient(y: Double, f: Double): Double = math.tanh(f - y)
  override def hessian(y: Double, f: Double): Double = {
    val t = math.tanh(f - y)
    math.max(1.0 - t * t, 1e-12)
  }
}

/** Asymmetric log-cosh: alpha weight on under-prediction (f < y), 1-alpha
  * on over-prediction.
  */
final case class ScaledLogCoshLoss(alpha: Double) extends GBMRegressionLoss with HasScalarHessian {
  require(alpha > 0 && alpha < 1)
  private def scale(y: Double, f: Double): Double = if (f < y) alpha else 1.0 - alpha
  override def loss(y: Double, f: Double): Double = scale(y, f) * LogCoshLoss.loss(y, f)
  override def gradient(y: Double, f: Double): Double = scale(y, f) * LogCoshLoss.gradient(y, f)
  override def hessian(y: Double, f: Double): Double = scale(y, f) * LogCoshLoss.hessian(y, f)
}

/** Huber with fixed delta (the estimator refreshes delta per iteration as
  * the alpha-quantile of |residual| — reference: regression/GBMRegressor
  * .scala:342-353).
  */
final case class HuberLoss(delta: Double) extends GBMRegressionLoss {
  require(delta > 0)
  override def loss(y: Double, f: Double): Double = {
    val r = math.abs(y - f)
    if (r <= delta) 0.5 * r * r else delta * (r - 0.5 * delta)
  }
  override def gradient(y: Double, f: Double): Double = {
    val r = y - f
    if (math.abs(r) <= delta) f - y else -delta * math.signum(r)
  }
}

/** Pinball / quantile loss. */
final case class QuantileLoss(quantile: Double) extends GBMRegressionLoss {
  require(quantile > 0 && quantile < 1)
  override def loss(y: Double, f: Double): Double =
    if (y >= f) quantile * (y - f) else (1.0 - quantile) * (f - y)
  override def gradient(y: Double, f: Double): Double =
    if (y > f) -quantile else 1.0 - quantile
}

/** Multinomial deviance over a K-dimensional score vector; labels one-hot
  * encoded; p = softmax(f); grad = p - y; hess = p(1-p) clamped.
  */
final case class LogLoss(numClasses: Int)
    extends GBMClassificationLoss with HasHessian with HasFullHessian {
  require(numClasses >= 2)
  override def dim: Int = numClasses

  override def encodeLabel(label: Double): Array[Double] = {
    val a = new Array[Double](numClasses)
    a(label.toInt) = 1.0
    a
  }

  private def probs(prediction: Array[Double]): Array[Double] = {
    val p = prediction.clone()
    softmax(p)
    p
  }

  override def loss(label: Array[Double], prediction: Array[Double]): Double = {
    val p = probs(prediction)
    var s = 0.0
    var k = 0
    while (k < numClasses) {
      if (label(k) == 1.0) s -= math.log(math.max(p(k), EPSILON))
      k += 1
    }
    s
  }

  override def gradient(label: Array[Double], prediction: Array[Double]): Array[Double] = {
    val p = probs(prediction)
    var k = 0
    while (k < numClasses) { p(k) -= label(k); k += 1 }
    p
  }

  override def hessian(label: Array[Double], prediction: Array[Double]): Array[Double] = {
    val p = probs(prediction)
    var k = 0
    while (k < numClasses) { p(k) = math.max(p(k) * (1.0 - p(k)), 1e-2); k += 1 }
    p
  }

  /** Softmax hessian: H_jk = p_j (delta_jk - p_k) — independent of the
    * label. Unclamped (the step solver applies its own damping).
    */
  override def fullHessian(label: Array[Double], prediction: Array[Double]): Array[Double] = {
    val p = probs(prediction)
    val h = new Array[Double](numClasses * numClasses)
    var j = 0
    while (j < numClasses) {
      var k = 0
      while (k < numClasses) {
        h(j * numClasses + k) =
          if (j == k) p(j) * (1.0 - p(j)) else -p(j) * p(k)
        k += 1
      }
      j += 1
    }
    h
  }

  override def raw2probabilityInPlace(raw: DenseVector): DenseVector = {
    softmax(raw.values)
    raw
  }

  override def toRaw(accumulated: Array[Double], numClasses: Int): Vector =
    Vectors.dense(accumulated)
}

/** Margin-coded (y in {-1,+1}) binary losses: the additive model is a
  * scalar f; raw = (-f, f); p(1) follows the loss's own link.
  */
sealed trait MarginLoss extends GBMClassificationLoss with HasHessian {
  final override def dim: Int = 1
  final override def encodeLabel(label: Double): Array[Double] =
    Array(if (label == 1.0) 1.0 else -1.0)
  def loss1(y: Double, f: Double): Double
  def gradient1(y: Double, f: Double): Double
  def hessian1(y: Double, f: Double): Double
  final override def loss(label: Array[Double], prediction: Array[Double]): Double =
    loss1(label(0), prediction(0))
  final override def gradient(label: Array[Double], prediction: Array[Double]): Array[Double] =
    Array(gradient1(label(0), prediction(0)))
  final override def hessian(label: Array[Double], prediction: Array[Double]): Array[Double] =
    Array(math.max(hessian1(label(0), prediction(0)), 1e-2))
  final override def toRaw(accumulated: Array[Double], numClasses: Int): Vector =
    Vectors.dense(-accumulated(0), accumulated(0))
  final override def raw2probabilityInPlace(raw: DenseVector): DenseVector = {
    // p(+1) = sigma(2 f) where f = raw(1)
    val p1 = 1.0 / (1.0 + math.exp(-2.0 * raw.values(1)))
    raw.values(0) = 1.0 - p1
    raw.values(1) = p1
    raw
  }
}

/** AdaBoost exponential loss exp(-y f). */
case object ExponentialLoss extends MarginLoss {
  override def loss1(y: Double, f: Double): Double = math.exp(-y * f)
  override def gradient1(y: Double, f: Double): Double = -y * math.exp(-y * f)
  override def hessian1(y: Double, f: Double): Double = math.exp(-y * f)
}

/** Binomial deviance on the +/-1 coding: log(1 + exp(-2 y f)). */
case object BernoulliLoss extends MarginLoss {
  override def loss1(y: Double, f: Double): Double = math.log1p(math.exp(-2.0 * y * f))
  override def gradient1(y: Double, f: Double): Double = {
    val e = math.exp(2.0 * y * f)
    -2.0 * y / (1.0 + e)
  }
  override def hessian1(y: Double, f: Double): Double = {
    val e = math.exp(2.0 * y * f)
    4.0 * e / ((1.0 + e) * (1.0 + e))
  }
}
