/*
 * graft — a from-scratch Spark-native ensemble-learning engine with the
 * capabilities of pierrenodet/spark-ensemble (see /root/repo/SURVEY.md).
 *
 * The package lives under org.apache.spark.ml so that the handful of
 * `private[ml]` / `private[spark]` Spark utilities the spark.ml estimator
 * contract practically requires (DefaultParamsWriter/Reader, MetadataUtils,
 * XORShiftRandom, ml.impl.Utils) stay reachable — the same pragmatic choice
 * the reference makes (reference: build.sbt:1, core/src/main/scala path).
 */
package org.apache.spark.ml

import org.apache.spark.ml.classification.{
  ClassificationModel, Classifier, ProbabilisticClassificationModel,
  ProbabilisticClassifier
}
import org.apache.spark.ml.linalg.Vector

/** Type algebra abstracting over "any spark.ml predictor" used as a base
  * learner (reference: core ensemble/package.scala:32-67 — re-derived, not
  * copied: these are the only existential shapes that satisfy
  * `Predictor`'s F-bounded signature).
  */
package object graft {

  type EnsemblePredictorType = Predictor[Vector, E, M] forSome {
    type E <: Predictor[Vector, E, M]
    type M <: PredictionModel[Vector, M]
  }

  type EnsemblePredictionModelType = PredictionModel[Vector, M] forSome {
    type M <: PredictionModel[Vector, M]
  }

  type EnsembleClassifierType = Classifier[Vector, E, M] forSome {
    type E <: Classifier[Vector, E, M]
    type M <: ClassificationModel[Vector, M]
  }

  type EnsembleClassificationModelType = ClassificationModel[Vector, M] forSome {
    type M <: ClassificationModel[Vector, M]
  }

  type EnsembleProbabilisticClassifierType =
    ProbabilisticClassifier[Vector, E, M] forSome {
      type E <: ProbabilisticClassifier[Vector, E, M]
      type M <: ProbabilisticClassificationModel[Vector, M]
    }

  type EnsembleProbabilisticClassificationModelType =
    ProbabilisticClassificationModel[Vector, M] forSome {
      type M <: ProbabilisticClassificationModel[Vector, M]
    }

  type EnsembleRegressorType = Predictor[Vector, E, M] forSome {
    type E <: Predictor[Vector, E, M]
    type M <: PredictionModel[Vector, M]
  }

  type EnsembleRegressionModelType = EnsemblePredictionModelType
}
