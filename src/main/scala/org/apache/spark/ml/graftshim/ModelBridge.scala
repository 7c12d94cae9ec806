package org.apache.spark.ml.graftshim

import org.apache.spark.ml.classification.LogisticRegressionModel
import org.apache.spark.ml.linalg.Vectors

/** The reference ships pre-trained model weights (pickled sklearn
  * models loaded by services/ml-models/src/models/model_manager.py);
  * the MLlib analog is a [[LogisticRegressionModel]] constructed from
  * published coefficients. That constructor is `private[spark]`, so —
  * like sql.graftshim.ColumnBridge — this one-object shim lives in the
  * org.apache.spark namespace to re-export it. Everything else about
  * the model (transform, probability pipeline) is the public API.
  */
object ModelBridge {
  def logistic(uid: String, coefficients: Array[Double],
               intercept: Double): LogisticRegressionModel =
    new LogisticRegressionModel(uid, Vectors.dense(coefficients), intercept)
}
