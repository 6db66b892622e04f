package graft.evaluate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.{NER, Relations}

/**
 * C9 Bayes rescoring (evaluate/Probabilities.java:18-102; applied at
 * SimpleSlotFiller.java:209-222 behind `Props.TEST_PROBABILITYPRIORS`,
 * OFF by default — same default here):
 *
 *   P(v | rel, e) = P(rel | e, v) · P(v | e) / P(rel | e)
 *
 * with the reference's own approximations: P(rel|e,v) = the classifier
 * score, P(v|e) = 1.0, and P(rel|e) = prior(rel) / Σ priors of the
 * entity type's relations. The rescored value can exceed 1 (the
 * reference logs and keeps it; so do we).
 */
object Probabilities {

  val ofRelationTypePERSON: Double =
    Relations.all.filter(_.entityType == NER.PERSON).map(_.prior).sum
  val ofRelationTypeORGANIZATION: Double =
    Relations.all.filter(_.entityType == NER.ORGANIZATION).map(_.prior).sum

  def ofRelationGivenEntity(rel: String): Double = {
    val m = Relations.byName(rel)
    m.prior / (if (m.entityType == NER.PERSON) ofRelationTypePERSON
               else ofRelationTypeORGANIZATION)
  }

  def ofSlotValueGivenRelationAndEntity(classifierScore: Double,
                                        rel: String): Double =
    classifierScore * 1.0 / ofRelationGivenEntity(rel)

  /** Rescore a fills frame (columns incl. pred, score) — one broadcast
   *  map-literal lookup, codegen'd. */
  def rescore(fills: DataFrame): DataFrame = {
    val m = typedLit(Relations.names.map(n =>
      n -> ofRelationGivenEntity(n)).toMap)
    fills.withColumn("score", col("score") / element_at(m, col("pred")))
  }
}
