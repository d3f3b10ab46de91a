package graft.etl

import org.apache.spark.sql.types._

/** Input schemas for the two reference CSV pipelines.
  *
  * Everything is StringType on purpose: the reference is schema-on-read
  * with all-string fields (`/root/reference/etl.js:5-10`,
  * `etl-assessment-level.js:17`; SURVEY §1.1) and emits scores as JSON
  * strings. Numeric casts happen only where the reference casts
  * (`+attemptCount`, `etl-assessment-level.js:91`).
  */
object CaliperSchemas {

  /** 16-column item-level export (`etl.js:5-10`). */
  val itemSchema: StructType = StructType(Seq(
    "identity_id", "login_identity_id", "school_id", "assessment_id",
    "assessment_version", "attempt_id", "assmtitem_id", "assmtitem_version",
    "assessment_type_id", "response_type", "question_time", "score_posible",
    "score_earned", "masterobjectives", "masterobjectivesid", "objectivenumber"
  ).map(StructField(_, StringType, nullable = true)))

  /** 13-column assessment-level export (`etl-assessment-level.js:17`). */
  val assessmentSchema: StructType = StructType(Seq(
    "identity_id", "login_identity_id", "school_id", "assessment_id",
    "assessment_version", "date_submitted", "assessment_type_id",
    "assessment_type", "attempt_id", "attemptnumber", "is_mastered",
    "score_earned", "score_posible"
  ).map(StructField(_, StringType, nullable = true)))
}
