package graft

/** Section C of SURVEY.md §2 — training-data pipeline operators. */
object TrainingDataOps {
  val defs: Seq[QueryDef] = Seq.empty
}
