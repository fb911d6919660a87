package graft

/** Section A of SURVEY.md §2 — the arcane-stream-parquet surface. */
object ReferenceOps {
  val defs: Seq[QueryDef] = Seq.empty
}
