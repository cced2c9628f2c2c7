package graft.queries

/** Aggregation point for the text-analysis waves. The former
  * 4,960-line single file is split (VERDICT r11 #6, continued r12 #6)
  * into [[TextDedupQueries]], [[TextAnalysisQueries]] and
  * [[TextIngestQueries]] with shared engine/oracle helpers in
  * [[TextShared]]; this object keeps the registration contract
  * (`defs`) stable for [[graft.SparkEntry]].
  */
object TextQueries {
  import ParityQueries.Q

  val defs: Seq[(String, Q, Option[String])] =
    TextDedupQueries.defs ++ TextAnalysisQueries.defs ++ TextIngestQueries.defs
}
