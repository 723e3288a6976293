package graft.queries

/** Training-data pipeline operators (dedup / similarity / text analysis /
  * multimodal) — filled in by graft.pipeline.
  */
object Pipeline {
  def qs: Seq[Q] = Seq()
}
