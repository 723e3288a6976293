package graft.queries

/** Queries routed through the sydraQL front-end (lexer→parser→validator→
  * DataFrame compiler) — filled in as the front-end lands.
  */
object SydraQlQueries {
  def qs: Seq[Q] = Seq()
}
