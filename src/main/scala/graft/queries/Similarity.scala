package graft.queries

object Similarity {
  val qs: Seq[Q] = Seq()
}
