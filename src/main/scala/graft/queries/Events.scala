package graft.queries

object Events {
  val qs: Seq[Q] = Seq()
}
