package graft.queries

object TextOps {
  val qs: Seq[Q] = Seq()
}
