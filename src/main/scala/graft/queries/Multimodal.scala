package graft.queries

object Multimodal {
  val qs: Seq[Q] = Seq()
}
