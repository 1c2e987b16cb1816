package graft.queries

object Dedup {
  val qs: Seq[Q] = Seq()
}
