package graft.queries

/** Statistics operators (SURVEY §2.10) — filled in incrementally. */
object StatQueries extends QueryProvider {
  def all: Seq[Q] = Seq()
}
