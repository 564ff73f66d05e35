package graft.queries

/** Training-data pipeline operators (dedup, similarity, text analysis). */
object TextQueries extends QueryProvider {
  def all: Seq[Q] = Seq()
}
