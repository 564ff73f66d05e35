package graft.queries

/** PCA / PLS / clustering / imputation operators (SURVEY §2.10). */
object MlQueries extends QueryProvider {
  def all: Seq[Q] = Seq()
}
