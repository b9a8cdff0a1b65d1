package graft

import Queries._

/** Scalar/aggregate function surface (SURVEY §2.3, §2.5, §2.6). */
object FunctionQueries {
  def all: Seq[Q] = Seq()
}
