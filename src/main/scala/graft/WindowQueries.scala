package graft

import Queries._

/** Window/PTF + grouping-sets parity (SURVEY §2.4, §2.9). */
object WindowQueries {
  def all: Seq[Q] = Seq()
}
