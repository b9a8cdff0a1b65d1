package graft

import Queries._

/** LLM-training-data pipeline operators over documents/embeddings
  * (dedup, similarity search, text analysis, multimodal). */
object PipelineQueries {
  def all: Seq[Q] = Seq()
}
