package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the LLM-data-pipeline operators.
  * Everything here is composed from codegen'd built-in expressions —
  * no UDFs — so the hot path stays inside whole-stage codegen and
  * scales linearly with no driver involvement.
  *
  * Reference seed: Hive's text aggregates ngrams/context_ngrams/sentences
  * (ql/udf/generic/GenericUDAFnGrams.java, GenericUDFSentences.java) —
  * re-expressed Spark-first as array transforms + distributed counting.
  */
object TextOps {

  /** Lowercased alphanumeric tokens. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => length(t) > 0)

  /** Word n-gram shingles ("a b c" for n=3) from a token array. */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))

  /** Character n-gram shingles of a string. */
  def charShingles(c: Column, n: Int): Column =
    transform(sequence(lit(1), greatest(length(c) - (n - 1), lit(1))),
      i => c.substr(i, lit(n)))

  /** MinHash signature: k independent min-hashes over a shingle array.
    * hash_j(s) = xxhash64(s, j) — per-slot seed via combined hashing. */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(shingles, s => xxhash64(s, j))))

  /** LSH band keys from a minhash signature: bands × rowsPerBand layout,
    * each band hashed to one long. Equal band key ⇒ candidate pair. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band"),
        xxhash64(concat_ws(",",
          transform(slice(sig, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)),
            _.cast("string")))).as("key")))

  private def bitsOf(h: Column): Column =
    transform(sequence(lit(0), lit(63)),
      i => when(call_function("shiftright", h, i).bitwiseAND(lit(1L)) === 1L,
        lit(1L)).otherwise(lit(-1L)))

  /** 64-bit SimHash over a token array: per-token hash bit votes, packed
    * back into one long. Pure expression — per-row, no shuffle. */
  def simhash64(toks: Column): Column = {
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc, bitsOf(xxhash64(t)), (a, b) => a + b))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i))
          .otherwise(lit(0L))),
      lit(0L),
      (a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two packed 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")
}
