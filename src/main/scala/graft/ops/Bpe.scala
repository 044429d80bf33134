package graft.ops

/** Real merge-table byte-pair encoding — the tokenizer the packing /
  * token-budget family counts with (beyond the `BpeIshPattern` regex
  * proxy in [[TextAnalysis]]).
  *
  * [[Merges]] is a COMMITTED fixture: 40 merges trained offline by
  * classic BPE (count adjacent symbol pairs weighted by word frequency,
  * merge the most frequent, repeat; ties broken lexicographically) over
  * the gate corpus's word distribution — a static artifact exactly like
  * a shipped `merges.txt`, applied at query time, never retrained.
  *
  * Encoding algorithm (the published greedy merge loop): start from the
  * word's characters; repeatedly find the LOWEST-RANK merge whose pair
  * occurs adjacently and merge its LEFTMOST occurrence; stop when no
  * merge applies. Merging one-occurrence-at-a-time leftmost is
  * equivalent to the merge-all-occurrences-per-step formulation for a
  * fixed pair (merging the leftmost occurrence neither creates nor
  * destroys other occurrences of the same pair), and the one-step form
  * is what the DuckDB oracle replays symbolically: the symbol sequence
  * as a space-delimited string, `instr`/`substr` surgery on the
  * min-rank pattern, recursed to the fixpoint — validated
  * symbol-for-symbol against this implementation.
  *
  * Scale shape: encoding is a per-row JVM kernel (a codegen'd Catalyst
  * expression — [[graft.functions.VectorExpressions.bpeTokenCount]]),
  * with a per-executor memo keyed by word: the corpus's Zipfian word
  * distribution means almost every lookup is a cache hit, so the merge
  * loop runs ~once per DISTINCT word per executor, not once per token.
  */
object Bpe {

  /** Rank-ordered merge table (rank = index). */
  val Merges: IndexedSeq[(String, String)] = Vector(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"),
    ("s", "mall"), ("g", "e"), ("l", "ow"))

  /** Serializable encoder over a merge table, with a per-executor word
    * memo (transient — rebuilt empty after deserialization). */
  final class Coder(merges: IndexedSeq[(String, String)])
      extends Serializable {
    private val rank: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

    /** Greedy merge-table encoding of one word (empty → no tokens). */
    def encodeWord(word: String): Array[String] =
      if (word.isEmpty) Array.empty
      else memo.computeIfAbsent(word, w => {
        val syms = scala.collection.mutable.ArrayBuffer(
          w.map(_.toString): _*)
        var done = false
        while (!done) {
          var bestR = Int.MaxValue
          var bestI = -1
          var i = 0
          while (i < syms.length - 1) {
            rank.get((syms(i), syms(i + 1))) match {
              case Some(r) if r < bestR => bestR = r; bestI = i
              case _ =>
            }
            i += 1
          }
          if (bestI < 0) done = true
          else {
            syms(bestI) = syms(bestI) + syms(bestI + 1)
            syms.remove(bestI + 1)
          }
        }
        syms.toArray
      })

    /** Total token count over a word array (null words count 0). */
    def countAll(words: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
      var total = 0L
      var i = 0
      val n = words.numElements()
      while (i < n) {
        if (!words.isNullAt(i))
          total += encodeWord(words.getUTF8String(i).toString).length
        i += 1
      }
      total
    }

    /** The full tokenization as one space-joined string (the digest the
      * oracle rebuilds via string_agg over per-word fixpoints). */
    def encodeAll(words: org.apache.spark.sql.catalyst.util.ArrayData): String = {
      val sb = new java.lang.StringBuilder
      var i = 0
      val n = words.numElements()
      while (i < n) {
        if (!words.isNullAt(i)) {
          val toks = encodeWord(words.getUTF8String(i).toString)
          var j = 0
          while (j < toks.length) {
            if (sb.length > 0) sb.append(' ')
            sb.append(toks(j))
            j += 1
          }
        }
        i += 1
      }
      sb.toString
    }
  }

  /** The shared coder over [[Merges]]. */
  val coder: Coder = new Coder(Merges)

  /** The merge table as DuckDB VALUES rows — the oracle SQL is generated
    * from the SAME fixture, so the two engines cannot drift. */
  def mergesSqlValues: String =
    Merges.zipWithIndex
      .map { case ((a, b), r) => s"($r, '$a', '$b')" }
      .mkString(", ")
}
