package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding subword tokenizer (Sennrich et al., ACL'16 —
  * public algorithm): learn a ranked merge table from corpus
  * statistics, then encode text as subword tokens by applying merges
  * greedily in rank order. The vocabulary/merge table IS the tokenizer
  * a training pipeline ships; token counts from it (not whitespace
  * words) are what a token-budget sampler or shard packer bills
  * against.
  *
  * Scale split, the [[graft.sim.IvfIndex.fit]] discipline: the ONLY
  * pass over the corpus is the distributed pretoken count (map-side
  * combined groupBy); merge training then runs driver-side over the
  * collected word-TYPE table — bounded by `maxWordTypes` of the
  * heaviest types, not by corpus size (the merge loop is inherently
  * sequential: each merge depends on the counts left by the previous
  * one). At 100 TB the type table for the reference pretokenizer is
  * millions of rows — MBs, not the corpus. Encoding is a per-row
  * kernel (native expression, per-thread memo keyed by pretoken) —
  * embarrassingly parallel, no shuffle.
  *
  * Deviation from the paper, documented: no end-of-word marker. Merges
  * act WITHIN pretokens ([[TextFunctions.BpePattern]] runs), and
  * detokenization is plain concatenation per pretoken — which makes
  * `concat(tokens) == concat(pretokens)` an exact invariant the DuckDB
  * oracle can assert without reimplementing BPE.
  */
object Bpe {

  private val pattern = java.util.regex.Pattern.compile(TextFunctions.BpePattern)

  /** Driver-side pretokenizer — EXACTLY the column-side
    * [[TextFunctions.bpeTokens]] (lowercase + same regex), so encode
    * invariants line up with q66's counts. */
  def pretokens(text: String): Array[String] = {
    // Locale.ROOT: Spark's lower() is locale-independent — a Turkish
    // default locale would otherwise lower 'I' differently here than
    // in the column-side pretokenizer
    val m = pattern.matcher(text.toLowerCase(java.util.Locale.ROOT))
    val out = mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toArray
  }

  /** Classic merge training over a (wordType, count) table: each round
    * counts adjacent symbol pairs weighted by word count, merges the
    * most frequent pair everywhere, and records it. Ties break to the
    * lexicographically smallest pair; training stops early once no
    * pair occurs twice (merging singletons is noise). Deterministic:
    * same counts → same merges, independent of input order. */
  def trainFromCounts(wordCounts: Seq[(String, Long)],
                      numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] = wordCounts
      .map { case (w, n) => (cpSplit(w), n) }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.length < numMerges) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      val best = pairCounts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, (p, n)) => acc match {
          case Some((bp, bn)) if bn > n || (bn == n && pairLe(bp, p)) => acc
          case _ => Some((p, n))
        }
      }
      best match {
        case Some((pair, n)) if n >= 2 =>
          merges += pair
          words = words.map { case (syms, cnt) => (mergePair(syms, pair), cnt) }
        case _ => continue = false
      }
    }
    merges.toSeq
  }

  /** Code-POINT symbol split — what the distributed fold's
    * `substring(w, i, 1)` does (UTF8String counts code points). The
    * old `w.map(_.toString)` split by UTF-16 code UNIT, which broke
    * every supplementary-plane pretoken (an emoji) into two lone
    * surrogate halves: un-mergeable, and not even valid strings on
    * their own (ADVICE r13 #3's root cause, one level below the
    * tie-break it flagged). */
  private[graft] def cpSplit(w: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Code-POINT lexicographic compare — the order Spark's UTF8String
    * `orderBy` uses (UTF-8 byte order ≡ code-point order). A plain
    * `String.compareTo` is UTF-16 code-UNIT order, which sorts every
    * supplementary-plane symbol (emoji — routine in the adversarially
    * diverse web text [[fitDistributedTable]] targets, surrogates
    * 0xD800–0xDFFF) BEFORE the BMP tail (0xE000–0xFFFF), so a count
    * tie between such symbols would break the pinned row-for-row
    * driver ≡ distributed equivalence (ADVICE r13 #3; BpeSpec pins the
    * emoji-vs-U+FFFD tie). */
  private[graft] def cpCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  private def pairLe(a: (String, String), b: (String, String)): Boolean = {
    val c = cpCompare(a._1, b._1)
    c < 0 || (c == 0 && cpCompare(a._2, b._2) <= 0)
  }

  private def mergePair(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Distributed fit: one corpus pass for pretoken-type counts (the
    * gated collect — `maxWordTypes` heaviest types, count-desc then
    * lexicographic so the cutoff is deterministic), then driver-side
    * [[trainFromCounts]]. */
  def fit(docs: DataFrame, numMerges: Int, maxWordTypes: Int = 1000000,
          textCol: String = "text", maxWordLen: Int = 256): Seq[(String, String)] = {
    val counts = docs
      .select(explode(TextFunctions.bpeTokens(col(textCol))).as("w"))
      // garbage guard, mirroring the encoder's piece cap: a megabyte
      // "word" is noise, not vocabulary, and would dominate the
      // driver-side merge loop's per-round scan
      .where(length(col("w")) <= maxWordLen)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(maxWordTypes)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromCounts(counts, numMerges)
  }

  /** Fully DISTRIBUTED merge training — the 100 TB twin of [[fit]].
    * [[fit]] collects the pretoken-TYPE table and loops on the driver,
    * which is right while that table fits one machine (MBs for natural
    * language); on adversarially diverse text (web garbage, code
    * identifiers, URLs) the type table itself stops fitting, and this
    * variant never collects it: the one corpus pass builds the
    * distributed (symbols, count) vocabulary, then each round is a
    * vocabulary-bounded adjacent-pair census (map-side combined) + a
    * ONE-ROW argmax collect (the union-find convergence-probe
    * discipline) + a map-side fold applying the merge — lineage cut
    * per round, so the plan never deepens.
    *
    * Semantics are EXACTLY [[trainFromCounts]] on the same counts
    * (BpeSpec pins the two merge tables row-for-row): ties break to
    * the lexicographically smallest pair, training stops early once no
    * pair occurs twice, the left-to-right non-overlapping fold equals
    * the driver loop's mergePair (a greedy fold cannot re-consume a
    * token it just merged, because the comparison is against the
    * MERGED symbol).
    *
    * Returns the merge table itself — (merge_step, lhs, rhs, merged,
    * pair_count) — which is also what makes the whole training loop
    * exactly oracle-able in SQL (q287), where [[fit]]'s collected loop
    * never was. */
  def fitDistributedTable(docs: DataFrame, numMerges: Int,
                          textCol: String = "text", maxWordLen: Int = 256): DataFrame = {
    val spark = docs.sparkSession
    val chain = graft.ops.Lineage.newChain("bpefit")
    try {
      var vocab = graft.ops.Lineage.cut(
        docs.select(explode(TextFunctions.bpeTokens(col(textCol))).as("w"))
          .where(length(col("w")) <= maxWordLen) // fit's garbage guard
          .groupBy("w").agg(count(lit(1)).as("cnt"))
          .select(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
            .as("syms"), col("cnt")),
        chain)
      val rows = mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
      var step = 1
      var continue = true
      while (continue && step <= numMerges) {
        val top = vocab.where(size(col("syms")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(syms) - 1), " +
              "i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"))
            .as("p"), col("cnt"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("cnt")).as("pc"))
          .orderBy(col("pc").desc, col("l"), col("r"))
          .limit(1).collect()
        if (top.isEmpty || top(0).getLong(2) < 2) continue = false
        else {
          val (l, r, pc) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          rows += ((step.toLong, l, r, l + r, pc))
          val li = lit(l); val ri = lit(r)
          // left-to-right non-overlapping merge as a fold: append x, or
          // replace the accumulator's tail with the merged symbol when
          // (tail, x) is the winning pair (literals via Column, never a
          // SQL string — symbols can contain quotes)
          vocab = graft.ops.Lineage.cut(
            vocab.select(
              aggregate(col("syms"), array().cast("array<string>"),
                // size guard FIRST: ANSI element_at throws on an empty
                // array (And short-circuits in eval, so the guard is real)
                (acc, x) => when(size(acc) > 0 &&
                    element_at(acc, -1) === li && x === ri,
                    concat(slice(acc, lit(1), size(acc) - 1), array(concat(li, ri))))
                  .otherwise(concat(acc, array(x)))).as("syms"),
              col("cnt")),
            chain)
          step += 1
        }
      }
      import spark.implicits._
      rows.toSeq.toDF("merge_step", "lhs", "rhs", "merged", "pair_count")
      // deleteLast = true (ADVICE r13 #4): the returned frame is built
      // from the collected merge rows, so the final vocab checkpoint is
      // never read again — keeping it leaked one directory per run.
    } finally graft.ops.Lineage.endChain(spark, chain, deleteLast = true)
  }

  /** Greedy rank-order encode of ONE pretoken: start from characters,
    * repeatedly merge the adjacent pair with the lowest merge rank
    * until none applies. */
  def applyMerges(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = cpSplit(word)
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        syms = mergePair(syms, (syms(bestAt), syms(bestAt + 1)))
        done = syms.length < 2
      }
    }
    syms
  }

  /** The fitted merge list from a TRAINED merge table (the
    * [[fitDistributedTable]] output, or the same table read back from
    * wherever the training job persisted it): a numMerges-row collect —
    * KB-scale FITTED data, the k-bounded centroid-fetch discipline —
    * that [[encode]]'s native expression then ships with the plan.
    * This closes the train→encode loop cluster-side end to end
    * (VERDICT r13 #8): the corpus is never collected, the driver only
    * ever holds the merge table itself. */
  def ranksFromTable(merges: DataFrame): Seq[(String, String)] =
    merges.orderBy(col("merge_step"))
      .select(col("lhs"), col("rhs")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** Column API: text → array<string> subword tokens under `merges`. */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    GraftSqlShim.column(BpeEncode(GraftSqlShim.expression(text), merges))
}

/** Native BPE encoder: pretokenize + greedy merge, one JVM kernel per
  * row. The fitted merge table rides on the expression instance (the
  * PqEncode codebook precedent — fitted data, not a plan-time literal,
  * so this stays DataFrame-only by design). A per-THREAD memo caches
  * encoded pretokens — natural-language corpora follow Zipf's law, so
  * the hit rate approaches the repeat rate of the running vocabulary
  * (the [[DeflateRatio]] ThreadLocal precedent; bounded at 64k entries
  * with clear-on-overflow so a pathological corpus can't pin memory).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)],
                     maxWordLen: Int = 256)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bpe_encode expects string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  @transient private lazy val memo =
    ThreadLocal.withInitial[mutable.HashMap[String, Array[UTF8String]]](
      () => mutable.HashMap.empty)

  override def nullSafeEval(input: Any): Any = {
    val cache = memo.get()
    if (cache.size > 65536) cache.clear()
    val out = mutable.ArrayBuffer.empty[UTF8String]
    Bpe.pretokens(input.asInstanceOf[UTF8String].toString).foreach { w =>
      // adversarial-length guard: greedy merging is O(len²) per
      // pretoken, so one megabyte garbage "word" (the AdvFixture
      // monster-row shape) would stall its executor core for hours.
      // Over-long pretokens encode in maxWordLen-char pieces — still
      // lossless under concatenation, and real vocabulary never gets
      // near the cap (these pieces also bypass the memo: each is
      // near-unique and would only churn it)
      if (w.length <= maxWordLen)
        out ++= cache.getOrElseUpdate(w,
          Bpe.applyMerges(w, ranks).map(UTF8String.fromString))
      else
        w.grouped(maxWordLen).foreach(piece =>
          out ++= Bpe.applyMerges(piece, ranks).map(UTF8String.fromString))
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
