package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Subword tokenizer for token counting / packing budgets.
  *
  * Vocabulary: byte-pair-encoding merges (Sennrich et al. 2016) trained
  * deterministically at class-init from the embedded seed corpus below —
  * no external files, fully reproducible, merges never cross a space so
  * tokens never span words. Inference: greedy longest-match against the
  * learned vocabulary (maximal munch — how WordPiece-family tokenizers
  * segment at inference time). Longest-match inference is what makes the
  * operator driver-verifiable: the exact same segmentation is expressible
  * in DuckDB as `regexp_extract_all` over the vocabulary ordered
  * longest-first (leftmost-first alternation + longest-first order =
  * maximal munch), so per-document counts get a real SQL oracle instead
  * of a test-only pin. (True merge-order BPE inference can differ from
  * longest-match on rare inputs; the learned vocabulary is the same.)
  */
object BpeVocab {

  /** Embedded training text: common English/German/Spanish/French function
    * words plus database/analytics vocabulary, lowercase a-z only (keeps
    * regex and SQL literal escaping trivial). Repetition approximates a
    * Zipfian skew so frequent words win merges first. */
  private val seed: String = {
    val en = "the a of and to in is on for with that it as was at by an be " +
      "this have from or had not are but what all were when we there can"
    val de = "der die das und ist nicht mit ein zu den von sie sich des auf " +
      "aus er hat dass sind war wie im eine auch es an werden nach bei"
    val es = "el los y es no para una del por como las se con su lo le da " +
      "mas pero sus al si sin sobre este ya entre cuando todo esta ser"
    val fr = "le la les et est pas pour dans une du que il en au plus ne se " +
      "ce qui nous vous ils aux avec sur son par mais comme tout faire"
    val db = "scan column window order sort part agg value line key join " +
      "merge group query vector hash slow stream filter fast spark batch " +
      "table small data big customer row dup select where insert update"
    // weight: function words 4x, domain words 6x (they dominate the corpora
    // this engine curates), one copy of everything for coverage
    Seq.fill(4)(en + " " + de + " " + es + " " + fr).mkString(" ") + " " +
      Seq.fill(6)(db).mkString(" ")
  }

  final val NumMerges = 256

  /** Classic BPE training: count adjacent token pairs over the word
    * multiset, merge the most frequent (ties: lexicographically smallest
    * pair), repeat. Deterministic by construction. */
  private def train(text: String, nMerges: Int): Vector[String] = {
    var words: Vector[(Array[String], Int)] = text.split(" ").filter(_.nonEmpty)
      .groupBy(identity).toVector.sortBy(_._1)
      .map { case (w, g) => (w.map(_.toString).toArray, g.length) }
    val merges = Vector.newBuilder[String]
    var k = 0
    var done = false
    while (k < nMerges && !done) {
      val pairs = mutable.Map.empty[(String, String), Int]
      words.foreach { case (toks, c) =>
        var i = 0
        while (i < toks.length - 1) {
          val p = (toks(i), toks(i + 1))
          pairs(p) = pairs.getOrElse(p, 0) + c
          i += 1
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val ((a, b), _) = pairs.toVector.minBy { case ((x, y), c) => (-c, x, y) }
        merges += (a + b)
        words = words.map { case (toks, c) =>
          val out = mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += toks(i); i += 1 }
          }
          (out.toArray, c)
        }
        k += 1
      }
    }
    merges.result()
  }

  /** Multi-char vocabulary entries (single chars are the implicit fallback),
    * deduplicated, longest-first then lexicographic — the exact order the
    * oracle regex alternation uses. */
  lazy val vocab: Vector[String] =
    train(seed, NumMerges).distinct.sortBy(t => (-t.length, t))

  lazy val maxLen: Int = vocab.map(_.length).max

  private[functions] lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  /** The equivalent DuckDB/RE2 segmentation pattern: vocabulary longest-
    * first, single-codepoint fallback last; (?s) so the fallback also
    * consumes newlines. Tokens are [a-z]+ so no escaping is needed. */
  lazy val oracleRegex: String = "(?s)" + (vocab :+ ".").mkString("|")
}

/** Standalone holder (NOT the expression's companion) so scalac emits the
  * static forwarder the generated code calls. */
object Bpe {
  /** Greedy longest-match token count — mirrors `regexp_extract_all` over
    * [[BpeVocab.oracleRegex]]: at each position take the longest vocabulary
    * entry, else consume one code point. */
  def count(s: String): Long = {
    val n = s.length
    val set = BpeVocab.vocabSet
    val maxLen = BpeVocab.maxLen
    var i = 0
    var tokens = 0L
    while (i < n) {
      var l = math.min(maxLen, n - i)
      var matched = 0
      while (l >= 2 && matched == 0) {
        if (set.contains(s.substring(i, i + l))) matched = l
        l -= 1
      }
      if (matched > 0) i += matched
      else i += Character.charCount(s.codePointAt(i)) // '.' eats a code point
      tokens += 1L
    }
    tokens
  }
}

/** `bpe_token_count(text)`: token count under the BPE-trained vocabulary
  * with greedy longest-match segmentation. Codegen'd scalar, O(n · maxLen)
  * per row, no shuffle implications — the packing/budget primitive. */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override protected def nullSafeEval(input: Any): Any =
    Bpe.count(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.count($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}
