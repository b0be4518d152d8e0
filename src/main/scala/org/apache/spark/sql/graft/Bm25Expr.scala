// Lives under org.apache.spark.sql to reach the private[sql] expression
// SPI — same packaging rationale as VecExprs.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Okapi BM25 score of a text column against a FIXED query, with the
  * corpus statistics (N, avgdl, per-term df) embedded as literals at
  * construction — the scalar form of the reference's
  * `kw <&> to_bm25query('idx', query)` operator
  * (/root/reference/vechord/client.py:356-380), which likewise binds a
  * named index's statistics into the score expression.
  *
  * Self-contained and evaluable anywhere (tokenize → tf/dl → weighted
  * sum — the brute-force path scans every row), which is what lets
  * [[graft.plans.AnnTopKRule]] treat a plain
  * `orderBy(bm25_score.desc).limit(k)` plan as a declarative keyword
  * search: the rule injects a candidate semi-join from the registered
  * postings index and this expression survives as the exact re-rank
  * over the candidates. Stats are FROZEN at construction (build the
  * column from the index you registered); the sum matches
  * [[graft.ops.Bm25.search]]'s per-term weights exactly, rounded to
  * `roundTo` like the operator path.
  *
  * Codegen calls back into [[score]] via a reference object, so the
  * expression never breaks a WholeStageCodegen span. Per-row cost is
  * O(dl · |terms|) — fine as a re-rank over k·refine candidates; as an
  * unregistered full-corpus scan it is the documented brute fallback.
  */
case class Bm25Score(child: Expression, terms: Seq[String],
                     dfs: Seq[Long], n: Long, avgdl: Double,
                     tok: graft.functions.Tokenizers.Tokenizer,
                     roundTo: Int)
  extends UnaryExpression with ImplicitCastInputTypes with Serializable {

  override def prettyName: String = "bm25_score"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType

  // The TOKENIZER IS CAPTURED AT BIND TIME and serializes with the
  // expression (the vocab rides in the task binary): an executor
  // evaluating the brute-force path never resolves by name, so
  // runtime-registered vocabs (Tokenizers.wordpiece) work off-driver
  // where each executor JVM's registry is empty.
  @transient private lazy val idf: Array[Double] = {
    val a = new Array[Double](terms.length)
    var i = 0
    while (i < terms.length) {
      a(i) = math.log((n - dfs(i) + 0.5) / (dfs(i) + 0.5) + 1.0)
      i += 1
    }
    a
  }

  /** Public for generated code. */
  def score(text: UTF8String): Double = {
    val toks = tok.scala(text.toString)
    val dl = toks.length
    var acc = 0.0
    var i = 0
    while (i < terms.length) {
      if (dfs(i) > 0) {
        val t = terms(i)
        var tf = 0
        var j = 0
        while (j < toks.length) {
          if (toks(j) == t) tf += 1
          j += 1
        }
        if (tf > 0)
          acc += idf(i) * (tf * (graft.ops.Bm25.K1 + 1)) /
            (tf + graft.ops.Bm25.K1 * ((1 - graft.ops.Bm25.B) +
              graft.ops.Bm25.B * dl / avgdl))
      }
      i += 1
    }
    // same rounding as the operator path's round(sum(w), roundTo)
    java.math.BigDecimal.valueOf(acc)
      .setScale(roundTo, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  override protected def nullSafeEval(input: Any): Any =
    score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bm25", this,
      classOf[Bm25Score].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.score($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Bm25Score = copy(child = newChild)
}
