package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern scan (Aho & Corasick, CACM 1975) — the
  * blocklist/safety-term pass a curation pipeline runs with THOUSANDS
  * of patterns: one automaton walk over the text finds every
  * occurrence of every pattern (including overlapping and nested
  * matches — "he" inside "she" is reported, the classic AC property),
  * where the per-pattern-regex alternative costs |patterns| passes.
  * Matching is case-sensitive over UTF-16 code units (lower() upstream
  * for case-folding — declared, not guessed).
  *
  * Returns one LONG count per pattern (input order). The automaton is
  * built once per expression instance (`@transient lazy` — rebuilt per
  * executor, never serialized) and reaches generated code as a
  * reference object: the hot loop is a per-row automaton walk inside
  * whole-stage codegen, zero shuffle, zero UDF boxing. */
case class AhoCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty strings")

  override def dataType: DataType = ArrayType(LongType, false)
  override def prettyName: String = "graft_aho_counts"

  @transient private lazy val automaton = new AhoAutomaton(patterns)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      automaton.counts(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftAho", automaton,
      classOf[AhoAutomaton].getName)
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"$ref.counts($c.toString()))")
  }

  override protected def withNewChildInternal(
      newChild: Expression): AhoCounts = copy(child = newChild)
}

/** Classic goto/fail/output automaton over chars; built eagerly from
  * the pattern list, walked per row. */
final class AhoAutomaton(patterns: Seq[String]) extends Serializable {
  // trie as growable arrays: per node a char→next map, fail link, and
  // the pattern indexes ENDING here (own + inherited via fail closure)
  private val next =
    scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
  private val fail = scala.collection.mutable.ArrayBuffer(0)
  private val outs =
    scala.collection.mutable.ArrayBuffer(List.empty[Int])

  patterns.zipWithIndex.foreach { case (p, pi) =>
    var s = 0
    p.foreach { ch =>
      val m = next(s)
      val t = m.get(ch)
      if (t == null) {
        next += new java.util.HashMap[Character, Integer]()
        fail += 0
        outs += Nil
        m.put(ch, next.size - 1)
        s = next.size - 1
      } else s = t
    }
    outs(s) = pi :: outs(s)
  }
  // BFS fail links + output closure
  locally {
    val queue = new java.util.ArrayDeque[Int]()
    next(0).forEach((_, v) => { fail(v) = 0; queue.add(v) })
    while (!queue.isEmpty) {
      val u = queue.poll()
      next(u).forEach { (ch, v) =>
        queue.add(v)
        var f = fail(u)
        while (f != 0 && next(f).get(ch) == null) f = fail(f)
        val t = next(f).get(ch)
        fail(v) = if (t != null && t != v) t else 0
        outs(v) = outs(v) ++ outs(fail(v))
      }
    }
  }
  private val nextArr = next.toArray
  private val failArr = fail.toArray
  private val outsArr = outs.map(_.toArray).toArray
  val nPatterns: Int = patterns.size

  /** Per-pattern occurrence counts over `text`. */
  def counts(text: String): Array[Long] = {
    val out = new Array[Long](nPatterns)
    var s = 0
    var i = 0
    while (i < text.length) {
      val ch = Character.valueOf(text.charAt(i))
      var t = nextArr(s).get(ch)
      while (t == null && s != 0) { s = failArr(s); t = nextArr(s).get(ch) }
      s = if (t != null) t else 0
      val os = outsArr(s)
      var j = 0
      while (j < os.length) { out(os(j)) += 1L; j += 1 }
      i += 1
    }
    out
  }
}
