package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern exact-substring matcher: one Aho–Corasick pass over
  * the text yields a bitmask of which of ≤64 literal patterns occur.
  * The alternative — k `contains` predicates — rescans the text k
  * times per row; at 100 TB × a benchmark-canary list that is k full
  * corpus reads of CPU, where the automaton is one, with an early
  * exit once every pattern has been seen. The automaton is converted
  * to a full DFA over ASCII at build time (missing transitions
  * resolved through failure links once, driver-side), so matching is
  * ONE array index per character — no fail-chain walk, no per-char
  * allocation — via a single virtual call per row from generated
  * code.
  *
  * Patterns must be non-empty ASCII (the dense transition table is
  * 128-wide); text may contain any character — a non-ASCII char
  * simply resets the automaton to the root, which is exact, because
  * no pattern can span it. Matching is case-sensitive over the
  * verbatim pattern strings ("benchmark answer" matches inside
  * "xbenchmark answers"); callers wanting case-folding lower both
  * sides first.
  */
case class MatchMask(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty && patterns.size <= 64,
    s"graft_match_mask takes 1..64 patterns, got ${patterns.size}")
  require(patterns.forall(p => p.nonEmpty && p.forall(_ < 128)),
    "graft_match_mask patterns must be non-empty ASCII")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_match_mask"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_match_mask expects string, got ${other.simpleString}")
  }

  /** All-patterns-found mask — the early-exit sentinel. */
  private val fullMask: Long =
    if (patterns.size == 64) -1L else (1L << patterns.size) - 1

  // Built lazily on first use on each side of the serialization
  // boundary; size = (total pattern chars + 1) states × 128 ints.
  @transient private lazy val automaton: MatchMask.DFA =
    MatchMask.build(patterns)

  /** One pass; called from both interpreted and generated code. */
  def run(text: UTF8String): Long = {
    val dfa = automaton
    val goto = dfa.goto
    val out = dfa.out
    val s = text.toString
    var state = 0
    var mask = 0L
    var i = 0
    val n = s.length
    while (i < n && mask != fullMask) {
      val c = s.charAt(i)
      state = if (c < 128) goto((state << 7) | c) else 0
      mask |= out(state)
      i += 1
    }
    mask
  }

  override def nullSafeEval(input: Any): Any =
    run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matchMask", this, classOf[MatchMask].getName)
    defineCodeGen(ctx, ev, c => s"$ref.run($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MatchMask {

  /** `goto` is the dense state×128 transition table (state<<7 | char);
    * `out` holds each state's accumulated pattern mask, pre-propagated
    * along failure links at build time. */
  final case class DFA(goto: Array[Int], out: Array[Long])

  def build(patterns: Seq[String]): DFA = {
    val maxStates = patterns.map(_.length).sum + 1
    // trie phase: -1 = no transition yet
    val goto = Array.fill(maxStates << 7)(-1)
    val out = new Array[Long](maxStates)
    var nStates = 1
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var st = 0
      p.foreach { c =>
        val idx = (st << 7) | c
        if (goto(idx) == -1) { goto(idx) = nStates; nStates += 1 }
        st = goto(idx)
      }
      out(st) |= (1L << pi)
    }
    // BFS phase: resolve every missing transition through the failure
    // link (full-DFA conversion) and fold failure outputs in
    val fail = new Array[Int](nStates)
    val queue = new scala.collection.mutable.Queue[Int]
    var c = 0
    while (c < 128) {
      val v = goto(c)
      if (v == -1) goto(c) = 0
      else { fail(v) = 0; queue += v }
      c += 1
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      out(u) |= out(fail(u))
      var ch = 0
      while (ch < 128) {
        val idx = (u << 7) | ch
        val v = goto(idx)
        if (v == -1) goto(idx) = goto((fail(u) << 7) | ch)
        else { fail(v) = goto((fail(u) << 7) | ch); queue += v }
        ch += 1
      }
    }
    DFA(java.util.Arrays.copyOf(goto, nStates << 7), out)
  }
}
