package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SeqMatchOp

/** Randomized cross-check: the streaming NFA discipline used by
  * matchPattern agrees with a brute-force scan-from-each-position
  * reference on thousands of random label streams and a panel of
  * patterns. Runs the automaton directly (no Spark) — the Spark
  * plumbing is covered by SeqMatchSpec.
  */
class SeqMatchPropertySpec extends AnyFunSuite {

  /** Brute force: attempt a shortest match starting at each position;
    * a dead attempt rescans from the row that killed it (the streaming
    * restart discipline); after a match, continue past its end. */
  private def bruteForce(
      nfa: SeqMatchOp.Nfa, labels: Vector[String]): List[(Int, Int)] = {
    val out = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
    var start = 0
    while (start < labels.length) {
      var states = nfa.initial
      var i = start
      var matched = -1
      var deadAt = -1
      while (i < labels.length && matched < 0 && deadAt < 0) {
        states = nfa.step(states, labels(i))
        if (states.isEmpty) deadAt = i
        else if (nfa.accepts(states)) matched = i
        else i += 1
      }
      if (matched >= 0) { out += ((start, matched)); start = matched + 1 }
      else if (deadAt >= 0 && deadAt > start) start = deadAt
      else start += 1
    }
    out.toList
  }

  /** The streaming matcher loop of matchPattern (single key). */
  private def streaming(
      nfa: SeqMatchOp.Nfa, labels: Vector[String]): List[(Int, Int)] = {
    val out = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
    var states = nfa.initial
    var runStart = -1
    var i = 0
    while (i < labels.length) {
      val l = labels(i)
      var nxt = nfa.step(states, l)
      if (nxt.isEmpty) {
        states = nfa.initial; runStart = -1
        nxt = nfa.step(states, l)
        if (nxt.nonEmpty) { states = nxt; runStart = i }
        else states = nfa.initial
      } else {
        states = nxt
        if (runStart < 0) runStart = i
      }
      if (states.nonEmpty && nfa.accepts(states)) {
        out += ((runStart, i))
        states = nfa.initial; runStart = -1
      }
      i += 1
    }
    out.toList
  }

  private val patterns = Seq(
    "a b", "a b* c", "a+ b", "a b? c", "( a | b ) c",
    "a ( b | c )* a", "a? b+", "( a b )+", "a b* b c?",
    "a a b", "c ( a | b )+ c")

  test("streaming NFA equals brute-force on 5000 random streams") {
    val rnd = new Random(20260812L)
    val alphabet = Vector("a", "b", "c")
    for (_ <- 1 to 5000; pattern <- Seq(patterns(rnd.nextInt(patterns.size)))) {
      val n = rnd.nextInt(24)
      val labels = Vector.fill(n)(alphabet(rnd.nextInt(3)))
      val nfa = SeqMatchOp.compile(pattern)
      val bf = bruteForce(nfa, labels)
      val st = streaming(nfa, labels)
      assert(st == bf,
        s"pattern=[$pattern] labels=${labels.mkString}")
    }
  }
}
