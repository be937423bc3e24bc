package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SegmentIndex
import graft.sources.SegmentIndex.TriReq

/** Property test for the regex → trigram-requirement compiler: on random
  * regexes from a generative grammar, any string that MATCHES the regex
  * must SATISFY the requirement tree (literal containment / AND / OR).
  * That implication is exactly what makes manifest pruning sound — a
  * segment lacking a required trigram can be skipped only if no matching
  * string can avoid containing the literal.
  *
  * Matching strings are produced alongside each regex by construction
  * (pick a branch per alternation, repeat quantified atoms a random
  * legal number of times), then double-checked with java.util.regex.
  */
class TrigramPropertySpec extends AnyFunSuite {

  // a generated pattern = (regex fragment, generator of matching strings)
  private case class Pat(re: String, sample: Gen[String])

  private val litChar: Gen[Char] = Gen.oneOf(('a' to 'h') ++ ('0' to '3'))

  private def litRun(maxLen: Int): Gen[Pat] =
    for {
      n <- Gen.chooseNum(1, maxLen)
      cs <- Gen.listOfN(n, litChar)
    } yield { val s = cs.mkString; Pat(s, Gen.const(s)) }

  private val dotAtom: Gen[Pat] =
    litChar.map(c => Pat(".", Gen.const(c.toString)))

  private val classAtom: Gen[Pat] = Gen.oneOf(
    Pat("[xyz]", Gen.oneOf("x", "y", "z")),
    // small range (expands to a literal family in the compiler)
    Pat("[a-c]", Gen.oneOf("a", "b", "c")),
    // wide range (stays Free)
    Pat("[a-h]", Gen.oneOf("a", "c", "e", "h")),
    // nested class union (Java semantics: {a} ∪ {b,c} ∪ {d})
    Pat("[a[bc]d]", Gen.oneOf("a", "b", "c", "d")),
    // intersection with negation: [a-h] ∩ ¬{b,c}
    Pat("[a-h&&[^bc]]", Gen.oneOf("a", "d", "e", "f", "g", "h")))

  private val escapeAtom: Gen[Pat] = Gen.oneOf(
    Pat("\\d", Gen.oneOf("0", "1", "2", "3")),
    Pat("\\w", Gen.oneOf("a", "b", "0")),
    // operand-bearing escapes: the compiler must bail (Free) rather than
    // read the operand digits as literal requirements
    Pat("\\x61", Gen.const("a")),
    Pat("\\0141", Gen.const("a")),
    Pat("\\p{Lower}", Gen.oneOf("a", "b", "c")),
    // quoted literals, bare and with a tail-binding quantifier (the
    // quantifier applies to the last quoted char only)
    Pat("\\Qa.c\\E", Gen.const("a.c")),
    Pat("\\Qab\\E?", Gen.oneOf("a", "ab")),
    Pat("\\Qab\\E{1,2}", Gen.oneOf("ab", "abb")))

  private def quantified(inner: Pat): Gen[Pat] = Gen.oneOf(
    // ? : zero or one
    Gen.oneOf(true, false).map(keep =>
      Pat(s"(?:${inner.re})?", if (keep) inner.sample else Gen.const(""))),
    // + : one to three
    Gen.chooseNum(1, 3).map(k =>
      Pat(s"(?:${inner.re})+",
        Gen.listOfN(k, inner.sample).map(_.mkString))),
    // {2,3}
    Gen.chooseNum(2, 3).map(k =>
      Pat(s"(?:${inner.re}){2,3}",
        Gen.listOfN(k, inner.sample).map(_.mkString))))

  // unique named-group names across one generated pattern (Java rejects
  // duplicate names within a pattern)
  private val nameCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  private def alternation(depth: Int): Gen[Pat] =
    for {
      n <- Gen.chooseNum(2, 3)
      branches <- Gen.listOfN(n, sequence(depth - 1))
      pick <- Gen.chooseNum(0, n - 1)
      // group spellings the compiler must all see through: capturing,
      // non-capturing, NAMED capturing, inline-flagged
      wrap <- Gen.oneOf("(", "(?:", "(?named>", "(?i:", "(?s:")
    } yield {
      val open =
        if (wrap == "(?named>") s"(?<g${nameCounter.incrementAndGet()}>"
        else wrap
      Pat(
        branches.map(_.re).mkString(open, "|", ")"),
        Gen.delay(branches(pick).sample))
    }

  // short-literal alternation groups: the exact-set path ((ab|cd)ef
  // requires {abef, cdef}) — members too short to carry a trigram alone
  private val shortAltGroup: Gen[Pat] =
    for {
      n <- Gen.chooseNum(2, 3)
      branches <- Gen.listOfN(n, litRun(2))
      pick <- Gen.chooseNum(0, n - 1)
      opt <- Gen.oneOf("", "?")
    } yield Pat(
      branches.map(_.re).mkString("(", "|", ")") + opt,
      if (opt == "?") Gen.oneOf(Gen.const(""), branches(pick).sample)
      else branches(pick).sample)

  // big bounded repeats of multi-member classes: the capped-enumeration
  // path (x[ab]{7}y) where the block must not bind to both neighbors
  private val bigRepeat: Gen[Pat] =
    for {
      m <- Gen.chooseNum(5, 8)
      cls <- Gen.oneOf(("[ab]", Gen.oneOf("a", "b")),
        ("[abc]", Gen.oneOf("a", "b", "c")), ("a", Gen.const("a")))
      body <- Gen.listOfN(m, cls._2)
    } yield Pat(s"${cls._1}{$m}", Gen.const(body.mkString))

  // lookaround spellings: positive lookahead plans its inner trigrams
  // (the zero-width prefix is then CONSUMED by the following atoms, so
  // samples satisfy both); negative lookahead and lookbehind stay
  // requirement-free ('z' is outside the sample alphabet, so (?!zz…)
  // and (?<!zz…) never reject a generated string)
  private val lookaroundAtom: Gen[Pat] = Gen.oneOf(
    for { p <- litRun(4); t <- litRun(3) } yield
      Pat(s"(?=${p.re})${p.re}${t.re}", Gen.const(p.re + t.re)),
    for { p <- litRun(3); c <- litChar } yield
      Pat(s"(?=${p.re}.)${p.re}$c", Gen.const(p.re + c)),
    // lookahead over an alternation of the following text's prefix
    for { p <- litRun(3); q <- litRun(3); t <- litRun(2) } yield
      Pat(s"(?=${p.re}|${q.re})${p.re}${t.re}",
        Gen.const(p.re + t.re)),
    for { t <- litRun(4) } yield Pat(s"(?!zz)${t.re}", Gen.const(t.re)),
    for { t <- litRun(4) } yield Pat(s"${t.re}(?<!zz)", Gen.const(t.re)),
    // positive lookbehind re-asserting the text just consumed
    for { p <- litRun(4); t <- litRun(3) } yield
      Pat(s"${p.re}(?<=${p.re})${t.re}", Gen.const(p.re + t.re)))

  // lookaround NESTED INSIDE an alternation branch (the r9 verdict's
  // composition case, e.g. `(a(?=b)|c)d`): the planner must treat the
  // lookahead's requirement as branch-local — AND-ing it into the OTHER
  // branch would wrongly prune strings that take that branch. Samples
  // exercise both branches; in `(p(?=t)|q)t` branch 1's lookahead is
  // satisfied by the following tail, branch 2 never sees it.
  private val nestedLookaroundAlt: Gen[Pat] = Gen.oneOf(
    for { p <- litRun(3); q <- litRun(3); t <- litRun(3);
          first <- Gen.oneOf(true, false) } yield
      Pat(s"(${p.re}(?=${t.re})|${q.re})${t.re}",
        Gen.const((if (first) p.re else q.re) + t.re)),
    // negative lookaround inside one branch (never rejects: 'z' is
    // outside the sample alphabet) — must not poison the alternation
    for { p <- litRun(3); q <- litRun(3); t <- litRun(2);
          first <- Gen.oneOf(true, false) } yield
      Pat(s"(${p.re}(?!zz)|${q.re})${t.re}",
        Gen.const((if (first) p.re else q.re) + t.re)),
    // lookbehind re-asserting its own branch's text
    for { p <- litRun(3); q <- litRun(3); t <- litRun(2);
          first <- Gen.oneOf(true, false) } yield
      Pat(s"(${p.re}(?<=${p.re})|${q.re})${t.re}",
        Gen.const((if (first) p.re else q.re) + t.re)),
    // optional group around a lookahead-carrying alternation: the whole
    // group contributes NO requirement (it can match empty)
    for { p <- litRun(3); q <- litRun(3); t <- litRun(3);
          mode <- Gen.chooseNum(0, 2) } yield
      Pat(s"((?=${p.re})${p.re}|${q.re})?${t.re}",
        Gen.const(mode match {
          case 0 => t.re         // group skipped entirely
          case 1 => q.re + t.re  // branch 2
          case _ => p.re + t.re  // branch 1, lookahead self-satisfied
        })))

  private def atom(depth: Int): Gen[Pat] =
    if (depth <= 0) Gen.oneOf(litRun(6), dotAtom, classAtom, escapeAtom)
    else Gen.frequency(
      4 -> litRun(6),
      1 -> dotAtom,
      1 -> classAtom,
      1 -> escapeAtom,
      1 -> shortAltGroup,
      1 -> bigRepeat,
      1 -> lookaroundAtom,
      1 -> nestedLookaroundAlt,
      2 -> alternation(depth),
      // quantify only UNQUANTIFIED base atoms: nesting quantifiers over
      // single-char wildcards ((?:(?:\d)+)+) makes the java.util.regex
      // sanity check itself explode with catastrophic backtracking
      1 -> Gen.lzy(
        Gen.oneOf(litRun(6), dotAtom, classAtom, escapeAtom)
          .flatMap(quantified)))

  private def sequence(depth: Int): Gen[Pat] =
    for {
      n <- Gen.chooseNum(1, 4)
      parts <- Gen.listOfN(n, atom(depth))
    } yield Pat(
      parts.map(_.re).mkString,
      Gen.sequence[List[String], String](parts.map(_.sample)).map(_.mkString))

  /** Does `s` satisfy the requirement tree? */
  private def satisfies(s: String, r: TriReq): Boolean = r match {
    case TriReq.Free => true
    case TriReq.Lit(l) => l.length < 3 || s.contains(l)
    case TriReq.All(xs) => xs.forall(satisfies(s, _))
    case TriReq.AnyOf(xs) => xs.exists(satisfies(s, _))
  }

  test("matching strings always satisfy the trigram requirement tree") {
    val gen = for {
      p <- sequence(3)
      s <- p.sample
    } yield (p.re, s)
    var checked = 0
    for (i <- 0 until 500) {
      val (re, s) = gen(Gen.Parameters.default, Seed(i.toLong)).get
      // sanity: the constructed sample really matches
      assert(s.matches(re), s"generator bug: '$s' !~ /$re/ (seed $i)")
      val req = SegmentIndex.requiredTrigrams(re)
      assert(satisfies(s, req),
        s"soundness violation: '$s' matches /$re/ but fails $req (seed $i)")
      checked += 1
    }
    assert(checked == 500)
  }

  test("requirement is not vacuous on plain literals") {
    // guard against the trivial 'always Free' implementation
    assert(SegmentIndex.requiredTrigrams("abcdef") == TriReq.Lit("abcdef"))
    assert(SegmentIndex.requiredTrigrams("abc(def|ghi)") != TriReq.Free)
  }

  test("literal families: classes and optionals strengthen, not break, the run") {
    import TriReq._
    // gr[ae]y: the class merges into the run as an alternative family
    assert(SegmentIndex.requiredTrigrams("gr[ae]y") ==
      AnyOf(Seq(Lit("gray"), Lit("grey"))))
    // colou?r: optional char becomes the classic two-spelling requirement
    assert(SegmentIndex.requiredTrigrams("colou?r") ==
      AnyOf(Seq(Lit("color"), Lit("colour"))))
    // \Q…\E quotes metachars into a literal requirement
    assert(SegmentIndex.requiredTrigrams("\\Qa.b+c\\E") == Lit("a.b+c"))
    // a quantifier after \E binds to the LAST quoted char only (Java:
    // xx\Qab\E?yy matches "xxayy") — the requirement must not demand
    // the whole quoted run
    assert(satisfies("xxayy", SegmentIndex.requiredTrigrams("xx\\Qab\\E?yy")))
    assert(SegmentIndex.requiredTrigrams("xx\\Qab\\E?yy") match {
      case AnyOf(xs) => xs.toSet == Set(Lit("xxayy"), Lit("xxabyy"))
      case _ => false
    })
    // \Qab\E{2} matches "abb", never "abab"
    assert(satisfies("abb", SegmentIndex.requiredTrigrams("\\Qab\\E{2}")))
    assert(satisfies("xaz", SegmentIndex.requiredTrigrams("x\\Qab\\E*z")))
    // class repetition stays bounded and exact: [ab]{2} → 4 alternatives
    assert(SegmentIndex.requiredTrigrams("x[ab]{2}y") match {
      case AnyOf(xs) => xs.toSet == Set(
        Lit("xaay"), Lit("xaby"), Lit("xbay"), Lit("xbby"))
      case _ => false
    })
    // small ranges expand ([a-c] ≤ 4 chars); wide/open ranges stay Free
    assert(SegmentIndex.requiredTrigrams("er[a-c]or") match {
      case AnyOf(xs) =>
        xs.toSet == Set(Lit("eraor"), Lit("erbor"), Lit("ercor"))
      case _ => false
    })
    assert(SegmentIndex.requiredTrigrams("x[a-z]y") == Free)
    // one short/empty alternative makes the family vacuous, never wrong:
    // (ab)?cd requires nothing (cd alone is < 3 chars)
    assert(SegmentIndex.requiredTrigrams("[xy]") == Free)
    // soundness spot checks against real matches
    for ((re, s) <- Seq(
        ("gr[ae]y", "grey"), ("colou?r", "color"), ("x[ab]{2}y", "xbay"),
        (".*\\Qa.b+c\\E.*", "za.b+cz"), ("err[0-9]or", "err5or"),
        ("\\Qhttp://\\E[a-z]+\\Q.com\\E", "http://site.com")))
      assert(s.matches(re) &&
        satisfies(s, SegmentIndex.requiredTrigrams(re)), s"$re vs $s")
  }

  test("named / flagged / atomic groups are seen through; lookaround " +
    "and x-flag groups stay Free") {
    import TriReq._
    // named capture participates in the exact-set product like (?:
    assert(SegmentIndex.requiredTrigrams("(?<amt>foo|bar)baz") ==
      AnyOf(Seq(Lit("foobaz"), Lit("barbaz"))))
    // inline flags with a body parse the body ('i' is safe: both index
    // and probe lowercase their trigrams)
    assert(SegmentIndex.requiredTrigrams("(?i:foo)bar") == Lit("foobar"))
    assert(SegmentIndex.requiredTrigrams("(?s:foo.bar)qux") ==
      All(Seq(Lit("foo"), Lit("bar"), Lit("qux"))))
    // atomic group: language ⊆ body's, body requirement is sound
    assert(SegmentIndex.requiredTrigrams("(?>foo)bar") == Lit("foobar"))
    // x-flag changes tokenization: whitespace/comments must NOT become
    // literal requirements
    assert(SegmentIndex.requiredTrigrams("(?x:f o o)bar") == Lit("bar"))
    assert(satisfies("foobar", SegmentIndex.requiredTrigrams("(?x:f o o)bar")))
    // NEGATIVE lookaround remains a requirement-free zone
    assert(SegmentIndex.requiredTrigrams("(?!foo)bar") == Lit("bar"))
    assert(SegmentIndex.requiredTrigrams("(?<!foo)bar") == Lit("bar"))
    // positive lookbehind: the inner match ended here, so it's in the
    // document — its trigrams are required (short inner → no trigram)
    assert(SegmentIndex.requiredTrigrams("(?<=foo)bar") ==
      All(Seq(Lit("foo"), Lit("bar"))))
    assert(satisfies("xbar", SegmentIndex.requiredTrigrams("(?<=x)bar")))
    // POSITIVE lookahead: the inner pattern is a required match whose
    // trigrams prune; zero-width, so it never joins a literal run
    assert(SegmentIndex.requiredTrigrams("(?=foo)bar") ==
      All(Seq(Lit("foo"), Lit("bar"))))
    assert(SegmentIndex.requiredTrigrams("(?=\\d+px)qux") == Lit("qux"))
    // quantified lookahead: optional → no requirement from it
    assert(SegmentIndex.requiredTrigrams("(?:(?=foo))?bar") == Lit("bar"))
    // inexact inner alternation still contributes its AnyOf
    assert(SegmentIndex.requiredTrigrams("(?=foo|buzz)barn") ==
      All(Seq(AnyOf(Seq(Lit("foo"), Lit("buzz"))), Lit("barn"))))
  }

  test("exact-set product: nested groups of sub-trigram literals compose " +
    "into prunable requirements") {
    import TriReq._
    assert(SegmentIndex.requiredTrigrams("ab(cd|ef)gh") ==
      AnyOf(Seq(Lit("abcdgh"), Lit("abefgh"))))
    // two-level nesting
    assert(SegmentIndex.requiredTrigrams("((a|b)(x|y))cd") match {
      case AnyOf(xs) => xs.toSet == Set(
        Lit("axcd"), Lit("aycd"), Lit("bxcd"), Lit("bycd"))
      case _ => false
    })
    // optional group factorization: (ab)?cdef keeps cdef required and
    // the dominated longer spelling is dropped
    assert(SegmentIndex.requiredTrigrams("(ab)?cdef") == Lit("cdef"))
    // an inexact branch poisons only the exactness, not the requirement
    assert(SegmentIndex.requiredTrigrams("(abc|d+)efg") ==
      Lit("efg"))
    for ((re, s) <- Seq(
        ("ab(cd|ef)gh", "xxabefghyy"), ("((a|b)(x|y))cd", "bycd"),
        ("(ab)?cdef", "cdef"), ("(abc|d+)efg", "ddddefg"),
        ("err(or|ors)? ", "err "))) {
      assert(java.util.regex.Pattern.compile(re).matcher(s).find(),
        s"$re should find in $s")
      assert(satisfies(s, SegmentIndex.requiredTrigrams(re)), s"$re vs $s")
    }
  }

  test("a capped repeat of a multi-member family must not bind to BOTH " +
    "neighbors (regression: x[ab]{7}y vs xabababby)") {
    // [ab]{7} caps at 4 enumerated copies; the enumerated block matches
    // the FIRST copies of the real text, so it may merge with the
    // preceding run but must break before the following one — merging
    // both sides demands a contiguous block adjacent to r AND q that a
    // 7-copy match need not contain
    val s = "xabababby"
    assert(s.matches("x[ab]{7}y"))
    assert(satisfies(s, SegmentIndex.requiredTrigrams("x[ab]{7}y")),
      s"requirement ${SegmentIndex.requiredTrigrams("x[ab]{7}y")}")
    // single-member repeats stay fully merged (suffix-aligned, sound)
    assert(satisfies("xaaaaaaay", SegmentIndex.requiredTrigrams("xa{7}y")))
  }

  test("operand-bearing escapes and nested classes never yield false requirements") {
    def sat(s: String, req: TriReq): Boolean = satisfies(s, req)
    // \x41 = 'A': the operand digits must NOT become required literals
    assert(sat("Aabc", SegmentIndex.requiredTrigrams("\\x41abc")))
    // \cJ = LF; \0101 = 'A'; \p{L} = any letter; \Q..\E literal quote
    assert(sat("xAy", SegmentIndex.requiredTrigrams("x\\0101y")))
    assert(sat("qz", SegmentIndex.requiredTrigrams("\\p{Lu}qz")))
    assert(sat("a.c", SegmentIndex.requiredTrigrams("\\Qa.c\\E")))
    // nested class union [a[b]c] matches 'b' — the tail must not be
    // parsed as literal text
    assert(sat("xbyz", SegmentIndex.requiredTrigrams("x[a[b]c]yz")))
    assert(sat("xayz", SegmentIndex.requiredTrigrams("x[a-z&&[^bc]]yz")))
  }
}
