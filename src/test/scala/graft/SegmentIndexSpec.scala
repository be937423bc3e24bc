package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ast._
import graft.sources.SegmentIndex

class SegmentIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // three "segments": distinct services and time ranges
  private lazy val segDir = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_segs").toString
    def write(name: String, rows: Seq[(Long, String, String, Double)]): String = {
      val p = s"$dir/$name"
      rows.toDF("ts", "service", "level", "value")
        .coalesce(1).write.mode("overwrite").parquet(p)
      p
    }
    val s1 = write("seg1", Seq(
      (1000L, "checkout-api", "info", 1.0), (2000L, "checkout-api", "error", 2.0)))
    val s2 = write("seg2", Seq(
      (3000L, "payment-svc", "info", 3.0), (4000L, "payment-svc", "warn", 4.0)))
    val s3 = write("seg3", Seq(
      (9000L, "search-frontend", "error", 5.0), (9500L, "checkout-api", "info", 6.0)))
    (dir, Seq(s1, s2, s3))
  }

  private lazy val manifest = {
    val (_, segs) = segDir
    SegmentIndex.build(spark, segs, "ts", identity, Seq("service", "level"))
      .cache()
  }
  private val indexed = Set("service", "level")

  test("manifest has per-file bounds and fingerprints") {
    val rows = manifest.collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Seq[Long]]("fingerprints").nonEmpty))
    val seg1 = rows.find(_.getString(0).contains("seg1")).get
    assert(seg1.getAs[Long]("min_ts") == 1000L)
    assert(seg1.getAs[Long]("max_ts") == 2000L)
    assert(seg1.getAs[Long]("row_count") == 2L)
  }

  test("eq prunes to segments containing the value's trigrams") {
    val clause = Filter("service", List("payment-svc"), Ops.EQ)
    val files = SegmentIndex.prune(manifest, Some(clause), indexed, 0L, 10000L)
    assert(files.length == 1 && files.head.contains("seg2"))
  }

  test("contains prunes; value spanning two segments keeps both") {
    val clause = Filter("service", List("checkout"), Ops.CONTAINS)
    val files = SegmentIndex.prune(manifest, Some(clause), indexed, 0L, 10000L)
    assert(files.length == 2)
    assert(files.exists(_.contains("seg1")) && files.exists(_.contains("seg3")))
  }

  test("contains treats metacharacters as regex, not literal (pruning soundness)") {
    import graft.ast.{Filter, Ops}
    // "a.cde" as a CONTAINS value is a REGEX (reference regexp_matches):
    // a segment holding only "axcde" matches via the wildcard and must
    // NOT be pruned on the literal's trigrams ("a.c", ".cd")
    val cand = SegmentIndex.candidate(
      Filter("event_type", List("a.cde"), Ops.CONTAINS), Set("event_type"))
    assert(cand != null) // compiles through the regex path, not literal
    // requiredTrigrams("a.cde") sees '.' as Free: the run "a" (< 3
    // chars) imposes no trigram and is dropped at flush; only "cde"
    // remains — so a segment holding only "axcde" survives pruning
    import graft.sources.SegmentIndex.TriReq
    val req = SegmentIndex.requiredTrigrams("a.cde")
    assert(req == TriReq.Lit("cde"))
  }

  test("numeric-looking EQ values do not prune (coercing equality)") {
    // a long column 1234 matches the value "1234.0" through ==='s
    // numeric coercion; the value's own trigrams ("34.", "4.0") need not
    // exist in any segment — pruning must abstain
    assert(SegmentIndex.valueFingerprints("v", "1234.0").isEmpty)
    assert(SegmentIndex.valueFingerprints("v", "click").nonEmpty)
  }

  test("AND intersects, OR unions candidate sets (U2 set algebra)") {
    val and = BinaryClause(
      Filter("service", List("checkout-api"), Ops.EQ),
      Filter("level", List("error"), Ops.EQ), "and")
    val andFiles = SegmentIndex.prune(manifest, Some(and), indexed, 0L, 10000L)
    assert(andFiles.length == 2) // seg1 (has both) + seg3 (has both, diff rows)

    val or = BinaryClause(
      Filter("service", List("payment-svc"), Ops.EQ),
      Filter("service", List("search-frontend"), Ops.EQ), "or")
    val orFiles = SegmentIndex.prune(manifest, Some(or), indexed, 0L, 10000L)
    assert(orFiles.length == 2)
    assert(orFiles.exists(_.contains("seg2")) && orFiles.exists(_.contains("seg3")))
  }

  test("time range prunes by segment bounds") {
    val files = SegmentIndex.prune(manifest, None, indexed, 0L, 2500L)
    assert(files.length == 1 && files.head.contains("seg1"))
    val none = SegmentIndex.prune(manifest, None, indexed, 20000L, 30000L)
    assert(none.isEmpty)
  }

  test("unindexable predicates degrade soundly to all segments") {
    // pure wildcard / shorthand regexes carry no literal → all segments
    val free = Filter("service", List(".*\\d+.*"), Ops.REGEX)
    assert(SegmentIndex.prune(manifest, Some(free), indexed, 0L, 10000L).length == 3)
    val short = Filter("service", List("ab"), Ops.EQ)
    assert(SegmentIndex.prune(manifest, Some(short), indexed, 0L, 10000L).length == 3)
    val not = NotClause(Filter("service", List("payment-svc"), Ops.EQ))
    assert(SegmentIndex.prune(manifest, Some(not), indexed, 0L, 10000L).length == 3)
  }

  test("alternation regexes OR branch trigram sets and skip files (Op-3)") {
    // (payment|search): seg2 has "payment", seg3 has "search" → seg1 skipped
    val alt = Filter("service", List("(payment|search).*"), Ops.REGEX)
    val files = SegmentIndex.prune(manifest, Some(alt), indexed, 0L, 10000L)
    assert(files.length == 2 &&
      files.exists(_.contains("seg2")) && files.exists(_.contains("seg3")), files)
    // top-level alternation, no group
    val top = Filter("service", List("payment-svc|search-frontend"), Ops.REGEX)
    val f2 = SegmentIndex.prune(manifest, Some(top), indexed, 0L, 10000L)
    assert(f2.length == 2 &&
      f2.exists(_.contains("seg2")) && f2.exists(_.contains("seg3")), f2)
    // alternation ANDed with a forced suffix run: the branch OR spans all
    // segments but "-svc" appears only in seg2 → intersection = seg2
    val mixed = Filter("service", List("(checkout|payment)-svc"), Ops.REGEX)
    val f3 = SegmentIndex.prune(manifest, Some(mixed), indexed, 0L, 10000L)
    assert(f3.length == 1 && f3.head.contains("seg2"), f3)
    // a short branch (no trigram) poisons the OR → all segments (sound)
    val shortBranch = Filter("service", List("(ab|payment)"), Ops.REGEX)
    assert(SegmentIndex.prune(manifest, Some(shortBranch), indexed, 0L, 10000L)
      .length == 3)
  }

  test("regex literal extraction prunes segments (F4 trigram pruning)") {
    // "pay.*" forces the literal "pay" → only seg2 can match
    val simple = Filter("service", List("pay.*"), Ops.REGEX)
    val f1 = SegmentIndex.prune(manifest, Some(simple), indexed, 0L, 10000L)
    assert(f1.length == 1 && f1.head.contains("seg2"), f1)
    // "check.ut-api" forces "check" and "ut-api" → seg1 + seg3
    val dotted = Filter("service", List("check.ut-api"), Ops.REGEX)
    val f2 = SegmentIndex.prune(manifest, Some(dotted), indexed, 0L, 10000L)
    assert(f2.length == 2 &&
      f2.exists(_.contains("seg1")) && f2.exists(_.contains("seg3")), f2)
    // case-insensitive match semantics → case-insensitive pruning
    val upper = Filter("service", List("PAYMENT-.*"), Ops.REGEX)
    val f3 = SegmentIndex.prune(manifest, Some(upper), indexed, 0L, 10000L)
    assert(f3.length == 1 && f3.head.contains("seg2"), f3)
  }

  test("requiredLiterals extracts forced literal runs, degrades on complexity") {
    assert(SegmentIndex.requiredLiterals("pur.has[a-e]+") == Seq("pur", "has"))
    assert(SegmentIndex.requiredLiterals("pay.*") == Seq("pay"))
    assert(SegmentIndex.requiredLiterals("error") == Seq("error"))
    // '*' makes the preceding char optional: "abcd*" requires only "abc"
    assert(SegmentIndex.requiredLiterals("abcd*") == Seq("abc"))
    // '+' keeps the preceding char: "abc+" requires "abc"
    assert(SegmentIndex.requiredLiterals("abc+d") == Seq("abc"))
    // escaped metachar is a literal
    assert(SegmentIndex.requiredLiterals("foo\\.bar") == Seq("foo.bar"))
    // class shorthands break the run
    assert(SegmentIndex.requiredLiterals("foo\\d+bar") == Seq("foo", "bar"))
    // {m,n} with m>=1 repeats the atom m times ("timeout{2,3}" must
    // contain "timeoutt"); n>m detaches the following run
    assert(SegmentIndex.requiredLiterals("timeout{2,3}s") == Seq("timeoutt"))
    // a short-branch alternation now merges into the adjacent run as an
    // exact family (AnyOf(acdef, bcdef)) — conditional, so the flat
    // (unconditional) view is empty even though pruning got STRONGER
    assert(SegmentIndex.requiredLiterals("(a|b)cdef").isEmpty)
    assert(SegmentIndex.requiredTrigrams("(a|b)cdef") ==
      SegmentIndex.TriReq.AnyOf(Seq(SegmentIndex.TriReq.Lit("acdef"),
        SegmentIndex.TriReq.Lit("bcdef"))))
    // an inexact group (unbounded tail) still leaves the run required
    assert(SegmentIndex.requiredLiterals("(a+|b.*c)cdef") == Seq("cdef"))
    assert(SegmentIndex.requiredLiterals("ab|cdef").isEmpty)
    // runs under 3 chars carry no trigram
    assert(SegmentIndex.requiredLiterals("ab.cd").isEmpty)
    // malformed regex → no pruning
    assert(SegmentIndex.requiredLiterals("foo(bar").isEmpty)
    assert(SegmentIndex.requiredLiterals("foo[bar").isEmpty)
  }

  test("requiredTrigrams builds the AND/OR tree") {
    import SegmentIndex.TriReq._
    assert(SegmentIndex.requiredTrigrams("foo|bar") ==
      AnyOf(Seq(Lit("foo"), Lit("bar"))))
    // a group with a small exact language joins the literal run (the
    // concatenation product): stronger than AND(foo|bar, baz) — the
    // branch and the suffix must be CONTIGUOUS
    assert(SegmentIndex.requiredTrigrams("(foo|bar)baz") ==
      AnyOf(Seq(Lit("foobaz"), Lit("barbaz"))))
    // nested alternation: exact sets multiply through nesting
    assert(SegmentIndex.requiredTrigrams("(aaa(bbb|ccc)|ddd)") ==
      AnyOf(Seq(Lit("aaabbb"), Lit("aaaccc"), Lit("ddd"))))
    // non-capturing group: the short tail still joins the product
    assert(SegmentIndex.requiredTrigrams("(?:foo|bar)x") ==
      AnyOf(Seq(Lit("foox"), Lit("barx"))))
    assert(SegmentIndex.requiredTrigrams("(foo|bar)?baz") == Lit("baz"))
    // empty branch → whole alternation unconstrained
    assert(SegmentIndex.requiredTrigrams("(foo|)bar") == Lit("bar"))
    // class INSIDE a run cross-products into a literal family (Cox
    // gr[ae]y algebra) instead of breaking the run
    assert(SegmentIndex.requiredTrigrams("s[iu]gn[ou]p") ==
      AnyOf(Seq(Lit("signop"), Lit("signup"), Lit("sugnop"), Lit("sugnup"))))
    // bounded repeat folds into the run: er{2}or ≡ "error"
    assert(SegmentIndex.requiredTrigrams("er{2}or") == Lit("error"))
  }

  test("class families and bounded repeats prune segments") {
    // pa[xy]ment → {paxment, payment}: only seg2 carries "payment"
    val fam = Filter("service", List("pa[xy]ment.*"), Ops.REGEX)
    val f1 = SegmentIndex.prune(manifest, Some(fam), indexed, 0L, 10000L)
    assert(f1.length == 1 && f1.head.contains("seg2"), f1)
    // payment{1,2} requires "payment" (1 forced copy; the open tail
    // breaks the following run, never the preceding requirement)
    val rep = Filter("service", List("payment{1,2}"), Ops.REGEX)
    val f2 = SegmentIndex.prune(manifest, Some(rep), indexed, 0L, 10000L)
    assert(f2.length == 1 && f2.head.contains("seg2"), f2)
    // oversized class ([a-z]) breaks the family but the runs on either
    // side still bind: pa[a-z]ment keeps requiring "ment" → seg2 only
    val wide = Filter("service", List("pa[a-z]ment"), Ops.REGEX)
    val f3 = SegmentIndex.prune(manifest, Some(wide), indexed, 0L, 10000L)
    assert(f3.length == 1 && f3.head.contains("seg2"), f3)
    // both flanking runs under 3 chars → no requirement survives, every
    // segment stays a candidate (sound degradation)
    val short = Filter("service", List("p[a-z]y"), Ops.REGEX)
    assert(SegmentIndex.prune(manifest, Some(short), indexed, 0L, 10000L)
      .length == 3)
  }

  test("nested-group regexes prune segments (exact-set product)") {
    // pay(me|em)nt → {payment, payemnt}: only seg2 carries "payment";
    // every PIECE is under 3 chars, so only the product can prune
    val nested = Filter("service", List("pay(me|em)nt"), Ops.REGEX)
    val f1 = SegmentIndex.prune(manifest, Some(nested), indexed, 0L, 10000L)
    assert(f1.length == 1 && f1.head.contains("seg2"), f1)
    // nesting inside alternation: (che(ck|kc)out|sea(rc|cr)h) keeps the
    // checkout (seg1, seg3) and search (seg3) segments, drops seg2
    val alt = Filter("service",
      List("(che(ck|kc)out|sea(rc|cr)h)"), Ops.REGEX)
    val f2 = SegmentIndex.prune(manifest, Some(alt), indexed, 0L, 10000L)
    assert(f2.length == 2 && !f2.exists(_.contains("seg2")), f2)
    // an inexact part inside the group degrades that branch to no-prune
    // for the whole alternation (sound)
    val inexact = Filter("service", List("(payment|x.*y)"), Ops.REGEX)
    assert(SegmentIndex.prune(manifest, Some(inexact), indexed, 0L, 10000L)
      .length == 3)
  }

  test("positive lookahead plans its inner trigrams; negative/lookbehind " +
    "degrade soundly to all segments") {
    // (?=.*payment): the inner pattern is a required match, so only
    // seg2 (the one carrying "payment" trigrams) survives even though
    // the consuming part of the regex is requirement-free
    val ahead = Filter("service", List("(?=.*payment).*"), Ops.REGEX)
    val f1 = SegmentIndex.prune(manifest, Some(ahead), indexed, 0L, 10000L)
    assert(f1.length == 1 && f1.head.contains("seg2"), f1)
    // lookahead ANDed with consumed text: intersection of requirements
    val both = Filter("service", List("(?=.*-svc)payment.*"), Ops.REGEX)
    val f2 = SegmentIndex.prune(manifest, Some(both), indexed, 0L, 10000L)
    assert(f2.length == 1 && f2.head.contains("seg2"), f2)
    // positive lookbehind plans its inner trigrams too (the match ended
    // at this position, so it IS in the document)
    val behind = Filter("service", List("(?<=payment).*"), Ops.REGEX)
    val f3 = SegmentIndex.prune(manifest, Some(behind), indexed, 0L, 10000L)
    assert(f3.length == 1 && f3.head.contains("seg2"), f3)
    // NEGATIVE lookaround carries no requirement (sound)
    val neg = Filter("service", List("(?!payment).*"), Ops.REGEX)
    assert(SegmentIndex.prune(manifest, Some(neg), indexed, 0L, 10000L)
      .length == 3)
    val negB = Filter("service", List("(?<!payment).*"), Ops.REGEX)
    assert(SegmentIndex.prune(manifest, Some(negB), indexed, 0L, 10000L)
      .length == 3)
  }

  test("prune-to-zero-files returns a TYPED empty frame from every entry") {
    // A corpus whose segments can never match the entries' predicates:
    // no trigram of "click"/"pur"/"has"/"purchase"/"signup" in any
    // event_type, every ts outside s3's 2024-01-10..12 window, and no
    // trigram of "vector" in any document text. Each SourceQueries entry
    // must come back EMPTY but with its declared schema — a schema-less
    // emptyDataFrame would break downstream select/where and the oracle
    // schema compare.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_zero_sf").toString
    val ts2023 = java.time.Instant.parse("2023-06-01T00:00:00Z")
      .toEpochMilli * 1000000L
    Seq((1L, ts2023, 10L, "view", 1.5, "{}"),
        (2L, ts2023 + 1000000000L, 11L, "browse", 2.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq((1L, "plain words only", "en", "web", 16L),
        (2L, "more plain words", "en", "web", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    import org.apache.spark.sql.types._
    val expected = Map[String, StructType](
      "s4_pruned_scan" -> StructType(Seq(StructField("event_id", LongType),
        StructField("user_id", LongType), StructField("value", DoubleType))),
      "s3_time_pruned" -> StructType(Seq(StructField("event_type", StringType),
        StructField("n", LongType))),
      "s6_regex_pruned" -> StructType(Seq(StructField("event_id", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType))),
      "s7_regex_alternation" -> StructType(Seq(StructField("event_id", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType))),
      "s15_docs_grep" -> StructType(Seq(StructField("doc_id", LongType),
        StructField("source", StringType))))
    expected.foreach { case (name, schema) =>
      val df = graft.queries.SourceQueries.queries(name)(spark, dir)
      assert(df.count() == 0L, s"$name should prune to zero rows")
      assert(StructType(df.schema.map(_.copy(nullable = true))) ==
        StructType(schema.map(_.copy(nullable = true))),
        s"$name schema ${df.schema.treeString}")
    }
  }

  test("pruned scan result equals full scan result") {
    val (_, segs) = segDir
    val clause = Filter("service", List("payment-svc"), Ops.EQ)
    val pruned = SegmentIndex
      .scan(spark, manifest, Some(clause), indexed, 0L, 10000L).get
      .where(col("service") === "payment-svc")
      .select("ts", "service", "level", "value").orderBy("ts").collect()
    val full = spark.read.parquet(segs: _*)
      .where(col("service") === "payment-svc")
      .select("ts", "service", "level", "value").orderBy("ts").collect()
    assert(pruned.sameElements(full))
  }

  test("manifest artifact signature rotates on a one-byte file change") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sig").toFile
    val f = new java.io.File(dir, "seg.parquet")
    java.nio.file.Files.write(f.toPath, "abc".getBytes)
    val sig1 = graft.queries.SourceQueries.artifactSignature(Seq(f.getPath))
    assert(sig1.length == 32 && sig1.matches("[0-9a-f]{32}"),
      s"128-bit hex signature expected, got $sig1")
    // same length, different mtime (a rewrite normally bumps mtime)
    java.nio.file.Files.write(f.toPath, "abd".getBytes)
    f.setLastModified(f.lastModified + 1000)
    val sig2 = graft.queries.SourceQueries.artifactSignature(Seq(f.getPath))
    assert(sig1 != sig2, "signature must rotate when a source file changes")
    // one-byte length change alone also rotates
    java.nio.file.Files.write(f.toPath, "abcd".getBytes)
    val sig3 = graft.queries.SourceQueries.artifactSignature(Seq(f.getPath))
    assert(sig3 != sig2 && sig3 != sig1)
  }
}
