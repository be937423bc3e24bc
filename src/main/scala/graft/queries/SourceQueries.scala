package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ast._
import graft.sources.SegmentIndex

/** Manifest-pruned segment scans (SURVEY.md S3/S4/U2) over a multi-file
  * segment directory (the same 4-file events layout the streaming entries
  * use). Pruning is sound, so pruned-scan results are oracle-checked
  * against plain SQL over the full table; that files really get skipped is
  * asserted in SegmentIndexSpec on segments with disjoint contents. */
object SourceQueries {

  // keyed by (CONTEXT, dir) like Tables.load: newSession() requests (the
  // FAIR multi-tenant posture) share the context and must reuse the
  // cached manifest instead of rebuilding it inside their timed window;
  // keying by dir alone would hand a later context a plan on a
  // possibly-stopped predecessor
  private val manifests = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.SparkContext, String), DataFrame]()

  /** Pre-build the segment dirs + manifests (ingest-time artifacts). */
  private[graft] def prepare(s: SparkSession, dir: String): Unit = {
    manifest(s, dir).count()
    docManifest(s, dir).count()
    zorderLayout(s, dir)
    regionRoots(s, dir)
  }

  /** Build-or-load a manifest as a DISK artifact. A `.cache()`d manifest
    * is a recompute-on-eviction trap: the fingerprint extraction costs a
    * full corpus scan, and once the corpus outgrows storage memory the
    * cached blocks evict and EVERY pruned query silently re-derives the
    * index (measured at the sf10 soak: s15's timed runs paid ~140 s of
    * manifest recompute on top of a ~40 s scan). The reference persists
    * its segment index in a store for the same reason — an index you
    * can lose to memory pressure is not an index. The artifact is tiny
    * (one row per segment); the read-back is cached for plan reuse. */
  private def manifestArtifact(s: SparkSession, prefix: String, d: String,
      files: Seq[String], build: () => DataFrame): DataFrame = {
    // artifact dir keyed by a (name, size, mtime) signature of the
    // source segments: regenerated testdata or rewritten segment dirs
    // must NEVER be served a stale index (pruning with wrong
    // fingerprints silently drops rows). The signature is a 128-bit
    // SHA-256 prefix, not String.hashCode — a 32-bit collision's failure
    // mode is exactly the silent-stale-index hazard the key exists to
    // prevent.
    val sig = artifactSignature(files)
    val out = graft.Tables.tmpDirFor(s"${prefix}_$sig", d)
    manifestBuildLock.synchronized {
      if (!new java.io.File(out, "_SUCCESS").exists()) {
        build().write.mode("overwrite").parquet(out)
        // superseded signatures (regenerated testdata between rounds)
        // otherwise accumulate one orphan dir per rewrite, forever
        dropSupersededArtifacts(prefix, out)
      }
    }
    s.read.parquet(out).cache()
  }
  private val manifestBuildLock = new Object

  /** 128-bit (name, size, mtime) signature of a segment file set. */
  private[graft] def artifactSignature(files: Seq[String]): String = {
    val src = files.sorted.map { f =>
      val x = new java.io.File(f)
      s"$f:${x.length}:${x.lastModified}"
    }.mkString("|")
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(src.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(16).map(b => f"$b%02x").mkString
  }

  /** Delete sibling artifact dirs for the same (prefix, source dir) whose
    * signature differs from the live one. Sibling names share the live
    * dir's `<prefix>_` head and `_<sanitized-dir>_<dirhash>` tail with a
    * different signature in between.
    *
    * Only siblings UNTOUCHED for [[supersededGraceMs]] are dropped: the
    * artifact parent is the shared java.io.tmpdir, and the in-process
    * build lock does not cover a second JVM (a concurrent test and bench
    * run) that observed a different (size, mtime) snapshot of the same
    * source dir — deleting its freshly-built index while one of its
    * cached DataFrames is still lazily reading it causes transient read
    * failures. A genuinely superseded signature means the source dir was
    * rewritten, which happens between rounds (hours apart), so the grace
    * window loses nothing; anything younger is plausibly live in another
    * process and is left for that process's own next rewrite to reap. */
  private[graft] def dropSupersededArtifacts(prefix: String,
      liveDir: String): Unit = {
    val live = new java.io.File(liveDir)
    val name = live.getName
    // tail = everything after "<prefix>_<32-hex-sig>"
    val head = s"${prefix}_"
    if (!name.startsWith(head) || name.length < head.length + 32) return
    val tail = name.substring(head.length + 32)
    val cutoff = System.currentTimeMillis() - supersededGraceMs
    Option(live.getParentFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName != name &&
        f.getName.startsWith(head) && f.getName.endsWith(tail) &&
        f.getName.length == name.length &&
        f.lastModified() < cutoff)
      .foreach(deleteRecursively)
  }
  private[graft] val supersededGraceMs: Long = 60L * 60 * 1000
  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  private def manifest(s: SparkSession, dir: String): DataFrame =
    manifests.computeIfAbsent((s.sparkContext, dir), { case (_, d) =>
      val sess = s
      val segDir = StreamingQueries.streamDir(sess, d)
      val files = new java.io.File(segDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
      manifestArtifact(sess, "graft_evmanifest", d, files, () =>
        SegmentIndex.build(sess, files, "ts",
          ts => expr("ts div 1000000"), Seq("event_type")))
    })

  /** Pruning every file is a valid empty RESULT, not a schema-less one:
    * downstream select/where and the oracle schema compare still need the
    * entry's declared output shape. Spec `(name, ddlType)*`, e.g.
    * `typedEmpty(s, "event_id" -> "bigint", "n" -> "bigint")`. */
  private def typedEmpty(s: SparkSession, cols: (String, String)*): DataFrame =
    s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(cols.map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.DataType.fromDDL(t))
      }))

  /** S4+U2: trigram-pruned scan, then the full filter. */
  def s4_pruned_scan(s: SparkSession, dir: String): DataFrame = {
    val clause = Filter("event_type", List("click"), Ops.EQ)
    val df = SegmentIndex.scan(s, manifest(s, dir), Some(clause),
        Set("event_type"), Long.MinValue, Long.MaxValue)
      .getOrElse(return typedEmpty(s, "event_id" -> "bigint",
        "user_id" -> "bigint", "value" -> "double"))
    df.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy("event_id")
  }

  /** S3/F10: time-bound pruned scan (segment min/max overlap). */
  def s3_time_pruned(s: SparkSession, dir: String): DataFrame = {
    val start = java.time.Instant.parse("2024-01-10T00:00:00Z").toEpochMilli
    val end = java.time.Instant.parse("2024-01-12T00:00:00Z").toEpochMilli
    val df = SegmentIndex.scan(s, manifest(s, dir), None,
        Set("event_type"), start, end)
      .getOrElse(return typedEmpty(s, "event_type" -> "string",
        "n" -> "bigint"))
    df.where(expr("ts div 1000000") >= start && expr("ts div 1000000") < end)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** F4+U2: regex predicate compiled to required-literal trigrams for
    * segment pruning (pruning is sound → oracle vs the full table; that
    * files are actually skipped is proven in SegmentIndexSpec). */
  def s6_regex_pruned(s: SparkSession, dir: String): DataFrame = {
    val clause = Filter("event_type", List("pur.has[a-e]+"), Ops.REGEX)
    val df = SegmentIndex.scan(s, manifest(s, dir), Some(clause),
        Set("event_type"), Long.MinValue, Long.MaxValue)
      .getOrElse(return typedEmpty(s, "event_id" -> "bigint",
        "event_type" -> "string", "value" -> "double"))
    df.where(col("event_type").rlike("(?i)pur.has[a-e]+"))
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** U2 Op-3: alternation regex — branch trigram sets are OR'd, so the
    * index skips segments containing neither branch (file-skipping proven
    * in SegmentIndexSpec; result equivalence proven here vs the full
    * table, since pruning is sound). */
  def s7_regex_alternation(s: SparkSession, dir: String): DataFrame = {
    val clause = Filter("event_type", List("(purchase|signup)"), Ops.REGEX)
    val df = SegmentIndex.scan(s, manifest(s, dir), Some(clause),
        Set("event_type"), Long.MinValue, Long.MaxValue)
      .getOrElse(return typedEmpty(s, "event_id" -> "bigint",
        "event_type" -> "string", "value" -> "double"))
    df.where(col("event_type").rlike("(?i)(purchase|signup)"))
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** U2 on literal FAMILIES (Cox trigram-index algebra, the class/
    * quantifier half of the reference's lib-trigram coverage,
    * NLPUtils.scala:54-153): a character class INSIDE a required run
    * cross-products into a small literal family (s[iu]gn[ou]p →
    * {signop, signup, sugnop, sugnup} — OR'd trigram requirements, same
    * as an alternation), and a bounded repeat folds into the run
    * (er{2}or ≡ "error"). Segments whose fingerprints contain no
    * family member's trigrams are skipped; file-skipping proven in
    * SegmentIndexSpec, result equivalence here vs the full table
    * (pruning is sound). */
  def s28_regex_class_pruned(s: SparkSession, dir: String): DataFrame = {
    val re = "(s[iu]gn[ou]p|er{2}or)"
    val clause = Filter("event_type", List(re), Ops.REGEX)
    val df = SegmentIndex.scan(s, manifest(s, dir), Some(clause),
        Set("event_type"), Long.MinValue, Long.MaxValue)
      .getOrElse(return typedEmpty(s, "event_id" -> "bigint",
        "event_type" -> "string", "value" -> "double"))
    df.where(col("event_type").rlike(s"(?i)$re"))
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** U2 on NESTED GROUPS (the general concatenation/alternation product
    * over required runs — the remainder of the reference's lib-trigram
    * regex coverage, NLPUtils.scala:54-153): groups whose language is a
    * small exact string set join the literal-run cross product, so
    * `si(gn|ng)up` requires {signup, singup} even though every piece is
    * under 3 chars, and nesting composes ((si(gn|ng)up|er(ro|or)r) →
    * a 4-member OR'd trigram family). Inexact constructs degrade to
    * no-prune, never to a false requirement. File-skipping proven in
    * SegmentIndexSpec; result equivalence here vs the full table
    * (pruning is sound). */
  def s30_regex_nested_pruned(s: SparkSession, dir: String): DataFrame = {
    val re = "(si(gn|ng)up|er(ro|or)r)"
    val clause = Filter("event_type", List(re), Ops.REGEX)
    val df = SegmentIndex.scan(s, manifest(s, dir), Some(clause),
        Set("event_type"), Long.MinValue, Long.MaxValue)
      .getOrElse(return typedEmpty(s, "event_id" -> "bigint",
        "event_type" -> "string", "value" -> "double"))
    df.where(col("event_type").rlike(s"(?i)$re"))
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** U2 on POSITIVE LOOKAHEAD: `(?=X)` is zero-width but X is a
    * required match starting at that position, so X's required trigrams
    * prune soundly even when the CONSUMING part of the regex is
    * requirement-free (`(?=.*signup).*` skips every segment without
    * signup's trigrams). Negative lookahead/lookbehind stay conservative
    * (no-prune). File-skipping proven in SegmentIndexSpec; result
    * equivalence here vs the full table (pruning is sound; the oracle
    * spells the predicate without lookahead — DuckDB's RE2 has none —
    * as the equivalent contains test). */
  def s31_regex_lookahead_pruned(s: SparkSession, dir: String): DataFrame = {
    val re = "(?=.*signup).*"
    val clause = Filter("event_type", List(re), Ops.REGEX)
    val df = SegmentIndex.scan(s, manifest(s, dir), Some(clause),
        Set("event_type"), Long.MinValue, Long.MaxValue)
      .getOrElse(return typedEmpty(s, "event_id" -> "bigint",
        "event_type" -> "string", "value" -> "double"))
    df.where(col("event_type").rlike(s"(?i)$re"))
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** S3/S4 deluxe: plan-time segment skipping through the custom
    * Catalyst FileIndex — the query is a plain WHERE over the relation;
    * Catalyst pushes the predicates and [[graft.sources.ManifestFileIndex]]
    * prunes segment files inside scan planning (time bounds from the raw
    * ts comparisons, trigram fingerprints from the equality). File-skip
    * counts proven in ManifestFileIndexSpec; result equivalence proven
    * here against the full table, since pruning is sound. */
  def s10_fileindex_scan(s: SparkSession, dir: String): DataFrame = {
    val startNs = java.time.Instant.parse("2024-01-05T00:00:00Z")
      .toEpochMilli * 1000000L
    val endNs = java.time.Instant.parse("2024-01-20T00:00:00Z")
      .toEpochMilli * 1000000L
    val rel = graft.sources.ManifestFileIndex.relation(
      s, manifest(s, dir), "ts", _ / 1000000L, Set("event_type"))
    rel.where(col("ts") >= startNs && col("ts") < endNs &&
        col("event_type") === "purchase")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy("event_type")
  }

  /** The JSON-AST pipeline over the FileIndex relation — pruning
    * invisible to the engine: the telemetry table handed to QueryEngine
    * is a [[graft.sources.ManifestFileIndex]] relation, so the AST's
    * time range (compiled by Telemetry.nanos onto the raw ts column) and
    * attribute filters are pushed by Catalyst into scan planning, where
    * the manifest skips segment files — QueryEngine itself needs zero
    * pruning cooperation. File-skip asserted in ManifestFileIndexSpec;
    * results oracle-checked against the full table (pruning is sound). */
  def ast_fileindex_chart(s: SparkSession, dir: String): DataFrame = {
    val startMs = java.time.Instant.parse("2024-01-10T00:00:00Z").toEpochMilli
    val endMs = java.time.Instant.parse("2024-01-12T00:00:00Z").toEpochMilli
    val ast = AstJson.parseAstInput(
      """{"baseExpressions": {"a": {
        |  "dataset": "logs",
        |  "filter": {"k": "event_type", "v": ["click", "view"], "op": "in"},
        |  "chart": {"aggregation": "sum", "groupBys": ["event_type"]}
        |}}}""".stripMargin)
    graft.engine.QueryEngine.evaluate(
        _ => astFileIndexTelemetry(s, dir), ast, startMs, endMs, 3600000L)
      .select(col("step_ts"), col("group_key"),
        round(col("value"), 6).as("value"))
      .orderBy("step_ts", "group_key")
  }

  private[graft] def astFileIndexTelemetry(
      s: SparkSession, dir: String): graft.engine.Telemetry = {
    val rel = graft.sources.ManifestFileIndex.relation(
      s, manifest(s, dir), "ts", _ / 1000000L, Set("event_type"))
    graft.engine.Telemetry.nanos(rel, "ts",
      valueCol = col("value"), message = Some(col("props")))
  }

  // ------------------------------------------------- multi-region fan-out

  /** Per-(session, sf dir) regional roots: events sharded into three
    * "regions" (user_id mod 3 — the reference shards a customer's
    * telemetry across regional collectors), each region a separate
    * segment dir with its OWN trigram/time manifest. Ingest-time
    * artifact, built once. */
  private val regionRootsCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.SparkContext, String), Seq[(String, DataFrame)]]()

  // the DISK artifact builds once per sf dir (marker + lock): the cache
  // above is per-CONTEXT for plan reuse (newSession() requests share it —
  // rebuilding three regional manifests inside a concurrent request's
  // timed window was the r9 ast_multi_region 5x task-inflation), and
  // concurrent sessions must never overwrite the shared region files
  // another session is mid-read on
  private val regionBuildLock = new Object

  private def regionRoots(s: SparkSession, dir: String)
      : Seq[(String, DataFrame)] =
    regionRootsCache.computeIfAbsent((s.sparkContext, dir), { case (_, d) =>
      val sess = s
      val base = graft.Tables.tmpDirFor("graft_regions", d)
      regionBuildLock.synchronized {
        val marker = new java.io.File(base, "_built")
        if (!marker.exists()) {
          org.apache.commons.io.FileUtils.deleteQuietly(
            new java.io.File(base))
          val ev = graft.Tables.load(sess, d, "events")
          (0 until 3).foreach { r =>
            ev.where(pmod(col("user_id"), lit(3)) === r)
              .repartition(2)
              .write.mode("overwrite").parquet(s"$base/region$r")
          }
          marker.createNewFile()
        }
      }
      (0 until 3).map { r =>
        val root = s"$base/region$r"
        val files = new java.io.File(root).listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(_.getAbsolutePath).toSeq
        val mf = manifestArtifact(sess, s"graft_regmanifest$r", d, files, () =>
          SegmentIndex.build(sess, files, "ts",
            ts => expr("ts div 1000000"), Seq("event_type")))
        mf.count()
        (root, mf)
      }
    })

  /** The reference's multi-region fan-out (QueryApi.scala:311-349:
    * makeRegionalCall POSTs the same query to every regional endpoint
    * and concatenates the streams) as an ENGINE behavior: one AST
    * evaluated over N regional telemetry roots. Spark-first shape: each
    * region is a [[graft.sources.ManifestFileIndex]] relation (so the
    * AST's time range and attribute filters prune each region's segment
    * files independently, exactly the per-region worker behavior), the
    * relations union by name into ONE logical plan — one shuffle, N
    * pruned scans, no per-region re-aggregation pass. The oracle is the
    * single-root equivalent over the undivided table: a region lost,
    * double-counted, or mis-sharded hash-mismatches. */
  def ast_multi_region(s: SparkSession, dir: String): DataFrame = {
    val ast = AstJson.parseAstInput(
      """{"baseExpressions": {"a": {
        |  "dataset": "logs",
        |  "filter": {"k": "event_type", "v": ["click", "view"], "op": "in"},
        |  "chart": {"aggregation": "sum", "groupBys": ["event_type"]}
        |}}}""".stripMargin)
    val regional = regionRoots(s, dir).map { case (_, mf) =>
      graft.sources.ManifestFileIndex.relation(
        s, mf, "ts", _ / 1000000L, Set("event_type"))
    }
    val unioned = regional.reduce(_ unionByName _)
    val tel = graft.engine.Telemetry.nanos(unioned, "ts",
      valueCol = col("value"), message = Some(col("props")))
    graft.engine.QueryEngine.evaluate(_ => tel, ast,
        1704067200000L, 1706745600000L, 86400000L)
      .select(col("step_ts"), col("group_key"),
        round(col("value"), 6).as("value"))
      .orderBy("step_ts", "group_key")
  }

  // ------------------------------------------------- corpus text search

  /** Trigram manifest over the multi-file DOCUMENTS corpus — the same
    * data-skipping machinery applied to the training-data side: corpus
    * grep (contamination hunting, PII audits, targeted re-filters at
    * 100 TB) should open only segments whose fingerprint set can match.
    * doc_id stands in for the time axis (id-range bounds prune too). */
  private val docManifests = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.SparkContext, String), DataFrame]()

  private def docManifest(s: SparkSession, dir: String): DataFrame =
    docManifests.computeIfAbsent((s.sparkContext, dir), { case (_, d) =>
      val sess = s
      val segDir = StreamingQueries.docStreamDir(sess, d)
      val files = new java.io.File(segDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
      manifestArtifact(sess, "graft_docmanifest", d, files, () =>
        SegmentIndex.build(sess, files, "doc_id", identity, Seq("text")))
    })

  /** S4 over the corpus: contains() search through the trigram index,
    * then the exact predicate. Pruning is sound → oracle vs the full
    * table (file-skipping itself is proven in SegmentIndexSpec). */
  def s15_docs_grep(s: SparkSession, dir: String): DataFrame = {
    val clause = Filter("text", List("vector"), Ops.CONTAINS)
    val df = SegmentIndex.scan(s, docManifest(s, dir), Some(clause),
        Set("text"), Long.MinValue, Long.MaxValue)
      .getOrElse(return typedEmpty(s, "doc_id" -> "bigint",
        "source" -> "string"))
    // `(?i)vector`, NOT `(?i).*vector.*`: RLike is find() semantics, so
    // the wrappers add nothing — except that a failing row makes the
    // greedy leading `.*` retry the whole tail FROM EVERY START OFFSET,
    // turning the scan O(len²) per row. On the sf10 soak corpus the
    // wrapped spelling cost ~50 s per pass; the bare literal is a
    // Boyer–Moore-style substring probe (~2 s). Same rows either way.
    df.where(col("text").rlike("(?i)vector"))
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------- z-order layout

  /** Z-ordered copy of events clustered on (user_id, value) + the two
    * dimension domains — built once per sf dir (an ingest-time layout
    * decision, like the stream segment dirs). 3 bits per dim → up to 64
    * z-bucket partition directories. */
  private val zLayouts = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Array[Double])]()

  private def zorderLayout(s: SparkSession, dir: String): (String, Array[Double]) =
    zLayouts.computeIfAbsent(dir, { d =>
      val ev = graft.Tables.load(s, d, "events")
        .select(col("event_id"), col("event_type"), col("user_id"), col("value"))
      val mm = ev.agg(min(col("user_id")), max(col("user_id")),
        min(col("value")), max(col("value"))).head()
      val dom = Array(mm.getLong(0).toDouble, mm.getLong(1).toDouble,
        mm.getDouble(2), mm.getDouble(3))
      val out = graft.Tables.tmpDirFor("graft_zorder", d)
      graft.operators.Layout.zorderWrite(ev,
        col("user_id"), dom(0), dom(1), col("value"), dom(2), dom(3),
        bits = 3, out)
      (out, dom)
    })

  /** S17 (beyond the reference): 2-D range query over the z-ordered
    * layout. The box [30%,60%] of each dimension's domain becomes a
    * driver-computed set of contiguous z-ranges ([[Layout.zCover]]) that
    * Catalyst applies as PartitionFilters — whole directories skip before
    * any footer opens — and the exact box predicate re-applies after, so
    * the answer provably equals the plain-table query (the oracle, which
    * derives the same box bounds from min/max in SQL). LayoutSpec proves
    * the directory skipping; at 100 TB this is the difference between
    * listing a corpus and reading ~10% of it for a 2-D slice. */
  def s17_zorder_scan(s: SparkSession, dir: String): DataFrame = {
    val (path, dom) = zorderLayout(s, dir)
    def lo(a: Double, b: Double) = a + 0.3 * (b - a)
    def hi(a: Double, b: Double) = a + 0.6 * (b - a)
    val (uLo, uHi) = (lo(dom(0), dom(1)), hi(dom(0), dom(1)))
    val (vLo, vHi) = (lo(dom(2), dom(3)), hi(dom(2), dom(3)))
    val cover = graft.operators.Layout.zCover(
      uLo, uHi, dom(0), dom(1), vLo, vHi, dom(2), dom(3), bits = 3)
    s.read.parquet(path)
      .where(graft.operators.Layout.zCoverFilter(cover) &&
        col("user_id").cast("double").between(uLo, uHi) &&
        col("value").between(vLo, vHi))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_value"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s15_docs_grep" -> s15_docs_grep _,
    "s17_zorder_scan" -> s17_zorder_scan _,
    "s4_pruned_scan" -> s4_pruned_scan _,
    "s3_time_pruned" -> s3_time_pruned _,
    "s6_regex_pruned" -> s6_regex_pruned _,
    "s7_regex_alternation" -> s7_regex_alternation _,
    "s28_regex_class_pruned" -> s28_regex_class_pruned _,
    "s30_regex_nested_pruned" -> s30_regex_nested_pruned _,
    "s31_regex_lookahead_pruned" -> s31_regex_lookahead_pruned _,
    "ast_multi_region" -> ast_multi_region _,
    "s10_fileindex_scan" -> s10_fileindex_scan _,
    "ast_fileindex_chart" -> ast_fileindex_chart _
  )

  val oracleSql: Map[String, String] = Map(
    "s17_zorder_scan" ->
      """WITH d AS (
        |  SELECT CAST(min(user_id) AS DOUBLE) AS umin,
        |    CAST(max(user_id) AS DOUBLE) AS umax,
        |    min(value) AS vmin, max(value) AS vmax
        |  FROM events)
        |SELECT e.event_type, count(*) AS n,
        |  CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events e, d
        |WHERE CAST(e.user_id AS DOUBLE)
        |    BETWEEN d.umin + 0.3 * (d.umax - d.umin)
        |        AND d.umin + 0.6 * (d.umax - d.umin)
        |  AND e.value
        |    BETWEEN d.vmin + 0.3 * (d.vmax - d.vmin)
        |        AND d.vmin + 0.6 * (d.vmax - d.vmin)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "s15_docs_grep" ->
      """SELECT doc_id, source FROM documents
        |WHERE regexp_matches(text, '(?i)vector')
        |ORDER BY doc_id""".stripMargin,
    "ast_fileindex_chart" ->
      """SELECT (epoch_ms(ts) // 3600000) * 3600000 AS step_ts,
        |  event_type AS group_key, round(sum(value), 6) AS value
        |FROM events WHERE event_type IN ('click', 'view')
        |  AND epoch_ms(ts) >= 1704844800000 AND epoch_ms(ts) < 1705017600000
        |GROUP BY step_ts, group_key ORDER BY step_ts, group_key""".stripMargin,
    "s10_fileindex_scan" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-20 00:00:00'
        |  AND event_type = 'purchase'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "s4_pruned_scan" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'click' ORDER BY event_id""".stripMargin,
    "s3_time_pruned" ->
      """SELECT event_type, count(*) AS n FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-12 00:00:00'
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    "s6_regex_pruned" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE regexp_matches(event_type, 'pur.has[a-e]+', 'i')
        |ORDER BY event_id""".stripMargin,
    "s7_regex_alternation" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE regexp_matches(event_type, '(purchase|signup)', 'i')
        |ORDER BY event_id""".stripMargin,
    "s28_regex_class_pruned" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE regexp_matches(event_type, '(s[iu]gn[ou]p|er{2}or)', 'i')
        |ORDER BY event_id""".stripMargin,
    "s30_regex_nested_pruned" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE regexp_matches(event_type, '(si(gn|ng)up|er(ro|or)r)', 'i')
        |ORDER BY event_id""".stripMargin,
    // lookahead-free spelling of (?i)(?=.*signup).* (RE2 has no
    // lookaround): find-anywhere of 'signup', case-insensitive
    "s31_regex_lookahead_pruned" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE regexp_matches(event_type, 'signup', 'i')
        |ORDER BY event_id""".stripMargin,
    // the single-root equivalent of the 3-region federated evaluation
    "ast_multi_region" ->
      """SELECT (epoch_ms(ts) // 86400000) * 86400000 AS step_ts,
        |  event_type AS group_key, round(sum(value), 6) AS value
        |FROM events WHERE event_type IN ('click', 'view')
        |GROUP BY step_ts, group_key
        |ORDER BY step_ts, group_key""".stripMargin
  )
}
