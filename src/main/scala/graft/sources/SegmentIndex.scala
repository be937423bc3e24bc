package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ast._

/** Segment manifest + trigram-fingerprint data skipping — the Spark-native
  * form of the reference's metadata index (SURVEY.md S3/S4/U2: PostgreSQL
  * `log_seg`/`metric_seg` tables with `ts_range && int8range` overlap and
  * `fingerprints && BIGINT[]` trigram matching, reference
  * QueryEngineV2.scala:700-951, set algebra NLPUtils.scala:155-187).
  *
  * Design (scale-first):
  *  - The manifest is itself a small DataFrame/parquet table: one row per
  *    segment file with (file, row_count, min/max of the time column,
  *    fingerprint set). It is built once at ingest by a distributed scan
  *    and consulted at plan time — the 100 TB scan is replaced by a
  *    manifest read of a few MB per million segments.
  *  - Fingerprints are 64-bit hashes of (column, trigram-of-value). A
  *    predicate value's trigrams must ALL be present in a segment for the
  *    segment to possibly match eq/contains on an indexed column —
  *    same contract as the reference's trigram index; absence proves
  *    absence, presence is only a candidate.
  *  - Clause pruning (U2): AND intersects candidate sets, OR unions,
  *    NOT/regex/short-values degrade to "all segments" (sound).
  *  - Time pruning (F10): segment [min_ts, max_ts] must overlap the query
  *    range — the manifest twin of parquet row-group min/max skipping.
  *
  * At cluster scale the pruned file list feeds `spark.read.parquet(files)`
  * so Spark never even lists the skipped segments; partition-dir layouts
  * (`dateInt=/hour=`) remain complementary (Catalyst partition pruning).
  */
object SegmentIndex {

  /** Hash of one (column, trigram) pair. The column name is bound into the
    * hash so `a contains "foo"` can't match a segment that only has
    * "foo" under column b. Null values → empty set. */
  private def fingerprintCol(c: String): Column =
    coalesce(
      transform(
        graft.operators.Dedup.charNgrams(lower(col(s"`$c`")), 3),
        g => xxhash64(lit(c), g)),
      array().cast("array<bigint>"))

  /** Build the manifest for a set of segment files. One distributed pass
    * over the data, two small aggregations:
    *  - per-file bounds: count / min_ts / max_ts (shuffle carries one row
    *    per (partition, file));
    *  - per-file fingerprint set: explode → map-side distinct → collect_set
    *    (shuffle carries (file, fingerprint) pairs, never per-row arrays —
    *    reducer memory is bounded by the distinct-trigram count of a file,
    *    not its row count).
    */
  def build(spark: SparkSession, files: Seq[String], tsCol: String,
      tsToMillis: Column => Column, indexed: Seq[String]): DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(files: _*)
    val present = df.columns.toSet
    val fps: Column = flatten(array(
      indexed.filter(present.contains).map(fingerprintCol): _*))
    val base = df.select(
      input_file_name().as("file"),
      tsToMillis(col(s"`$tsCol`")).as("_ts_ms"),
      fps.as("_fps"))
    val bounds = base.groupBy(col("file")).agg(
      count(lit(1)).as("row_count"),
      min(col("_ts_ms")).as("min_ts"),
      max(col("_ts_ms")).as("max_ts"))
    val prints = base
      .select(col("file"), explode(col("_fps")).as("fp"))
      .distinct()
      .groupBy(col("file"))
      .agg(collect_set(col("fp")).as("fingerprints"))
    bounds.join(prints, Seq("file"), "left")
      .withColumn("fingerprints",
        coalesce(col("fingerprints"), array().cast("array<bigint>")))
  }

  // ---------------------------------------------------------- plan pruning

  /** Trigram fingerprints a segment must contain for this predicate value
    * to possibly appear under column c; None = cannot prune on this leaf. */
  private def valueFingerprints(c: String, v: String): Option[Seq[Long]] = {
    val s = v.toLowerCase
    if (s.length < 3) None
    else Some(
      (0 to s.length - 3).map { i =>
        val g = s.substring(i, i + 3)
        // mirror of fingerprintCol: xxhash64(column, trigram), seed 42
        org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(g),
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
            org.apache.spark.unsafe.types.UTF8String.fromString(c),
            org.apache.spark.sql.types.StringType, 42L))
      }.distinct)
  }

  /** Literal substrings every string matched by `regex` must contain —
    * the pure-literal subset of the reference's trigram regex compiler
    * (NLPUtils.scala:54-153, which shells into Go lib-trigram; the
    * literal/contains subset needs no library). Alternation and groups
    * degrade to Nil (no pruning — sound); classes/dots/shorthands break
    * the current literal run; `*`/`?`/`{` drop the (optional) preceding
    * char; `+` keeps it (the atom occurs at least once adjacent to the
    * run); anchors flush. Runs shorter than 3 chars carry no trigram. */
  private[graft] def requiredLiterals(regex: String): Seq[String] = {
    val runs = Seq.newBuilder[String]
    val cur = new StringBuilder
    def flush(): Unit =
      if (cur.nonEmpty) { runs += cur.toString; cur.clear() }
    var i = 0
    var bad = false
    while (i < regex.length && !bad) {
      regex.charAt(i) match {
        case '(' | ')' | '|' => bad = true
        case '\\' =>
          if (i + 1 >= regex.length) bad = true
          else {
            val c = regex.charAt(i + 1)
            // \d \w \s \b \A … match unknown text → break the run;
            // an escaped metachar is a literal
            if (Character.isLetterOrDigit(c)) flush() else cur += c
            i += 1
          }
        case '[' =>
          flush()
          var j = i + 1
          if (j < regex.length && regex.charAt(j) == '^') j += 1
          if (j < regex.length && regex.charAt(j) == ']') j += 1
          while (j < regex.length && regex.charAt(j) != ']') {
            if (regex.charAt(j) == '\\') j += 1
            j += 1
          }
          if (j >= regex.length) bad = true else i = j
        case '.' => flush()
        case '*' | '?' =>
          if (cur.nonEmpty) cur.setLength(cur.length - 1)
          flush()
        case '{' =>
          // {m,n}: conservatively treat like '*' (preceding atom optional)
          if (cur.nonEmpty) cur.setLength(cur.length - 1)
          flush()
          val j = regex.indexOf('}', i)
          if (j < 0) bad = true else i = j
        case '+' => flush()
        case '^' | '$' => flush()
        case c => cur += c
      }
      i += 1
    }
    if (bad) Seq.empty
    else { flush(); runs.result().filter(_.length >= 3) }
  }

  /** Fingerprint predicate requiring every trigram of every run. */
  private def allPresent(k: String, literals: Seq[String]): Column = {
    val preds = literals
      .flatMap(v => valueFingerprints(k, v).getOrElse(Seq.empty))
      .distinct
      .map(fp => array_contains(col("fingerprints"), fp))
    if (preds.isEmpty) lit(true) else preds.reduce(_ && _)
  }

  /** Candidate predicate over the manifest for one clause; `lit(true)`
    * where the index can't help (sound: never prunes a matching segment).
    */
  def candidate(clause: QueryClause, indexed: Set[String]): Column = clause match {
    case Filter(k, vs, op, _, false, false) if indexed.contains(k) =>
      op match {
        case Ops.EQ | Ops.CONTAINS =>
          vs.headOption.flatMap(valueFingerprints(k, _)) match {
            case Some(fps) =>
              // ALL trigrams of the value must be present
              fps.map(fp => array_contains(col("fingerprints"), fp))
                .reduce(_ && _)
            case None => lit(true)
          }
        case Ops.REGEX =>
          // required-literal extraction: every literal run the regex
          // forces must have all its trigrams in the segment
          vs.headOption.map(v => allPresent(k, requiredLiterals(v)))
            .getOrElse(lit(true))
        case Ops.IN =>
          // any of the values may match → union of per-value candidates
          val per = vs.map(v => valueFingerprints(k, v) match {
            case Some(fps) =>
              fps.map(fp => array_contains(col("fingerprints"), fp))
                .reduce(_ && _)
            case None => lit(true)
          })
          if (per.isEmpty) lit(true) else per.reduce(_ || _)
        case _ => lit(true) // negations/comparisons: no trigram help
      }
    case BinaryClause(q1, q2, "and") =>
      candidate(q1, indexed) && candidate(q2, indexed)
    case BinaryClause(q1, q2, "or") =>
      candidate(q1, indexed) || candidate(q2, indexed)
    case _ => lit(true)
  }

  /** Prune the manifest to the files a query over [startMs, endMs) with
    * `clause` could need. Runs on the manifest only — collects a file
    * list, never touches segment data. */
  def prune(manifest: DataFrame, clause: Option[QueryClause],
      indexed: Set[String], startMs: Long, endMs: Long): Seq[String] = {
    val timePred = col("max_ts") >= startMs && col("min_ts") < endMs
    val pred = clause.map(c => timePred && candidate(c, indexed))
      .getOrElse(timePred)
    manifest.where(pred).select("file")
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** Pruned scan: read only candidate segments, then apply the full
    * filter. Result-identical to scanning everything (pruning is sound);
    * IO-proportional to the candidate set. */
  def scan(spark: SparkSession, manifest: DataFrame,
      clause: Option[QueryClause], indexed: Set[String],
      startMs: Long, endMs: Long): Option[DataFrame] = {
    val files = prune(manifest, clause, indexed, startMs, endMs)
    if (files.isEmpty) None
    else Some(spark.read.option("mergeSchema", "true").parquet(files: _*))
  }
}
