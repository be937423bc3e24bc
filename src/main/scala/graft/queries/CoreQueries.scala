package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core operator inventory (SURVEY.md §2) expressed over the driver test
  * tables, each paired with an ANSI-SQL oracle in [[CoreQueries.oracleSql]].
  *
  * Conventions shared by every query/oracle pair (the driver hashes values
  * after sorting columns by name — see the builder contract):
  *  - every output column is explicitly aliased, identically on both sides;
  *  - every query ends in a fully-deterministic ORDER BY;
  *  - timestamps are projected as epoch-millis BIGINT (`unix_millis` /
  *    `epoch_ms`) — never as raw timestamp columns;
  *  - floating aggregates accumulate in exact DECIMAL and cast the final
  *    value to double (see [[dsum]]), so summation order can never flip a
  *    hash; pure row-level double arithmetic is left unrounded (IEEE ops
  *    in the same order are bit-identical across engines).
  *
  * Scale notes (100 TB thinking): filters are plain column predicates so
  * Catalyst pushes them into the parquet scan; aggregations are
  * partial/final hash aggregates (map-side combine comes free); the one
  * relational join broadcasts its dimension side.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** events.ts is epoch-nanos (LongType — see Tables.load). Step-bucketed
    * epoch-ms; positive timestamps only, so `div` (truncation) matches
    * DuckDB's floor `//`. */
  private def stepTs(stepMs: Long): Column =
    expr(s"(ts div ${stepMs * 1000000L}) * $stepMs").as("step_ts")

  private def tsMs: Column = expr("ts div 1000000").as("ts_ms")

  private def epochNanos(isoUtc: String): Long =
    java.time.Instant.parse(isoUtc).toEpochMilli * 1000000L

  /** Exact-decimal sum cast back to double: the decimal accumulation is
    * order-independent, so the final double is bit-identical across
    * engines and shuffle orders — unlike round(sum(double)), whose
    * half-ties diverge between Spark and DuckDB. */
  private def dec(c: Column): Column =
    c.cast(org.apache.spark.sql.types.DecimalType(18, 2))
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  // ---------------------------------------------------------------- S1/F*
  // S1 scan + projection + F1 eq
  def f1_eq(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events")
      .where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy("event_id")
  }

  // F2 != ; F13-style projection of the grouping tag
  def f2_neq(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .where(col("event_type") =!= "view")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type")

  // F3 in / not_in
  def f3_in(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .where(col("event_type").isin("click", "signup"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .orderBy("event_type")

  def f3_not_in(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .where(!col("event_type").isin("click", "signup"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type")

  // F4 regex (case-insensitive, find-anywhere — reference BaseExpr.scala:486)
  def f4_regex(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .where(col("text").rlike("(?i)spark.*window"))
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  // F5 contains
  def f5_contains(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .where(col("text").contains("merge"))
      .select(col("doc_id"), col("n_chars"))
      .orderBy("doc_id")

  // F6 numeric comparison
  def f6_cmp(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .where(col("value") > 150.0 && col("value") <= 190.0)
      .select(col("event_id"), col("value"))
      .orderBy("event_id")

  // F7 exists (IS NOT NULL)
  def f7_exists(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .where(col("props").isNotNull)
      .agg(count(lit(1)).as("n"))

  // F8 and/or/not composition
  def f8_bool(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .where((col("event_type") === "click" || col("event_type") === "view")
        && !(col("value") < 50.0))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (dsum(col("value")) / count(lit(1))).as("avg_value"))
      .orderBy("event_type")

  // F10 timestamp range (drives partition pruning on a partitioned layout)
  def f10_time_range(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .where(col("ts") >= epochNanos("2024-01-10T00:00:00Z")
        && col("ts") < epochNanos("2024-01-12T00:00:00Z"))
      .select(col("event_id"), tsMs, col("event_type"))
      .orderBy("event_id")

  // ------------------------------------------------------------------ E*
  // E1 regex extraction + synthetic-field filter (reference
  // BaseExpr.scala:244-304: gate with regexp_matches, then project group)
  def e1_extract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .where(col("props").rlike("\"k\":\\s*(\\d+)"))
      .withColumn("k",
        regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("double"))
      .where(col("k") > 50.0)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy("event_type")

  // E2-E8 compute: scalar expression tree → derived columns
  def e2_compute(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_orderkey") < 300)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("charge"),
        concat(col("l_returnflag"), lit("/"), col("l_linestatus"))
          .as("flag_status"),
        locate("A", col("l_returnflag")).cast("long").as("strpos_a"))
      .orderBy("l_orderkey", "l_linenumber")

  // E-json: native JSON attribute extraction — schema-on-read with
  // from_json (the reference reads log attributes through DuckDB's json
  // extension the same way; E1's regex path is the schemaless fallback).
  // Typed extraction + integer-decile rollup per event type; `div` and
  // DuckDB `//` agree on floor semantics for the non-negative key.
  // props parse is the whole cost of the JSON/XML extraction family,
  // and the sandbox events table is one parquet split: spread the
  // narrow (event_type, props) projection first so the parse runs
  // cluster-wide (single-task 350-700 ms stages at sf0.1 otherwise —
  // StageProfile r14). Identity at scale; see Dedup.spreadIfUnderParallel.
  def e12_json_fields(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.spreadBarrier(
      t(s, dir, "events")
        .where(col("props").isNotNull)
        .select(col("event_type"), col("props")), "e12")
      .select(col("event_type"),
        from_json(col("props"), "k INT", Map.empty[String, String])
          .getField("k").cast("long").as("k"))
      .where(col("k").isNotNull)
      .groupBy(col("event_type"), expr("k div 10").as("k_decile"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy("event_type", "k_decile")

  // ------------------------------------------------------------------ A*
  // A1+A3: step-bucketed group aggregation (the chart path)
  def a1_step_agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(stepTs(3600000L), col("event_type"))
      .agg(dsum(col("value")).as("value"), count(lit(1)).as("n"))
      .orderBy("step_ts", "event_type")

  // A3 full basic-agg suite (TPC-H Q1 shape)
  def a3_pricing_agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  // A5 percentiles — exact `percentile` for oracle parity (DuckDB
  // quantile_cont); the mergeable-sketch variant is a separate query.
  def a5_percentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"))
      .orderBy("event_type")

  // A5 via the custom DDSketch TypedImperativeAggregate (the reference's
  // exact sketch contract: relative accuracy 0.01, mergeable partials).
  // Oracle-gated: the sketch quantile promises ±1% of the order statistic
  // at its rank rule (rank = max(ceil(q·n), 1), 1-based); the gate
  // computes those exact order statistics by distributed rank and admits
  // 1.5%, so every group passes deterministically and a broken sketch
  // drops rows and fails the hash. Deeper accuracy/mergeability
  // properties remain asserted in DDSketchSpec.
  def a5_ddsketch(s: SparkSession, dir: String): DataFrame = {
    val sk = t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        graft.functions.DDSketchFunctions
          .ddsketchQuantile(col("value"), 0.5).as("p50"),
        graft.functions.DDSketchFunctions
          .ddsketchQuantile(col("value"), 0.9).as("p90"),
        count(lit(1)).as("n_rows"))
    // distributed selection, not Window.partitionBy(event_type): a
    // handful of event types would sort the whole table in a handful of
    // tasks (the k2-documented low-cardinality window trap)
    val exact = graft.operators.Quantiles.exactByGroup(
      t(s, dir, "events"), "event_type", col("value"),
      Seq("x50" -> 0.5, "x90" -> 0.9),
      rule = graft.operators.Quantiles.CeilRank)
    sk.join(exact, "event_type")
      .where(abs(col("p50") - col("x50")) / col("x50") <= 0.015 &&
        abs(col("p90") - col("x90")) / col("x90") <= 0.015)
      .select(col("event_type"), col("n_rows"))
      .orderBy("event_type")
  }

  // A6 cardinality — exact oracle form
  def a6_distinct_exact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy("event_type")

  // A6/A11 cardinality — HLL++ estimate, oracle-gated against the exact
  // count (≤5%; the default rsd is 5% at ~1σ but these cardinalities are
  // far inside the sparse/exact regime). Output is the exact count.
  def a6_distinct_approx(s: SparkSession, dir: String): DataFrame = {
    val est = t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("users_est"))
    val exact = t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"))
    est.join(exact, "event_type")
      .where(abs(col("users_est") - col("users")) / col("users") <= 0.05)
      .select(col("event_type"), col("users"))
      .orderBy("event_type")
  }

  // A6/A11 via the custom mergeable HLL sketch (lgK=12, the reference's
  // accuracy point). Oracle-gated: the estimate must land within 5% of
  // the exact distinct count (lgK=12 σ is ±1.6%); the hash-checked
  // output is the exact count, so a drifting estimator drops rows and
  // fails. Merge semantics asserted in HllSpec.
  def a6_hll(s: SparkSession, dir: String): DataFrame = {
    val sk = t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(graft.functions.HllFunctions
        .hllEstimate(col("user_id")).as("users_est"))
    val exact = t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"))
    sk.join(exact, "event_type")
      .where(abs(col("users_est") - col("users")) / col("users") <= 0.05)
      .select(col("event_type"), col("users"))
      .orderBy("event_type")
  }

  // Sketch interop: the full lakeside segment loop in the reference's BYTE
  // FORMATS (SketchInterop.scala). Stage 1 persists per-(group, segment)
  // sketches exactly as lakeside ingest would — DataSketches HLL_4 lgK=12
  // compact images (reference Aggregator.scala:43-58); stage 2 is the
  // query-time merge (heapify + Union, TimeGroupedSketchAggregator
  // .scala:48-55). The oracle checks the exact distinct count per group;
  // the entry keeps only groups where the sketch estimate lands within
  // 5% of exact (lgK=12 is ±1.6% σ, and these cardinalities are inside
  // the sketch's exact coupon range) — so a wrong estimate drops rows and
  // breaks the hash match. Deterministic: the library's hashing is seeded.
  def k1_hll_interop(s: SparkSession, dir: String): DataFrame = {
    val segments = t(s, dir, "orders")
      .groupBy(col("o_orderpriority"), (col("o_orderkey") % 8).as("segment"))
      .agg(graft.functions.SketchInteropFunctions
        .dsHllSketch(col("o_custkey")).as("sketch"))
    val merged = segments
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.SketchInteropFunctions
        .dsHllEstimateOf(graft.functions.SketchInteropFunctions
          .dsHllUnion(col("sketch"))).as("est"))
    val exact = t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("exact_users"))
    merged.join(exact, "o_orderpriority")
      .where(abs(col("est") - col("exact_users")) / col("exact_users") <= 0.05)
      .select(col("o_orderpriority").as("priority"), col("exact_users"))
      .orderBy("priority")
  }

  // Sketch interop, DDSketch side: per-(group, segment) sketches in the
  // reference's protobuf payload (readable by BaseExpr.ddSketchFromBytes,
  // reference BaseExpr.scala:97-102), merged at query time with
  // DdProtoMergeAgg. The proto count is exact by construction (hash-
  // checked); the p50/p95 gate compares the sketch quantile against
  // Spark's own exact percentile — structural error ≤ ~1%, gate at 2%,
  // so nothing is ever near the boundary and a broken codec drops rows.
  def k2_dd_proto_interop(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{SketchInteropFunctions => SI}
    val segments = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), (col("l_suppkey") % 16).as("segment"))
      .agg(SI.ddProtoSketch(col("l_extendedprice")).as("sketch"))
    val merged = segments
      .groupBy(col("l_returnflag"))
      .agg(SI.ddProtoStatOf(SI.ddProtoMerge(col("sketch")), "count").as("cnt_d"),
        SI.ddProtoQuantileOf(SI.ddProtoMerge(col("sketch")), lit(0.5)).as("p50"),
        SI.ddProtoQuantileOf(SI.ddProtoMerge(col("sketch")), lit(0.95)).as("p95"))
    // Exact quantiles by distributed selection — NOT Spark's `percentile`
    // aggregate, whose buffer serializes a value→count map of every
    // distinct price between partial and final (measured: 12.9s of this
    // entry's 12.9s at sf0.1), and NOT a Window.partitionBy(flag) sort,
    // which with 3 flags sorts the whole table in 3 tasks (measured:
    // 2.3s of 3.2s). Quantiles.exactByGroup range-partitions the narrow
    // (flag, price) projection across the full shuffle width and picks
    // the order statistic at floor(q·(n-1)) (the rank DDSketch promises
    // ±1% against) via driver-prefix-summed rank offsets. Ties order
    // arbitrarily but the value at a rank is a multiset property.
    val exact = graft.operators.Quantiles.exactByGroup(
      t(s, dir, "lineitem"), "l_returnflag", col("l_extendedprice"),
      Seq("x50" -> 0.5, "x95" -> 0.95))
    merged.join(exact, "l_returnflag")
      .where(abs(col("p50") - col("x50")) / col("x50") <= 0.015 &&
        abs(col("p95") - col("x95")) / col("x95") <= 0.015)
      .select(col("l_returnflag").as("flag"),
        col("cnt_d").cast("long").as("cnt"))
      .orderBy("flag")
  }

  // K3 (beyond the reference's sketches): theta-sketch SET operations —
  // audience overlap (|A ∩ B|, |A \ B|) from mergeable sketch payloads,
  // the query class HLL cannot answer. Two-level build proves the merge
  // path (per-segment sketches → union), k1-style; the gate keeps rows
  // only while every estimate lands within 5% of the exact answer, and
  // the output is the exact set-op counts DuckDB recomputes natively.
  // Deterministic: the library's fixed default seed.
  // Sketch interop, KLL side: the uniform-RANK-error quantile sketch
  // (Karnin–Lang–Liberty) complementing a5/k2's relative-VALUE-error
  // DDSketch — per-(priority, segment) sketches in the DataSketches
  // portable byte image, re-merged at query time from the BYTES (the
  // cross-system path: anything running datasketches-java heapifies
  // them). Gate: KLL(k=200) guarantees ±1.65% rank error, so the merged
  // sketch's median must land between the exact p45 and p55 order
  // statistics — a broken codec, merge, or query drops rows. Output is
  // the exact median, which the oracle replays as a pure order stat.
  def k6_kll_interop(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{KllFunctions => K}
    val o = t(s, dir, "orders")
    // n_orders rides the sketch build: segments partition the orders
    // rows, so the per-segment counts sum to the per-priority total —
    // the r14 spelling ran a third full orders scan for that number.
    val segments = o
      .groupBy(col("o_orderpriority"), (col("o_orderkey") % 8).as("segment"))
      .agg(K.kllSketch(col("o_totalprice")).as("sketch"),
        count(lit(1)).as("n_seg"))
    val est = segments
      .groupBy(col("o_orderpriority"))
      .agg(K.kllMerge(col("sketch")).as("m"), sum(col("n_seg")).as("n_orders"))
      .select(col("o_orderpriority"), K.kllQuantileOf(col("m"), 0.5).as("est"),
        col("n_orders"))
    val exact = graft.operators.Quantiles.exactByGroup(
      o.select(col("o_orderpriority"), col("o_totalprice")),
      "o_orderpriority", col("o_totalprice"),
      Seq(("p45", 0.45), ("p50", 0.5), ("p55", 0.55)))
    est.join(exact, "o_orderpriority")
      .where(col("est") >= col("p45") && col("est") <= col("p55"))
      .select(col("o_orderpriority").as("priority"), col("n_orders"),
        round(col("p50"), 2).as("exact_p50"))
      .orderBy("priority")
  }

  // a21: batch sessionization — gap-based session assignment (30 min),
  // the canonical event-analytics transform (st5 is the STREAMING
  // sibling via session_window). One hash exchange by user_id; the lag
  // and running-sum windows and the per-session re-aggregation all ride
  // that single partitioning. Tie-safe: rows sharing a timestamp always
  // land in the same session whichever engine-internal tie order the
  // window picks, and min/max/count are tie-order-invariant.
  def a21_sessionize(s: SparkSession, dir: String): DataFrame = {
    val gapMs = 1800000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
    val prev = lag(col("ts_ms"), 1).over(w)
    val marked = t(s, dir, "events")
      .select(col("user_id"), tsMs)
      .withColumn("new_s",
        when(prev.isNull || col("ts_ms") - prev > gapMs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_ms")).as("start_ms"),
        max(col("ts_ms")).as("end_ms"))
      .withColumn("duration_ms", col("end_ms") - col("start_ms"))
      .orderBy("user_id", "session_idx")
  }

  // a22: ordered funnel — users progressing signup → view → click →
  // purchase, each stage's timestamp strictly after the previous
  // stage's. Four per-user min-aggregations chained by broadcast-sized
  // joins (the user dimension is tiny next to the event stream at any
  // scale — the event scan is the cost, and it is read once per stage
  // with the stage filter pushed down).
  def a22_funnel(s: SparkSession, dir: String): DataFrame = {
    // One exchange for the whole funnel. The r14 spelling built each
    // stage as (type-filtered scan ⋈ broadcast previous stage).groupBy —
    // a DAG Catalyst expands per consumer, so the signup subtree ran 4×,
    // view 3×, … (20 Exchanges, 4 re-scans of events at explain time).
    // Stage k's entry time is a PER-USER sequential fact — the first
    // type-k event after the user's stage-(k−1) time — so all four
    // stages are chained whole-partition window minima over ONE
    // hash(user_id) partitioning: Catalyst plans the four Window nodes
    // pipelined on a single Exchange, the scan runs once (event_type IN
    // filter pushed), and the counts reduce in one aggregate. Same
    // n_users by construction: t_k = min ts of type-k events with
    // ts > t_{k−1} (null propagates through the strict comparison, so
    // users missing stage k−1 never enter stage k).
    val w = Window.partitionBy(col("user_id"))
    def after(typ: String, prev: Column): Column =
      min(when(col("event_type") === typ && col("ts_ms") > prev,
        col("ts_ms"))).over(w)
    val staged = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), tsMs)
      .where(col("event_type").isin("signup", "view", "click", "purchase"))
      .withColumn("t1",
        min(when(col("event_type") === "signup", col("ts_ms"))).over(w))
      .withColumn("t2", after("view", col("t1")))
      .withColumn("t3", after("click", col("t2")))
      .withColumn("t4", after("purchase", col("t3")))
    staged.groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"),
        max(col("t3")).as("t3"), max(col("t4")).as("t4"))
      .agg(count(col("t1")).as("c1"), count(col("t2")).as("c2"),
        count(col("t3")).as("c3"), count(col("t4")).as("c4"))
      .select(expr("stack(4, 'signup', 1L, c1, 'view', 2L, c2, " +
        "'click', 3L, c3, 'purchase', 4L, c4) AS (stage, stage_idx, n_users)"))
      .orderBy("stage_idx")
  }

  // a23: pivoted day × event-type activity matrix — the wide dashboard
  // shape. An EXPLICIT value list keeps the pivot single-pass (Spark
  // otherwise runs a distinct-values job first) and the output schema
  // deterministic; the pivot compiles to ONE partial/final aggregate
  // (conditional counts), not per-type scans.
  def a23_pivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    t(s, dir, "events")
      .select(expr("(ts div 1000000) div 86400000").as("day"),
        col("event_type"))
      .groupBy(col("day"))
      .pivot("event_type", types)
      .count()
      .select(col("day") +:
        types.map(tp => coalesce(col(tp), lit(0L)).as(s"n_$tp")): _*)
      .orderBy("day")
  }

  // a24: weekly cohort retention — users bucketed by first-activity
  // week, counted distinct in each later week (the product-analytics
  // matrix every event store gets asked for). The first-seen frame is
  // user-dimension-sized → broadcast; one aggregation exchange on
  // (cohort_week, weeks_since) with map-side partial distinct.
  def a24_retention(s: SparkSession, dir: String): DataFrame = {
    val wk = 604800000L
    val e = t(s, dir, "events").select(col("user_id"),
      expr(s"(ts div 1000000) div $wk").as("week"))
    val first = e.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    e.join(broadcast(first), Seq("user_id"))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("weeks_since"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "weeks_since")
  }

  // a25: unpivot/melt — the wide→long reshape (inverse of a23's pivot),
  // Spark's Dataset.unpivot compiles to a single Expand node: each input
  // row fans out to one row per measure with NO shuffle and no join, so
  // at 100 TB the cost is the upstream aggregate alone. The oracle
  // replays it as a 3-way UNION ALL (ANSI portable).
  def a25_unpivot(s: SparkSession, dir: String): DataFrame = {
    val wide = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(dsum(col("l_quantity")).as("qty"),
        dsum(col("l_extendedprice")).as("price"),
        dsum(col("l_discount")).as("disc"))
    wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("qty"), col("price"), col("disc")),
        "measure", "amount")
      .orderBy("l_returnflag", "measure")
  }

  // a26: rolling-baseline anomaly detection on the step-bucketed series —
  // the observability query behind "alert when today's volume deviates
  // from the trailing week" (the reference's chart path feeds exactly
  // such detectors downstream). RANGE frame (7 preceding .. 1 preceding)
  // over the *day key*, not row count, so missing days shrink the
  // baseline instead of silently reaching further back. All frame sums
  // run on exact integer cents (the daily decimal sum × 100), and mean /
  // variance / z are derived from those integers with an explicit
  // double-cast expression tree mirrored verbatim in the oracle — IEEE
  // ops over identical inputs are bit-identical across engines. Scale:
  // one shuffle on event_type for the window; days-per-series is tiny,
  // so a 1000-executor run is bound by the daily pre-aggregation, which
  // is partial/final hash agg over the scan.
  def a26_rolling_anomaly(s: SparkSession, dir: String): DataFrame = {
    val day = 86400000L
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"),
        expr(s"(ts div 1000000) div $day").as("d"))
      .agg((sum(dec(col("value"))) * lit(100)).cast("long").as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rangeBetween(-7, -1)
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s1", sum(col("cents")).over(w))
      .withColumn("ss", sum(col("cents") * col("cents")).over(w))
      .where(col("n") >= 4)
      .select(col("event_type"), col("d"),
        (col("cents").cast("double") / 100.0).as("x"),
        expr("""(CAST(cents AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
               / sqrt((CAST(ss AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                      / CAST(n AS DOUBLE))""").as("z"))
      .withColumn("is_anomaly", abs(col("z")) > 2.0)
      .orderBy("event_type", "d")
  }

  // j10: SCD-2 dimension build — collapse an event stream into
  // [valid_from, valid_to) state intervals per key (the warehouse
  // "slowly changing dimension" every lakehouse MERGE pipeline
  // maintains). Two windows over the SAME (user_id → ts, event_id)
  // partitioning: Catalyst plans one Exchange + one Sort and runs both
  // Window nodes pipelined on it, so at 100 TB this is a single shuffle
  // of the change rows. The far-future close (9999-12-31) keeps
  // valid_to non-null for the hash compare.
  def j10_scd2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val e = t(s, dir, "events")
      .where(col("user_id") < 8)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000000").as("ts_ms"), col("event_type"))
    e.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .select(col("user_id"), col("event_id"),
        col("event_type").as("state"),
        col("ts_ms").as("valid_from"),
        coalesce(lead(col("ts_ms"), 1).over(w), lit(253402300800000L))
          .as("valid_to"),
        lead(col("ts_ms"), 1).over(w).isNull.as("is_current"))
      .orderBy("user_id", "valid_from", "event_id")
  }

  // a30: linear-interpolation gap fill — the third fill policy beside
  // w3's LOCF and a28's zero-fill: a missing sample takes the value
  // linearly interpolated between its nearest reports on either side
  // (chart rendering's default). Four IGNORE-NULLS window passes (prev/
  // next value and timestamp) share ONE (user, event_id) sort — the
  // forward frame is the same sorted partition walked from the other
  // end, no second exchange. The interpolation expression is plain
  // double arithmetic mirrored verbatim in the oracle; edges fall back
  // to the one-sided neighbor.
  def a30_interp_fill(s: SparkSession, dir: String): DataFrame = {
    val base = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val prec = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val foll = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val vOrNull = when(
      expr("CAST(get_json_object(props, '$.k') AS BIGINT) % 5 = 0"),
      lit(null).cast("double")).otherwise(col("value"))
    val tOfV = when(col("v").isNotNull, col("ts_ms"))
    t(s, dir, "events")
      .where(col("user_id") < 8)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000000").as("ts_ms"), vOrNull.as("v"))
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(prec))
      .withColumn("pt", last(tOfV, ignoreNulls = true).over(prec))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(foll))
      .withColumn("nt", first(tOfV, ignoreNulls = true).over(foll))
      .select(col("user_id"), col("event_id"),
        when(col("v").isNotNull, col("v"))
          .when(col("pv").isNull, coalesce(col("nv"), lit(-1.0)))
          .when(col("nv").isNull, col("pv"))
          .when(col("nt") === col("pt"), col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            (col("ts_ms") - col("pt")) / (col("nt") - col("pt")))
          .as("v_filled"),
        col("v").isNull.as("was_gap"))
      .orderBy("user_id", "event_id")
  }

  // w4: rank-function surface — rank / ntile / percent_rank / cume_dist
  // over a unique order key (event_id), so every output is a total-order
  // fact both engines must agree on bit-for-bit (percent_rank and
  // cume_dist are (r-1)/(n-1) and r/n in IEEE doubles — identical
  // expression, identical inputs).
  def w4_rank_functions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
    t(s, dir, "events")
      .where(col("user_id") < 3)
      .select(col("event_type"), col("event_id"))
      .withColumn("rk", rank().over(w).cast("long"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .orderBy("event_type", "event_id")
  }

  // j13: point-in-time (temporal) dimension lookup — each event joined
  // to the SCD-2 state interval (j10) covering its timestamp, the
  // "what was the customer's tier when the order landed" join every
  // warehouse needs. The interval frame is change-row-sized (small
  // next to the event scan), so the range predicate join broadcasts
  // it; each event lands in exactly one [valid_from, valid_to)
  // interval by construction.
  def j13_scd2_lookup(s: SparkSession, dir: String): DataFrame = {
    val intervals = j10_scd2(s, dir)
      .select(col("user_id"), col("state"), col("valid_from"),
        col("valid_to"))
    val ev = t(s, dir, "events")
      .where(col("user_id") < 8)
      .select(col("user_id"), expr("ts div 1000000").as("ts_ms"))
    ev.join(broadcast(intervals), Seq("user_id"))
      .where(col("ts_ms") >= col("valid_from") &&
        col("ts_ms") < col("valid_to"))
      .groupBy(col("user_id"), col("state"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("user_id", "state")
  }

  // a29: modern aggregate surface — argmax without a self-join via the
  // max(struct) / max_by pair (both resolve the "row with the highest
  // value" ask that otherwise costs a window), plus count_if /
  // bool_or. Ties on value are broken INSIDE the ordering key
  // (value·1e9 + id): value is a double, so the composite is a double
  // too — determinism rests on BOTH engines evaluating the identical
  // IEEE-754 expression (same multiply, same add), which yields the
  // same total order even where the products aren't exact integers. A
  // bare max_by on a tied key would be engine-arbitrary and can never
  // hash-match.
  def a29_agg_surface(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"), col("event_id"), col("value"),
        (col("value") * 1000000000L + col("event_id")).as("ord"))
      .groupBy(col("event_type"))
      .agg(
        max_by(col("event_id"), col("ord")).as("top_event_id"),
        max(col("value")).as("max_value"),
        count_if(col("value") > 100.0).as("n_over_100"),
        bool_or(col("value") > 190.0).as("any_over_190"))
      .orderBy("event_type")

  // u6: bag-semantics set operations (INTERSECT ALL / EXCEPT ALL) —
  // duplicates carry multiplicity (min / difference of counts), the
  // variant u3's distinct set ops can't express; Spark lowers them to
  // count-annotated joins (no exponential expansion).
  def u6_bag_setops(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_type"), col("user_id"),
        expr("CAST(floor(value) AS INT) div 10").as("decile"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("decile"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("decile"))
    clicks.intersectAll(views)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_common"))
      .join(
        clicks.exceptAll(views)
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_only")),
        Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("n_only"), lit(0L)).as("n_only"))
      .orderBy("user_id")
  }

  // j12: null-aware anti join — NOT IN under three-valued logic, the
  // classic correctness corner (a NULL probe value compares UNKNOWN to
  // every list element, so the row is excluded — NOT "kept because it
  // matched nothing"). Spark plans the null-aware single-column case
  // as a broadcast null-aware anti join; a naive LeftAnti on equality
  // would wrongly keep the NULL rows, and the DuckDB oracle's own 3VL
  // NOT IN catches exactly that divergence.
  def j12_null_aware_anti(s: SparkSession, dir: String): DataFrame = {
    // the json parse is the entry's whole cost and the sandbox scan is
    // one split (a 754 ms serial stage — SerialScan r14): the SQL reads
    // a spread view of the narrow (event_type, props) projection, with
    // the barrier so the NOT-IN rewrite can't drag the parse back below
    // the exchange. The null-aware anti join semantics under test are
    // untouched — this is input plumbing.
    graft.operators.Dedup.spreadBarrier(
      t(s, dir, "events")
        .where(col("props").isNotNull)
        .select(col("event_type"), col("props")), "j12")
      .createOrReplaceTempView("events_j12")
    s.sql(
      """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
        |FROM (
        |  SELECT event_type,
        |    CASE WHEN CAST(get_json_object(props, '$.k') AS BIGINT) % 7 = 0
        |         THEN NULL
        |         ELSE CAST(get_json_object(props, '$.k') AS BIGINT) END AS k
        |  FROM events_j12)
        |WHERE k NOT IN (SELECT * FROM VALUES (5), (11), (23), (42) AS t(v))
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  // w3: last-observation-carried-forward (LOCF) gap filling — sparse
  // telemetry carries the last reported value forward until the next
  // report, via last_value(..., ignoreNulls = true) over an unbounded
  // preceding frame (the IGNORE NULLS window corner both engines must
  // agree on). Values are nulled deterministically (k ≡ 0 mod 5) so
  // the fill has real gaps to bridge; one exchange on user_id.
  def w3_locf(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .where(col("user_id") < 8)
      .select(col("user_id"), col("event_id"),
        when(expr("CAST(get_json_object(props, '$.k') AS BIGINT) % 5 = 0"),
          lit(null).cast("double")).otherwise(col("value")).as("v"))
      .withColumn("v_filled", // leading rows before any report → -1.0
        coalesce(last(col("v"), ignoreNulls = true).over(w), lit(-1.0)))
      .withColumn("was_gap", col("v").isNull)
      .drop("v")
      .orderBy("user_id", "event_id")
  }

  // a28: dense-series gap fill — charts need every step bucket present,
  // so missing (day, type) cells are generated with sequence() +
  // explode over the PER-TYPE day span and zero-filled by a left join
  // (the reference's chart path zero-fills exactly like this before
  // formula alignment — j1). The generated spine is |types| × |days|
  // rows — trivial next to the fact scan at any scale — and the join
  // broadcasts the daily aggregate when small or shuffles on the
  // composite key when not; either way the scan happens once.
  def a28_gap_fill(s: SparkSession, dir: String): DataFrame = {
    val day = 86400000L
    val daily = t(s, dir, "events")
      .where(col("value") > 190.0) // sparse: most (day, type) cells empty
      .groupBy(col("event_type"),
        expr(s"(ts div 1000000) div $day").as("d"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
    val span = t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(expr(s"min((ts div 1000000) div $day)").as("d0"),
        expr(s"max((ts div 1000000) div $day)").as("d1"))
    val spine = span.select(col("event_type"),
      explode(expr("sequence(d0, d1)")).as("d"))
    spine.join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("total"), lit(0.0)).as("total"))
      .orderBy("event_type", "d")
  }

  // e15: XML field extraction — the third semi-structured dialect
  // beside JSON (e12/e13) and regex (e1). Extraction runs through the
  // single-pass codegen XmlExtractStruct (one byte-walk per row, no
  // DOM) — Spark's xpath_long builds a full javax.xml DOM per row and
  // was the slowest entry in the round-6 bench at 147× the oracle;
  // e17_xpath keeps the xpath_* surface covered on a gated subset.
  // Payloads are synthesized from props (the container data ships no
  // XML), so the oracle reconstructs the attribute independently and
  // the XML extraction itself is what gets cross-checked.
  def e15_xml_extract(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.spreadBarrier(
      t(s, dir, "events")
        .where(col("props").isNotNull)
        .select(col("event_type"), col("props")), "e15")
      .select(col("event_type"),
        concat(lit("<e k=\""),
          expr("CAST(get_json_object(props, '$.k') AS BIGINT)"),
          lit("\"/>")).as("xml"))
      .select(col("event_type"),
        graft.functions.XmlExtractStruct(col("xml"), "e", Seq("k"))
          .getField("k").cast("long").as("k"))
      .where(col("k") % 3 === 0)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy("event_type")

  // e17: the xpath_* built-in surface itself (users migrating xpath
  // queries keep working) — correct but DOM-per-row, so the entry gates
  // to a selective subset first: the filter prunes BEFORE the parse, the
  // plan every xpath user should run at scale. The heavy-lift XML path
  // is e15's codegen extractor.
  def e17_xpath(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.spreadBarrier(
      t(s, dir, "events")
        .where(col("props").isNotNull && col("value") > 195.0)
        .select(col("event_type"), col("event_id"), col("props")), "e17")
      .where(expr("CAST(get_json_object(props, '$.k') AS BIGINT)").isNotNull)
      .select(col("event_type"),
        concat(lit("<e k=\""),
          expr("CAST(get_json_object(props, '$.k') AS BIGINT)"),
          lit("\"><v>"), col("event_id"), lit("</v></e>")).as("xml"))
      .select(col("event_type"),
        xpath_long(col("xml"), lit("/e/@k")).as("k"),
        xpath_long(col("xml"), lit("/e/v")).as("v"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        sum(col("v")).as("sum_v"))
      .orderBy("event_type")

  // e18: LIST XML extraction — every occurrence of an attribute across
  // repeated elements (the xpath('//e/@k') node-set semantics), via the
  // single-pass XmlExtractAll walk instead of a per-row DOM. Each
  // synthesized payload carries THREE <e> elements — k, k+1, and one
  // WITHOUT the attribute (which must contribute nothing, per node-set
  // semantics) — so the oracle's closed form (2 values per row, sum
  // 2k+1) breaks if the scanner misses an occurrence, double-counts,
  // or fabricates an empty string for the absent attribute.
  def e18_xml_extract_all(s: SparkSession, dir: String): DataFrame = {
    val k = expr("CAST(get_json_object(props, '$.k') AS BIGINT)")
    graft.operators.Dedup.spreadBarrier(
      t(s, dir, "events")
        .where(col("props").isNotNull)
        .select(col("event_type"), col("props")), "e18")
      .where(k.isNotNull)
      .select(col("event_type"),
        concat(lit("<r><e k=\""), k, lit("\"/><e k=\""), k + 1,
          lit("\"/><e j=\"x\"/></r>")).as("xml"))
      .select(col("event_type"),
        explode(graft.functions.XmlExtractAll(col("xml"), "e", "k"))
          .as("kv"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("kv").cast("long")).as("sum_k"))
      .orderBy("event_type")
  }

  // e19: corrupt-record quarantine — the ingest-robustness contract: a
  // malformed payload must never kill the job OR silently vanish; it
  // routes to a quarantine column (Spark's PERMISSIVE parse with
  // columnNameOfCorruptRecord) while valid rows parse on. Corruption is
  // planted deterministically (every 7th event gets a leading brace),
  // so the oracle replays exactly which rows quarantine and what the
  // surviving parse sums to — a parser that drops bad rows, double-
  // parses, or mis-routes a good row hash-mismatches.
  def e19_corrupt_quarantine(s: SparkSession, dir: String): DataFrame = {
    // a LEADING brace breaks the parse at the first token (a trailing
    // one is tolerated by Jackson's stream reader, which stops after the
    // first complete JSON value)
    val raw = when(col("event_id") % 7 === 0, concat(lit("{"), col("props")))
      .otherwise(col("props"))
    val parsed = graft.operators.Dedup.spreadIfUnderParallel(
      t(s, dir, "events")
        .where(col("props").isNotNull)
        .select(col("event_type"), col("event_id"), col("props")))
      .select(col("event_type"),
        from_json(raw, "k BIGINT, _corrupt STRING",
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt")).as("j"))
    parsed.groupBy(col("event_type"))
      .agg(count(when(col("j._corrupt").isNull, 1)).as("n_ok"),
        count(when(col("j._corrupt").isNotNull, 1)).as("n_bad"),
        sum(when(col("j._corrupt").isNull, col("j.k"))).as("sum_k"))
      .orderBy("event_type")
  }

  // o2: keyset-free pagination (ORDER BY … LIMIT … OFFSET) — the API
  // layer's page-2 request. Spark executes offset+limit as a single
  // TakeOrdered of offset+limit rows then drops the prefix — no global
  // sort — which is the right plan as long as page·size stays
  // API-bounded (the reference caps rows at 1000).
  def o2_pagination(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy(desc("value"), col("event_id"))
      .offset(20)
      .limit(20)

  // e16 (Spark 4 SQL pipe syntax): the |> operator chain — filter,
  // derived column, aggregate, order — reading top-to-bottom like the
  // DataFrame API while remaining pure SQL. Same Catalyst plan as the
  // nested-SELECT equivalent (the oracle), which is the point: pipe
  // syntax is parser sugar, not a new execution path.
  def e16_pipe_syntax(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events").createOrReplaceTempView("events")
    s.sql(
      """FROM events
        ||> WHERE event_type IN ('click', 'purchase')
        ||> EXTEND CAST(value AS DECIMAL(18,2)) AS dvalue
        ||> AGGREGATE count(*) AS n,
        |     CAST(sum(dvalue) AS DOUBLE) AS total
        |   GROUP BY event_type
        ||> ORDER BY event_type""".stripMargin)
  }

  // u5 (Spark 4 recursive CTE): single-source reachability with hop
  // distances in PURE SQL — WITH RECURSIVE lowers to Catalyst's
  // UnionLoop, the declarative sibling of g3's hand-rolled dataflow
  // BFS. The recursion guard (dist < 13) bounds the loop below the
  // engine's cteRecursionLevelLimit; UNION ALL recursion re-visits
  // nodes at multiple depths, so min(dist) aggregates the closure —
  // at scale the per-level work is the same frontier ⋈ edges shuffle
  // g3 pays, chosen by the engine instead of the author. DuckDB
  // replays the identical recursion as the oracle.
  def u5_recursive_cte(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "documents").createOrReplaceTempView("documents")
    s.sql(
      """WITH RECURSIVE reach(id, dist) AS (
        |  SELECT CAST(0 AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist
        |  UNION ALL
        |  SELECT e.dst, r.dist + 1 FROM reach r
        |  JOIN (
        |    SELECT d.doc_id AS src, d.doc_id + 1 AS dst
        |    FROM documents d JOIN documents d2 ON d2.doc_id = d.doc_id + 1
        |    WHERE d.doc_id % 50 != 49
        |    UNION ALL
        |    SELECT d.doc_id, d.doc_id + 10
        |    FROM documents d JOIN documents d2 ON d2.doc_id = d.doc_id + 10
        |    WHERE d.doc_id % 50 <= 39
        |  ) e ON e.src = r.id
        |  WHERE r.dist < 13)
        |SELECT id, min(dist) AS dist FROM reach
        |GROUP BY id ORDER BY id""".stripMargin)
  }

  // j11: MERGE/upsert as dataflow — the lakehouse write path (apply a
  // changeset of update/delete/insert actions onto a base table)
  // expressed as ONE full-outer join on the key plus a CASE projection,
  // which is exactly what engine MERGE implementations lower to. The
  // changeset here is derived deterministically from the base (keys
  // ≡0 mod 7 update, mod 11 delete, mod 13 insert re-keyed out of
  // range) so the oracle replays it verbatim. At 100 TB the join
  // shuffles both sides on the key once — or zero times on a bucketed
  // layout (j9) — and the changeset side is typically small enough to
  // broadcast; AQE picks that at runtime from its actual size.
  def j11_merge_upsert(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
    // One scan builds the whole changeset: each row emits its update /
    // delete / insert actions from a per-row array (a key ≡ 0 mod 7·13
    // legitimately emits both an update and a re-keyed insert, exactly
    // as the r14 three-branch union did). The union-of-filtered-scans
    // spelling re-planned the orders scan under each branch — three
    // extra scans of the fact table for row sets one pass derives.
    val changes = base
      .where(pmod(col("k"), lit(7)) === 0 || pmod(col("k"), lit(11)) === 0 ||
        pmod(col("k"), lit(13)) === 0)
      .select(explode(array(
        when(pmod(col("k"), lit(7)) === 0,
          struct(col("k"), (col("v") * 0.5).as("nv"),
            lit("update").as("action"))),
        when(pmod(col("k"), lit(11)) === 0 && pmod(col("k"), lit(7)) =!= 0,
          struct(col("k"), lit(0.0).as("nv"), lit("delete").as("action"))),
        when(pmod(col("k"), lit(13)) === 0,
          struct((col("k") + 10000000L).as("k"), lit(1.0).as("nv"),
            lit("insert").as("action"))))).as("_a"))
      .where(col("_a").isNotNull)
      .select(col("_a.k").as("k"), col("_a.nv").as("nv"),
        col("_a.action").as("action"))
    base.join(changes, Seq("k"), "full_outer")
      .where(coalesce(col("action"), lit("")) =!= "delete")
      .select(col("k"),
        when(col("action").isin("update", "insert"), col("nv"))
          .otherwise(col("v")).as("v"),
        coalesce(col("action"), lit("keep")).as("action"))
      .orderBy("k")
  }

  // f11 (Spark 4 collations): case-insensitive predicate via a UTF8_LCASE
  // collated comparison — the collation rides the *type*, so the filter
  // stays a plain codegen'd predicate (no lower() wrapper materializing a
  // new string per row) and still reaches the scan as a pushed filter.
  // Oracle replays with lower() equality, which is semantically identical
  // for ASCII-range data.
  def f11_collation(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .where(collate(col("lang"), "UTF8_LCASE") === lit("EN"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"))
      .orderBy("source")

  // w2: per-event trailing-hour count via a time-RANGE window frame —
  // "how many errors in the hour before this one", the point-in-time
  // context column behind burst detection and rate-limit audits. RANGE
  // on the epoch-ms key (not ROWS) makes the frame a time predicate:
  // ties share a frame and sparse periods shrink it, so the semantics
  // survive any event density. One shuffle on event_type; the frame
  // scan is the sliding-window pass within each sorted partition.
  def w2_sliding_range(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts_ms"))
      .rangeBetween(-3600000L, 0L)
    t(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        expr("ts div 1000000").as("ts_ms"))
      .withColumn("n_last_hour", count(lit(1)).over(w))
      .orderBy("event_id")
  }

  // e14 (Spark 4 SQL scripting): a two-phase adaptive report — a scalar
  // derived FROM the data (half the max) becomes the filter threshold
  // of the main query, expressed as a BEGIN…END script with a declared
  // variable. Procedural control flow runs on the driver; each
  // statement is a full Catalyst-planned query, so the data path stays
  // distributed. The oracle replays it as a scalar subquery — the
  // equivalence IS the point (scripting adds sequencing, not a new
  // execution engine).
  def e14_sql_script(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events").createOrReplaceTempView("events")
    val prev = s.conf.getOption("spark.sql.scripting.enabled")
    s.conf.set("spark.sql.scripting.enabled", "true")
    try s.sql(
      """BEGIN
        |  DECLARE thr DOUBLE;
        |  SET thr = (SELECT max(value) * 0.5 FROM events);
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM events WHERE value > thr
        |  GROUP BY event_type ORDER BY event_type;
        |END""".stripMargin)
    finally prev match {
      case Some(v) => s.conf.set("spark.sql.scripting.enabled", v)
      case None => s.conf.unset("spark.sql.scripting.enabled")
    }
  }

  // e13 (Spark 4 VARIANT): parse_json → an open-schema VARIANT column,
  // fields extracted with variant_get at query time. Unlike e12's
  // from_json (fixed struct schema declared up front), VARIANT is the
  // semi-structured path for telemetry whose attribute set drifts —
  // exactly the reference's `_json` overflow column (SURVEY §1.2) —
  // while the binary encoding keeps extraction O(field), not O(parse).
  def e13_variant(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.spreadBarrier(
      t(s, dir, "events")
        .where(col("props").isNotNull)
        .select(col("event_type"), col("props")), "e13")
      .select(col("event_type"),
        variant_get(try_parse_json(col("props")), "$.k", "long").as("k"))
      .where(col("k").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  def k3_theta_setops(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{ThetaFunctions => TF}
    val ev = t(s, dir, "events")
    def sketchOf(tpe: String, alias: String) = ev
      .where(col("event_type") === tpe)
      .groupBy((col("user_id") % 8).as("segment"))
      .agg(TF.thetaSketch(col("user_id")).as("sk"))
      .agg(TF.thetaUnion(col("sk")).as(alias))
    val est = sketchOf("click", "sk_a").crossJoin(sketchOf("purchase", "sk_b"))
      .select(
        TF.thetaEstimateOf(col("sk_a")).as("est_a"),
        TF.thetaEstimateOf(col("sk_b")).as("est_b"),
        TF.thetaIntersectEstimate(col("sk_a"), col("sk_b")).as("est_i"),
        TF.thetaDiffEstimate(col("sk_a"), col("sk_b")).as("est_d"))
    // Exact set-op counts in ONE pass: per-user membership flags from a
    // single filtered scan, then the four counts from one tiny closing
    // aggregate. The r14 spelling built distinct user sets per type and
    // ran intersect + exceptAll — six expansions of the events subtree
    // plus two wide set-op shuffles for numbers that are all functions
    // of the (in_a, in_b) flag pair. |A∩B| = users with both flags,
    // A\B (exceptAll over the already-distinct sets = set difference) =
    // users with in_a and not in_b. The sketch side above deliberately
    // stays on the raw scans: building it from the exact distinct would
    // invert the design (sketches exist to avoid that pass).
    val flags = ev.where(col("event_type").isin("click", "purchase"))
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "click", 1).otherwise(0)).as("in_a"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("in_b"))
    val exact = flags.agg(
      count(when(col("in_a") === 1, lit(1))).as("n_click"),
      count(when(col("in_b") === 1, lit(1))).as("n_purchase"),
      count(when(col("in_a") === 1 && col("in_b") === 1, lit(1))).as("n_both"),
      count(when(col("in_a") === 1 && col("in_b") === 0, lit(1)))
        .as("n_click_only"))
    // gate form |est - n| <= 0.05n + 0.5: relative 5% plus half-a-unit
    // absolute slack so empty set-op results (n = 0 — here every click
    // user also purchases) gate on "estimate rounds to zero" instead of
    // dividing by zero
    def ok(est: Column, n: Column) = abs(est - n) <= n * 0.05 + 0.5
    exact.crossJoin(est)
      .where(ok(col("est_a"), col("n_click")) &&
        ok(col("est_b"), col("n_purchase")) &&
        ok(col("est_i"), col("n_both")) &&
        ok(col("est_d"), col("n_click_only")))
      .select(col("n_click"), col("n_purchase"), col("n_both"),
        col("n_click_only"))
  }

  // K4 (beyond the reference's sketches): Count-Min FREQUENCY sketch —
  // the fixed-memory token-frequency path for corpora whose vocabulary
  // outgrows an exact groupBy(token) count table. Two-level build proves
  // the additive-merge contract (per-source sketches → element-wise-sum
  // union for the ALL row), k1-style; the probe set is the top-10
  // document-frequency tokens (deterministic, oracle-expressible). The
  // gate keeps a row only while the estimate honors BOTH sides of the CM
  // contract — est >= exact (CM can never undercount) and
  // est − exact <= ceil(e/width · N) (the ε·N accuracy promise) — and
  // the output is the exact occurrence counts DuckDB recomputes
  // natively. Deterministic: counter addition commutes, so the sketch is
  // a pure function of the input multiset under any partitioning.
  def k4_countmin(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{CmFunctions => CM}
    import graft.operators.TextAnalysis
    val width = 8192
    val d = t(s, dir, "documents")
    val toks = d.select(col("source"),
      explode(TextAnalysis.tokens(col("text"))).as("w"))
    val perSource = toks.groupBy(col("source"))
      .agg(CM.cmSketch(col("w"), depth = 4, width = width).as("sk"),
        count(lit(1)).as("n_tok"))
    val all = perSource
      .agg(CM.cmMerge(col("sk")).as("sk"), sum(col("n_tok")).as("n_tok"))
      .select(lit("ALL").as("source"), col("sk"), col("n_tok"))
    val probes = d
      .select(explode(array_distinct(
        TextAnalysis.tokens(col("text")))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), col("token")).limit(10)
      .select(col("token"))
    val est = perSource.select(col("source"), col("sk"), col("n_tok"))
      .union(all)
      .crossJoin(broadcast(probes))
      .select(col("source"), col("token"), col("n_tok"),
        CM.cmEstimateOf(col("sk"), col("token")).as("est"))
    val exactSrc = toks
      .join(broadcast(probes), col("w") === col("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("n_occ"))
    val exact = exactSrc.union(
      exactSrc.groupBy(col("token")).agg(sum(col("n_occ")).as("n_occ"))
        .select(lit("ALL").as("source"), col("token"), col("n_occ")))
    est.join(exact, Seq("source", "token"), "left")
      .select(col("source"), col("token"),
        coalesce(col("n_occ"), lit(0L)).as("n_occurrences"),
        col("est"), col("n_tok"))
      .where(col("est") >= col("n_occurrences") &&
        col("est") - col("n_occurrences") <=
          ceil(col("n_tok") * (math.E / width)).cast("long"))
      .select(col("source"), col("token"), col("n_occurrences"))
      .orderBy("source", "token")
  }

  // A15 (beyond the reference's sketch percentiles): EXACT per-group
  // quantiles by distributed selection — range-partitioned narrow
  // projection + driver rank offsets + targeted pick; no task ever sorts
  // more than its slice (see Quantiles scaladoc). The oracle replicates
  // the rank convention (floor(q·(n-1))+1) with a window; the value at a
  // rank is a multiset property, so tie order cannot diverge.
  def a15_exact_quantiles(s: SparkSession, dir: String): DataFrame =
    graft.operators.Quantiles.exactByGroup(
        t(s, dir, "lineitem"), "l_returnflag",
        col("l_extendedprice"), Seq("p50" -> 0.5, "p95" -> 0.95))
      .orderBy("l_returnflag")

  // a33: exact INTERPOLATED percentiles (the CONT convention — a15's
  // selection helper implements DISC rank order statistics). Spark's
  // `percentile` aggregate interpolates between neighboring order
  // statistics; run over integer cents at quarter fractions, every
  // term of the interpolation (ints < 2^53 and f ∈ {.25,.5,.75}) is
  // exactly representable, so the two engines' formula shapes cannot
  // diverge even in the last bit.
  def a33_percentile_interp(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"), (dec(col("value")) * 100).cast("long").as("cents"))
      .groupBy(col("event_type"))
      .agg(
        (expr("percentile(cents, 0.25)") / 100.0).as("p25"),
        (expr("percentile(cents, 0.5)") / 100.0).as("p50"),
        (expr("percentile(cents, 0.75)") / 100.0).as("p75"))
      .orderBy("event_type")

  // A16 (beyond the reference): two-phase salted aggregation for hot
  // keys — per-(key, salt) partial then per-key final, so a dominant key
  // spreads over n reducers instead of one. The salt derives from row
  // content (no rand()), so retries and the oracle replay identically;
  // sums accumulate in decimal so the extra aggregation layer cannot
  // flip a float bit vs the oracle's direct group-sum.
  def a16_salted_agg(s: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedAggregate(
        t(s, dir, "events")
          .select(col("event_type"), col("event_id"),
            dec(col("value")).as("v")),
        keyCols = Seq("event_type"), valueCol = "v",
        saltCols = Seq("event_id"), n = 16)
      .select(col("event_type"),
        col("sum_v").cast("double").as("total"), col("count"))
      .orderBy("event_type")

  // A17: exponential moving average of the per-day value series per
  // event type (reference EMA.scala:20-40's recurrence in its closed
  // weighted-sum form — Ema.finalEma). The daily series is tiny after
  // aggregation, so the ranking window orders 30 points per type, not
  // raw events; the oracle replays the same weights with pow().
  def a17_ema(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy((expr("ts div 1000000") - expr("ts div 1000000") % 86400000L)
        .as("day"), col("event_type"))
      .agg(dsum(col("value")).as("v"))
    graft.functions.Ema.finalEma(daily, Seq("event_type"), col("day"),
        col("v"), alpha = 0.3, outScale = 6) // decimal-rounded pre-cast
      .select(col("event_type"), col("n_points"), col("ema"))
      .orderBy("event_type")
  }

  // A10 tag-value count (tags API: SELECT col, COUNT(*) GROUP BY col)
  def a10_tag_values(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("event_type"))

  // A12 count→rate transform (value / stepSeconds)
  def a12_rate(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(stepTs(3600000L))
      .agg((count(lit(1)) / lit(3600.0)).as("rate"))
      .orderBy("step_ts")

  // a31: counter increase() with RESET detection — the Prometheus
  // semantic a12's naive count→rate cannot express: a monotone counter
  // that wraps/restarts must contribute its post-reset value, not a
  // negative delta. The counter is synthesized deterministically (per-
  // user running cents modulo 1e7, so resets really occur), and every
  // step is integer arithmetic over one (user → ts) window — exact
  // under any partitioning. Per-series state is a lag(1), so at 100 TB
  // this is one shuffle on the series key; the step re-aggregation is
  // partial/final on top.
  def a31_counter_increase(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000000").as("ts_ms"),
        (dec(col("value")) * 100).cast("long").as("cents"))
      .withColumn("cum", sum(col("cents")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("ctr", pmod(col("cum"), lit(10000000L)))
      .withColumn("prev", lag(col("ctr"), 1).over(w))
      .withColumn("inc",
        when(col("prev").isNull, lit(0L))
          .when(col("ctr") >= col("prev"), col("ctr") - col("prev"))
          .otherwise(col("ctr")))
      .groupBy(expr("(ts_ms div 3600000) * 3600000").as("step_ts"))
      .agg(sum(col("inc")).as("increase_cents"),
        sum(when(col("prev").isNotNull && col("ctr") < col("prev"), 1L)
          .otherwise(0L)).as("n_resets"))
      .orderBy("step_ts")
  }

  // a32: rolling 7-day actives (the WAU curve) — count DISTINCT users
  // over a trailing window, which SQL window frames cannot express
  // (no DISTINCT aggregate over a frame). The dataflow rewrite: dedup
  // to (user, active_day), fan each pair out to the 7 report days it
  // keeps the user active for (sequence + explode — bounded, exact),
  // dedup again, count per day. At 100 TB the expansion is 7× the
  // (user, day) DISTINCT pairs — dimension-table-sized next to the
  // event scan — and every aggregation is partial/final.
  def a32_rolling_actives(s: SparkSession, dir: String): DataFrame = {
    val day = 86400000L
    val active = t(s, dir, "events")
      .select(col("user_id"), expr(s"(ts div 1000000) div $day").as("d"))
      .distinct()
    val span = t(s, dir, "events")
      .agg(expr(s"min((ts div 1000000) div $day)").as("d0"),
        expr(s"max((ts div 1000000) div $day)").as("d1"))
    active
      .select(col("user_id"),
        explode(expr("sequence(d, d + 6)")).as("report_d"))
      .distinct()
      .crossJoin(broadcast(span))
      .where(col("report_d") >= col("d0") && col("report_d") <= col("d1"))
      .groupBy(col("report_d"))
      .agg(countDistinct(col("user_id")).as("wau"))
      .orderBy("report_d")
  }

  // ------------------------------------------------------------------ O*
  // O1 exemplar top-k: ORDER BY ts DESC LIMIT n → TakeOrderedAndProject
  def o1_topk(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(tsMs, col("event_id"), col("event_type"), col("value"))
      .orderBy(desc("ts_ms"), desc("event_id"))
      .limit(100)

  // ------------------------------------------------------------------ U*
  // U1 source union (unionByName) + re-aggregation
  def u1_union(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val a = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("value"), lit("clicks").as("src"))
    val b = ev.where(col("event_type") === "purchase")
      .select(col("value"), col("event_id"), lit("purchases").as("src"))
    a.unionByName(b)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .orderBy("src")
  }

  // U3 set operations: users who clicked but never made a high-value
  // purchase (EXCEPT) vs users who did both (INTERSECT) — Spark's
  // built-in set ops, re-agged to a compact deterministic summary
  // (the value>150 gate keeps both cohorts non-empty in the fixture)
  def u3_set_ops(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clickers = ev.where(col("event_type") === "click")
      .select(col("user_id"))
    val bigBuyers = ev.where(
        col("event_type") === "purchase" && col("value") > 150)
      .select(col("user_id"))
    val onlyClicked = clickers.except(bigBuyers)
      .select(col("user_id"), lit("click_only").as("cohort"))
    val both = clickers.intersect(bigBuyers)
      .select(col("user_id"), lit("both").as("cohort"))
    onlyClicked.unionByName(both)
      .groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_users"), min(col("user_id")).as("min_user"),
        max(col("user_id")).as("max_user"))
      .orderBy("cohort")
  }

  // A14 grouping sets: one pass producing per-event_type totals AND the
  // grand total (the reference has no grouping sets; Spark's native
  // GROUPING SETS demonstrates the subsumption with an oracle)
  def a14_grouping_sets(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    ev.createOrReplaceTempView("events_gs")
    s.sql(
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(grouping(event_type) AS BIGINT) AS is_total
        |FROM events_gs
        |GROUP BY GROUPING SETS ((event_type), ())
        |ORDER BY is_total, event_type""".stripMargin)
  }

  // a34: full CUBE with a grouping_id bitmask — all four aggregation
  // levels of a 2-dim cube in ONE pass (Spark expands the grouping
  // sets map-side via Expand, so the fact scan happens once, not
  // per-level). grouping() bits disambiguate "NULL because aggregated"
  // from a genuine NULL value — the correctness corner COALESCE alone
  // would hide; both engines compute the same bit per column position.
  def a34_cube(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events").createOrReplaceTempView("events_cube")
    s.sql(
      """WITH e AS (
        |  SELECT event_type, user_id % 4 AS ub, value FROM events_cube)
        |SELECT COALESCE(event_type, '_all') AS event_type,
        |  COALESCE(ub, -1) AS ub,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(grouping(event_type) AS BIGINT) * 2
        |    + CAST(grouping(ub) AS BIGINT) AS gid
        |FROM e GROUP BY CUBE (event_type, ub)
        |ORDER BY gid, event_type, ub""".stripMargin)
  }

  // ------------------------------------------------------------------ J*
  // J1 formula join — div semantics: inner join, drop zero denominator
  // (reference Formula.scala:59-63)
  def j1_formula_div(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(stepTs(86400000L)).agg(dsum(col("value")).as("v1"))
    val views = ev.where(col("event_type") === "view")
      .groupBy(stepTs(86400000L)).agg(dsum(col("value")).as("v2"))
    clicks.join(views, Seq("step_ts"))
      .where(col("v2") =!= 0.0)
      .select(col("step_ts"), (col("v1") / col("v2")).as("value"))
      .orderBy("step_ts")
  }

  // J1 formula join — add semantics: full outer + zero-fill
  // (reference Formula.scala:46-47)
  def j1_formula_add(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(stepTs(86400000L)).agg(dsum(col("value")).as("v1"))
    val errs = ev.where(col("event_type") === "error")
      .groupBy(stepTs(86400000L)).agg(dsum(col("value")).as("v2"))
    clicks.join(errs, Seq("step_ts"), "full_outer")
      .select(col("step_ts"),
        (coalesce(col("v1"), lit(0.0)) + coalesce(col("v2"), lit(0.0)))
          .as("value"))
      .orderBy("step_ts")
  }

  // Relational join with broadcast dimensions (beyond the reference's
  // surface; Spark-native). nation/region are tiny → broadcast.
  def j2_join_enrich(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    val nation = t(s, dir, "nation")
    orders
      .join(cust, orders("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("n_name")
  }

  // J-family extension: AS-OF join — each event enriched with the last
  // CLOSED per-minute rollup of its type (anchor ts = minute END, so an
  // event never sees its own minute), within a 10-minute tolerance.
  // Operator: operators/AsOf bucketed-interval equi-join (no window over
  // the fact side); oracle: DuckDB's native ASOF LEFT JOIN with the
  // tolerance applied as a post-mask (equivalent: any anchor farther
  // than the latest one is farther still).
  def j3_asof_enrich(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("event_id"), col("event_type"),
      expr("ts div 1000000").as("ms"))
    val rollups = ev.groupBy(col("event_type"),
        (expr("ms div 60000") * 60000 + 60000).as("ats"))
      .agg(count(lit(1)).as("rollup_n"))
    graft.operators.AsOf.joinAsOf(ev.where(col("event_id") < 2000),
        rollups, Seq("event_type"), "ms", "ats", Seq("rollup_n"),
        toleranceMs = 600000L, bucketMs = 60000L)
      .select(col("event_id"), col("event_type"), col("asof_ts"),
        col("rollup_n"))
      .orderBy("event_id")
  }

  // J-family extension: range join — every 5-minute sliding window (one
  // per minute) covering each event, a multi-match interval join. Spark
  // would plan the raw inequality join as BroadcastNestedLoop; the
  // operator's bucketed equi-join shape is partitioned by key AND time.
  // Oracle: DuckDB evaluates the same inequality join directly.
  def j4_range_join(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("event_id"), col("event_type"),
      expr("ts div 1000000").as("ms"))
    val intervals = ev
      .groupBy(col("event_type"), (expr("ms div 60000") * 60000).as("lo"))
      .agg(count(lit(1)).as("rollup_n"))
      .withColumn("hi", col("lo") + 300000L)
    graft.operators.RangeJoin.pointInInterval(
        ev.where(col("event_id") < 500), intervals,
        Seq("event_type"), "ms", "lo", "hi", Seq("rollup_n"),
        bucketMs = 60000L, maxLenMs = 300000L)
      .select(col("event_id"), col("event_type"),
        col("range_lo"), col("rollup_n"))
      .orderBy("event_id", "range_lo")
  }

  // J-family extension: interval-INTERVAL overlap join, KEYLESS — the
  // "user sessions × incident windows" correlation (which users were
  // active while any high-severity error hour was open). Both sides
  // bucket-explode and equi-join on the hour bucket; the first-shared-
  // bucket tie-break (bucket == max of the two start buckets) emits
  // each overlapping pair exactly once WITHOUT a distinct shuffle.
  // Oracle: DuckDB evaluates the inequality join directly (its IEJoin).
  def j13_interval_overlap(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("value"),
        expr("ts div 1000000").as("ms"))
    val sessions = ev
      .groupBy(col("user_id"), expr("ms div 86400000").as("day"))
      .agg(min(col("ms")).as("a_start"), (max(col("ms")) + 1).as("a_end"))
    val incidents = ev
      .where(col("event_type") === "error" && col("value") > 190)
      .select((expr("ms div 3600000") * 3600000).as("b_start"))
      .distinct()
      .withColumn("b_end", col("b_start") + 3600000L)
    graft.operators.RangeJoin.intervalOverlap(
        sessions, incidents, Seq.empty,
        "a_start", "a_end", "b_start", "b_end", Seq("b_start"),
        bucketMs = 3600000L, maxLenMs = 86400000L)
      .select(col("user_id"), col("day"), col("b_start"))
      .orderBy("user_id", "day", "b_start")
  }

  // a36: TIME-WEIGHTED average — the gauge-integral semantics (each
  // sample holds until the next one, LOCF): per (event_type, day),
  // Σ value_i · (ts_{i+1} − ts_i) / Σ (ts_{i+1} − ts_i), the operator
  // behind every correct "average CPU over the hour" panel (a plain avg
  // over-weights bursts of samples). One window (lead) + one aggregate.
  // Determinism: the hold interval is an exact integer of millis and
  // value rides DECIMAL(18,2), so the weighted sum is EXACT on both
  // engines and the final division is one identical IEEE op — no
  // rounding tolerance needed. Ties order by (ms, event_id) on both
  // sides; the last sample of each group carries no interval (nothing
  // to hold until) and drops out of both numerator and denominator.
  def a36_time_weighted_avg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("ms"), col("event_id"))
    t(s, dir, "events")
      .select(col("event_type"), col("event_id"), col("value"),
        expr("ts div 1000000").as("ms"))
      .withColumn("day", expr("ms div 86400000"))
      .withColumn("hold", lead(col("ms"), 1).over(w) - col("ms"))
      .where(col("hold").isNotNull)
      .groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,2)") * col("hold"))
          .cast("double") / sum(col("hold"))).as("tw_avg"),
        sum(col("hold")).as("span_ms"))
      .orderBy("event_type", "day")
  }

  // ------------------------------------------------------------------ W*
  // W1 window functions (absent in reference; free in Spark)
  def w1_window(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(desc("event_id"))
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 3)
      .select(col("user_id"), col("rn"), col("event_id"), col("event_type"))
      .orderBy("user_id", "rn")
  }

  // J6 (beyond the reference): the classic selective multi-way join
  // (TPC-H Q3 shape) — customer filter → orders date filter → lineitem
  // date filter, 3-way join, grouped revenue, top-10. The plan proof at
  // scale: both dimension filters push to the parquet scans, Catalyst
  // reorders so the small filtered sides broadcast (AQE decides from
  // runtime sizes), and the top-10 compiles to TakeOrderedAndProject —
  // never a global sort. Decimal revenue keeps the oracle hash exact.
  def j6_multiway_join(s: SparkSession, dir: String): DataFrame = {
    val cutoff = "1998-06-01 00:00:00"
    val cust = t(s, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = t(s, dir, "orders")
      .where(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    // decimal × decimal: a decimal × double product would promote to
    // double (both engines) and make the sum partition-order-dependent
    val li = t(s, dir, "lineitem")
      .where(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .select(col("l_orderkey"),
        (dec(col("l_extendedprice")) * (lit(1.0) - col("l_discount"))
          .cast(org.apache.spark.sql.types.DecimalType(8, 6))).as("rev"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("o_orderkey"))
      .limit(10)
  }

  // J7 (beyond the reference): the star-schema rollup over EVERY
  // dimension table in the fixture — lineitem joined through supplier →
  // nation → region (Q5's local-supplier chain) and part (type filter),
  // revenue per (region, part type). The snowflake dimensions are tiny
  // and broadcast; the fact table streams through map-side hash joins
  // with zero fact-side shuffles before the final 2-key aggregate.
  def j7_star_rollup(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_suppkey"), col("l_partkey"),
      (dec(col("l_extendedprice")) * (lit(1.0) - col("l_discount"))
        .cast(org.apache.spark.sql.types.DecimalType(8, 6))).as("rev"))
    val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val nat = t(s, dir, "nation").select(col("n_nationkey"), col("n_regionkey"))
    val reg = t(s, dir, "region").select(col("r_regionkey"), col("r_name"))
    val prt = t(s, dir, "part")
      .where(col("p_type").isin("ECONOMY", "STANDARD"))
      .select(col("p_partkey"), col("p_type"))
    li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .join(prt, col("l_partkey") === col("p_partkey"))
      .groupBy(col("r_name"), col("p_type"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("rev")).cast("double").as("revenue"))
      .orderBy("r_name", "p_type")
  }

  // J8 (beyond the reference): Bloom runtime-filter join — a selective
  // dimension predicate (one nation's customers, ~1/25 of the table)
  // gates the fact scan MAP-SIDE through a Bloom over the filtered dim
  // keys, so rows that cannot join are dropped inside the scan stage and
  // never reach the join's exchange; the exact join then discards the
  // fpp sliver. Result is provably the plain join (no false negatives),
  // which is the oracle. At 100 TB this is the difference between
  // shuffling the whole fact table and shuffling ~4% of it.
  def j8_bloom_join(s: SparkSession, dir: String): DataFrame = {
    val dim = t(s, dir, "customer")
      .where(col("c_nationkey") === 7)
      .select(col("c_custkey"))
    val fact = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderpriority"),
        dec(col("o_totalprice")).as("v"))
    graft.operators.RuntimeFilter.bloomJoin(
        fact, "o_custkey", dim, "c_custkey")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("v")).cast("double").as("total_price"))
      .select(col("o_orderpriority").as("priority"),
        col("n_orders"), col("total_price"))
      .orderBy("priority")
  }

  // J5 (beyond the reference): salted equi-join for a skewed fact key
  // against a dimension too big to broadcast — the dimension replicates
  // n× with a salt column and the join key becomes (key, salt), so a hot
  // customer spreads over n reducers. Result must equal the plain join;
  // the oracle is that plain join. broadcast hints are disabled so the
  // salted SortMergeJoin path actually executes at fixture scale.
  def j5_salted_join(s: SparkSession, dir: String): DataFrame = {
    val fact = t(s, dir, "orders")
      .select(col("o_custkey"), dec(col("o_totalprice")).as("v"))
    val dim = t(s, dir, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    graft.operators.Skew.saltedJoin(fact, dim.hint("shuffle_merge"),
        "o_custkey", n = 8, factSaltCols = Seq("v"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("v")).cast("double").as("total"))
      .orderBy("c_mktsegment")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j5_salted_join" -> j5_salted_join _,
    "j6_multiway_join" -> j6_multiway_join _,
    "j7_star_rollup" -> j7_star_rollup _,
    "f1_eq" -> f1_eq _,
    "f2_neq" -> f2_neq _,
    "f3_in" -> f3_in _,
    "f3_not_in" -> f3_not_in _,
    "f4_regex" -> f4_regex _,
    "f5_contains" -> f5_contains _,
    "f6_cmp" -> f6_cmp _,
    "f7_exists" -> f7_exists _,
    "f8_bool" -> f8_bool _,
    "f10_time_range" -> f10_time_range _,
    "e1_extract" -> e1_extract _,
    "e2_compute" -> e2_compute _,
    "e12_json_fields" -> e12_json_fields _,
    "a1_step_agg" -> a1_step_agg _,
    "a3_pricing_agg" -> a3_pricing_agg _,
    "a5_percentile" -> a5_percentile _,
    "a5_ddsketch" -> a5_ddsketch _,
    "a6_distinct_exact" -> a6_distinct_exact _,
    "a6_distinct_approx" -> a6_distinct_approx _,
    "a6_hll" -> a6_hll _,
    "k1_hll_interop" -> k1_hll_interop _,
    "k6_kll_interop" -> k6_kll_interop _,
    "a21_sessionize" -> a21_sessionize _,
    "a22_funnel" -> a22_funnel _,
    "a23_pivot" -> a23_pivot _,
    "a24_retention" -> a24_retention _,
    "a25_unpivot" -> a25_unpivot _,
    "a26_rolling_anomaly" -> a26_rolling_anomaly _,
    "j10_scd2" -> j10_scd2 _,
    "f11_collation" -> f11_collation _,
    "e13_variant" -> e13_variant _,
    "w2_sliding_range" -> w2_sliding_range _,
    "j11_merge_upsert" -> j11_merge_upsert _,
    "u5_recursive_cte" -> u5_recursive_cte _,
    "e14_sql_script" -> e14_sql_script _,
    "j12_null_aware_anti" -> j12_null_aware_anti _,
    "w3_locf" -> w3_locf _,
    "a28_gap_fill" -> a28_gap_fill _,
    "a29_agg_surface" -> a29_agg_surface _,
    "u6_bag_setops" -> u6_bag_setops _,
    "a30_interp_fill" -> a30_interp_fill _,
    "e15_xml_extract" -> e15_xml_extract _,
    "e17_xpath" -> e17_xpath _,
    "e18_xml_extract_all" -> e18_xml_extract_all _,
    "e19_corrupt_quarantine" -> e19_corrupt_quarantine _,
    "e16_pipe_syntax" -> e16_pipe_syntax _,
    "o2_pagination" -> o2_pagination _,
    "a31_counter_increase" -> a31_counter_increase _,
    "a32_rolling_actives" -> a32_rolling_actives _,
    "a33_percentile_interp" -> a33_percentile_interp _,
    "a34_cube" -> a34_cube _,
    "w4_rank_functions" -> w4_rank_functions _,
    "j13_scd2_lookup" -> j13_scd2_lookup _,
    "k2_dd_proto_interop" -> k2_dd_proto_interop _,
    "a15_exact_quantiles" -> a15_exact_quantiles _,
    "a16_salted_agg" -> a16_salted_agg _,
    "a17_ema" -> a17_ema _,
    "k3_theta_setops" -> k3_theta_setops _,
    "k4_countmin" -> k4_countmin _,
    "j8_bloom_join" -> j8_bloom_join _,
    "a10_tag_values" -> a10_tag_values _,
    "a12_rate" -> a12_rate _,
    "o1_topk" -> o1_topk _,
    "u1_union" -> u1_union _,
    "u3_set_ops" -> u3_set_ops _,
    "a14_grouping_sets" -> a14_grouping_sets _,
    "j1_formula_div" -> j1_formula_div _,
    "j3_asof_enrich" -> j3_asof_enrich _,
    "j4_range_join" -> j4_range_join _,
    "j13_interval_overlap" -> j13_interval_overlap _,
    "a36_time_weighted_avg" -> a36_time_weighted_avg _,
    "j1_formula_add" -> j1_formula_add _,
    "j2_join_enrich" -> j2_join_enrich _,
    "w1_window" -> w1_window _
  )

  val oracleSql: Map[String, String] = Map(
    "f1_eq" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'click' ORDER BY event_id""".stripMargin,
    "f2_neq" ->
      """SELECT event_type, count(*) AS n FROM events
        |WHERE event_type != 'view' GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "f3_in" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events WHERE event_type IN ('click', 'signup')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "f3_not_in" ->
      """SELECT event_type, count(*) AS n FROM events
        |WHERE event_type NOT IN ('click', 'signup')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "f4_regex" ->
      """SELECT doc_id, lang FROM documents
        |WHERE regexp_matches(text, 'spark.*window', 'i')
        |ORDER BY doc_id""".stripMargin,
    "f5_contains" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE contains(text, 'merge') ORDER BY doc_id""".stripMargin,
    "f6_cmp" ->
      """SELECT event_id, value FROM events
        |WHERE value > 150.0 AND value <= 190.0 ORDER BY event_id""".stripMargin,
    "f7_exists" ->
      "SELECT count(*) AS n FROM events WHERE props IS NOT NULL",
    "f8_bool" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
        |FROM events
        |WHERE (event_type = 'click' OR event_type = 'view')
        |  AND NOT (value < 50.0)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "f10_time_range" ->
      """SELECT event_id, epoch_ms(ts) AS ts_ms, event_type FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-12 00:00:00'
        |ORDER BY event_id""".stripMargin,
    "e1_extract" ->
      """SELECT event_type, count(*) AS n, sum(k) AS sum_k FROM (
        |  SELECT event_type,
        |         TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS DOUBLE) AS k
        |  FROM events WHERE regexp_matches(props, '"k":\s*(\d+)')
        |) WHERE k > 50.0 GROUP BY event_type ORDER BY event_type""".stripMargin,
    "e2_compute" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS revenue,
        |  l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge,
        |  l_returnflag || '/' || l_linestatus AS flag_status,
        |  strpos(l_returnflag, 'A') AS strpos_a
        |FROM lineitem WHERE l_orderkey < 300
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "e12_json_fields" ->
      """WITH j AS (
        |  SELECT event_type,
        |    CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |  FROM events WHERE props IS NOT NULL)
        |SELECT event_type, k // 10 AS k_decile,
        |  count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
        |FROM j WHERE k IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "a1_step_agg" ->
      """SELECT (epoch_ms(ts) // 3600000) * 3600000 AS step_ts, event_type,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value,
        |  count(*) AS n
        |FROM events GROUP BY step_ts, event_type
        |ORDER BY step_ts, event_type""".stripMargin,
    "a3_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  sum(l_quantity) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  min(l_quantity) AS min_qty,
        |  max(l_quantity) AS max_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a5_percentile" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a6_distinct_exact" ->
      """SELECT event_type, count(DISTINCT user_id) AS users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a6_distinct_approx" ->
      """SELECT event_type, count(DISTINCT user_id) AS users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a5_ddsketch" ->
      """SELECT event_type, count(*) AS n_rows
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a6_hll" ->
      """SELECT event_type, count(DISTINCT user_id) AS users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "k1_hll_interop" ->
      """SELECT o_orderpriority AS priority,
        |  count(DISTINCT o_custkey) AS exact_users
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // a21: identical gap/running-sum convention; sessions are tie-safe
    "a21_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
        |m AS (
        |  SELECT user_id, ts_ms,
        |    CASE WHEN lag(ts_ms) OVER w IS NULL
        |      OR ts_ms - lag(ts_ms) OVER w > 1800000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)),
        |x AS (
        |  SELECT user_id, ts_ms,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_ms
        |      ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM m)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  count(*) AS n_events, min(ts_ms) AS start_ms,
        |  max(ts_ms) AS end_ms, max(ts_ms) - min(ts_ms) AS duration_ms
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // a22: the same strictly-ordered stage chain
    "a22_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |s1 AS (SELECT user_id, min(ms) AS t FROM e
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(ms) AS t FROM e JOIN s1 USING (user_id)
        |  WHERE event_type = 'view' AND ms > s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(ms) AS t FROM e JOIN s2 USING (user_id)
        |  WHERE event_type = 'click' AND ms > s2.t GROUP BY 1),
        |s4 AS (SELECT e.user_id, min(ms) AS t FROM e JOIN s3 USING (user_id)
        |  WHERE event_type = 'purchase' AND ms > s3.t GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 'signup' AS stage, CAST(1 AS BIGINT) AS stage_idx,
        |    count(*) AS n_users FROM s1
        |  UNION ALL SELECT 'view', 2, count(*) FROM s2
        |  UNION ALL SELECT 'click', 3, count(*) FROM s3
        |  UNION ALL SELECT 'purchase', 4, count(*) FROM s4)
        |ORDER BY stage_idx""".stripMargin,
    // a23: conditional counts replay the explicit-value pivot
    "a23_pivot" ->
      """SELECT (epoch_ms(ts) // 86400000) AS day,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // a24: same week bucketing and first-week cohort assignment
    "a24_retention" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) // 604800000 AS week FROM events),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1)
        |SELECT f.cohort_week, e.week - f.cohort_week AS weeks_since,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // k6: the sketch's median is gated against exact p45/p55 order
    // statistics in-plan (KLL rank error ≤1.65% at k=200), so the
    // oracle replays only the exact median — floor(q·(N−1))+1 rank
    "k6_kll_interop" ->
      """WITH o AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS cnt
        |  FROM orders)
        |SELECT o_orderpriority AS priority,
        |  CAST(max(cnt) AS BIGINT) AS n_orders,
        |  round(max(CASE WHEN rn =
        |    CAST(floor(0.5 * (cnt - 1)) AS BIGINT) + 1
        |    THEN o_totalprice END), 2) AS exact_p50
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,
    "k2_dd_proto_interop" ->
      """SELECT l_returnflag AS flag, count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "j3_asof_enrich" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, epoch_ms(ts) AS ms FROM events),
        |r AS (
        |  SELECT event_type, (ms // 60000) * 60000 + 60000 AS ats,
        |    count(*) AS rollup_n
        |  FROM ev GROUP BY 1, 2),
        |l AS (SELECT * FROM ev WHERE event_id < 2000)
        |SELECT l.event_id, l.event_type,
        |  CASE WHEN l.ms - r.ats < 600000 THEN r.ats END AS asof_ts,
        |  CASE WHEN l.ms - r.ats < 600000 THEN r.rollup_n END AS rollup_n
        |FROM l ASOF LEFT JOIN r
        |  ON l.event_type = r.event_type AND l.ms >= r.ats
        |ORDER BY event_id""".stripMargin,
    "k3_theta_setops" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
        |b AS (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |SELECT
        |  (SELECT count(*) FROM a) AS n_click,
        |  (SELECT count(*) FROM b) AS n_purchase,
        |  (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
        |    AS n_both,
        |  (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
        |    AS n_click_only""".stripMargin,
    "j8_bloom_join" ->
      """SELECT o.o_orderpriority AS priority, count(*) AS n_orders,
        |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_nationkey = 7
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "k4_countmin" ->
      """WITH probe AS (
        |  SELECT token FROM (
        |    SELECT token, count(*) AS df FROM (
        |      SELECT doc_id, unnest(list_distinct(
        |        regexp_split_to_array(trim(text), '\s+'))) AS token
        |      FROM documents)
        |    GROUP BY token)
        |  ORDER BY df DESC, token LIMIT 10),
        |tok AS (
        |  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+'))
        |    AS token
        |  FROM documents),
        |srcs AS (
        |  SELECT DISTINCT source FROM documents UNION ALL SELECT 'ALL'),
        |cnt AS (
        |  SELECT source, token, count(*) AS c
        |  FROM tok JOIN probe USING (token) GROUP BY source, token),
        |u AS (
        |  SELECT * FROM cnt
        |  UNION ALL
        |  SELECT 'ALL' AS source, token, CAST(sum(c) AS BIGINT) AS c
        |  FROM cnt GROUP BY token)
        |SELECT s.source, p.token,
        |  CAST(coalesce(u.c, 0) AS BIGINT) AS n_occurrences
        |FROM srcs s CROSS JOIN probe p
        |LEFT JOIN u ON u.source = s.source AND u.token = p.token
        |ORDER BY s.source, p.token""".stripMargin,
    "j4_range_join" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, epoch_ms(ts) AS ms FROM events),
        |r AS (
        |  SELECT event_type, (ms // 60000) * 60000 AS lo,
        |    (ms // 60000) * 60000 + 300000 AS hi, count(*) AS rollup_n
        |  FROM ev GROUP BY 1, 2),
        |l AS (SELECT * FROM ev WHERE event_id < 500)
        |SELECT l.event_id, l.event_type, r.lo AS range_lo, r.rollup_n
        |FROM l JOIN r
        |  ON l.event_type = r.event_type AND l.ms >= r.lo AND l.ms < r.hi
        |ORDER BY event_id, range_lo""".stripMargin,
    "a36_time_weighted_avg" ->
      """WITH e AS (
        |  SELECT event_type, event_id, value, epoch_ms(ts) AS ms,
        |    epoch_ms(ts) // 86400000 AS day
        |  FROM events),
        |h AS (
        |  SELECT event_type, day, value,
        |    lead(ms) OVER (PARTITION BY event_type, day
        |      ORDER BY ms, event_id) - ms AS hold
        |  FROM e)
        |SELECT event_type, CAST(day AS BIGINT) AS day,
        |  CAST(sum(CAST(value AS DECIMAL(18,2)) * hold) AS DOUBLE)
        |    / sum(hold) AS tw_avg,
        |  CAST(sum(hold) AS BIGINT) AS span_ms
        |FROM h WHERE hold IS NOT NULL
        |GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin,
    "j13_interval_overlap" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, value, epoch_ms(ts) AS ms
        |  FROM events),
        |s AS (
        |  SELECT user_id, ms // 86400000 AS day,
        |    min(ms) AS a_start, max(ms) + 1 AS a_end
        |  FROM ev GROUP BY 1, 2),
        |i AS (
        |  SELECT DISTINCT (ms // 3600000) * 3600000 AS b_start
        |  FROM ev WHERE event_type = 'error' AND value > 190)
        |SELECT s.user_id, CAST(s.day AS BIGINT) AS day, i.b_start
        |FROM s JOIN i
        |  ON s.a_start < i.b_start + 3600000 AND i.b_start < s.a_end
        |ORDER BY user_id, day, b_start""".stripMargin,
    "j7_star_rollup" ->
      """SELECT r.r_name, p.p_type, count(*) AS n_items,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |    * CAST(1.0 - l.l_discount AS DECIMAL(8,6))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_type IN ('ECONOMY', 'STANDARD')
        |GROUP BY 1, 2 ORDER BY r_name, p_type""".stripMargin,
    "j6_multiway_join" ->
      """SELECT o.o_orderkey, o.o_orderpriority,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |    * CAST(1.0 - l.l_discount AS DECIMAL(8,6))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY 1, 2
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "j5_salted_join" ->
      """SELECT c.c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,
    "a17_ema" ->
      """WITH daily AS (
        |  SELECT (epoch_ms(ts) // 86400000) * 86400000 AS day, event_type,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |ranked AS (
        |  SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS k,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM daily)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n_points,
        |  CAST(round(sum(CAST(round(CASE WHEN k = 1 THEN pow(0.7, n - 1)
        |      ELSE 0.3 * pow(0.7, n - k) END * v, 9) AS DECIMAL(27, 9))),
        |    6) AS DOUBLE) AS ema
        |FROM ranked GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a16_salted_agg" ->
      """SELECT event_type,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  count(*) AS count
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a15_exact_quantiles" ->
      """WITH r AS (
        |  SELECT l_returnflag,
        |    CAST(l_extendedprice AS DOUBLE) AS v,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY CAST(l_extendedprice AS DOUBLE)) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  max(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1
        |      THEN v END) AS p50,
        |  max(CASE WHEN rn = CAST(floor(0.95 * (n - 1)) AS BIGINT) + 1
        |      THEN v END) AS p95
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "a10_tag_values" ->
      """SELECT event_type, count(*) AS cnt FROM events
        |GROUP BY event_type ORDER BY cnt DESC, event_type""".stripMargin,
    "a12_rate" ->
      """SELECT (epoch_ms(ts) // 3600000) * 3600000 AS step_ts,
        |  count(*) / 3600.0 AS rate
        |FROM events GROUP BY step_ts ORDER BY step_ts""".stripMargin,
    "o1_topk" ->
      """SELECT epoch_ms(ts) AS ts_ms, event_id, event_type, value
        |FROM events ORDER BY ts_ms DESC, event_id DESC LIMIT 100""".stripMargin,
    "u1_union" ->
      """SELECT src, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total FROM (
        |  SELECT event_id, value, 'clicks' AS src FROM events
        |  WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT event_id, value, 'purchases' AS src FROM events
        |  WHERE event_type = 'purchase'
        |) GROUP BY src ORDER BY src""".stripMargin,
    "u3_set_ops" ->
      """WITH c AS (SELECT user_id FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id FROM events
        |      WHERE event_type = 'purchase' AND value > 150.0),
        |u AS (
        |  SELECT user_id, 'click_only' AS cohort
        |  FROM (SELECT user_id FROM c EXCEPT SELECT user_id FROM p)
        |  UNION ALL
        |  SELECT user_id, 'both'
        |  FROM (SELECT user_id FROM c INTERSECT SELECT user_id FROM p))
        |SELECT cohort, count(*) AS n_users, min(user_id) AS min_user,
        |  max(user_id) AS max_user
        |FROM u GROUP BY cohort ORDER BY cohort""".stripMargin,
    "a14_grouping_sets" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(grouping(event_type) AS BIGINT) AS is_total
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), ())
        |ORDER BY is_total, event_type""".stripMargin,
    "j1_formula_div" ->
      """WITH a AS (
        |  SELECT (epoch_ms(ts) // 86400000) * 86400000 AS step_ts,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v1
        |  FROM events WHERE event_type = 'click' GROUP BY step_ts),
        |b AS (
        |  SELECT (epoch_ms(ts) // 86400000) * 86400000 AS step_ts,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v2
        |  FROM events WHERE event_type = 'view' GROUP BY step_ts)
        |SELECT a.step_ts AS step_ts, a.v1 / b.v2 AS value
        |FROM a JOIN b USING (step_ts) WHERE b.v2 != 0.0
        |ORDER BY step_ts""".stripMargin,
    "j1_formula_add" ->
      """WITH a AS (
        |  SELECT (epoch_ms(ts) // 86400000) * 86400000 AS step_ts,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v1
        |  FROM events WHERE event_type = 'click' GROUP BY step_ts),
        |b AS (
        |  SELECT (epoch_ms(ts) // 86400000) * 86400000 AS step_ts,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v2
        |  FROM events WHERE event_type = 'error' GROUP BY step_ts)
        |SELECT COALESCE(a.step_ts, b.step_ts) AS step_ts,
        |  COALESCE(a.v1, 0.0) + COALESCE(b.v2, 0.0) AS value
        |FROM a FULL OUTER JOIN b ON a.step_ts = b.step_ts
        |ORDER BY step_ts""".stripMargin,
    "j2_join_enrich" ->
      """SELECT n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "w1_window" ->
      """SELECT user_id, rn, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events
        |) WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin,
    "a25_unpivot" ->
      """WITH w AS (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price,
        |    CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'qty' AS measure, qty AS amount FROM w
        |UNION ALL SELECT l_returnflag, 'price' AS measure, price AS amount FROM w
        |UNION ALL SELECT l_returnflag, 'disc' AS measure, disc AS amount FROM w
        |ORDER BY l_returnflag, measure""".stripMargin,
    "a26_rolling_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS d,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, d, cents,
        |    count(*) OVER w AS n,
        |    sum(cents) OVER w AS s1,
        |    sum(cents * cents) OVER w AS ss
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY d
        |               RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, d, CAST(cents AS DOUBLE) / 100.0 AS x,
        |  (CAST(cents AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |   / sqrt((CAST(ss AS DOUBLE)
        |           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |          / CAST(n AS DOUBLE)) AS z,
        |  abs((CAST(cents AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |   / sqrt((CAST(ss AS DOUBLE)
        |           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |          / CAST(n AS DOUBLE))) > 2.0 AS is_anomaly
        |FROM r WHERE n >= 4 ORDER BY event_type, d""".stripMargin,
    "j10_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type
        |  FROM events WHERE user_id < 8),
        |chg AS (
        |  SELECT user_id, event_id, ts_ms, event_type FROM (
        |    SELECT user_id, event_id, ts_ms, event_type,
        |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
        |        AS prev_type
        |    FROM e)
        |  WHERE prev_type IS NULL OR prev_type != event_type)
        |SELECT user_id, event_id, event_type AS state, ts_ms AS valid_from,
        |  COALESCE(lead(ts_ms) OVER w, 253402300800000) AS valid_to,
        |  lead(ts_ms) OVER w IS NULL AS is_current
        |FROM chg
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
        |ORDER BY user_id, valid_from, event_id""".stripMargin,
    "f11_collation" ->
      """SELECT source, count(*) AS n FROM documents
        |WHERE lower(lang) = lower('EN')
        |GROUP BY source ORDER BY source""".stripMargin,
    "a34_cube" ->
      """WITH e AS (
        |  SELECT event_type, user_id % 4 AS ub, value FROM events)
        |SELECT COALESCE(event_type, '_all') AS event_type,
        |  COALESCE(ub, -1) AS ub,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(grouping(event_type) AS BIGINT) * 2
        |    + CAST(grouping(ub) AS BIGINT) AS gid
        |FROM e GROUP BY CUBE (event_type, ub)
        |ORDER BY gid, event_type, ub""".stripMargin,
    "a33_percentile_interp" ->
      """SELECT event_type,
        |  quantile_cont(cents, 0.25) / 100.0 AS p25,
        |  quantile_cont(cents, 0.5) / 100.0 AS p50,
        |  quantile_cont(cents, 0.75) / 100.0 AS p75
        |FROM (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a32_rolling_actives" ->
      """WITH active AS (
        |  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS d
        |  FROM events),
        |span AS (
        |  SELECT min(epoch_ms(ts) // 86400000) AS d0,
        |    max(epoch_ms(ts) // 86400000) AS d1
        |  FROM events),
        |fan AS (
        |  SELECT DISTINCT user_id, unnest(generate_series(d, d + 6))
        |    AS report_d
        |  FROM active)
        |SELECT report_d, count(DISTINCT user_id) AS wau
        |FROM fan CROSS JOIN span
        |WHERE report_d >= d0 AND report_d <= d1
        |GROUP BY report_d ORDER BY report_d""".stripMargin,
    "a31_counter_increase" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |c AS (
        |  SELECT user_id, event_id, ts_ms,
        |    sum(cents) OVER w % 10000000 AS ctr
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |d AS (
        |  SELECT ts_ms, ctr,
        |    lag(ctr) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
        |      AS prev
        |  FROM c)
        |SELECT (ts_ms // 3600000) * 3600000 AS step_ts,
        |  CAST(sum(CASE WHEN prev IS NULL THEN 0
        |                WHEN ctr >= prev THEN ctr - prev
        |                ELSE ctr END) AS BIGINT) AS increase_cents,
        |  CAST(sum(CASE WHEN prev IS NOT NULL AND ctr < prev
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_resets
        |FROM d GROUP BY 1 ORDER BY step_ts""".stripMargin,
    "e16_pipe_syntax" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events WHERE event_type IN ('click', 'purchase')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "e15_xml_extract" ->
      """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
        |FROM (
        |  SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events WHERE props IS NOT NULL)
        |WHERE k % 3 = 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // e19: every 7th event's payload is corrupted (leading brace) —
    // quarantine counts and surviving sums replay exactly
    "e19_corrupt_quarantine" ->
      """SELECT event_type,
        |  CAST(sum(CASE WHEN event_id % 7 <> 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_ok,
        |  CAST(sum(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_bad,
        |  CAST(sum(CASE WHEN event_id % 7 <> 0 THEN
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) END)
        |    AS BIGINT) AS sum_k
        |FROM events WHERE props IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // e18: two attribute-bearing <e> per row (k, k+1), one without →
    // exactly 2 list entries per row, sum 2k+1
    "e18_xml_extract_all" ->
      """SELECT event_type, CAST(count(*) * 2 AS BIGINT) AS n,
        |  CAST(sum(2 * k + 1) AS BIGINT) AS sum_k
        |FROM (
        |  SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events WHERE props IS NOT NULL)
        |WHERE k IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "e17_xpath" ->
      """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(sum(event_id) AS BIGINT) AS sum_v
        |FROM (
        |  SELECT event_type, event_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events WHERE props IS NOT NULL AND value > 195.0)
        |WHERE k IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "o2_pagination" ->
      """SELECT event_id, event_type, value FROM events
        |ORDER BY value DESC, event_id LIMIT 20 OFFSET 20""".stripMargin,
    "a30_interp_fill" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
        |    CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 = 0
        |         THEN NULL ELSE value END AS v
        |  FROM events WHERE user_id < 8),
        |x AS (
        |  SELECT user_id, event_id, ts_ms, v,
        |    last_value(v IGNORE NULLS) OVER wp AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN ts_ms END IGNORE NULLS)
        |      OVER wp AS pt,
        |    first_value(v IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN ts_ms END IGNORE NULLS)
        |      OVER wf AS nt
        |  FROM e
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wf AS (PARTITION BY user_id ORDER BY event_id
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, event_id,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN pv IS NULL THEN COALESCE(nv, -1.0)
        |       WHEN nv IS NULL THEN pv
        |       WHEN nt = pt THEN pv
        |       ELSE pv + (nv - pv) * (ts_ms - pt) / (nt - pt) END AS v_filled,
        |  v IS NULL AS was_gap
        |FROM x ORDER BY user_id, event_id""".stripMargin,
    "w4_rank_functions" ->
      """SELECT event_type, event_id,
        |  rank() OVER w AS rk, ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank, cume_dist() OVER w AS cume
        |FROM events WHERE user_id < 3
        |WINDOW w AS (PARTITION BY event_type ORDER BY event_id)
        |ORDER BY event_type, event_id""".stripMargin,
    "j13_scd2_lookup" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type
        |  FROM events WHERE user_id < 8),
        |chg AS (
        |  SELECT user_id, event_id, ts_ms, event_type FROM (
        |    SELECT user_id, event_id, ts_ms, event_type,
        |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
        |        AS prev_type
        |    FROM e)
        |  WHERE prev_type IS NULL OR prev_type != event_type),
        |iv AS (
        |  SELECT user_id, event_type AS state, ts_ms AS valid_from,
        |    COALESCE(lead(ts_ms) OVER w, 253402300800000) AS valid_to
        |  FROM chg
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id))
        |SELECT e.user_id, iv.state, count(*) AS n_events
        |FROM e JOIN iv ON e.user_id = iv.user_id
        |  AND e.ts_ms >= iv.valid_from AND e.ts_ms < iv.valid_to
        |GROUP BY 1, 2 ORDER BY e.user_id, iv.state""".stripMargin,
    "a29_agg_surface" ->
      """SELECT event_type,
        |  max_by(event_id, value * 1000000000 + event_id) AS top_event_id,
        |  max(value) AS max_value,
        |  CAST(count_if(value > 100.0) AS BIGINT) AS n_over_100,
        |  bool_or(value > 190.0) AS any_over_190
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "u6_bag_setops" ->
      """WITH c AS (SELECT user_id, CAST(floor(value) AS INT) // 10 AS decile
        |  FROM events WHERE event_type = 'click'),
        |v AS (SELECT user_id, CAST(floor(value) AS INT) // 10 AS decile
        |  FROM events WHERE event_type = 'view'),
        |common AS (
        |  SELECT user_id, count(*) AS n_common FROM (
        |    SELECT * FROM c INTERSECT ALL SELECT * FROM v)
        |  GROUP BY user_id),
        |only_c AS (
        |  SELECT user_id, count(*) AS n_only FROM (
        |    SELECT * FROM c EXCEPT ALL SELECT * FROM v)
        |  GROUP BY user_id)
        |SELECT COALESCE(common.user_id, only_c.user_id) AS user_id,
        |  COALESCE(n_common, 0) AS n_common,
        |  COALESCE(n_only, 0) AS n_only
        |FROM common FULL OUTER JOIN only_c
        |  ON common.user_id = only_c.user_id
        |ORDER BY user_id""".stripMargin,
    "j12_null_aware_anti" ->
      """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
        |FROM (
        |  SELECT event_type,
        |    CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 = 0
        |         THEN NULL
        |         ELSE CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
        |  FROM events WHERE props IS NOT NULL)
        |WHERE k NOT IN (5, 11, 23, 42)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "w3_locf" ->
      """SELECT user_id, event_id,
        |  COALESCE(last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0)
        |    AS v_filled,
        |  v IS NULL AS was_gap
        |FROM (
        |  SELECT user_id, event_id,
        |    CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 = 0
        |         THEN NULL ELSE value END AS v
        |  FROM events WHERE user_id < 8)
        |ORDER BY user_id, event_id""".stripMargin,
    "a28_gap_fill" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS d,
        |    count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM events WHERE value > 190.0 GROUP BY 1, 2),
        |span AS (
        |  SELECT event_type, min(epoch_ms(ts) // 86400000) AS d0,
        |    max(epoch_ms(ts) // 86400000) AS d1
        |  FROM events GROUP BY 1),
        |spine AS (
        |  SELECT event_type, unnest(generate_series(d0, d1)) AS d FROM span)
        |SELECT s.event_type, s.d,
        |  COALESCE(n, 0) AS n, COALESCE(total, 0.0) AS total
        |FROM spine s LEFT JOIN daily dl
        |  ON s.event_type = dl.event_type AND s.d = dl.d
        |ORDER BY s.event_type, s.d""".stripMargin,
    "u5_recursive_cte" ->
      """WITH RECURSIVE reach(id, dist) AS (
        |  SELECT CAST(0 AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist
        |  UNION ALL
        |  SELECT e.dst, r.dist + 1 FROM reach r
        |  JOIN (
        |    SELECT d.doc_id AS src, d.doc_id + 1 AS dst
        |    FROM documents d JOIN documents d2 ON d2.doc_id = d.doc_id + 1
        |    WHERE d.doc_id % 50 != 49
        |    UNION ALL
        |    SELECT d.doc_id, d.doc_id + 10
        |    FROM documents d JOIN documents d2 ON d2.doc_id = d.doc_id + 10
        |    WHERE d.doc_id % 50 <= 39
        |  ) e ON e.src = r.id
        |  WHERE r.dist < 13)
        |SELECT id, min(dist) AS dist FROM reach
        |GROUP BY id ORDER BY id""".stripMargin,
    "e14_sql_script" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events
        |WHERE value > (SELECT max(value) * 0.5 FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "j11_merge_upsert" ->
      """WITH base AS (SELECT o_orderkey AS k, o_totalprice AS v FROM orders),
        |chg AS (
        |  SELECT k, v * 0.5 AS nv, 'update' AS action FROM base WHERE k % 7 = 0
        |  UNION ALL
        |  SELECT k, 0.0 AS nv, 'delete' AS action FROM base
        |  WHERE k % 11 = 0 AND k % 7 != 0
        |  UNION ALL
        |  SELECT k + 10000000 AS k, 1.0 AS nv, 'insert' AS action FROM base
        |  WHERE k % 13 = 0)
        |SELECT COALESCE(b.k, c.k) AS k,
        |  CASE WHEN c.action IN ('update', 'insert') THEN c.nv ELSE b.v END AS v,
        |  COALESCE(c.action, 'keep') AS action
        |FROM base b FULL OUTER JOIN chg c ON b.k = c.k
        |WHERE COALESCE(c.action, '') != 'delete'
        |ORDER BY k""".stripMargin,
    "w2_sliding_range" ->
      """SELECT event_id, event_type, epoch_ms(ts) AS ts_ms,
        |  count(*) OVER (PARTITION BY event_type ORDER BY epoch_ms(ts)
        |    RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS n_last_hour
        |FROM events ORDER BY event_id""".stripMargin,
    "e13_variant" ->
      """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM (
        |  SELECT event_type,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events WHERE props IS NOT NULL)
        |WHERE k IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
