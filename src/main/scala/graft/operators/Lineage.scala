package graft.operators

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}

/** Lineage truncation for iterative dataflow loops (PageRank, BFS,
  * connected components): without a per-round cut the logical plan grows
  * linearly with rounds and analysis/optimization time goes quadratic.
  *
  * Two postures, selected by `spark.graft.checkpointDir`:
  *
  *  - UNSET (default): `localCheckpoint` — blocks pinned to executors,
  *    zero external storage, the right trade single-JVM/local[32] and for
  *    short loops. NOT fault-tolerant: on a real cluster an executor loss
  *    mid-iteration loses blocks that nothing can recompute (the lineage
  *    was truncated), killing the job.
  *  - SET to a (durable, e.g. object-store) path: reliable `checkpoint()`
  *    — each round's frame is materialized to the checkpoint dir, so an
  *    executor loss recomputes from storage and the iteration survives.
  *    The per-round write is the price of fleet-safety at 1000 executors;
  *    loops are O(log n) rounds, so the total is a small multiple of the
  *    data size.
  *
  * The cut is a plan-shape property, not a semantics change: results are
  * identical either way (pinned by GraphsSpec's checkpoint-dir test).
  *
  * CLEANUP: reliable checkpoints write `rdd-N` directories that Spark
  * never deletes by default (`spark.cleaner.referenceTracking
  * .cleanCheckpoints` is false, and even when true the cleanup waits on
  * driver GC — and the flag is read once at SparkContext construction,
  * so a library cannot turn it on after the fact). An O(log n)-round
  * loop over a 100 TB frame would otherwise leave O(log n) copies of
  * the data in durable storage PER RUN. Iterative operators therefore
  * run their loops inside a [[Lineage.Scope]], which deletes each
  * round's checkpoint as soon as the round that supersedes it is
  * materialized, and defers the final (result-backing) checkpoint to
  * application end — bounding durable checkpoint storage at O(1) frames
  * per live loop instead of O(rounds) per run, forever.
  */
object Lineage {

  /** Config key: when set (non-empty), iterative operators truncate
    * lineage with reliable `checkpoint()` into this directory instead of
    * executor-pinned `localCheckpoint()`. */
  val CheckpointDirKey = "spark.graft.checkpointDir"

  /** Truncate `df`'s lineage; `eager` forces materialization now (loops
    * that immediately aggregate the frame can defer with eager=false). */
  def cut(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(CheckpointDirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        // getCheckpointDir returns the UUID subdir setCheckpointDir
        // created, so compare by emptiness: set once, and respect a dir
        // the application already configured itself
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint(eager = eager)
      case None =>
        df.localCheckpoint(eager = eager)
    }
  }

  /** [[cut]] for a NON-loop shared frame — a small subtree feeding
    * several consumers inside ONE query (Catalyst re-expands shared
    * DataFrame subtrees per consumer; materializing breaks that).
    * localCheckpoint mode is a pass-through to [[cut]] (executor-pinned
    * blocks, reclaimed by the ContextCleaner). In reliable-checkpoint
    * mode the rdd-N directory is registered for application-end
    * deletion AND with [[release]]/[[releaseAll]] — the same cleanup
    * contract as a loop result handed off by a [[Scope]] — so a
    * long-lived process (the HTTP API posture) reclaims it at request
    * boundaries instead of leaking one directory per query, forever.
    * Eagerness is forced in reliable mode: a deferred reliable
    * checkpoint has no file path to register (and would re-run the
    * whole subtree at materialization anyway). */
  def cutShared(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val reliable = spark.conf.getOption(CheckpointDirKey).exists(_.nonEmpty)
    val out = cut(df, eager = eager || reliable)
    if (reliable)
      GraftColumnBridge.checkpointFile(out).foreach { p =>
        deleteOnAppEnd(spark, p)
        resultFiles.put(out, p)
      }
    out
  }

  /** Checkpoint bookkeeping for one iterative loop. [[Scope.cut]] like
    * [[Lineage.cut]] but recording each reliable checkpoint's storage
    * path; the loop calls [[Scope.free]] on a frame the moment the
    * round superseding it is materialized (its files are deleted there
    * and then), [[Scope.handOff]] on the frame it returns (deletion
    * deferred to application end, when the result can no longer be
    * recomputed anyway), and [[Scope.close]] deletes whatever is left
    * (loop-pinned frames like an edge list). In localCheckpoint mode
    * every call is a pass-through — executor blocks are reclaimed by
    * the ContextCleaner when the RDD is GC'd, no files exist. */
  final class Scope private[Lineage] (spark: SparkSession)
      extends AutoCloseable {
    private val reliable =
      spark.conf.getOption(CheckpointDirKey).exists(_.nonEmpty)
    // keyed by reference identity: free/handOff receive the exact frame
    // cut() returned, and two cuts are never the same object
    private val files =
      new java.util.IdentityHashMap[DataFrame, String]()

    /** Cut `df`'s lineage. In reliable mode the checkpoint is forced
      * eager even when the caller defers: safe deletion of the frame
      * this one supersedes requires THIS frame's files to exist first
      * (and a deferred reliable checkpoint would re-run the whole round
      * computation at materialization time anyway). */
    def cut(df: DataFrame, eager: Boolean = true): DataFrame = {
      val out = Lineage.cut(df, eager = eager || reliable)
      if (reliable)
        GraftColumnBridge.checkpointFile(out)
          .foreach(p => files.put(out, p))
      out
    }

    /** Delete `df`'s checkpoint files now — callable only once the
      * round superseding `df` is materialized. No-op for frames this
      * scope did not cut (seeds, locally-checkpointed frames). */
    def free(df: DataFrame): Unit = {
      val p = files.remove(df)
      if (p != null) delete(spark, p)
    }

    /** Mark `df` as the loop's RESULT: its checkpoint outlives the
      * scope and is deleted at application end instead. Returns `df`.
      *
      * Long-lived-process caveat: in a process that never ends its
      * application (the HTTP API posture), app-end deferral means one
      * durable checkpoint accumulates PER CALL of an iterative
      * operator — O(requests) storage, not the per-loop O(1) frames
      * this scope guarantees while a loop runs. Such callers must call
      * [[Lineage.release]] on the result once it is consumed (written,
      * collected, streamed out) — it deletes the files immediately and
      * drops the app-end registration. */
    def handOff(df: DataFrame): DataFrame = {
      val p = files.remove(df)
      if (p != null) {
        deleteOnAppEnd(spark, p)
        resultFiles.put(df, p)
      }
      df
    }

    /** Delete every checkpoint still owned by the scope (loop-pinned
      * frames; all rounds when the loop threw). */
    override def close(): Unit = {
      files.values.forEach(p => delete(spark, p))
      files.clear()
    }
  }

  /** Open a checkpoint-cleanup scope for one iterative loop. */
  def scope(spark: SparkSession): Scope = new Scope(spark)

  private def delete(spark: SparkSession, path: String): Unit =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    } catch { case _: Exception => () } // cleanup is best-effort

  // result-backing checkpoints, deleted when their application ends
  private val appEnd =
    new java.util.concurrent.ConcurrentHashMap[
      SparkContext, java.util.Set[String]]()

  private def deleteOnAppEnd(spark: SparkSession, path: String): Unit = {
    val sc = spark.sparkContext
    appEnd.computeIfAbsent(sc, c => {
      val s = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      c.addSparkListener(new SparkListener {
        override def onApplicationEnd(
            e: SparkListenerApplicationEnd): Unit = {
          s.forEach(p => delete(spark, p))
          s.clear()
          appEnd.remove(c)
        }
      })
      s
    }).add(path)
  }

  /** How many result-backing checkpoints are pending application-end
    * deletion (test/inspection seam). */
  private[graft] def pendingAppEnd(spark: SparkSession): Int = {
    val s = appEnd.get(spark.sparkContext)
    if (s == null) 0 else s.size()
  }

  // handed-off results' checkpoint paths, keyed by the exact frame
  // handOff returned, so long-lived callers can free a consumed result.
  // Weak keys: an unreferenced result frame must not pin itself (its
  // files still go at app end via the appEnd set).
  private val resultFiles =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[DataFrame, String]())

  /** Free a handed-off loop result's checkpoint NOW — for long-lived
    * processes (e.g. a query API) where app-end deferral would
    * accumulate one durable checkpoint per request. `df` must be the
    * exact frame [[Scope.handOff]] returned, already consumed by the
    * caller (re-running it afterwards would recompute the whole loop).
    * No-op for frames that were never handed off or already freed. */
  def release(spark: SparkSession, df: DataFrame): Unit = {
    val p = resultFiles.remove(df)
    if (p != null) {
      val s = appEnd.get(spark.sparkContext)
      if (s != null) s.remove(p)
      delete(spark, p)
    }
  }

  /** Free EVERY pending result checkpoint — the request-boundary hook
    * for long-lived processes: once a request's iterative results are
    * fully consumed (and no other request's loop result is still live),
    * this reclaims all app-end-deferred storage at once. Operators that
    * derive their returned frame AFTER handOff make the exact-frame
    * [[release]] unreachable from outside; this is the usable
    * alternative. */
  def releaseAll(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    val s = appEnd.get(sc)
    if (s != null) {
      // remove each path as it is deleted (not forEach + clear): a path
      // handed off CONCURRENTLY with this drain either wins the removeIf
      // race (we delete it) or stays in the set for app-end cleanup —
      // forEach+clear could drop it from the set without deleting it,
      // leaking the checkpoint permanently.
      s.removeIf { p => delete(spark, p); true }
    }
    // only this context's hand-offs: resultFiles spans every live
    // session, and clearing a foreign session's entries would disable
    // its exact-frame release() while leaving its files on disk.
    resultFiles.synchronized {
      val it = resultFiles.entrySet().iterator()
      while (it.hasNext) {
        // a weak key can clear between hasNext and getKey — a null key's
        // entry is already being reaped, leave it to the map
        val k = it.next().getKey
        if (k != null && (k.sparkSession.sparkContext eq sc)) it.remove()
      }
    }
  }
}
