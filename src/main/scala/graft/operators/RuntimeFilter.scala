package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sideways information passing for selective joins: build a Bloom
  * filter over the (filtered) build side's join keys, probe it MAP-SIDE
  * on the probe side BELOW the join's exchange, then run the exact join
  * on the survivors.
  *
  * This is the runtime-filter shape for the 100 TB fact-⋈-selective-dim
  * query: without it, every fact row shuffles to the join only for most
  * to be discarded there; with it, rows that cannot possibly join are
  * dropped inside the fact's scan stage, so the shuffle (or the
  * broadcast-join input) carries only the candidate sliver plus the fpp
  * fraction. The exact join afterwards removes false positives, so the
  * result is IDENTICAL to the plain join — the filter only routes.
  *
  * Spark's own `InjectRuntimeFilter` does this automatically for some
  * shuffle-join shapes; this operator is the explicit, persistable
  * variant: the filter bytes are an offline-buildable artifact (the
  * [[Dedup.contentBloom]] convention), so a daily pipeline can build the
  * dim fingerprint once and gate any number of fact scans with it.
  */
object RuntimeFilter {

  /** Serialized Bloom filter of `keyCol` (hashed to 64 bits) — build
    * once, reuse across fact scans. Sized for the build side's actual
    * cardinality when `expectedItems` is not given (one bounded
    * plan-time count; pass the known cardinality to skip it). */
  def keyBloom(build: DataFrame, keyCol: String,
      expectedItems: Long = -1L, fpp: Double = 0.01): Array[Byte] = {
    val n = if (expectedItems > 0) expectedItems else build.count()
    val bloom = build.select(xxhash64(col(keyCol)).as("_h"))
      .stat.bloomFilter("_h", math.max(n, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** `probe ⋈ build` on `probeKey = buildKey`, with the probe side
    * pre-filtered map-side by a Bloom over the build keys. Exact: no
    * false negatives exist, and the join discards false positives. */
  def bloomJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      expectedItems: Long = -1L, fpp: Double = 0.01,
      bloomBytes: Array[Byte] = null): DataFrame = {
    val bytes = if (bloomBytes != null) bloomBytes
      else keyBloom(build, buildKey, expectedItems, fpp)
    val gated = probe.where(graft.functions.BloomExpressions
      .mightContain(bytes, xxhash64(col(probeKey))))
    gated.join(build, col(probeKey) === col(buildKey))
  }
}
