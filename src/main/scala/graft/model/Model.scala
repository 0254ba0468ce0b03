package graft.model

/**
 * Canonical data model of the engine (SURVEY.md §1.5).
 *
 * The reference (bwoodbury3/open-tlm) models a named time series as a
 * sequence of (ISO date string, float value) points
 * (reference: src/model/data.py:8-25) and stores aggregates as the
 * mergeable monoid (min, max, sum, count) with mean derived at read time
 * (reference: src/index.py:69-75, 588).
 *
 * Here every series lives in one long-format table keyed by `datasetId`;
 * Catalyst partition pruning + parquet min/max stats replace the
 * reference's path arithmetic (reference: src/index.py:408-505).
 */

/** One raw telemetry point.
 *
 *  `tsUs` is epoch microseconds — the engine's native precision. A
 *  TIMESTAMP(µs) column is carried alongside in stored tables for
 *  window/pruning ergonomics; `tsUs` remains the exact key.
 */
final case class Datapoint(datasetId: String, tsUs: Long, value: Double)

/** One aggregated bucket: the (min, max, sum, count) monoid of the
 *  reference's `_AggregatedDatapoint` (src/index.py:69-75). `bucketS` is
 *  the epoch-aligned window START in whole epoch seconds
 *  (src/index.py:299: `int(int(ts/d)*d)`). `mean = sum/count` is always
 *  derived, never stored (src/index.py:588).
 */
final case class AggPoint(
    datasetId: String,
    bucketS: Long,
    min: Double,
    max: Double,
    sum: Double,
    count: Long) {
  require(count > 0, "zero-count AggPoints are illegal (the reference never stores empty buckets)")
  def mean: Double = sum / count
}

/** Annotation record (reference: src/model/comment.py:8-13). `id` is a
 *  nanosecond epoch assigned at the API layer (src/marks.py:82) — never
 *  inside a distributed job.
 */
final case class Comment(id: Long, dateUs: Long, text: String, tags: Seq[String])

/**
 * Resolution pyramid (reference: src/model/fidelity.py:8-15).
 * `Full` is raw; the six aggregate levels tumble at 10^0..10^5 seconds.
 */
sealed abstract class Fidelity(val seconds: Long, val name: String) {
  def isFull: Boolean = seconds == 0L

  /** Span (seconds) for which this level yields ~DATAPOINT_GROUP_SIZE
   *  (=5000) points; full fidelity tuned for 10 Hz (src/index.py:45-57).
   */
  def maxSpanSeconds: Double =
    if (isFull) Fidelity.GroupSize / 10.0 else Fidelity.GroupSize.toDouble * seconds
}

object Fidelity {
  val GroupSize = 5000L // reference DATAPOINT_GROUP_SIZE, src/index.py:46

  case object Full    extends Fidelity(0L, "full")
  case object S1      extends Fidelity(1L, "1")
  case object S10     extends Fidelity(10L, "10")
  case object S100    extends Fidelity(100L, "100")
  case object S1000   extends Fidelity(1000L, "1000")
  case object S10000  extends Fidelity(10000L, "10000")
  case object S100000 extends Fidelity(100000L, "100000")

  val aggLevels: Seq[Fidelity] = Seq(S1, S10, S100, S1000, S10000, S100000)
  val all: Seq[Fidelity] = Full +: aggLevels

  def fromName(s: String): Fidelity =
    all.find(_.name == s).getOrElse(throw new IllegalArgumentException(s"no fidelity '$s'"))

  /** Finest level whose ~5000-point file span still covers the query span — keeps any
   *  result bounded at ~5000 points (reference `_recommended_fidelity`,
   *  src/index.py:252-275).
   */
  def recommended(spanSeconds: Double): Fidelity =
    all.find(f => spanSeconds < f.maxSpanSeconds).getOrElse(S100000)

  /** dataset_id validation (reference src/index.py:60, 112-115). */
  private val LegalId = "^[a-zA-Z0-9._-]+$".r
  def isLegalDatasetId(id: String): Boolean =
    LegalId.matches(id) && !id.contains("..")
}
