package graft.ops

import org.apache.spark.sql.SparkSession

/** Hash-map key with REFERENCE semantics for a [[SparkSession]]
  * (ADVICE r10): `System.identityHashCode` alone is NOT unique, so two
  * live sessions could collide and one's `release`/checkpoint-prune
  * would act on the other's state. Wrapping the session and defining
  * `equals` as `eq` keeps the identity hash as the bucket hint but
  * makes equality exact.
  *
  * Holding the session strongly is fine: registries that key by this
  * must evict entries once `ref.stopped` (see [[TrackedCache.sweep]] /
  * [[Lineage]]), which releases the reference.
  */
private[ops] final class SessionRef(val session: SparkSession) {
  override def hashCode: Int = System.identityHashCode(session)
  override def equals(o: Any): Boolean = o match {
    case r: SessionRef => r.session eq session
    case _ => false
  }
  def stopped: Boolean = session.sparkContext.isStopped
}
