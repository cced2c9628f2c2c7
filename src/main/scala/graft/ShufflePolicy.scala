package graft

/** Shuffle-partition sizing policy for the bench/scale harnesses
  * (VERDICT r10 #4): a cluster scales shuffle partitions with DATA —
  * holding them at the thread count while the corpus grows 10× turns a
  * linear operator into an apparently superlinear one (q196's 1.25
  * "exponent" at sf1 was exactly this harness artifact; at
  * partitions ∝ data it measures 0.94). The harness default must be
  * the posture a real deployment runs, not an env-var experiment.
  *
  * Policy: `max(cpus, ceil(sf × 128))` — 128 partitions at sf1 keeps
  * the heavy dedup/text shuffles (~10⁶ rows × wide text at sf1) in
  * executor-memory-sized chunks, and the `max` keeps every core busy
  * at small scales where 128 would be pure scheduling overhead. The
  * scale factor is parsed from the fixture directory name (`sf0.1`,
  * `sf1`, `target/sf1`); an unparseable name falls back to the thread
  * count, which is the pre-r11 behavior. `SPARK_GRAFT_SHUFFLE`
  * overrides for one-off experiments.
  */
object ShufflePolicy {

  /** Shuffle partitions at sf = 1. */
  val PerSf = 128

  /** Scale factor encoded in a fixture dir name, if any. */
  def sfOf(dir: String): Option[Double] = {
    val m = java.util.regex.Pattern.compile("sf([0-9]+(?:\\.[0-9]+)?)")
      .matcher(new java.io.File(dir).getName)
    if (m.find()) Some(m.group(1).toDouble) else None
  }

  /** Default shuffle partitions for a fixture dir on a `cpus`-thread
    * local session: partitions ∝ data, floored at the thread count. */
  def partitionsFor(dir: String, cpus: Int): Int =
    sfOf(dir).map(sf => math.max(cpus, math.ceil(sf * PerSf).toInt))
      .getOrElse(cpus)
}
