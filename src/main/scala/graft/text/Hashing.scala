package graft.text

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.unsafe.types.UTF8String

/** The engine-wide content hash for dedup/fingerprint operators: the
  * first 60 bits (15 hex chars) of MD5, as a non-negative BIGINT.
  *
  * Why md5-60 and not xxhash64: correctness-oracle portability. Spark
  * and DuckDB share exactly one fast hash family — MD5 — so basing
  * MinHash / SimHash / winnowing on it makes the entire dedup pipeline
  * exactly reproducible in the driver's DuckDB oracle
  * (`CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)` on that side).
  * 60 bits (not 64) so the value is non-negative in a SIGNED BIGINT in
  * both engines; collision odds at 2^60 are irrelevant for minhash and
  * winnowing (they only need uniformity).
  *
  * Two entry points, bit-identical by construction and pinned to each
  * other by HashingSpec:
  *   - column side ([[h60]]/[[h56]]) — codegen'd builtins (md5 → conv),
  *     stays inside whole-stage codegen;
  *   - JVM side ([[hash60]]) — for native expressions
  *     ([[graft.dedup.SimHash64]], [[WinnowFingerprint]]) that hash
  *     per-token/per-gram inside a one-pass eval.
  */
object Hashing {

  /** First 15 hex chars of md5(utf8 bytes) as a BIGINT in [0, 2^60),
    * as the native [[Md5Hash60]] expression — digest straight to long
    * inside whole-stage codegen. The builtin formulation
    * (`conv(substring(md5(c),1,15),16,10)`) computes the same value but
    * renders 32 hex chars and parses 15 back per hash; [[HashingSpec]]
    * pins the two (and thus the DuckDB rendering) to each other. */
  def h60(c: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      Md5Hash60(org.apache.spark.sql.GraftSqlShim.expression(c.cast("string"))))

  /** Builtin-only twin of [[h60]] — used by HashingSpec to pin the
    * native expression to the md5→conv semantics DuckDB mirrors. */
  def h60Builtin(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast(LongType)

  /** Seeded variant: an independent hash per seed (md5 of "seed:x").
    * Used for the k minhash permutations — seeds must be INDEPENDENT
    * functions, not a linear double-hash family, or the permutations
    * correlate and the position-agreement estimate biases up
    * (measured: 2.3× candidate-pair inflation). The seed prefix is
    * digested directly — no per-row concat allocation. */
  def h60Seeded(seed: Int, c: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      Md5Hash60(org.apache.spark.sql.GraftSqlShim.expression(c.cast("string")), s"$seed:"))

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def finish(d: MessageDigest): Long = {
    val out = d.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (out(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  /** JVM twin of [[h60]]: top 60 bits of the digest's first 8 bytes
    * (big-endian), i.e. the value of the first 15 hex chars. */
  def hash60(bytes: Array[Byte], off: Int, len: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(bytes, off, len)
    finish(d)
  }

  def hash60(s: UTF8String): Long = {
    val b = s.getBytes
    hash60(b, 0, b.length)
  }

  /** Seeded: digest = md5(prefixBytes ++ utf8 bytes) — equal to
    * hash60(prefix + s) without materializing the concatenation. */
  def hash60Seeded(prefix: Array[Byte], s: UTF8String): Long =
    hash60Seeded(prefix, s.getBytes)

  def hash60Seeded(prefix: Array[Byte], b: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    d.update(prefix)
    d.update(b, 0, b.length)
    finish(d)
  }

  /** DuckDB rendering of [[h60]], for building oracle SQL strings. */
  def duckH60(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr), 1, 15)) AS BIGINT)"

  // ------------------------------------------------- 28-bit hash lanes

  /** Lane decomposition for hash FAMILIES (minhash permutations): one
    * md5 digest yields FOUR independent 28-bit lanes — hex chars
    * 1-7, 8-14, 15-21, 22-28 — so k minhash permutations cost k/4
    * digests instead of k. Distinct bit ranges of a strong hash are
    * independent functions (unlike the h1+i·h2 double-hash family,
    * which correlates permutations — see [[h60Seeded]]); 28 bits is
    * ample for min-hash ranking, which needs uniformity, not
    * collision-free width (P[two of ~100 tokens tie in a lane]
    * ≈ 100²/2²⁹ ≈ 2e-5, and a tie only nudges one estimate position).
    * Digesting md5("seed:tok") keeps the whole family reproducible in
    * the DuckDB oracle: `substr(md5(...), j*7+1, 7)`. */

  /** Column side: lane `j` (0-3) of an md5 HEX column, as BIGINT. */
  def h28Lane(md5Hex: Column, j: Int): Column =
    conv(substring(md5Hex, j * 7 + 1, 7), 16, 10).cast(LongType)

  /** JVM side: all 4 lanes of md5(prefix ++ b) into out[off..off+3]. */
  def hash28Lanes(prefix: Array[Byte], b: Array[Byte], out: Array[Long], off: Int): Unit = {
    val d = md.get()
    d.reset()
    d.update(prefix)
    d.update(b, 0, b.length)
    val dig = d.digest()
    var j = 0
    while (j < 4) {
      var v = 0L
      var nib = j * 7
      val end = nib + 7
      while (nib < end) {
        val by = dig(nib >> 1)
        val n = if ((nib & 1) == 0) (by >> 4) & 0xF else by & 0xF
        v = (v << 4) | n
        nib += 1
      }
      out(off + j) = v
      j += 1
    }
  }
}
