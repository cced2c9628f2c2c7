package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import graft.ref.Checkpoints

/** Checkpoint/resume contract (SURVEY §3.4): a completed stage is read
  * back without recomputing; an incomplete or invalidated stage is
  * recomputed. Stands in for the reference's pickle-relay resumability.
  */
class CheckpointsSpec extends SparkSpec {

  test("stage computes once, then resumes from parquet without recomputation") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ckpt").toString
    val computed = new AtomicInteger(0)
    def build = {
      computed.incrementAndGet()
      Seq((1, "a"), (2, "b")).toDF("id", "v")
    }
    val first = Checkpoints.stage(spark, dir, "s1")(build)
    first.count() shouldBe 2
    computed.get() shouldBe 1
    // resume: same stage name → read back, compute never invoked
    val resumed = Checkpoints.stage(spark, dir, "s1")(build)
    resumed.orderBy("id").collect().map(_.getInt(0)).toSeq shouldBe Seq(1, 2)
    computed.get() shouldBe 1
  }

  test("invalidate forces recomputation; partial writes don't count as complete") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ckpt2").toString
    val computed = new AtomicInteger(0)
    def build = { computed.incrementAndGet(); Seq(1, 2, 3).toDF("x") }
    Checkpoints.stage(spark, dir, "s")(build).count() shouldBe 3
    Checkpoints.invalidate(spark, dir, "s")
    Checkpoints.isComplete(spark, dir, "s") shouldBe false
    Checkpoints.stage(spark, dir, "s")(build).count() shouldBe 3
    computed.get() shouldBe 2
    // a directory without _SUCCESS (crashed attempt) is not complete
    val partial = new java.io.File(s"$dir/crashed"); partial.mkdirs()
    new java.io.File(partial, "part-00000.parquet").createNewFile()
    Checkpoints.isComplete(spark, dir, "crashed") shouldBe false
  }
}
