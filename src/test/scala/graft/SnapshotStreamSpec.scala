package graft

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** `spark.readStream.format("graft-snapshot")` — the snapshot store's
  * commit stream as a Structured Streaming source. Stream-equals-batch
  * parity over a multi-commit history, offset-exact restart via
  * version checkpoints, and the startingVersion window. */
class SnapshotStreamSpec extends SparkSessionSpec {
  import spark.implicits._

  private def freshRoot(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_stream_$name").toString +
      "/tbl"

  test("commit stream equals the batch read over a multi-commit history") {
    val root = freshRoot("parity")
    SnapshotTable.commit(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    SnapshotTable.commit(spark, root, Seq((3L, "c")).toDF("id", "v"),
      append = true)
    val q = spark.readStream.format("graft-snapshot").load(root)
      .writeStream.format("memory").queryName("snapstream")
      .start()
    try {
      q.processAllAvailable()
      // v1+v2 arrive (one or two batches — offset granularity is the
      // engine's choice); then live commits append as new batches
      def seen = spark.table("snapstream")
        .as[(Long, String)].collect().toSet
      assert(seen == Set((1L, "a"), (2L, "b"), (3L, "c")))
      SnapshotTable.commit(spark, root, Seq((4L, "d")).toDF("id", "v"),
        append = true)
      q.processAllAvailable()
      assert(seen == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
      assert(seen == SnapshotTable.readLatest(spark, root)
        .as[(Long, String)].collect().toSet,
        "stream-consumed commit history must equal the batch read")
    } finally { q.stop() }
  }

  test("startingVersion skips history; delete-only commits are empty " +
       "batches, not errors") {
    val root = freshRoot("window")
    SnapshotTable.commit(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    SnapshotTable.commit(spark, root, Seq((3L, "c")).toDF("id", "v"),
      append = true)
    val q = spark.readStream.format("graft-snapshot")
      .option("startingVersion", 2).load(root)
      .writeStream.format("memory").queryName("snapwin")
      .start()
    try {
      q.processAllAvailable()
      def seen = spark.table("snapwin").as[(Long, String)].collect().toSet
      assert(seen == Set((3L, "c")),
        "startingVersion=2 must stream version 2's appends only")
      // a MOR delete commit adds no file sets: the stream must advance
      // through it without phantom rows or failure
      SnapshotTable.deleteRows(spark, root,
        Seq(1L).toDF("id"), "id")
      q.processAllAvailable()
      assert(seen == Set((3L, "c")))
      SnapshotTable.commit(spark, root, Seq((5L, "e")).toDF("id", "v"),
        append = true)
      q.processAllAvailable()
      assert(seen == Set((3L, "c"), (5L, "e")))
    } finally { q.stop() }
  }

  test("checkpoint restart resumes from the committed version offset") {
    val root = freshRoot("ckpt")
    val base = java.nio.file.Files
      .createTempDirectory("graft_stream_ckpt").toString
    val (ckpt, out) = (s"$base/ckpt", s"$base/out")
    SnapshotTable.commit(spark, root, Seq((1L, "a")).toDF("id", "v"))
    // memory sinks refuse checkpoint recovery — the durable restart
    // path needs a recoverable sink (parquet), like production would
    def run(): Unit = {
      val q = spark.readStream.format("graft-snapshot").load(root)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == 1)
    // two more commits while the stream is DOWN
    SnapshotTable.commit(spark, root, Seq((2L, "b")).toDF("id", "v"),
      append = true)
    SnapshotTable.commit(spark, root, Seq((3L, "c")).toDF("id", "v"),
      append = true)
    run()
    val resumed = spark.read.parquet(out).as[(Long, String)].collect().toSet
    assert(resumed == Set((1L, "a"), (2L, "b"), (3L, "c")),
      s"restart must replay exactly the unseen window once, got $resumed")
  }
}
