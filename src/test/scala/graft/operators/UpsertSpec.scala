package graft.operators

import graft.SparkSpec
import graft.spec.SinkConf
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Gates for the keyed parquet upsert (CDC apply): batch merge semantics,
  * latest-wins in-delta collapse, copy-on-write partition pruning (the
  * untouched partition's files must not be rewritten), replay idempotence,
  * and the streaming `upsert_parquet` spec sink end-to-end.
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("t").toString

  private def readTable(path: String): Set[(Long, String, Long)] =
    Upsert.readTable(spark, path).select("k", "v", "ord")
      .as[(Long, String, Long)].collect().toSet

  test("mergeParquet: insert, update, preserve; latest-wins inside the delta") {
    val path = tmpDir("upsert-basic")
    Upsert.mergeParquet(spark,
      Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)).toDF("k", "v", "ord"),
      path, Seq("k"), Seq("ord"))
    // delta: update k=1 (two versions, ord=3 must win), insert k=4
    Upsert.mergeParquet(spark,
      Seq((1L, "a2", 2L), (1L, "a3", 3L), (4L, "d", 2L)).toDF("k", "v", "ord"),
      path, Seq("k"), Seq("ord"))
    assert(readTable(path) == Set(
      (1L, "a3", 3L), (2L, "b", 1L), (3L, "c", 1L), (4L, "d", 2L)))
  }

  test("mergeParquet replay is idempotent (checkpoint-recovery contract)") {
    val path = tmpDir("upsert-replay")
    Upsert.mergeParquet(spark, Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ord"),
      path, Seq("k"), Seq("ord"))
    val delta = Seq((2L, "b2", 5L), (3L, "c", 5L))
    Upsert.mergeParquet(spark, delta.toDF("k", "v", "ord"), path, Seq("k"), Seq("ord"))
    val once = readTable(path)
    Upsert.mergeParquet(spark, delta.toDF("k", "v", "ord"), path, Seq("k"), Seq("ord"))
    assert(readTable(path) == once)
    assert(once == Set((1L, "a", 1L), (2L, "b2", 5L), (3L, "c", 5L)))
  }

  test("partitioned merge rewrites ONLY the touched partitions") {
    val path = tmpDir("upsert-part")
    // key = (p, k); partition column p is part of the key
    Upsert.mergeParquet(spark,
      Seq((1L, 1L, "a", 1L), (1L, 2L, "b", 1L), (2L, 3L, "c", 1L))
        .toDF("p", "k", "v", "ord"),
      path, Seq("p", "k"), Seq("ord"), partitionBy = Seq("p"))
    def filesOf(part: String) = {
      val d = new java.io.File(s"$path/$part")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified).toSet
    }
    val p1Before = filesOf("p=1")
    // delta touches only p=2: update k=3, insert k=4
    Upsert.mergeParquet(spark,
      Seq((2L, 3L, "c2", 2L), (2L, 4L, "d", 2L)).toDF("p", "k", "v", "ord"),
      path, Seq("p", "k"), Seq("ord"), partitionBy = Seq("p"))
    assert(filesOf("p=1") == p1Before, "untouched partition was rewritten")
    val out = Upsert.readTable(spark, path).select("p", "k", "v")
      .as[(Long, Long, String)].collect().toSet
    assert(out == Set((1L, 1L, "a"), (1L, 2L, "b"), (2L, 3L, "c2"), (2L, 4L, "d")))
  }

  test("partition columns outside the key are rejected (stranded-copy hazard)") {
    val path = tmpDir("upsert-badpart")
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeParquet(spark, Seq((1L, 1L, "a", 1L)).toDF("p", "k", "v", "ord"),
        path, Seq("k"), Seq("ord"), partitionBy = Seq("p"))
    }
    assert(e.getMessage.contains("subset of the keys"))
  }

  test("streaming upsert_parquet sink merges every micro-batch (spec e2e)") {
    val path = tmpDir("upsert-stream")
    val ckpt = tmpDir("upsert-ckpt")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val df = in.toDF().toDF("k", "v", "ord")
    val sink = SinkConf("upsert_parquet", path = Some(path),
      config = Map("key" -> "k", "order" -> "ord"))
    val q = graft.spec.Compiler.streamSink(df, sink)
      .option("checkpointLocation", ckpt).start()
    try {
      in.addData((1L, "a", 1L), (2L, "b", 1L))
      q.processAllAvailable()
      assert(readTable(path) == Set((1L, "a", 1L), (2L, "b", 1L)))
      in.addData((2L, "b2", 2L), (3L, "c", 2L))
      q.processAllAvailable()
      assert(readTable(path) == Set((1L, "a", 1L), (2L, "b2", 2L), (3L, "c", 2L)))
    } finally q.stop()
  }

  test("manifest commit: a merge killed before the commit neither loses nor hides the table") {
    val path = tmpDir("upsert-crash")
    Upsert.mergeParquet(spark, Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ord"),
      path, Seq("k"), Seq("ord"))
    val before = readTable(path)
    // simulate a merge that died mid-way: the next version directory is
    // fully written (even with newer data) but the process died BEFORE the
    // manifest commit — readers must still see the old table, unchanged
    Seq((1L, "CRASHED", 9L)).toDF("k", "v", "ord")
      .write.parquet(s"$path/v_00000099")
    assert(readTable(path) == before, "uncommitted version became visible")
    // the same layout must also survive a crash AFTER the version write
    // with a torn temp manifest lying around
    java.nio.file.Files.writeString(java.nio.file.Path.of(s"$path/__manifest.tmp"), "v_000000")
    assert(readTable(path) == before)
    // a later merge recovers: burns past the orphan version number,
    // commits atomically, and GCs the orphan
    Upsert.mergeParquet(spark, Seq((3L, "c", 2L)).toDF("k", "v", "ord"),
      path, Seq("k"), Seq("ord"))
    assert(readTable(path) == before + ((3L, "c", 2L)))
    assert(!new java.io.File(s"$path/v_00000099").exists, "orphan version not GC'd")
    // the recovery merge must have committed ABOVE the orphan number
    val manifest = java.nio.file.Files.readString(java.nio.file.Path.of(s"$path/__manifest")).trim
    assert(manifest == "v_00000100", s"unexpected committed version: $manifest")
  }

  test("torn manifest self-heals to the highest complete version") {
    val path = tmpDir("upsert-torn")
    Upsert.mergeParquet(spark, Seq((1L, "a", 1L)).toDF("k", "v", "ord"),
      path, Seq("k"), Seq("ord"))
    Upsert.mergeParquet(spark, Seq((2L, "b", 2L)).toDF("k", "v", "ord"),
      path, Seq("k"), Seq("ord"))
    val before = readTable(path)
    // power loss surfaced an EMPTY manifest (ext4 delayed-allocation
    // shape) — the table must stay readable via the _SUCCESS fallback
    java.nio.file.Files.writeString(java.nio.file.Path.of(s"$path/__manifest"), "")
    assert(readTable(path) == before, "torn manifest made the table unreadable")
    // garbage contents must behave the same as empty
    java.nio.file.Files.writeString(java.nio.file.Path.of(s"$path/__manifest"), "vXYZ")
    assert(readTable(path) == before)
    // and the next merge recovers fully: resolves the same fallback
    // version, merges onto it, and commits a fresh manifest
    Upsert.mergeParquet(spark, Seq((3L, "c", 3L)).toDF("k", "v", "ord"),
      path, Seq("k"), Seq("ord"))
    assert(readTable(path) == before + ((3L, "c", 3L)))
    val mf = java.nio.file.Files.readString(java.nio.file.Path.of(s"$path/__manifest")).trim
    assert(mf.matches("v_\\d{8}"), s"manifest not rewritten: '$mf'")
  }

  test("GC retains exactly one committed predecessor (reader grace window)") {
    val path = tmpDir("upsert-retain")
    def versions = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.startsWith("v_")).toSet
    Upsert.mergeParquet(spark, Seq((1L, "a", 1L)).toDF("k", "v", "ord"),
      path, Seq("k"), Seq("ord"))
    Upsert.mergeParquet(spark, Seq((2L, "b", 2L)).toDF("k", "v", "ord"),
      path, Seq("k"), Seq("ord"))
    // current + its predecessor survive: a reader that resolved the old
    // manifest just before the commit can finish its scan
    assert(versions == Set("v_00000001", "v_00000002"), s"got $versions")
    Upsert.mergeParquet(spark, Seq((3L, "c", 3L)).toDF("k", "v", "ord"),
      path, Seq("k"), Seq("ord"))
    // the grace window slides: v1 is now two commits old and gets dropped
    assert(versions == Set("v_00000002", "v_00000003"), s"got $versions")
  }

  test("createParquet over a legacy plain directory removes the loose root files") {
    val path = tmpDir("upsert-create-legacy")
    Seq((1L, "old", 1L)).toDF("k", "v", "ord").write.parquet(path)
    Upsert.createParquet(spark, Seq((2L, "new", 2L)).toDF("k", "v", "ord"), path)
    assert(readTable(path) == Set((2L, "new", 2L)))
    // ignore dotfiles: LocalFileSystem checksum sidecars (.…crc) are FS
    // bookkeeping hidden from fs.listStatus, not table data
    val loose = new java.io.File(path).listFiles().filter(_.isFile)
      .map(_.getName).filterNot(n => n == "__manifest" || n.startsWith("."))
    assert(loose.isEmpty, s"legacy root files left behind: ${loose.mkString(",")}")
    // a plain reader pointed at the current version dir sees one layout
    assert(new java.io.File(path).listFiles().count(_.isDirectory) >= 1)
  }

  test("legacy plain-directory table upgrades to the manifest layout on its next merge") {
    val path = tmpDir("upsert-legacy")
    // a table written by the old layout: loose parquet files at the root
    Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ord").write.parquet(path)
    Upsert.mergeParquet(spark, Seq((2L, "b2", 2L)).toDF("k", "v", "ord"),
      path, Seq("k"), Seq("ord"))
    assert(new java.io.File(s"$path/__manifest").exists, "merge did not upgrade the layout")
    assert(readTable(path) == Set((1L, "a", 1L), (2L, "b2", 2L)))
  }
}
