package graft

import graft.sources.SnapshotStore
import java.nio.file.Files

class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  test("commit / read / time travel across versions") {
    val dir   = Files.createTempDirectory("graft_snap").toString + "/t"
    val store = new SnapshotStore(spark, dir)
    assert(store.read().isEmpty && store.currentVersion().isEmpty)

    assert(store.commit(Seq((1, "a")).toDF("k", "v")) == 1L)
    assert(store.commit(Seq((1, "a"), (2, "b")).toDF("k", "v")) == 2L)
    assert(store.commit(Seq((9, "z")).toDF("k", "v")) == 3L)

    assert(store.currentVersion().contains(3L))
    assert(store.read().get.count() == 1)
    assert(store.readVersion(2).count() == 2, "time travel to v2")
    assert(store.readVersion(1).as[(Int, String)].collect().toSeq == Seq((1, "a")))
    assert(store.versions() == Seq(1L, 2L, 3L))
  }

  test("expireSnapshots keeps the newest N and deletes old data") {
    val dir   = Files.createTempDirectory("graft_snap_exp").toString + "/t"
    val store = new SnapshotStore(spark, dir)
    (1 to 5).foreach(i => store.commit(Seq((i, i)).toDF("k", "v")))
    val expired = store.expireSnapshots(keepLast = 2)
    assert(expired == Seq(1L, 2L, 3L))
    assert(store.versions() == Seq(4L, 5L))
    assert(store.read().get.as[(Int, Int)].head() == ((5, 5)))
    assert(!new java.io.File(s"$dir/data/v1").exists())
  }

  test("removeOrphanFiles deletes unreferenced data files only") {
    val dir   = Files.createTempDirectory("graft_snap_orph").toString + "/t"
    val store = new SnapshotStore(spark, dir)
    store.commit(Seq((1, "a")).toDF("k", "v"))
    // plant an orphan inside the live snapshot dir and a stray dir
    val orphan = new java.io.File(s"$dir/data/v1/orphan-file.parquet")
    Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    val removed = store.removeOrphanFiles()
    assert(removed.exists(_.endsWith("orphan-file.parquet")))
    assert(!orphan.exists())
    assert(store.read().get.count() == 1, "live data untouched")
  }

  test("commitIf detects concurrent advancement; retry from the fresh version succeeds") {
    import spark.implicits._
    val store = new SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_snap_occ").toString)
    // first writer: empty-table expectation holds
    val v1 = store.commitIf(Seq((1, "a")).toDF("k", "v"), expectedVersion = None)
    assert(v1 == 1L)
    // second writer based on v1 wins the race...
    val v2 = store.commitIf(Seq((2, "b")).toDF("k", "v"), expectedVersion = Some(v1))
    assert(v2 == 2L)
    // ...so a third writer still based on v1 must be refused, data unstaged
    val ex = intercept[SnapshotStore.CommitConflictException] {
      store.commitIf(Seq((3, "c")).toDF("k", "v"), expectedVersion = Some(v1))
    }
    assert(ex.getMessage.contains("expected version 1") && ex.getMessage.contains("at 2"))
    assert(store.versions() == Seq(1L, 2L), "refused commit must stage nothing")
    // re-read + retry from the fresh version succeeds
    val v3 = store.commitIf(Seq((3, "c")).toDF("k", "v"),
      expectedVersion = store.currentVersion())
    assert(v3 == 3L && store.read().get.count() == 1)
    // stale empty-table expectation also conflicts
    intercept[SnapshotStore.CommitConflictException] {
      store.commitIf(Seq((4, "d")).toDF("k", "v"), expectedVersion = None)
    }
  }
}
