package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.store.CommentStore

/**
 * Comments CRUD + range/tag query semantics (src/marks.py:34-142;
 * server.py:106-175; FIXTURES.md §7).
 */
class CommentStoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def us(iso: String) = TestSpark.isoUs(iso)

  test("create / query / update / delete round-trip, date-sorted rewrite (marks.py:65-142)") {
    val path = TestSpark.tmpDir("graft_comments") + "/all_comments"
    CommentStore.create(spark, path, 2L, us("2024-01-02T00:00:00"), "second", Seq("b"))
    CommentStore.create(spark, path, 1L, us("2024-01-01T00:00:00"), "first", Seq("a", "b"))
    CommentStore.create(spark, path, 3L, us("2024-01-03T00:00:00"), "third", Seq())

    // stored date-ordered regardless of insert order (marks.py:84-91)
    val all = CommentStore.load(spark, path).collect()
    assert(all.map(_.getString(2)).toSeq == Seq("first", "second", "third"))

    // range query start <= date <= end (marks.py:54-57)
    val ranged = CommentStore.query(
      CommentStore.load(spark, path),
      us("2024-01-01T12:00:00"), us("2024-01-03T12:00:00"), Seq())
    assert(ranged.collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))

    // tag-subset filter: every requested tag must be on the comment (marks.py:58)
    val tagged = CommentStore.query(
      CommentStore.load(spark, path),
      us("2024-01-01T00:00:00"), us("2024-01-04T00:00:00"), Seq("a", "b"))
    assert(tagged.collect().map(_.getLong(0)).toSeq == Seq(1L))

    CommentStore.update(spark, path, 2L, us("2024-01-02T00:00:00"), "edited", Seq("b", "c"))
    CommentStore.delete(spark, path, 1L)
    val after = CommentStore.load(spark, path).collect()
    assert(after.map(_.getLong(0)).toSeq == Seq(2L, 3L))
    assert(after.head.getString(2) == "edited")
  }

  test("cap 20 results (marks.py:39)") {
    val path = TestSpark.tmpDir("graft_comments2") + "/all_comments"
    val s = spark
    import s.implicits._
    val many = (1 to 30)
      .map(i => (i.toLong, i.toLong * 1000000L, s"c$i", Seq("t")))
      .toDF("id", "date_us", "text", "tags")
    many.coalesce(1).write.parquet(path)
    val got = CommentStore.query(CommentStore.load(spark, path), 0L, Long.MaxValue, Seq("t"))
    assert(got.count() == 20)
  }

  test("mutation log compacts past CompactAfterParts and folds to the same state") {
    val path = TestSpark.tmpDir("graft_comments3") + "/all_comments"
    // 20 creates + 5 updates + 5 deletes = 30 mutations: compaction
    // must have fired at least once (threshold 16) and reads must see
    // exactly the folded state, date-sorted
    (1 to 20).foreach(i =>
      CommentStore.create(spark, path, i.toLong, i.toLong * 1000000L, s"c$i", Seq("t")))
    (1 to 5).foreach(i =>
      CommentStore.update(spark, path, i.toLong, i.toLong * 1000000L, s"u$i", Seq("t", "u")))
    (16 to 20).foreach(i => CommentStore.delete(spark, path, i.toLong))
    val parts = new java.io.File(path).listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(parts <= CommentStore.CompactAfterParts + 1,
      s"log never compacted: $parts parts")
    val rows = CommentStore.load(spark, path).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 15L))
    assert(rows.take(5).map(_.getString(2)).toSeq == (1 to 5).map(i => s"u$i"))
    assert(rows.map(_.getLong(1)).toSeq.sliding(2).forall(p => p.head <= p.last))
  }

  test("fields may not contain ';' (marks.py:74-79)") {
    assertThrows[IllegalArgumentException] {
      CommentStore.validate("bad;text", Seq())
    }
    assertThrows[IllegalArgumentException] {
      CommentStore.validate("ok", Seq("a;b"))
    }
    CommentStore.validate("ok", Seq("a", "b"))
  }
}
