package graft.api

import graft.SparkSpec

/** Property-style walks: keyset pagination partitions any dataset into
  * non-overlapping, exhaustive, ordered pages — forward from the start and
  * backward from the last page — across seeded random datasets (duplicate
  * order keys included) and page sizes.
  */
class PaginationWalkSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)
  private val cases: Seq[(Seq[(String, Int)], Int, Boolean)] =
    (1 to 6).map { _ =>
      val n        = 1 + rnd.nextInt(25)
      val pageSize = 1 + rnd.nextInt(7)
      val desc     = rnd.nextBoolean()
      val rows     = (0 until n).map(i => (s"s$i", rnd.nextInt(6))) // few keys → ties
      (rows, pageSize, desc)
    }

  private def forwardPages(df: org.apache.spark.sql.DataFrame, pageSize: Int,
                           desc: Boolean): List[PageResult] = {
    var cursor: Option[Cursor] = None
    var out     = List.empty[PageResult]
    var hasNext = true
    var guard   = 0
    while (hasNext && guard < 60) {
      val p = Pagination.exec(df, "rank", "slug", desc, pageSize, cursor, After)
      out :+= p
      hasNext = p.pageInfo.hasNextPage
      cursor = p.pageInfo.endCursor.map(Cursor.decode)
      guard += 1
    }
    out
  }

  test("forward walk visits every row exactly once in display order") {
    cases.foreach { case (rows, pageSize, desc) =>
      val df = rows.toDF("slug", "rank")
      val expected = {
        val s = rows.sortBy { case (slug, k) => (k, slug) }
        if (desc) s.reverse else s
      }.map(_._1).toList
      val walked = forwardPages(df, pageSize, desc).flatMap(_.data.map(_.getString(0)))
      assert(walked == expected, s"forward walk mismatch (desc=$desc, ps=$pageSize)")
    }
  }

  test("backward walk from the last page reproduces the forward pages") {
    cases.foreach { case (rows, pageSize, desc) =>
      val df    = rows.toDF("slug", "rank")
      val fwd   = forwardPages(df, pageSize, desc)
      val pages = fwd.map(_.data.map(_.getString(0)).toSeq)
      // anchor: start cursor of the final forward page
      val lastStart = fwd.last.pageInfo.startCursor.map(Cursor.decode)
      var back      = lastStart
      var backPages = List.empty[Seq[String]]
      var hasPrev   = back.isDefined
      var guard     = 0
      while (hasPrev && guard < 60) {
        val p = Pagination.exec(df, "rank", "slug", desc, pageSize, back, Before)
        if (p.data.nonEmpty) backPages ::= p.data.map(_.getString(0)).toSeq
        hasPrev = p.pageInfo.hasPreviousPage
        back = p.pageInfo.startCursor.map(Cursor.decode)
        guard += 1
      }
      assert(backPages == pages.dropRight(1),
        s"backward walk mismatch (desc=$desc, ps=$pageSize): $backPages vs ${pages.dropRight(1)}")
    }
  }
}
