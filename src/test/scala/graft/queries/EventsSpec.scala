package graft.queries

import graft.SparkSpec

/** Unit semantics for the funnel operator (the oracle gate proves q56's
  * end-to-end exactness; these pin the ORDERING contract on controlled
  * input). */
class EventsSpec extends SparkSpec {

  import spark.implicits._

  test("funnel: stages must occur in order; equal timestamps qualify") {
    val e = Seq(
      // user 1: full ordered funnel
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2: click BEFORE the first view — does not count
      (2L, "click", 5L), (2L, "view", 10L),
      // user 3: click at the exact same ms as the view — counts (>=)
      (3L, "view", 10L), (3L, "click", 10L),
      // user 4: purchase without a click — stalls at stage 1
      (4L, "view", 10L), (4L, "purchase", 50L),
      // user 5: no view at all — not in the funnel
      (5L, "click", 1L)
    ).toDF("user_id", "event_type", "ms")
    val out = Events.funnel(e, Seq("view", "click", "purchase")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("stage")).toMap
    assert(out == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 1))
  }

  test("funnel: earliest qualifying event wins per stage") {
    val e = Seq(
      (1L, "view", 10L), (1L, "view", 5L),          // earliest view = 5
      (1L, "click", 7L), (1L, "click", 30L)         // earliest click >= 5 is 7
    ).toDF("user_id", "event_type", "ms")
    val row = Events.funnel(e, Seq("view", "click")).collect().head
    assert(row.getAs[Long]("view_ms") == 5L)
    assert(row.getAs[Long]("click_ms") == 7L)
  }
}
