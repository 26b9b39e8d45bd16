package graft

import org.apache.spark.sql.functions._
import graft.streaming.{StatefulSessions, Streams}
import graft.taxonomy.{Disjointness, PropertyFrequencies}
import graft.mine.Hearst

class StatefulSpec extends SparkSuite {
  import spark.implicits._

  test("flatMapGroupsWithState sessionizer: streaming == batch semantics") {
    val sf = "/root/testdata/sf0.001"
    val events = graft.core.Tables.events(spark, sf)
      .select(col("user_id"),
              unix_timestamp(col("ts")).as("ts_s"), col("event_id"))
      .as[StatefulSessions.Event]

    // run the SAME state machine through a real streaming query
    val dir = SparkSuite.tempDir("graft-sess")
    events.toDF().write.mode("overwrite").parquet(s"$dir/in")
    val streamIn = spark.readStream
      .schema(events.schema).parquet(s"$dir/in")
      .as[StatefulSessions.Event]
    val q = StatefulSessions.run(streamIn)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions")
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.processAllAvailable()
    val streamed = spark.table("sessions")
      .as[StatefulSessions.ClosedSession].collect()
      .map(s => (s.user_id, s.start_s, s.dur_s, s.n_events)).sorted
    q.stop()

    val batch = StatefulSessions.runBatch(events)
      .map(s => (s.user_id, s.start_s, s.dur_s, s.n_events)).sorted.toArray
    assert(streamed.sameElements(batch))
    assert(streamed.nonEmpty)

    // cross-check against the window-based sessionize: closed+open sessions
    // per user must equal the window form's session count
    val closedPerUser = batch.groupBy(_._1).view.mapValues(_.length).toMap
    val windowForm = Streams.sessionize(graft.core.Tables.events(spark, sf))
      .select("user_id", "n_sessions").as[(Long, Long)].collect().toMap
    windowForm.foreach { case (u, n) =>
      val closed = closedPerUser.getOrElse(u, 0)
      assert(n == closed + 1, s"user $u: window=$n closed=$closed")
    }
  }

  test("sessionizer: a late event from a later micro-batch cannot regress the clock") {
    import StatefulSessions._
    // events sort only WITHIN one updateState invocation — a later
    // micro-batch may deliver an event that predates the session's last.
    // It must join the session without moving `last` backward: otherwise
    // the next gap test misfires (splitting at the wrong point) and the
    // closed session's duration goes negative.
    val state = new StatefulSessions.TestGroupState[SessionState]
    assert(updateState(7L, Iterator(Event(7L, 1000L, 1L)), state).isEmpty)
    assert(updateState(7L, Iterator(Event(7L, 100L, 2L)), state).isEmpty)
    assert(state.get == SessionState(1000L, 1000L, 2)) // late event counted, clock held
    // 2500 is within the 1800s gap of last=1000 (NOT of the late 100):
    // the session must continue, not close with dur_s = -900
    assert(updateState(7L, Iterator(Event(7L, 2500L, 3L)), state).isEmpty)
    assert(state.get == SessionState(1000L, 2500L, 3))
    val closed = updateState(7L, Iterator(Event(7L, 9999L, 4L)), state).toSeq
    assert(closed == Seq(ClosedSession(7L, 1000L, 1500L, 3)))
  }

  test("streaming ingest dedup: dropDuplicatesWithinWatermark == batch keys") {
    val sf = "/root/testdata/sf0.001"
    val dir = SparkSuite.tempDir("graft-sdedup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf + "/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    val q = Streams.streamingDedup(spark, dir)
      .writeStream.outputMode("append")
      .format("memory").queryName("sdedup").start()
    q.processAllAvailable()
    val streamed = spark.table("sdedup")
      .select("event_type", "k").as[(String, Long)].collect().toSet
    q.stop()
    val batch = Streams.dedupBatch(graft.core.Tables.events(spark, sf))
      .select("event_type", "k").as[(String, Long)].collect().toSet
    // both keep exactly one row per key; the streaming survivor is the
    // first ARRIVED (processing order), the batch one the first in event
    // time — the KEY SET and count must match exactly
    assert(streamed == batch && streamed.nonEmpty)
    assert(spark.table("sdedup").count() == batch.size)
  }

  test("stream-stream attribution join: streaming == batch result set") {
    val sf = "/root/testdata/sf0.001"
    val dir = SparkSuite.tempDir("graft-sjoin")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf + "/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    val q = Streams.streamingAttributionJoin(spark, dir)
      .writeStream.outputMode("append")
      .format("memory").queryName("sjoin").start()
    q.processAllAvailable()
    val streamed = spark.table("sjoin")
      .as[(Long, Long, Long)].collect().toSet
    q.stop()
    val batch = Streams
      .attributionJoinBatch(graft.core.Tables.events(spark, sf))
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch, s"streaming ${streamed.size} vs batch ${batch.size}")
    assert(streamed.nonEmpty)
  }

  test("A15 property frequencies with subtree fallback") {
    val types = Seq(("e1", "Scientist"), ("e2", "Scientist"),
                    ("e3", "Scientist"), ("e4", "Artist"))
      .toDF("ent", "tpe")
    val rels = Seq(("e1", "locatedIn", "c"), ("e2", "locatedIn", "c"),
                   ("e4", "paints", "x")).toDF("sub", "pred", "obj")
    val closure = Disjointness.closureWithSelf(
      Seq(("Scientist", "Person"), ("Artist", "Person"))
        .toDF("child", "parent"))
    val got = PropertyFrequencies
      .perClass(types, rels, closure, minEntities = 3)
      .as[(String, String, Double, Long, Boolean)].collect().toSet
    // Scientist dense (3 ents): locatedIn 2/3; Artist sparse (1 ent) →
    // subtree = itself only → paints 1/1 via_subtree
    assert(got.contains(("Scientist", "locatedIn", 0.666667, 3L, false)))
    assert(got.contains(("Artist", "paints", 1.0, 1L, true)))
  }

  test("A4 type lexicalisations with exact-label floor") {
    val counts = Seq(("berlin", "city", 3L), ("berlin", "capital", 1L))
      .toDF("sub", "obj", "cnt")
    val exact = Seq(("berlin", "settlement")).toDF("word", "tpe")
    val got = Hearst.typeLexicalisations(counts, exact, floor = 0.5)
      .as[(String, String, Double)].collect().toSet
    assert(got == Set(("berlin", "city", 0.75), ("berlin", "capital", 0.25),
                      ("berlin", "settlement", 0.5)))
  }
}
