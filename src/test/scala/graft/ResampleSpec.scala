package graft

import java.sql.Timestamp

/** q193 regular-grid resampling: hand-computed interpolation fixture,
  * including the exact-on-event-timestamp and single-event edges. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s0: String): Timestamp = Timestamp.valueOf(s0)

  test("q193: grid points interpolate linearly between brackets; edges behave") {
    val d = java.nio.file.Files.createTempDirectory("graft_resample").toString
    val rows = Seq(
      // user 1: value 1.0 at 00:30, 3.0 at 02:30 — grid hours 1 and 2
      // interpolate to 1500 and 2500 milli
      (1L, "2024-01-01 00:30:00", 1L, 1.0),
      (2L, "2024-01-01 02:30:00", 1L, 3.0),
      // user 2: an event EXACTLY on the hour — the grid point there must
      // equal the event value (prev_t = t, the same-timestamp guard)
      (3L, "2024-01-01 01:00:00", 2L, 7.0),
      (4L, "2024-01-01 01:45:00", 2L, 9.0),
      // user 3: single event → no grid point strictly inside its span
      (5L, "2024-01-01 05:10:00", 3L, 4.0),
      // user 4: LAST event exactly on the hour — the forward bracket
      // must still see it (single-ordering windows silently dropped
      // this grid point; the same-timestamp guard takes the event value)
      (6L, "2024-01-01 07:30:00", 4L, 2.0),
      (7L, "2024-01-01 09:00:00", 4L, 8.0))
      .map { case (id, t, u, v) => (id, ts(t), u, "click", v, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q193_resample_interp")(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    val h0 = ts("2024-01-01 01:00:00").getTime * 1000L / 3600000000L
    // hour 01:00 — user 1 interpolates (1.0→3.0 at 30/120 min) = 1500;
    //              user 2 sits exactly on its 7.0 event = 7000
    // hour 02:00 — user 1 = 2500 (user 2's span ended at 01:45)
    // hour 08:00 — user 4 interpolates (2.0→8.0 at 30/90 min) = 4000
    // hour 09:00 — user 4's grid point coincides with its LAST event = 8000
    assert(got == Seq((h0, 2L, 8500L), (h0 + 1, 1L, 2500L),
      (h0 + 7, 1L, 4000L), (h0 + 8, 1L, 8000L)))
  }
}
