package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.TestSpark

class AttributionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(h: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-10 $h%02d:00:00")

  // user 1: click(1h) view(2h) purchase(3h, $100); click(5h) purchase(6h, $50)
  // user 2: view 10 days before purchase → outside lookback, unattributed
  private def events = Seq(
    (1L, ts(1), 1L, "click", 0.0),
    (2L, ts(2), 1L, "view", 0.0),
    (3L, ts(3), 1L, "purchase", 100.0),
    (4L, ts(5), 1L, "click", 0.0),
    (5L, ts(6), 1L, "purchase", 50.0),
    (6L, Timestamp.valueOf("2024-01-01 00:00:00"), 2L, "view", 0.0),
    (7L, Timestamp.valueOf("2024-01-12 00:00:00"), 2L, "purchase", 70.0)
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("linear, first, last and decay credits per channel") {
    val out = Attribution.multiTouch(events)
      .collect().map(r => r.getString(0) -> r).toMap

    // conversion 3 ($100): touches click@1h, view@2h, click@4h?? no —
    // touch 4 is AFTER conv 3, so conv 3 has {click@1h, view@2h};
    // conversion 5 ($50): touches within 7d = {click@1h, view@2h, click@5h}
    val click = out("click")
    val view = out("view")
    assert(click.getAs[Long]("conversions_touched") == 2)
    assert(view.getAs[Long]("conversions_touched") == 2)
    assert(click.getAs[Long]("touches") == 3)
    assert(view.getAs[Long]("touches") == 2)

    // linear: conv3 100/2 to each of click,view; conv5 50/3 per touch
    // (click gets 2 shares)
    assert(math.abs(click.getAs[Double]("linear_value") -
      (100.0 / 2 + 2 * BigDecimal(50.0 / 3).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)) < 1e-6)
    assert(math.abs(view.getAs[Double]("linear_value") -
      (100.0 / 2 + BigDecimal(50.0 / 3).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)) < 1e-6)

    // first touch: conv3 → click@1h; conv5 → click@1h. view gets 0
    assert(click.getAs[Double]("first_touch_value") == 150.0)
    assert(view.getAs[Double]("first_touch_value") == 0.0)
    // last touch: conv3 → view@2h; conv5 → click@5h
    assert(click.getAs[Double]("last_touch_value") == 50.0)
    assert(view.getAs[Double]("last_touch_value") == 100.0)

    // decay shares sum to the conversion value per conversion
    val totalDecay = out.values.map(_.getAs[Double]("decay_value")).sum
    assert(math.abs(totalDecay - 150.0) < 1e-3)
    // user 2's conversion is outside the lookback → not attributed
    assert(math.abs(out.values.map(_.getAs[Double]("linear_value")).sum
      - 150.0) < 1e-3)
  }

  test("plan shape: per-user join, one conv window pass, no cartesian") {
    val out = Attribution.multiTouch(events)
    out.collect()
    graft.audit.PlanGuard.assertNoCartesian(out)
    // touch shuffle + conv shuffle (user key), conv-id window exchange,
    // channel aggregate
    graft.audit.PlanGuard.assertMaxExchanges(out, 4)
  }
}
