package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class PiiSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def red(s: String): String =
    Seq(s).toDF("t").select(Pii.redact(col("t"))).as[String].collect().head

  test("each PII type redacts to its typed token") {
    assert(red("mail me at a.b+c@ex-ample.co.uk today") ==
      "mail me at <EMAIL> today")
    assert(red("card 4532015112830366 on file") == "card <CARD> on file")
    assert(red("card 4532 0151 1283 0366 on file") == "card <CARD> on file")
    assert(red("from 192.168.0.1 at dawn") == "from <IP> at dawn")
    assert(red("call (555) 123-4567 or +1 555.123.4567") ==
      "call <PHONE> or <PHONE>")
  }

  test("E.164-spelled international phones redact; digit-run tails don't") {
    assert(red("ring +44 20 7946 0958 today") == "ring <PHONE> today")
    assert(red("tokyo line +81 3 1234 5678 ok") == "tokyo line <PHONE> ok")
    assert(red("start +1 555-123-4567") == "start <PHONE>")
    // a 3-3-4 run INSIDE a longer dotted sequence is not a phone (the
    // left guard): previously '234.567.8901' leaked into the counts
    assert(red("version 1.234.567.8901 shipped") ==
      "version 1.234.567.8901 shipped")
    // phone at string start (the ^ alternative of the guard)
    assert(red("555-123-4567 is the line") == "<PHONE> is the line")
    // enumerations with short +N fragments stay untouched
    assert(red("scores +1 2 and +3 4 here") == "scores +1 2 and +3 4 here")
  }

  test("overlapping types resolve by the documented chain order") {
    // a 16-digit run must become ONE <CARD>, never a phone fragment;
    // an IPv4 must not leave octets behind for the phone stage
    assert(red("pay 4532015112830366 then ping 10.0.0.1") ==
      "pay <CARD> then ping <IP>")
    // an email whose local part is digits stays an email
    assert(red("5551234567890123@ex.com") == "<EMAIL>")
    // clean text unchanged
    assert(red("no pii here, just words and the number 42") ==
      "no pii here, just words and the number 42")
  }

  test("luhn: textbook-valid cards pass, off-by-one fails") {
    def lv(s: String): Boolean =
      Seq(s).toDF("t").select(Pii.luhnValid(col("t")))
        .as[Boolean].collect().head
    assert(lv("4532015112830366"))      // valid Visa test number
    assert(lv("4532 0151 1283 0366"))   // separators ignored
    assert(lv("4111111111111111"))
    assert(!lv("4532015112830367"))     // checksum off by one
    assert(!lv("1234567890123456"))
    assert(!lv("123"))                  // too short to be a card
  }

  test("per-type counts equal replacements; luhn audit separates leaks from ids") {
    val df = Seq(
      (1L, "a@b.com and c@d.org meet at 10.0.0.1"),
      (2L, "valid 4532015112830366 vs order id 1234567890123456"),
      (3L, "call 555-123-4567")
    ).toDF("id", "t")
    val got = df.select(col("id"),
        Pii.emailCount(col("t")).as("e"), Pii.cardCount(col("t")).as("c"),
        Pii.ipv4Count(col("t")).as("i"), Pii.phoneCount(col("t")).as("p"),
        Pii.luhnValidCount(col("t")).as("lv"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got(1L) == ((2L, 0L, 1L, 0L, 0L)))
    // both digit runs are card-SHAPED (both redacted), but only the
    // real card is Luhn-valid — the leak-severity signal
    assert(got(2L) == ((0L, 2L, 0L, 0L, 1L)))
    assert(got(3L) == ((0L, 0L, 0L, 1L, 0L)))
  }
}
