package graft.operators

import graft.SparkTestBase
import graft.config.Tuning

/** [[TextOps.redactPii]] semantics: marker substitution per family,
  * counts ≡ replacements (per stage), stage order (URLs swallow their
  * contents before the narrower patterns run), NULL/empty/control
  * rows, pass-through of unrelated columns, and streaming planability
  * (row-local — must build on an unbounded DataFrame).
  */
class RedactPiiSpec extends SparkTestBase {
  private val ops = new TextOps(Tuning())

  private def redact(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    ops.redactPii(rows.toDF("doc_id", "text"))
      .select($"doc_id", $"text_red", $"n_urls", $"n_emails",
        $"n_phones", $"n_ips", $"n_pii")
      .as[(Long, String, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
  }

  test("each family redacts to its marker with a matching count") {
    val out = redact(Seq(
      (1L, "mail Bob.Lee+x@Sub.Example.COM today"),
      (2L, "see hTtPs://Host.example/p/7?x=1 ok"),
      (3L, "call +1 (415) 555-0042 now"),
      (4L, "node 10.0.255.7 down"),
      (5L, "clean text with nothing to hide")))
    assert(out(1L)._2 == "mail <EMAIL> today" && out(1L)._4 == 1)
    assert(out(2L)._2 == "see <URL> ok" && out(2L)._3 == 1)
    assert(out(3L)._2 == "call <PHONE> now" && out(3L)._5 == 1)
    assert(out(4L)._2 == "node <IP> down" && out(4L)._6 == 1)
    assert(out(5L)._2 == "clean text with nothing to hide" &&
      out(5L)._7 == 0)
  }

  test("URLs are redacted FIRST: an email or IP inside a URL never double-counts") {
    val out = redact(Seq(
      (1L, "link http://user@host.example/a b@c.org tail"),
      (2L, "addr https://10.1.2.3/path and bare 10.1.2.4 too")))
    // the in-URL email is swallowed by <URL>; only the bare one counts
    assert(out(1L)._2 == "link <URL> b@c.org tail".replace("b@c.org", "<EMAIL>"))
    assert(out(1L)._3 == 1 && out(1L)._4 == 1)
    // the in-URL IP is swallowed; the bare one redacts
    assert(out(2L)._2 == "addr <URL> and bare <IP> too")
    assert(out(2L)._3 == 1 && out(2L)._6 == 1)
  }

  test("multi-kind rows count every family; NULL and empty text are safe") {
    import spark.implicits._
    val out = ops.redactPii(Seq(
      (1L, "u@h.net then +33 1 23 45 67 89 then 8.8.8.8"),
      (2L, null.asInstanceOf[String]),
      (3L, "")).toDF("doc_id", "text"))
      .select($"doc_id", $"text_red", $"n_pii")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), r.getLong(2))).toMap
    assert(out(1L)._1.get == "<EMAIL> then <PHONE> then <IP>" &&
      out(1L)._2 == 3)
    assert(out(2L) == (None, 0L))
    assert(out(3L) == (Some(""), 0L))
  }

  test("a multi-space run never splices two digit groups into one phone") {
    val out = redact(Seq(
      // double space after the phone: the separator cap (≤ 2 between
      // digits, match ends ON a digit) stops the match at '0100', so
      // the following IP survives intact for the IP stage
      (1L, "call +1 (415) 555-0100  10.1.2.3 up"),
      // ≥3 separators inside are not a phone at all
      (2L, "not a phone +1 (  415) 555-0100 x")))
    assert(out(1L)._2 == "call <PHONE>  <IP> up")
    assert(out(1L)._5 == 1 && out(1L)._6 == 1)
    assert(out(2L)._5 == 0)
  }

  test("NULL counts stay 0 even under legacy sizeOfNull (non-ANSI sessions)") {
    import spark.implicits._
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.sizeOfNull", "true")
    try {
      val out = ops.redactPii(
        Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"))
        .select($"n_pii").head.getLong(0)
      assert(out == 0L, "legacy size(NULL) = -1 must not leak into counts")
    } finally {
      spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
      spark.conf.unset("spark.sql.legacy.sizeOfNull")
    }
  }

  test("unrelated columns pass through; the plan builds on a streaming source") {
    import spark.implicits._
    val batch = ops.redactPii(
      Seq((1L, "x u@h.org", "web")).toDF("doc_id", "text", "source"))
    assert(batch.columns.contains("source"))
    assert(batch.select($"source").head.getString(0) == "web")

    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val streamed = ops.redactPii(mem.toDF().toDF("doc_id", "text"))
    assert(streamed.isStreaming) // row-local: valid on unbounded input
  }
}
