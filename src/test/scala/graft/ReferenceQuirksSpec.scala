package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.emu.KinesisEmu
import graft.ingest._
import graft.sink.KinesisWriter

/** SURVEY.md §2a quirks (a)-(f) and §7.4 decisions: where the reference's
  * observable behavior is externally meaningful we reproduce it; where it
  * silently loses data we diverge deliberately — these tests pin down
  * which is which. */
class ReferenceQuirksSpec extends AnyFunSuite {

  private def withStream[A](shards: Int = 1)(f: => A): A = {
    KinesisEmu.reset()
    KinesisEmu.createStream("t", shards)
    try f finally KinesisEmu.reset()
  }

  test("quirk (e): empty write yields exactly one empty record (kinesis.go:246-268)") {
    withStream() {
      KinesisWriter.write(KinesisWriter.Config("t", "k"), Array.emptyByteArray)
      assert(KinesisEmu.stream("t").get.allRecords.map(_.data.length) == Seq(0))
    }
  }

  test("quirk (a) divergence: partial PutRecords failures are SURFACED, not swallowed") {
    // reference: Writer.Write returns (len(p), nil-ish) even when a batch
    // failed mid-way (kinesis.go:222,237) — later batches silently lost.
    // Here: every response is returned to the caller with per-record
    // failure detail; nothing is silently dropped.
    withStream() {
      KinesisEmu.failureInjector =
        (_, recs) => if (recs.nonEmpty) Seq(KinesisEmu.PerRecordFailure(0, "Throttling")) else Seq.empty
      val resps = KinesisWriter.write(
        KinesisWriter.Config("t", "key", recordSizeLimit = 5, putRecordsLimit = 2), "abcde".getBytes)
      // 3 records -> 2 requests; each surfaces its failures
      assert(resps.size == 2)
      assert(resps.map(_.failedCount).sum == 2)
      assert(resps.flatMap(_.results).count(_.isRight) == 1)
    }
  }

  test("quirk (b) divergence: final flush drains EVERYTHING (no queued-data loss at exit)") {
    // reference: exit-time Flush() drains bufio only; up to queue*4MiB of
    // accepted flush units can vanish (main.go:48, kinesis.go:99-133).
    // Here: Flusher.flush + the writer's drain deliver every accepted unit.
    withStream() {
      val cfg = KinesisWriter.Config("t", "k", bufferSize = 64)
      var delivered = 0L
      val flusher = new KinesisWriter.Flusher(cfg, u => {
        KinesisWriter.write(cfg, u); delivered += u.length
      })
      val payload = Array.fill(1000)(7.toByte)
      flusher.write(payload)
      flusher.flush()
      assert(delivered == 1000L)
      assert(KinesisEmu.stream("t").get.allRecords.map(_.data.length).sum == 1000)
    }
  }

  test("drop granularity: load shedding discards whole flush units (BASELINE.md row 'drop granularity')") {
    val unit = 4096L
    val (_, dropped, stats) =
      DropPolicy.decide(Seq.fill(10)(unit), queueDepth = 2, drainPerOffer = 0.0)
    assert(dropped.nonEmpty)
    assert(stats.droppedBytes % unit == 0L, "drops must be whole flush units")
  }

  test("default Dropped hook parity: per-drop 'dropping N bytes' to stderr (kinesis.go:151-155)") {
    // the hook fires once per dropped unit with the unit's byte size
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    val prev = DropPolicy.onDrop
    DropPolicy.onDrop = seen += _
    try {
      val (_, dropped, _) =
        DropPolicy.decide(Seq.fill(10)(100L), queueDepth = 2, drainPerOffer = 0.0)
      assert(seen.size == dropped.size && seen.forall(_ == 100L))
    } finally DropPolicy.onDrop = prev
    // and the DEFAULT hook writes the reference's exact stderr message
    // (fmt.Fprintf(os.Stderr, "dropping %d bytes", len(p)) — no newline)
    val buf = new java.io.ByteArrayOutputStream()
    val old = System.err
    System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
    try DropPolicy.DefaultOnDrop(42L) finally System.setErr(old)
    assert(buf.toString("UTF-8") == "dropping 42 bytes")
  }

  test("quirk (f): the declared-but-unenforced service limits ARE enforced here") {
    // reference declares 5 MiB/request and shard-rate ceilings but never
    // checks them (kinesis.go:19-35). The emulator enforces the request
    // limits (tested in IngestSpec) and exposes the shard-rate constants
    // for sink-side pacing.
    assert(Limits.PutRecordsSizeLimit == 5 * 1024 * 1024)
    assert(Limits.ShardRecordsRateLimit == 1000)
    assert(Limits.ShardBytesRateLimit == 1024 * 1024)
  }

  test("chunk boundaries are byte offsets, not line boundaries (kinesis.go:246-268)") {
    withStream() {
      // a "log line" split across two records, exactly like the reference
      val cfg = KinesisWriter.Config("t", "key", recordSizeLimit = 11) // chunk = 8
      KinesisWriter.write(cfg, "line-one\nline-two\n".getBytes)
      val datas = KinesisEmu.stream("t").get.allRecords.sortBy(_.sequenceNumber)
        .map(r => new String(r.data))
      assert(datas == Seq("line-one", "\nline-tw", "o\n"))
    }
  }
}
