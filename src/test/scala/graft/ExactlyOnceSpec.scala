package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.emu.KinesisEmu
import graft.ingest.KinesisRecord

/** Exactly-once streaming commits: a retried (stream, epoch, partition)
  * token must not duplicate records in the emu log. */
class ExactlyOnceSpec extends AnyFunSuite {

  test("epoch commit is idempotent under retry") {
    KinesisEmu.reset()
    KinesisEmu.createStream("eo", 2)
    val recs = (0 until 10).map(i => KinesisRecord(s"k$i", Array[Byte](i.toByte)))
    assert(KinesisEmu.putRecordsIdempotent("eo", epochId = 7, partitionId = 0, recs))
    // simulated task retry of the same epoch/partition: rejected
    assert(!KinesisEmu.putRecordsIdempotent("eo", epochId = 7, partitionId = 0, recs))
    // a different partition of the same epoch: accepted
    assert(KinesisEmu.putRecordsIdempotent("eo", epochId = 7, partitionId = 1, recs.take(3)))
    assert(KinesisEmu.stream("eo").get.allRecords.size == 13)
    // next epoch: accepted
    assert(KinesisEmu.putRecordsIdempotent("eo", epochId = 8, partitionId = 0, recs.take(2)))
    assert(KinesisEmu.stream("eo").get.allRecords.size == 15)
    KinesisEmu.reset()
  }

  test("oversized staged epochs are re-batched to service limits") {
    KinesisEmu.reset()
    KinesisEmu.createStream("eo2", 1)
    val many = (0 until 1200).map(i => KinesisRecord("k", Array[Byte]((i % 127).toByte)))
    assert(KinesisEmu.putRecordsIdempotent("eo2", 1L, 0, many))
    assert(KinesisEmu.stream("eo2").get.allRecords.size == 1200)
    KinesisEmu.reset()
  }
}
