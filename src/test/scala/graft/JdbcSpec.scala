package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Jdbc

/** read_sql contract tests — no JDBC endpoint exists in the sandbox, so
  * these pin the partition-predicate generation (the part that decides
  * whether a parallel read equals the serial one) and the URL validation.
  */
class JdbcSpec extends AnyFunSuite {

  test("partition predicates cover the whole range with no overlap") {
    val preds = Jdbc.partitionPredicates("id", 0L, 100L, 4)
    assert(preds == Seq(
      "id < 25 OR id IS NULL",
      "id >= 25 AND id < 50",
      "id >= 50 AND id < 75",
      "id >= 75"))
    // every value lands in exactly one partition, including out-of-bounds
    def owner(v: Long): Int = {
      val hits = Seq(v < 25, v >= 25 && v < 50, v >= 50 && v < 75, v >= 75)
        .zipWithIndex.filter(_._1).map(_._2)
      assert(hits.length == 1, s"value $v matched ${hits.length} partitions")
      hits.head
    }
    assert(owner(-5L) == 0)   // below lowerBound: still read, first partition
    assert(owner(0L) == 0)
    assert(owner(25L) == 1)
    assert(owner(99L) == 3)
    assert(owner(1000L) == 3) // above upperBound: still read, last partition
  }

  test("single partition is an unfiltered read") {
    assert(Jdbc.partitionPredicates("id", 0L, 10L, 1) == Seq("1=1"))
  }

  test("narrow range clamps the partition count instead of emitting empty strides") {
    val preds = Jdbc.partitionPredicates("id", 0L, 3L, 10)
    assert(preds.length == 3)
    assert(preds.head.endsWith("OR id IS NULL"))
    assert(preds.last == "id >= 2")
  }

  test("rejects inverted bounds and bad urls") {
    intercept[IllegalArgumentException] {
      Jdbc.partitionPredicates("id", 10L, 10L, 2)
    }
    intercept[IllegalArgumentException] {
      Jdbc.read(null, "postgres://host/db", "t")
    }
  }
}
