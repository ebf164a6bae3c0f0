package graft.datapipe

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(s: String, size: Int, overlap: Int): Seq[String] =
    Seq(s).toDF("text")
      .select(explode(TextAnalysis.chunks(col("text"), size, overlap)))
      .as[String].collect().toSeq

  test("overlapping windows: stride, overlap, short tail") {
    val text = "abcdefghij" // 10 chars
    val got = chunksOf(text, size = 4, overlap = 2) // stride 2
    // n = ceil((10-4)/2)+1 = 4
    assert(got == Seq("abcd", "cdef", "efgh", "ghij"))
    // each adjacent pair shares exactly `overlap` characters
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(a.takeRight(2) == b.take(2))
    }
  }

  test("short and empty docs yield a single chunk") {
    assert(chunksOf("ab", 4, 2) == Seq("ab"))
    assert(chunksOf("abcd", 4, 2) == Seq("abcd"))
    assert(chunksOf("", 4, 2) == Seq(""))
  }

  test("tail shorter than size is kept, full text always covered") {
    val text = "abcdefghijk" // 11 chars, size 4 stride 2 -> n = ceil(7/2)+1 = 5
    val got = chunksOf(text, 4, 2)
    assert(got == Seq("abcd", "cdef", "efgh", "ghij", "ijk"))
    assert(got.head.startsWith("a") && got.last.endsWith("k"))
  }

  test("overlap >= size rejected") {
    intercept[IllegalArgumentException] {
      TextAnalysis.chunks(col("text"), 4, 4)
    }
  }
}
