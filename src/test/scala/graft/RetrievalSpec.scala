package graft

import org.apache.spark.sql.functions._
import graft.ext.Retrieval

/** Retrieval-prep operators: t22 chunking tiling invariants and t23
  * inverted-index postings, pinned against driver-side recomputes on
  * crafted documents (the sf oracle checks the full corpus; these pin
  * the edge cases the corpus may not contain). */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(texts: (Long, String)*) =
    texts.toSeq.toDF("doc_id", "text")

  test("t22: chunk grid is the exact ceil tiling — edge lengths") {
    val W = 8; val S = 6
    // n relative to W: shorter, exact one window, W+1 (first overflow),
    // exact grid end (n = W + S), one past it, and a single token
    val lens = Seq(1, 5, 8, 9, 14, 15, 20)
    val docs = docsOf(lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(t => s"w$t").mkString(" ")) }: _*)
    val got = Retrieval.chunks(docs, window = W, stride = S)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    lens.zipWithIndex.foreach { case (n, i) =>
      val mine = got.filter(_._1 == i.toLong).sortBy(_._2)
      val expChunks = if (n <= W) 1 else ((n - W + S - 1) / S) + 1
      assert(mine.length == expChunks, s"n=$n chunk count")
      mine.foreach { case (_, cid, start, nTok, text) =>
        assert(start == cid * S, s"n=$n chunk $cid start")
        assert(nTok == math.min(W, n - start), s"n=$n chunk $cid len")
        val expText = (start until start + nTok).map(t => s"w$t").mkString(" ")
        assert(text == expText, s"n=$n chunk $cid text")
      }
      // the last chunk reaches exactly the end of the doc
      val last = mine.last
      assert(last._3 + last._4 == n, s"n=$n tail coverage")
      // every token index is covered by at least one chunk
      val covered = mine.flatMap(c => c._3 until (c._3 + c._4)).toSet
      assert(covered == (0L until n).toSet, s"n=$n full coverage")
    }
  }

  test("t22: chunk ids are stable under corpus growth (pure function of the doc)") {
    val d1 = docsOf(1L -> (0 until 100).map(t => s"a$t").mkString(" "))
    val d2 = docsOf(
      1L -> (0 until 100).map(t => s"a$t").mkString(" "),
      2L -> (0 until 300).map(t => s"b$t").mkString(" "))
    val c1 = Retrieval.chunks(d1).filter(col("doc_id") === 1)
      .collect().map(_.toSeq).toSet
    val c2 = Retrieval.chunks(d2).filter(col("doc_id") === 1)
      .collect().map(_.toSeq).toSet
    assert(c1 == c2, "doc 1's chunks must not change when doc 2 arrives")
  }

  test("t23: postings exact on crafted docs; df band drops stopwords and noise") {
    val docs = docsOf(
      10L -> "the cat sat on the mat",
      11L -> "the cat ran",
      12L -> "the dog sat and sat",
      13L -> "only here")
    // band [2,3]: "the" df=3 in band upper edge; "cat" df=2; "sat" df=2;
    // "only"/"here"/... df=1 out; with maxDf=2 "the" drops
    val idx = Retrieval.invertedIndex(docs, minDf = 2, maxDf = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(idx.keySet == Set("cat", "sat"))
    assert(idx("cat") == ((2L, 2L, "10:1;11:1")))
    // "sat" occurs at positions 2 in doc 10, 2 and 4 in doc 12
    assert(idx("sat") == ((2L, 3L, "10:2;12:2|4")))
    val withThe = Retrieval.invertedIndex(docs, minDf = 2, maxDf = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(withThe.keySet == Set("cat", "sat", "the"))
    assert(withThe("the") == ((3L, 4L, "10:0|4;11:0;12:0")))
  }

  test("t23: result is invariant to input partitioning") {
    val base = (0L until 40L).map(i =>
      (i, s"tok${i % 7} tok${i % 5} tok${i % 7} common"))
    val a = Retrieval.invertedIndex(
      base.toDF("doc_id", "text").repartition(1), minDf = 2, maxDf = 40)
    val b = Retrieval.invertedIndex(
      base.toDF("doc_id", "text").repartition(13), minDf = 2, maxDf = 40)
    assert(a.collect().map(_.toSeq).toSet == b.collect().map(_.toSeq).toSet)
  }

  test("plan: t22 chunking runs with zero exchanges; t23 vocab join broadcasts") {
    val docs = sources.Tables.documents(spark, sf())
    val chunkPlan =
      Retrieval.chunks(docs).queryExecution.executedPlan.toString
    assert(!chunkPlan.contains("Exchange"),
      s"chunking must not shuffle:\n$chunkPlan")
    val idxPlan = Retrieval.invertedIndex(docs, minDf = 2, maxDf = 500)
      .queryExecution.executedPlan.toString
    assert(idxPlan.contains("BroadcastHashJoin"),
      s"banded vocab must join back as a broadcast:\n$idxPlan")
    assert(!idxPlan.contains("SortMergeJoin"), idxPlan)
  }

  test("t25: phrase search finds exactly the consecutive matches") {
    val docs = docsOf(
      (1L, "a b c a b"),       // "a b" at 0 and 3
      (2L, "b a b a"),         // "a b" at 1
      (3L, "a a b"),           // at 1
      (4L, "b a"),             // no match (reversed)
      (5L, "a"), (6L, ""))
    val got = Retrieval.phraseSearch(docs, Seq("a", "b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 0L), (1L, 3L), (2L, 1L), (3L, 1L)))
    // repeated-token phrase: overlapping occurrences all found
    val rep = Retrieval.phraseSearch(docsOf((7L, "x x x x")), Seq("x", "x"))
      .collect().map(r => r.getLong(1)).toSet
    assert(rep == Set(0L, 1L, 2L))
    // three-token phrase intersects three shifted streams
    val tri = Retrieval.phraseSearch(docs, Seq("c", "a", "b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tri == Set((1L, 2L)))
    // topBigram total order: count desc then lexicographic
    val tb = Retrieval.topBigram(docsOf(
      (1L, "z w z w"), (2L, "a a z w")))  // "z w" ×3 beats "a a" ×1
    assert(tb == ("z", "w"))
    val tie = Retrieval.topBigram(docsOf((1L, "b c a b"), (2L, "a b")))
    assert(tie == ("a", "b"), "ties resolve to the lexicographically first")
  }
}
