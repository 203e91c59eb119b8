package graft.ops

import graft.SparkSpec

/** BM25-lite (Retrieval.scala) pinned against a fully hand-computed
  * integer score: idf surrogate, cleared-denominator tf/length
  * normalization, per-term floors, tie-break at the cut.
  */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed scores: N=3, W=12, query (table, hash)") {
    val docs = Seq(
      (0L, "table table hash x"), // dl 4
      (1L, "table y z"),          // dl 3
      (2L, "a b c d e"))          // dl 5
      .toDF("doc_id", "text")
    val out = Retrieval.bm25Lite(docs, Seq("table", "hash"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // idf: table (3-2+1)*1000/(2+1)=666, hash (3-1+1)*1000/(1+1)=1500
    // d0 table: 666*1056/768 = 915; d0 hash: 1500*528/528 = 1500
    // d1 table: 666*528/474 = 741
    assert(out.toSeq == Seq((0L, 2L, 2415L), (1L, 1L, 741L)))
  }

  test("k cuts on (score desc, doc_id asc); absent terms contribute nothing") {
    val docs = Seq(
      (5L, "q q"), (3L, "q q"), (9L, "q q"), (7L, "x"))
      .toDF("doc_id", "text")
    val got = Retrieval.bm25Lite(docs, Seq("q", "zzz_never"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    // three identical scores: the two smallest doc_ids survive the cut
    assert(got == Seq(3L, 5L))
    intercept[IllegalArgumentException](Retrieval.bm25Lite(docs, Nil))
  }
}
