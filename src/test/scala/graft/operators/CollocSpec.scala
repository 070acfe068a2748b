package graft.operators

import graft.SparkSpec

/** PMI collocation invariants: correlated pairs outrank independent
  * ones, frequency floors filter, pairs are canonically ordered.
  */
class CollocSpec extends SparkSpec {
  import spark.implicits._

  test("pmi: a perfectly-correlated pair outscores an anti-correlated one") {
    // 'ping pong' always co-occur; 'ping' and 'solo' never do beyond chance
    val docs = (1L to 8L).map { i =>
      if (i <= 4) (i, "ping pong filler")
      else (i, "solo filler other")
    }.toDF("doc_id", "text")
    val res = Colloc.pmiTopK(docs, "doc_id", "text", 1L, 1L, 50)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    // df(ping)=df(pong)=4, df_ab=4, N=8 → pmi = ln(4·8/16) = ln 2
    assert(math.abs(res(("ping", "pong")) - math.log(2.0)) < 1e-3)
    // filler co-occurs with everything → pmi 0 with either side
    assert(res(("ping", "pong")) > res(("filler", "ping")))
  }

  test("pmi: canonical a<b ordering and minPair floor") {
    val docs = Seq(
      (1L, "b a"), (2L, "a b"), (3L, "a c")
    ).toDF("doc_id", "text")
    val res = Colloc.pmiTopK(docs, "doc_id", "text", 1L, 2L, 50)
      .collect().map(r => (r.getString(0), r.getString(1)))
    // only (a,b) reaches pair-df 2; emitted in canonical order
    assert(res === Array(("a", "b")))
  }

  test("pmi: minDf floor removes rare terms before pairing") {
    val docs = Seq(
      (1L, "common rare"), (2L, "common other"), (3L, "common other")
    ).toDF("doc_id", "text")
    val res = Colloc.pmiTopK(docs, "doc_id", "text", 2L, 1L, 50)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!res.exists(p => p._1 == "rare" || p._2 == "rare"))
    assert(res.contains(("common", "other")))
  }
}
