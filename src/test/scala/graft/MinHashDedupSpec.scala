package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.dedup.MinHashDedup
import graft.queries.TextOps

/** Q43 gate: MinHash-LSH candidate recall vs the exact Q31 Jaccard pairs
  * (SURVEY.md §2B — recall ≥ 0.9 on sf0.001; band shape 32×2 should give
  * ~1.0). Precision is 1.0 by construction (exact rerank). */
class MinHashDedupSpec extends SparkSpec {

  test("minhash-lsh finds >=90% of exact jaccard>=0.5 pairs, no false positives") {
    val exact = TextOps.queries("q31_jaccard_pairs")(spark, sf)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = MinHashDedup.query(spark, sf)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "exact pair set must not be empty for a meaningful recall check")
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall below 0.9 (missed ${(exact diff approx).size})")
    // Rerank keeps only true pairs, and blocking matches Q31's: no extras.
    assert((approx diff exact).isEmpty, s"unexpected pairs: ${(approx diff exact).take(5)}")
  }

  test("signatures are deterministic across runs") {
    val docs = Tables.t(spark, sf, "documents").limit(50)
    val a = MinHashDedup.signatures(docs).orderBy("doc_id").collect()
    val b = MinHashDedup.signatures(docs).orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("persisted index: pairsFromIndex answers without re-signing and survives a fresh session") {
    val docs = Tables.t(spark, sf, "documents")
    val idx = graft.core.TempDirs.create("graft-minhash-idx")
    MinHashDedup.buildIndex(docs, idx)
    val fromIdx = MinHashDedup.pairsFromIndex(spark, idx)
    // Plan-level no-refit proof: the candidate/banding side scans the
    // persisted signature table — the 32-way min signature aggregation
    // (32 mh_* min() columns) must NOT appear in the search plan (the
    // only aggregates left are the rerank count and dedup).
    val plan = fromIdx.queryExecution.executedPlan.toString
    assert(plan.contains(idx), s"pairs plan must scan the index dir:\n${plan.take(2000)}")
    // The signature fit is the only place the min(pmod(...)) universal-hash
    // aggregation lives, and tokenization only happens in buildIndex; the
    // index-read plan must be free of both (no corpus scan at all). Bare
    // pmod IS expected here — the skew-salting of the bucket self-join
    // hashes doc_id into its split cell with pmod(xxhash64(doc_id), g).
    assert(!plan.contains("min(pmod"), "signature fit aggregation leaked into the index-read path")
    assert(!plan.contains("explode(split"), "corpus re-tokenization leaked into the index-read path")
    val a = fromIdx.select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = MinHashDedup.nearDuplicates(docs)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b, "index-served pairs must equal the one-shot pipeline")
    // Fresh session, same store: the index is plain parquet on disk, and
    // pairsFromIndex no longer needs the corpus at all.
    val s2 = spark.newSession()
    val c = MinHashDedup.pairsFromIndex(s2, idx)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(c == b, "fresh-session pairs from the persisted index must agree")
  }

  test("appendToIndex surfaces new-vs-old near-dup pairs without re-reading the corpus") {
    val docs = Tables.t(spark, sf, "documents")
    val idx = graft.core.TempDirs.create("graft-minhash-append")
    MinHashDedup.buildIndex(docs, idx)
    val before = MinHashDedup.pairsFromIndex(spark, idx)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Append an exact copy of doc 0's text under a fresh id: the next
    // index query must pair it with doc 0 at jaccard 1.0.
    val d0 = docs.filter(org.apache.spark.sql.functions.col("doc_id") === 0)
      .collect().head
    val dup = spark.createDataFrame(Seq(
      (99999L, d0.getAs[String]("text"), d0.getAs[String]("lang"), d0.getAs[String]("source"))))
      .toDF("doc_id", "text", "lang", "source")
    MinHashDedup.appendToIndex(dup, idx)
    val after = MinHashDedup.pairsFromIndex(spark, idx)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after.contains((0L, 99999L)), s"appended duplicate not paired: ${after diff before}")
    assert(before.subsetOf(after), "append must not lose existing pairs")
  }

  test("2-gram shingles tighten similarity vs unigrams") {
    val docs = Tables.t(spark, sf, "documents")
    val uni = MinHashDedup.nearDuplicates(docs, threshold = 0.3).count()
    val bi = MinHashDedup.nearDuplicates(docs, threshold = 0.3, shingleSize = 2).count()
    // Shared-vocab docs overlap heavily on unigrams but far less on word
    // pairs — bigram shingling must prune pairs.
    assert(bi < uni, s"bigram pairs $bi not < unigram pairs $uni")
    // short docs (< w tokens) must not crash the shingler
    val tiny = spark.createDataFrame(Seq((1L, "one", "en", "s"), (2L, "", "en", "s")))
      .toDF("doc_id", "text", "lang", "source")
    assert(MinHashDedup.nearDuplicates(tiny, shingleSize = 2).count() == 0)
  }
}
