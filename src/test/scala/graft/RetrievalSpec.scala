package graft

import graft.operators.{Dedup, Retrieval, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bm25 ranks higher-tf shorter docs above longer or non-matching ones") {
    // dl: doc 1 = 3, doc 2 = 8, doc 3 = 3; only 1 and 2 contain 'apple'.
    // idf('apple') is shared, and tfn(doc1: tf=2, dl=3) > tfn(doc2:
    // tf=1, dl=8) for any k1>0, b>0 — so the ranking is provable, not
    // just observed
    val docs = Seq(
      (1L, "apple apple pie"),
      (2L, "apple tart with a very long crust recipe"),
      (3L, "banana bread loaf")).toDF("doc_id", "text")
    val out = Retrieval.bm25(docs, Seq((7L, "apple")), k = 10)
      .orderBy("rn")
      .as[(Long, Long, Long, Long, Int)].collect()
    assert(out.map(_._2).toSeq === Seq(1L, 2L))
    assert(out.map(_._5).toSeq === Seq(1, 2))
    assert(out.forall(_._3 === 1L)) // one matched term each
    assert(out(0)._4 > out(1)._4)   // strictly higher score in micros
  }

  test("bm25 multi-term query sums per-term contributions") {
    val docs = Seq(
      (1L, "red fish blue fish"),
      (2L, "red herring"),
      (3L, "green eggs")).toDF("doc_id", "text")
    val both = Retrieval.bm25(docs, Seq((1L, "red fish")), k = 10)
    val rows = both.as[(Long, Long, Long, Long, Int)].collect()
      .map(r => r._2 -> (r._3, r._4)).toMap
    assert(rows(1L)._1 === 2L) // doc 1 matches both terms
    assert(rows(2L)._1 === 1L)
    assert(!rows.contains(3L)) // no shared term, no row
    // doc 1's score strictly exceeds doc 2's: it adds a rarer term
    // (fish, df=1) on top of the shared one
    assert(rows(1L)._2 > rows(2L)._2)
  }

  test("bm25 over the corpus: k bounded per query, deterministic reruns") {
    val a = Retrieval.bm25TopK(spark, dir, k = 10)
    val rowsA = a.collect()
    val perQ = rowsA.groupBy(_.getLong(0))
    assert(perQ.keySet === Retrieval.Queries.map(_._1).toSet)
    perQ.values.foreach { rs =>
      assert(rs.length === 10)
      assert(rs.map(_.getInt(4)).sorted.toSeq === (1 to 10))
    }
    val rowsB = Retrieval.bm25TopK(spark, dir, k = 10).collect()
    assert(rowsA.map(_.toString).sorted.toSeq ===
      rowsB.map(_.toString).sorted.toSeq)
  }

  test("hybrid RRF: fusion scores are the exact integer sum of leg ranks") {
    import graft.operators.Similarity
    val out = Retrieval.hybridRrf(spark, dir)
      .as[(Long, Long, Long, Int)].collect()
    assert(out.nonEmpty)
    // recompute both legs' rank maps independently and check every
    // fused score is floor(1e9/(60+r_lex)) + floor(1e9/(60+r_cos))
    val emb = Tables.embeddings(spark, dir)
    val cos = Similarity
      .knnBruteForce(emb, emb.filter(col("vec_id") < 4), Retrieval.RrfRankK)
      .select(col("query_id"), col("nn_id"), col("rn"))
      .as[(Long, Long, Int)].collect()
      .map { case (q, d, r) => (q, d) -> r }.toMap
    def contrib(r: Option[Int]): Long =
      r.map(x => 1000000000L / (Retrieval.RrfK + x)).getOrElse(0L)
    // the lexical leg is harder to recompute independently here, so
    // bound-check it instead: every fused score's cosine share matches,
    // and the residual (the lexical share) is a legal RRF value
    val legalLex = (0L +: (1 to Retrieval.RrfRankK).map(r =>
      1000000000L / (Retrieval.RrfK + r))).toSet
    out.foreach { case (qid, docId, nano, _) =>
      val cosShare = contrib(cos.get((qid, docId)))
      val lexShare = nano - cosShare
      assert(legalLex.contains(lexShare),
        s"($qid,$docId): lexical share $lexShare is not a legal RRF term")
    }
    // per query: exactly 10 rows, ranks 1..10, scores non-increasing
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length === 10, s"query $q")
      assert(rows.sortBy(_._4).map(_._3).sliding(2).forall(p =>
        p.length < 2 || p(0) >= p(1)), s"query $q scores not sorted")
    }
    // a doc in BOTH legs' top ranks must beat one present in only one
    // leg at the same rank — the fusion property
    assert(out.exists { case (qid, docId, nano, _) =>
      cos.contains((qid, docId)) && nano > contrib(cos.get((qid, docId)))
    }, "no fused doc drew from both legs — fusion never composed")
  }

  test("ngram novelty: hand-checked sharing and the gram-less degenerate") {
    // docs 1 and 2 share their full 3-token text (1 trigram each,
    // shared); doc 3 is unique (novelty 1e6); doc 4 has < 3 tokens
    // (no grams — defined fully novel)
    val docs = Seq(
      (1L, "to be continued"),
      (2L, "to be continued"),
      (3L, "something else entirely"),
      (4L, "too short")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, n = 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) === ((1L, 1L, 0L)))
    assert(out(2L) === ((1L, 1L, 0L)))
    assert(out(3L) === ((1L, 0L, 1000000L)))
    assert(out(4L) === ((0L, 0L, 1000000L)))
  }

  test("ngram novelty: planted near-dup copies score 0, bases near 0") {
    val corpus = Dedup.withNearDups(Tables.documents(spark, dir))
    val out = TextAnalysis.ngramNovelty(corpus)
    assert(out.count() === 520)
    // a copy drops the base's first token, so every 8-gram of the copy
    // is an 8-gram of the base: n_shared == n_grams, novelty 0
    val copies = out.filter(col("doc_id") >= Dedup.DupIdOffset)
      .select("novelty_millionths").as[Long].collect()
    assert(copies.length === 20)
    assert(copies.forall(_ === 0L))
    // the base shares all but the windows touching its first token:
    // at most 1 unshared gram out of dozens
    val bases = out.filter(col("doc_id") < 20)
      .select((col("n_grams") - col("n_shared")).as[Long]).collect()
    assert(bases.forall(_ <= 1L))
  }

  test("inverted index: exact counts, sorted postings, stop-list cap") {
    import graft.functions.TextFunctions.tokenize
    val idx = Retrieval.invertedIndex(spark, dir, dfCap = 64L)
      .as[(String, Long, Long, Option[String])].collect()
    assert(idx.nonEmpty)
    idx.foreach { case (term, df, tf, postings) =>
      assert(tf >= df, s"$term tf<df")
      postings match {
        case Some(p) =>
          val ids = p.split(",").map(_.toLong).toSeq
          assert(ids.length === df, s"$term postings/df")
          assert(ids === ids.sorted, s"$term postings unsorted")
          assert(ids.distinct === ids, s"$term duplicate posting")
        case None => assert(df > 64L, s"$term suppressed below cap")
      }
    }
    // both the listed and the stop-listed branches are exercised
    assert(idx.exists(_._4.isEmpty) && idx.exists(_._4.isDefined))
    // cross-check the largest LISTED term against a direct scan
    val big = idx.filter(_._4.isDefined).maxBy(_._2)
    val direct = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokenize(col("text"))).as("w"))
      .filter(lower(col("w")) === big._1)
      .select("doc_id").distinct().as[Long].collect().sorted.toSeq
    assert(direct === big._4.get.split(",").map(_.toLong).toSeq)
  }
}
