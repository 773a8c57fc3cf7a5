package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Scored keyword retrieval over a document corpus — the lexical twin
  * of the embedding ANN surface in [[Similarity]]. The reference
  * (pydala) has no search surface; this is extension scope for the
  * training-data pipeline (e.g. targeted corpus audits: "show me the
  * documents most about X" without an embedding pass).
  *
  * Scale shape (the inverted-index shuffle, not a scan-per-query):
  * tokens explode to ~one row per corpus token but are filtered to the
  * query's terms BEFORE any exchange (the explode+filter collapses
  * map-side), per-(doc, term) tf and per-term df are partial-combine
  * aggregates, corpus stats (N, avgdl) and the per-term df table are
  * tiny broadcasts, and the final top-k plans as TakeOrderedAndProject
  * — no global sort. One pass over the corpus per query batch.
  */
object Search {

  /** Okapi BM25 top-k: rank documents against `queryTerms` and return
    * the `k` best as (doc_id, score_r, n_terms_hit).
    *
    * Scoring (standard BM25 with the +1 idf floor, so idf is never
    * negative even for terms in most documents):
    * {{{
    *   idf(t)  = ln( (N - df + 0.5) / (df + 0.5) + 1 )
    *   s(d, t) = idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    * }}}
    * All math in double; the score is rounded to 6 decimals so an
    * independent engine computing the same formula lands on the same
    * bytes (FP sum order across a handful of per-term partials is
    * below the rounding grain). Document length `dl` counts ALL
    * tokens, not just query terms. */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {

    val terms = queryTerms.map(_.toLowerCase).distinct
    require(terms.nonEmpty, "bm25TopK: empty query")

    // ONE slim pin, TWO consumers (r11 review fix — the r9 slim
    // (doc_id, dl) stats pin had postings recomputing `dl` from an
    // independent second scan: no reuse, and a non-deterministic input
    // plan could make avgdl/N disagree with per-row dl). A single
    // corpus scan computes per row: dl over ALL tokens, plus the
    // per-query-term tf counts, entirely map-side — no (doc, term)
    // shuffle aggregate at all. The pin stores (doc_id, dl, tfs) where
    // `tfs` is query-term-sized (never the token array: at 100 TB the
    // token arrays ARE the corpus), and BOTH the corpus stats and the
    // postings derive from it — single-source consistency by
    // construction.
    //
    // The expensive arrays are STAGED as named columns across stacked
    // projections (r12 review fix: a single select re-referenced
    // words(text) under the HOF lambdas, and higher-order functions
    // evaluate interpreted — CodegenFallback — with no subexpression
    // elimination across lambda bodies, so the tokenizer ran
    // ~(2 + matched terms)× per row; at corpus scale the tokenizer IS
    // the scan cost). Catalyst's CollapseProject keeps a non-cheap
    // producer staged when it is referenced more than once, so `__w`
    // (all tokens → dl and the query filter) and `__qw` (query-term-
    // sized → the tf counts) each evaluate exactly once per row;
    // attribute re-reads are free. Both staging columns are projected
    // away before the pin, which stays (doc_id, dl, tfs).
    val base = bm25Base(docs, idCol, textCol, terms).localCheckpoint(false)
    // N and avgdl over ALL docs (zero-token docs included — they are
    // part of the corpus the statistics describe)
    val stats = base.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    // postings: explode the per-row tf structs — already one row per
    // (doc, term) with tf attached, a pure projection over the pin
    val postings = base
      .select(col("doc_id"), col("dl"), explode(col("tfs")).as("p"))
      .select(col("doc_id"), col("dl"),
        col("p.term").as("term"), col("p.tf").as("tf"))
    // document frequency per query term (postings are one row per
    // (doc, term) already, so a plain count is df)
    val dfreq = postings.groupBy("term")
      .agg(count(lit(1)).cast("double").as("df"))

    postings.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      // parenthesization mirrors the DuckDB oracle operation-for-
      // operation so the doubles are bit-identical before rounding
      .withColumn("__s", col("__idf") * col("tf") * (k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(sum(col("__s")).as("__score"), count(lit(1)).as("n_terms_hit"))
      .orderBy(desc("__score"), col("doc_id"))
      .limit(k)
      .select(col("doc_id"), round(col("__score"), 6).as("score_r"),
        col("n_terms_hit"))
  }

  /** The un-pinned (doc_id, dl, tfs) corpus projection [[bm25TopK]]
    * pins — package-visible so SearchSpec can audit its OPTIMIZED plan
    * (the lazy pin renders as an opaque LogicalRDD leaf in the final
    * query, hiding the staging from `.explain`): the tokenizer must
    * appear exactly once, which is what the stacked-projection staging
    * guarantees as long as CollapseProject keeps multi-referenced
    * non-cheap producers materialized. */
  private[graft] def bm25Base(
      docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    val termArr = array(terms.map(lit): _*)
    docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.words(col(textCol)).as("__w"))
      .select(col("doc_id"),
        size(col("__w")).cast("double").as("dl"),
        filter(col("__w"), w => array_contains(termArr, w)).as("__qw"))
      .select(col("doc_id"), col("dl"),
        transform(array_distinct(col("__qw")), t =>
          struct(t.as("term"),
            size(filter(col("__qw"), w => w === t)).cast("double").as("tf")))
          .as("tfs"))
  }

  /** Per-(doc, term) frequency table — the inverted-index base both
    * [[tfidfTopTerms]] and corpus-labeling consumers (topic maps)
    * aggregate from. */
  def termTf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.words(col(textCol))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"))

  /** Corpus document frequency per term (distinct-doc presence) —
    * the idf denominator. */
  def termDf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    termTf(docs, idCol, textCol).groupBy("term")
      .agg(count(lit(1)).cast("double").as("df"))

  /** Per-document top TF-IDF terms — the corpus-keyword profile used
    * for topic audits and cluster labeling. Returns
    * (doc_id, term, rank) for each document's `perDoc` highest-scoring
    * terms; smoothed idf = ln(N / df) over DISTINCT term presence.
    * Same inverted-index shape as [[bm25TopK]] but over the full
    * vocabulary: tf and df are partial-combine aggregates and the
    * per-doc ranking is a bounded window over each doc's own distinct
    * terms (vocabulary-sized, not corpus-sized). The tf table is
    * pinned — it feeds both the df aggregate and the scoring join. */
  def tfidfTopTerms(
      docs: DataFrame, idCol: String, textCol: String,
      perDoc: Int): DataFrame = {

    val tf = termTf(docs, idCol, textCol).localCheckpoint(false)
    val n = docs.select(col(idCol)).agg(count(lit(1)).cast("double").as("n_docs"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(desc("__score"), col("term"))
    // No broadcast hint on dfreq: the vocabulary grows with the corpus
    // (URLs, typos, code tokens), so at web scale the df aggregate can
    // exceed the broadcast cap / driver heap. Both sides are term-keyed,
    // so this is one shuffle join on `term`; AQE still converts it to a
    // broadcast join at runtime whenever the vocab is actually small.
    // (bm25TopK is different: its df table is pre-filtered to the query
    // terms, so broadcasting there is bounded and correct.)
    tf.join(dfreq, Seq("term")).crossJoin(broadcast(n))
      .withColumn("__score", col("tf") * log(col("n_docs") / col("df")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= perDoc)
      .select(col("doc_id"), col("term"), col("rank"))
  }
}
