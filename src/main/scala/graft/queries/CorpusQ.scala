package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Text
import graft.operators.{Contamination, Dedup, Graph, Sampling}
import Q._

/** The flagship LLM-corpus preparation pipeline as ONE dataflow:
  * quality gate → exact dedup → MinHash/LSH near-dup pruning →
  * split assignment. Each stage is individually oracled elsewhere
  * (`t_quality`, `d_exact`, `d_neardup`, `t_split`); this query checks
  * that they COMPOSE — the end-to-end shape a 100 TB data-prep job
  * actually runs.
  *
  * Scale design, stage by stage:
  *  - the quality gate is one map-side projection+filter (no shuffle)
  *    and runs FIRST, so every downstream shuffle moves only surviving
  *    docs;
  *  - the gate itself is integer-exact: `quality >= 0.5` is evaluated
  *    by cross-multiplication over BIGINT token/char counts, never by
  *    comparing a computed double against a threshold (a doc landing
  *    bitwise-differently on the boundary would flip membership — the
  *    float-tie trap, see verify SKILL.md);
  *  - exact dedup is groupBy(md5) → min(id) → left-semi join back on
  *    id: the aggregate shuffles (hash, id) pairs only — NOT a window
  *    over md5(text), which would shuffle the full text payload;
  *  - near-dup pruning reuses [[Dedup.nearDuplicates]] (cached gram
  *    table, banded LSH with bucket cap, codegen'd verify) on the
  *    survivors; the greedy keep-smallest-id rule drops any doc that
  *    appears as the larger side of a verified pair — deterministic
  *    and engine-portable;
  *  - the split keys off the content fingerprint, so the assignment
  *    is stable under re-sharding and dedup-order changes.
  */
object CorpusQ {

  private val EnStop = Seq("the", "a", "of", "and", "to", "in", "is")

  val queries: Map[String, QueryFn] = Map(
    "c_corpus" -> ((s, dir) => {
      val t = Text.normalizeAz(col("text"))
      val toks = Text.tokens(t)
      val base = documents(s, dir).select(
        col("doc_id"), col("lang"), col("text"), t.as("t"),
        length(col("text")).cast("long").as("len_raw"),
        length(t).cast("long").as("len_norm"),
        size(toks).cast("long").as("n"),
        Text.countTokensIn(toks, EnStop).cast("long").as("st"))

      // quality >= 0.5 without touching a double:
      //   least(1, n/50) * (len_norm/len_raw) * ((2*st + n) / (2*n)) >= 1/2
      // ⟺ len_norm * (2*st + n) >= greatest(n, 50) * len_raw
      val gated = base.filter(
        col("len_norm") * (col("st") * 2 + col("n")) >=
          greatest(col("n"), lit(50L)) * col("len_raw"))

      // Exact dedup, deterministic keeper: the aggregate output is
      // (content_hash, keeper_id) — tiny — and the semi join restores
      // the full surviving rows without ever shuffling text on md5.
      val keepIds = gated
        .groupBy(md5(col("text")).as("__h"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val keepers = gated.join(keepIds, Seq("doc_id"), "left_semi")

      // Near-dup pruning on the survivors (threshold/bands = d_neardup):
      // drop the larger id of every verified pair.
      val dupIds = Dedup
        .nearDuplicates(keepers, "doc_id", "text",
          threshold = 0.6, bandRows = 6)
        .select(col("doc_b").as("doc_id")).distinct()
      val fin = keepers.join(dupIds, Seq("doc_id"), "left_anti")

      val nonAz =
        (col("len_raw") - col("len_norm")).cast("double") / col("len_raw")
      val stop = col("st").cast("double") / col("n")
      val (_, split) = Sampling.hashSplit(Text.polyHash(col("t")))
      fin.select(
        col("doc_id"), col("lang"),
        col("n").as("n_tokens"),
        r6(least(lit(1.0), col("n") / lit(50.0)) *
          (lit(1.0) - nonAz) * (lit(0.5) + stop)).as("quality"),
        split.as("split"))
    }),

    // Duplicate-CLUSTER resolution: near-dup pairs (same params as
    // d_neardup) closed under transitivity by large-star/small-star
    // connected components. The oracle mirrors with a recursive-CTE
    // closure — feasible only at oracle scale; the Spark side is the
    // O(log n)-round contraction that works on billions of edges.
    "d_components" -> ((s, dir) =>
      Graph.dupClusters(documents(s, dir), "doc_id", "text",
        threshold = 0.6, bandRows = 6)),

    // Benchmark decontamination: every 50th doc stands in for the eval
    // set; train docs sharing any token 5-gram with it are flagged.
    "d_contamination" -> ((s, dir) => {
      val d = documents(s, dir)
      Contamination.flagContaminated(
        d.filter(col("doc_id") % 50 =!= 0),
        d.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 5)
    }),

    // Segment-level dedup with reassembly (CCNet-style paragraph
    // dedup; segments here are fixed 10-token windows since the
    // synthetic docs carry no newlines). First corpus-wide occurrence
    // of a segment survives; docs are rebuilt in original order.
    "d_segdedup" -> ((s, dir) => {
      // tokens bound to a column first: slice(toks, i, 10) inside the
      // indexed lambda would re-evaluate the tokenize tree per segment
      // index otherwise (interpreted-HOF trap)
      val d = documents(s, dir).withColumn("__toks",
        Text.tokens(Text.normalizeAz(col("text"))))
      val t = col("__toks")
      val segs = when(size(t) > 0,
        transform(sequence(lit(1), size(t), lit(10)),
          i => concat_ws(" ", slice(t, i, lit(10)))))
        .otherwise(typedLit(Seq.empty[String]))
      Dedup.segmentDedup(d, "doc_id", segs)
    }),

    // Corpus-wide heavy hitters: top-20 token bigrams by DOCUMENT
    // frequency (distinct per doc), deterministic tie-break on the
    // gram itself so the limit boundary is engine-portable.
    "t_topngrams" -> ((s, dir) =>
      documents(s, dir)
        .select(Text.tokens(Text.normalizeAz(col("text"))).as("__toks"))
        .select(explode(Contamination.tokenNgramsOf(col("__toks"), 2))
          .as("gram"))
        .groupBy("gram").agg(count(lit(1)).as("n_docs"))
        .orderBy(col("n_docs").desc, col("gram"))
        .limit(20)),

    // Bottom-k priority sampling: the k docs with the smallest content
    // -hash priorities — a deterministic uniform sample that is
    // MERGEABLE (each partition keeps its local bottom-k, the reduce
    // merges; Spark's orderBy+limit executes exactly that TakeOrdered
    // plan). The scale-path way to sample 100 TB without a shuffle of
    // everything: only k rows per partition move.
    "t_bottomk" -> ((s, dir) =>
      documents(s, dir)
        .select(col("doc_id"),
          Text.polyHash(Text.normalizeAz(col("text"))).as("pri"))
        .orderBy(col("pri"), col("doc_id"))
        .limit(50)),

    // Temperature mixture sampling: sqrt-flattened language shares,
    // keep decision = integer hash threshold (see
    // Sampling.temperatureMixture for the bitwise-portability design).
    "t_mixture" -> ((s, dir) =>
      Sampling.temperatureMixture(documents(s, dir), "lang",
          Text.polyHash(Text.normalizeAz(col("text"))), budgetFrac = 0.5)
        .select(col("doc_id"), col("lang"), col("rate_ppm"), col("kept"))),

    // TF-IDF over the token stream. tf/df are exact integers; the
    // ln(N/df) factor is transcendental, hence never ON a rounding
    // tick — r6 is safe (audited: min tick distance >> cross-engine
    // libm drift).
    "t_tfidf" -> ((s, dir) => {
      val d = documents(s, dir)
      // cached: tf feeds both the df aggregation and the join's left
      // side; no subtree reuse across them otherwise (see t_commonness)
      val tf = d.select(col("doc_id"),
          explode(Text.tokens(Text.normalizeAz(col("text")))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .cache()
      // dfreq is one row per DISTINCT TERM — unbounded at corpus scale
      // (noise vocabulary reaches 1e8+), so no broadcast hint: tf is
      // already keyed by term and the shuffle join is the right shape.
      // Only the 1-row global count broadcasts.
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = d.agg(count(lit(1)).as("__N"))
      tf.join(dfreq, "term").crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          r6(col("tf") * log(col("__N").cast("double") / col("df"))).as("tfidf"))
    }),

    // Keyphrase extraction: top-3 terms per doc. The RANKING is the
    // total integer order (tf DESC, df ASC, term) — "frequent here,
    // rare in the corpus" — never the float tfidf, whose ulp-close
    // ranks could flip across engines (portability trap #5 class);
    // the tfidf score is emitted as a column (r6 single-ln, the
    // audited t_tfidf class) but does not order anything.
    "t_keyphrase" -> ((s, dir) => {
      val d = documents(s, dir)
      val tf = d.select(col("doc_id"),
          explode(Text.tokens(Text.normalizeAz(col("text")))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .cache() // feeds df agg AND the join left side (t_tfidf precedent)
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = d.agg(count(lit(1)).as("__N"))
      val wD = Window.partitionBy("doc_id")
        .orderBy(col("tf").desc, col("df"), col("term"))
      tf.join(dfreq, "term").crossJoin(broadcast(n))
        .withColumn("keyword_rank", row_number().over(wD).cast("long"))
        .filter(col("keyword_rank") <= 3)
        .select(col("doc_id"), col("keyword_rank"), col("term"), col("tf"),
          col("df"),
          r6(col("tf") * log(col("__N").cast("double") / col("df"))).as("tfidf"))
    }),

    // M15/net-new: term co-occurrence pair counts — the raw statistic
    // behind word-vector training (GloVe counts, word2vec negative
    // sampling tables) and collocation mining. Shape: distinct
    // (doc, term) pairs, hub terms dropped by a RELATIVE df cap
    // (df·10 ≤ N·9: terms in > 90% of docs are stopword-class — the
    // synthetic corpus's shared vocabulary is deliberately dense — and
    // would dominate the pair fan-out), then a per-doc self-join with
    // t1 < t2. At 100 TB the fan-out per doc is (distinct kept terms)²
    // — bounded by doc length and the df cap, and keyed on doc_id so
    // it partitions cleanly; the df table is tiny and broadcast. All
    // counts are exact BIGINTs.
    "m15_cooccur" -> ((s, dir) => {
      val dt = documents(s, dir).select(col("doc_id"),
        explode(array_distinct(Text.tokens(Text.normalizeAz(col("text")))))
          .as("term"))
      val dfreq = dt.groupBy("term").agg(count(lit(1)).as("df"))
      val n = documents(s, dir).agg(count(lit(1)).as("__N"))
      val kept = dt.join(
        broadcast(dfreq.crossJoin(broadcast(n))
          .filter(col("df") * 10 <= col("__N") * 9).select("term")),
        "term")
      val a = kept.select(col("doc_id"), col("term").as("t1"))
      val b = kept.select(col("doc_id"), col("term").as("t2"))
      a.join(b, "doc_id").filter(col("t1") < col("t2"))
        .groupBy("t1", "t2").agg(count(lit(1)).as("cooc"))
        .filter(col("cooc") >= 5)
    }),

    // Inverted-index build: per term, document frequency + the first
    // 50 postings "doc:tf" in doc order. The cap is applied BEFORE
    // any collect: a row_number window ranks postings per term and
    // only rn<=50 survivors reach the collect_list, so the agg
    // buffer holds at most 50 structs even for a stopword-grade term
    // (df = corpus size). The full per-term sort happens in the
    // window operator, which is a spillable external sort — not an
    // in-memory aggregation buffer. df is a count over the SAME
    // term-partitioned window (shared exchange, and the final
    // groupBy(term) reuses that hash partitioning — one shuffle
    // total), so df still carries the TRUE total, not the capped one
    // (no silent caps rule).
    "t_postings" -> ((s, dir) => {
      val tf = documents(s, dir).select(col("doc_id"),
          explode(Text.tokens(Text.normalizeAz(col("text")))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val byTerm = Window.partitionBy("term")
      tf.withColumn("df", count(lit(1)).over(byTerm))
        .withColumn("rn", row_number().over(byTerm.orderBy("doc_id")))
        .filter(col("rn") <= 50)
        .groupBy("term").agg(
          max("df").as("df"),
          array_join(
            transform(
              array_sort(collect_list(struct(col("doc_id"), col("tf")))),
              s => concat_ws(":", s.getField("doc_id"), s.getField("tf"))),
            " ").as("postings"))
    }),

    // Tokenizer-vocabulary build: top-V tokens by corpus frequency
    // with dense ids, ties broken lexicographically so the id
    // assignment is total-order deterministic. Ranks run on the
    // AGGREGATED vocab through DistRank's bucketed two-pass — a real
    // corpus vocabulary is millions of types, too big for the old
    // single-task row_number window.
    "t_vocab" -> ((s, dir) => {
      val counts = documents(s, dir)
        .select(explode(Text.tokens(Text.normalizeAz(col("text"))))
          .as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
      graft.operators.DistRank.rowNumber(counts, -col("n"),
          Seq(col("n").desc, col("token")), "token_id")
        .filter(col("token_id") <= 200)
        .select(col("token"), col("n"), col("token_id"))
    }),

    // CCNet-style frequency scoring: per doc, the mean corpus
    // frequency of its tokens (common-token docs score high, rare
    // -token docs low — the cheap unigram-LM quality proxy). All
    // counts are exact integers; the score is ONE division of exact
    // BIGINTs → bitwise portable, emitted raw. Token streams are
    // compressed to (doc, token, cnt) before any join.
    "t_commonness" -> ((s, dir) => {
      // cached: dt feeds BOTH sides of the frequency join and the
      // planner does not reuse the explode+agg subtree across them —
      // without the cache the tokenize/explode (the expensive pass at
      // corpus scale) would run twice (same reasoning as the shared
      // gram table in Dedup.nearDuplicates).
      val dt = documents(s, dir)
        .select(col("doc_id"),
          explode(Text.tokens(Text.normalizeAz(col("text")))).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
        .cache()
      val freq = dt.groupBy("token").agg(sum("cnt").as("freq"))
      dt.join(freq, "token")
        .groupBy("doc_id")
        .agg(sum(col("cnt")).as("n_tokens"),
          sum(col("cnt") * col("freq")).as("sum_freq"))
        .withColumn("commonness",
          col("sum_freq").cast("double") / col("n_tokens").cast("double"))
    }),

    // Token-distribution entropy per doc (diversity filter: repeated
    // -token spam scores near 0, varied text near ln(n_distinct)).
    // Decomposed as H = ln(n) − Σ cnt·ln(cnt) / n over EXACT integer
    // counts: ln of integers is transcendental (never on a rounding
    // tick) and the summed terms are same-signed (no cancellation
    // amplification) — r6 absorbs cross-engine libm/order noise, the
    // t_tfidf precedent.
    "t_entropy" -> ((s, dir) => {
      val dt = documents(s, dir)
        .select(col("doc_id"),
          explode(Text.tokens(Text.normalizeAz(col("text")))).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
      dt.groupBy("doc_id")
        .agg(sum(col("cnt")).as("n"),
          sum(col("cnt").cast("double") * log(col("cnt").cast("double")))
            .as("s"))
        .select(col("doc_id"), col("n"),
          r6(log(col("n").cast("double")) -
            col("s") / col("n").cast("double")).as("entropy"))
    }),

    // Feature hashing (the "hashing trick"): tokens → fixed D-dim
    // sparse count vectors via the engine-portable poly-hash mod D —
    // no vocabulary pass, no fit, memory O(D) per doc. Output is the
    // sparse COO form (doc, idx, cnt); map-side except the final
    // (doc, idx) count shuffle.
    "t_feathash" -> ((s, dir) =>
      documents(s, dir)
        .select(col("doc_id"),
          explode(Text.tokens(Text.normalizeAz(col("text")))).as("token"))
        .select(col("doc_id"),
          pmod(Text.polyHash(col("token")), lit(64L)).as("idx"))
        .groupBy("doc_id", "idx").agg(count(lit(1)).as("cnt"))))

  // Mirrors LlmQ's CTE builders over the pipeline's intermediate sets
  // (those constants are hard-wired to `FROM documents`; the pipeline
  // needs them over `keep1`).
  private val P = Text.P
  private val NormSql = "regexp_replace(lower(text), '[^a-z ]', '', 'g')"
  private val ToksSql = "list_filter(string_split(t, ' '), w -> length(w) > 0)"
  private def foldSql(e: String) =
    s"""CASE WHEN length($e) > 0 THEN list_reduce(
       | list_prepend(0::BIGINT, list_transform(range(1, length($e) + 1),
       |   j -> ascii(substr($e, j::INT, 1))::BIGINT)),
       | (a, b) -> (a * 31 + b) % $P) ELSE 0 END""".stripMargin
  private val GramsSql =
    s"""list_distinct(list_transform(
       | CASE WHEN length(t) >= 3
       |  THEN list_transform(range(1, length(t) - 1), i -> substr(t, i::INT, 3))
       |  ELSE [] END,
       | s -> list_reduce(list_transform(range(1, 4), j -> ascii(substr(s, j::INT, 1))::BIGINT),
       |   (a, b) -> (a * 31 + b) % $P)))""".stripMargin
  private def slotSql(k: Int): String = {
    val (a, b) = Dedup.seeds(k)
    s"coalesce(list_min(list_transform(grams, h -> ($a::BIGINT * h + $b) % $P)), $P)"
  }

  private val TokCte =
    s"""norm AS (SELECT doc_id, $NormSql AS t FROM documents),
       |tok AS (SELECT doc_id, $ToksSql AS toks FROM norm)""".stripMargin
  /** Distinct space-joined token n-grams from a `toks` list column. */
  private def tokenGramsSql(n: Int): String =
    if (n == 2)
      """list_distinct(CASE WHEN len(toks) >= 2
        | THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        | ELSE [] END)""".stripMargin
    else
      s"""list_distinct(CASE WHEN len(toks) >= $n
         | THEN list_transform(range(1, len(toks) - ${n - 2}),
         |   i -> array_to_string(list_slice(toks, i, i + ${n - 1}), ' '))
         | ELSE [] END)""".stripMargin

  val oracle: Map[String, String] = Map(
    "d_contamination" ->
      s"""WITH $TokCte,
         |g AS (SELECT doc_id, ${tokenGramsSql(5)} AS grams FROM tok),
         |bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0),
         |tg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 50 <> 0),
         |hits AS (SELECT doc_id, count(*)::BIGINT AS n_hits
         | FROM tg JOIN bg USING (gram) GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(h.n_hits, 0::BIGINT) AS n_hits,
         | coalesce(h.n_hits, 0) > 0 AS contaminated
         |FROM (SELECT doc_id FROM norm WHERE doc_id % 50 <> 0) d
         |LEFT JOIN hits h USING (doc_id)""".stripMargin,

    "d_segdedup" ->
      s"""WITH $TokCte,
         |seg AS (SELECT doc_id, CASE WHEN len(toks) > 0
         |  THEN list_transform(range(1, len(toks) + 1, 10),
         |    i -> array_to_string(list_slice(toks, i, i + 9), ' '))
         |  ELSE [] END AS parts FROM tok),
         |p0 AS (SELECT doc_id, unnest(list_transform(range(1, len(parts) + 1),
         |  i -> {'pos': i, 'seg': parts[i]})) AS s FROM seg),
         |p AS (SELECT doc_id, s.pos AS pos, s.seg AS seg FROM p0),
         |r AS (SELECT doc_id, pos, seg,
         |  row_number() OVER (PARTITION BY md5(seg) ORDER BY doc_id, pos) AS rn FROM p),
         |keep AS (SELECT doc_id, pos, seg FROM r WHERE rn = 1),
         |agg AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
         |  string_agg(seg, ' ' ORDER BY pos) AS text_dedup
         | FROM keep GROUP BY doc_id)
         |SELECT s.doc_id, len(parts)::BIGINT AS n_segments,
         | coalesce(a.n_kept, 0::BIGINT) AS n_kept,
         | coalesce(a.text_dedup, '') AS text_dedup
         |FROM seg s LEFT JOIN agg a USING (doc_id)""".stripMargin,

    "t_topngrams" ->
      s"""WITH $TokCte,
         |g AS (SELECT doc_id, ${tokenGramsSql(2)} AS grams FROM tok),
         |e AS (SELECT doc_id, unnest(grams) AS gram FROM g)
         |SELECT gram, count(*)::BIGINT AS n_docs FROM e
         |GROUP BY gram ORDER BY n_docs DESC, gram LIMIT 20""".stripMargin,

    "t_bottomk" ->
      s"""WITH p AS (SELECT doc_id, ${foldSql("t")} AS pri
         |  FROM (SELECT doc_id, $NormSql AS t FROM documents))
         |SELECT doc_id, pri FROM p ORDER BY pri, doc_id LIMIT 50""".stripMargin,

    "t_mixture" ->
      s"""WITH counts AS (SELECT lang, count(*)::BIGINT AS n_g FROM documents GROUP BY lang),
         |z AS (SELECT sum(n_g)::BIGINT AS n_total,
         |  list_reduce(list_prepend(0.0,
         |    list_transform(list(n_g ORDER BY lang NULLS FIRST), x -> sqrt(x::DOUBLE))),
         |    (a, b) -> a + b) AS z
         | FROM counts),
         |rates AS (SELECT lang,
         |  floor(least(1.0, ((0.5 * n_total) * (sqrt(n_g::DOUBLE) / z)) / n_g)
         |    * 1000000.0)::BIGINT AS rate_ppm
         | FROM counts, z),
         |norm AS (SELECT doc_id, lang, $NormSql AS t FROM documents)
         |SELECT doc_id, norm.lang, rate_ppm,
         | (${foldSql("t")} % 1000000) < rate_ppm AS kept
         |FROM norm JOIN rates ON norm.lang IS NOT DISTINCT FROM rates.lang""".stripMargin,

    "t_tfidf" ->
      s"""WITH $TokCte,
         |e AS (SELECT doc_id, unnest(toks) AS term FROM tok),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM e GROUP BY doc_id, term),
         |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
         |n AS (SELECT count(*)::BIGINT AS N FROM documents)
         |SELECT doc_id, term, tf, df,
         | round(tf * ln(N::DOUBLE / df), 6) AS tfidf
         |FROM tf JOIN df USING (term), n""".stripMargin,

    "t_keyphrase" ->
      s"""WITH $TokCte,
         |e AS (SELECT doc_id, unnest(toks) AS term FROM tok),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM e GROUP BY doc_id, term),
         |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
         |n AS (SELECT count(*)::BIGINT AS N FROM documents),
         |r AS (SELECT doc_id, term, tf, df, N,
         |  row_number() OVER (PARTITION BY doc_id
         |    ORDER BY tf DESC, df, term)::BIGINT AS keyword_rank
         | FROM tf JOIN df USING (term), n)
         |SELECT doc_id, keyword_rank, term, tf, df,
         | round(tf * ln(N::DOUBLE / df), 6) AS tfidf
         |FROM r WHERE keyword_rank <= 3""".stripMargin,

    "m15_cooccur" ->
      s"""WITH $TokCte,
         |dt AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM tok),
         |df AS (SELECT term, count(*)::BIGINT AS df FROM dt GROUP BY term),
         |n AS (SELECT count(*)::BIGINT AS N FROM documents),
         |kept AS (SELECT dt.doc_id, dt.term
         |  FROM dt JOIN df USING (term), n WHERE df * 10 <= N * 9)
         |SELECT a.term AS t1, b.term AS t2, count(*)::BIGINT AS cooc
         |FROM kept a JOIN kept b ON a.doc_id = b.doc_id
         |WHERE a.term < b.term
         |GROUP BY a.term, b.term HAVING count(*) >= 5""".stripMargin,

    "t_postings" ->
      s"""WITH $TokCte,
         |e AS (SELECT doc_id, unnest(toks) AS term FROM tok),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM e GROUP BY doc_id, term)
         |SELECT term, count(*)::BIGINT AS df,
         | array_to_string(list_transform(
         |   list_slice(list({'d': doc_id, 'f': tf} ORDER BY doc_id), 1, 50),
         |   s -> s.d::VARCHAR || ':' || s.f::VARCHAR), ' ') AS postings
         |FROM tf GROUP BY term""".stripMargin,

    "t_vocab" ->
      s"""WITH $TokCte,
         |e AS (SELECT unnest(toks) AS token FROM tok),
         |c AS (SELECT token, count(*)::BIGINT AS n FROM e GROUP BY token),
         |r AS (SELECT token, n,
         |  row_number() OVER (ORDER BY n DESC, token)::BIGINT AS token_id
         | FROM c)
         |SELECT token, n, token_id FROM r WHERE token_id <= 200""".stripMargin,

    "t_entropy" ->
      s"""WITH $TokCte,
         |e AS (SELECT doc_id, unnest(toks) AS token FROM tok),
         |dt AS (SELECT doc_id, token, count(*)::BIGINT AS cnt
         |  FROM e GROUP BY doc_id, token),
         |a AS (SELECT doc_id, sum(cnt)::BIGINT AS n,
         |  sum(cnt::DOUBLE * ln(cnt::DOUBLE)) AS s
         | FROM dt GROUP BY doc_id)
         |SELECT doc_id, n, round(ln(n::DOUBLE) - s / n::DOUBLE, 6) AS entropy
         |FROM a""".stripMargin,

    "t_feathash" ->
      s"""WITH $TokCte,
         |e AS (SELECT doc_id, unnest(toks) AS token FROM tok),
         |h AS (SELECT doc_id, (${foldSql("token")}) % 64 AS idx FROM e)
         |SELECT doc_id, idx, count(*)::BIGINT AS cnt
         |FROM h GROUP BY doc_id, idx""".stripMargin,

    "t_commonness" ->
      s"""WITH $TokCte,
         |e AS (SELECT doc_id, unnest(toks) AS token FROM tok),
         |dt AS (SELECT doc_id, token, count(*)::BIGINT AS cnt
         |  FROM e GROUP BY doc_id, token),
         |f AS (SELECT token, sum(cnt)::BIGINT AS freq FROM dt GROUP BY token),
         |a AS (SELECT doc_id, sum(cnt)::BIGINT AS n_tokens,
         |  sum(cnt * freq)::BIGINT AS sum_freq
         | FROM dt JOIN f USING (token) GROUP BY doc_id)
         |SELECT doc_id, n_tokens, sum_freq,
         | (sum_freq::DOUBLE) / (n_tokens::DOUBLE) AS commonness
         |FROM a""".stripMargin,

    "d_components" ->
      s"""WITH RECURSIVE
         |norm AS (SELECT doc_id, $NormSql AS t FROM documents),
         |g AS (SELECT doc_id, $GramsSql AS grams FROM norm),
         |sig AS (SELECT doc_id, ${(0 until 12).map(k => s"${slotSql(k)} AS m$k").mkString(", ")}
         | FROM g WHERE len(grams) > 0),
         |bands AS (
         | SELECT doc_id, 0 AS band,
         |  m0::VARCHAR || '_' || m1::VARCHAR || '_' || m2::VARCHAR || '_' ||
         |  m3::VARCHAR || '_' || m4::VARCHAR || '_' || m5::VARCHAR AS bk FROM sig
         | UNION ALL
         | SELECT doc_id, 1 AS band,
         |  m6::VARCHAR || '_' || m7::VARCHAR || '_' || m8::VARCHAR || '_' ||
         |  m9::VARCHAR || '_' || m10::VARCHAR || '_' || m11::VARCHAR AS bk FROM sig),
         |small AS (SELECT band, bk FROM bands GROUP BY band, bk HAVING count(*) <= 1000),
         |kept AS (SELECT bands.* FROM bands JOIN small USING (band, bk)),
         |cands0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS nb
         | FROM kept a JOIN kept b ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
         | GROUP BY a.doc_id, b.doc_id),
         |cands AS (SELECT doc_a, doc_b FROM (
         | SELECT doc_a, doc_b,
         |  row_number() OVER (PARTITION BY doc_a ORDER BY nb DESC, doc_b) AS rn
         | FROM cands0) WHERE rn <= 64),
         |ver AS (SELECT doc_a, doc_b FROM cands
         | JOIN g a ON cands.doc_a = a.doc_id JOIN g b ON cands.doc_b = b.doc_id
         | WHERE CASE WHEN len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) > 0
         |  THEN len(list_intersect(a.grams, b.grams))::DOUBLE /
         |       (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
         |  ELSE 0.0 END >= 0.6),
         |sym AS (SELECT doc_a AS a, doc_b AS b FROM ver
         | UNION SELECT doc_b, doc_a FROM ver),
         |r AS (SELECT a, b FROM sym
         | UNION SELECT r.a, s.b FROM r JOIN sym s ON r.b = s.a AND s.b <> r.a),
         |comp AS (SELECT a AS node, least(a, min(b)) AS component FROM r GROUP BY a),
         |lab AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster_rep
         | FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
         |sz AS (SELECT cluster_rep, count(*)::BIGINT AS cluster_size
         | FROM lab GROUP BY cluster_rep)
         |SELECT doc_id, cluster_rep, cluster_size FROM lab JOIN sz USING (cluster_rep)""".stripMargin,

    "c_corpus" ->
      s"""WITH b AS (SELECT doc_id, lang, text, $NormSql AS t FROM documents),
         |m AS (SELECT doc_id, lang, text, t,
         |  length(text)::BIGINT AS len_raw, length(t)::BIGINT AS len_norm,
         |  len($ToksSql)::BIGINT AS n,
         |  len(list_filter($ToksSql, w -> list_contains(['the','a','of','and','to','in','is'], w)))::BIGINT AS st
         | FROM b),
         |gated AS (SELECT * FROM m
         | WHERE len_norm * (2*st + n) >= greatest(n, 50) * len_raw),
         |keep1 AS (SELECT g.* FROM gated g JOIN
         |  (SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)) k
         |  USING (doc_id)),
         |gs AS (SELECT doc_id, $GramsSql AS grams FROM keep1),
         |sig AS (SELECT doc_id, ${(0 until 12).map(k => s"${slotSql(k)} AS m$k").mkString(", ")}
         | FROM gs WHERE len(grams) > 0),
         |bands AS (
         | SELECT doc_id, 0 AS band,
         |  m0::VARCHAR || '_' || m1::VARCHAR || '_' || m2::VARCHAR || '_' ||
         |  m3::VARCHAR || '_' || m4::VARCHAR || '_' || m5::VARCHAR AS bk FROM sig
         | UNION ALL
         | SELECT doc_id, 1 AS band,
         |  m6::VARCHAR || '_' || m7::VARCHAR || '_' || m8::VARCHAR || '_' ||
         |  m9::VARCHAR || '_' || m10::VARCHAR || '_' || m11::VARCHAR AS bk FROM sig),
         |small AS (SELECT band, bk FROM bands GROUP BY band, bk HAVING count(*) <= 1000),
         |kept AS (SELECT bands.* FROM bands JOIN small USING (band, bk)),
         |cands0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS nb
         | FROM kept a JOIN kept b ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
         | GROUP BY a.doc_id, b.doc_id),
         |cands AS (SELECT doc_a, doc_b FROM (
         | SELECT doc_a, doc_b,
         |  row_number() OVER (PARTITION BY doc_a ORDER BY nb DESC, doc_b) AS rn
         | FROM cands0) WHERE rn <= 64),
         |ver AS (SELECT doc_a, doc_b FROM cands
         | JOIN gs a ON cands.doc_a = a.doc_id JOIN gs b ON cands.doc_b = b.doc_id
         | WHERE CASE WHEN len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) > 0
         |  THEN len(list_intersect(a.grams, b.grams))::DOUBLE /
         |       (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
         |  ELSE 0.0 END >= 0.6)
         |SELECT doc_id, lang, n AS n_tokens,
         | round(least(1.0, n / 50.0) * (1.0 - (len_raw - len_norm)::DOUBLE / len_raw)
         |   * (0.5 + st::DOUBLE / n), 6) AS quality,
         | CASE WHEN ${foldSql("t")} % 100 < 80 THEN 'train'
         |      WHEN ${foldSql("t")} % 100 < 90 THEN 'val'
         |      ELSE 'test' END AS split
         |FROM keep1
         |WHERE doc_id NOT IN (SELECT doc_b FROM ver)""".stripMargin)
}
