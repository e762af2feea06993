package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text
import Q._

/** Training-data curation operators, round 5: contrastive negative
  * sampling, sub-document containment detection, feature information
  * gain, and distribution-drift (Jensen-Shannon) terms. Net-new vs the
  * reference (nothing in `main_cuda.py` curates a corpus); these are
  * the curation steps an LLM data pipeline runs between dedup and
  * packing.
  *
  * Engine-portability: every hash is the shared polynomial hash
  * (`Text.polyHash` ↔ the list_reduce fold in SQL), every keep/flag
  * decision is integer-decided, and every emitted float is either an
  * exact division of BIGINTs or a single-ln term rounded at 6
  * (ORACLE_NOTES rules 1 and 3; the PSI/PMI-proven pattern).
  */
object CurationQ {

  val queries: Map[String, QueryFn] = Map(

    // Deterministic in-shard negative sampling for contrastive
    // training: order docs on a content-hash ring inside each shard,
    // take the next k ring neighbors as negatives. Hash-ring order is
    // content-deterministic (rerun/engine-stable, unlike rand()), and
    // ring neighbors under a content hash are an unbiased draw w.r.t.
    // semantics. Scale: the ring lives INSIDE each of the 8 shards —
    // the window and the self-join both hash-partition on the shard
    // key, so no global sort and no single-partition window at 100 TB;
    // shard count scales with the cluster, ring quality is unaffected.
    "t_negsample" -> ((s, dir) => {
      val d = documents(s, dir).select(col("doc_id"),
        Text.polyHash(Text.normalizeAz(col("text"))).as("h"))
      val ring = d.withColumn("shard", pmod(col("h"), lit(8L)))
        .withColumn("rn", row_number().over(
          Window.partitionBy("shard").orderBy("h", "doc_id")).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("shard")))
      val wanted = ring
        .withColumn("k", explode(sequence(lit(1L), lit(3L))))
        .withColumn("trn", (col("rn") - 1 + col("k")) % col("n") + 1)
      val target = ring.select(col("shard").as("shard2"),
        col("rn").as("rn2"), col("doc_id").as("neg_id"))
      wanted.join(target,
          col("shard") === col("shard2") && col("trn") === col("rn2"))
        .filter(col("neg_id") =!= col("doc_id"))
        .select(col("doc_id"), col("k").as("neg_rank"), col("neg_id"))
    }),

    // Sub-document containment: one-sided |A∩B| / |A| over distinct
    // character 3-gram sets — catches A being mostly embedded in B
    // (quote farms, boilerplate wrappers), which symmetric Jaccard
    // misses when |B| >> |A|. Adjacent-id pairs isolate the kernel
    // (the production pairing is any capped blocking from the d_*
    // family). The is_subdup flag clears floats entirely:
    // 10·|A∩B| ≥ 8·|A| over BIGINTs.
    "d_contain" -> ((s, dir) => {
      val d = documents(s, dir).select(col("doc_id"),
        array_distinct(Text.charNgrams(Text.normalizeAz(col("text")), 3))
          .as("g"))
      val a = d.select(col("doc_id").as("doc_a"), col("g").as("ga"))
      val b = d.select((col("doc_id") - 1).as("doc_a"),
        col("doc_id").as("doc_b"), col("g").as("gb"))
      val common = size(array_intersect(col("ga"), col("gb"))).cast("long")
      val na = size(col("ga")).cast("long")
      a.join(b, "doc_a").select(
        col("doc_a"), col("doc_b"),
        common.as("n_common"), na.as("n_a"),
        r6(when(na > 0, common.cast("double") / na).otherwise(0.0))
          .as("containment"),
        (common * 10 >= na * 8 && na > 0).as("is_subdup"))
    }),

    // Information gain of a categorical feature w.r.t. a binary label
    // (the feature-selection screen of a training pipeline), emitted
    // as per-value conditional-entropy terms: -(n_pos/N)·ln(n_pos/n_f)
    // and the negative-class twin. All counts are exact BIGINTs from
    // ONE groupBy over the scan; each term is a single ln of an exact
    // rational (PSI/PMI pattern). The label is integer-decided
    // (balance cents ≥ 0). IG itself = H(label) − Σ terms — left to
    // the caller, keeping every hashed value single-ln.
    "m20_infogain" -> ((s, dir) => {
      val cents = round(col("c_acctbal") * 100).cast("long")
      val agg = customer(s, dir)
        .select(col("c_mktsegment").as("seg"), (cents >= 0).as("pos"))
        .groupBy("seg").agg(
          count(lit(1)).as("n_f"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
      val tot = agg.agg(sum("n_f").as("nn"))
      val nNeg = col("n_f") - col("n_pos")
      val term = (n: org.apache.spark.sql.Column) =>
        when(n > 0, r6(-(n.cast("double") / col("nn")) *
          log(n.cast("double") / col("n_f"))))
          .otherwise(lit(null).cast("double"))
      agg.crossJoin(broadcast(tot)).select(
        col("seg"), col("n_f"), col("n_pos"),
        term(col("n_pos")).as("h_pos_term"),
        term(nNeg).as("h_neg_term"))
    }),

    // Per-(source, lang) Jensen-Shannon divergence terms between each
    // source's language distribution p and the corpus distribution q —
    // the drift monitor a curation pipeline runs per ingest source.
    // Emitted as the two single-ln summands (0.5·p·ln(2p/(p+q)),
    // 0.5·q·ln(2q/(p+q))) per cell rather than the summed JSD: a
    // multi-term float sum is not engine-portable, its addends are.
    // All shuffles are on tiny aggregates; the grid is a broadcast
    // cross of two dimension aggregates.
    "a41_jsd" -> ((s, dir) => {
      val cells = documents(s, dir).groupBy("source", "lang")
        .agg(count(lit(1)).as("n_sl"))
      val srcTot = cells.groupBy("source").agg(sum("n_sl").as("n_s"))
      val langTot = cells.groupBy("lang").agg(sum("n_sl").as("n_l"))
      val tot = langTot.agg(sum("n_l").as("nn"))
      val grid = srcTot.crossJoin(broadcast(langTot))
        .crossJoin(broadcast(tot))
        .join(cells, Seq("source", "lang"), "left")
        .withColumn("n_sl", coalesce(col("n_sl"), lit(0L)))
      val p = col("n_sl").cast("double") / col("n_s")
      val q = col("n_l").cast("double") / col("nn")
      grid.select(col("source"), col("lang"), col("n_sl"),
        when(col("n_sl") > 0,
          r6(lit(0.5) * p * log(lit(2.0) * p / (p + q))))
          .otherwise(lit(null).cast("double")).as("jsd_term_p"),
        r6(lit(0.5) * q * log(lit(2.0) * q / (p + q))).as("jsd_term_q"))
    }))

  // ---- oracle SQL ----------------------------------------------------

  private val P = Text.P
  private val NormSql = "regexp_replace(lower(text), '[^a-z ]', '', 'g')"
  private val FoldSql =
    s"""CASE WHEN length(t) > 0 THEN list_reduce(
       | list_prepend(0::BIGINT, list_transform(range(1, length(t) + 1),
       |   j -> ascii(substr(t, j::INT, 1))::BIGINT)),
       | (a, b) -> (a * 31 + b) % $P) ELSE 0 END""".stripMargin
  private val Gram3Sql =
    """list_distinct(CASE WHEN length(t) >= 3
      | THEN list_transform(range(1, length(t) - 1), i -> substr(t, i::INT, 3))
      | ELSE [] END)""".stripMargin

  val oracle: Map[String, String] = Map(

    "t_negsample" ->
      s"""WITH d AS (SELECT doc_id, $FoldSql AS h
         |  FROM (SELECT doc_id, $NormSql AS t FROM documents)),
         |ring AS (SELECT doc_id, h, h % 8 AS shard,
         |  row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS rn,
         |  count(*) OVER (PARTITION BY h % 8) AS n
         | FROM d),
         |wanted AS (SELECT r.doc_id, r.shard, u.k::BIGINT AS k,
         |  (r.rn - 1 + u.k) % r.n + 1 AS trn
         | FROM ring r, (SELECT unnest([1, 2, 3]) AS k) u)
         |SELECT w.doc_id, w.k AS neg_rank, t.doc_id AS neg_id
         |FROM wanted w JOIN ring t ON t.shard = w.shard AND t.rn = w.trn
         |WHERE t.doc_id != w.doc_id""".stripMargin,

    "d_contain" ->
      s"""WITH gs AS (SELECT doc_id, $Gram3Sql AS g
         |  FROM (SELECT doc_id, $NormSql AS t FROM documents))
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         | len(list_intersect(a.g, b.g))::BIGINT AS n_common,
         | len(a.g)::BIGINT AS n_a,
         | round(CASE WHEN len(a.g) > 0
         |   THEN len(list_intersect(a.g, b.g))::DOUBLE / len(a.g)::BIGINT
         |   ELSE 0.0 END, 6) AS containment,
         | (len(list_intersect(a.g, b.g))::BIGINT * 10 >= len(a.g)::BIGINT * 8
         |   AND len(a.g) > 0) AS is_subdup
         |FROM gs a JOIN gs b ON b.doc_id = a.doc_id + 1""".stripMargin,

    "m20_infogain" ->
      """WITH agg AS (SELECT c_mktsegment AS seg,
        |  count(*) AS n_f,
        |  sum(CASE WHEN CAST(round(c_acctbal * 100) AS BIGINT) >= 0
        |      THEN 1 ELSE 0 END)::BIGINT AS n_pos
        | FROM customer GROUP BY 1),
        |tot AS (SELECT sum(n_f)::BIGINT AS nn FROM agg)
        |SELECT seg, n_f, n_pos,
        | CASE WHEN n_pos > 0 THEN
        |   round(-(n_pos::DOUBLE / nn) * ln(n_pos::DOUBLE / n_f), 6)
        | END AS h_pos_term,
        | CASE WHEN n_f - n_pos > 0 THEN
        |   round(-((n_f - n_pos)::DOUBLE / nn) * ln((n_f - n_pos)::DOUBLE / n_f), 6)
        | END AS h_neg_term
        |FROM agg, tot""".stripMargin,

    "a41_jsd" ->
      """WITH cells AS (SELECT source, lang, count(*) AS n_sl
        | FROM documents GROUP BY 1, 2),
        |src AS (SELECT source, sum(n_sl)::BIGINT AS n_s FROM cells GROUP BY 1),
        |lng AS (SELECT lang, sum(n_sl)::BIGINT AS n_l FROM cells GROUP BY 1),
        |tot AS (SELECT sum(n_l)::BIGINT AS nn FROM lng),
        |grid AS (SELECT s.source, l.lang, s.n_s, l.n_l, t.nn,
        |  coalesce(c.n_sl, 0)::BIGINT AS n_sl
        | FROM src s CROSS JOIN lng l CROSS JOIN tot t
        | LEFT JOIN cells c ON c.source = s.source AND c.lang = l.lang)
        |SELECT source, lang, n_sl,
        | CASE WHEN n_sl > 0 THEN
        |  round(0.5 * (n_sl::DOUBLE / n_s)
        |    * ln(2.0 * (n_sl::DOUBLE / n_s)
        |        / ((n_sl::DOUBLE / n_s) + (n_l::DOUBLE / nn))), 6)
        | END AS jsd_term_p,
        | round(0.5 * (n_l::DOUBLE / nn)
        |   * ln(2.0 * (n_l::DOUBLE / nn)
        |       / ((n_sl::DOUBLE / n_s) + (n_l::DOUBLE / nn))), 6) AS jsd_term_q
        |FROM grid""".stripMargin)
}
