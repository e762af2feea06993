package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.operators.DistRank
import Q._

/** Round-7 batch 36: the two-sample Cramér–von Mises test on
  * distributed ranks, content-defined chunking (the dedup-storage
  * boundary primitive), a naive-Bayes learning curve (sample-
  * efficiency measurement over nested train subsets), and odds
  * ratios with log-scale Katz confidence bounds. Net-new vs the
  * 368-query surface (grep-checked; "Cramer" in PipelineQ is
  * Cramer's RULE, a different thing).
  */
object Curation36Q {

  private val P = Text.P

  val queries: Map[String, QueryFn] = Map(

    // A76: two-sample Cramér–von Mises (rank form, Anderson 1962) —
    // the drift test that weighs the WHOLE CDF gap where KS (a35)
    // takes only the max. Samples: even- vs odd-user events on the
    // cent-value lattice, total-ordered by (value, event_id) so ranks
    // are exact integers (total-order variant, documented: midrank
    // ties are a different convention). The 100 TB shape: the
    // combined rank AND both within-sample indices come from ONE
    // global DistRank pass (per-sample index = combined-sample-
    // restricted cumsum), never a single-partition window. U's
    // squared deviations overflow int64 at 10^6 rows, so they sum in
    // decimal(38,0) ↔ HUGEINT (the a25 class); T is two exact-ratio
    // divisions and one pinned subtraction.
    "a76_cvm" -> ((s, dir) => {
      val e = graft.io.Tables.eventsUs(s, dir)
        .select(col("event_id"),
          round(col("value") * 100).cast("long").as("c"),
          (pmod(col("user_id"), lit(2L)) === 0L).cast("long").as("in_a"))
      // one pass: global rank r over (c, event_id); per-sample index
      // via cumsum of the sample indicator on the same order
      val ranked = DistRank.cumsum(e, col("c"),
        Seq(col("c"), col("event_id")),
        Seq((col("in_a"), "ia"), (lit(1L) - col("in_a"), "ib")),
        inclusive = true, totalsSuffix = Some("_tot"),
        rowNumberAs = Some("r"))
      val dec = "decimal(38,0)"
      val idx = when(col("in_a") === 1L, col("ia")).otherwise(col("ib"))
      val dev = (col("r") - idx).cast(dec)
      val agg = ranked.agg(
        max(col("ia_tot")).as("n"), max(col("ib_tot")).as("m"),
        sum(when(col("in_a") === 1L, dev * dev).otherwise(lit(0).cast(dec)))
          .as("sa"),
        sum(when(col("in_a") === 0L, dev * dev).otherwise(lit(0).cast(dec)))
          .as("sb"))
      agg.select(col("n"), col("m"),
          (col("n").cast(dec) * col("sa") + col("m").cast(dec) * col("sb"))
            .as("u"))
        .select(col("n"), col("m"), col("u").cast("double").as("u_dbl"),
          r6(col("u").cast("double") /
            (col("n") * col("m") * (col("n") + col("m"))).cast("double") -
            (lit(4.0) * col("n") * col("m") - 1.0) /
              (lit(6.0) * (col("n") + col("m"))))
            .as("t_stat"))
    }),

    // D: content-defined chunking (the Rabin-boundary primitive of
    // dedup storage and incremental-sync: boundaries follow CONTENT,
    // so an insertion only reshuffles its own chunk). Per doc:
    // window-8 char polyhashes (the charNgrams shifted-zip build —
    // O(n), never the O(n²) indexed-transform trap), a boundary
    // wherever hash % 64 == 0, plus the forced end. Emits chunk
    // count, mean chunk length (one division), and a COMMUTATIVE
    // mod-P boundary signature (the o26_merkle class) that two
    // replicas can compare without ordering guarantees. Entirely
    // map-side — no join, no shuffle.
    "d_cdc_chunks" -> ((s, dir) => {
      val t = Text.normalizeAz(col("text"))
      // ONE codegen'd byte scan (graft.functions.CdcBoundaries): every
      // window-8 Horner hash, the % 64 boundary rule and the
      // commutative mod-P signature fused into a single generated
      // loop — value-identical to the former 8-step zip_with chain
      // (same fold, same modular sum), whose interpreted per-element
      // lambdas and 8 intermediate arrays per row were ~95% of the
      // wall at the 100x step (839 s at sf10).
      val b = graft.functions.CdcBoundaries.boundaries(t, 8, 64L)
      documents(s, dir)
        .select(col("doc_id"), length(t).cast("long").as("n_chars_az"),
          b.getField("n_bounds").as("n_bounds"),
          b.getField("sig").as("boundary_sig"))
        .select(col("doc_id"), col("n_chars_az"),
          (col("n_bounds") + 1L).as("n_chunks"),
          col("boundary_sig"),
          r6(col("n_chars_az").cast("double") / (col("n_bounds") + 1L))
            .as("mean_chunk_len"))
    }),

    // M39: learning curve — the sample-efficiency measurement every
    // data-curation decision rests on ("is more data still buying
    // accuracy?"). Re-runs the m36 naive-Bayes pipeline over NESTED
    // train subsets (25/50/75/100% of the even docs, by (doc_id/2)
    // mod 4 < k — nested so the curve is monotone in expectation)
    // against the FIXED odd-doc test set, and emits one exact
    // accuracy row per fraction. Integer-decided end to end (the m36
    // lattice argument), 4 bounded pipeline runs.
    "m39_learning_curve" -> ((s, dir) => {
      val rows = (1 to 4).map { k =>
        val keep = (d: Column) => pmod(d, lit(2L)) === 0L &&
          pmod(((d - pmod(d, lit(2L))) / 2L).cast("long"), lit(4L)) < k
        val v = Curation33Q.nbVerdicts(s, dir, keep)
          .agg(count(lit(1)).as("n_test"), sum("correct").as("n_correct"))
          .head()
        val nTrain = documents(s, dir).filter(keep(col("doc_id"))).count()
        (k.toLong * 25L, nTrain, v.getLong(0), v.getLong(1),
          v.getLong(1) * 1000000L / v.getLong(0))
      }
      s.createDataFrame(rows).toDF(
        "train_pct", "n_train", "n_test", "n_correct", "acc_ppm")
    }),

    // A77: odds ratio with Katz log-scale confidence bounds — the
    // epidemiology/feature-association 2×2 readout (exposure:
    // lang = 'en'; outcome: n_chars > 1000) per source. Counts are
    // exact; OR is one division of exact products; the CI stays on
    // the LOG scale (ln(OR) ± 1.96·sqrt(1/a+1/b+1/c+1/d)) so no exp()
    // enters a compared column (pow/exp are not correctly rounded —
    // banned from outputs; sqrt/divisions are, and the chain is
    // mirrored token-for-token). Zero cells get the Haldane +1/2 via
    // doubled integers: 2a+1 etc — still exact.
    "a77_odds_ratio" -> ((s, dir) => {
      val d = documents(s, dir).select(col("source"),
        (col("lang") === "en").cast("long").as("x"),
        (col("n_chars") > 1000L).cast("long").as("y"))
      val g = d.groupBy("source").agg(
        sum(col("x") * col("y")).as("a"),
        sum(col("x") * (lit(1L) - col("y"))).as("b"),
        sum((lit(1L) - col("x")) * col("y")).as("cc"),
        sum((lit(1L) - col("x")) * (lit(1L) - col("y"))).as("dd"))
      // Haldane-Anscombe on the doubled lattice: (2a+1)/2 etc. —
      // OR = ((2a+1)(2d+1)) / ((2b+1)(2c+1)) exactly
      val a2 = col("a") * 2L + 1L; val b2 = col("b") * 2L + 1L
      val c2 = col("cc") * 2L + 1L; val d2 = col("dd") * 2L + 1L
      val lnOr = log((a2 * d2).cast("double") / (b2 * c2).cast("double"))
      val se = sqrt(lit(2.0) / a2 + lit(2.0) / b2 +
        lit(2.0) / c2 + lit(2.0) / d2)
      g.select(col("source"), col("a"), col("b"), col("cc").as("c"),
        col("dd").as("d"),
        r6((a2 * d2).cast("double") / (b2 * c2).cast("double"))
          .as("odds_ratio"),
        r6(lnOr).as("ln_or"),
        r6(lnOr - lit(1.959964) * se).as("ln_or_lo"),
        r6(lnOr + lit(1.959964) * se).as("ln_or_hi"))
    }))

  // ---- oracle SQL ----------------------------------------------------

  /** DuckDB window-8 char polyhash list over normalized text alias
    * `t` (O(n) substrings; list_reduce scalar fold — the trap-8-safe
    * class). */
  private val CdcHashSql =
    s"""CASE WHEN length(t) >= 8 THEN
       | list_transform(range(1, length(t) - 6),
       |  i -> list_reduce(list_prepend(0::BIGINT,
       |    list_transform(range(0, 8),
       |      j -> ascii(substr(t, (i + j)::INT, 1))::BIGINT)),
       |    (a, b) -> (a * 31 + b) % $P))
       | ELSE [] END""".stripMargin

  val oracle: Map[String, String] = Map(

    "a76_cvm" ->
      """WITH e AS (SELECT event_id,
        |  CAST(round(value * 100) AS BIGINT) AS c,
        |  (user_id % 2 = 0)::BIGINT AS in_a FROM events),
        |r AS (SELECT in_a,
        |  row_number() OVER (ORDER BY c, event_id)::BIGINT AS r,
        |  sum(in_a) OVER (ORDER BY c, event_id
        |    ROWS UNBOUNDED PRECEDING)::BIGINT AS ia,
        |  sum(1 - in_a) OVER (ORDER BY c, event_id
        |    ROWS UNBOUNDED PRECEDING)::BIGINT AS ib
        | FROM e),
        |t AS (SELECT
        |  (SELECT sum(in_a) FROM e)::BIGINT AS n,
        |  (SELECT sum(1 - in_a) FROM e)::BIGINT AS m,
        |  sum(CASE WHEN in_a = 1
        |    THEN (r - ia)::HUGEINT * (r - ia) ELSE 0 END) AS sa,
        |  sum(CASE WHEN in_a = 0
        |    THEN (r - ib)::HUGEINT * (r - ib) ELSE 0 END) AS sb
        | FROM r)
        |SELECT n, m,
        | CAST(n::HUGEINT * sa + m::HUGEINT * sb AS DOUBLE) AS u_dbl,
        | round(CAST(n::HUGEINT * sa + m::HUGEINT * sb AS DOUBLE)
        |    / (n * m * (n + m))::DOUBLE
        |  - (4.0 * n * m - 1.0) / (6.0 * (n + m)), 6) AS t_stat
        |FROM t""".stripMargin,

    "d_cdc_chunks" ->
      s"""WITH nrm AS (SELECT doc_id, ${LlmQ.NormSql} AS t FROM documents),
         |h AS (SELECT doc_id, length(t)::BIGINT AS n_chars_az,
         |  list_filter($CdcHashSql, x -> x % 64 = 0) AS bounds
         | FROM nrm)
         |SELECT doc_id, n_chars_az,
         | (len(bounds) + 1)::BIGINT AS n_chunks,
         | (list_reduce(list_prepend(0::BIGINT, bounds),
         |   (a, x) -> a + (x % $P)) % $P)::BIGINT AS boundary_sig,
         | round(n_chars_az::DOUBLE / (len(bounds) + 1), 6)
         |   AS mean_chunk_len
         |FROM h""".stripMargin,

    "m39_learning_curve" -> (1 to 4).map { k =>
      val cond = s"doc_id % 2 = 0 AND (doc_id // 2) % 4 < $k"
      s"""SELECT ${k * 25}::BIGINT AS train_pct,
         | (SELECT count(*) FROM documents WHERE $cond)::BIGINT AS n_train,
         | count(*)::BIGINT AS n_test, sum(correct)::BIGINT AS n_correct,
         | (sum(correct) * 1000000 // count(*))::BIGINT AS acc_ppm
         |FROM (${Curation33Q.nbSql(cond)})""".stripMargin
    }.mkString("\nUNION ALL\n"),

    "a77_odds_ratio" ->
      """WITH d AS (SELECT source, (lang = 'en')::BIGINT AS x,
        |  (n_chars > 1000)::BIGINT AS y FROM documents),
        |g AS (SELECT source, sum(x * y)::BIGINT AS a,
        |  sum(x * (1 - y))::BIGINT AS b,
        |  sum((1 - x) * y)::BIGINT AS c,
        |  sum((1 - x) * (1 - y))::BIGINT AS d
        | FROM d GROUP BY source)
        |SELECT source, a, b, c, d,
        | round(((2*a+1) * (2*d+1))::DOUBLE / ((2*b+1) * (2*c+1)), 6)
        |   AS odds_ratio,
        | round(ln(((2*a+1) * (2*d+1))::DOUBLE / ((2*b+1) * (2*c+1))), 6)
        |   AS ln_or,
        | round(ln(((2*a+1) * (2*d+1))::DOUBLE / ((2*b+1) * (2*c+1)))
        |  - 1.959964 * sqrt(2.0/(2*a+1) + 2.0/(2*b+1) + 2.0/(2*c+1)
        |    + 2.0/(2*d+1)), 6) AS ln_or_lo,
        | round(ln(((2*a+1) * (2*d+1))::DOUBLE / ((2*b+1) * (2*c+1)))
        |  + 1.959964 * sqrt(2.0/(2*a+1) + 2.0/(2*b+1) + 2.0/(2*c+1)
        |    + 2.0/(2*d+1)), 6) AS ln_or_hi
        |FROM g""".stripMargin)
}
