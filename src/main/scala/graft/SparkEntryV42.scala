package graft

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.agg.Aggregators
import graft.llm.PqOps

/** Forty-second batch (round 10, VERDICT r9 #6/#8/#10):
  *
  *  - `ts_forecast_agg_dynfields` — the reference's dynamic
  *    `lower_<pct>`/`upper_<pct>` struct field names
  *    (ts_forecast_agg.cpp:69-82 GetForecastAggResultType) honored from
  *    the construction-time confidence level: two registered instances
  *    (0.95, 0.80) are addressed BY SUFFIXED NAME in SQL — the query
  *    itself fails if the schema contract breaks — and the oracle replays
  *    the per-group output-shape row (the agg-API oracle discipline:
  *    sizes + interval ordering, model choice stays out).
  *  - `pagerank_sink` — PageRank with the standard dangling-mass
  *    redistribution on a sink-BEARING graph (deterministic arithmetic
  *    edge list over documents; every node with `doc_id % 3 == 0` that
  *    appears only as a destination is a sink). All 5 iterations unroll
  *    in BIGINT `//` arithmetic including the per-iteration sink-mass
  *    share, so the scaled ranks match bit-for-bit.
  *  - `ann_ivfpq_rerank_topk` — the FAISS-style refine step: ADC selects
  *    30 candidates from the compressed domain, their RAW vectors (read
  *    from the index's list-partitioned vectors/ layout with the same
  *    probed-partition prune) are exact-cosine scored for the final
  *    top-10. Exhaustive probe (nProbe = nLists) so the oracle replays
  *    the full chain: zero-iteration codebook, ADC candidate cut, exact
  *    cosine re-rank on the rounded grid with vid tiebreak. */
object SparkEntryV42 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---------------------------------------------- dynamic agg field names

  private def exactSum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(round(c, 6).cast(DecimalType(28, 6))).cast("double")

  private def dailyEventsTs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type").as("g"), date_trunc("day", col("ts")).as("ds"))
      .agg(exactSum(col("value")).as("y"))

  // ---------------------------------------------- sink-bearing PageRank

  private val PrIters = 5
  private val DstMod = 1000L

  private def sinkEdges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3L)) =!= 0L)
      .select(col("doc_id").as("s"),
        pmod(col("doc_id") * lit(131L) + lit(7L), lit(DstMod)).as("d"))

  // ---------------------------------------------- IVF-PQ exact re-rank

  private val M = 4
  private val SubDim = 16
  private val NCodes = 16
  private val K = 10
  private val KCand = 30
  private val NLists = 8

  private def corpus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_forecast_agg_dynfields" -> ((s, dir) => {
      val pts = Encoders.product[Aggregators.TsPoint]
      s.udf.register("fc_agg_95", udaf(new Aggregators.ForecastAggDynamic(
        "SES", 12, Map("confidence_level" -> "0.95")), pts))
      s.udf.register("fc_agg_80", udaf(new Aggregators.ForecastAggDynamic(
        "SES", 12, Map("confidence_level" -> "0.80")), pts))
      dailyEventsTs(s, dir).createOrReplaceTempView("_agg_events_dyn")
      // the suffixed fields are addressed BY NAME — resolution fails if
      // the dynamic schema is wrong; ordered pins lower <= point <= upper
      s.sql("""SELECT g, 95 AS level, size(fc.point_forecast) AS n_points,
              |       size(fc.lower_95) AS n_lower, size(fc.upper_95) AS n_upper,
              |       forall(zip_with(fc.lower_95, fc.upper_95, (l, u) -> l <= u),
              |              x -> x) AS ordered
              |FROM (SELECT g, fc_agg_95(ds, y) AS fc
              |      FROM _agg_events_dyn GROUP BY g) t
              |UNION ALL
              |SELECT g, 80 AS level, size(fc.point_forecast),
              |       size(fc.lower_80), size(fc.upper_80),
              |       forall(zip_with(fc.lower_80, fc.upper_80, (l, u) -> l <= u),
              |              x -> x)
              |FROM (SELECT g, fc_agg_80(ds, y) AS fc
              |      FROM _agg_events_dyn GROUP BY g) t""".stripMargin)
    }),
    "pagerank_sink" -> ((s, dir) =>
      graft.ops.GraphOps.pageRank(sinkEdges(s, dir), "s", "d",
        iters = PrIters, redistributeDangling = true)),
    "ann_ivfpq_rerank_topk" -> ((s, dir) => {
      val c = corpus(s, dir)
      val model = PqOps.pqTrain(c, "vec_id", "embedding", M, NCodes, iters = 0)
      val idxDir = java.nio.file.Files.createTempDirectory("graft_ivfpq_rr").toString
      PqOps.ivfPqWriteIndex(c, "vec_id", "embedding", model, NLists, idxDir,
        withVectors = true)
      PqOps.ivfPqProbeIndexRerank(s, idxDir, c.filter(col("vec_id") < 5),
        "vec_id", "embedding", K, nProbe = NLists, kCand = KCand)
    })
  )

  private val DynFieldsSql =
    """WITH g AS (SELECT DISTINCT event_type AS g FROM events),
      |lv AS (SELECT unnest([95, 80]) AS level)
      |SELECT g.g, lv.level, 12 AS n_points, 12 AS n_lower, 12 AS n_upper,
      |       TRUE AS ordered
      |FROM g, lv""".stripMargin

  /** All iterations unrolled in BIGINT `//` arithmetic including the
    * per-iteration dangling share `D_t // N` (the sink-mass term the op
    * adds inside the damped sum). */
  private val PageRankSinkSql = {
    val S = graft.ops.GraphOps.Scale
    val iters = (0 until PrIters).map { i =>
      s"""dg${i + 1} AS (SELECT CAST(coalesce(sum(p.pr), 0) AS BIGINT)
         |    // (SELECT n FROM nn) AS ds
         |  FROM pr$i p JOIN sinks sk USING (node)),
         |pr${i + 1} AS (SELECT nodes.node,
         |    (15 * ($S // nn.n)) // 100
         |      + (85 * (coalesce(ag.c, 0) + dg${i + 1}.ds)) // 100 AS pr
         |  FROM nodes CROSS JOIN nn CROSS JOIN dg${i + 1} LEFT JOIN (
         |    SELECT ed.d AS node, CAST(sum(p.pr // od.deg) AS BIGINT) AS c
         |    FROM ed JOIN pr$i p ON ed.s = p.node JOIN od ON od.s = ed.s
         |    GROUP BY ed.d) ag ON ag.node = nodes.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH ed AS (SELECT doc_id AS s, (doc_id * 131 + 7) % $DstMod AS d
       |  FROM documents WHERE doc_id % 3 <> 0),
       |nodes AS (SELECT s AS node FROM ed UNION SELECT d FROM ed),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |od AS (SELECT s, count(*) AS deg FROM ed GROUP BY 1),
       |sinks AS (SELECT node FROM nodes
       |  WHERE node NOT IN (SELECT s FROM od)),
       |pr0 AS (SELECT node, ($S // nn.n) AS pr FROM nodes, nn),
       |$iters
       |SELECT node, pr AS pr_scaled,
       |  round(CAST(pr AS DOUBLE) / $S.0, 6) AS pr
       |FROM pr$PrIters""".stripMargin
  }

  /** The V29 zero-iteration PQ replay extended with the refine step:
    * ADC top-`KCand` cut, then exact cosine on the candidates' raw
    * vectors, both on the 6-decimal grid with vid tiebreaks. */
  private val RerankOracle =
    s"""WITH base AS (SELECT vec_id AS vid, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |subs AS (SELECT unnest(range(0, $M)) AS sub),
       |sc AS (SELECT CAST(row_number() OVER (ORDER BY vid) - 1 AS INT) AS code, v
       |  FROM (SELECT vid, v FROM base ORDER BY vid LIMIT $NCodes)),
       |cb AS (SELECT CAST(subs.sub AS INT) AS sub, sc.code,
       |    list_slice(sc.v, subs.sub * $SubDim + 1, subs.sub * $SubDim + $SubDim) AS cent
       |  FROM sc CROSS JOIN subs),
       |sv AS (SELECT vid, CAST(subs.sub AS INT) AS sub,
       |    list_slice(v, subs.sub * $SubDim + 1, subs.sub * $SubDim + $SubDim) AS subv
       |  FROM base CROSS JOIN subs),
       |dists AS (SELECT vid, sv.sub, cb.code,
       |    list_reduce(list_transform(range(1, $SubDim + 1),
       |      i -> (subv[i] - cent[i]) * (subv[i] - cent[i])), (a, b) -> a + b) AS d
       |  FROM sv JOIN cb ON sv.sub = cb.sub),
       |enc AS (SELECT vid, sub, code FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vid, sub ORDER BY d, code) AS rn
       |    FROM dists) WHERE rn = 1),
       |q AS (SELECT vid AS qid, v AS qv FROM base WHERE vid < 5),
       |qsv AS (SELECT qid, CAST(subs.sub AS INT) AS sub,
       |    list_slice(qv, subs.sub * $SubDim + 1, subs.sub * $SubDim + $SubDim) AS qsubv
       |  FROM q CROSS JOIN subs),
       |lut AS (SELECT qid, qsv.sub, cb.code,
       |    list_reduce(list_transform(range(1, $SubDim + 1),
       |      i -> qsubv[i] * cent[i]), (a, b) -> a + b) AS dv
       |  FROM qsv JOIN cb ON qsv.sub = cb.sub),
       |adc AS (SELECT l.qid, e.vid,
       |    list_reduce(list(l.dv ORDER BY l.sub), (a, b) -> a + b) AS raw
       |  FROM enc e JOIN lut l ON e.sub = l.sub AND e.code = l.code
       |  GROUP BY 1, 2),
       |cand AS (SELECT qid, vid FROM (
       |    SELECT qid, vid, row_number() OVER (PARTITION BY qid
       |      ORDER BY round(raw, 6) DESC, vid) AS rk
       |    FROM adc) WHERE rk <= $KCand),
       |ex AS (SELECT c.qid, c.vid,
       |    (round(list_cosine_similarity(q.qv, b.v), 6) + 0.0) AS score
       |  FROM cand c JOIN q USING (qid) JOIN base b ON b.vid = c.vid),
       |r AS (SELECT qid, vid, score,
       |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, vid) AS rk
       |  FROM ex WHERE NOT isnan(score))
       |SELECT qid, vid, score FROM r WHERE rk <= $K""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "ts_forecast_agg_dynfields" -> DynFieldsSql,
    "pagerank_sink" -> PageRankSinkSql,
    "ann_ivfpq_rerank_topk" -> RerankOracle
  )
}
