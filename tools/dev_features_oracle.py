#!/usr/bin/env python3
"""Dev harness for the ts_features_full_by oracle: builds the DuckDB SQL,
runs it against the sf parquet, and diffs every column against the Spark
dump. Iterate until zero mismatches, then paste the SQL into SparkEntryV3.
"""
import sys, glob
import duckdb, pandas as pd, numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DUMP = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_ff/ts_features_full_by"

EXACT_SUM = "CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE)"
EPS = "2.220446049250313e-16"

# percentile(srt, p) replicating Stats.percentile (linear interpolation)
def pct(p, t=""):
    q = t + "." if t else ""
    idx = f"({p} * ({q}nd - 1))"
    lo = f"CAST(floor({idx}) AS BIGINT)"
    hi = f"CAST(ceil({idx}) AS BIGINT)"
    fr = f"({idx} - floor({idx}))"
    return (f"CASE WHEN {hi} >= {q}n THEN {q}srt[{q}n] "
            f"ELSE {q}srt[{lo} + 1] * (1 - {fr}) + {q}srt[{hi} + 1] * {fr} END")

# Stats.autocorrelation at lag l: num over i>=lag of devs[i]*devs[i-l] / ss2
def acf(l):
    return (f"CASE WHEN abs(ss2) < {EPS} THEN 0.0 ELSE "
            f"list_reduce(list_transform(range({l} + 1, n + 1), "
            f"i -> devs[i] * devs[i - {l}]), (a, x) -> a + x) / ss2 END")

def fold(expr):
    return f"list_reduce({expr}, (a, x) -> a + x)"

# sequential-subtraction helper for Durbin-Levinson num/den
def seqsub(head, terms):
    out = head
    for t in terms:
        out = f"({out} - {t})"
    return out

SQL = f"""
WITH RECURSIVE s AS (
  SELECT event_type AS g, CAST(ts AS DATE) AS ds, {EXACT_SUM} AS y
  FROM events GROUP BY 1, 2),
arr AS (SELECT g, list(y ORDER BY ds) AS ys, count(*) AS n FROM s GROUP BY g),
b0 AS (SELECT g, ys, n, CAST(n AS DOUBLE) AS nd,
        {fold("ys")} AS ysum, list_sort(ys) AS srt,
        CAST(pow(2.0, ceil(log2(CAST(n AS DOUBLE)))) AS BIGINT) AS padded
       FROM arr),
b1 AS (SELECT *, ysum / nd AS mean, srt[1] AS vmin, srt[n] AS vmax FROM b0),
b2 AS (SELECT *, list_transform(ys, v -> v - mean) AS devs,
        list_transform(range(2, n + 1), i -> ys[i] - ys[i - 1]) AS diffs
       FROM b1),
b3 AS (SELECT *,
        {fold("list_transform(devs, d -> d * d)")} AS ss2,
        {fold("list_transform(devs, d -> d * d * d)")} AS ss3,
        {fold("list_transform(devs, d -> d * d * d * d)")} AS ss4,
        {fold("list_transform(ys, v -> v * v)")} AS energy,
        {fold("list_transform(diffs, d -> abs(d))")} AS asoc,
        {fold("list_transform(diffs, d -> d * d)")} AS d2sum
       FROM b2),
b4 AS (SELECT *, ss2 / nd AS varpop, sqrt(ss2 / nd) AS std, ss2 / (nd - 1) AS svar
       FROM b3),
-- autocorrelations (shared by features + pacf)
ac AS (SELECT *, {acf(1)} AS ac1, {acf(2)} AS ac2, {acf(3)} AS ac3, {acf(4)} AS ac4,
        {acf(5)} AS ac5, {acf(6)} AS ac6, {acf(7)} AS ac7, {acf(8)} AS ac8,
        {acf(9)} AS ac9, {acf(10)} AS ac10
       FROM b4),
-- Durbin-Levinson unrolled to lag 5
pc2 AS (SELECT *,
        CASE WHEN abs(1 - ac1 * ac1) > 1e-12
             THEN {seqsub("ac2", ["ac1 * ac1"])} / (1 - ac1 * ac1) ELSE 0.0 END AS p22
       FROM ac),
pc2b AS (SELECT *, ac1 - p22 * ac1 AS f21 FROM pc2),
pc3 AS (SELECT *,
        CASE WHEN abs({seqsub("1.0", ["f21 * ac1", "p22 * ac2"])}) > 1e-12
             THEN {seqsub("ac3", ["f21 * ac2", "p22 * ac1"])}
                  / {seqsub("1.0", ["f21 * ac1", "p22 * ac2"])}
             ELSE 0.0 END AS p33
       FROM pc2b),
pc3b AS (SELECT *, f21 - p33 * p22 AS f31, p22 - p33 * f21 AS f32 FROM pc3),
pc4 AS (SELECT *,
        CASE WHEN abs({seqsub("1.0", ["f31 * ac1", "f32 * ac2", "p33 * ac3"])}) > 1e-12
             THEN {seqsub("ac4", ["f31 * ac3", "f32 * ac2", "p33 * ac1"])}
                  / {seqsub("1.0", ["f31 * ac1", "f32 * ac2", "p33 * ac3"])}
             ELSE 0.0 END AS p44
       FROM pc3b),
pc4b AS (SELECT *, f31 - p44 * p33 AS f41, f32 - p44 * f32 AS f42,
         p33 - p44 * f31 AS f43 FROM pc4),
pc6 AS (SELECT *,
        CASE WHEN abs({seqsub("1.0", ["f41 * ac1", "f42 * ac2", "f43 * ac3", "p44 * ac4"])}) > 1e-12
             THEN {seqsub("ac5", ["f41 * ac4", "f42 * ac3", "f43 * ac2", "p44 * ac1"])}
                  / {seqsub("1.0", ["f41 * ac1", "f42 * ac2", "f43 * ac3", "p44 * ac4"])}
             ELSE 0.0 END AS p55
       FROM pc4b),
-- lempel-ziv over median-binarized string
strs AS (SELECT g, n,
          {fold("list_transform(ys, v -> CASE WHEN v > " + pct("0.5") + " THEN '1' ELSE '0' END)").replace("(a, x) -> a + x", "(a, x) -> a || x")} AS bs
         FROM b1),
lz AS (
  SELECT g, bs, n, 1 AS pos, 1 AS comp FROM strs
  UNION ALL
  SELECT g, bs, n,
    pos + coalesce(list_filter(range(1, n - pos + 1),
      l -> NOT contains(bs[1 : pos + l - 1], bs[pos + 1 : pos + l]))[1], n - pos + 1),
    comp + 1
  FROM lz WHERE pos < n),
lzv AS (SELECT g, max(comp) AS lzcomp FROM lz GROUP BY g),
-- peaks with prominence
pk AS (SELECT b4.g,
        list_filter(range(2, n), i -> ys[i] > ys[i - 1] AND ys[i] >= ys[i + 1]) AS rawp,
        list_transform(
          list_filter(range(2, n), i -> ys[i] > ys[i - 1] AND ys[i] >= ys[i + 1]),
          i -> ys[i] - greatest(
            least(ys[i], coalesce(list_aggregate(
              CASE WHEN list_position(list_transform(list_reverse(ys[1 : i - 1]), x -> x > ys[i]), true) IS NULL
                   THEN list_reverse(ys[1 : i - 1])
                   ELSE (list_reverse(ys[1 : i - 1]))[1 : list_position(list_transform(list_reverse(ys[1 : i - 1]), x -> x > ys[i]), true) - 1] END,
              'min'), ys[i])),
            least(ys[i], coalesce(list_aggregate(
              CASE WHEN list_position(list_transform(ys[i + 1 : n], x -> x > ys[i]), true) IS NULL
                   THEN ys[i + 1 : n]
                   ELSE (ys[i + 1 : n])[1 : list_position(list_transform(ys[i + 1 : n], x -> x > ys[i]), true) - 1] END,
              'min'), ys[i])))) AS proms
       FROM b4),
-- benford digits
bf AS (SELECT b4.g,
        list_filter(list_transform(ys, v ->
          CASE WHEN abs(v) < 1e-300 THEN NULL ELSE
            CAST(trunc(
              list_reduce(list_prepend(
                [list_reduce(list_prepend([abs(v)], list_transform(range(1, 41), z -> [0.0])),
                   (acc, e) -> [CASE WHEN acc[1] >= 10 THEN acc[1] / 10 ELSE acc[1] END])[1]],
                list_transform(range(1, 41), z -> [0.0])),
                (acc, e) -> [CASE WHEN acc[1] < 1 THEN acc[1] * 10 ELSE acc[1] END])[1]
            ) AS INT) END),
          d -> d IS NOT NULL) AS digits
       FROM b4),
bf2 AS (SELECT g,
         list_transform(range(1, 10), d ->
           CAST(len(list_filter(digits, x -> x = d)) AS DOUBLE) / len(digits)) AS obs,
         list_transform(range(1, 10), d -> log10(1.0 + 1.0 / d)) AS ben
        FROM bf WHERE len(digits) > 0),
bf3 AS (SELECT g,
         {fold("obs")} / 9 AS ma, {fold("ben")} / 9 AS mb, obs, ben FROM bf2),
bf4 AS (SELECT g,
         {fold("list_transform(range(1, 10), i -> (obs[i] - ma) * (ben[i] - mb))")} AS num,
         {fold("list_transform(range(1, 10), i -> (obs[i] - ma) * (obs[i] - ma))")} AS da,
         {fold("list_transform(range(1, 10), i -> (ben[i] - mb) * (ben[i] - mb))")} AS db
        FROM bf3),
benf AS (SELECT g, CASE WHEN da <= 0 OR db <= 0 THEN NULL
                        ELSE num / sqrt(da * db) END AS benford FROM bf4),
-- fft coefficients k=0..9 on the raw zero-padded series (direct DFT)
fftc AS (SELECT b4.g,
          list_transform(range(0, 10), k ->
            {fold("list_transform(range(1, n + 1), t -> ys[t] * cos(2 * pi() * k * (t - 1) / padded))")}) AS fre,
          list_transform(range(0, 10), k ->
            0.0 - {fold("list_transform(range(1, n + 1), t -> ys[t] * sin(2 * pi() * k * (t - 1) / padded))")}) AS fim
         FROM b4),
-- periodogram on demeaned zero-padded series
sp AS (SELECT b4.g, padded, nd,
        list_transform(range(1, padded // 2 + 1), k -> CAST(k AS DOUBLE) / padded) AS freqs,
        list_transform(range(1, padded // 2 + 1), k ->
          pow({fold("list_transform(range(1, n + 1), t -> devs[t] * cos(2 * pi() * k * (t - 1) / padded))")}, 2)
          + pow({fold("list_transform(range(1, n + 1), t -> devs[t] * sin(2 * pi() * k * (t - 1) / padded))")}, 2)) AS power
       FROM b4),
sp2 AS (SELECT g, freqs, power, {fold("power")} AS ptot FROM sp),
sp3 AS (SELECT g, ptot,
         CASE WHEN ptot <= 0 THEN NULL ELSE
           {fold("list_transform(range(1, len(freqs) + 1), i -> freqs[i] * power[i])")} / ptot END AS centroid,
         freqs, power
        FROM sp2),
spec AS (SELECT g, centroid,
          CASE WHEN ptot <= 0 THEN NULL ELSE
            {fold("list_transform(range(1, len(freqs) + 1), i -> (freqs[i] - centroid) * (freqs[i] - centroid) * power[i])")} / ptot END AS specvar
         FROM sp3),
-- agg linear trend over chunk-of-5 means
alt0 AS (SELECT b4.g, n, nd,
          list_transform(range(0, CAST(ceil(nd / 5) AS BIGINT)), c ->
            {fold("ys[c * 5 + 1 : least((c + 1) * 5, n)]")}
            / (least((c + 1) * 5, n) - c * 5)) AS ch
         FROM b4),
alt1 AS (SELECT g, ch, CAST(len(ch) AS DOUBLE) AS m,
          (CAST(len(ch) AS DOUBLE) - 1) / 2.0 AS xm,
          {fold("ch")} / CAST(len(ch) AS DOUBLE) AS ym
         FROM alt0),
alt2 AS (SELECT *,
          {fold("list_transform(range(1, len(ch) + 1), i -> ((i - 1) - xm) * (ch[i] - ym))")} AS sxy,
          {fold("list_transform(range(1, len(ch) + 1), i -> ((i - 1) - xm) * ((i - 1) - xm))")} AS sxx,
          {fold("list_transform(range(1, len(ch) + 1), i -> (ch[i] - ym) * (ch[i] - ym))")} AS syy
         FROM alt1),
alt AS (SELECT g,
         CASE WHEN sxx > 0 THEN sxy / sxx ELSE 0.0 END AS a_slope,
         ym - (CASE WHEN sxx > 0 THEN sxy / sxx ELSE 0.0 END) * xm AS a_int,
         CASE WHEN syy > 0 AND sxx > 0 THEN sxy * sxy / (sxx * syy) ELSE NULL END AS a_r2,
         CASE WHEN m > 2 AND sxx > 0
              THEN sqrt(greatest(syy - (CASE WHEN sxx > 0 THEN sxy / sxx ELSE 0.0 END) * sxy, 0.0) / (m - 2) / sxx)
              ELSE NULL END AS a_se
        FROM alt2),
-- full-series linear trend
lt0 AS (SELECT b4.g, (nd - 1) / 2.0 AS xm, mean AS ym, n, nd, ys FROM b4),
lt1 AS (SELECT *,
         {fold("list_transform(range(1, n + 1), i -> ((i - 1) - xm) * (ys[i] - ym))")} AS sxy,
         {fold("list_transform(range(1, n + 1), i -> ((i - 1) - xm) * ((i - 1) - xm))")} AS sxx,
         {fold("list_transform(range(1, n + 1), i -> (ys[i] - ym) * (ys[i] - ym))")} AS syy
        FROM lt0),
lt AS (SELECT g,
        CASE WHEN sxx > 0 THEN sxy / sxx ELSE 0.0 END AS slope,
        ym - (CASE WHEN sxx > 0 THEN sxy / sxx ELSE 0.0 END) * xm AS intercept,
        CASE WHEN syy > 0 AND sxx > 0 THEN sxy * sxy / (sxx * syy) ELSE NULL END AS r2
       FROM lt1),
-- entropies
se0 AS (SELECT b4.g, ys, n, nd, 0.2 * std AS r FROM b4),
se1 AS (SELECT g, r,
         CASE WHEN r <= 0 THEN NULL ELSE
         {fold("list_transform(range(1, n), i -> CAST(len(list_filter(range(i + 1, n), j -> abs(ys[i] - ys[j]) <= r AND abs(ys[i + 1] - ys[j + 1]) <= r)) AS DOUBLE))")} END AS bmatch,
         CASE WHEN r <= 0 THEN NULL ELSE
         {fold("list_transform(range(1, n - 1), i -> CAST(len(list_filter(range(i + 1, n - 1), j -> abs(ys[i] - ys[j]) <= r AND abs(ys[i + 1] - ys[j + 1]) <= r AND abs(ys[i + 2] - ys[j + 2]) <= r)) AS DOUBLE))")} END AS amatch
        FROM se0),
sampen AS (SELECT g, CASE WHEN bmatch IS NULL OR amatch IS NULL OR bmatch = 0 OR amatch = 0
                          THEN NULL ELSE -ln(amatch / bmatch) END AS sampent FROM se1),
ap1 AS (SELECT g, r,
         {fold("list_transform(range(1, n), i -> ln(greatest(CAST(len(list_filter(range(1, n), j -> abs(ys[i] - ys[j]) <= r AND abs(ys[i + 1] - ys[j + 1]) <= r)) AS DOUBLE), 1e-300) / (nd - 1)))")} / (nd - 1) AS phi2,
         {fold("list_transform(range(1, n - 1), i -> ln(greatest(CAST(len(list_filter(range(1, n - 1), j -> abs(ys[i] - ys[j]) <= r AND abs(ys[i + 1] - ys[j + 1]) <= r AND abs(ys[i + 2] - ys[j + 2]) <= r)) AS DOUBLE), 1e-300) / (nd - 2)))")} / (nd - 2) AS phi3
        FROM se0),
apen AS (SELECT g, phi2 - phi3 AS apent FROM ap1),
pe0 AS (SELECT b4.g, nd,
         list_transform(range(1, n - 1), i ->
           CASE WHEN ys[i] <= ys[i + 1] AND ys[i + 1] <= ys[i + 2] THEN 0
                WHEN ys[i] <= ys[i + 2] AND NOT (ys[i + 1] <= ys[i + 2]) THEN 1
                WHEN NOT (ys[i] <= ys[i + 1]) AND ys[i] <= ys[i + 2] THEN 2
                WHEN ys[i + 1] <= ys[i + 2] AND NOT (ys[i] <= ys[i + 2]) THEN 3
                WHEN ys[i] <= ys[i + 1] AND NOT (ys[i] <= ys[i + 2]) THEN 4
                ELSE 5 END) AS pats
        FROM b4),
pe AS (SELECT g,
        -{fold("list_filter(list_transform(range(0, 6), p -> CASE WHEN len(list_filter(pats, x -> x = p)) > 0 THEN (CAST(len(list_filter(pats, x -> x = p)) AS DOUBLE) / len(pats)) * ln(CAST(len(list_filter(pats, x -> x = p)) AS DOUBLE) / len(pats)) ELSE NULL END), v -> v IS NOT NULL)")}
        / ln(6.0) AS perment
       FROM pe0),
-- binned entropy (10 bins, truncating)
be AS (SELECT b4.g,
        CASE WHEN vmax = vmin THEN 0.0 ELSE
        -{fold("list_filter(list_transform(range(0, 10), b -> CASE WHEN len(list_filter(ys, v -> least(9, CAST(trunc((v - vmin) / (vmax - vmin) * 10) AS INT)) = b)) > 0 THEN (CAST(len(list_filter(ys, v -> least(9, CAST(trunc((v - vmin) / (vmax - vmin) * 10) AS INT)) = b)) AS DOUBLE) / nd) * ln(CAST(len(list_filter(ys, v -> least(9, CAST(trunc((v - vmin) / (vmax - vmin) * 10) AS INT)) = b)) AS DOUBLE) / nd) ELSE NULL END), v -> v IS NOT NULL)")}
        END AS binent
       FROM b4),
-- reoccurring values
ro AS (SELECT b4.g,
        list_distinct(ys) AS dv,
        list_filter(list_distinct(ys), v -> len(list_filter(ys, x -> x = v)) > 1) AS rv,
        ys
       FROM b4),
ro2 AS (SELECT g,
         CASE WHEN len(rv) = 0 THEN 0.0 ELSE
           {fold("list_transform(rv, v -> CAST(len(list_filter(ys, x -> x = v)) AS DOUBLE))")} END AS rcnt,
         CASE WHEN len(rv) = 0 THEN 0.0 ELSE {fold("rv")} END AS rsum,
         CASE WHEN len(rv) = 0 THEN 0.0 ELSE
           {fold("list_transform(rv, v -> v * len(list_filter(ys, x -> x = v)))")} END AS rdsum
        FROM ro),
-- strikes via fold with [cur, max] accumulator
st AS (SELECT b4.g,
        list_reduce(list_prepend([0.0, 0.0],
          list_transform(ys, v -> [CASE WHEN v > mean THEN 1.0 ELSE 0.0 END, 0.0])),
          (acc, e) -> CASE WHEN e[1] = 1.0
            THEN [acc[1] + 1, greatest(acc[2], acc[1] + 1)] ELSE [0.0, acc[2]] END)[2] AS strike_above,
        list_reduce(list_prepend([0.0, 0.0],
          list_transform(ys, v -> [CASE WHEN v < mean THEN 1.0 ELSE 0.0 END, 0.0])),
          (acc, e) -> CASE WHEN e[1] = 1.0
            THEN [acc[1] + 1, greatest(acc[2], acc[1] + 1)] ELSE [0.0, acc[2]] END)[2] AS strike_below
       FROM b4)
SELECT b.g,
  b.nd AS length,
  round(b.ysum, 4) AS sum,
  round(b.mean, 6) AS mean,
  round(b.vmin, 6) AS minimum,
  round(b.vmax, 6) AS maximum,
  round(b.vmax - b.vmin, 6) AS range,
  round(b.varpop, 4) AS variance,
  round(b.std, 6) AS standard_deviation,
  round(CASE WHEN b.mean <> 0 THEN b.std / abs(b.mean) END, 6) AS variation_coefficient,
  CASE WHEN b.std > 0.25 * (b.vmax - b.vmin) THEN 1.0 ELSE 0.0 END AS large_standard_deviation,
  round({pct("0.5", "b")}, 6) AS median,
  round({pct("0.1", "b")}, 6) AS "quantile_0.1",
  round({pct("0.25", "b")}, 6) AS "quantile_0.25",
  round({pct("0.75", "b")}, 6) AS "quantile_0.75",
  round({pct("0.9", "b")}, 6) AS "quantile_0.9",
  round(CASE WHEN b.n > 2 AND b.std > 0
    THEN (b.ss3 / b.nd) / pow(sqrt(b.svar), 3) * sqrt(b.nd * (b.nd - 1.0)) / (b.nd - 2.0) END, 6) AS skewness,
  round(CASE WHEN b.n > 3 AND b.std > 0
    THEN (b.nd - 1.0) / ((b.nd - 2.0) * (b.nd - 3.0))
         * ((b.nd + 1.0) * ((b.ss4 / b.nd) / (b.svar * b.svar) - 3.0) + 6.0) END, 6) AS kurtosis,
  CAST(len(list_filter(b.ys, v -> v > b.mean)) AS DOUBLE) AS count_above_mean,
  CAST(len(list_filter(b.ys, v -> v < b.mean)) AS DOUBLE) AS count_below_mean,
  round(CAST(len(list_filter(b.ys, v -> v > b.mean)) AS DOUBLE) / b.nd, 6) AS percentage_above_mean,
  round(CASE WHEN b.n > 1 THEN CAST(len(list_filter(range(2, b.n + 1), i -> b.ys[i] * b.ys[i - 1] < 0)) AS DOUBLE) / (b.nd - 1) ELSE 0.0 END, 6) AS zero_crossing_rate,
  round(CASE WHEN b.n > 1 THEN (b.ys[b.n] - b.ys[1]) / (b.nd - 1) END, 6) AS mean_change,
  round(CASE WHEN b.n > 1 THEN b.asoc / (b.nd - 1) END, 6) AS mean_abs_change,
  round(b.ys[1], 6) AS first_value,
  round(b.ys[b.n], 6) AS last_value,
  round(CAST(list_position(b.ys, b.vmax) - 1 AS DOUBLE) / b.nd, 6) AS first_location_of_maximum,
  round(CAST(b.n - list_position(list_reverse(b.ys), b.vmax) AS DOUBLE) / b.nd, 6) AS last_location_of_maximum,
  round(CAST(list_position(b.ys, b.vmin) - 1 AS DOUBLE) / b.nd, 6) AS first_location_of_minimum,
  round(CAST(b.n - list_position(list_reverse(b.ys), b.vmin) AS DOUBLE) / b.nd, 6) AS last_location_of_minimum,
  round(b.energy, 2) AS abs_energy,
  round(sqrt(b.energy / b.nd), 6) AS root_mean_square,
  round(CASE WHEN b.n > 2 THEN {fold("list_transform(range(1, b.n - 1), j -> (b.ys[j + 2] - 2 * b.ys[j + 1] + b.ys[j]) / 2.0)")} / (b.nd - 2) END, 6) AS mean_second_derivative_central,
  round(sqrt(b.d2sum), 4) AS cid_ce,
  round(b.asoc, 4) AS absolute_sum_of_changes,
  round(CAST(lzv.lzcomp AS DOUBLE) / b.nd, 6) AS lempel_ziv_complexity,
  st.strike_above AS longest_strike_above_mean,
  st.strike_below AS longest_strike_below_mean,
  CAST(len(pk.rawp) AS DOUBLE) AS number_peaks,
  CAST(len(list_filter(pk.proms, p -> p >= b.std)) AS DOUBLE) AS number_peaks_threshold_1,
  CAST(len(list_filter(pk.proms, p -> p >= 2 * b.std)) AS DOUBLE) AS number_peaks_threshold_2,
  round(benf.benford, 6) AS benford_correlation,
  round(lt.slope, 6) AS linear_trend_slope,
  round(lt.intercept, 6) AS linear_trend_intercept,
  round(lt.r2, 6) AS linear_trend_r_squared,
  round(be.binent, 6) AS binned_entropy,
  round(sampen.sampent, 6) AS sample_entropy,
  round(apen.apent, 6) AS approximate_entropy,
  round(pe.perment, 6) AS permutation_entropy,
  CAST(len(ro.dv) AS DOUBLE) AS count_unique,
  round(CAST(len(ro.dv) AS DOUBLE) / b.nd, 6) AS ratio_value_number_to_length,
  CASE WHEN len(ro.rv) > 0 THEN 1.0 ELSE 0.0 END AS has_duplicate,
  CASE WHEN len(list_filter(b.ys, x -> x = b.vmax)) > 1 THEN 1.0 ELSE 0.0 END AS has_duplicate_max,
  CASE WHEN len(list_filter(b.ys, x -> x = b.vmin)) > 1 THEN 1.0 ELSE 0.0 END AS has_duplicate_min,
  round(ro2.rcnt / b.nd, 6) AS percentage_of_reoccurring_datapoints_to_all_datapoints,
  round(CASE WHEN len(ro.dv) > 0 THEN CAST(len(ro.rv) AS DOUBLE) / len(ro.dv) END, 6) AS percentage_of_reoccurring_values_to_all_values,
  round(ro2.rsum, 4) AS sum_of_reoccurring_values,
  round(ro2.rdsum, 4) AS sum_of_reoccurring_datapoints,
  round(spec.centroid, 6) AS spectral_centroid,
  round(spec.specvar, 6) AS spectral_variance,
  round(alt.a_slope, 6) AS agg_linear_trend_slope,
  round(alt.a_int, 6) AS agg_linear_trend_intercept,
  round(CASE WHEN alt.a_r2 IS NULL THEN NULL
             ELSE sign(alt.a_slope) * sqrt(alt.a_r2) END, 6) AS agg_linear_trend_rvalue,
  round(alt.a_se, 6) AS agg_linear_trend_stderr,
  round(pc6.ac1, 6) AS autocorrelation_lag1,
  round(pc6.ac2, 6) AS autocorrelation_lag2,
  round(pc6.ac3, 6) AS autocorrelation_lag3,
  round(pc6.ac4, 6) AS autocorrelation_lag4,
  round(pc6.ac5, 6) AS autocorrelation_lag5,
  round(pc6.ac6, 6) AS autocorrelation_lag6,
  round(pc6.ac7, 6) AS autocorrelation_lag7,
  round(pc6.ac8, 6) AS autocorrelation_lag8,
  round(pc6.ac9, 6) AS autocorrelation_lag9,
  round(pc6.ac10, 6) AS autocorrelation_lag10,
  round(pc6.ac1, 6) AS partial_autocorrelation_lag1,
  round(pc6.p22, 6) AS partial_autocorrelation_lag2,
  round(pc6.p33, 6) AS partial_autocorrelation_lag3,
  round(pc6.p44, 6) AS partial_autocorrelation_lag4,
  round(pc6.p55, 6) AS partial_autocorrelation_lag5,
  round(CASE WHEN b.std > 0 THEN CAST(len(list_filter(b.ys, v -> abs(v - b.mean) > 1 * b.std)) AS DOUBLE) / b.nd ELSE 0.0 END, 6) AS ratio_beyond_r_sigma_1,
  round(CASE WHEN b.std > 0 THEN CAST(len(list_filter(b.ys, v -> abs(v - b.mean) > 2 * b.std)) AS DOUBLE) / b.nd ELSE 0.0 END, 6) AS ratio_beyond_r_sigma_2,
  round(CASE WHEN b.std > 0 THEN CAST(len(list_filter(b.ys, v -> abs(v - b.mean) > 3 * b.std)) AS DOUBLE) / b.nd ELSE 0.0 END, 6) AS ratio_beyond_r_sigma_3,
  round(CASE WHEN b.n > 2 THEN {fold("list_transform(range(1, b.n - 1), i -> b.ys[i + 2] * b.ys[i + 2] * b.ys[i + 1] - b.ys[i + 1] * b.ys[i] * b.ys[i])")} / (b.nd - 2) END, 2) AS time_reversal_asymmetry_stat_1,
  round(CASE WHEN b.n > 4 THEN {fold("list_transform(range(1, b.n - 3), i -> b.ys[i + 4] * b.ys[i + 4] * b.ys[i + 2] - b.ys[i + 2] * b.ys[i] * b.ys[i])")} / (b.nd - 4) END, 2) AS time_reversal_asymmetry_stat_2,
  round(CASE WHEN b.n > 6 THEN {fold("list_transform(range(1, b.n - 5), i -> b.ys[i + 6] * b.ys[i + 6] * b.ys[i + 3] - b.ys[i + 3] * b.ys[i] * b.ys[i])")} / (b.nd - 6) END, 2) AS time_reversal_asymmetry_stat_3,
  round(CASE WHEN b.n > 2 THEN {fold("list_transform(range(1, b.n - 1), i -> b.ys[i + 2] * b.ys[i + 1] * b.ys[i])")} / (b.nd - 2) END, 2) AS c3_lag1,
  round(CASE WHEN b.n > 4 THEN {fold("list_transform(range(1, b.n - 3), i -> b.ys[i + 4] * b.ys[i + 2] * b.ys[i])")} / (b.nd - 4) END, 2) AS c3_lag2,
  round(CASE WHEN b.n > 6 THEN {fold("list_transform(range(1, b.n - 5), i -> b.ys[i + 6] * b.ys[i + 3] * b.ys[i])")} / (b.nd - 6) END, 2) AS c3_lag3,
  round(fftc.fre[1], 4) AS fft_coefficient_0_real,
  round(fftc.fim[1], 4) + 0.0 AS fft_coefficient_0_imag,
  round(sqrt(fftc.fre[1] * fftc.fre[1] + fftc.fim[1] * fftc.fim[1]), 4) AS fft_coefficient_0_abs,
  round(fftc.fre[2], 4) AS fft_coefficient_1_real,
  round(fftc.fim[2], 4) AS fft_coefficient_1_imag,
  round(sqrt(fftc.fre[2] * fftc.fre[2] + fftc.fim[2] * fftc.fim[2]), 4) AS fft_coefficient_1_abs,
  round(fftc.fre[3], 4) AS fft_coefficient_2_real,
  round(fftc.fim[3], 4) AS fft_coefficient_2_imag,
  round(sqrt(fftc.fre[3] * fftc.fre[3] + fftc.fim[3] * fftc.fim[3]), 4) AS fft_coefficient_2_abs,
  round(fftc.fre[4], 4) AS fft_coefficient_3_real,
  round(fftc.fim[4], 4) AS fft_coefficient_3_imag,
  round(sqrt(fftc.fre[4] * fftc.fre[4] + fftc.fim[4] * fftc.fim[4]), 4) AS fft_coefficient_3_abs,
  round(fftc.fre[5], 4) AS fft_coefficient_4_real,
  round(fftc.fim[5], 4) AS fft_coefficient_4_imag,
  round(sqrt(fftc.fre[5] * fftc.fre[5] + fftc.fim[5] * fftc.fim[5]), 4) AS fft_coefficient_4_abs,
  round(fftc.fre[6], 4) AS fft_coefficient_5_real,
  round(fftc.fim[6], 4) AS fft_coefficient_5_imag,
  round(sqrt(fftc.fre[6] * fftc.fre[6] + fftc.fim[6] * fftc.fim[6]), 4) AS fft_coefficient_5_abs,
  round(fftc.fre[7], 4) AS fft_coefficient_6_real,
  round(fftc.fim[7], 4) AS fft_coefficient_6_imag,
  round(sqrt(fftc.fre[7] * fftc.fre[7] + fftc.fim[7] * fftc.fim[7]), 4) AS fft_coefficient_6_abs,
  round(fftc.fre[8], 4) AS fft_coefficient_7_real,
  round(fftc.fim[8], 4) AS fft_coefficient_7_imag,
  round(sqrt(fftc.fre[8] * fftc.fre[8] + fftc.fim[8] * fftc.fim[8]), 4) AS fft_coefficient_7_abs,
  round(fftc.fre[9], 4) AS fft_coefficient_8_real,
  round(fftc.fim[9], 4) AS fft_coefficient_8_imag,
  round(sqrt(fftc.fre[9] * fftc.fre[9] + fftc.fim[9] * fftc.fim[9]), 4) AS fft_coefficient_8_abs,
  round(fftc.fre[10], 4) AS fft_coefficient_9_real,
  round(fftc.fim[10], 4) AS fft_coefficient_9_imag,
  round(sqrt(fftc.fre[10] * fftc.fre[10] + fftc.fim[10] * fftc.fim[10]), 4) AS fft_coefficient_9_abs
FROM b4 b
JOIN pc6 ON b.g = pc6.g
JOIN lzv ON b.g = lzv.g
JOIN pk ON b.g = pk.g
LEFT JOIN benf ON b.g = benf.g
JOIN fftc ON b.g = fftc.g
JOIN spec ON b.g = spec.g
JOIN alt ON b.g = alt.g
JOIN lt ON b.g = lt.g
JOIN sampen ON b.g = sampen.g
JOIN apen ON b.g = apen.g
JOIN pe ON b.g = pe.g
JOIN be ON b.g = be.g
JOIN ro ON b.g = ro.g
JOIN ro2 ON b.g = ro2.g
JOIN st ON b.g = st.g
"""

def main():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    try:
        got = con.execute(SQL).fetchdf()
    except Exception as e:
        print("SQL ERROR:", e)
        sys.exit(1)
    exp = pd.read_parquet(glob.glob(f"{DUMP}/*.parquet")[0])
    got = got.sort_values("g").reset_index(drop=True)
    exp = exp.sort_values("g").reset_index(drop=True)
    bad = 0
    for c in exp.columns:
        if c not in got.columns:
            print(f"MISSING column {c}")
            bad += 1
            continue
        e = exp[c].to_numpy()
        o = got[c].to_numpy()
        if e.dtype != o.dtype:
            print(f"DTYPE {c}: spark={e.dtype} oracle={o.dtype}")
            bad += 1
        if e.dtype.kind == "f":
            ok = np.all((pd.isna(e) & pd.isna(o)) | (e == o))
        else:
            ok = np.array_equal(e, o)
        if not ok:
            print(f"VALUE {c}:\n  spark={e}\n  oracle={o}")
            bad += 1
    extra = set(got.columns) - set(exp.columns)
    if extra:
        print("EXTRA columns:", extra)
    print("mismatched columns:", bad, "of", len(exp.columns))

if __name__ == "__main__":
    main()
