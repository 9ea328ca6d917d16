"""Independent pure-Python reference checks for the round-8 operators
(SURVEY §5): a third verification path beside the DuckDB oracle — the
statistic recomputed from collected rows with naive loops, no SQL on
either side, so a shared SQL-level misunderstanding cannot hide."""

from __future__ import annotations

import math
import re

from email_etl_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMOKE

TOKEN_RE = re.compile(r"[^a-z0-9]+")


def _tokens(text: str) -> list[str]:
    return [t for t in TOKEN_RE.split((text or "").lower()) if t]


def _docs(spark):
    from email_etl_spark.io import load_table

    return load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", "lang", "text"
    ).collect()


def test_mattr_matches_naive_window_scan(spark):
    # naive: literally materialize every W-token window and average TTR
    W = 25
    per_source: dict[str, list[int]] = {}
    for r in _docs(spark):
        toks = _tokens(r["text"])
        n = len(toks)
        if n < W:
            continue
        total = sum(len(set(toks[s : s + W])) for s in range(n - W + 1))
        bps = (10000 * total) // ((n - W + 1) * W)
        per_source.setdefault(r["source"], []).append(bps)
    want = {
        s: (len(v), sum(v) // len(v), min(v), max(v)) for s, v in per_source.items()
    }
    got = {
        r["source"]: (
            r["n_docs"],
            r["avg_mattr_bps"],
            r["min_mattr_bps"],
            r["max_mattr_bps"],
        )
        for r in REGISTRY["mattr_diversity"].builder(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_band_join_matches_naive_pair_scan(spark):
    from email_etl_spark.io import load_table

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "ts"
    ).collect()
    errors = [(r["event_id"], r["user_id"], int(r["ts"].timestamp())) for r in ev if r["event_type"] == "error"]
    buys = [(r["event_id"], r["user_id"], int(r["ts"].timestamp())) for r in ev if r["event_type"] == "purchase"]
    want = sorted(
        (ae, be, bt - at)
        for ae, au, at in errors
        for be, bu, bt in buys
        if au == bu and abs(at - bt) <= 900
    )
    got = sorted(
        (r["error_event_id"], r["purchase_event_id"], r["delta_s"])
        for r in REGISTRY["band_join_events"].builder(spark, SF_SMOKE).collect()
    )
    assert got == want


def _daily_counts(spark):
    from email_etl_spark.io import load_table

    rows = (
        load_table(spark, SF_SMOKE, "events")
        .selectExpr("cast(ts as date) as d")
        .groupBy("d")
        .count()
        .orderBy("d")
        .collect()
    )
    return [float(r["count"]) for r in rows]


def test_page_hinkley_matches_python_fold(spark):
    ys = _daily_counts(spark)
    nd, total = len(ys), sum(ys)
    n = s = m = minm = 0.0
    alarm = -1.0
    for c in ys:
        x = c * nd / total
        n = n + 1
        s = s + x
        m = m + (x - (s / n) - 0.005)
        minm = min(minm, m)
        if alarm < 0 and (m - minm) > 0.1:
            alarm = n
    row = REGISTRY["page_hinkley_drift"].builder(spark, SF_SMOKE).collect()[0]
    assert row["n_days"] == nd
    assert row["ph_stat"] == round(m - minm, 4)
    assert row["drift_day"] == int(alarm)
    assert row["drifted"] == (1 if alarm >= 0 else 0)


def test_holt_winters_matches_python_fold(spark):
    a, b_, g = 0.3, 0.1, 0.2
    ys = _daily_counts(spark)
    assert len(ys) >= 15
    # same sequential op order as the engines' shared fold template
    m1 = ys[0]
    for v in ys[1:7]:
        m1 = m1 + v
    m1 = m1 / 7
    m2 = ys[7]
    for v in ys[8:14]:
        m2 = m2 + v
    m2 = m2 / 7
    l, b = m1, (m2 - m1) / 7
    s = [ys[i] - m1 for i in range(7)]
    for y in ys[14:]:
        s1 = s[0]
        lnew = a * (y - s1) + (1 - a) * (l + b)
        bnew = b_ * (lnew - l) + (1 - b_) * b
        snew = g * (y - lnew) + (1 - g) * s1
        l, b, s = lnew, bnew, s[1:] + [snew]
    row = REGISTRY["holt_winters_forecast"].builder(spark, SF_SMOKE).collect()[0]
    assert row["n_days"] == len(ys)
    assert row["level"] == round(l, 4)
    assert row["trend"] == round(b, 4)
    assert row["seasonal_next"] == round(s[0], 4)
    assert row["forecast_7d"] == round(l + 7 * b + s[6], 4)


def test_theil_decomposition_identity(spark):
    # between + within must equal total (up to the final 6dp rounding
    # of each component), and every component must be non-negative
    row = REGISTRY["theil_index_tokens"].builder(spark, SF_SMOKE).collect()[0]
    assert row["theil_total"] >= 0 and row["theil_between"] >= 0
    assert abs(row["theil_total"] - row["theil_between"] - row["theil_within"]) < 2e-6
    # independent python recomputation from raw counts
    cs = [(r["source"], len(_tokens(r["text"]))) for r in _docs(spark)]
    cs = [(s, c) for s, c in cs if c > 0]
    n, x = len(cs), sum(c for _, c in cs)
    t_total = sum((c / x) * math.log(c * n / x) for _, c in cs)
    assert abs(row["theil_total"] - t_total) < 1e-4  # pre-rounded ln terms
    by = {}
    for s, c in cs:
        ns, xs = by.get(s, (0, 0))
        by[s] = (ns + 1, xs + c)
    t_between = sum(
        (xs / x) * math.log((xs * n) / (x * ns)) for ns, xs in by.values()
    )
    assert abs(row["theil_between"] - t_between) < 1e-4


def test_rbo_matches_python_reference(spark):
    from email_etl_spark.io import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: [float(v) for v in r["embedding"]] for r in emb}
    p, K = 0.9, 20

    def rank(qid, key):
        scored = []
        for vid, v in vecs.items():
            if vid == qid:
                continue
            scored.append((key(vecs[qid], v), -vid))
        order = sorted(scored, reverse=True)
        return [-m for _, m in order[:K]]

    def cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return round(dot / math.sqrt(na * nb), 4) if na and nb else 0.0

    def dot4(a, b):
        d = 0.0
        for x, y in zip(a, b):
            d += x * y
        return round(d, 4)

    got = {
        r["query_id"]: (r["n_common"], r["rbo"])
        for r in REGISTRY["rbo_rankers"].builder(spark, SF_SMOKE).collect()
    }
    for qid in range(5):
        ra = {v: i + 1 for i, v in enumerate(rank(qid, cos))}
        rb = {v: i + 1 for i, v in enumerate(rank(qid, dot4))}
        common = set(ra) & set(rb)
        s = 0.0
        for v in common:
            m = max(ra[v], rb[v])
            w = (1 - p) * sum(p ** (d - 1) / d for d in range(m, K + 1))
            s += round(w, 6)
        assert got[qid][0] == len(common), qid
        assert abs(got[qid][1] - round(s, 4)) <= 1e-4, qid


def _r6(v: float) -> float:
    # ROUND(x, 6) in both engines is half-away-from-zero applied to the
    # SHORTEST decimal representation of the double (Java
    # BigDecimal.valueOf semantics); python's round() is half-even on
    # the binary value and diverges on 6dp halves
    import decimal

    return float(
        decimal.Decimal(repr(v)).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def test_classical_decompose_python_reference(spark):
    ys = _daily_counts(spark)
    from email_etl_spark.io import load_table

    days = sorted(
        r["d"]
        for r in load_table(spark, SF_SMOKE, "events")
        .selectExpr("cast(ts as date) as d")
        .distinct()
        .collect()
    )
    n = len(ys)
    rows = {}
    # trend + detrended (pre-rounded like the engines)
    dtr, wd = {}, {}
    for i in range(3, n - 3):
        trend = _r6(sum(ys[i - 3 : i + 4]) / 7)
        dtr[i] = _r6(ys[i] - trend)
        wd[i] = ((days[i] - __import__("datetime").date(1970, 1, 1)).days + 4) % 7
        rows[i] = trend
    import decimal as _dec

    def _dsum(vals):  # engines sum 6dp values EXACTLY as DECIMAL(18,6)
        return float(sum(_dec.Decimal(repr(v)) for v in vals))

    s6 = {}
    for w in set(wd.values()):
        vals = [dtr[i] for i in dtr if wd[i] == w]
        s6[w] = _r6(_dsum(vals) / len(vals))
    a = _r6(_dsum(s6.values()) / 7)
    got = {
        r["day"]: (r["observed"], r["trend"], r["seasonal"], r["residual"])
        for r in REGISTRY["classical_decompose_daily"].builder(spark, SF_SMOKE).collect()
    }
    assert len(got) == n - 6
    for i in range(3, n - 3):
        o, t, s, rres = got[days[i]]
        assert o == ys[i]
        assert abs(t - rows[i]) < 1e-9, (i, t, rows[i])
        assert abs(s - (s6[wd[i]] - a)) < 1e-9
        assert abs(rres - (dtr[i] - (s6[wd[i]] - a))) < 1e-9
        assert abs((t + s + rres) - o) < 1e-5  # decomposition identity


def test_mutual_information_python_reference(spark):
    from collections import Counter

    from email_etl_spark.io import load_table

    ev = load_table(spark, SF_SMOKE, "events").selectExpr(
        "event_type as t", "hour(ts) as h"
    ).collect()
    cells = Counter((r["t"], r["h"]) for r in ev)
    nn = sum(cells.values())
    ct = Counter(); ch = Counter()
    for (t, h), c in cells.items():
        ct[t] += c
        ch[h] += c
    mi = sum(
        c * round(math.log((c * nn) / (ct[t] * ch[h])), 6) for (t, h), c in cells.items()
    ) / nn
    row = REGISTRY["mutual_information_type_hour"].builder(spark, SF_SMOKE).collect()[0]
    assert row["n_events"] == nn and row["n_cells"] == len(cells)
    # e6 integer contract: half-up-toward-zero of 10^6 * the stat
    assert abs(row["mi_nats_e6"] - round(mi * 1e6)) <= 1
    assert row["mi_nats_e6"] >= 0 or abs(row["mi_nats_e6"]) < 1000
    assert row["h_type_nats_e6"] <= (math.log(len(ct)) + 1e-6) * 1e6
    assert row["h_hour_nats_e6"] <= (math.log(len(ch)) + 1e-6) * 1e6
