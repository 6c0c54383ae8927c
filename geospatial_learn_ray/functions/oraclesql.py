"""Oracle-SQL builders: the DuckDB restatements of the engine's raster /
segmentation / dedup / training pipelines (the unrolled-CTE generators).

Factored out of ``__ray_entry__.py`` (VERDICT r2 next #10) so the driver
contract file stays a thin registry; every builder is the SQL *twin* of a
stage in ``geospatial_learn_ray/stages`` and is consumed only by
``__ray_entry__.oracle_sql()`` and ``tools/check_oracles.py``. See each
docstring for the stage it restates and the exact-arithmetic techniques
(CLAUDE.md "Round-2 oracle techniques")."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..sources.pages import pages_sql
from ..sources.tiles import GRID_X, GRID_Y, tiles_sql
from ..sources.polygons import pip_sql, polygons_sql
from ..functions.rounding import round_half_away
from . import geo as _geo
from . import sqlgen as _sg
from .hashing import splitmix64 as _smx



def _located_sql(hex_res: tuple[int, ...] = (), s2: bool = False,
                 base: str = "SELECT url FROM pages") -> str:
    """Subquery producing (url, lon, lat[, cell cols]) — the SQL twin of
    geocode_and_cells. Embed under WITH pages AS (...) [, s2lut AS (...)]."""
    steps = _sg.geocode_steps()
    for r in hex_res:
        steps += _sg.hex_cell_steps(r, f"cell_h3_r{r}")
    if s2:
        steps += _sg.s2_cell_steps(12, "cell_s2_l12")
    return _sg.chain(base, steps)


def _hex_meshgrid_sql() -> str:
    """Distinct r5 cells → hexagon boundary shoelace area, restating
    geo.hex_cell_to_boundary + ring_props with engine-identical literals
    (cos/sin computed through the same numpy array path)."""
    s3 = float(np.sqrt(3.0))
    ang = np.radians(30.0 + 60.0 * np.arange(6))
    c, s = np.cos(ang), np.sin(ang)
    steps: list[tuple[str, str]] = [
        ("_ch", "CAST(cell_h3_r5 AS HUGEINT)"),
        ("_q", f"CAST((_ch // {1 << 27}) % {1 << 27} - {1 << 26} AS BIGINT)"),
        ("_r", f"CAST(_ch % {1 << 27} - {1 << 26} AS BIGINT)"),
        ("_cx", f"0.3125 * {s3!r} * (_q + _r/2.0)"),
        ("_cy", "0.3125 * 1.5 * _r"),
    ]
    for k in range(6):
        steps.append((f"_vx{k}", f"_cx + 0.3125 * {float(c[k])!r}"))
        steps.append((f"_vy{k}", f"_cy + 0.3125 * {float(s[k])!r}"))
    for k in range(6):
        j = (k + 1) % 6
        steps.append((f"_cr{k}", f"_vx{k}*_vy{j} - _vx{j}*_vy{k}"))
    steps.append(("_ar", "ABS(0.5 * (((((_cr0 + _cr1) + _cr2) + _cr3) + _cr4) + _cr5))"))
    base = f"SELECT DISTINCT cell_h3_r5 FROM ({_located_sql((5,))})"
    return (
        f"SELECT cell_h3_r5, CAST(125 AS BIGINT) AS wkb_len, ROUND(_ar, 6) AS area "
        f"FROM ({_sg.chain(base, steps)})"
    )


def _knn_pages_sql() -> str:
    """Per-cell kNN with ring-1 spill restated relationally: candidates =
    points whose home cell is within axial hex distance 1 (the exact
    candidate set of stages/knn.py replicate+group), ordered by
    (planar_dist2, neighbor id)."""
    deg = float(np.radians(1.0))
    guard = float(_geo._hex_edge(5) * np.sqrt(3.0) / 2.0)
    offs = ", ".join(f"({int(dq)},{int(dr)})" for dq, dr in _geo.hex_ring_offsets(1))
    loc = _located_sql((5,))
    return (
        f"WITH {pages_sql()}, "
        f"pts AS (SELECT url, lon, lat, _q_r5 AS q, _r_r5 AS r FROM ({loc})), "
        f"ring(dq, dr) AS (VALUES {offs}), "
        "cand AS (SELECT a.url AS u, b.url AS v, a.lon AS alon, a.lat AS alat, "
        "  b.lon AS blon, b.lat AS blat FROM pts a JOIN ring ON TRUE JOIN pts b "
        "  ON b.q - a.q = ring.dq AND b.r - a.r = ring.dr AND b.url <> a.url), "
        "d AS (SELECT u, v, "
        f"  ((alon - blon) * COS((alat + blat)/2.0 * {deg!r})) * ((alon - blon) * COS((alat + blat)/2.0 * {deg!r})) "
        "  + (alat - blat)*(alat - blat) AS d2 FROM cand), "
        "r1 AS (SELECT u, v, d2, ROW_NUMBER() OVER (PARTITION BY u ORDER BY d2, v) AS rn, "
        "  COUNT(*) OVER (PARTITION BY u) AS cnt FROM d), "
        "kth AS (SELECT u, MAX(CASE WHEN rn = 5 THEN SQRT(d2) END) AS kd FROM r1 GROUP BY u) "
        "SELECT r1.u AS url, r1.v AS neighbor_id, ROUND(SQRT(d2), 8) AS dist, "
        "CAST(rn AS BIGINT) AS rank, "
        f"(cnt >= 5 AND COALESCE(kth.kd <= {guard!r}, FALSE)) AS exact "
        "FROM r1 JOIN kth ON r1.u = kth.u WHERE rn <= 5"
    )

def _lang_id_sql(carry: tuple = ()) -> str:
    """SQL twin of functions/textproc.lang_id: per-code function-word hit
    counts (multi-char markers = whitespace-token equality, single-char CJK
    markers = substring occurrences), argmax with lexicographic tie-break,
    zero hits → 'und'. Built from the same _LANG_MARKERS dict so the two
    sides cannot drift."""
    from geospatial_learn_ray.functions.textproc import _LANG_MARKERS

    codes = sorted(_LANG_MARKERS)
    score_cols = []
    for code in codes:
        words = _LANG_MARKERS[code]
        parts = []
        multi = [w for w in words if len(w) > 1]
        if multi:
            inlist = ", ".join(f"'{w}'" for w in multi)
            parts.append(
                f"len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t IN ({inlist})))"
            )
        for w in words:
            if len(w) == 1:
                parts.append(f"(length(text) - length(replace(text, '{w}', '')))")
        score_cols.append(f"({' + '.join(parts)}) AS s_{code}")
    m = "GREATEST(" + ", ".join(f"s_{c}" for c in codes) + ")"
    case = " ".join(f"WHEN s_{c} = {m} THEN '{c}'" for c in codes)
    cc = "".join(f"{c}, " for c in carry)
    return (
        f"WITH sc AS (SELECT doc_id, {cc}{', '.join(score_cols)} FROM documents) "
        f"SELECT doc_id, {cc}CASE WHEN {m} = 0 THEN 'und' {case} END AS lang_pred FROM sc"
    )


def _simhash_pairs_sql(max_hamming: int = 3) -> str:
    """SQL twin of stages/dedup.simhash_dedup_pairs: 64-bit SimHash per doc
    (FNV-1a token hashes in HUGEINT mod 2^64 via functions/sqlgen, ±1 per
    bit summed over token OCCURRENCES, sign-packed), 4×16-bit pigeonhole
    bands, pairs sharing any band with popcount(xor) ≤ max_hamming. The
    banded self-join reproduces the engine's LSH candidate structure
    exactly — a pair missed by every band is absent on BOTH sides even if
    its hamming is ≤ the cap."""
    fnv = _sg.fnv1a64_expr("t")
    bit_sums = ", ".join(
        f"SUM(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS b{b}" for b in range(64)
    )
    sim = " + ".join(
        f"(CASE WHEN COALESCE(b{b}, 0) > 0 THEN CAST({1 << b} AS HUGEINT) ELSE 0 END)"
        for b in range(64)
    )
    band_eq = " OR ".join(
        f"(a.sim // {1 << (16 * k)}) % 65536 = (b.sim // {1 << (16 * k)}) % 65536" for k in range(4)
    )
    ham = f"bit_count(xor({_sg.u64_to_i64('a.sim')}, {_sg.u64_to_i64('b.sim')}))"
    return (
        "WITH tok AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS t FROM documents), "
        f"th AS (SELECT doc_id, {fnv} AS h FROM tok), "
        f"acc AS (SELECT doc_id, {bit_sums} FROM th GROUP BY doc_id), "
        f"sims AS (SELECT d.doc_id, ({sim}) AS sim FROM documents d LEFT JOIN acc ON d.doc_id = acc.doc_id) "
        f"SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST({ham} AS BIGINT) AS hamming "
        f"FROM sims a JOIN sims b ON a.doc_id < b.doc_id AND ({band_eq}) "
        f"WHERE {ham} <= {max_hamming}"
    )


def _rf_oob_sql(max_stumps=32, step=4, bins=32, seed=11):
    """SQL twin of stages/train.fit_bagged_stumps_oob (RF_oob_opt analogue,
    learning.py:896): the hash-derived bootstrap (splitmix64(key ^ seed_s)
    % 1000 < 632, seeds inlined), global min/max binning with numpy's
    truncation semantics (TRUNC before CAST), exact integer (stump, feature,
    bin, class) histograms, the driver's gini scan as a dense threshold
    grid (gini computed with the identical float64 op order, ties broken
    ORDER BY gini, f, t = numpy first-argmin), and the OOB signed
    cumulative-majority vote as a window SUM. ``bag`` is MATERIALIZED:
    DuckDB inlines CTEs, and the 1.9M-row splitmix chain is referenced by
    both passes."""
    B = max_stumps
    seeds = _smx(np.arange(1, B + 1, dtype=np.uint64) * np.uint64(seed))
    seed_rows = ", ".join(f"({s}, CAST({int(seeds[s])} AS HUGEINT))" for s in range(B))
    grid = list(range(step, max_stumps + 1, step))
    bag_chain = _sg.chain(
        "SELECT rid, rid_k, y, b0, b1, b2, s, seed FROM binned, stumps",
        _sg.splitmix64_steps(_sg.u64_xor("CAST(rid_k AS HUGEINT)", "seed"), "bh", "bag"),
    )
    def bin_expr(f):
        w = f"(CASE WHEN hi{f} > lo{f} THEN hi{f} - lo{f} ELSE 1.0 END)"
        return (f"LEAST(GREATEST(CAST(TRUNC((x{f} - lo{f}) / {w} * {bins}) AS BIGINT), 0), {bins - 1})")
    gini = ("CAST(nl AS DOUBLE) * 2 * pl1 * (1 - pl1) + CAST(nr AS DOUBLE) * 2 * pr1 * (1 - pr1)")
    return (
        "WITH d AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y, "
        "  l_discount::DOUBLE AS x0, l_tax::DOUBLE AS x1, l_quantity::DOUBLE AS x2, "
        "  l_orderkey * 8 + l_linenumber AS rid_k, ROW_NUMBER() OVER () AS rid FROM lineitem), "
        "mm AS (SELECT MIN(x0) lo0, MAX(x0) hi0, MIN(x1) lo1, MAX(x1) hi1, "
        "  MIN(x2) lo2, MAX(x2) hi2 FROM d), "
        "binned AS (SELECT rid, rid_k, y, "
        f"  {bin_expr(0)} AS b0, {bin_expr(1)} AS b1, {bin_expr(2)} AS b2 FROM d, mm), "
        f"stumps(s, seed) AS (VALUES {seed_rows}), "
        f"bag AS MATERIALIZED (SELECT rid, y, b0, b1, b2, s, (bh % 1000) < 632 AS inbag FROM ({bag_chain})), "
        "hist AS (SELECT s, f.range AS f, CASE f.range WHEN 0 THEN b0 WHEN 1 THEN b1 ELSE b2 END AS b, "
        "  y, COUNT(*) AS c FROM bag, range(0, 3) f WHERE inbag GROUP BY 1, 2, 3, 4), "
        "tots AS (SELECT s, f, SUM(CASE WHEN y = 0 THEN c ELSE 0 END) AS t0, "
        "  SUM(CASE WHEN y = 1 THEN c ELSE 0 END) AS t1 FROM hist GROUP BY s, f), "
        f"thr AS (SELECT s, f, g.range AS t FROM tots, range(0, {bins}) g), "
        "cum AS (SELECT thr.s, thr.f, thr.t, "
        "  COALESCE(SUM(CASE WHEN hist.y = 0 THEN hist.c END), 0) AS cl0, "
        "  COALESCE(SUM(CASE WHEN hist.y = 1 THEN hist.c END), 0) AS cl1 "
        "  FROM thr LEFT JOIN hist ON hist.s = thr.s AND hist.f = thr.f AND hist.b <= thr.t "
        "  GROUP BY thr.s, thr.f, thr.t), "
        "gin0 AS (SELECT cum.s, cum.f, cum.t, cl0 + cl1 AS nl, (t0 + t1) - (cl0 + cl1) AS nr, "
        "  cl1, t1 - cl1 AS cr1 FROM cum JOIN tots ON tots.s = cum.s AND tots.f = cum.f), "
        "gin AS (SELECT s, f, t, "
        "  CASE WHEN nl > 0 THEN CAST(cl1 AS DOUBLE) / CAST(nl AS DOUBLE) ELSE 0.0 END AS pl1, "
        "  CASE WHEN nr > 0 THEN CAST(cr1 AS DOUBLE) / CAST(nr AS DOUBLE) ELSE 0.0 END AS pr1, "
        "  nl, nr FROM gin0 WHERE nl > 0 AND nr > 0), "
        f"scored AS (SELECT s, f, t, pl1, pr1, {gini} AS gini FROM gin), "
        "pick AS (SELECT s, f, t, CASE WHEN pl1 > 0.5 THEN 1 ELSE 0 END AS lc, "
        "  CASE WHEN pr1 > 0.5 THEN 1 ELSE 0 END AS rc, "
        "  ROW_NUMBER() OVER (PARTITION BY s ORDER BY gini, f, t) AS rn FROM scored), "
        "model AS (SELECT s, f, t, lc, rc FROM pick WHERE rn = 1), "
        "votes AS (SELECT bag.rid, bag.y, bag.s, "
        "  CASE WHEN NOT inbag THEN (CASE WHEN (CASE WHEN "
        "    (CASE model.f WHEN 0 THEN b0 WHEN 1 THEN b1 ELSE b2 END) <= model.t "
        "    THEN model.lc ELSE model.rc END) = 1 THEN 1 ELSE -1 END) ELSE 0 END AS v, "
        "  CASE WHEN NOT inbag THEN 1 ELSE 0 END AS hv "
        "  FROM bag JOIN model ON model.s = bag.s), "
        "cumv AS (SELECT rid, y, s, SUM(v) OVER w AS cum, SUM(hv) OVER w AS nv FROM votes "
        "  WINDOW w AS (PARTITION BY rid ORDER BY s ROWS UNBOUNDED PRECEDING)), "
        f"atm AS (SELECT s + 1 AS m, y, cum, nv FROM cumv WHERE s + 1 IN ({', '.join(map(str, grid))})), "
        "agg AS (SELECT m, SUM(CASE WHEN (CASE WHEN cum > 0 THEN 1 ELSE 0 END) <> y AND nv > 0 "
        "  THEN 1 ELSE 0 END) AS err, SUM(CASE WHEN nv > 0 THEN 1 ELSE 0 END) AS n FROM atm GROUP BY m) "
        "SELECT m::BIGINT AS n_estimators, "
        "ROUND(CAST(err AS DOUBLE) / GREATEST(CAST(n AS DOUBLE), 1.0), 6) AS oob_error "
        "FROM agg ORDER BY m"
    )



def _planted_base_ctes(dim=64):
    """CTE chain producing ``base(vec_id, e DOUBLE[])`` = embeddings plus
    the planted perturbed copies (sources/embeddings.with_planted_dups):
    splitmix64 noise chain, float32 round-trip IEEE-identical in DuckDB."""
    noise_chain = _sg.chain(
        "SELECT vec_id, j, e FROM plj",
        _sg.splitmix64_steps(f"CAST(vec_id * {dim} + j AS HUGEINT)", "nh", "pl"),
    )
    return [
        "rawb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)",
        f"plj AS (SELECT vec_id, unnest(range(0, {dim})) AS j, e FROM rawb WHERE vec_id % 10 = 0)",
        f"pln AS (SELECT vec_id, j, CAST(e[j + 1] * (1.0 + (CAST(nh AS DOUBLE) / {float(2.0**64)!r} - 0.5) * 0.01) AS FLOAT) AS pv "
        f"  FROM ({noise_chain}))",
        "planted AS (SELECT vec_id + 1000000 AS vec_id, list(CAST(pv AS DOUBLE) ORDER BY j) AS e "
        "  FROM pln GROUP BY vec_id)",
        "base AS MATERIALIZED (SELECT vec_id, e FROM rawb UNION ALL SELECT vec_id, e FROM planted)",
    ]


def _ivf_centroid_ctes(n_centroids=16, iters=5, seed=3, permille=200, base_ctes=None,
                       pfx=""):
    """Shared CTE chain for knn.ivf_build_centroids' deterministic
    k-means-lite: id-hash sample (splitmix64 chains, seeds inlined), init
    = the n_centroids smallest init-hash sample vectors, the iterations
    unrolled as CTE blocks (argmax assign with first-max tie order, AVG
    means renormalized, empty clusters keep the previous centroid).
    Returns the CTE list ending in ``{pfx}cf`` (the final codebook) plus
    the all-vector assignment CTEs ``{pfx}aa`` (vec_id → cluster c).
    ``base_ctes`` overrides the input chain; its final CTE must be
    ``base(vec_id, e DOUBLE[])``. ``pfx`` prefixes every CTE name so the
    chain composes with the PQ chain (ivfpq)."""
    seed_a = int(_smx(np.array([seed], np.uint64))[0])
    seed_b = int(_smx(np.array([seed + 1], np.uint64))[0])

    def N(s: str) -> str:
        return pfx + s

    hs = _sg.chain(
        "SELECT vec_id, e FROM base",
        [*_sg.splitmix64_steps(_sg.u64_xor("CAST(vec_id AS HUGEINT)", str(seed_a)), "h_s", "sa" + pfx),
         *_sg.splitmix64_steps(_sg.u64_xor("CAST(vec_id AS HUGEINT)", str(seed_b)), "h_i", "sb" + pfx)],
    )
    ctes = list(base_ctes) if base_ctes is not None else [
        "base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)"]
    ctes += [
        f"{N('hs')} AS ({hs})",
        f"{N('samp')} AS (SELECT vec_id, e, ROW_NUMBER() OVER (ORDER BY h_i) AS ir FROM {N('hs')} WHERE h_s % 1000 < {permille})",
        f"{N('sn')} AS (SELECT vec_id, SQRT(list_aggregate(list_transform(e, x -> x*x), 'sum')) AS nrm FROM {N('samp')})",
        f"{N('se')} AS MATERIALIZED (SELECT s.vec_id, unnest(range(1, 65)) AS j, s.e AS el, s.ir FROM {N('samp')} s)",
        f"{N('sx')} AS MATERIALIZED (SELECT se.vec_id, se.j, se.el[se.j] / sn.nrm AS x, se.ir "
        f"FROM {N('se')} se JOIN {N('sn')} sn ON sn.vec_id = se.vec_id)",
        f"{N('c0')} AS (SELECT ir - 1 AS c, j, x AS v FROM {N('sx')} WHERE ir <= {n_centroids})",
    ]
    for t in range(1, iters + 1):
        p = N(f"c{t-1}")
        ctes += [
            f"{N(f'd{t}')} AS (SELECT sx.vec_id, cc.c, SUM(sx.x * cc.v) AS dot FROM {N('sx')} sx JOIN {p} cc ON cc.j = sx.j GROUP BY 1, 2)",
            f"{N(f'a{t}')} AS (SELECT vec_id, c FROM (SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, c ASC) AS rn FROM {N(f'd{t}')}) WHERE rn = 1)",
            f"{N(f'm{t}')} AS (SELECT a.c, sx.j, AVG(sx.x) AS mv FROM {N(f'a{t}')} a JOIN {N('sx')} sx ON sx.vec_id = a.vec_id GROUP BY 1, 2)",
            f"{N(f'nz{t}')} AS (SELECT c, SQRT(SUM(mv * mv)) AS nn FROM {N(f'm{t}')} GROUP BY c)",
            f"{N(f'c{t}')} AS (SELECT p.c, p.j, CASE WHEN n2.nn IS NOT NULL THEN m.mv / n2.nn ELSE p.v END AS v "
            f"  FROM {p} p LEFT JOIN {N(f'm{t}')} m ON m.c = p.c AND m.j = p.j LEFT JOIN {N(f'nz{t}')} n2 ON n2.c = p.c)",
        ]
    ctes += [
        f"{N('cf')} AS MATERIALIZED (SELECT * FROM {N(f'c{iters}')})",
        f"{N('ax')} AS (SELECT b.vec_id, unnest(range(1, 65)) AS j, b.e AS el FROM base b)",
        f"{N('an')} AS (SELECT vec_id, SQRT(list_aggregate(list_transform(e, x -> x*x), 'sum')) AS nrm FROM base)",
        f"{N('ae')} AS (SELECT ax.vec_id, ax.j, ax.el[ax.j] / an.nrm AS x FROM {N('ax')} ax JOIN {N('an')} an ON an.vec_id = ax.vec_id)",
        f"{N('ad')} AS (SELECT ae.vec_id, cf.c, SUM(ae.x * cf.v) AS dot FROM {N('ae')} ae JOIN {N('cf')} cf ON cf.j = ae.j GROUP BY 1, 2)",
        f"{N('aa')} AS MATERIALIZED (SELECT vec_id, c FROM (SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, c ASC) AS rn FROM {N('ad')}) WHERE rn = 1)",
    ]
    return ctes


def _ann_ivf_sql(n_centroids=16, iters=5, seed=3, k=10, nprobe=4, permille=200):
    """SQL twin of knn.ivf_build_centroids + ivf_topk (and ivf_topk_store —
    the store route reads the same vectors from the partitioned layout, so
    one oracle serves both): the shared ``_ivf_centroid_ctes`` chain, then
    nprobe centroid probing and exact cosine top-k over probed lists via
    list_cosine_similarity. Engine cosines round half-away; float ulp
    drift across the 5 iterations is orders of magnitude below the
    assignment margins on this fixture."""
    ctes = _ivf_centroid_ctes(n_centroids, iters, seed, permille)
    ctes += [
        "qs AS (SELECT vec_id AS qid, e FROM base WHERE vec_id % 50 = 0)",
        "qn AS (SELECT qid, SQRT(list_aggregate(list_transform(e, x -> x*x), 'sum')) AS nrm FROM qs)",
        "qx AS (SELECT q.qid, unnest(range(1, 65)) AS j, q.e AS el FROM qs q)",
        "qe AS (SELECT qx.qid, qx.j, qx.el[qx.j] / qn.nrm AS x FROM qx JOIN qn ON qn.qid = qx.qid)",
        "pd AS (SELECT qe.qid, cf.c, SUM(qe.x * cf.v) AS dot FROM qe JOIN cf ON cf.j = qe.j GROUP BY 1, 2)",
        f"pr AS (SELECT qid, c FROM (SELECT qid, c, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, c ASC) AS rn FROM pd) WHERE rn <= {nprobe})",
        "cand AS (SELECT pr.qid, aa.vec_id FROM pr JOIN aa ON aa.c = pr.c)",
        "cosv AS (SELECT cand.qid, cand.vec_id, "
        "  list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(x.embedding AS DOUBLE[])) AS cosr "
        "  FROM cand JOIN embeddings q ON q.vec_id = cand.qid JOIN embeddings x ON x.vec_id = cand.vec_id)",
        "rk AS (SELECT qid, vec_id, cosr, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosr DESC, vec_id ASC) AS rnk FROM cosv)",
    ]
    return ("WITH " + ", ".join(ctes)
            + f" SELECT qid AS query_id, vec_id AS neighbor_id, ROUND(cosr, 6) AS cosine, rnk AS rank FROM rk WHERE rnk <= {k}")


def _rle_audit_sql() -> str:
    """SQL twin of agg.rle_runs_audit: runs = 1 + count of value changes
    in key order (o_orderkey is unique — a total order)."""
    def runs(c: str) -> str:
        return (f"SELECT '{c}' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows, "
                "CAST(SUM(chg) + 1 AS BIGINT) AS n_runs FROM ("
                f"SELECT CASE WHEN CAST({c} AS VARCHAR) <> "
                f"LAG(CAST({c} AS VARCHAR)) OVER (ORDER BY o_orderkey) "
                "THEN 1 ELSE 0 END AS chg FROM orders)"
                )

    return " UNION ALL ".join(
        runs(c) for c in ("o_orderstatus", "o_orderpriority", "o_custkey"))


def _ivfpq_sql(k=10, nprobe=4, n_centroids=16, ivf_iters=5,
               n_sub=4, ks=8, pq_iters=3, seed=3, permille=200) -> str:
    """SQL twin of knn.ivfpq_topk: the prefixed IVF chain (ivcf/ivaa)
    composes with the prefixed PQ chain (pqcf/pqaa/pqae) over ONE shared
    base; probing ranks centroid dots (DESC, c ASC), candidates are the
    probed lists' members, ADC scores the reconstructed code vectors
    with the ROUND-6-before-rank discipline."""
    ctes = ["base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)"]
    ctes += _ivf_centroid_ctes(n_centroids, ivf_iters, seed, permille,
                               base_ctes=[], pfx="iv")
    ctes += _pq_code_ctes(n_sub, ks, pq_iters, seed, permille,
                          include_base=False, pfx="pq")
    ctes += [
        "qp AS (SELECT vec_id AS qid, j, x FROM ivae WHERE vec_id % 50 = 0)",
        "qd AS (SELECT qp.qid, cf.c, SUM(qp.x * cf.v) AS dot "
        "  FROM qp JOIN ivcf cf ON cf.j = qp.j GROUP BY 1, 2)",
        "qpr AS (SELECT qid, c FROM (SELECT qid, c, ROW_NUMBER() OVER "
        f"  (PARTITION BY qid ORDER BY dot DESC, c ASC) AS rn FROM qd) WHERE rn <= {nprobe})",
        "cand AS (SELECT qpr.qid, a.vec_id FROM qpr JOIN ivaa a ON a.c = qpr.c)",
        "pqq AS (SELECT vec_id AS qid, j, x FROM pqae WHERE vec_id % 50 = 0)",
        "rc2 AS MATERIALIZED (SELECT a.vec_id, cf.j, cf.v FROM pqaa a "
        "  JOIN pqcf cf ON cf.m = a.m AND cf.c = a.c)",
        "sc2 AS (SELECT c.qid, c.vec_id, ROUND(SUM(q.x * r.v), 6) AS s "
        "  FROM cand c JOIN rc2 r ON r.vec_id = c.vec_id "
        "  JOIN pqq q ON q.qid = c.qid AND q.j = r.j GROUP BY 1, 2)",
        "rk2 AS (SELECT qid, vec_id, s, ROW_NUMBER() OVER "
        "  (PARTITION BY qid ORDER BY s DESC, vec_id ASC) AS rnk FROM sc2)",
    ]
    return ("WITH " + ", ".join(ctes)
            + " SELECT qid AS query_id, vec_id AS neighbor_id, s AS cosine, "
            f"rnk AS rank FROM rk2 WHERE rnk <= {k}")


def _semdedup_sql(n_centroids=16, iters=5, seed=3, permille=200, threshold=0.95):
    """SQL twin of dedup.semdedup over the planted-dup layer
    (sources/embeddings.with_planted_dups — the raw fixture has no
    near-dups, max pairwise cosine ≈0.51): the shared
    ``_ivf_centroid_ctes`` chain on the planted base (identical centroids
    + all-vector assignment ``aa``), within-cluster pairs whose
    ROUND(cosine, 6) ≥ threshold (the engine rounds half-away before
    comparing — same value both sides), recursive transitive closure per
    component (components cannot span clusters by construction), rep =
    MIN reachable id, singletons rep = self."""
    ctes = _ivf_centroid_ctes(n_centroids, iters, seed, permille,
                              base_ctes=_planted_base_ctes())
    ctes += [
        "sp AS MATERIALIZED (SELECT a1.vec_id AS id_a, a2.vec_id AS id_b "
        "  FROM aa a1 JOIN aa a2 ON a1.c = a2.c AND a1.vec_id < a2.vec_id "
        "  JOIN base b1 ON b1.vec_id = a1.vec_id "
        "  JOIN base b2 ON b2.vec_id = a2.vec_id "
        "  WHERE ROUND(list_cosine_similarity(b1.e, b2.e), 6) "
        f"    >= CAST({threshold!r} AS DOUBLE))",
        "cnodes AS (SELECT id_a AS node FROM sp UNION SELECT id_b FROM sp)",
        "cedges AS (SELECT id_a AS u, id_b AS v FROM sp "
        "  UNION SELECT id_b AS u, id_a AS v FROM sp)",
        "reach AS (SELECT node, node AS anc FROM cnodes "
        "  UNION SELECT r.node, e.v AS anc FROM reach r JOIN cedges e ON e.u = r.anc)",
        "comp AS (SELECT node, MIN(anc) AS component_id FROM reach GROUP BY node)",
    ]
    return ("WITH RECURSIVE " + ", ".join(ctes)
            + " SELECT aa.vec_id, CAST(aa.c AS BIGINT) AS cluster_id, "
            "COALESCE(comp.component_id, aa.vec_id) AS rep_id, "
            "CAST(CASE WHEN COALESCE(comp.component_id, aa.vec_id) = aa.vec_id "
            "THEN 1 ELSE 0 END AS BIGINT) AS keep "
            "FROM aa LEFT JOIN comp ON comp.node = aa.vec_id")


def _pq_topk_sql(n_sub=4, ks=8, iters=3, seed=3, k=10, permille=200, dim=64):
    """SQL twin of knn.pq_train + pq_encode_stage + pq_topk: the same
    id-hash sample and init-hash order as the IVF oracle, per-SUBSPACE
    k-means unrolled (subspace id m = (j-1)//dsub is just one more GROUP
    BY key), L2 assignment as SUM(v²)−2·SUM(x·v) with (dist ASC, c ASC)
    tie order, plain means (no renorm — PQ centroids aren't unit), codes
    for ALL vectors from the final codebook, and ADC scores via the
    code→codebook reconstruction join. Scores are ROUNDed to 6 BEFORE
    ranking on both sides: equal-coded vectors tie exactly and break by
    vec_id; sub-1e-6 cross-code gaps collapse into the same deterministic
    tiebreak (full-precision ordering would let a SUM-order ulp flip a
    boundary rank between engine and SQL)."""
    ctes = _pq_code_ctes(n_sub, ks, iters, seed, permille, dim,
                         include_base=True)
    ctes += [
        "qe AS MATERIALIZED (SELECT vec_id AS qid, m, j, x FROM ae WHERE vec_id % 50 = 0)",
        "rc AS MATERIALIZED (SELECT aa.vec_id, cf.j, cf.v FROM aa JOIN cf ON cf.m = aa.m AND cf.c = aa.c)",
        "sc AS (SELECT qe.qid, rc.vec_id, ROUND(SUM(qe.x * rc.v), 6) AS s "
        "  FROM rc JOIN qe ON qe.j = rc.j GROUP BY 1, 2)",
        "rk AS (SELECT qid, vec_id, s, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s DESC, vec_id ASC) AS rnk FROM sc)",
    ]
    return ("WITH " + ", ".join(ctes)
            + f" SELECT qid AS query_id, vec_id AS neighbor_id, s AS cosine, rnk AS rank FROM rk WHERE rnk <= {k}")


def _pq_code_ctes(n_sub=4, ks=8, iters=3, seed=3, permille=200, dim=64,
                  include_base=True, pfx=""):
    """PQ training + all-vector code CTE chain (factored from
    _pq_topk_sql): ends with ``{pfx}cf`` (codebooks), ``{pfx}aa`` (codes)
    and ``{pfx}ae`` (normalized components). ``pfx`` prefixes every CTE
    name so the chain composes with the IVF chain (ivfpq)."""
    dsub = dim // n_sub
    seed_a = int(_smx(np.array([seed], np.uint64))[0])
    seed_b = int(_smx(np.array([seed + 1], np.uint64))[0])

    def N(s: str) -> str:
        return pfx + s

    hs = _sg.chain(
        "SELECT vec_id, e FROM base",
        [*_sg.splitmix64_steps(_sg.u64_xor("CAST(vec_id AS HUGEINT)", str(seed_a)), "h_s", "sa" + pfx),
         *_sg.splitmix64_steps(_sg.u64_xor("CAST(vec_id AS HUGEINT)", str(seed_b)), "h_i", "sb" + pfx)],
    )
    ctes = ["base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)"] if include_base else []
    ctes += [
        f"{N('hs')} AS ({hs})",
        f"{N('samp')} AS (SELECT vec_id, e, ROW_NUMBER() OVER (ORDER BY h_i) AS ir FROM {N('hs')} WHERE h_s % 1000 < {permille})",
        f"{N('sn')} AS (SELECT vec_id, SQRT(list_aggregate(list_transform(e, x -> x*x), 'sum')) AS nrm FROM {N('samp')})",
        f"{N('se')} AS MATERIALIZED (SELECT s.vec_id, unnest(range(1, {dim + 1})) AS j, s.e AS el, s.ir FROM {N('samp')} s)",
        f"{N('sx')} AS MATERIALIZED (SELECT se.vec_id, (se.j - 1) // {dsub} AS m, se.j, "
        f"  se.el[se.j] / sn.nrm AS x, se.ir FROM {N('se')} se JOIN {N('sn')} sn ON sn.vec_id = se.vec_id)",
        f"{N('c0')} AS (SELECT m, ir - 1 AS c, j, x AS v FROM {N('sx')} WHERE ir <= {ks})",
    ]
    for t in range(1, iters + 1):
        p = N(f"c{t-1}")
        ctes += [
            f"{N(f'd{t}')} AS (SELECT sx.vec_id, cc.m, cc.c, SUM(cc.v*cc.v) - 2*SUM(sx.x*cc.v) AS dist "
            f"  FROM {N('sx')} sx JOIN {p} cc ON cc.m = sx.m AND cc.j = sx.j GROUP BY 1, 2, 3)",
            f"{N(f'a{t}')} AS (SELECT vec_id, m, c FROM (SELECT vec_id, m, c, "
            f"  ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist ASC, c ASC) AS rn FROM {N(f'd{t}')}) WHERE rn = 1)",
            f"{N(f'm{t}')} AS (SELECT a.m, a.c, sx.j, AVG(sx.x) AS mv FROM {N(f'a{t}')} a "
            f"  JOIN {N('sx')} sx ON sx.vec_id = a.vec_id AND sx.m = a.m GROUP BY 1, 2, 3)",
            f"{N(f'c{t}')} AS (SELECT p.m, p.c, p.j, COALESCE(mm.mv, p.v) AS v FROM {p} p "
            f"  LEFT JOIN {N(f'm{t}')} mm ON mm.m = p.m AND mm.c = p.c AND mm.j = p.j)",
        ]
    ctes += [
        f"{N('cf')} AS MATERIALIZED (SELECT * FROM {N(f'c{iters}')})",
        f"{N('an')} AS (SELECT vec_id, SQRT(list_aggregate(list_transform(e, x -> x*x), 'sum')) AS nrm FROM base)",
        f"{N('ax')} AS MATERIALIZED (SELECT b.vec_id, unnest(range(1, {dim + 1})) AS j, b.e AS el FROM base b)",
        f"{N('ae')} AS MATERIALIZED (SELECT ax.vec_id, (ax.j - 1) // {dsub} AS m, ax.j, "
        f"  ax.el[ax.j] / an.nrm AS x FROM {N('ax')} ax JOIN {N('an')} an ON an.vec_id = ax.vec_id)",
        f"{N('ad')} AS (SELECT ae.vec_id, cf.m, cf.c, SUM(cf.v*cf.v) - 2*SUM(ae.x*cf.v) AS dist "
        f"  FROM {N('ae')} ae JOIN {N('cf')} cf ON cf.m = ae.m AND cf.j = ae.j GROUP BY 1, 2, 3)",
        f"{N('aa')} AS MATERIALIZED (SELECT vec_id, m, c FROM (SELECT vec_id, m, c, "
        f"  ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist ASC, c ASC) AS rn FROM {N('ad')}) WHERE rn = 1)",
    ]
    return ctes



def _ccl_ctes(quant=2.0, side=16, rounds=20, tx_max=15, ty_max=15, qexpr=None,
              rc_sql=None, include_tiles=True):
    """Per-tile connected-component labeling of the clipped closed-form
    raster as UNROLLED min-label rounds (neighbor-min + two pointer jumps
    per round, every round MATERIALIZED - DuckDB inlines CTEs and each
    round references the previous twice, which explodes 4^t without it).
    The fixpoint is the per-region min pixel index - the engine's label -
    independent of schedule; this raster converges at 16 rounds (measured;
    the raster is closed-form, so the count is a constant of the fixture),
    20 gives margin. Ends with ``fin(tile_x, tile_y, idx, lab, q, vd)``.
    Shared by the polygonize and ragmerge oracles."""
    if qexpr is None:
        qexpr = f"FLOOR(vd * {quant!r})"
    if rc_sql is None:
        rc_sql = (f"SELECT tile_x, tile_y, py * {side} + px AS idx, "
                  f"{qexpr} AS q, vd FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}")
    ctes = ([tiles_sql(side)] if include_tiles else []) + [
        f"rc AS MATERIALIZED ({rc_sql})",
        "edg AS MATERIALIZED ("
        "  SELECT a.tile_x, a.tile_y, a.idx AS u, b.idx AS v FROM rc a JOIN rc b "
        f"    ON b.tile_x = a.tile_x AND b.tile_y = a.tile_y AND b.q = a.q AND ("
        f"      (b.idx = a.idx + 1 AND a.idx % {side} < {side - 1}) OR "
        f"      (b.idx = a.idx - 1 AND a.idx % {side} > 0) OR "
        f"      b.idx = a.idx + {side} OR b.idx = a.idx - {side}))",
        "l0 AS (SELECT tile_x, tile_y, idx, idx AS lab FROM rc)",
    ]
    for t in range(1, rounds + 1):
        p = f"l{t-1}"
        ctes += [
            f"n{t} AS MATERIALIZED (SELECT l.tile_x, l.tile_y, l.idx, "
            f"  LEAST(MIN(l.lab), COALESCE(MIN(ln.lab), MIN(l.lab))) AS lab "
            f"  FROM {p} l LEFT JOIN edg e ON e.tile_x = l.tile_x AND e.tile_y = l.tile_y AND e.u = l.idx "
            f"  LEFT JOIN {p} ln ON ln.tile_x = l.tile_x AND ln.tile_y = l.tile_y AND ln.idx = e.v "
            f"  GROUP BY l.tile_x, l.tile_y, l.idx)",
            f"j{t} AS MATERIALIZED (SELECT a.tile_x, a.tile_y, a.idx, LEAST(a.lab, b.lab) AS lab FROM n{t} a "
            f"  JOIN n{t} b ON b.tile_x = a.tile_x AND b.tile_y = a.tile_y AND b.idx = a.lab)",
            f"l{t} AS MATERIALIZED (SELECT a.tile_x, a.tile_y, a.idx, LEAST(a.lab, b.lab) AS lab FROM j{t} a "
            f"  JOIN j{t} b ON b.tile_x = a.tile_x AND b.tile_y = a.tile_y AND b.idx = a.lab)",
        ]
    ctes += [
        f"fin AS (SELECT l.tile_x, l.tile_y, l.idx, l.lab, rc.q, rc.vd FROM l{rounds} l "
        "  JOIN rc ON rc.tile_x = l.tile_x AND rc.tile_y = l.tile_y AND rc.idx = l.idx)",
    ]
    return ctes


def _polygonize_tiles_sql(quant=2.0, side=16, rounds=20, tx_max=15, ty_max=15):
    """SQL twin of raster.polygonize_tiles (see _ccl_ctes).
    region_value = floor(v*quant)/quant is dyadic-exact."""
    ctes = _ccl_ctes(quant, side, rounds, tx_max, ty_max)
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT tile_x::BIGINT AS tile_x, tile_y::BIGINT AS tile_y, lab AS region_label, "
        f"ANY_VALUE(q) / {quant!r} AS region_value, COUNT(*) AS pixel_count, "
        f"MIN(idx // {side}) AS row_min, MAX(idx // {side}) AS row_max, "
        f"MIN(idx % {side}) AS col_min, MAX(idx % {side}) AS col_max "
        "FROM fin GROUP BY tile_x, tile_y, lab"
    )


def _utm_sql() -> str:
    """SQL twin of raster.reproject_points_utm (Karney order-3 Krüger
    series): the IDENTICAL float chain — sinh/cosh/atanh/asinh as the same
    exp/ln compositions, series constants inlined as numpy-computed f64
    literals, multiplication order matching the engine's left-to-right
    evaluation — then the same f32 snap + decimeter half-away round."""
    from ..stages import raster

    R = repr(float(np.radians(1.0)))
    C1 = repr(raster._UTM_C1)
    C1H = repr(raster._UTM_C1 * 0.5)
    A1, A2, A3 = repr(raster._UTM_A1), repr(raster._UTM_A2), repr(raster._UTM_A3)
    K0AA = repr(raster._UTM_K0 * raster._UTM_AA)
    return (
        f"WITH {pages_sql()}, "
        f"u0 AS (SELECT url, lon, lat FROM ({_located_sql()})), "
        "u1 AS (SELECT url, lon, lat, "
        "  LEAST(GREATEST(CAST(FLOOR((lon + 180.0) / 6.0) AS BIGINT) + 1, 1), 60) AS zone FROM u0), "
        f"u2 AS (SELECT *, lat * {R} AS la, (lon - (zone * 6.0 - 183.0)) * {R} AS lp FROM u1), "
        "u3 AS (SELECT *, SIN(la) AS s FROM u2), "
        f"u4 AS (SELECT *, 0.5 * LN((1.0 + s) / (1.0 - s)) - {C1H} * LN((1.0 + {C1} * s) / (1.0 - {C1} * s)) AS ath FROM u3), "
        "u5 AS (SELECT *, (EXP(ath) - EXP(-ath)) / 2.0 AS t FROM u4), "
        "u6 AS (SELECT *, ATAN2(t, COS(lp)) AS xip, "
        "  SIN(lp) / SQRT(t * t + COS(lp) * COS(lp)) AS w FROM u5), "
        "u7 AS (SELECT *, LN(w + SQRT(w * w + 1.0)) AS etap FROM u6), "
        "u8 AS (SELECT *, EXP(2.0 * etap) AS g2, EXP(4.0 * etap) AS g4, EXP(6.0 * etap) AS g6 FROM u7), "
        "u9 AS (SELECT *, "
        f"  xip + {A1} * SIN(2.0 * xip) * ((g2 + 1.0 / g2) / 2.0) "
        f"      + {A2} * SIN(4.0 * xip) * ((g4 + 1.0 / g4) / 2.0) "
        f"      + {A3} * SIN(6.0 * xip) * ((g6 + 1.0 / g6) / 2.0) AS xi, "
        f"  etap + {A1} * COS(2.0 * xip) * ((g2 - 1.0 / g2) / 2.0) "
        f"       + {A2} * COS(4.0 * xip) * ((g4 - 1.0 / g4) / 2.0) "
        f"       + {A3} * COS(6.0 * xip) * ((g6 - 1.0 / g6) / 2.0) AS eta FROM u8) "
        "SELECT url, zone AS utm_zone, "
        f"ROUND(CAST(CAST(500000.0 + {K0AA} * eta AS REAL) AS DOUBLE), 1) AS utm_e, "
        f"ROUND(CAST(CAST({K0AA} * xi + CASE WHEN lat < 0.0 THEN 10000000.0 ELSE 0.0 END "
        "  AS REAL) AS DOUBLE), 1) AS utm_n FROM u9"
    )


def _remove_small_objects_sql(quant=2.0, tbin=1, min_size=6, side=16,
                              rounds=20, tx_max=15, ty_max=15):
    """SQL twin of raster.remove_small_objects_stage: the same CCL rounds
    over the BINARY foreground mask (q = 1 iff floor(v*quant) >= tbin, an
    exact integer compare), keep foreground regions with area >=
    min_size."""
    ctes = _ccl_ctes(
        quant, side, rounds, tx_max, ty_max,
        qexpr=f"CASE WHEN FLOOR(vd * {quant!r}) >= {tbin} THEN 1 ELSE 0 END",
    )
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT tile_x::BIGINT AS tile_x, tile_y::BIGINT AS tile_y, lab AS region_label, "
        "COUNT(*) AS pixel_count, "
        f"MIN(idx // {side}) AS row_min, MAX(idx // {side}) AS row_max, "
        f"MIN(idx % {side}) AS col_min, MAX(idx % {side}) AS col_max "
        f"FROM fin WHERE q = 1 GROUP BY tile_x, tile_y, lab HAVING COUNT(*) >= {min_size}"
    )


def _edge_ctes(side: int, tx_max: int, ty_max: int, edge_thresh: float) -> str:
    """Shared gradient-edge CTEs for the ransac/hough oracles: clamped
    within-tile central differences (COALESCE = the engine's edge copy),
    edge mask gx²+gy² > thresh, points numbered ascending by flat pixel
    index. Ends with ``ed(tile_x, tile_y, idx, x, y, rn)``."""
    return (
        f"{tiles_sql(side)}, "
        f"rcl AS MATERIALIZED (SELECT tile_x, tile_y, py, px, vd FROM rast "
        f"  WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        "g1 AS (SELECT *, (COALESCE(LEAD(vd) OVER wx, vd) - COALESCE(LAG(vd) OVER wx, vd))/2.0 AS gx "
        "  FROM rcl WINDOW wx AS (PARTITION BY tile_x, tile_y, py ORDER BY px)), "
        "g2 AS (SELECT *, (COALESCE(LEAD(vd) OVER wy, vd) - COALESCE(LAG(vd) OVER wy, vd))/2.0 AS gy "
        "  FROM g1 WINDOW wy AS (PARTITION BY tile_x, tile_y, px ORDER BY py)), "
        f"ed AS MATERIALIZED (SELECT tile_x, tile_y, py*{side} + px AS idx, px AS x, py AS y, "
        f"  ROW_NUMBER() OVER (PARTITION BY tile_x, tile_y ORDER BY py*{side} + px) - 1 AS rn "
        f"  FROM g2 WHERE gx*gx + gy*gy > CAST({edge_thresh!r} AS DOUBLE))"
    )


def _hough_lines_sql(side=16, tx_max=15, ty_max=15, edge_thresh=0.1, n_orient=12):
    """SQL twin of raster.hough_lines_stage: (orientation, rho) accumulator
    over the shared edge points; cos/sin inlined as the numpy-computed
    float64 literals so rho = FLOOR(x·c + y·s + 0.5) bins bit-identically;
    peak by votes DESC, theta ASC, rho ASC."""
    ang = np.pi * np.arange(n_orient) / n_orient
    th = ", ".join(
        f"({j}, CAST({float(np.cos(a))!r} AS DOUBLE), CAST({float(np.sin(a))!r} AS DOUBLE))"
        for j, a in enumerate(ang)
    )
    return (
        f"WITH {_edge_ctes(side, tx_max, ty_max, edge_thresh)}, "
        f"th(j, c, s) AS (VALUES {th}), "
        "acc AS (SELECT e.tile_x, e.tile_y, th.j, "
        "  CAST(FLOOR(e.x*th.c + e.y*th.s + 0.5) AS BIGINT) AS rho, COUNT(*) AS votes "
        "  FROM ed e, th GROUP BY 1, 2, 3, 4), "
        "pick AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY tile_x, tile_y "
        "  ORDER BY votes DESC, j ASC, rho ASC) AS rr FROM acc), "
        "cnt AS (SELECT tile_x, tile_y, COUNT(*) AS n FROM ed GROUP BY 1, 2), "
        "base AS (SELECT DISTINCT tile_x, tile_y FROM rcl) "
        "SELECT b.tile_x, b.tile_y, COALESCE(c.n, 0) AS n_edge, "
        "CAST(COALESCE(p.j, -1) AS BIGINT) AS peak_theta, COALESCE(p.rho, 0) AS peak_rho, "
        "COALESCE(p.votes, 0) AS votes "
        "FROM base b LEFT JOIN cnt c USING (tile_x, tile_y) "
        "LEFT JOIN (SELECT * FROM pick WHERE rr = 1) p USING (tile_x, tile_y)"
    )


def _polygonize_edges_sql(quant=2.0, side=16, rounds=20, tx_max=15, ty_max=15):
    """SQL twin of _q_polygonize_edges: per-tile CCL labels (_ccl_ctes) →
    one directed edge per exposed cell side (region-on-left orientation,
    functions/tracing.py:27-31), neighbor-absent via LEFT JOIN within the
    tile; coordinates are global pixel corners."""
    ctes = _ccl_ctes(quant, side, rounds, tx_max, ty_max)
    dirs = [
        ("n.px = c.px AND n.py = c.py - 1", "c.gx", "c.gy", "c.gx + 1", "c.gy"),          # top
        ("n.px = c.px + 1 AND n.py = c.py", "c.gx + 1", "c.gy", "c.gx + 1", "c.gy + 1"),  # right
        ("n.px = c.px AND n.py = c.py + 1", "c.gx + 1", "c.gy + 1", "c.gx", "c.gy + 1"),  # bottom
        ("n.px = c.px - 1 AND n.py = c.py", "c.gx", "c.gy + 1", "c.gx", "c.gy"),          # left
    ]
    parts = []
    for cond, x0, y0, x1, y1 in dirs:
        parts.append(
            "SELECT CAST(c.tile_x AS BIGINT) AS tile_x, "
            "CAST(c.tile_y AS BIGINT) AS tile_y, c.lab AS region_label, "
            f"{x0} AS x0, {y0} AS y0, {x1} AS x1, {y1} AS y1 FROM cel c "
            f"LEFT JOIN cel n ON n.tile_x = c.tile_x AND n.tile_y = c.tile_y "
            f"AND {cond} AND n.lab = c.lab WHERE n.lab IS NULL"
        )
    return (
        "WITH " + ", ".join(ctes) + ", "
        f"cel AS MATERIALIZED (SELECT tile_x, tile_y, lab, idx % {side} AS px, idx // {side} AS py, "
        f"  tile_x*{side} + idx % {side} AS gx, tile_y*{side} + idx // {side} AS gy FROM fin) "
        + " UNION ALL ".join(parts)
    )


def _ms_acwe_sql(side=16, tx_max=15, ty_max=15, iterations=5,
                 lambda1=1.0, lambda2=1.0, init="circle", init_thresh=0.5):
    """SQL twin of raster.ms_acwe_stage (morphological ACWE): the fixed
    iteration count unrolls as MATERIALIZED CTE blocks — per iteration a
    means CTE (exact f32-valued sums → bit-identical c1/c2), a level-set
    update, and two morphological passes (3×3 cross SE = LEAST/GREATEST of
    the two separable ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING windows,
    which shrink at tile borders exactly like the engine's clamped
    slices)."""
    R2 = (2 * side // 3) ** 2
    if init == "circle":
        init_expr = (f"(2*px - {side - 1})*(2*px - {side - 1}) "
                     f"+ (2*py - {side - 1})*(2*py - {side - 1}) <= {R2}")
    elif init == "checkerboard":
        init_expr = "(px // 4 + py // 4) % 2 = 1"
    else:
        init_expr = f"vd < CAST({init_thresh!r} AS DOUBLE)"
    ctes = [
        tiles_sql(side),
        f"s0 AS MATERIALIZED (SELECT tile_x, tile_y, py, px, vd, "
        f"  CASE WHEN {init_expr} "
        f"  THEN 1.0 ELSE 0.0 END AS u FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max})",
    ]
    wspec = (
        "WINDOW wx AS (PARTITION BY tile_x, tile_y, py ORDER BY px ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), "
        "wy AS (PARTITION BY tile_x, tile_y, px ORDER BY py ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)"
    )
    for t in range(1, iterations + 1):
        p = f"s{t - 1}"
        ctes.append(
            f"m{t} AS MATERIALIZED (SELECT tile_x, tile_y, "
            "CASE WHEN SUM(u) > 0 THEN SUM(vd*u)/SUM(u) ELSE 0.0 END AS c1, "
            "CASE WHEN SUM(1.0 - u) > 0 THEN SUM(vd*(1.0 - u))/SUM(1.0 - u) ELSE 0.0 END AS c2 "
            f"FROM {p} GROUP BY 1, 2)"
        )
        ctes.append(
            f"u{t} AS MATERIALIZED (SELECT s.tile_x, s.tile_y, s.py, s.px, s.vd, "
            f"CASE WHEN CAST({lambda1!r} AS DOUBLE)*((s.vd - m.c1)*(s.vd - m.c1)) "
            f"< CAST({lambda2!r} AS DOUBLE)*((s.vd - m.c2)*(s.vd - m.c2)) THEN 1.0 ELSE 0.0 END AS u "
            f"FROM {p} s JOIN m{t} m USING (tile_x, tile_y))"
        )
        op1, op2 = ("MIN", "MAX") if t % 2 == 1 else ("MAX", "MIN")
        comb1 = "LEAST" if op1 == "MIN" else "GREATEST"
        comb2 = "LEAST" if op2 == "MIN" else "GREATEST"
        ctes.append(
            f"a{t} AS MATERIALIZED (SELECT tile_x, tile_y, py, px, vd, "
            f"{comb1}({op1}(u) OVER wx, {op1}(u) OVER wy) AS u FROM u{t} {wspec})"
        )
        ctes.append(
            f"s{t} AS MATERIALIZED (SELECT tile_x, tile_y, py, px, vd, "
            f"{comb2}({op2}(u) OVER wx, {op2}(u) OVER wy) AS u FROM a{t} {wspec})"
        )
    return (
        "WITH " + ", ".join(ctes) + " "
        f"SELECT tile_x, tile_y, CAST(SUM(u) AS BIGINT) AS fg_count, "
        "ROUND(CASE WHEN SUM(u) > 0 THEN SUM(vd*u)/SUM(u) ELSE 0.0 END, 6) AS mean_in "
        f"FROM s{iterations} GROUP BY 1, 2"
    )


def _ms_gac_sql(side=16, tx_max=15, ty_max=15, iterations=5, alpha=8.0,
                theta=0.3, balloon=1):
    """SQL twin of raster.ms_gac_stage: the stopping function, its
    gradient, and the balloon mask are computed once with the clamped
    central-difference windows; each iteration unrolls as balloon →
    gradient-of-u → attachment → two morph passes, every CTE
    MATERIALIZED. All comparisons are of identical float64 expressions."""
    thr = theta / abs(balloon) if balloon != 0 else float("inf")
    R2 = (2 * side // 3) ** 2
    cd = "(COALESCE(LEAD({c}) OVER {w}, {c}) - COALESCE(LAG({c}) OVER {w}, {c}))/2.0"
    wdef = (
        "WINDOW wx AS (PARTITION BY tile_x, tile_y, py ORDER BY px), "
        "wy AS (PARTITION BY tile_x, tile_y, px ORDER BY py)"
    )
    mdef = (
        "WINDOW wx AS (PARTITION BY tile_x, tile_y, py ORDER BY px ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), "
        "wy AS (PARTITION BY tile_x, tile_y, px ORDER BY py ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)"
    )
    ctes = [
        tiles_sql(side),
        f"rcl AS MATERIALIZED (SELECT tile_x, tile_y, py, px, vd FROM rast "
        f"  WHERE tile_x <= {tx_max} AND tile_y <= {ty_max})",
        "gv AS MATERIALIZED (SELECT *, "
        f"  {cd.format(c='vd', w='wx')} AS vx, {cd.format(c='vd', w='wy')} AS vy "
        f"  FROM rcl {wdef})",
        f"gg AS MATERIALIZED (SELECT tile_x, tile_y, py, px, "
        f"  1.0/SQRT(1.0 + CAST({alpha!r} AS DOUBLE)*(vx*vx + vy*vy)) AS g FROM gv)",
        "gd AS MATERIALIZED (SELECT *, "
        f"  {cd.format(c='g', w='wx')} AS dgx, {cd.format(c='g', w='wy')} AS dgy "
        f"  FROM gg {wdef})",
        "s0 AS MATERIALIZED (SELECT tile_x, tile_y, py, px, g, dgx, dgy, "
        f"  g > CAST({thr!r} AS DOUBLE) AS bm, "
        f"  CASE WHEN (2*px - {side - 1})*(2*px - {side - 1}) + (2*py - {side - 1})*(2*py - {side - 1}) <= {R2} "
        "  THEN 1.0 ELSE 0.0 END AS u FROM gd)",
    ]
    aux = ("GREATEST(MAX(u) OVER wx, MAX(u) OVER wy)" if balloon > 0
           else "LEAST(MIN(u) OVER wx, MIN(u) OVER wy)" if balloon < 0 else "u")
    carry = "tile_x, tile_y, py, px, g, dgx, dgy, bm"
    for t in range(1, iterations + 1):
        ctes.append(
            f"b{t} AS MATERIALIZED (SELECT {carry}, "
            f"CASE WHEN bm THEN {aux} ELSE u END AS u FROM s{t - 1} {mdef})"
        )
        ctes.append(
            f"d{t} AS MATERIALIZED (SELECT *, "
            f"{cd.format(c='u', w='wx')} AS dux, {cd.format(c='u', w='wy')} AS duy "
            f"FROM b{t} {wdef})"
        )
        ctes.append(
            f"a{t} AS MATERIALIZED (SELECT {carry}, "
            "CASE WHEN dux*dgx + duy*dgy > 0 THEN 1.0 "
            "WHEN dux*dgx + duy*dgy < 0 THEN 0.0 ELSE u END AS u "
            f"FROM d{t})"
        )
        op1, op2 = ("MIN", "MAX") if t % 2 == 1 else ("MAX", "MIN")
        comb1 = "LEAST" if op1 == "MIN" else "GREATEST"
        comb2 = "LEAST" if op2 == "MIN" else "GREATEST"
        ctes.append(
            f"e{t} AS MATERIALIZED (SELECT {carry}, "
            f"{comb1}({op1}(u) OVER wx, {op1}(u) OVER wy) AS u FROM a{t} {mdef})"
        )
        ctes.append(
            f"s{t} AS MATERIALIZED (SELECT {carry}, "
            f"{comb2}({op2}(u) OVER wx, {op2}(u) OVER wy) AS u FROM e{t} {mdef})"
        )
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT tile_x, tile_y, CAST(SUM(u) AS BIGINT) AS fg_count, "
        "ROUND(CASE WHEN SUM(u) > 0 THEN SUM(g*u)/SUM(u) ELSE 0.0 END, 6) AS mean_g_in "
        f"FROM s{iterations} GROUP BY 1, 2"
    )


def _ms_toposnakes_sql(side=16, tx_max=15, ty_max=15, iterations=5):
    """SQL twin of raster.ms_toposnakes_stage: the 256-entry simple-point
    LUT inlines as a VALUES table; each of the 4 checkerboard subphases is
    one CTE with 8 LEFT JOINs building the neighborhood code (out-of-tile
    → 0) and a LUT join gating the flip; means per iteration are the exact
    f32-valued sums."""
    from geospatial_learn_ray.stages.raster import _SP_OFFS, _simple_point_lut

    lut = _simple_point_lut()
    lut_rows = ", ".join(f"({c}, {int(lut[c])})" for c in range(256))
    R2 = (2 * side // 3) ** 2
    ctes = [
        tiles_sql(side),
        f"lut(code, simple) AS (VALUES {lut_rows})",
        f"s0 AS MATERIALIZED (SELECT tile_x, tile_y, py, px, vd, "
        f"  CASE WHEN (2*px - {side - 1})*(2*px - {side - 1}) + (2*py - {side - 1})*(2*py - {side - 1}) <= {R2} "
        f"  THEN 1.0 ELSE 0.0 END AS u FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max})",
    ]
    nbj = " ".join(
        f"LEFT JOIN {{p}} n{k} ON n{k}.tile_x = c.tile_x AND n{k}.tile_y = c.tile_y "
        f"AND n{k}.py = c.py + {dy} AND n{k}.px = c.px + {dx}"
        for k, (dy, dx) in enumerate(_SP_OFFS)
    )
    code_expr = " + ".join(f"CAST(COALESCE(n{k}.u, 0.0) AS BIGINT)*{1 << k}" for k in range(8))
    prev = "s0"
    for t in range(1, iterations + 1):
        ctes.append(
            f"m{t} AS MATERIALIZED (SELECT tile_x, tile_y, "
            "CASE WHEN SUM(u) > 0 THEN SUM(vd*u)/SUM(u) ELSE 0.0 END AS c1, "
            "CASE WHEN SUM(1.0 - u) > 0 THEN SUM(vd*(1.0 - u))/SUM(1.0 - u) ELSE 0.0 END AS c2 "
            f"FROM {prev} GROUP BY 1, 2)"
        )
        ctes.append(
            f"t{t} AS MATERIALIZED (SELECT s.tile_x, s.tile_y, s.py, s.px, s.vd, s.u, "
            "CASE WHEN (s.vd - m.c1)*(s.vd - m.c1) < (s.vd - m.c2)*(s.vd - m.c2) THEN 1.0 ELSE 0.0 END AS tgt "
            f"FROM {prev} s JOIN m{t} m USING (tile_x, tile_y))"
        )
        prev_ph = f"t{t}"
        for ph, (phy, phx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            name = f"q{t}{'abcd'[ph]}"
            ctes.append(
                f"{name} AS MATERIALIZED (SELECT a.tile_x, a.tile_y, a.py, a.px, a.vd, a.tgt, "
                f"CASE WHEN a.py % 2 = {phy} AND a.px % 2 = {phx} AND a.u <> a.tgt AND l.simple = 1 "
                "THEN a.tgt ELSE a.u END AS u FROM ("
                f"SELECT c.*, {code_expr} AS code FROM {prev_ph} c {nbj.format(p=prev_ph)}"
                ") a JOIN lut l ON l.code = a.code)"
            )
            prev_ph = name
        prev = prev_ph
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT tile_x, tile_y, CAST(SUM(u) AS BIGINT) AS fg_count, "
        "ROUND(CASE WHEN SUM(u) > 0 THEN SUM(vd*u)/SUM(u) ELSE 0.0 END, 6) AS mean_in "
        f"FROM {prev} GROUP BY 1, 2"
    )


def _ms_toposeg_sql(side=16, tx_max=7, ty_max=7, iterations=4, quant=8.0,
                    lo2=20_000, hi2=40_000, crounds=20, lrounds=20):
    """SQL twin of raster.ms_toposeg_stage — the CHAINED composition:
    canny edge set (_canny_ctes, the identical CTE chain as the
    canny_edges twin) → toposnake rounds (the _ms_toposnakes_sql subfield
    LUT chain) with one extra burn CTE per iteration (u := 0 on edge
    pixels, LEFT JOIN against ced) → binary CCL over the final mask
    (_ccl_ctes with rc = the mask) → cross-tile foreground adjacency on
    the global pixel grid → recursive min-reach components → per-component
    (pixel_count, n_regions), singletons keeping their own node id
    (_ragmerge_sql's merge scaffolding)."""
    from geospatial_learn_ray.stages.raster import _SP_OFFS, _simple_point_lut

    lut = _simple_point_lut()
    lut_rows = ", ".join(f"({c}, {int(lut[c])})" for c in range(256))
    R2 = (2 * side // 3) ** 2
    canny, ced = _canny_ctes(side, quant, lo2, hi2, crounds, tx_max, ty_max)
    ctes = [tiles_sql(side)] + canny + [
        f"lut(code, simple) AS (VALUES {lut_rows})",
        f"s0 AS MATERIALIZED (SELECT tile_x, tile_y, py, px, vd, "
        f"  CASE WHEN (2*px - {side - 1})*(2*px - {side - 1}) + (2*py - {side - 1})*(2*py - {side - 1}) <= {R2} "
        f"  THEN 1.0 ELSE 0.0 END AS u FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max})",
    ]
    nbj = " ".join(
        f"LEFT JOIN {{p}} n{k} ON n{k}.tile_x = c.tile_x AND n{k}.tile_y = c.tile_y "
        f"AND n{k}.py = c.py + {dy} AND n{k}.px = c.px + {dx}"
        for k, (dy, dx) in enumerate(_SP_OFFS)
    )
    code_expr = " + ".join(f"CAST(COALESCE(n{k}.u, 0.0) AS BIGINT)*{1 << k}" for k in range(8))
    prev = "s0"
    for t in range(1, iterations + 1):
        ctes.append(
            f"m{t} AS MATERIALIZED (SELECT tile_x, tile_y, "
            "CASE WHEN SUM(u) > 0 THEN SUM(vd*u)/SUM(u) ELSE 0.0 END AS c1, "
            "CASE WHEN SUM(1.0 - u) > 0 THEN SUM(vd*(1.0 - u))/SUM(1.0 - u) ELSE 0.0 END AS c2 "
            f"FROM {prev} GROUP BY 1, 2)"
        )
        ctes.append(
            f"t{t} AS MATERIALIZED (SELECT s.tile_x, s.tile_y, s.py, s.px, s.vd, s.u, "
            "CASE WHEN (s.vd - m.c1)*(s.vd - m.c1) < (s.vd - m.c2)*(s.vd - m.c2) THEN 1.0 ELSE 0.0 END AS tgt "
            f"FROM {prev} s JOIN m{t} m USING (tile_x, tile_y))"
        )
        prev_ph = f"t{t}"
        for ph, (phy, phx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            name = f"q{t}{'abcd'[ph]}"
            ctes.append(
                f"{name} AS MATERIALIZED (SELECT a.tile_x, a.tile_y, a.py, a.px, a.vd, a.tgt, "
                f"CASE WHEN a.py % 2 = {phy} AND a.px % 2 = {phx} AND a.u <> a.tgt AND l.simple = 1 "
                "THEN a.tgt ELSE a.u END AS u FROM ("
                f"SELECT c.*, {code_expr} AS code FROM {prev_ph} c {nbj.format(p=prev_ph)}"
                ") a JOIN lut l ON l.code = a.code)"
            )
            prev_ph = name
        ctes.append(
            f"b{t} AS MATERIALIZED (SELECT a.tile_x, a.tile_y, a.py, a.px, a.vd, "
            "CASE WHEN e.px IS NOT NULL THEN 0.0 ELSE a.u END AS u "
            f"FROM {prev_ph} a LEFT JOIN {ced} e ON e.tile_x = a.tile_x "
            "AND e.tile_y = a.tile_y AND e.py = a.py AND e.px = a.px)"
        )
        prev = f"b{t}"
    # binary CCL over the final mask, then cross-tile merge (ragmerge form)
    ctes += _ccl_ctes(
        side=side, rounds=lrounds,
        rc_sql=(f"SELECT tile_x, tile_y, py * {side} + px AS idx, "
                f"CAST(u AS BIGINT) AS q, vd FROM {prev}"),
        include_tiles=False,
    )
    s2 = side * side
    return (
        "WITH RECURSIVE " + ", ".join(ctes) + ", "
        f"gp AS MATERIALIZED (SELECT tile_x*{side} + idx % {side} AS gx, "
        f"  tile_y*{side} + idx // {side} AS gy, "
        f"  (CAST(tile_x AS BIGINT)*2097152 + tile_y)*{s2} + lab AS node FROM fin WHERE q = 1), "
        "pr AS (SELECT LEAST(a.node, b.node) AS u, GREATEST(a.node, b.node) AS v "
        "  FROM gp a JOIN gp b ON b.gx = a.gx + 1 AND b.gy = a.gy WHERE a.node <> b.node "
        "  UNION ALL "
        "  SELECT LEAST(a.node, b.node), GREATEST(a.node, b.node) "
        "  FROM gp a JOIN gp b ON b.gx = a.gx AND b.gy = a.gy + 1 WHERE a.node <> b.node), "
        "e AS MATERIALIZED (SELECT DISTINCT u, v FROM pr), "
        "cn AS (SELECT u AS node FROM e UNION SELECT v FROM e), "
        "ce AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e), "
        "reach AS (SELECT node, node AS anc FROM cn "
        "  UNION SELECT r.node, c.v AS anc FROM reach r JOIN ce c ON c.u = r.anc), "
        "comp AS (SELECT node, MIN(anc) AS cid FROM reach GROUP BY node), "
        f"regn AS (SELECT (CAST(tile_x AS BIGINT)*2097152 + tile_y)*{s2} + lab AS node, "
        "  COUNT(*) AS pc FROM fin WHERE q = 1 GROUP BY 1) "
        "SELECT COALESCE(c.cid, r.node) AS global_region, "
        "CAST(SUM(r.pc) AS BIGINT) AS pixel_count, "
        "CAST(COUNT(*) AS BIGINT) AS n_regions "
        "FROM regn r LEFT JOIN comp c USING (node) GROUP BY 1"
    )


def _snake_sql(side=16, tx_max=15, ty_max=15, n_points=40, iterations=5,
               alpha=0.1, beta=0.01, kappa=1.0, dt=0.5):
    """SQL twin of raster.snake_stage: initial contour coordinates inlined
    as the numpy-computed literals, neighbor indices precomputed in the
    point VALUES table, per-iteration CTEs joining ring neighbors (4) and
    the gradient grid's bilinear corners (4) — every arithmetic expression
    matches the engine's operation order character-for-character, and the
    output is per point (no cross-point reductions), so values are
    bit-identical."""
    ang = 2.0 * np.pi * np.arange(n_points) / n_points
    c0 = (side - 1) / 2.0
    r0 = side / 3.0
    xs = c0 + r0 * np.cos(ang)
    ys = c0 + r0 * np.sin(ang)
    pv = ", ".join(
        f"({i}, CAST({float(xs[i])!r} AS DOUBLE), CAST({float(ys[i])!r} AS DOUBLE), "
        f"{(i - 1) % n_points}, {(i + 1) % n_points}, {(i - 2) % n_points}, {(i + 2) % n_points})"
        for i in range(n_points)
    )
    cd = "(COALESCE(LEAD({c}) OVER {w}, {c}) - COALESCE(LAG({c}) OVER {w}, {c}))/2.0"
    wdef = (
        "WINDOW wx AS (PARTITION BY tile_x, tile_y, py ORDER BY px), "
        "wy AS (PARTITION BY tile_x, tile_y, px ORDER BY py)"
    )
    A, B, K, DT = (f"CAST({v!r} AS DOUBLE)" for v in (alpha, beta, kappa, dt))
    hi = f"CAST({float(side - 1)!r} AS DOUBLE)"
    zero = "CAST(0.0 AS DOUBLE)"
    bil = ("((1.0 - ty{c}) * ((1.0 - tx{c}) * g00.g{c} + tx{c} * g01.g{c}) "
           "+ ty{c} * ((1.0 - tx{c}) * g10.g{c} + tx{c} * g11.g{c}))")
    ctes = [
        tiles_sql(side),
        f"rcl AS MATERIALIZED (SELECT tile_x, tile_y, py, px, vd FROM rast "
        f"  WHERE tile_x <= {tx_max} AND tile_y <= {ty_max})",
        "grid AS MATERIALIZED (SELECT tile_x, tile_y, py, px, "
        f"  {cd.format(c='vd', w='wx')} AS gx, {cd.format(c='vd', w='wy')} AS gy "
        f"  FROM rcl {wdef})",
        f"pv(i, x0i, y0i, im1, ip1, im2, ip2) AS (VALUES {pv})",
        "base AS (SELECT DISTINCT tile_x, tile_y FROM rcl)",
        "p0 AS MATERIALIZED (SELECT b.tile_x, b.tile_y, pv.i, pv.im1, pv.ip1, pv.im2, pv.ip2, "
        "  pv.x0i AS x, pv.y0i AS y FROM base b CROSS JOIN pv)",
    ]
    for t in range(1, iterations + 1):
        p = f"p{t - 1}"
        ctes.append(
            f"c{t} AS MATERIALIZED (SELECT a.tile_x, a.tile_y, a.i, a.im1, a.ip1, a.im2, a.ip2, "
            "a.x, a.y, m1.x AS xm1, p1.x AS xp1, m2.x AS xm2, p2.x AS xp2, "
            "m1.y AS ym1, p1.y AS yp1, m2.y AS ym2, p2.y AS yp2, "
            f"LEAST(CAST(FLOOR(a.x) AS BIGINT), {side - 2}) AS xf, "
            f"LEAST(CAST(FLOOR(a.y) AS BIGINT), {side - 2}) AS yf "
            f"FROM {p} a "
            f"JOIN {p} m1 ON m1.tile_x = a.tile_x AND m1.tile_y = a.tile_y AND m1.i = a.im1 "
            f"JOIN {p} p1 ON p1.tile_x = a.tile_x AND p1.tile_y = a.tile_y AND p1.i = a.ip1 "
            f"JOIN {p} m2 ON m2.tile_x = a.tile_x AND m2.tile_y = a.tile_y AND m2.i = a.im2 "
            f"JOIN {p} p2 ON p2.tile_x = a.tile_x AND p2.tile_y = a.tile_y AND p2.i = a.ip2)"
        )
        ctes.append(
            f"f{t} AS MATERIALIZED (SELECT c.*, c.x - c.xf AS txc, c.y - c.yf AS tyc, "
            "g00.gx AS g00x, g01.gx AS g01x, g10.gx AS g10x, g11.gx AS g11x, "
            "g00.gy AS g00y, g01.gy AS g01y, g10.gy AS g10y, g11.gy AS g11y "
            f"FROM c{t} c "
            "JOIN grid g00 ON g00.tile_x = c.tile_x AND g00.tile_y = c.tile_y AND g00.py = c.yf AND g00.px = c.xf "
            "JOIN grid g01 ON g01.tile_x = c.tile_x AND g01.tile_y = c.tile_y AND g01.py = c.yf AND g01.px = c.xf + 1 "
            "JOIN grid g10 ON g10.tile_x = c.tile_x AND g10.tile_y = c.tile_y AND g10.py = c.yf + 1 AND g10.px = c.xf "
            "JOIN grid g11 ON g11.tile_x = c.tile_x AND g11.tile_y = c.tile_y AND g11.py = c.yf + 1 AND g11.px = c.xf + 1)"
        )
        fxe = ("((1.0 - tyc) * ((1.0 - txc) * g00x + txc * g01x) "
               "+ tyc * ((1.0 - txc) * g10x + txc * g11x))")
        fye = ("((1.0 - tyc) * ((1.0 - txc) * g00y + txc * g01y) "
               "+ tyc * ((1.0 - txc) * g10y + txc * g11y))")
        ctes.append(
            f"p{t} AS MATERIALIZED (SELECT tile_x, tile_y, i, im1, ip1, im2, ip2, "
            f"LEAST(GREATEST(x + {DT} * ({A} * (xm1 - 2.0 * x + xp1) "
            f"- {B} * (xm2 - 4.0 * xm1 + 6.0 * x - 4.0 * xp1 + xp2) "
            f"+ {K} * {fxe}), {zero}), {hi}) AS x, "
            f"LEAST(GREATEST(y + {DT} * ({A} * (ym1 - 2.0 * y + yp1) "
            f"- {B} * (ym2 - 4.0 * ym1 + 6.0 * y - 4.0 * yp1 + yp2) "
            f"+ {K} * {fye}), {zero}), {hi}) AS y "
            f"FROM f{t})"
        )
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT tile_x::BIGINT AS tile_x, tile_y::BIGINT AS tile_y, CAST(i AS BIGINT) AS point_id, "
        f"ROUND(x, 6) AS x, ROUND(y, 6) AS y FROM p{iterations}"
    )


def _ransac_lines_sql(side=16, tx_max=15, ty_max=15, edge_thresh=0.1, trials=64):
    """SQL twin of raster.ransac_lines_stage: clamped central-difference
    gradient edges, splitmix64 2-point draws per (tile, trial) over the
    ascending edge index list (sqlgen HUGEINT mask arithmetic — identical
    bits to the numpy splitmix64), and the exact-integer inlier test
    cross² ≤ residual²·norm² on pixel coordinates; best trial by inlier
    count with ties to the smallest trial."""
    sm = _sg.chain(
        "SELECT * FROM tk",
        _sg.splitmix64_steps("seed1", "sm1", "ra") + _sg.splitmix64_steps("seed2", "sm2", "rb"),
    )
    return (
        f"WITH {_edge_ctes(side, tx_max, ty_max, edge_thresh)}, "
        "cnt AS (SELECT tile_x, tile_y, COUNT(*) AS n FROM ed GROUP BY 1, 2), "
        "tk AS (SELECT tile_x, tile_y, n, CAST(t.range AS BIGINT) AS k, "
        f"  (CAST(tile_x AS BIGINT)*2097152 + tile_y)*{2 * trials} + 2*k AS seed1, "
        f"  (CAST(tile_x AS BIGINT)*2097152 + tile_y)*{2 * trials} + 2*k + 1 AS seed2 "
        f"  FROM cnt, range(0, {trials}) t WHERE n >= 2), "
        f"dr AS (SELECT tile_x, tile_y, n, k, CAST(sm1 % n AS BIGINT) AS i1r, "
        f"  CAST(sm2 % (n - 1) AS BIGINT) AS i2r FROM ({sm})), "
        "dr2 AS (SELECT *, i1r AS i1, i2r + CASE WHEN i2r >= i1r THEN 1 ELSE 0 END AS i2 FROM dr), "
        "sup AS (SELECT d.tile_x, d.tile_y, d.k, a.idx AS ia, a.x AS x1, a.y AS y1, "
        "  b.idx AS ib, b.x AS x2, b.y AS y2 "
        "  FROM dr2 d JOIN ed a ON a.tile_x = d.tile_x AND a.tile_y = d.tile_y AND a.rn = d.i1 "
        "  JOIN ed b ON b.tile_x = d.tile_x AND b.tile_y = d.tile_y AND b.rn = d.i2), "
        "il AS (SELECT s.tile_x, s.tile_y, s.k, ANY_VALUE(s.ia) AS ia, ANY_VALUE(s.ib) AS ib, "
        "  COUNT(*) FILTER (WHERE "
        "    ((s.x2 - s.x1)*(e.y - s.y1) - (s.y2 - s.y1)*(e.x - s.x1)) "
        "    * ((s.x2 - s.x1)*(e.y - s.y1) - (s.y2 - s.y1)*(e.x - s.x1)) "
        "    <= CAST(1.0 AS DOUBLE)*((s.x2 - s.x1)*(s.x2 - s.x1) + (s.y2 - s.y1)*(s.y2 - s.y1))) AS c "
        "  FROM sup s JOIN ed e ON e.tile_x = s.tile_x AND e.tile_y = s.tile_y GROUP BY 1, 2, 3), "
        "pick AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY tile_x, tile_y ORDER BY c DESC, k ASC) AS rr FROM il), "
        "base AS (SELECT DISTINCT tile_x, tile_y FROM rcl), "
        "cnt2 AS (SELECT b.tile_x, b.tile_y, COALESCE(c.n, 0) AS n FROM base b LEFT JOIN cnt c USING (tile_x, tile_y)) "
        "SELECT c2.tile_x, c2.tile_y, c2.n AS n_edge, "
        "COALESCE(p.k, -1) AS best_trial, COALESCE(p.ia, -1) AS support_a, "
        "COALESCE(p.ib, -1) AS support_b, COALESCE(p.c, 0) AS inliers "
        "FROM cnt2 c2 LEFT JOIN (SELECT * FROM pick WHERE rr = 1) p USING (tile_x, tile_y)"
    )


def _ragmerge_sql(quant=2.0, side=16, rounds=20, tx_max=15, ty_max=15,
                  thresh=0.4, wscale=64):
    """SQL twin of raster.ragmerge_count (cut_threshold RAG merge): per-tile
    CCL labels (_ccl_ctes) → global node ids → 4-neighbor boundary pairs
    over the GLOBAL pixel grid (within + cross tile in one join) with
    integer weights floor(|Δv|·wscale + 0.5) → mean-weight threshold →
    connected components as a recursive transitive closure with MIN
    reachable node (= the engine's min-root union-find, see
    _dedup_components_sql) → per-component pixel/region totals; singleton
    regions keep their own node id."""
    ctes = _ccl_ctes(quant, side, rounds, tx_max, ty_max)
    s2 = side * side
    return (
        "WITH RECURSIVE " + ", ".join(ctes) + ", "
        f"gp AS MATERIALIZED (SELECT tile_x*{side} + idx % {side} AS gx, "
        f"  tile_y*{side} + idx // {side} AS gy, "
        f"  (CAST(tile_x AS BIGINT)*2097152 + tile_y)*{s2} + lab AS node, vd FROM fin), "
        "pr AS (SELECT LEAST(a.node, b.node) AS u, GREATEST(a.node, b.node) AS v, "
        f"  FLOOR(ABS(a.vd - b.vd)*{wscale} + 0.5) AS w "
        "  FROM gp a JOIN gp b ON b.gx = a.gx + 1 AND b.gy = a.gy WHERE a.node <> b.node "
        "  UNION ALL "
        "  SELECT LEAST(a.node, b.node), GREATEST(a.node, b.node), "
        f"  FLOOR(ABS(a.vd - b.vd)*{wscale} + 0.5) "
        "  FROM gp a JOIN gp b ON b.gx = a.gx AND b.gy = a.gy + 1 WHERE a.node <> b.node), "
        "e AS MATERIALIZED (SELECT u, v FROM pr GROUP BY u, v "
        f"  HAVING SUM(w)/COUNT(*) < CAST({thresh!r} AS DOUBLE)*{wscale}), "
        "cn AS (SELECT u AS node FROM e UNION SELECT v FROM e), "
        "ce AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e), "
        "reach AS (SELECT node, node AS anc FROM cn "
        "  UNION SELECT r.node, c.v AS anc FROM reach r JOIN ce c ON c.u = r.anc), "
        "comp AS (SELECT node, MIN(anc) AS cid FROM reach GROUP BY node), "
        f"regn AS (SELECT (CAST(tile_x AS BIGINT)*2097152 + tile_y)*{s2} + lab AS node, "
        "  COUNT(*) AS pc FROM fin GROUP BY 1) "
        "SELECT COALESCE(c.cid, r.node) AS global_region, "
        "CAST(SUM(r.pc) AS BIGINT) AS pixel_count, "
        "CAST(COUNT(*) AS BIGINT) AS n_regions "
        "FROM regn r LEFT JOIN comp c USING (node) GROUP BY 1"
    )



def _media_decode_sql() -> str:
    """SQL twin of multimodal.media_table + MediaDecoder (fake GLRM codec):
    dims are closed-form in doc_id, the payload is the first 256 UTF-8
    bytes of text (pure ASCII → ascii() == the byte), mean_byte is the
    payload byte mean (engine rounds half-away, matching SQL ROUND)."""
    return (
        "WITH pay AS (SELECT doc_id, LEAST(length(text), 256) AS n, "
        "  list_aggregate(list_transform(range(1, LEAST(length(text), 256) + 1), "
        "    i -> ascii(text[i])), 'sum') AS s FROM documents) "
        "SELECT doc_id AS media_id, 'image/glrm' AS media_type, "
        "CAST(doc_id % 64 + 16 AS INTEGER) AS width, "
        "CAST(doc_id % 48 + 16 AS INTEGER) AS height, "
        "CAST(3 AS INTEGER) AS channels, "
        "ROUND(CASE WHEN n > 0 THEN CAST(s AS DOUBLE) / n ELSE 0.0 END, 4) AS mean_byte, "
        "CAST(n AS BIGINT) AS payload_bytes FROM pay"
    )


def _media_frame_sample_sql(every_kth: int = 4) -> str:
    """SQL twin of multimodal.FrameSampler: n_frames = max(payload//32, 1),
    frame indices 0, k, 2k, … < n_frames."""
    return (
        "WITH nf AS (SELECT doc_id, GREATEST(LEAST(length(text), 256) // 32, 1) AS n FROM documents) "
        f"SELECT doc_id AS media_id, CAST(unnest(range(0, n, {every_kth})) AS INTEGER) AS frame_idx FROM nf"
    )


def _buffer_polygons_sql(dist=1.0, quad_segs=8):
    """SQL twin of _q_buffer_polygons (functions/geometry.buffer_ring): the
    buffered ring is the Minkowski sum hull P ⊕ Q with Q the regular
    32-gon of arc offsets, so its vertices are exactly {v + u_k : the
    32-gon vertex normal cone [θk−5.625°, θk+5.625°] overlaps v's normal
    cone in P}. Cone assignment is static per shape (box: 4 axis cones;
    L hull pentagon: the diagonal normal θd = atan2(8.1, 7.2) splits the
    first quadrant, with u_4 shared by BOTH diagonal vertices — verified
    against the engine's hull, 37 L / 36 box vertices). Areas are ordered
    shoelace expressions; ROUND(6) absorbs summation-order ulps."""
    n_arc = 4 * quad_segs
    ang = np.linspace(0.0, 2.0 * np.pi, n_arc, endpoint=False)
    cs = [(float(np.cos(a)), float(np.sin(a))) for a in ang]
    # diagonal edge normal angle for the L hull (constant across features)
    w = 18.0 * 0.9
    h = 16.0 * 0.9
    theta_d = np.degrees(np.arctan2(w / 2.0, h / 2.0))
    kd = int(np.floor(theta_d / (360.0 / n_arc)))  # last k inside [0, theta_d]

    def cone_pts(cones):
        """cones: list of (vx, vy, k_list) in CCW order -> ordered point exprs."""
        pts = []
        for vx, vy, ks in cones:
            for k in ks:
                c, s = cs[k]
                pts.append((f"({vx} + {dist * c!r})", f"({vy} + {dist * s!r})"))
        return pts

    def seq(terms):
        out = terms[0]
        for t in terms[1:]:
            out = f"({out} + {t})"
        return out

    def shoelace(v):
        n = len(v)
        return seq([f"({v[k][0]}*{v[(k + 1) % n][1]} - {v[(k + 1) % n][0]}*{v[k][1]})" for k in range(n)])

    half = 360.0 / n_arc / 2.0  # 32-gon vertex normal-cone half-width

    def ks_in(a, b):
        """arc indices whose 32-gon normal cone [th-half, th+half] overlaps
        the P-vertex cone [a, b] (degrees, a < b, not wrapping)."""
        out = []
        for k in range(n_arc):
            for th in (k * 360.0 / n_arc, k * 360.0 / n_arc - 360.0, k * 360.0 / n_arc + 360.0):
                if th + half > a and th - half < b:
                    out.append(k)
                    break
        return out

    def order_for(cones):
        """(vx, vy, a, b) CCW cones -> ordered (vx, vy, ks) with each cone's
        ks sorted by angle position within [a, b] (wrap-adjusted)."""
        res = []
        for vx, vy, a, b in cones:
            ks = ks_in(a, b)
            ks = sorted(ks, key=lambda k: ((k * 360.0 / n_arc) - a + half) % 360.0)
            res.append((vx, vy, ks))
        return res

    td = float(theta_d)
    box_pts = cone_pts(order_for([
        ("pmaxx", "pmaxy", 0.0, 90.0),
        ("pminx", "pmaxy", 90.0, 180.0),
        ("pminx", "pminy", 180.0, 270.0),
        ("pmaxx", "pminy", 270.0, 360.0),
    ]))
    l_pts = cone_pts(order_for([
        ("pmaxx", "pmy", 0.0, td),
        ("pmx", "pmaxy", td, 90.0),
        ("pminx", "pmaxy", 90.0, 180.0),
        ("pminx", "pminy", 180.0, 270.0),
        ("pmaxx", "pminy", 270.0, 360.0),
    ]))
    box = [("pminx", "pminy"), ("pmaxx", "pminy"), ("pmaxx", "pmaxy"), ("pminx", "pmaxy")]
    lsh = [("pminx", "pminy"), ("pmaxx", "pminy"), ("pmaxx", "pmy"),
           ("pmx", "pmy"), ("pmx", "pmaxy"), ("pminx", "pmaxy")]
    area = f"ABS(CASE WHEN is_l THEN (0.5*{shoelace(lsh)}) ELSE (0.5*{shoelace(box)}) END)"
    barea = (f"ABS(CASE WHEN is_l THEN (0.5*{shoelace(l_pts)}) ELSE (0.5*{shoelace(box_pts)}) END)")
    return (
        f"WITH {polygons_sql()} "
        f"SELECT feature_id, ROUND({area}, 6) AS area, ROUND({barea}, 6) AS buffered_area FROM polys"
    )



def _minhash_ctes(threshold: float = 0.5, max_bucket: int = 256) -> str:
    """CTE fragment ending in ``mh_pairs`` (id_a < id_b, est_jaccard ≥
    threshold) — the SQL twin of stages/dedup.minhash_candidates +
    minhash_dedup_pairs (OPH MinHash, Li-Owen-Zhang NIPS'12):

    - word tokens by whitespace split; FNV-1a per token (pure-ASCII text,
      so ascii() == the hashed byte); 3-gram shingle hash = the same
      polynomial combine as word_shingle_hashes (textproc.py:230) with
      base powers mod 2^64 via u64_mul_const (no HUGEINT overflow);
    - splitmix64 → bucket = top 6 bits → per-bucket MIN = the one-pass
      OPH signature; empty buckets densified by cyclic backward fill
      (arg_min over (j - bucket) mod 64 — provably equal to the engine's
      iterative np.roll fill);
    - band hash per 4 components = the engine's chained
      splitmix64(bh ^ v_r) fold; LSH candidates share any (band, hash)
      with bucket size ≤ max_bucket (the engine's overflow cap — capped
      buckets emit sentinel rows the ≥ threshold filter drops on BOTH
      sides); est_jaccard = equal-component fraction (m/64 is dyadic,
      so DOUBLE equality is exact).

    The token-hash CTE indexes tokens through a separate ``tk`` projection
    because fnv1a64_expr's list lambda variable is named ``i`` — inlining
    ``tl[i]`` into it would capture the lambda's ``i``, not the position."""
    B = 1099511628211
    B2 = pow(B, 2, _sg.M64)
    fnv = _sg.fnv1a64_expr("t")
    steps = [("x0", "v0"), *_sg.splitmix64_steps("x0", "b0", "mh0")]
    for r in (1, 2, 3):
        steps.append((f"x{r}", _sg.u64_xor(f"b{r - 1}", f"v{r}")))
        steps += _sg.splitmix64_steps(f"x{r}", f"b{r}" if r < 3 else "band_hash", f"mh{r}")
    band_chain = _sg.chain("SELECT doc_id, band, v0, v1, v2, v3 FROM bpivot", steps)
    sm_h = _sg.chain("SELECT doc_id, hsh FROM sh", _sg.splitmix64_steps("hsh", "hp", "shg"))
    return (
        "tok AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ts FROM documents), "
        "tpos AS (SELECT doc_id, unnest(range(1, len(ts) + 1)) AS i, ts AS tl FROM tok), "
        "tk AS (SELECT doc_id, i, tl[i] AS t FROM tpos), "
        f"th AS (SELECT doc_id, i, {fnv} AS h FROM tk), "
        "t3 AS (SELECT doc_id, h AS h0, LEAD(h, 1) OVER w AS h1, LEAD(h, 2) OVER w AS h2 "
        "  FROM th WINDOW w AS (PARTITION BY doc_id ORDER BY i)), "
        f"sh AS (SELECT doc_id, ({_sg.u64_mul_const('h0', B2)} + {_sg.u64_mul_const('h1', B)} + h2) % {_sg.M64} AS hsh "
        "  FROM t3 WHERE h2 IS NOT NULL), "
        f"shp AS ({sm_h}), "
        f"mins AS (SELECT doc_id, {_sg.u64_shr('hp', 58)} AS bucket, MIN(hp) AS mh FROM shp GROUP BY doc_id, bucket), "
        "mgrid AS (SELECT d.doc_id, g.range AS j FROM documents d, range(0, 64) g), "
        "dsig AS (SELECT mgrid.doc_id, mgrid.j, arg_min(mins.mh, (mgrid.j - mins.bucket + 64) % 64) AS v "
        "  FROM mgrid JOIN mins ON mins.doc_id = mgrid.doc_id GROUP BY mgrid.doc_id, mgrid.j), "
        "bpivot AS (SELECT doc_id, j // 4 AS band, "
        "  MAX(CASE WHEN j % 4 = 0 THEN v END) AS v0, MAX(CASE WHEN j % 4 = 1 THEN v END) AS v1, "
        "  MAX(CASE WHEN j % 4 = 2 THEN v END) AS v2, MAX(CASE WHEN j % 4 = 3 THEN v END) AS v3 "
        "  FROM dsig GROUP BY doc_id, j // 4), "
        f"bands AS (SELECT doc_id, band, band_hash FROM ({band_chain})), "
        "bsz AS (SELECT *, COUNT(*) OVER (PARTITION BY band, band_hash) AS sz FROM bands), "
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
        "  FROM bsz a JOIN bsz b ON a.band = b.band AND a.band_hash = b.band_hash "
        f"  AND a.doc_id < b.doc_id WHERE a.sz <= {max_bucket}), "
        "mh_pairs AS (SELECT c.id_a, c.id_b, "
        "  SUM(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) / 64.0 AS est_jaccard "
        "  FROM cand c JOIN dsig sa ON sa.doc_id = c.id_a "
        "  JOIN dsig sb ON sb.doc_id = c.id_b AND sb.j = sa.j "
        f"  GROUP BY c.id_a, c.id_b HAVING est_jaccard >= {threshold!r})"
    )


def _embedding_pairs_sql(threshold: float = 0.95, num_planes: int = 16,
                         num_tables: int = 8, seed: int = 11, dim: int = 64) -> str:
    """SQL twin of dedup.embedding_dedup_pairs over the planted-dup layer
    (sources/embeddings.with_planted_dups): the seeded hyperplane matrix is
    inlined as 8192 literal doubles (a VALUES table — deterministic given
    the published seed, exactly like the S2 Hilbert lookup join); planted
    perturbation restated with the splitmix64 chain ((h/2^64 - 0.5)*0.01,
    float32 round-trip is IEEE-identical in DuckDB); sign keys from
    UNNORMALIZED dots (sign(x·p) == sign(x̂·p), so the oracle dodges norm
    ulp sensitivity entirely); exact cosine per candidate as
    dot/(|a||b|) — ulp-different from the engine's normalized matmul but
    far inside ROUND(6) given the fixture's ~0.9999 planted / ~0 random
    cosine separation."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, dim, num_planes))
    rows = ", ".join(
        f"({t}, {j + 1}, {p}, {planes[t, j, p]!r})"
        for t in range(num_tables) for j in range(dim) for p in range(num_planes)
    )
    noise_chain = _sg.chain(
        "SELECT vec_id, j, e FROM plj",
        _sg.splitmix64_steps(f"CAST(vec_id * {dim} + j AS HUGEINT)", "nh", "pl"),
    )
    return (
        "WITH planes(t, j, p, w) AS (VALUES " + rows + "), "
        "base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), "
        f"plj AS (SELECT vec_id, unnest(range(0, {dim})) AS j, e FROM base WHERE vec_id % 10 = 0), "
        f"pln AS (SELECT vec_id, j, CAST(e[j + 1] * (1.0 + (CAST(nh AS DOUBLE) / {float(2.0**64)!r} - 0.5) * 0.01) AS FLOAT) AS pv "
        f"  FROM ({noise_chain})), "
        "planted AS (SELECT vec_id + 1000000 AS vec_id, list(CAST(pv AS DOUBLE) ORDER BY j) AS e "
        "  FROM pln GROUP BY vec_id), "
        "allv AS (SELECT vec_id, e FROM base UNION ALL SELECT vec_id, e FROM planted), "
        f"elems AS (SELECT vec_id, unnest(range(1, {dim} + 1)) AS j, e FROM allv), "
        "ex AS (SELECT vec_id, j, e[j] AS x FROM elems), "
        "ss AS (SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM ex GROUP BY vec_id), "
        "dots AS (SELECT ex.vec_id, planes.t, planes.p, SUM(ex.x * planes.w) AS d "
        "  FROM ex JOIN planes ON planes.j = ex.j GROUP BY ex.vec_id, planes.t, planes.p), "
        "keys AS (SELECT vec_id, t, SUM(CASE WHEN d > 0 THEN CAST(POWER(2, p) AS BIGINT) ELSE 0 END) AS key "
        "  FROM dots GROUP BY vec_id, t), "
        "cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b "
        "  FROM keys a JOIN keys b ON a.t = b.t AND a.key = b.key AND a.vec_id < b.vec_id), "
        "pairdot AS (SELECT c.id_a, c.id_b, SUM(xa.x * xb.x) AS d FROM cand c "
        "  JOIN ex xa ON xa.vec_id = c.id_a JOIN ex xb ON xb.vec_id = c.id_b AND xb.j = xa.j "
        "  GROUP BY c.id_a, c.id_b), "
        "cosv AS (SELECT p.id_a, p.id_b, p.d / (sa.nrm * sb.nrm) AS cosr FROM pairdot p "
        "  JOIN ss sa ON sa.vec_id = p.id_a JOIN ss sb ON sb.vec_id = p.id_b) "
        f"SELECT id_a, id_b, ROUND(cosr, 6) AS cosine FROM cosv WHERE cosr >= {threshold!r}"
    )


def _minhash_pairs_sql() -> str:
    return f"WITH {_minhash_ctes()} SELECT id_a, id_b, est_jaccard FROM mh_pairs"


def _jaccard_verified_sql(threshold: float = 0.5) -> str:
    """Exact word-3-shingle Jaccard over the MinHash candidate pairs (SQL
    twin of dedup.verify_jaccard_exact): DISTINCT shingle strings joined
    with a space (tokens cannot contain whitespace, so the join is
    injective), |A∩B| via equi-join, ROUND half-away matches the engine's
    round_half_away."""
    return (
        f"WITH {_minhash_ctes(threshold)}, "
        "sh3s AS (SELECT DISTINCT doc_id, tl[i] || ' ' || tl[i + 1] || ' ' || tl[i + 2] AS s3 "
        "  FROM tpos WHERE i + 2 <= len(tl)), "
        "shc AS (SELECT doc_id, COUNT(*) AS n3 FROM sh3s GROUP BY doc_id), "
        "inter AS (SELECT p.id_a, p.id_b, COUNT(*) AS ni FROM mh_pairs p "
        "  JOIN sh3s a ON a.doc_id = p.id_a JOIN sh3s b ON b.doc_id = p.id_b AND b.s3 = a.s3 "
        "  GROUP BY p.id_a, p.id_b), "
        "jac AS (SELECT p.id_a, p.id_b, "
        "  ROUND(COALESCE(ni, 0)::DOUBLE / (ca.n3 + cb.n3 - COALESCE(ni, 0)), 6) AS jaccard "
        "  FROM mh_pairs p JOIN shc ca ON ca.doc_id = p.id_a JOIN shc cb ON cb.doc_id = p.id_b "
        "  LEFT JOIN inter ON inter.id_a = p.id_a AND inter.id_b = p.id_b) "
        f"SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= {threshold!r}"
    )


def _dedup_components_sql() -> str:
    """Connected components over the MinHash near-dup pairs as a recursive
    transitive closure (node reaches anc), component_id = MIN reachable
    node — provably what min-root union-find emits (dedup.py:169: every
    union parents max(root) under min(root), so the final root is the
    component's global min id)."""
    return (
        f"WITH RECURSIVE {_minhash_ctes()}, "
        "cnodes AS (SELECT id_a AS node FROM mh_pairs UNION SELECT id_b FROM mh_pairs), "
        "cedges AS (SELECT id_a AS u, id_b AS v FROM mh_pairs "
        "  UNION SELECT id_b AS u, id_a AS v FROM mh_pairs), "
        "reach AS (SELECT node, node AS anc FROM cnodes "
        "  UNION SELECT r.node, e.v AS anc FROM reach r JOIN cedges e ON e.u = r.anc) "
        "SELECT node, MIN(anc) AS component_id FROM reach GROUP BY node"
    )


def _bow_logistic_sql(n_buckets: int = 8, iters: int = 10, lr: float = 0.5) -> str:
    """SQL twin of train.hashed_bow_features + fit_logistic over documents:
    the token→bucket hash chain (fnv1a64 then splitmix64, token projected
    to its own column first — fnv's list lambda uses ``i`` and would
    shadow an outer positional), per-doc bucket fractions pivoted to
    d columns (LEFT JOIN keeps token-less docs as all-zero rows, matching
    the engine's clip-to-1 normalizer), and the fixed-step GD unrolled as
    in _logistic_weights_sql generalized to d features."""
    bkt = _sg.chain(
        f"SELECT doc_id, {_sg.fnv1a64_expr('tok')} AS fh FROM toks",
        _sg.splitmix64_steps("fh", "sh", "bw"),
    )
    xs = ", ".join(
        f"COALESCE(f.x{j}, CAST(0.0 AS DOUBLE)) AS x{j}" for j in range(n_buckets))
    piv = ", ".join(
        f"CAST(SUM(CASE WHEN sh % {n_buckets} = {j} THEN 1 ELSE 0 END) AS DOUBLE)"
        f"/COUNT(*) AS x{j}" for j in range(n_buckets))
    d = n_buckets + 1
    ctes = [
        "toks AS MATERIALIZED (SELECT doc_id, tok FROM ("
        "  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)"
        "  WHERE tok <> '')",
        f"bk AS MATERIALIZED ({bkt})",
        f"fx AS (SELECT doc_id, {piv} FROM bk GROUP BY doc_id)",
        "dta AS MATERIALIZED (SELECT CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS y, "
        f"{xs} FROM documents d LEFT JOIN fx f ON f.doc_id = d.doc_id)",
        "it0 AS (SELECT " + ", ".join(
            f"CAST(0.0 AS DOUBLE) AS a{i}" for i in range(d)) + ")",
    ]
    z = " + ".join([f"a0"] + [f"a{j + 1}*x{j}" for j in range(n_buckets)])
    for k in range(iters):
        p = f"1.0/(1.0 + EXP(-({z})))"
        gs = ", ".join(
            [f"SUM({p} - y) AS g0"]
            + [f"SUM(({p} - y)*x{j}) AS g{j + 1}" for j in range(n_buckets)])
        ctes.append(f"g{k} AS (SELECT {gs}, COUNT(*)::DOUBLE AS n FROM dta, it{k})")
        ws = ", ".join(f"a{i} - {lr}*g{i}/n AS a{i}" for i in range(d))
        ctes.append(f"it{k + 1} AS (SELECT {ws} FROM g{k}, it{k})")
    sel = ", ".join(f"ROUND(a{i}, 4) AS w{i}" for i in range(d))
    return "WITH " + ", ".join(ctes) + f" SELECT {sel} FROM it{iters}"


def _dedup_apply_sql() -> str:
    """SQL twin of dedup.dedup_apply over the MinHash pairs: the same
    recursive closure as _dedup_components_sql, then an anti-join dropping
    every node whose component_id differs from itself."""
    return (
        f"WITH RECURSIVE {_minhash_ctes()}, "
        "cnodes AS (SELECT id_a AS node FROM mh_pairs UNION SELECT id_b FROM mh_pairs), "
        "cedges AS (SELECT id_a AS u, id_b AS v FROM mh_pairs "
        "  UNION SELECT id_b AS u, id_a AS v FROM mh_pairs), "
        "reach AS (SELECT node, node AS anc FROM cnodes "
        "  UNION SELECT r.node, e.v AS anc FROM reach r JOIN cedges e ON e.u = r.anc), "
        "comp AS (SELECT node, MIN(anc) AS component_id FROM reach GROUP BY node) "
        "SELECT doc_id, lang, n_chars FROM documents WHERE doc_id NOT IN "
        "(SELECT node FROM comp WHERE node <> component_id)"
    )


def _logistic_weights_sql(iters: int = 10, lr: float = 0.5) -> str:
    """SQL twin of stages/train.fit_logistic: the fixed-iteration full-batch
    gradient descent unrolled as chained scalar CTEs (w_{k+1} from one SUM
    pass over the data with w_k cross-joined in). Engine partials sum in a
    different order than SQL SUM, but GD with a 0.5 step is contractive —
    the ulp drift over 10 iterations is ~1e-12, far inside ROUND(4)."""
    data = ("SELECT CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y, "
            "l_discount * 10.0 AS x1, l_tax * 10.0 AS x2 FROM lineitem")
    ctes = [f"d AS ({data})",
            "it0 AS (SELECT CAST(0.0 AS DOUBLE) AS a, CAST(0.0 AS DOUBLE) AS b, CAST(0.0 AS DOUBLE) AS c)"]
    for k in range(iters):
        p = "1.0/(1.0 + EXP(-(a + b*x1 + c*x2)))"
        ctes.append(f"g{k} AS (SELECT SUM({p} - y) AS ga, SUM(({p} - y)*x1) AS gb, "
                    f"SUM(({p} - y)*x2) AS gc, COUNT(*)::DOUBLE AS n FROM d, it{k})")
        ctes.append(f"it{k + 1} AS (SELECT a - {lr}*ga/n AS a, b - {lr}*gb/n AS b, "
                    f"c - {lr}*gc/n AS c FROM g{k}, it{k})")
    return ("WITH " + ", ".join(ctes)
            + f" SELECT ROUND(a, 4) AS w0, ROUND(b, 4) AS w1, ROUND(c, 4) AS w2 FROM it{iters}")


def _doc_fingerprints_sql() -> str:
    """SQL twin of textproc.winnow_fingerprints (Schleimer et al. SIGMOD'03,
    window=8, guarantee=16): polynomial rolling hash of every 8-byte k-gram
    as a dot product with precomputed base powers mod 2^64 (HUGEINT — sum of
    8 terms < 2^75, no overflow), sliding 16-window MIN as a window frame,
    a window selected when its min differs from the previous window's (full
    windows only, plus the single whole-row window for sub-guarantee rows),
    fingerprint = bit_xor of splitmix64 of the selected minima. Exact
    because the engine's winnowing is batch-invariant (window placement
    depends only on the row's own length) and the text is pure ASCII, so
    ascii(char) == the hashed byte."""
    sm = _sg.chain("SELECT doc_id, c, m FROM sel", _sg.splitmix64_steps("m", "sm", "fp"))
    return (
        f"WITH {_winnow_sel_ctes()}, "
        f"f AS (SELECT doc_id, bit_xor({_sg.u64_to_i64('sm')}) AS fpi, COUNT(*) AS cnt "
        f"  FROM ({sm}) GROUP BY doc_id) "
        f"SELECT d.doc_id, CAST({_sg.i64_to_u64('COALESCE(f.fpi, 0)')} AS UBIGINT) AS fingerprint, "
        "COALESCE(f.cnt, 0)::BIGINT AS n_fingerprints "
        "FROM documents d LEFT JOIN f ON d.doc_id = f.doc_id"
    )


def _winnow_sel_ctes() -> str:
    """Shared winnowing-selection CTE chain ending in ``sel(doc_id, c, m)``
    — the per-(doc, window-position) selected span minima. Used by the
    fingerprint oracle (xor-fold) and the dup-span oracle (df counting)."""
    base = 1099511628211  # FNV prime, hashing.py:109
    P = [pow(base, 7 - k, _sg.M64) for k in range(8)]
    terms = " + ".join(f"CAST(cs[p + {k + 1}] AS HUGEINT) * {P[k]}" for k in range(8))
    return (
        "codes AS (SELECT doc_id, "
        "  list_transform(range(1, length(text) + 1), i -> ascii(text[i])) AS cs, "
        "  length(text) - 7 AS li FROM documents), "
        "pos AS (SELECT doc_id, cs, li, unnest(range(0, GREATEST(li, 0))) AS p FROM codes), "
        f"h AS (SELECT doc_id, li, p, ({terms}) % {_sg.M64} AS hv FROM pos), "
        "w AS (SELECT doc_id, li, p AS c, "
        "  MIN(hv) OVER (PARTITION BY doc_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS m "
        "  FROM h), "
        "w2 AS (SELECT *, LAG(m) OVER (PARTITION BY doc_id ORDER BY c) AS mprev FROM w), "
        "sel AS (SELECT doc_id, c, m FROM w2 "
        "  WHERE (c <= li - 16 OR (c = 0 AND li > 0)) AND (c = 0 OR m <> mprev))"
    )


def _dup_span_sql() -> str:
    """SQL twin of textstages.dup_span_scores: the shared winnowing
    selection, DISTINCT (doc, span), per-span distinct-doc counts, per-doc
    duplicated-span fraction (integer counts + one identical division)."""
    return (
        f"WITH {_winnow_sel_ctes()}, "
        "dsx AS MATERIALIZED (SELECT DISTINCT doc_id, m FROM sel), "
        "dfr AS (SELECT m, COUNT(*)::BIGINT AS df FROM dsx GROUP BY m) "
        "SELECT doc_id, COUNT(*)::BIGINT AS n_spans, "
        "SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_spans, "
        "ROUND(CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS dup_frac "
        "FROM dsx JOIN dfr USING (m) GROUP BY doc_id"
    )


# tile grid with exact f64 bounds (tile_bounds restated; w=5.625, h=5.0 dyadic)
_TILE_GRID_SQL = (
    "tgrid AS (SELECT CAST(x.range AS INTEGER) AS tile_x, CAST(y.range AS INTEGER) AS tile_y, "
    "  -180.0 + x.range*5.625 AS tbx0, -80.0 + y.range*5.0 AS tby0, "
    "  -180.0 + x.range*5.625 + 5.625 AS tbx1, -80.0 + y.range*5.0 + 5.0 AS tby1 "
    f"  FROM range(0,{GRID_X}) x, range(0,{GRID_Y}) y)"
)

# tile center → containing feature (the zonal/texture tile→feature map)
_TILE_FEATURE_SQL = (
    "tcent AS (SELECT tile_x, tile_y, (tbx0 + tbx1)/2.0 AS cx, (tby0 + tby1)/2.0 AS cy FROM tgrid), "
    f"tfeat AS (SELECT t.tile_x, t.tile_y, p.feature_id FROM tcent t JOIN polys p ON {pip_sql('t.cx', 't.cy')})"
)




def _cms_counts_sql(width: int = 1024, depth: int = 4,
                    probes: tuple = tuple(range(1, 33))) -> str:
    """SQL twin of stages/sketches.cms_counts over events.user_id: the
    depth×width count table is rebuilt with the IDENTICAL hash chain
    (fnv1a64 of user_id::VARCHAR → xor per-row seed → splitmix64 → low
    bits), and each probe's cell indices are computed in Python with the
    ENGINE's own hash functions and inlined as literals — the data-side
    chain is what the value-hash verifies."""
    from ..stages.sketches import _cms_index, _cms_seeds

    seeds = _cms_seeds(depth)
    pidx = _cms_index(np.asarray([str(p) for p in probes], object), seeds, width)
    steps = [("_fh", _sg.fnv1a64_expr("k")),
             *_sg.splitmix64_steps("_fh", "_sh", "f")]  # engine: sm(fnv(k)) first
    sel = []
    for j in range(depth):
        steps.append((f"_x{j}", _sg.u64_xor("_sh", str(int(seeds[j])))))
        steps.extend(_sg.splitmix64_steps(f"_x{j}", f"_h{j}", f"c{j}"))
        sel.append(f"SELECT {j} AS j, CAST(_h{j} & {width - 1} AS BIGINT) AS idx FROM hx")
    pv = ", ".join(
        f"({int(p)}, {j}, {int(pidx[j, i])})"
        for i, p in enumerate(probes) for j in range(depth)
    )
    return (
        "WITH ev AS (SELECT user_id::VARCHAR AS k FROM events), "
        "hx AS (" + _sg.chain("SELECT k FROM ev", steps) + "), "
        "cells AS (" + " UNION ALL ".join(sel) + "), "
        "counts AS (SELECT j, idx, COUNT(*) AS n FROM cells GROUP BY j, idx), "
        f"pv(user_id, j, idx) AS (VALUES {pv}) "
        "SELECT pv.user_id::BIGINT AS user_id, "
        "CAST(MIN(COALESCE(counts.n, 0)) AS BIGINT) AS est_count "
        "FROM pv LEFT JOIN counts ON counts.j = pv.j AND counts.idx = pv.idx "
        "GROUP BY pv.user_id"
    )


def _warp_utm_sql(tile_px: int = 16, zone: int = 18, e0: float = 300000.0,
                  n0: float = 4000000.0, step: float = 5000.0,
                  out_w: int = 64, out_h: int = 64) -> str:
    """SQL twin of raster.warp_tiles_utm: the target grid's inverse-mapped
    (lon, lat) are inlined as literals (the inverse series itself is
    verified by the utm_roundtrip identity oracle + the conformality /
    roundtrip pytest); the SQL verifies the WARP content — source pixel
    indexing (identical floor chain) and nearest-neighbor sampling against
    the closed-form raster."""
    from ..stages.raster import warp_target_spec

    spec = warp_target_spec(tile_px, zone, e0, n0, step, out_w, out_h)
    vals = ", ".join(
        f"({int(r)}, {int(c)}, CAST({float(lo)!r} AS DOUBLE), CAST({float(la)!r} AS DOUBLE))"
        for r, c, lo, la in zip(spec["tgt_row"], spec["tgt_col"], spec["lon"], spec["lat"])
    )
    gw, gh = GRID_X * tile_px, GRID_Y * tile_px
    return (
        f"WITH {tiles_sql(tile_px)}, "
        f"tgt(tgt_row, tgt_col, lon, lat) AS (VALUES {vals}), "
        "gidx AS (SELECT tgt_row, tgt_col, "
        f"  CAST(FLOOR((lon + 180.0) / 360.0 * {gw}) AS BIGINT) AS gc, "
        f"  CAST(FLOOR((lat + 80.0) / 160.0 * {gh}) AS BIGINT) AS gr FROM tgt) "
        "SELECT g.tgt_row::BIGINT AS tgt_row, g.tgt_col::BIGINT AS tgt_col, r.vd AS value "
        f"FROM gidx g JOIN rast r ON r.tile_x = g.gc // {tile_px} AND r.px = g.gc % {tile_px} "
        f"AND r.tile_y = g.gr // {tile_px} AND r.py = g.gr % {tile_px}"
    )


def _bloom_semi_sql(bits_per_key: int = 8, k: int = 3,
                    segment: str = "BUILDING") -> str:
    """SQL twin of sketches.bloom_auto_bits + bloom_build + bloom_probe
    composed as a semi-join pre-filter: the bitmap size is derived from
    COUNT(*) of the build side exactly like the engine (smallest power of
    two ≥ bits_per_key·n, picked by MIN over an integer VALUES list — no
    float LOG2 on either side), the build side's distinct bit positions
    are rebuilt with the IDENTICAL hash chain (splitmix64(fnv1a64(key))
    xor seed_j → splitmix64 → mod m — the CMS chain), and a probe key
    passes iff ALL k of its positions are set.  False positives are part
    of the operator's deterministic contract, so the twin reproduces them
    exactly; the engine's OR-merge order cannot matter (bitwise OR is
    commutative)."""
    from ..stages.sketches import _cms_seeds

    seeds = _cms_seeds(k)
    steps = [("_fh", _sg.fnv1a64_expr("k")),
             *_sg.splitmix64_steps("_fh", "_sh", "f")]
    for j in range(k):
        steps.append((f"_x{j}", _sg.u64_xor("_sh", str(int(seeds[j])))))
        steps.extend(_sg.splitmix64_steps(f"_x{j}", f"_h{j}", f"b{j}"))
        steps.append((f"pos{j}", f"CAST(_h{j} % m AS BIGINT)"))
    pows = ", ".join(f"({1 << e})" for e in range(6, 41))
    bh = _sg.chain(
        f"SELECT c_custkey::VARCHAR AS k, mm.m AS m FROM customer, mm "
        f"WHERE c_mktsegment = '{segment}'", steps)
    ph = _sg.chain(
        "SELECT o_custkey, o_custkey::VARCHAR AS k, mm.m AS m FROM orders, mm",
        steps)
    bpos = " UNION ".join(f"SELECT pos{j} AS pos FROM bh" for j in range(k))
    conds = " AND ".join(f"pos{j} IN (SELECT pos FROM bpos)" for j in range(k))
    return (
        f"WITH bc AS (SELECT COUNT(*) AS n FROM customer "
        f"WHERE c_mktsegment = '{segment}'), "
        f"mm AS MATERIALIZED (SELECT MIN(p) AS m FROM (VALUES {pows}) pows(p), bc "
        f"WHERE p >= {bits_per_key} * GREATEST(bc.n, 1)), "
        f"bh AS MATERIALIZED ({bh}), "
        f"bpos AS MATERIALIZED ({bpos}), "
        f"ph AS ({ph}) "
        f'SELECT o_custkey, COUNT(*) AS "count" FROM ph '
        f"WHERE {conds} GROUP BY o_custkey"
    )


def _hist_quantiles_sql(lo: float = 0.0, width: float = 64.0,
                        nbins: int = 2048,
                        qs: tuple = (0.25, 0.5, 0.75, 0.99)) -> str:
    """SQL twin of sketches.hist_quantiles over lineitem(l_returnflag,
    l_extendedprice): identical bin chain (FLOOR((x-lo)/width) clamped),
    integer cumulative counts via a window SUM, first-bin pick via QUALIFY
    ROW_NUMBER, and the SAME f64 interpolation expression.  Every float
    literal is CAST(... AS DOUBLE) — a bare 0.99 is a DuckDB DECIMAL and
    0.99*N would be exact decimal arithmetic, silently diverging from the
    engine's f64 q*N (the float-literal trap, CLAUDE.md round-2)."""
    flo, fw = f"CAST({lo!r} AS DOUBLE)", f"CAST({width!r} AS DOUBLE)"
    sels, joins, outs = [], [], []
    for q in qs:
        nm = f"q{int(round(q * 100))}"
        fq = f"CAST({q!r} AS DOUBLE)"
        est = f"{flo} + bin * {fw} + {fw} * ({fq} * n - (cum - cnt)) / cnt"
        sels.append(
            f"s{nm} AS (SELECT l_returnflag, ROUND({est}, 6) AS {nm} "
            f"FROM cum WHERE cum >= {fq} * n "
            f"QUALIFY ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY bin) = 1)"
        )
        joins.append(f"s{nm}")
        outs.append(nm)
    frm = joins[0] + "".join(f" JOIN {j} USING (l_returnflag)" for j in joins[1:])
    return (
        "WITH li AS (SELECT l_returnflag, LEAST(GREATEST(CAST(FLOOR("
        f"(l_extendedprice - {flo}) / {fw}) AS BIGINT), 0), {nbins - 1}) AS bin "
        "FROM lineitem), "
        "counts AS (SELECT l_returnflag, bin, COUNT(*) AS cnt FROM li GROUP BY 1, 2), "
        "cum AS MATERIALIZED (SELECT l_returnflag, bin, cnt, "
        "SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum, "
        "SUM(cnt) OVER (PARTITION BY l_returnflag) AS n FROM counts), "
        + ", ".join(sels)
        + f" SELECT {joins[0]}.l_returnflag, {', '.join(outs)} FROM {frm}"
    )


def _media_resize_sql(out_w: int = 8, out_h: int = 8) -> str:
    """SQL twin of multimodal.MediaResizer content: the resized payload is
    the nearest-neighbor byte sample pos_j = (j·L)//out_n of the GLRM
    payload (= first 256 UTF-8 bytes of text, pure ASCII → ascii() == the
    byte); the checksum column sums exactly those sampled bytes, so the
    value-hash pins every sampled position. The binary container assembly
    itself is covered by the byte-roundtrip pytest."""
    out_n = out_w * out_h
    return (
        "WITH pay AS (SELECT doc_id, LEAST(length(text), 256) AS n, text FROM documents) "
        f"SELECT doc_id AS media_id, CAST({out_w} AS INTEGER) AS width, "
        f"CAST({out_h} AS INTEGER) AS height, "
        "CAST(CASE WHEN n > 0 THEN "
        f"list_aggregate(list_transform(range(0, {out_n}), "
        f"j -> ascii(text[CAST((j * n) // {out_n} AS BIGINT) + 1])), 'sum') "
        "ELSE 0 END AS BIGINT) AS checksum FROM pay"
    )


def _media_features_sql() -> str:
    """SQL twin of multimodal.MediaFeaturizer: 16-bin byte histogram of the
    GLRM payload (ascii(char) // 16 == byte >> 4 on pure-ASCII text)."""
    hists = ", ".join(
        "CAST(COALESCE(list_aggregate(list_transform(range(1, n + 1), "
        f"i -> CASE WHEN ascii(text[i]) // 16 = {b} THEN 1 ELSE 0 END), 'sum'), 0) "
        f"AS BIGINT) AS h{b}"
        for b in range(16)
    )
    return (
        "WITH pay AS (SELECT doc_id, LEAST(length(text), 256) AS n, text FROM documents) "
        f"SELECT doc_id AS media_id, {hists} FROM pay"
    )


def _paragraph_dedup_sql(words_per_para: int = 12) -> str:
    """SQL twin of dedup.paragraph_dedup: identical fixed-window
    segmentation (list_slice is 1-based inclusive, clamped at the row end
    exactly like the engine's offset rebuild), keep-first via ROW_NUMBER
    ordered by (doc_id, idx) — the engine's lexsort + duplicated() — and
    ordered string_agg reassembly."""
    w = words_per_para
    return (
        "WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), "
        f"ch AS (SELECT doc_id, CAST(unnest(range(0, (len(w) + {w - 1}) // {w})) AS BIGINT) AS idx, w FROM ws), "
        f"paras AS (SELECT doc_id, idx, array_to_string(list_slice(w, idx*{w} + 1, idx*{w} + {w}), ' ') AS para FROM ch), "
        "kept AS (SELECT doc_id, idx, para FROM paras "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, idx) = 1) "
        "SELECT doc_id, string_agg(para, ' ' ORDER BY idx) AS dedup_text, "
        "COUNT(*) AS n_kept FROM kept GROUP BY doc_id"
    )


def _url_canon_sql() -> str:
    """SQL twin of textproc.canonicalize_urls over the messy-URL fixture
    (sources/pages.read_messy_urls — 8 deterministic decoration variants
    by doc_id % 8, restated as a CASE): every normalization step restated
    with split_part / list_filter — lowercase scheme+host, default-port
    strip, fragment drop, tracking-param filter preserving order,
    /index.html fold, trailing-slash strip."""
    return (
        "WITH m AS (SELECT doc_id, "
        "  'https://site-' || (doc_id % 1000) || '.example/' || source || '/' || doc_id AS base, "
        "  'HTTPS://SITE-' || (doc_id % 1000) || '.EXAMPLE/' || source || '/' || doc_id AS upper_u, "
        "  'https://site-' || (doc_id % 1000) || '.example:443/' || source || '/' || doc_id AS port_u, "
        "  'HTTPS://site-' || (doc_id % 1000) || '.EXAMPLE:443/' || source || '/' || doc_id || '/?utm_campaign=x#frag' AS combo "
        "  FROM documents), "
        "mu AS (SELECT doc_id, CASE doc_id % 8 "
        "  WHEN 1 THEN upper_u WHEN 2 THEN port_u WHEN 3 THEN base || '/' "
        "  WHEN 4 THEN base || '#sec' WHEN 5 THEN base || '?utm_source=feed&ref=1' "
        "  WHEN 6 THEN base || '/index.html' WHEN 7 THEN combo ELSE base END AS url FROM m), "
        "c1 AS (SELECT doc_id, url, split_part(url, '#', 1) AS p0 FROM mu), "
        "c2 AS (SELECT doc_id, url, split_part(p0, '?', 1) AS b, "
        "  CASE WHEN contains(p0, '?') THEN split_part(p0, '?', 2) ELSE NULL END AS q FROM c1), "
        "c3 AS (SELECT doc_id, url, q, lower(split_part(b, '://', 1)) AS scheme, "
        "  split_part(b, '://', 2) AS rest FROM c2), "
        "c4 AS (SELECT doc_id, url, q, scheme, lower(split_part(rest, '/', 1)) AS host, "
        "  CASE WHEN contains(rest, '/') THEN substr(rest, position('/' IN rest)) ELSE '' END AS path FROM c3), "
        "c5 AS (SELECT doc_id, url, q, scheme, CASE "
        "  WHEN scheme = 'https' AND ends_with(host, ':443') THEN substr(host, 1, length(host) - 4) "
        "  WHEN scheme = 'http' AND ends_with(host, ':80') THEN substr(host, 1, length(host) - 3) "
        "  ELSE host END AS host, path FROM c4), "
        "c6 AS (SELECT doc_id, url, q, scheme, host, CASE WHEN ends_with(path, '/index.html') "
        "  THEN substr(path, 1, length(path) - 10) ELSE path END AS path FROM c5), "
        "c7 AS (SELECT doc_id, url, q, scheme, host, CASE WHEN length(path) > 1 AND ends_with(path, '/') "
        "  THEN substr(path, 1, length(path) - 1) ELSE path END AS path FROM c6), "
        "c8 AS (SELECT doc_id, url, scheme, host, path, CASE WHEN q IS NULL THEN NULL ELSE "
        "  array_to_string(list_filter(string_split(q, '&'), x -> NOT (starts_with(x, 'utm_') "
        "  OR starts_with(x, 'fbclid') OR starts_with(x, 'gclid')) AND x <> ''), '&') END AS qk FROM c7) "
        "SELECT doc_id, url, scheme || '://' || host || path || "
        "CASE WHEN qk IS NULL OR qk = '' THEN '' ELSE '?' || qk END AS canon_url FROM c8"
    )


def _boilerplate_sql(words_per_para: int = 12, min_docs: int = 2) -> str:
    """SQL twin of dedup.boilerplate_removal: identical fixed-window
    segmentation, drop EVERY occurrence of a paragraph present in
    ≥ min_docs distinct documents, ordered string_agg reassembly."""
    w = words_per_para
    return (
        "WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), "
        f"ch AS (SELECT doc_id, CAST(unnest(range(0, (len(w) + {w - 1}) // {w})) AS BIGINT) AS idx, w FROM ws), "
        f"paras AS MATERIALIZED (SELECT doc_id, idx, array_to_string(list_slice(w, idx*{w} + 1, idx*{w} + {w}), ' ') AS para FROM ch), "
        f"bad AS (SELECT para FROM paras GROUP BY para HAVING COUNT(DISTINCT doc_id) >= {min_docs}), "
        "kept AS (SELECT doc_id, idx, para FROM paras WHERE para NOT IN (SELECT para FROM bad)) "
        "SELECT doc_id, string_agg(para, ' ' ORDER BY idx) AS clean_text, "
        "COUNT(*) AS n_kept FROM kept GROUP BY doc_id"
    )


def _min_rect_sql(tile_px: int = 16, max_tile: int = 5, thresh: float = 1.5) -> str:
    """SQL twin of raster.min_rect_stage: same row/col-extreme reduction,
    pair self-join for candidate directions, exact int64 projection
    aggregates, and the identical single f64 division (Δproj·Δperp)/den.
    Restricted to a tile subset — the pair×point join is O(R³) per tile."""
    t = f"tile_x < {max_tile} AND tile_y < {max_tile}"
    return (
        f"WITH {tiles_sql(tile_px)}, "
        f"fg AS MATERIALIZED (SELECT tile_x, tile_y, px AS x, py AS y FROM rast "
        f"  WHERE vd >= CAST({thresh!r} AS DOUBLE) AND {t}), "
        "rowex AS (SELECT tile_x, tile_y, y, MIN(x) AS xmin, MAX(x) AS xmax FROM fg GROUP BY 1,2,3), "
        "colex AS (SELECT tile_x, tile_y, x, MIN(y) AS ymin, MAX(y) AS ymax FROM fg GROUP BY 1,2,3), "
        "red AS MATERIALIZED (SELECT DISTINCT tile_x, tile_y, x, y FROM ("
        "  SELECT tile_x, tile_y, xmin AS x, y FROM rowex "
        "  UNION ALL SELECT tile_x, tile_y, xmax AS x, y FROM rowex "
        "  UNION ALL SELECT tile_x, tile_y, x, ymin AS y FROM colex "
        "  UNION ALL SELECT tile_x, tile_y, x, ymax AS y FROM colex)), "
        "dirs AS MATERIALIZED (SELECT DISTINCT a.tile_x, a.tile_y, "
        "  b.x - a.x AS dx, b.y - a.y AS dy FROM red a "
        "  JOIN red b USING (tile_x, tile_y) WHERE a.x != b.x OR a.y != b.y), "
        "proj AS (SELECT d.tile_x, d.tile_y, d.dx, d.dy, "
        "  MAX(d.dx*r.x + d.dy*r.y) - MIN(d.dx*r.x + d.dy*r.y) AS dproj, "
        "  MAX(d.dx*r.y - d.dy*r.x) - MIN(d.dx*r.y - d.dy*r.x) AS dperp "
        "  FROM dirs d JOIN red r USING (tile_x, tile_y) GROUP BY 1,2,3,4), "
        "mr AS (SELECT tile_x, tile_y, MIN(CAST(dproj*dperp AS DOUBLE) "
        "  / CAST(dx*dx + dy*dy AS DOUBLE)) AS a FROM proj GROUP BY 1,2), "
        "cnt AS (SELECT tile_x, tile_y, COUNT(*) AS n_fg FROM fg GROUP BY 1,2), "
        "rcnt AS (SELECT tile_x, tile_y, COUNT(*) AS n_red FROM red GROUP BY 1,2), "
        f"base AS (SELECT DISTINCT tile_x, tile_y FROM rast WHERE {t}) "
        "SELECT CAST(base.tile_x AS BIGINT) AS tile_x, CAST(base.tile_y AS BIGINT) AS tile_y, "
        "COALESCE(cnt.n_fg, 0) AS n_fg, COALESCE(rcnt.n_red, 0) AS n_red, "
        "ROUND(COALESCE(mr.a, 0.0), 6) AS min_rect_area "
        "FROM base LEFT JOIN cnt USING (tile_x, tile_y) "
        "LEFT JOIN rcnt USING (tile_x, tile_y) LEFT JOIN mr USING (tile_x, tile_y)"
    )


def _orientation_sql(tile_px: int = 16, thresh: float = 1.5) -> str:
    """SQL twin of raster.orientation_stage: exact integer moment
    aggregates (the atan2 arguments scaled by n²) — zero libm calls."""
    return (
        f"WITH {tiles_sql(tile_px)}, "
        f"fg AS (SELECT tile_x, tile_y, px AS x, py AS y FROM rast "
        f"  WHERE vd >= CAST({thresh!r} AS DOUBLE)), "
        "m AS (SELECT tile_x, tile_y, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy, "
        "  SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy FROM fg GROUP BY 1,2), "
        "base AS (SELECT DISTINCT tile_x, tile_y FROM rast) "
        "SELECT CAST(base.tile_x AS BIGINT) AS tile_x, CAST(base.tile_y AS BIGINT) AS tile_y, "
        "CAST(COALESCE(m.n, 0) AS BIGINT) AS n_fg, "
        "CAST(COALESCE(2*(m.n*m.sxy - m.sx*m.sy), 0) AS BIGINT) AS inum, "
        "CAST(COALESCE((m.n*m.sxx - m.sx*m.sx) - (m.n*m.syy - m.sy*m.sy), 0) AS BIGINT) AS iden "
        "FROM base LEFT JOIN m USING (tile_x, tile_y)"
    )


def _rfe_sql() -> str:
    """SQL twin of train.rfe_rank over lineitem (features l_quantity,
    l_discount, l_tax → l_extendedprice): the stats CTE computes the Gram
    sums, every subset's Cramer solve embeds the SAME fully parenthesized
    expression strings the engine eval()s (train.rfe_weight_exprs), and
    the data-dependent elimination path is unrolled as CASE branches —
    the self-branching analogue of the unrolled-CTE iteration recipe."""
    from ..stages.train import rfe_weight_exprs

    feats = ["l_quantity", "l_discount", "l_tax"]
    y = "l_extendedprice"
    sums = ["COUNT(*)::DOUBLE AS a0_0"]
    for i, f in enumerate(feats, 1):
        sums.append(f"SUM({f}) AS a0_{i}")
        for j, g in enumerate(feats, 1):
            if j >= i:
                sums.append(f"SUM({f}*{g}) AS a{i}_{j}")
    sums.append(f"SUM({y}) AS b0")
    sums += [f"SUM({f}*{y}) AS b{i}" for i, f in enumerate(feats, 1)]
    steps = [(f"wf_{f}", rfe_weight_exprs((1, 2, 3))[f]) for f in (1, 2, 3)]
    for i, j in ((1, 2), (1, 3), (2, 3)):
        ws = rfe_weight_exprs((i, j))
        steps += [(f"w{i}{j}_{i}", ws[i]), (f"w{i}{j}_{j}", ws[j])]
    steps += [(f"ws_{f}", rfe_weight_exprs((f,))[f]) for f in (1, 2, 3)]
    steps += [
        ("d1", "CASE WHEN ABS(wf_1) <= ABS(wf_2) AND ABS(wf_1) <= ABS(wf_3) THEN 1 "
               "WHEN ABS(wf_2) <= ABS(wf_3) THEN 2 ELSE 3 END"),
        ("d2", "CASE d1 WHEN 1 THEN (CASE WHEN ABS(w23_2) <= ABS(w23_3) THEN 2 ELSE 3 END) "
               "WHEN 2 THEN (CASE WHEN ABS(w13_1) <= ABS(w13_3) THEN 1 ELSE 3 END) "
               "ELSE (CASE WHEN ABS(w12_1) <= ABS(w12_2) THEN 1 ELSE 2 END) END"),
        ("surv", "6 - d1 - d2"),
        ("c1", "CASE d1 WHEN 1 THEN wf_1 WHEN 2 THEN wf_2 ELSE wf_3 END"),
        ("c2", "CASE WHEN d1 = 1 AND d2 = 2 THEN w23_2 WHEN d1 = 1 THEN w23_3 "
               "WHEN d1 = 2 AND d2 = 1 THEN w13_1 WHEN d1 = 2 THEN w13_3 "
               "WHEN d2 = 1 THEN w12_1 ELSE w12_2 END"),
        ("c3", "CASE surv WHEN 1 THEN ws_1 WHEN 2 THEN ws_2 ELSE ws_3 END"),
    ]
    x = _sg.chain("SELECT * FROM st", steps)

    def nm(e: str) -> str:
        return (f"CASE {e} WHEN 1 THEN '{feats[0]}' WHEN 2 THEN '{feats[1]}' "
                f"ELSE '{feats[2]}' END")

    scaled = ("SELECT CAST(l_quantity AS DOUBLE) AS l_quantity, "
              "ROUND(l_discount*100, 0) AS l_discount, "
              "ROUND(l_tax*100, 0) AS l_tax, "
              "ROUND(l_extendedprice*100, 0) AS l_extendedprice FROM lineitem")
    return (
        f"WITH st AS (SELECT {', '.join(sums)} FROM ({scaled})), "
        f"x AS MATERIALIZED ({x}) "
        f"SELECT {nm('d1')} AS feature, CAST(1 AS BIGINT) AS rfe_rank, ROUND(c1, 6) AS coef_at_drop FROM x "
        f"UNION ALL SELECT {nm('d2')}, 2, ROUND(c2, 6) FROM x "
        f"UNION ALL SELECT {nm('surv')}, 3, ROUND(c3, 6) FROM x"
    )


# --- round-3 late-query SQL builders (moved from __ray_entry__ to keep
# the driver contract a thin registry; VERDICT r2 next #10). They embed
# the SAME constants the query functions use (__ray_entry__ imports the
# interval/model literals from there via the builder parameters). -----

def _weighted_sample_sql(k: int = 50) -> str:
    """SQL twin of sampling.weighted_sample over orders: identical id-hash
    draw (fnv→xor sm(seed+1)→splitmix64, the train_test_split chain),
    identical skey = LN((h+1)/2^64)/w expression, top-k via ORDER BY
    LIMIT. LN is the one libm call (see the stage docstring's ulp note)."""
    c = str(int(_smx(np.array([1], np.uint64))[0]))
    inner = _sg.chain(
        "SELECT o_orderkey, o_totalprice, CAST(o_orderkey AS VARCHAR) AS _k FROM orders",
        [
            ("_fh", _sg.fnv1a64_expr("_k")),
            ("_fx", _sg.u64_xor("_fh", c)),
            *_sg.splitmix64_steps("_fx", "_h", "h"),
            ("skey", f"LN((CAST(_h AS DOUBLE) + 1.0) / {2.0 ** 64!r}) / o_totalprice"),
        ],
    )
    return (
        # skey_r, NOT an alias named skey: DuckDB's ORDER BY prefers output
        # aliases, and ordering by the ROUNDED value mass-ties the ~1e-8
        # magnitudes and scrambles the selection (caught at sf0.01)
        "SELECT o_orderkey, o_totalprice, ROUND(skey, 12) AS skey_r "
        f"FROM ({inner}) ORDER BY skey DESC LIMIT {k}"
    )


PROMO_WINDOWS = 9  # overlapping 5-day windows every 3 days over the events month


def _promo_intervals() -> pd.DataFrame:
    base = pd.Timestamp("2024-01-01")
    return pd.DataFrame({
        "interval_id": np.arange(PROMO_WINDOWS, dtype=np.int64),
        "lo": [base + pd.Timedelta(days=3 * i) for i in range(PROMO_WINDOWS)],
        "hi": [base + pd.Timedelta(days=3 * i + 5) for i in range(PROMO_WINDOWS)],
    })


def _interval_join_sql(intervals) -> str:
    """SQL twin of _q_interval_join_events: the broadcast interval table as
    a VALUES literal, the stab as a BETWEEN-style theta join. value*100 is
    DOUBLE×INTEGER (no DECIMAL literal), ROUND is half-away = the engine's
    round_half_away, and the summed terms are int-valued f64 → order-exact."""
    vals = ", ".join(
        f"({int(r.interval_id)}, TIMESTAMP '{r.lo}', TIMESTAMP '{r.hi}')"
        for r in intervals.itertuples()
    )
    return (
        f"WITH iv(interval_id, lo, hi) AS (VALUES {vals}) "
        'SELECT CAST(iv.interval_id AS BIGINT) AS interval_id, COUNT(*) AS "count", '
        "SUM(ROUND(e.value * 100, 0)) AS sum_cents "
        "FROM events e JOIN iv ON e.ts >= iv.lo AND e.ts < iv.hi "
        "GROUP BY iv.interval_id"
    )


def _vote_predict_sql(models) -> str:
    """SQL twin of _q_vote_predict: each model's z as the identical linear
    chain, sigmoids averaged left-associatively, threshold on the
    UNROUNDED mean (the engine compares before rounding)."""
    zs = []
    for i, (feats, b, w) in enumerate(models, 1):
        terms = " + ".join(f"{wj!r}*{f}" for wj, f in zip(w, feats))
        zs.append(f"{terms} + {b!r} AS z{i}")
    mean = "((1/(1 + EXP(-z1)) + 1/(1 + EXP(-z2))) + 1/(1 + EXP(-z3)))/3.0"
    return (
        f"WITH z AS (SELECT l_orderkey, l_linenumber, {', '.join(zs)} FROM lineitem) "
        f"SELECT l_orderkey, l_linenumber, ROUND({mean}, 6) AS proba_vote, "
        f"CASE WHEN {mean} > 0.5 THEN 1 ELSE 0 END AS pred FROM z"
    )



def _pii_redact_sql() -> str:
    """SQL twin of textproc.redact_pii over the PII fixture
    (sources/pages.read_pii_docs — deterministic decoration by doc_id % 5,
    restated as a CASE): counts via regexp_extract_all on the original
    decorated text, masks via chained regexp_replace(..., 'g'). The regex
    strings are imported from textproc (single source of truth) and are in
    the Python-re ∩ RE2 common subset."""
    from .textproc import PII_EMAIL_RE, PII_IP_RE, PII_PHONE_RE
    return (
        "WITH m AS (SELECT doc_id, text, CAST(doc_id AS VARCHAR) AS i, "
        "  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS ph FROM documents), "
        "d AS (SELECT doc_id, CASE doc_id % 5 "
        "  WHEN 1 THEN text || ' contact user' || i || '@mail' || (doc_id % 50) || '.example now' "
        "  WHEN 2 THEN text || ' call +1-555-' || ph || ' today' "
        "  WHEN 3 THEN text || ' from 10.' || (doc_id % 256) || '.' || ((doc_id // 7) % 256) "
        "    || '.' || ((doc_id // 11) % 256) || ' logged' "
        "  WHEN 4 THEN text || ' mail u' || i || '@h' || (doc_id % 9) || '.example or +1-555-' "
        "    || ph || ' ip 192.168.' || (doc_id % 256) || '.' || ((doc_id // 3) % 256) "
        "  ELSE text END AS text FROM m) "
        f"SELECT doc_id, length(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS n_email, "
        f"length(regexp_extract_all(text, '{PII_PHONE_RE}')) AS n_phone, "
        f"length(regexp_extract_all(text, '{PII_IP_RE}')) AS n_ip, "
        f"regexp_replace(regexp_replace(regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g'), "
        f"'{PII_PHONE_RE}', '<PHONE>', 'g'), '{PII_IP_RE}', '<IP>', 'g') AS red_text FROM d"
    )

def _badword_sql() -> str:
    """SQL twin of textproc.badword_counts over raw documents: identical
    alternation regex (Python re ∩ RE2 subset), C4 keep = zero hits."""
    from .textproc import BADWORDS
    pat = "\\b(?:" + "|".join(BADWORDS) + ")\\b"
    return (
        f"SELECT doc_id, length(regexp_extract_all(text, '{pat}')) AS n_bad, "
        f"length(regexp_extract_all(text, '{pat}')) = 0 AS kept FROM documents"
    )

def _ann_lsh_sql(n_tables: int = 4, n_bits: int = 8, dim: int = 64,
                 seed: int = 9, k: int = 10) -> str:
    """SQL twin of knn.lsh_topk over raw embeddings: each sign bit is the
    same SIGNED SUM of CAST(embedding[i] AS DOUBLE) (±1 hyperplane rows
    inlined as +/- prefixes — exact at any summation order, so the bit
    and hence the table signatures match the engine bit-for-bit);
    candidate = signature equality in >=1 table; ranking is the
    ann_cosine_topk pattern (rank only, vec_id tiebreak)."""
    from ..stages.knn import lsh_hyperplanes

    H = lsh_hyperplanes(dim, n_tables, n_bits, seed)

    def bit(j: int) -> str:
        parts = []
        for i in range(dim):
            sgn = "+" if H[j, i] > 0 else "-"
            parts.append(f"{sgn} CAST(embedding[{i + 1}] AS DOUBLE)")
        body = " ".join(parts).lstrip("+ ")
        if parts[0].startswith("-"):
            body = "- " + body.lstrip("- ")
        return f"(CASE WHEN ({body}) >= 0 THEN 1 ELSE 0 END)"

    sig_cols = []
    for t in range(n_tables):
        terms = [f"{1 << b} * {bit(t * n_bits + b)}" for b in range(n_bits)]
        sig_cols.append("(" + " + ".join(terms) + f") AS sig{t}")
    on = " OR ".join(f"q.sig{t} = s.sig{t}" for t in range(n_tables))
    return (
        "WITH sig AS (SELECT vec_id, embedding, " + ", ".join(sig_cols)
        + " FROM embeddings), "
        "q AS (SELECT * FROM sig WHERE vec_id % 50 = 0), "
        "r AS (SELECT q.vec_id AS query_id, s.vec_id AS neighbor_id, "
        "  ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY "
        "    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(s.embedding AS DOUBLE[])) DESC, "
        "    s.vec_id ASC) AS rank "
        f"  FROM q JOIN sig s ON ({on})) "
        f"SELECT query_id, neighbor_id, rank FROM r WHERE rank <= {k}"
    )

def _inverted_index_sql(max_postings: int = 64) -> str:
    """SQL twin of textstages.inverted_index: same tokenizer as the tfidf
    oracle (string_split on ' ', empties dropped), DISTINCT (doc, term),
    postings = first max_postings ascending doc_ids comma-joined (list
    slice l[1:P] is 1-based inclusive and shrinks at the end), df exact."""
    return (
        "WITH tok AS (SELECT DISTINCT doc_id, tok FROM ("
        "  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) "
        "  WHERE tok <> ''), "
        "g AS (SELECT tok AS term, COUNT(*)::BIGINT AS df, "
        f"  list_sort(list(doc_id))[1:{max_postings}] AS pl "
        "  FROM tok GROUP BY tok) "
        "SELECT term, df, len(pl)::BIGINT AS n_stored, "
        "array_to_string(pl, ',') AS postings FROM g"
    )


def _dsir_sql(n_features: int = 4096, scale: int = 1024,
              target_lang: str = "en") -> str:
    """SQL twin of textstages.dsir_weights: identical hashed uni+bigram
    features (list_filter drops empties, bigrams join the FILTERED
    sequence; the token is projected to its own column BEFORE fnv so the
    fnv lambda's ``i`` can't be shadowed — CLAUDE.md), h = splitmix(fnv)
    masked to n_features buckets, λ chain textually mirrored, integer
    quantization so SUM(q) is order-exact."""
    toks = (
        "SELECT doc_id, lang, unnest(list_concat(lf, "
        "list_transform(generate_series(1, len(lf) - 1), "
        "i -> lf[i] || ' ' || lf[i + 1]))) AS tok "
        "FROM (SELECT doc_id, lang, "
        "list_filter(string_split(text, ' '), w -> w <> '') AS lf "
        "FROM documents)"
    )
    hashed_inner = _sg.chain(
        toks,
        [("_f", _sg.fnv1a64_expr("tok")), *_sg.splitmix64_steps("_f", "_h", "d")])
    lam = (
        f"(((ln(CAST(t_cnt + 1 AS DOUBLE)) - ln(CAST(r_cnt + 1 AS DOUBLE))) "
        f"- ln(CAST(tt + {n_features} AS DOUBLE))) "
        f"+ ln(CAST(rr + {n_features} AS DOUBLE)))"
    )
    return (
        f"WITH hashed AS MATERIALIZED (SELECT doc_id, lang, "
        f"CAST((_h) & {n_features - 1} AS BIGINT) AS h FROM ({hashed_inner})), "
        "fc AS MATERIALIZED (SELECT h, "
        f"SUM(CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END)::BIGINT AS t_cnt, "
        "COUNT(*)::BIGINT AS r_cnt FROM hashed GROUP BY h), "
        "tot AS (SELECT SUM(t_cnt)::BIGINT AS tt, SUM(r_cnt)::BIGINT AS rr FROM fc), "
        f"q AS (SELECT h, CAST(FLOOR({lam} * CAST({scale} AS DOUBLE) "
        "+ CAST(0.5 AS DOUBLE)) AS BIGINT) AS q FROM fc, tot) "
        "SELECT doc_id, COUNT(*)::BIGINT AS n_feats, SUM(q)::BIGINT AS sum_q, "
        f"ROUND(CAST(SUM(q) AS DOUBLE) / CAST({scale} * COUNT(*) AS BIGINT), 6) AS avg_w "
        "FROM hashed JOIN q USING (h) GROUP BY doc_id"
    )


def _pagerank_sql(iters: int = 8, out_links: int = 4, host_mod: int = 1000,
                  seed_mod: int | None = None) -> str:
    """SQL twin of graph.pagerank_hosts: identical hash-derived edges
    (url||'#out'||k projected to its own column before fnv — lambda-shadow
    rule), then ``iters`` unrolled MATERIALIZED rank rounds in pure BIGINT
    arithmetic (``//`` floor division == numpy ``//`` on non-negatives),
    so every round is bit-exact and order-free."""
    q30 = 1 << 30
    lk_base = (
        "SELECT CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) AS src, "
        "url || '#out' || CAST(kr.range AS VARCHAR) AS tok "
        f"FROM pages, range(0, {out_links}) kr"
    )
    lk_inner = _sg.chain(
        lk_base,
        [("_f", _sg.fnv1a64_expr("tok")), *_sg.splitmix64_steps("_f", "_h", "pr")])
    if seed_mod is None:
        base_expr = f"({15 * q30} // (100 * nn.n))"
        r0_expr = f"{q30} // nn.n"
        nn_cte = "nn AS (SELECT COUNT(*)::BIGINT AS n FROM nodes)"
    else:
        base_expr = (f"(CASE WHEN n.host % {seed_mod} = 0 "
                     f"THEN {15 * q30} // (100 * nn.n) ELSE 0 END)")
        r0_expr = (f"CASE WHEN host % {seed_mod} = 0 THEN {q30} // nn.n ELSE 0 END")
        nn_cte = ("nn AS (SELECT GREATEST(COUNT(*), 1)::BIGINT AS n "
                  f"FROM nodes WHERE host % {seed_mod} = 0)")
    rounds = []
    for t in range(1, iters + 1):
        prev = "r0" if t == 1 else f"r{t - 1}"
        rounds.append(
            f"r{t} AS MATERIALIZED (SELECT n.host, "
            f"{base_expr} + (85 * COALESCE(s.s, 0)) // 100 AS r "
            "FROM nodes n CROSS JOIN nn LEFT JOIN ("
            "  SELECT e.dst AS host, SUM((r.r * e.w) // d.wt)::BIGINT AS s "
            f"  FROM edges e JOIN {prev} r ON r.host = e.src "
            "  JOIN deg d ON d.src = e.src GROUP BY e.dst) s "
            "ON s.host = n.host)"
        )
    return (
        f"WITH {pages_sql()}, "
        f"lk AS MATERIALIZED (SELECT src, CAST(_h % {host_mod} AS BIGINT) AS dst "
        f"FROM ({lk_inner})), "
        "edges AS MATERIALIZED (SELECT src, dst, COUNT(*)::BIGINT AS w "
        "FROM lk GROUP BY src, dst), "
        "deg AS MATERIALIZED (SELECT src, SUM(w)::BIGINT AS wt FROM edges GROUP BY src), "
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS host FROM edges "
        "UNION SELECT DISTINCT dst FROM edges), "
        f"{nn_cte}, "
        f"r0 AS MATERIALIZED (SELECT host, {r0_expr} AS r FROM nodes, nn), "
        + ", ".join(rounds) +
        f" SELECT host, r AS r_q, ROUND(CAST(r AS DOUBLE) / {float(q30)!r}, 9) AS pr "
        f"FROM r{iters}"
    )


def _chunk_docs_sql(chunk_tokens: int = 32, overlap: int = 8) -> str:
    """SQL twin of textstages.chunk_documents: generate_series in
    expression context yields per-row chunk ids, list slice l[a+1:a+c] is
    1-based inclusive and shrinks at the tail exactly like the engine's
    min(end, n)."""
    stride = chunk_tokens - overlap
    return (
        "WITH d AS (SELECT doc_id, l, len(l)::BIGINT AS n FROM ("
        "  SELECT doc_id, string_split(text, ' ') AS l FROM documents)), "
        "c AS (SELECT doc_id, n, l, "
        f"unnest(generate_series(0, (n - 1) // {stride})) AS chunk_id FROM d) "
        "SELECT doc_id, chunk_id, "
        f"LEAST(n - chunk_id * {stride}, {chunk_tokens})::BIGINT AS n_tokens, "
        f"array_to_string(l[chunk_id * {stride} + 1 : chunk_id * {stride} + {chunk_tokens}], ' ') AS chunk_text "
        "FROM c"
    )


def _host_cap_sql(k: int = 3) -> str:
    """SQL twin of textstages.host_cap_sample: same fnv/splitmix draw
    reinterpreted as signed BIGINT so ORDER BY matches numpy's int64 view
    bit-for-bit."""
    inner = _sg.chain(
        f"WITH {pages_sql()} SELECT url FROM pages",
        [("_f", _sg.fnv1a64_expr("url")), *_sg.splitmix64_steps("_f", "_h", "hc")])
    draw = _sg.u64_to_i64("_h")
    return (
        "SELECT url, host, draw, rn FROM ("
        "  SELECT url, host, draw, row_number() OVER ("
        "    PARTITION BY host ORDER BY draw, url) AS rn FROM ("
        "    SELECT url, CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) AS host, "
        f"    {draw} AS draw FROM ({inner}))) "
        f"WHERE rn <= {k}"
    )


def _bpe_parts(n_merges: int) -> list[str]:
    """Shared unrolled BPE-round CTE list (see _bpe_merges_sql)."""
    parts = [
        "wc AS MATERIALIZED (SELECT tok AS word, COUNT(*)::BIGINT AS cnt FROM ("
        "  SELECT unnest(string_split(text, ' ')) AS tok FROM documents) "
        "  WHERE tok <> '' GROUP BY tok)",
        "v0 AS MATERIALIZED (SELECT word, cnt, pos, word[pos] AS sym FROM ("
        "  SELECT word, cnt, unnest(generate_series(1, length(word))) AS pos FROM wc))",
    ]
    for r in range(1, n_merges + 1):
        prev = f"v{r - 1}"
        parts += [
            f"e{r} AS MATERIALIZED (SELECT word, cnt, pos, sym, "
            "ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS rn, "
            "LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt "
            f"FROM {prev})",
            f"p{r} AS (SELECT sym || ' ' || nxt AS pair, SUM(cnt)::BIGINT AS c "
            f"FROM e{r} WHERE nxt IS NOT NULL GROUP BY pair)",
            f"b{r} AS MATERIALIZED (SELECT split_part(pair, ' ', 1) AS lhs, "
            f"split_part(pair, ' ', 2) AS rhs, c FROM p{r} "
            "ORDER BY c DESC, pair ASC LIMIT 1)",
            f"mm{r} AS MATERIALIZED (SELECT word, rn, "
            "rn - ROW_NUMBER() OVER (PARTITION BY word ORDER BY rn) AS grp "
            f"FROM e{r}, b{r} WHERE sym = b{r}.lhs AND nxt = b{r}.rhs)",
            f"k{r} AS MATERIALIZED (SELECT word, rn FROM ("
            "  SELECT word, rn, rn - MIN(rn) OVER (PARTITION BY word, grp) AS off "
            f"  FROM mm{r}) WHERE off % 2 = 0)",
            f"v{r} AS MATERIALIZED (SELECT e.word, e.cnt, e.pos, "
            "CASE WHEN k1.rn IS NOT NULL THEN e.sym || e.nxt ELSE e.sym END AS sym "
            f"FROM e{r} e "
            f"LEFT JOIN k{r} k1 ON k1.word = e.word AND k1.rn = e.rn "
            f"LEFT JOIN k{r} k2 ON k2.word = e.word AND k2.rn = e.rn - 1 "
            "WHERE k2.rn IS NULL)",
        ]
    return parts


def _bpe_merges_sql(n_merges: int = 4) -> str:
    """SQL twin of textstages.bpe_train_merges: unrolled MATERIALIZED
    rounds (CLAUDE.md iterative-numerics rule). Greedy left-to-right merge
    = gaps-and-islands over the matched rows (consecutive overlapping
    matches keep even offsets), textually the same run-parity rule the
    engine vectorizes; best pair per round is the identical total order
    (count DESC, pair ASC)."""
    final = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS step, lhs, rhs, c AS pair_cnt FROM b{r}"
        for r in range(1, n_merges + 1))
    return "WITH " + ", ".join(_bpe_parts(n_merges)) + " " + final


def _bpe_token_counts_sql(n_merges: int = 4) -> str:
    """SQL twin of textstages.bpe_token_counts: the final merged vocab
    v{n} reduces to per-word token counts and joins each document's
    distinct-word multiplicities."""
    parts = _bpe_parts(n_merges) + [
        f"wt AS (SELECT word, COUNT(*)::BIGINT AS n_tok FROM v{n_merges} GROUP BY word)",
        "dw AS (SELECT doc_id, tok AS word, COUNT(*)::BIGINT AS k FROM ("
        "  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) "
        "  WHERE tok <> '' GROUP BY doc_id, tok)",
    ]
    return (
        "WITH " + ", ".join(parts) +
        " SELECT doc_id, SUM(k)::BIGINT AS n_words, "
        "SUM(k * n_tok)::BIGINT AS n_bpe_tokens "
        "FROM dw JOIN wt USING (word) GROUP BY doc_id"
    )


def _incremental_dedup_sql(inc_mod: int = 7, inc_rem: int = 3) -> str:
    """SQL twin of dedup.incremental_novel_docs over the deterministic
    base/increment split: identical fnv/splitmix content hash both sides,
    membership = 64-bit hash equality (the store's documented criterion)."""
    inc_inner = _sg.chain(
        f"SELECT doc_id, text FROM documents WHERE doc_id % {inc_mod} = {inc_rem}",
        [("_f", _sg.fnv1a64_expr("text")), *_sg.splitmix64_steps("_f", "_h", "ic")])
    base_inner = _sg.chain(
        f"SELECT text FROM documents WHERE doc_id % {inc_mod} <> {inc_rem}",
        [("_f", _sg.fnv1a64_expr("text")), *_sg.splitmix64_steps("_f", "_h", "bs")])
    h_i64 = _sg.u64_to_i64("_h")
    return (
        f"WITH base AS MATERIALIZED (SELECT {_sg.u64_to_i64('_h')} AS h FROM ({base_inner})) "
        f"SELECT doc_id, {h_i64} AS content_h FROM ({inc_inner}) "
        "WHERE " + h_i64 + " NOT IN (SELECT h FROM base)"
    )


def _embedding_drift_sql(dim: int = 64) -> str:
    """SQL twin of knn.embedding_drift_by_label: exact group sum-vectors
    (f32-valued f64 sums are order-exact at oracle scale), means by one
    division, dot/norms as LEFT-ASSOCIATIVE 64-term chains mirroring the
    engine's reduce order."""
    s_cols = ", ".join(
        f"SUM(CAST(embedding[{i + 1}] AS DOUBLE)) AS s{i}" for i in range(dim))
    g_cols = ", ".join(f"SUM(s{i}) AS g{i}" for i in range(dim))
    dot = " + ".join(f"(s{i} / CAST(n AS DOUBLE)) * (g{i} / CAST(ng AS DOUBLE))"
                     for i in range(dim))
    na = " + ".join(f"(s{i} / CAST(n AS DOUBLE)) * (s{i} / CAST(n AS DOUBLE))"
                    for i in range(dim))
    nb = " + ".join(f"(g{i} / CAST(ng AS DOUBLE)) * (g{i} / CAST(ng AS DOUBLE))"
                    for i in range(dim))
    return (
        f"WITH s AS MATERIALIZED (SELECT label, COUNT(*)::BIGINT AS n, {s_cols} "
        "FROM embeddings GROUP BY label), "
        f"g AS (SELECT SUM(n)::BIGINT AS ng, {g_cols} FROM s) "
        f"SELECT CAST(label AS BIGINT) AS label, n, "
        f"ROUND(({dot}) / (sqrt({na}) * sqrt({nb})), 9) "
        "AS cos_to_global FROM s, g"
    )


def _media_dhash_sql(width: int = 65) -> str:
    """SQL twin of multimodal.dhash_dedup_stage over the GLRM fixture: the
    payload is the first 256 text bytes (ASCII -> ascii() == the byte),
    zero-padded to 65; bit j = byte[j] > byte[j+1] with weight 2^j summed
    in HUGEINT then reinterpreted signed."""
    def byte(i):  # 1-based text char index
        return f"(CASE WHEN length(text) >= {i} THEN ascii(text[{i}]) ELSE 0 END)"

    terms = " + ".join(
        f"(CASE WHEN {byte(j + 1)} > {byte(j + 2)} THEN CAST({1 << j} AS HUGEINT) "
        "ELSE CAST(0 AS HUGEINT) END)"
        for j in range(64))
    dh = _sg.u64_to_i64("_dh")
    return (
        f"WITH h AS MATERIALIZED (SELECT doc_id AS media_id, ({terms}) AS _dh FROM documents) "
        f"SELECT media_id, {dh} AS dhash, "
        "COUNT(*) OVER (PARTITION BY _dh)::BIGINT AS n_same FROM h"
    )


def _rollup_sql(keys=("source", "lang"), value_col="n_chars",
                sentinel="(all)") -> str:
    """SQL twin of agg.rollup_stats: GROUP BY ROLLUP with COALESCE
    sentinels and gid = number of rolled-up keys (GROUPING bitmask 0->0,
    1->1, 3->2 for two keys)."""
    k1, k2 = keys
    return (
        f"SELECT COALESCE({k1}, '{sentinel}') AS {k1}, "
        f"COALESCE({k2}, '{sentinel}') AS {k2}, "
        f"CASE GROUPING({k1}, {k2}) WHEN 0 THEN 0 WHEN 1 THEN 1 ELSE 2 END::BIGINT AS gid, "
        "COUNT(*)::BIGINT AS count, "
        f"ROUND(SUM({value_col}), 4) AS sum_{value_col}, "
        f"ROUND(SUM({value_col}) / CAST(COUNT(*) AS DOUBLE), 4) AS mean_{value_col} "
        f"FROM documents GROUP BY ROLLUP({k1}, {k2})"
    )


def _containment_sql(threshold: float = 0.6, cand_threshold: float = 0.5) -> str:
    """SQL twin of dedup.verify_containment over the MinHash candidates:
    the shared shingle CTEs of _jaccard_verified_sql with the asymmetric
    ratios; rounds BEFORE the GREATEST/threshold compare on both sides."""
    return (
        f"WITH {_minhash_ctes(cand_threshold)}, "
        "sh3s AS (SELECT DISTINCT doc_id, tl[i] || ' ' || tl[i + 1] || ' ' || tl[i + 2] AS s3 "
        "  FROM tpos WHERE i + 2 <= len(tl)), "
        "shc AS (SELECT doc_id, COUNT(*) AS n3 FROM sh3s GROUP BY doc_id), "
        "inter AS (SELECT p.id_a, p.id_b, COUNT(*) AS ni FROM mh_pairs p "
        "  JOIN sh3s a ON a.doc_id = p.id_a JOIN sh3s b ON b.doc_id = p.id_b AND b.s3 = a.s3 "
        "  GROUP BY p.id_a, p.id_b), "
        "c AS (SELECT p.id_a, p.id_b, p.est_jaccard, "
        "  ROUND(COALESCE(ni, 0)::DOUBLE / ca.n3, 6) AS cont_ab, "
        "  ROUND(COALESCE(ni, 0)::DOUBLE / cb.n3, 6) AS cont_ba "
        "  FROM mh_pairs p JOIN shc ca ON ca.doc_id = p.id_a JOIN shc cb ON cb.doc_id = p.id_b "
        "  LEFT JOIN inter ON inter.id_a = p.id_a AND inter.id_b = p.id_b) "
        "SELECT id_a, id_b, est_jaccard, cont_ab, cont_ba, "
        "GREATEST(cont_ab, cont_ba) AS max_cont FROM c "
        f"WHERE GREATEST(cont_ab, cont_ba) >= CAST({threshold!r} AS DOUBLE)"
    )


def _jl_project_sql(out_dim: int = 8, dim: int = 64) -> str:
    """SQL twin of knn.jl_project: the sign matrix inlined as +/- terms
    (order-free exact sums of f32-valued f64 terms), /sqrt(k) as the
    identical repr literal."""
    import numpy as np

    from ..stages.knn import jl_sign_matrix

    S = jl_sign_matrix(dim, out_dim)
    rt = repr(float(np.sqrt(np.float64(out_dim))))
    cols = []
    for j in range(out_dim):
        terms = " + ".join(
            f"({'' if S[d, j] > 0 else '-'}CAST(embedding[{d + 1}] AS DOUBLE))"
            for d in range(dim))
        cols.append(f"(({terms}) / {rt}) AS y{j}")
    return f"SELECT vec_id, {', '.join(cols)} FROM embeddings"


def _corpus_shuffle_sql() -> str:
    """SQL twin of sampling.corpus_shuffle_order: the same splitmix64
    bijection as a signed BIGINT, rank = row_number over it (no tiebreak
    needed — the finalizer is injective on ids)."""
    inner = _sg.chain("SELECT doc_id FROM documents",
                      _sg.splitmix64_steps("doc_id", "_h", "shf"))
    return (
        f"SELECT doc_id, hkey, row_number() OVER (ORDER BY hkey)::BIGINT AS shuffle_rank "
        f"FROM (SELECT doc_id, {_sg.u64_to_i64('_h')} AS hkey FROM ({inner}))"
    )


def _laea_sql() -> str:
    """SQL twin of raster.reproject_points_laea: Snyder's ellipsoidal LAEA
    with every constant a repr literal and the identical chain order, then
    the UTM twin's f32 snap + decimeter round."""
    from ..stages import raster as _r

    R = repr(float(np.radians(1.0)))
    E, E2 = repr(float(_r._LAEA_E)), repr(float(_r._LAEA_E2))
    IE2 = repr(float(1.0 - _r._LAEA_E2))
    HE = repr(float(1.0 / (2.0 * _r._LAEA_E)))
    QP = repr(float(_r._LAEA_QP))
    RQ = repr(float(_r._LAEA_RQ))
    SB1, CB1 = repr(float(_r._LAEA_SB1)), repr(float(_r._LAEA_CB1))
    D = repr(float(_r._LAEA_D))
    return (
        f"WITH {pages_sql()}, "
        f"l0 AS (SELECT url, lon, lat FROM ({_located_sql()})), "
        f"l1 AS (SELECT url, SIN(lat * {R}) AS s, "
        f"  (lon - {repr(float(_r._LAEA_LON0))}) * {R} AS dl FROM l0), "
        f"l2 AS (SELECT *, {IE2} * (s / (1.0 - {E2} * s * s) "
        f"  - {HE} * LN((1.0 - {E} * s) / (1.0 + {E} * s))) AS q FROM l1), "
        f"l3 AS (SELECT *, q / {QP} AS sb FROM l2), "
        "l4 AS (SELECT *, SQRT(1.0 - sb * sb) AS cb, COS(dl) AS cd FROM l3), "
        f"l5 AS (SELECT *, {RQ} * SQRT(2.0 / (1.0 + {SB1} * sb + {CB1} * (cb * cd))) AS bb FROM l4) "
        "SELECT url, "
        f"ROUND(CAST(CAST({repr(float(_r._LAEA_FE))} + (bb * {D}) * (cb * SIN(dl)) AS REAL) AS DOUBLE), 1) AS laea_x, "
        f"ROUND(CAST(CAST({repr(float(_r._LAEA_FN))} + (bb / {D}) * ({CB1} * sb - {SB1} * (cb * cd)) AS REAL) AS DOUBLE), 1) AS laea_y "
        "FROM l5"
    )


def _lang_confusion_sql() -> str:
    """SQL twin of the language-ID confusion matrix: the lang_id twin
    carrying the true lang, then the value_counts shape (count + row-
    normalized fraction per true language)."""
    return (
        f"WITH pr AS ({_lang_id_sql(carry=('lang',))}) "
        "SELECT lang, lang_pred, COUNT(*)::BIGINT AS n, "
        "ROUND(COUNT(*)::DOUBLE / SUM(COUNT(*)) OVER (PARTITION BY lang), 6) AS frac "
        "FROM pr GROUP BY lang, lang_pred"
    )


def _bm25_sql(queries: dict[int, list[str]], k: int = 10) -> str:
    """SQL twin of textstages.bm25_topk: exact integer tf/df/dl/N, the
    Lucene positive-IDF BM25 chain with the engine's exact parenthesization
    (constants CAST AS DOUBLE — the DECIMAL-literal trap), each term score
    snapped to f32 so the per-doc SUM of ≤|query| f32-valued f64 terms is
    order-exact, rank = row_number over (score DESC, doc_id)."""
    vals = ", ".join(f"({q}, '{t}')" for q, ts in sorted(queries.items()) for t in ts)
    return (
        f"WITH qt(query_id, tok) AS (VALUES {vals}), "
        "toks AS MATERIALIZED (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
        "  FROM documents), "
        "tf AS (SELECT doc_id, tok, COUNT(*)::BIGINT AS tf FROM toks "
        "  WHERE tok <> '' GROUP BY doc_id, tok), "
        "dl AS (SELECT doc_id, COUNT(*)::BIGINT AS dl FROM toks "
        "  WHERE tok <> '' GROUP BY doc_id), "
        "n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents), "
        "tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS tot FROM toks WHERE tok <> ''), "
        "qtf AS (SELECT * FROM tf WHERE tok IN (SELECT tok FROM qt)), "
        "dfq AS (SELECT tok, COUNT(*)::BIGINT AS df FROM qtf GROUP BY tok), "
        "s AS (SELECT qt.query_id, qtf.doc_id, CAST(CAST("
        "  ln(((n.n - df) + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)) "
        "     + CAST(1 AS DOUBLE)) "
        "  * (tf * (CAST(1.2 AS DOUBLE) + CAST(1 AS DOUBLE))) "
        "  / (tf + CAST(1.2 AS DOUBLE) * ((CAST(1 AS DOUBLE) - CAST(0.75 AS DOUBLE)) "
        "     + CAST(0.75 AS DOUBLE) * (dl.dl / (tot.tot / n.n)))) "
        "  AS REAL) AS DOUBLE) AS s "
        "  FROM qtf JOIN qt USING (tok) JOIN dfq USING (tok) "
        "  JOIN dl USING (doc_id), n, tot), "
        "agg AS (SELECT query_id, doc_id, SUM(s) AS score FROM s "
        "  GROUP BY query_id, doc_id) "
        "SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score, rn FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY query_id "
        f"    ORDER BY score DESC, doc_id) AS rn FROM agg) WHERE rn <= {k}"
    )


def _hll_grouped_sql(group_col: str = "event_type", table: str = "events",
                     key_expr: str = "CAST(user_id AS VARCHAR)") -> str:
    """SQL twin of sketches.hll_distinct_grouped: the proven
    splitmix64∘fnv1a64 register chain (hll_distinct_urls twin), grouped,
    with the harmonic sum as an EXACT integer Σ 2^(53−reg) in HUGEINT —
    no float-sum order dependence — then one identical f64 chain."""
    from . import sqlgen as _sg

    base = f"SELECT {group_col}, {key_expr} AS k FROM {table}"
    hx = _sg.chain(base, [("_fh", _sg.fnv1a64_expr("k")),
                          *_sg.splitmix64_steps("_fh", "_h", "g")])
    return (
        f"WITH hx AS MATERIALIZED ({hx}), "
        f"r AS (SELECT {group_col}, CAST(_h // 4503599627370496 AS BIGINT) AS idx, "
        "  LEAST(64 - CAST(FLOOR(LOG2(CAST((_h % 4503599627370496) * 4096 + 4095 "
        "  AS DOUBLE))) AS BIGINT), 53) AS rank FROM hx), "
        f"regs AS (SELECT {group_col}, idx, MAX(rank) AS reg FROM r "
        f"  GROUP BY {group_col}, idx), "
        f"s AS (SELECT {group_col}, "
        "  SUM(9007199254740992 // (CAST(1 AS BIGINT) << reg)) "
        "  + (4096 - COUNT(*)) * CAST(9007199254740992 AS HUGEINT) AS ssc, "
        f"  4096 - COUNT(*) AS zeros FROM regs GROUP BY {group_col}), "
        f"e AS (SELECT {group_col}, "
        "  CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / 4096) "
        # ssc can reach 4096*2^53 = 2^65; DuckDB's HUGEINT->DOUBLE cast is
        # only correctly rounded below 2^64 (above, it composes the two
        # 64-bit limbs with two roundings). Two-limb chain: hi*2^26 is an
        # exact power-of-two scale, + lo rounds once = numpy bit-for-bit.
        "  * 4096 * 4096 / ((CAST(ssc >> 26 AS DOUBLE) * CAST(67108864 AS DOUBLE) "
        "  + CAST(ssc & 67108863 AS DOUBLE)) / CAST(9007199254740992 AS DOUBLE)) AS est, "
        "  zeros FROM s) "
        f"SELECT {group_col}, ROUND(CASE WHEN est <= CAST(2.5 AS DOUBLE) * 4096 "
        "  AND zeros > 0 THEN 4096 * LN(CAST(4096 AS DOUBLE) / zeros) "
        "  ELSE est END, 1) AS approx_distinct FROM e"
    )


def _lang_temp_weights_sql(rep_scale: int = 1000) -> str:
    """SQL twin of textstages.lang_temperature_weights: α = 1/2 temperature
    resampling with IEEE-exact SQRT, f32-snapped shares (order-exact
    ≤ #languages denominator sum), one identical f64 weight chain, and the
    splitmix64(doc_id) extra-rep draw against floor(frac·2^64) (clamped at
    2^64−2^11 both sides — the f64-rounding guard at frac → 1)."""
    from . import sqlgen as _sg

    hx = _sg.chain("SELECT doc_id, lang FROM documents",
                   [*_sg.splitmix64_steps("CAST(doc_id AS HUGEINT)", "_h", "tw")])
    return (
        "WITH n AS (SELECT lang, COUNT(*)::BIGINT AS nl FROM documents GROUP BY lang), "
        "t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents), "
        "s AS (SELECT lang, nl, CAST(CAST(SQRT(nl / t.n) AS REAL) AS DOUBLE) AS sl "
        "  FROM n, t), "
        "d AS (SELECT SUM(sl) AS denom FROM s), "
        "w AS (SELECT lang, (sl / d.denom) / (nl / t.n) AS w FROM s, d, t), "
        "wr AS (SELECT lang, w, CAST(FLOOR(w * " + f"CAST({rep_scale} AS DOUBLE)" + ") AS BIGINT) AS base, "
        "  CAST(LEAST(FLOOR((w * " + f"CAST({rep_scale} AS DOUBLE)"
        " - FLOOR(w * " + f"CAST({rep_scale} AS DOUBLE)" + ")) "
        "  * CAST(18446744073709551616 AS DOUBLE)), "
        "  CAST(18446744073709549568 AS DOUBLE)) AS HUGEINT) AS thr FROM w), "
        f"hx AS ({hx}) "
        "SELECT hx.doc_id, hx.lang, ROUND(wr.w, 6) AS w, "
        "wr.base + CASE WHEN hx._h < wr.thr THEN 1 ELSE 0 END AS reps "
        "FROM hx JOIN wr ON hx.lang = wr.lang"
    )


def _snapshot_diff_sql() -> str:
    """SQL twin of cdc.snapshot_diff over the v1/v2 snapshot fixtures:
    fnv1a64 content hashes (equality-by-hash, identical predicate to the
    engine), full outer join on doc_id, unchanged rows dropped."""
    from . import sqlgen as _sg
    from ..sources.snapshots import snapshot_sql

    def h(src: str, tag: str) -> str:
        return _sg.chain(f"SELECT doc_id, text FROM {src}",
                         [(f"_h_{tag}", _sg.fnv1a64_expr("text"))])

    return (
        f"WITH {snapshot_sql(1)}, {snapshot_sql(2)}, "
        f"h1 AS ({h('v1', 'a')}), h2 AS ({h('v2', 'b')}), "
        "j AS (SELECT COALESCE(h1.doc_id, h2.doc_id) AS doc_id, "
        "  h1._h_a AS ha, h2._h_b AS hb "
        "  FROM h1 FULL OUTER JOIN h2 ON h1.doc_id = h2.doc_id) "
        "SELECT doc_id, CASE WHEN ha IS NULL THEN 'added' "
        "WHEN hb IS NULL THEN 'removed' ELSE 'changed' END AS change "
        "FROM j WHERE ha IS NULL OR hb IS NULL OR ha <> hb"
    )


def _triangle_sql(out_links: int = 4, host_mod: int = 1000) -> str:
    """SQL twin of graph.triangle_count_hosts: identical hash-derived host
    edges (the pagerank twin's lk fragment), undirected simple graph,
    degree-(id) oriented wedges, closing-edge join — all integer counts."""
    lk_base = (
        "SELECT CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) AS src, "
        "url || '#out' || CAST(kr.range AS VARCHAR) AS tok "
        f"FROM pages, range(0, {out_links}) kr"
    )
    lk_inner = _sg.chain(
        lk_base,
        [("_f", _sg.fnv1a64_expr("tok")), *_sg.splitmix64_steps("_f", "_h", "tr")])
    return (
        f"WITH {pages_sql()}, "
        f"lk AS MATERIALIZED (SELECT src, CAST(_h % {host_mod} AS BIGINT) AS dst "
        f"FROM ({lk_inner})), "
        "ue AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS u, "
        "GREATEST(src, dst) AS v FROM lk WHERE src <> dst), "
        "nd AS MATERIALIZED (SELECT node, COUNT(*)::BIGINT AS deg FROM ("
        "  SELECT u AS node FROM ue UNION ALL SELECT v AS node FROM ue) "
        "  GROUP BY node), "
        "ornt AS MATERIALIZED (SELECT "
        "  CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u < v) "
        "    THEN u ELSE v END AS s, "
        "  CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u < v) "
        "    THEN v ELSE u END AS t "
        "  FROM ue JOIN nd da ON da.node = ue.u JOIN nd db ON db.node = ue.v), "
        "wd AS MATERIALIZED (SELECT e1.t AS a, e2.t AS b "
        "  FROM ornt e1 JOIN ornt e2 ON e1.s = e2.s "
        "  JOIN nd d1 ON d1.node = e1.t JOIN nd d2 ON d2.node = e2.t "
        "  WHERE d1.deg < d2.deg OR (d1.deg = d2.deg AND e1.t < e2.t)) "
        "SELECT (SELECT COUNT(*) FROM ue) AS n_edges, "
        "(SELECT COUNT(*) FROM wd) AS n_wedges, "
        "(SELECT COUNT(*) FROM wd JOIN ornt "
        "  ON ornt.s = wd.a AND ornt.t = wd.b) AS n_triangles"
    )


def _geohash_sql(precision: int = 8) -> str:
    """(url, gh{p}, gh4) — the SQL twin of stages/cellindex.geocode_and_geohash
    / functions/geo.geohash_encode: same closed-form quantization float chain
    verbatim, bit interleave as an explicit shift-and-or sum, base32 chars by
    substr. Integer-valued doubles throughout, so the BIGINT casts are exact."""
    nbits = 5 * precision
    nx = (nbits + 1) // 2
    ny = nbits // 2
    steps: list[tuple[str, str]] = [
        ("_ghx", "CAST(LEAST(GREATEST(FLOOR((lon + 180.0) / 360.0 * "
         f"{float(1 << nx)!r}), 0.0), {float((1 << nx) - 1)!r}) AS BIGINT)"),
        ("_ghy", "CAST(LEAST(GREATEST(FLOOR((lat + 90.0) / 180.0 * "
         f"{float(1 << ny)!r}), 0.0), {float((1 << ny) - 1)!r}) AS BIGINT)"),
    ]
    terms = [f"(((_ghx >> {nx - 1 - i}) & 1) << {nbits - 1 - 2 * i})"
             for i in range(nx)]
    terms += [f"(((_ghy >> {ny - 1 - i}) & 1) << {nbits - 2 - 2 * i})"
              for i in range(ny)]
    steps.append(("_ghc", " + ".join(terms)))
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    chars = [f"substr('{alpha}', CAST(((_ghc >> {5 * (precision - 1 - j)}) "
             "& 31) AS INTEGER) + 1, 1)" for j in range(precision)]
    steps.append((f"gh{precision}", " || ".join(chars)))
    steps.append(("gh4", f"substr(gh{precision}, 1, 4)"))
    inner = _sg.chain(_located_sql(), steps)
    return f"SELECT url, gh{precision}, gh4 FROM ({inner})"


def _dbscan_sql(eps: float = 0.002, min_pts: int = 5,
                rounds: int = 14) -> str:
    """SQL twin of stages/cluster.grid_dbscan over geocoded pages: pid =
    signed splitmix64(fnv1a64(url)), neighbor test is the IDENTICAL f64
    chain ((ax-bx)*(ax-bx) + (ay-by)*(ay-by) <= eps²) on both sides (a
    bounding-box pre-filter prunes the join without changing the verdict
    set), core = count ≥ min_pts INCLUDING self, components as ``rounds``
    unrolled MATERIALIZED min-label passes over the symmetric core-core
    edges (measured convergence ≤ 8 at sf0.001/0.01/0.1; rounds = 14 is
    the measured-plus-margin schedule — any converging schedule yields
    the same fixpoint, the component MIN), borders attach to the MIN-id
    core within eps, noise = -1."""
    e = f"CAST({eps!r} AS DOUBLE)"
    e2 = f"CAST({eps * eps!r} AS DOUBLE)"
    pid_chain = _sg.chain(
        "SELECT url FROM pages",
        [("_f", _sg.fnv1a64_expr("url")),
         *_sg.splitmix64_steps("_f", "_hq", "db"),
         *_sg.geocode_steps()])
    pts = (f"SELECT {_sg.u64_to_i64('_hq')} AS pid, lon AS x, lat AS y "
           f"FROM ({pid_chain})")
    box = (f"b.x >= a.x - {e} AND b.x <= a.x + {e} "
           f"AND b.y >= a.y - {e} AND b.y <= a.y + {e}")
    d2 = "(a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)"
    ctes = [
        f"pts AS MATERIALIZED ({pts})",
        "nb AS MATERIALIZED (SELECT a.pid, COUNT(*)::BIGINT AS n_nbrs "
        f"  FROM pts a JOIN pts b ON {box} AND {d2} <= {e2} GROUP BY a.pid)",
        "co AS MATERIALIZED (SELECT p.pid, p.x, p.y FROM pts p "
        f"  JOIN nb USING (pid) WHERE n_nbrs >= {min_pts})",
        "ed AS MATERIALIZED (SELECT a.pid AS u, b.pid AS v FROM co a "
        f"  JOIN co b ON {box} AND {d2} <= {e2} AND a.pid <> b.pid)",
        "l0 AS (SELECT pid, pid AS lab FROM co)",
    ]
    for t in range(1, rounds + 1):
        p = f"l{t - 1}"
        ctes.append(
            f"l{t} AS MATERIALIZED (SELECT l.pid, "
            f"  LEAST(l.lab, COALESCE(MIN(ln.lab), l.lab)) AS lab "
            f"  FROM {p} l LEFT JOIN ed e ON e.u = l.pid "
            f"  LEFT JOIN {p} ln ON ln.pid = e.v GROUP BY l.pid, l.lab)")
    ctes.append(
        "bref AS (SELECT a.pid, MIN(b.pid) AS cr FROM "
        f"  (SELECT p.* FROM pts p JOIN nb USING (pid) "
        f"   WHERE n_nbrs < {min_pts}) a "
        f"  JOIN co b ON {box} AND {d2} <= {e2} GROUP BY a.pid)")
    return (  # no WITH prefix: composes after the pages CTE
        ", ".join(ctes) + " "
        "SELECT p.pid, nb.n_nbrs, "
        f"CAST(CASE WHEN nb.n_nbrs >= {min_pts} THEN 1 ELSE 0 END AS BIGINT) "
        "AS is_core, "
        "CAST(CASE "
        f"  WHEN nb.n_nbrs >= {min_pts} THEN lc.lab "
        "  WHEN bref.cr IS NOT NULL THEN lb.lab "
        "  ELSE -1 END AS BIGINT) AS cluster_id "
        "FROM pts p JOIN nb USING (pid) "
        f"LEFT JOIN l{rounds} lc ON lc.pid = p.pid "
        "LEFT JOIN bref ON bref.pid = p.pid "
        f"LEFT JOIN l{rounds} lb ON lb.pid = bref.cr"
    )


def _nearest_city_sql() -> str:
    """SQL twin of cellindex.nearest_city: per-city haversine distances as
    the IDENTICAL f64 chain (constants inlined as numpy-computed reprs,
    atan2 closing — numpy↔DuckDB SIN/COS/ATAN2/SQRT bit-parity proven by
    the UTM family), argmin by first-match CASE (ties break to the
    smallest index on both sides), f32-snapped rounded km."""
    rad = _geo._RAD
    steps = list(_sg.geocode_steps())
    dcols = []
    for k, (cx, cy) in enumerate(_geo.HOT_CITIES):
        cos2 = float(np.cos(float(cy) * rad))
        steps.append((f"_dp{k}", f"SIN(({float(cy)!r} - lat) * {rad!r} / 2.0)"))
        steps.append((f"_dl{k}", f"SIN(({float(cx)!r} - lon) * {rad!r} / 2.0)"))
        steps.append((f"_a{k}",
                      f"_dp{k} * _dp{k} + COS(lat * {rad!r}) * {cos2!r} "
                      f"* (_dl{k} * _dl{k})"))
        steps.append((f"_d{k}",
                      f"{_geo._2R_KM!r} * ATAN2(SQRT(_a{k}), "
                      f"SQRT(1.0 - _a{k}))"))
        dcols.append(f"_d{k}")
    steps.append(("_dmin", f"LEAST({', '.join(dcols)})"))
    city = ("CASE " + " ".join(f"WHEN _d{k} = _dmin THEN {k}"
                               for k in range(len(_geo.HOT_CITIES)))
            + " END")
    inner = _sg.chain("SELECT url FROM pages", steps)
    return (f"SELECT url, CAST({city} AS BIGINT) AS city, "
            "ROUND(CAST(CAST(_dmin AS REAL) AS DOUBLE), 6) AS dist_km "
            f"FROM ({inner})")


def _hex_kring_sql(res: int = 7) -> str:
    """SQL twin of cellindex.hex_kring_smooth: identical geocode + hex
    chain, per-cell aggregation, then the 7 one-ring neighbors via PURE
    ARITHMETIC on the packed axial id (HUGEINT intermediate; deltas
    dq·2²⁷ + dr mirror cellindex._HEX_RING1 exactly)."""
    deltas = [0, (1 << 27), (1 << 27) - 1, -1,
              -(1 << 27), -(1 << 27) + 1, 1]
    vals = ", ".join(f"({d})" for d in deltas)
    located = _sg.chain(
        "SELECT url, length(text)::BIGINT AS nch FROM pages",
        _sg.geocode_steps() + _sg.hex_cell_steps(res, "cell"))
    return (
        f"agg AS MATERIALIZED (SELECT cell, COUNT(*)::BIGINT AS n, "
        f"SUM(nch)::BIGINT AS s FROM ({located}) GROUP BY cell), "
        f"offs(d) AS (VALUES {vals}), "
        "ring AS (SELECT a.cell, COUNT(*)::BIGINT AS ring_cells, "
        "  SUM(b.n)::BIGINT AS ring_pages, SUM(b.s)::BIGINT AS ring_chars "
        "  FROM agg a CROSS JOIN offs o JOIN agg b "
        "  ON CAST(b.cell AS HUGEINT) = CAST(a.cell AS HUGEINT) + o.d "
        "  GROUP BY a.cell) "
        f"SELECT a.cell AS cell_h3_r{res}, a.n AS n_own, r.ring_cells, "
        "r.ring_pages, "
        "ROUND(CAST(r.ring_chars AS DOUBLE) / r.ring_pages, 6) "
        "AS mean_chars_ring "
        "FROM agg a JOIN ring r USING (cell)"
    )


def _learned_index_sql() -> str:
    """SQL twin of train.learned_index_audit: rank via ROW_NUMBER, exact
    integer sufficient statistics, the identical Cramer f64 chain, and
    the quantize-before-max error bound."""
    return (
        "WITH rk AS (SELECT o_orderkey AS k, "
        "ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS r FROM orders), "
        "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS sk, "
        "CAST(SUM(r) AS BIGINT) AS sr, CAST(SUM(k * r) AS BIGINT) AS skr, "
        "CAST(SUM(k * k) AS BIGINT) AS sk2 FROM rk), "
        "ab AS (SELECT n, "
        "(CAST(n AS DOUBLE) * CAST(skr AS DOUBLE) - CAST(sk AS DOUBLE) * CAST(sr AS DOUBLE)) "
        "/ (CAST(n AS DOUBLE) * CAST(sk2 AS DOUBLE) - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE)) AS slope, "
        "sk, sr FROM s), "
        "ab2 AS (SELECT n, slope, "
        "(CAST(sr AS DOUBLE) - slope * CAST(sk AS DOUBLE)) / CAST(n AS DOUBLE) AS icept FROM ab), "
        "er AS (SELECT MAX(CAST(FLOOR(ABS(a.icept + a.slope * CAST(rk.k AS DOUBLE) "
        "- CAST(rk.r AS DOUBLE)) * CAST(1048576.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS m "
        "FROM rk, ab2 a) "
        "SELECT a.n, "
        "CAST(FLOOR(a.slope * CAST(1048576.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS slope_q, "
        "CAST(FLOOR(a.icept * CAST(1048576.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS intercept_q, "
        "er.m AS max_err_q FROM ab2 a, er"
    )


def _hex_rollup_sql(res_child: int = 9, parents: tuple = (7, 5)) -> str:
    """SQL twin of cellindex.hex_rollup_counts: child cells via the
    geocode + hex chain, each parent level from the EXACT dyadic axial
    division (q/2^k, r/2^k) with the explicit FLOOR(x+0.5) cube-round
    tie rule — geo.hex_cell_to_parent_exact bit-for-bit (the float
    center re-encode ties on dyadic quarters where numpy half-even and
    SQL half-away ROUND diverge)."""
    off = 1 << 26
    m27 = (1 << 27) - 1
    located = _sg.chain("SELECT url FROM pages",
                        _sg.geocode_steps() + _sg.hex_cell_steps(res_child, "cell"))
    ctes = [
        f"agg{res_child} AS MATERIALIZED (SELECT cell, COUNT(*)::BIGINT AS n "
        f"FROM ({located}) GROUP BY cell)",
    ]
    prev = res_child
    for pres in parents:
        k = prev - pres
        sc = repr(float(2.0 ** k))
        steps = [
            ("qf", f"CAST(q AS DOUBLE) / CAST({sc} AS DOUBLE)"),
            ("rf", f"CAST(r AS DOUBLE) / CAST({sc} AS DOUBLE)"),
            ("sf", "-qf - rf"),
            ("q0", "FLOOR(qf + 0.5)"),
            ("r0", "FLOOR(rf + 0.5)"),
            ("s0", "FLOOR(sf + 0.5)"),
            ("dq", "ABS(q0 - qf)"),
            ("dr", "ABS(r0 - rf)"),
            ("ds_", "ABS(s0 - sf)"),
            ("fq", "(dq > dr AND dq > ds_)"),
            ("fr", "(NOT fq AND dr > ds_)"),
            ("qi", "CAST(CASE WHEN fq THEN -r0 - s0 ELSE q0 END AS BIGINT)"),
            ("ri", "CAST(CASE WHEN fr THEN -q0 - s0 ELSE r0 END AS BIGINT)"),
            ("pcell", f"CAST(CAST({1 << 63} + {pres} * {1 << 54} "
                      f"+ (qi + {off}) * {1 << 27} + (ri + {off}) AS HUGEINT) AS UBIGINT)"),
        ]
        unpack = (
            f"SELECT CAST((CAST(cell AS HUGEINT) >> 27) & {m27} AS BIGINT) - {off} AS q, "
            f"CAST(CAST(cell AS HUGEINT) & {m27} AS BIGINT) - {off} AS r, n "
            f"FROM agg{prev}"
        )
        enc = _sg.chain(unpack, steps)
        ctes.append(
            f"agg{pres} AS MATERIALIZED (SELECT pcell AS cell, SUM(n)::BIGINT AS n "
            f"FROM ({enc}) GROUP BY pcell)")
        prev = pres
    sel = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS res, "
        + _sg.u64_to_i64("CAST(cell AS HUGEINT)")
        + f" AS cell, n FROM agg{r}"
        for r in (res_child, *parents))
    return f"WITH {pages_sql(cols='url')}, " + ", ".join(ctes) + " " + sel


def _canny_ctes(side: int = 16, quant: float = 8.0, lo2: int = 20_000,
                hi2: int = 40_000, rounds: int = 20,
                tx_max: int = 15, ty_max: int = 15) -> tuple[list[str], str]:
    """Canny CTE chain (see _canny_sql) ending with the final edge-pixel
    set CTE ``ced(tile_x, tile_y, px, py, idx, g2, strong)``. Returns
    (ctes, "ced") so the composed ms_toposeg twin can burn the identical
    edge set. ``rast`` must already be in scope (tiles_sql)."""
    wrow = "PARTITION BY tile_x, tile_y, py ORDER BY px"
    wcol = "PARTITION BY tile_x, tile_y, px ORDER BY py"
    steps: list[tuple[str, str]] = [
        ("rs", f"COALESCE(LAG(q) OVER ({wrow}), q) + 2*q "
               f"+ COALESCE(LEAD(q) OVER ({wrow}), q)"),
        ("s", f"COALESCE(LAG(rs) OVER ({wcol}), rs) + 2*rs "
              f"+ COALESCE(LEAD(rs) OVER ({wcol}), rs)"),
        ("dxx", f"COALESCE(LEAD(s) OVER ({wrow}), s) "
                f"- COALESCE(LAG(s) OVER ({wrow}), s)"),
        ("dyy", f"COALESCE(LEAD(s) OVER ({wcol}), s) "
                f"- COALESCE(LAG(s) OVER ({wcol}), s)"),
        ("gx", f"COALESCE(LAG(dxx) OVER ({wcol}), dxx) + 2*dxx "
               f"+ COALESCE(LEAD(dxx) OVER ({wcol}), dxx)"),
        ("gy", f"COALESCE(LAG(dyy) OVER ({wrow}), dyy) + 2*dyy "
               f"+ COALESCE(LEAD(dyy) OVER ({wrow}), dyy)"),
        ("g2", "gx*gx + gy*gy"),
        ("sec", "CASE WHEN 2*ABS(gy) <= ABS(gx) THEN 0 "
                "WHEN 2*ABS(gx) <= ABS(gy) THEN 1 "
                "WHEN gx*gy > 0 THEN 2 ELSE 3 END"),
        ("ox", "CASE sec WHEN 0 THEN 1 WHEN 1 THEN 0 WHEN 2 THEN 1 "
               "ELSE 1 END"),
        ("oy", "CASE sec WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 1 "
               "ELSE -1 END"),
    ]
    base = (f"SELECT tile_x, tile_y, px, py, "
            f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) AS q "
            f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}")
    grad = _sg.chain(base, steps)
    ctes = [
        f"gr AS MATERIALIZED ({grad})",
        "mk AS MATERIALIZED (SELECT p.tile_x, p.tile_y, p.px, p.py, "
        f"  p.py * {side} + p.px AS idx, p.g2, "
        f"  CASE WHEN p.g2 > {hi2} THEN 1 ELSE 0 END AS strong "
        "  FROM gr p "
        "  LEFT JOIN gr n1 ON n1.tile_x = p.tile_x AND n1.tile_y = p.tile_y "
        "    AND n1.px = p.px + p.ox AND n1.py = p.py + p.oy "
        "  LEFT JOIN gr n2 ON n2.tile_x = p.tile_x AND n2.tile_y = p.tile_y "
        "    AND n2.px = p.px - p.ox AND n2.py = p.py - p.oy "
        f"  WHERE p.g2 > {lo2} AND p.g2 >= COALESCE(n1.g2, 0) "
        "    AND p.g2 >= COALESCE(n2.g2, 0))",
        "adj AS MATERIALIZED (SELECT a.tile_x, a.tile_y, a.idx AS u, "
        "  b.idx AS v FROM mk a JOIN mk b ON b.tile_x = a.tile_x "
        "  AND b.tile_y = a.tile_y AND ABS(a.px - b.px) <= 1 "
        "  AND ABS(a.py - b.py) <= 1 AND a.idx <> b.idx)",
        "c0 AS (SELECT tile_x, tile_y, idx, idx AS lab FROM mk)",
    ]
    for t in range(1, rounds + 1):
        p = f"c{t - 1}"
        ctes.append(
            f"c{t} AS MATERIALIZED (SELECT l.tile_x, l.tile_y, l.idx, "
            f"  LEAST(l.lab, COALESCE(MIN(ln.lab), l.lab)) AS lab "
            f"  FROM {p} l LEFT JOIN adj e ON e.tile_x = l.tile_x "
            f"  AND e.tile_y = l.tile_y AND e.u = l.idx "
            f"  LEFT JOIN {p} ln ON ln.tile_x = l.tile_x "
            f"  AND ln.tile_y = l.tile_y AND ln.idx = e.v "
            f"  GROUP BY l.tile_x, l.tile_y, l.idx, l.lab)")
    ctes.append(
        f"cs AS (SELECT c.tile_x, c.tile_y, c.lab FROM c{rounds} c "
        "  JOIN mk USING (tile_x, tile_y, idx) "
        "  GROUP BY c.tile_x, c.tile_y, c.lab HAVING MAX(mk.strong) = 1)")
    ctes.append(
        "ced AS MATERIALIZED (SELECT m.tile_x, m.tile_y, m.px, m.py, "
        "  m.idx, m.g2, m.strong "
        f"  FROM mk m JOIN c{rounds} l USING (tile_x, tile_y, idx) "
        "  JOIN cs ON cs.tile_x = m.tile_x AND cs.tile_y = m.tile_y "
        "  AND cs.lab = l.lab)")
    return ctes, "ced"


def _canny_sql(side: int = 16, quant: float = 8.0, lo2: int = 20_000,
               hi2: int = 40_000, rounds: int = 20,
               tx_max: int = 15, ty_max: int = 15) -> str:
    """SQL twin of raster.canny_edges_stage: separable integer smooth /
    Sobel as LAG/LEAD windows with COALESCE replicate borders, the integer
    NMS sector rule as CASE offsets + two neighbor self-joins, hysteresis
    as ``rounds`` unrolled MATERIALIZED min-label passes over the 8-conn
    survivor adjacency (measured convergence 16 on the closed-form raster,
    which is sf-independent; 20 = margin)."""
    ctes, fin = _canny_ctes(side, quant, lo2, hi2, rounds, tx_max, ty_max)
    return (
        f"WITH {tiles_sql(side)}, " + ", ".join(ctes) + " "
        "SELECT CAST(tile_x AS BIGINT) AS tile_x, "
        "CAST(tile_y AS BIGINT) AS tile_y, CAST(px AS BIGINT) AS px, "
        "CAST(py AS BIGINT) AS py, g2, "
        "CAST(strong AS BIGINT) AS strong "
        f"FROM {fin}"
    )


def _ndcg_sql(queries: dict, k: int = 10) -> str:
    """SQL twin of textstages.ndcg_bm25_docs: the bm25 oracle embeds as
    a subquery; relevance = exact term-occurrence counts; DCG/IDCG
    unroll rank-by-rank with the shared 1/log2(i+1) weight literals."""
    from ..stages.textstages import NDCG_WEIGHTS

    qt = ", ".join(f"({q}, '{t}')" for q, ts in sorted(queries.items())
                   for t in ts)

    def gain(src: str) -> str:
        terms = []
        for i in range(1, k + 1):
            w = repr(NDCG_WEIGHTS[i - 1])
            terms.append(
                f"CAST({w} AS DOUBLE) * CAST(COALESCE((SELECT rel FROM {src} x "
                f"WHERE x.query_id = g.query_id AND x.r = {i}), 0) AS DOUBLE)")
        acc = terms[0]
        for t in terms[1:]:
            acc = f"({acc} + {t})"
        return acc

    return (
        f"WITH qt(query_id, tok) AS (VALUES {qt}), "
        "tokx AS MATERIALIZED (SELECT doc_id, UNNEST(list_filter("
        "string_split(text, ' '), x -> len(x) > 0)) AS tok FROM documents), "
        "rel AS MATERIALIZED (SELECT qt.query_id, tokx.doc_id, "
        "CAST(COUNT(*) AS BIGINT) AS rel FROM qt JOIN tokx ON tokx.tok = qt.tok "
        "GROUP BY 1, 2), "
        f"bm AS MATERIALIZED ({_bm25_sql(queries, k=k)}), "
        "rk AS (SELECT bm.query_id, bm.rn AS r, COALESCE(rel.rel, 0) AS rel "
        "FROM bm LEFT JOIN rel ON rel.query_id = bm.query_id "
        "AND rel.doc_id = bm.doc_id), "
        "ik AS (SELECT query_id, ROW_NUMBER() OVER (PARTITION BY query_id "
        "ORDER BY rel DESC, doc_id ASC) AS r, rel FROM rel "
        f"QUALIFY r <= {k}), "
        "g AS (SELECT DISTINCT query_id FROM qt) "
        "SELECT CAST(g.query_id AS BIGINT) AS query_id, "
        f"CAST(FLOOR({gain('rk')} * CAST(1048576.0 AS DOUBLE) "
        "+ CAST(0.5 AS DOUBLE)) AS BIGINT) AS dcg_q, "
        f"CAST(FLOOR({gain('ik')} * CAST(1048576.0 AS DOUBLE) "
        "+ CAST(0.5 AS DOUBLE)) AS BIGINT) AS idcg_q, "
        f"CAST(FLOOR(CASE WHEN {gain('ik')} > 0 THEN {gain('rk')} / {gain('ik')} "
        "ELSE 0.0 END * CAST(1048576.0 AS DOUBLE) "
        "+ CAST(0.5 AS DOUBLE)) AS BIGINT) AS ndcg_q "
        "FROM g"
    )


def _ucb_replay_sql(max_rounds: int = 31) -> str:
    """SQL twin of streaming.ucb_replay_events: (day, arm) cent
    aggregates, then ``max_rounds`` unrolled replay rounds — unseen-first
    pick, UCB argmax with ln(t) literals inlined from the SAME Python
    computation the engine uses, per-round state CTEs (arms rows);
    rounds beyond the actual day count leave state unchanged and emit
    nothing."""
    ctes = [
        "la AS MATERIALIZED (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, "
        "event_type AS arm, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS s "
        "FROM events GROUP BY 1, 2)",
        "dy AS (SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS t "
        "FROM (SELECT DISTINCT day FROM la))",
        "st0 AS (SELECT DISTINCT arm, CAST(0 AS BIGINT) AS n, "
        "CAST(0 AS BIGINT) AS s FROM la)",
    ]
    sels = []
    for t in range(1, max_rounds + 1):
        p = f"st{t - 1}"
        lnt = repr(float(np.log(np.float64(t))))
        ctes += [
            f"p{t} AS MATERIALIZED (SELECT CASE WHEN "
            f"(SELECT COUNT(*) FROM {p} WHERE n = 0) > 0 "
            f"THEN (SELECT MIN(arm) FROM {p} WHERE n = 0) "
            f"ELSE (SELECT arm FROM {p} ORDER BY "
            "CAST(s AS DOUBLE) / CAST(n AS DOUBLE) "
            f"+ SQRT(CAST(2.0 AS DOUBLE) * CAST({lnt} AS DOUBLE) "
            "/ CAST(n AS DOUBLE)) DESC, arm ASC LIMIT 1) END AS arm)",
            f"st{t} AS MATERIALIZED (SELECT st.arm, "
            "st.n + CASE WHEN st.arm = p.arm THEN COALESCE(l.n, 0) ELSE 0 END AS n, "
            "st.s + CASE WHEN st.arm = p.arm THEN COALESCE(l.s, 0) ELSE 0 END AS s "
            f"FROM {p} st CROSS JOIN p{t} p LEFT JOIN "
            f"(SELECT la.arm, la.n, la.s FROM dy JOIN la ON la.day = dy.day "
            f"WHERE dy.t = {t}) l ON l.arm = st.arm)",
        ]
        sels.append(
            f"SELECT CAST({t} AS BIGINT) AS day_idx, p.arm, st.n AS n_after, "
            f"st.s AS s_after FROM p{t} p JOIN st{t} st ON st.arm = p.arm "
            f"WHERE EXISTS (SELECT 1 FROM dy WHERE t = {t})")
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(sels)


def _consistent_hash_sql(n_servers: int = 16, vnodes: int = 8) -> str:
    """SQL twin of textstages.consistent_hash_pages: ring positions
    inlined as the Python-computed u64 literals, first-position-≥-hash
    routing with wraparound, per-server counts."""
    from ..functions.hashing import splitmix64 as _sm

    ids = np.arange(n_servers * vnodes, dtype=np.uint64)
    old = np.seterr(over="ignore")
    try:
        ring = _sm(ids)
    finally:
        np.seterr(**old)
    vals = ", ".join(f"({int(p)}, {int(i) // vnodes})"
                     for i, p in zip(ids, ring))
    key = _sg.chain("SELECT url FROM pages",
                    [("_f", _sg.fnv1a64_expr("url")),
                     *_sg.splitmix64_steps("_f", "h", "ch")])
    return (
        f"WITH {pages_sql(cols='url')}, "
        f"ring(pos, server) AS (VALUES {vals}), "
        f"ky AS MATERIALIZED (SELECT h FROM ({key})), "
        "rt AS (SELECT COALESCE("
        "(SELECT server FROM ring WHERE pos >= ky.h ORDER BY pos LIMIT 1), "
        "(SELECT server FROM ring ORDER BY pos LIMIT 1)) AS server FROM ky) "
        "SELECT CAST(server AS BIGINT) AS server, "
        "CAST(COUNT(*) AS BIGINT) AS n_keys FROM rt GROUP BY server"
    )


def _phrase_search_sql(phrases: tuple = ("data pipeline", "query engine",
                                         "hash join")) -> str:
    """SQL twin of textstages.phrase_search_docs: positional bigrams via
    the generate_series list comprehension, per-phrase occurrence and
    distinct-doc counts."""
    pv = ", ".join(f"('{p}')" for p in phrases)
    return (
        "WITH tl AS MATERIALIZED (SELECT doc_id, list_filter("
        "string_split(text, ' '), x -> len(x) > 0) AS l FROM documents), "
        "bg AS MATERIALIZED (SELECT doc_id, UNNEST(list_transform("
        "generate_series(1, len(l) - 1), i -> l[i] || ' ' || l[i + 1])) AS big FROM tl), "
        f"ph(phrase) AS (VALUES {pv}) "
        "SELECT ph.phrase, "
        "CAST(COUNT(DISTINCT CASE WHEN bg.big = ph.phrase THEN bg.doc_id END) AS BIGINT) AS n_docs, "
        "CAST(COUNT(CASE WHEN bg.big = ph.phrase THEN 1 END) AS BIGINT) AS n_occurrences "
        "FROM ph LEFT JOIN bg ON bg.big = ph.phrase GROUP BY ph.phrase"
    )


def _ktruss_sql(ks: tuple = (3, 4), rounds: int = 12, out_links: int = 4,
                host_mod: int = 1000) -> str:
    """SQL twin of graph.ktruss_hosts: the label_prop edge fragment, then
    per k the deletion rounds unrolled — support = common-neighbor count
    via the dirs wedge join, simultaneous deletion per round."""
    lk_base = (
        "SELECT CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) AS src, "
        "url || '#out' || CAST(kr.range AS VARCHAR) AS tok "
        f"FROM pages, range(0, {out_links}) kr"
    )
    lk_inner = _sg.chain(
        lk_base,
        [("_f", _sg.fnv1a64_expr("tok")), *_sg.splitmix64_steps("_f", "_h", "kt")])
    ctes = [
        f"lk AS MATERIALIZED (SELECT src, CAST(_h % {host_mod} AS BIGINT) AS dst "
        f"FROM ({lk_inner}))",
        "e0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS u, "
        "GREATEST(src, dst) AS v FROM lk WHERE src <> dst)",
    ]
    sels = []
    for k in ks:
        prev = "e0"
        for t in range(1, rounds + 1):
            name = f"k{k}e{t}"
            ctes += [
                f"{name}d AS (SELECT u AS a, v AS b FROM {prev} "
                f"UNION ALL SELECT v, u FROM {prev})",
                f"{name} AS MATERIALIZED (SELECT e.u, e.v FROM {prev} e "
                "WHERE (SELECT COUNT(*) FROM "
                f"{name}d d1 JOIN {name}d d2 ON d2.a = e.v AND d2.b = d1.b "
                f"WHERE d1.a = e.u AND d1.b <> e.v AND d1.b <> e.u) >= {k - 2})",
            ]
            prev = name
        sels.append(
            f"SELECT CAST({k} AS BIGINT) AS k, u, v FROM {prev}")
    return "WITH " + pages_sql(cols="url") + ", " + ", ".join(ctes) + " "         + " UNION ALL ".join(sels)


def _cuped_sql(cutoff: str = "2024-01-15 00:00:00") -> str:
    """SQL twin of agg.cuped_events: per-user pre/post cent sums,
    HUGEINT sufficient sums, the identical single-cast f64 chain."""
    var_chain = _sg.chain(
        "SELECT u, x, y FROM pu",
        _sg.splitmix64_steps("CAST(u AS HUGEINT)", "_h", "cu"))
    return (
        "WITH pu AS MATERIALIZED (SELECT user_id AS u, "
        f"CAST(SUM(CASE WHEN ts < TIMESTAMP '{cutoff}' "
        "THEN CAST(ROUND(value * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS x, "
        f"CAST(SUM(CASE WHEN ts < TIMESTAMP '{cutoff}' "
        "THEN 0 ELSE CAST(ROUND(value * 100, 0) AS BIGINT) END) AS BIGINT) AS y "
        "FROM events GROUP BY user_id), "
        f"pv AS (SELECT u, x, y, CAST(_h % 2 AS BIGINT) AS v FROM ({var_chain})), "
        "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy, "
        "CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy, "
        "CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sx2, "
        "CAST(COUNT(*) FILTER (v = 0) AS BIGINT) AS n0, "
        "CAST(COUNT(*) FILTER (v = 1) AS BIGINT) AS n1, "
        "CAST(SUM(x) FILTER (v = 0) AS HUGEINT) AS sx0, "
        "CAST(SUM(x) FILTER (v = 1) AS HUGEINT) AS sx1, "
        "CAST(SUM(y) FILTER (v = 0) AS HUGEINT) AS sy0, "
        "CAST(SUM(y) FILTER (v = 1) AS HUGEINT) AS sy1 FROM pv), "
        "th AS (SELECT *, "
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) "
        "/ (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta, "
        "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx FROM s) "
        "SELECT n AS n_users, n0 AS n_0, n1 AS n_1, "
        "CAST(FLOOR(theta * CAST(1048576.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS theta_q, "
        "CAST(FLOOR(((CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE) "
        "- theta * (CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE) - mx)) "
        "- (CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE) "
        "- theta * (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) - mx))) "
        "* CAST(1048576.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS adj_diff_q "
        "FROM th"
    )


def _bearing_octants_sql() -> str:
    """SQL twin of streaming.bearing_octants: the dp-trajectory position
    chain, LAG deltas per user in (ts, event_id) order, the integer
    octant rule, grouped counts."""
    xor_c = 0x9E3779B97F4A7C15
    chain = _sg.chain(
        "SELECT user_id, ts, event_id FROM events",
        [*_sg.splitmix64_steps("CAST(event_id AS HUGEINT)", "_h1", "bo1"),
         *_sg.splitmix64_steps(_sg.u64_xor("_h1", str(xor_c)), "_h2", "bo2")])
    return (
        f"WITH p AS MATERIALIZED (SELECT CAST(user_id AS BIGINT) AS u, ts, event_id, "
        "CAST(_h2 % 360000001 AS BIGINT) - 180000000 AS x, "
        "CAST(_h1 % 180000001 AS BIGINT) - 90000000 AS y "
        f"FROM ({chain})), "
        "st AS (SELECT u, x - LAG(x) OVER w AS dx, y - LAG(y) OVER w AS dy "
        "FROM p WINDOW w AS (PARTITION BY u ORDER BY ts, event_id)) "
        "SELECT u AS user_id, "
        "CAST((CASE WHEN dy >= 0 THEN 4 ELSE 0 END) "
        "+ (CASE WHEN dx >= 0 THEN 2 ELSE 0 END) "
        "+ (CASE WHEN ABS(dy) > ABS(dx) THEN 1 ELSE 0 END) AS BIGINT) AS sector, "
        "CAST(COUNT(*) AS BIGINT) AS n_steps "
        "FROM st WHERE dx IS NOT NULL GROUP BY 1, 2"
    )


def _spearman_sql() -> str:
    """SQL twin of agg.spearman_lineitem: doubled tie-averaged ranks
    from per-value window sums, exact integer sufficient sums, the
    identical single-cast f64 chain."""
    def dr(col: str, src: str) -> str:
        return (f"SELECT {col} AS v, 2 * (SUM(n) OVER (ORDER BY {col}) - n) "
                f"+ n + 1 AS dr FROM (SELECT {col}, CAST(COUNT(*) AS BIGINT) AS n "
                f"FROM {src} GROUP BY {col})")

    return (
        "WITH ft AS MATERIALIZED (SELECT CAST(l_quantity AS BIGINT) AS q, "
        "CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS d FROM lineitem), "
        f"rq AS ({dr('q', 'ft')}), rd AS ({dr('d', 'ft')}), "
        "sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(rq.dr) AS BIGINT) AS sx, CAST(SUM(rd.dr) AS BIGINT) AS sy, "
        "CAST(SUM(rq.dr * rd.dr) AS BIGINT) AS sxy, "
        "CAST(SUM(rq.dr * rq.dr) AS BIGINT) AS sx2, "
        "CAST(SUM(rd.dr * rd.dr) AS BIGINT) AS sy2 "
        "FROM ft JOIN rq ON rq.v = ft.q JOIN rd ON rd.v = ft.d) "
        "SELECT n, sxy, sx2, sy2, "
        "CAST(FLOOR((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) "
        "/ SQRT((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) "
        "* (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE) "
        "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) "
        "* CAST(1048576.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS rho_q "
        "FROM sums"
    )


def _clahe_sql(side: int = 16, quant: float = 8.0, n_bins: int = 64,
               shift: int = 16, clip_mult: int = 2, levels: int = 64,
               tx_max: int = 7, ty_max: int = 7) -> str:
    """SQL twin of raster.clahe_stage: per-tile histogram over a dense
    bin spine (range CROSS JOIN — empty bins participate in clipping
    and redistribution), window cumsum CDF, all-integer mapping."""
    npx = side * side
    L = clip_mult * npx // n_bins
    return (
        f"WITH {tiles_sql(side)}, "
        "pb AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        f"GREATEST(LEAST(CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) "
        f"+ {shift}, {n_bins - 1}), 0) AS b "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        "tl AS (SELECT DISTINCT tile_x, tile_y FROM pb), "
        f"spine AS (SELECT tile_x, tile_y, k.range AS b FROM tl, range(0, {n_bins}) k), "
        "hist AS (SELECT s.tile_x, s.tile_y, s.b, "
        "CAST(COALESCE(c.h, 0) AS BIGINT) AS h FROM spine s LEFT JOIN ("
        "SELECT tile_x, tile_y, b, COUNT(*) AS h FROM pb GROUP BY 1, 2, 3) c "
        "USING (tile_x, tile_y, b)), "
        "ex AS (SELECT tile_x, tile_y, "
        f"CAST(SUM(GREATEST(h - {L}, 0)) AS BIGINT) AS excess FROM hist GROUP BY 1, 2), "
        "cl AS (SELECT hist.tile_x, hist.tile_y, hist.b, "
        f"LEAST(hist.h, {L}) + ex.excess // {n_bins} "
        f"+ CASE WHEN hist.b < ex.excess % {n_bins} THEN 1 ELSE 0 END AS c "
        "FROM hist JOIN ex USING (tile_x, tile_y)), "
        "cd AS (SELECT tile_x, tile_y, b, c, "
        "SUM(c) OVER (PARTITION BY tile_x, tile_y ORDER BY b) AS cdf FROM cl), "
        "mn AS (SELECT tile_x, tile_y, "
        "CAST(MIN(CASE WHEN c > 0 THEN cdf END) AS BIGINT) AS cdf_min "
        "FROM cd GROUP BY 1, 2) "
        "SELECT CAST(p.tile_x AS BIGINT) AS tile_x, CAST(p.tile_y AS BIGINT) AS tile_y, "
        "CAST(p.px AS BIGINT) AS px, CAST(p.py AS BIGINT) AS py, "
        f"CAST((cd.cdf - mn.cdf_min) * {levels - 1} "
        f"// GREATEST({npx} - mn.cdf_min, 1) AS BIGINT) AS eq "
        "FROM pb p JOIN cd ON cd.tile_x = p.tile_x AND cd.tile_y = p.tile_y "
        "AND cd.b = p.b JOIN mn ON mn.tile_x = p.tile_x AND mn.tile_y = p.tile_y"
    )


def _integral_image_sql(side: int = 16, quant: float = 2.0,
                        tx_max: int = 7, ty_max: int = 7) -> str:
    """SQL twin of raster.integral_image_stage: double cumulative window
    SUM over the quantized tile (exact int64)."""
    return (
        f"WITH {tiles_sql(side)}, "
        "rc AS MATERIALIZED (SELECT tile_x, tile_y, py, px, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) AS q "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        "c1 AS (SELECT *, SUM(q) OVER (PARTITION BY tile_x, tile_y, px "
        "ORDER BY py) AS s1 FROM rc) "
        "SELECT CAST(tile_x AS BIGINT) AS tile_x, CAST(tile_y AS BIGINT) AS tile_y, "
        "CAST(px AS BIGINT) AS px, CAST(py AS BIGINT) AS py, "
        "CAST(SUM(s1) OVER (PARTITION BY tile_x, tile_y, py ORDER BY px) "
        "AS BIGINT) AS s FROM c1"
    )


def _cva_sql(side: int = 16, quant: float = 8.0, thresh2: int = 9,
             tx_max: int = 7, ty_max: int = 7) -> str:
    """SQL twin of raster.cva_change_stage: scene-2 / band-1 values
    regenerate from the _tsx/_tsy closed form with the phase-offset grid
    term (the identical f32 snap as tiles_sql), change vector in exact
    quantized ints, octant by the integer rule, per-tile counts."""
    def band(off: int) -> str:
        return ("CAST(CAST(sx.sv + sy.cv + ((r.py*31 + r.px + "
                f"{off}) % 97)/97.0 AS FLOAT) AS DOUBLE)")

    q = f"CAST({quant!r} AS DOUBLE)"
    secs = ", ".join(
        f"CAST(SUM(CASE WHEN ch = 1 AND sec = {s} THEN 1 ELSE 0 END) AS BIGINT) AS sector_{s}"
        for s in range(8))
    return (
        f"WITH {tiles_sql(side)}, "
        "bands AS MATERIALIZED (SELECT r.tile_x, r.tile_y, "
        f"CAST(FLOOR({band(7)} * {q}) AS BIGINT) - CAST(FLOOR(r.vd * {q}) AS BIGINT) AS d0, "
        f"CAST(FLOOR({band(13)} * {q}) AS BIGINT) - CAST(FLOOR({band(3)} * {q}) AS BIGINT) AS d1 "
        "FROM rast r JOIN _tsx sx USING (tile_x) JOIN _tsy sy USING (tile_y) "
        f"WHERE r.tile_x <= {tx_max} AND r.tile_y <= {ty_max}), "
        "cls AS (SELECT tile_x, tile_y, "
        f"CASE WHEN d0*d0 + d1*d1 >= {thresh2} THEN 1 ELSE 0 END AS ch, "
        "(CASE WHEN d1 >= 0 THEN 4 ELSE 0 END) + (CASE WHEN d0 >= 0 THEN 2 ELSE 0 END) "
        "+ (CASE WHEN ABS(d1) > ABS(d0) THEN 1 ELSE 0 END) AS sec FROM bands) "
        "SELECT CAST(tile_x AS BIGINT) AS tile_x, CAST(tile_y AS BIGINT) AS tile_y, "
        f"CAST(SUM(ch) AS BIGINT) AS n_changed, {secs} "
        "FROM cls GROUP BY tile_x, tile_y"
    )


def _colour_thresh_sql(side: int = 16, tx_max: int = 15, ty_max: int = 15,
                       lower=(20, 40, 80), upper=(130, 255, 220)) -> str:
    """SQL twin of raster.colour_thresh_stage: the identical integer HSV
    chain (all dividends kept positive so DuckDB's truncating // equals
    numpy's floor //), in-range mask, exact integer per-tile sums."""
    hl, sl, vl = lower
    hu, su, vu = upper
    steps = [
        ("r8", "GREATEST(LEAST(FLOOR((vd + 2.0) * 40.0), 255), 0)::BIGINT"),
        ("g8", "GREATEST(LEAST(FLOOR((1.2 * vd + 0.1 + 2.0) * 40.0), 255), 0)::BIGINT"),
        ("b8", "GREATEST(LEAST(FLOOR((0.8 * vd + 0.3 + 2.0) * 40.0), 255), 0)::BIGINT"),
        ("v8", "GREATEST(GREATEST(r8, g8), b8)"),
        ("mn8", "LEAST(LEAST(r8, g8), b8)"),
        ("dd", "v8 - mn8"),
        ("ds_", "GREATEST(dd, 1)"),
        ("segx", "CASE WHEN v8 = r8 THEN g8 - b8 WHEN v8 = g8 THEN b8 - r8 ELSE r8 - g8 END"),
        ("segb", "CASE WHEN v8 = r8 THEN 0 WHEN v8 = g8 THEN 120 ELSE 240 END"),
        ("h8", "CASE WHEN dd = 0 THEN 0 ELSE (((60 * segx + 360 * ds_) // ds_ + segb) % 360) // 2 END"),
        ("s8", "CASE WHEN v8 > 0 THEN (510 * dd + v8) // (2 * v8) ELSE 0 END"),
        ("inr", f"CASE WHEN h8 >= {hl} AND h8 <= {hu} AND s8 >= {sl} AND s8 <= {su} "
                f"AND v8 >= {vl} AND v8 <= {vu} THEN 1 ELSE 0 END"),
    ]
    base = (f"SELECT tile_x, tile_y, vd FROM rast "
            f"WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}")
    return (
        f"WITH {tiles_sql(side)}, px AS MATERIALIZED ({_sg.chain(base, steps)}) "
        "SELECT CAST(tile_x AS BIGINT) AS tile_x, CAST(tile_y AS BIGINT) AS tile_y, "
        "CAST(SUM(inr) AS BIGINT) AS n_in, "
        "CAST(SUM(inr * h8) AS BIGINT) AS h_sum, "
        "CAST(SUM(inr * s8) AS BIGINT) AS s_sum, "
        "CAST(SUM(inr * v8) AS BIGINT) AS v_sum "
        "FROM px GROUP BY tile_x, tile_y"
    )


def _phasecong_sql(side: int = 16, quant: float = 8.0, scale: int = 1_048_576,
                   tx_max: int = 7, ty_max: int = 7) -> str:
    """SQL twin of raster.phasecong_stage: the four quadrature convolutions
    per axis as LAG/LEAD windows with COALESCE(·,0) zero padding (exact
    int64 sums), then the single bit-identical float chain — sqrt is
    IEEE-correct on both engines, adds parenthesized exactly as the
    engine's accumulation order, and the output is the floor(pc·2²⁰+0.5)
    integer quantization."""
    wx = "PARTITION BY tile_x, tile_y, py ORDER BY px"
    wy = "PARTITION BY tile_x, tile_y, px ORDER BY py"

    def conv(w: str) -> list[tuple[str, str]]:
        t = "x" if "py ORDER" in w else "y"
        lg = lambda k: f"COALESCE(LAG(q, {k}) OVER ({w}), 0)"
        ld = lambda k: f"COALESCE(LEAD(q, {k}) OVER ({w}), 0)"
        return [
            (f"e1{t}", f"-{lg(2)} + 2*q - {ld(2)}"),
            (f"o1{t}", f"-{lg(2)} - 2*{lg(1)} + 2*{ld(1)} + {ld(2)}"),
            (f"e2{t}", f"-{lg(4)} + 2*q - {ld(4)}"),
            (f"o2{t}", f"-{lg(4)} - 2*{lg(2)} + 2*{ld(2)} + {ld(4)}"),
        ]

    base = (f"SELECT tile_x, tile_y, py, px, "
            f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) AS q "
            f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}")
    grad = _sg.chain(base, conv(wx) + conv(wy))

    def d(c: str) -> str:
        return f"CAST({c} AS DOUBLE)"

    ex = f"SQRT(({d('e1x')} + {d('e2x')})*({d('e1x')} + {d('e2x')}) + ({d('o1x')} + {d('o2x')})*({d('o1x')} + {d('o2x')}))"
    ey = f"SQRT(({d('e1y')} + {d('e2y')})*({d('e1y')} + {d('e2y')}) + ({d('o1y')} + {d('o2y')})*({d('o1y')} + {d('o2y')}))"
    ax = f"(SQRT({d('e1x')}*{d('e1x')} + {d('o1x')}*{d('o1x')}) + SQRT({d('e2x')}*{d('e2x')} + {d('o2x')}*{d('o2x')}))"
    ay = f"(SQRT({d('e1y')}*{d('e1y')} + {d('o1y')}*{d('o1y')}) + SQRT({d('e2y')}*{d('e2y')} + {d('o2y')}*{d('o2y')}))"
    return (
        f"WITH {tiles_sql(side)}, g AS MATERIALIZED ({grad}) "
        "SELECT CAST(tile_x AS BIGINT) AS tile_x, CAST(tile_y AS BIGINT) AS tile_y, "
        "CAST(px AS BIGINT) AS px, CAST(py AS BIGINT) AS py, "
        f"CAST(FLOOR((({ex} + {ey}) / (({ax} + {ay}) + 1.0)) "
        f"* CAST({float(scale)!r} AS DOUBLE) + 0.5) AS BIGINT) AS pcq FROM g"
    )


def _edt_sql(side: int = 16, quant: float = 2.0, fg_thresh: int = 4,
             tx_max: int = 15, ty_max: int = 15) -> str:
    """SQL twin of raster.edt_proximity_stage: brute-force exact min over
    per-tile foreground pixels of the integer squared distance."""
    return (
        f"WITH {tiles_sql(side)}, "
        "rc AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) AS q "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        f"fg AS MATERIALIZED (SELECT * FROM rc WHERE q >= {fg_thresh}), "
        "d AS (SELECT p.tile_x, p.tile_y, p.px, p.py, "
        "  MIN((p.px - f.px)*(p.px - f.px) + (p.py - f.py)*(p.py - f.py)) AS d2 "
        "  FROM rc p JOIN fg f ON f.tile_x = p.tile_x AND f.tile_y = p.tile_y "
        "  GROUP BY p.tile_x, p.tile_y, p.px, p.py) "
        "SELECT CAST(p.tile_x AS BIGINT) AS tile_x, "
        "CAST(p.tile_y AS BIGINT) AS tile_y, CAST(p.px AS BIGINT) AS px, "
        "CAST(p.py AS BIGINT) AS py, "
        f"CAST(CASE WHEN p.q >= {fg_thresh} THEN 1 ELSE 0 END AS BIGINT) AS fg, "
        "CAST(COALESCE(d.d2, -1) AS BIGINT) AS d2 "
        "FROM rc p LEFT JOIN d ON d.tile_x = p.tile_x "
        "AND d.tile_y = p.tile_y AND d.px = p.px AND d.py = p.py"
    )


def _kmv_grouped_sql(group_col: str = "event_type", table: str = "events",
                     key_expr: str = "CAST(user_id AS VARCHAR)",
                     k: int = 32) -> str:
    """SQL twin of sketches.kmv_distinct_grouped: identical hash chain,
    per-group bottom-k via ROW_NUMBER over the u64 hash, and the
    (k-1)*2^64/kth estimate as the SAME f64 expression (every operand an
    exact cast; 2^64 inlined as a HUGEINT literal cast to DOUBLE)."""
    from . import sqlgen as _sg

    base = (f"SELECT DISTINCT {group_col}, {key_expr} AS kv FROM {table}")
    hx = _sg.chain(base, [("_fh", _sg.fnv1a64_expr("kv")),
                          *_sg.splitmix64_steps("_fh", "_h", "g")])
    return (
        f"WITH hx AS MATERIALIZED ({hx}), "
        f"d AS (SELECT DISTINCT {group_col}, _h FROM hx), "
        f"rk AS (SELECT {group_col}, _h, ROW_NUMBER() OVER "
        f"  (PARTITION BY {group_col} ORDER BY _h) AS rn FROM d), "
        f"a AS (SELECT {group_col}, COUNT(*) AS n_mins, MAX(_h) AS kth "
        f"  FROM rk WHERE rn <= {k} GROUP BY {group_col}) "
        f"SELECT {group_col}, CAST(n_mins AS BIGINT) AS n_mins, "
        f"{_sg.u64_to_i64('kth')} AS kth_hash, "
        f"CASE WHEN n_mins < {k} THEN CAST(n_mins AS DOUBLE) "
        f"ELSE CAST({k - 1} AS DOUBLE) * CAST(CAST(18446744073709551616 AS HUGEINT) AS DOUBLE) "
        f"/ CAST(kth AS DOUBLE) END AS est_distinct FROM a"
    )


def _kmv_overlap_sql(group_col: str = "event_type", table: str = "events",
                     key_expr: str = "CAST(user_id AS VARCHAR)",
                     k: int = 32) -> str:
    """SQL twin of sketches.kmv_overlap_pairs: bottom-k per group, the
    pair union's bottom-k via a second ROW_NUMBER, and the same exact-
    operand float expressions (division and product in identical order)."""
    from . import sqlgen as _sg

    base = f"SELECT DISTINCT {group_col}, {key_expr} AS kv FROM {table}"
    hx = _sg.chain(base, [("_fh", _sg.fnv1a64_expr("kv")),
                          *_sg.splitmix64_steps("_fh", "_h", "g")])
    two64 = "CAST(CAST(18446744073709551616 AS HUGEINT) AS DOUBLE)"
    return (
        f"WITH hx AS MATERIALIZED ({hx}), "
        f"d AS (SELECT DISTINCT {group_col}, _h FROM hx), "
        f"rk AS (SELECT {group_col}, _h, ROW_NUMBER() OVER "
        f"  (PARTITION BY {group_col} ORDER BY _h) AS rn FROM d), "
        f"tk AS MATERIALIZED (SELECT {group_col} AS g, _h FROM rk WHERE rn <= {k}), "
        "ty AS (SELECT DISTINCT g FROM tk), "
        "pr AS (SELECT t1.g AS a, t2.g AS b FROM ty t1 JOIN ty t2 ON t1.g < t2.g), "
        "u AS (SELECT p.a, p.b, s._h, "
        "  MAX(CASE WHEN s.g = p.a THEN 1 ELSE 0 END) AS in_a, "
        "  MAX(CASE WHEN s.g = p.b THEN 1 ELSE 0 END) AS in_b "
        "  FROM pr p JOIN tk s ON s.g = p.a OR s.g = p.b "
        "  GROUP BY p.a, p.b, s._h), "
        "ru AS (SELECT a, b, _h, in_a, in_b, ROW_NUMBER() OVER "
        "  (PARTITION BY a, b ORDER BY _h) AS rn FROM u), "
        f"m AS (SELECT a, b, COUNT(*) AS n_u, MAX(_h) AS kth, "
        f"  SUM(in_a * in_b) AS com FROM ru WHERE rn <= {k} GROUP BY a, b), "
        f"e AS (SELECT a, b, n_u, com, CASE WHEN n_u < {k} "
        f"  THEN CAST(n_u AS DOUBLE) ELSE CAST({k - 1} AS DOUBLE) * {two64} "
        "  / CAST(kth AS DOUBLE) END AS est_union FROM m) "
        "SELECT a AS type_a, b AS type_b, CAST(n_u AS BIGINT) AS n_mins, "
        "CAST(com AS BIGINT) AS n_common_mins, est_union, "
        "CAST(com AS DOUBLE) / CAST(n_u AS DOUBLE) * est_union AS est_inter "
        "FROM e"
    )


def _pmi_bigrams_sql(min_count: int = 5, k: int = 50) -> str:
    """SQL twin of textstages.pmi_bigrams: same space tokenizer as the
    tfidf family, positional bigrams via the generate_series list
    comprehension, exact integer counts, and the pmi float as the SAME
    associated expression ln(((cab*N1/N2)*(N1/ca))/cb) snapped to f32."""
    return (
        "WITH toks AS MATERIALIZED (SELECT "
        "  list_filter(string_split(text, ' '), x -> len(x) > 0) AS l "
        "  FROM documents), "
        "uni AS MATERIALIZED (SELECT unnest(l) AS tok FROM toks), "
        "ucnt AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY tok), "
        "n1 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM uni), "
        "bg AS MATERIALIZED (SELECT unnest(list_transform("
        "  generate_series(1, len(l) - 1), i -> l[i] || ' ' || l[i + 1])) AS b "
        "  FROM toks WHERE len(l) >= 2), "
        "n2 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM bg), "
        f"bcnt AS (SELECT b, COUNT(*) AS cab FROM bg GROUP BY b "
        f"  HAVING COUNT(*) >= {min_count}), "
        "f AS (SELECT split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2, "
        "  cab FROM bcnt), "
        "j AS (SELECT f.w1, f.w2, f.cab, ua.c AS ca, ub.c AS cb "
        "  FROM f JOIN ucnt ua ON ua.tok = f.w1 JOIN ucnt ub ON ub.tok = f.w2), "
        "s AS (SELECT w1, w2, CAST(cab AS BIGINT) AS pair_count, "
        "  CAST(ca AS BIGINT) AS c_w1, CAST(cb AS BIGINT) AS c_w2, "
        "  CAST(CAST(ln((CAST(cab AS DOUBLE) * n1.n / n2.n) * "
        "  (n1.n / CAST(ca AS DOUBLE)) / CAST(cb AS DOUBLE)) AS REAL) AS DOUBLE) "
        "  AS pmi FROM j, n1, n2) "
        "SELECT w1, w2, pair_count, c_w1, c_w2, pmi FROM s "
        f"QUALIFY ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2) <= {k}"
    )


def _scd2_sql(n_snaps: int = 2) -> str:
    """SQL twin of cdc.scd2_history over the v1/v2 snapshot fixtures:
    fnv1a64 content hashes, gaps-and-islands run grouping (equivalent to
    the engine's sorted-scan run detection: same-hash runs broken on
    non-consecutive snaps)."""
    from . import sqlgen as _sg
    from ..sources.snapshots import snapshot_sql

    def h(src: str, snap: int) -> str:
        inner = _sg.chain(f"SELECT doc_id, text FROM {src}",
                          [("_hu", _sg.fnv1a64_expr("text"))])
        return (f"SELECT CAST(doc_id AS BIGINT) AS doc_id, {snap} AS snap, "
                f"{_sg.u64_to_i64('_hu')} AS h FROM ({inner})")

    return (
        f"WITH {snapshot_sql(1)}, {snapshot_sql(2)}, "
        f"s AS ({h('v1', 1)} UNION ALL {h('v2', 2)}), "
        "r AS (SELECT doc_id, h, snap, snap - ROW_NUMBER() OVER "
        "  (PARTITION BY doc_id, h ORDER BY snap) AS isl FROM s) "
        "SELECT doc_id, h AS content_hash, "
        "CAST(MIN(snap) AS BIGINT) AS valid_from, "
        "CAST(MAX(snap) AS BIGINT) AS valid_to, "
        f"CAST(CASE WHEN MAX(snap) = {n_snaps} THEN 1 ELSE 0 END AS BIGINT) "
        "AS is_current FROM r GROUP BY doc_id, h, isl"
    )


def _crawl_frontier_sql() -> str:
    """SQL twin of textstages.crawl_frontier: same fnv/splitmix priority
    draw (signed-BIGINT view for bit-identical ordering), per-host
    ROW_NUMBER, and the integer politeness arithmetic."""
    inner = _sg.chain(
        f"WITH {pages_sql()} SELECT url FROM pages",
        [("_f", _sg.fnv1a64_expr("url")), *_sg.splitmix64_steps("_f", "_h", "cf")])
    draw = _sg.u64_to_i64("_h")
    hostd = _sg.chain(
        "SELECT url, draw, CAST(host AS HUGEINT) AS hu, host FROM base",
        [*_sg.splitmix64_steps("hu", "_hh", "cfd")])
    return (
        f"WITH base AS MATERIALIZED (SELECT url, "
        "CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) AS host, "
        f"{draw} AS draw FROM ({inner})), "
        f"wd AS (SELECT url, host, draw, "
        f"  CAST(500 + (_hh % 1000) AS BIGINT) AS delay_ms FROM ({hostd})) "
        "SELECT url, host, draw, delay_ms, rn, "
        "CAST((rn - 1) * delay_ms AS BIGINT) AS sched_ms FROM ("
        "  SELECT url, host, draw, delay_ms, row_number() OVER ("
        "    PARTITION BY host ORDER BY draw, url) AS rn FROM wd)"
    )


def _skyline_orders_sql() -> str:
    """SQL twin of agg.skyline_2d over orders (maximize o_totalprice,
    minimize o_orderdate): per-price-group min date, running min over
    strictly better prices via a 1-PRECEDING window, same tie rules."""
    return (
        "WITH g AS (SELECT o_totalprice AS p, MIN(o_orderdate) AS d "
        "  FROM orders GROUP BY o_totalprice), "
        "r AS (SELECT p, d, MIN(d) OVER (ORDER BY p DESC "
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1 FROM g) "
        "SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate "
        "FROM orders o JOIN r ON o.o_totalprice = r.p "
        "WHERE o.o_orderdate = r.d AND (r.m1 IS NULL OR o.o_orderdate < r.m1)"
    )


def _ab_test_sql() -> str:
    """SQL twin of agg.ab_test_stats: splitmix64(user_id)%2 assignment,
    exact integer cents, HUGEINT sums, and the identical Welch-z float
    expression over exact casts."""
    from . import sqlgen as _sg

    inner = _sg.chain(
        "SELECT user_id, value FROM events",
        [*_sg.splitmix64_steps("CAST(user_id AS HUGEINT)", "_h", "ab")])
    cents = "CAST(FLOOR(ABS(value*100.0) + 0.5)*SIGN(value) AS BIGINT)"
    return (
        f"WITH v AS (SELECT CAST(_h % 2 AS BIGINT) AS variant, {cents} AS c "
        f"FROM ({inner})), "
        "s AS (SELECT variant, COUNT(*) AS n, SUM(CAST(c AS HUGEINT)) AS s1, "
        "  SUM(CAST(c AS HUGEINT) * c) AS s2 FROM v GROUP BY variant), "
        "e AS (SELECT "
        "  (SELECT n FROM s WHERE variant = 0) AS na, "
        "  (SELECT n FROM s WHERE variant = 1) AS nb, "
        "  (SELECT s1 FROM s WHERE variant = 0) AS s1a, "
        "  (SELECT s1 FROM s WHERE variant = 1) AS s1b, "
        "  (SELECT s2 FROM s WHERE variant = 0) AS s2a, "
        "  (SELECT s2 FROM s WHERE variant = 1) AS s2b), "
        "f AS (SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, "
        "  CAST(s1a AS DOUBLE) / CAST(na AS DOUBLE) AS mean_cents_a, "
        "  CAST(s1b AS DOUBLE) / CAST(nb AS DOUBLE) AS mean_cents_b, "
        "  (CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE) "
        "    / CAST(na AS DOUBLE)) / CAST(na - 1 AS DOUBLE) AS va, "
        "  (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE) "
        "    / CAST(nb AS DOUBLE)) / CAST(nb - 1 AS DOUBLE) AS vb, "
        "  CAST(na AS DOUBLE) AS fa, CAST(nb AS DOUBLE) AS fb FROM e) "
        "SELECT n_a, n_b, mean_cents_a, mean_cents_b, "
        "(mean_cents_a - mean_cents_b) / SQRT(va / fa + vb / fb) AS welch_z "
        "FROM f"
    )


def _fuzzy_names_sql() -> str:
    """SQL twin of dedup.fuzzy_name_pairs: the same complete deletion-
    neighborhood blocking (list-comprehension single deletions + the
    name itself), then DuckDB's exact levenshtein() as the d ≤ 1 verify —
    equivalent integer predicate to the engine's one-edit test."""
    return (
        "WITH c AS (SELECT c_custkey AS id, c_name AS nm FROM customer), "
        "v AS (SELECT id, nm, unnest(list_append(list_transform("
        "  generate_series(1, len(nm)), "
        "  i -> substr(nm, 1, i - 1) || substr(nm, i + 1)), nm)) AS variant "
        "  FROM c), "
        "vd AS (SELECT DISTINCT id, nm, variant FROM v), "
        "p AS (SELECT DISTINCT a.id AS c_custkey_a, b.id AS c_custkey_b, "
        "  a.nm AS c_name_a, b.nm AS c_name_b "
        "  FROM vd a JOIN vd b ON a.variant = b.variant AND a.id < b.id) "
        "SELECT c_custkey_a, c_custkey_b, c_name_a, c_name_b, "
        "CAST(levenshtein(c_name_a, c_name_b) AS BIGINT) AS dist "
        "FROM p WHERE levenshtein(c_name_a, c_name_b) <= 1"
    )


def _idw_grid_sql(cs: float = 1.0) -> str:
    """SQL twin of cellindex.idw_grid: geocode chain, 3×3 ring
    replication via two range() cross joins, identical f64 distance
    expression, integer weights, HUGEINT sums, one final division."""
    from . import sqlgen as _sg

    inner = _sg.chain(f"WITH {pages_sql()} SELECT url, text FROM pages",
                      _sg.geocode_steps("url"))
    csd = f"CAST({cs!r} AS DOUBLE)"
    return (
        f"WITH pts AS MATERIALIZED (SELECT lon, lat, "
        f"CAST(len(text) AS BIGINT) AS v, "
        f"CAST(FLOOR(lon / {csd}) AS BIGINT) AS cx, "
        f"CAST(FLOOR(lat / {csd}) AS BIGINT) AS cy FROM ({inner})), "
        "rep AS (SELECT cx + dxr.range AS gx, cy + dyr.range AS gy, "
        "  lon, lat, v FROM pts, range(-1, 2) dxr, range(-1, 2) dyr), "
        "d AS (SELECT gx, gy, v, "
        f"  (lon - (CAST(gx AS DOUBLE) + CAST(0.5 AS DOUBLE)) * {csd}) AS ddx, "
        f"  (lat - (CAST(gy AS DOUBLE) + CAST(0.5 AS DOUBLE)) * {csd}) AS ddy "
        "  FROM rep), "
        "w AS (SELECT gx, gy, v, CAST(FLOOR(CAST(1000000 AS DOUBLE) / "
        "  (CAST(1.0 AS DOUBLE) + (ddx * ddx + ddy * ddy) * CAST(16.0 AS DOUBLE)) "
        "  + CAST(0.5 AS DOUBLE)) AS BIGINT) AS wq FROM d "
        f"  WHERE ddx * ddx + ddy * ddy <= {csd} * {csd}) "
        "SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS n_pts, "
        "CAST(SUM(CAST(wq AS HUGEINT) * v) AS DOUBLE) "
        "/ CAST(SUM(CAST(wq AS HUGEINT)) AS DOUBLE) AS idw "
        "FROM w GROUP BY gx, gy"
    )


def _skeletonize_sql(side: int = 16, quant: float = 2.0, fg_thresh: int = 4,
                     rounds: int = 8, tx_max: int = 15,
                     ty_max: int = 15) -> str:
    """SQL twin of raster.skeletonize_stage: the 2·rounds Zhang-Suen
    subpasses unrolled as MATERIALIZED CTEs (CLAUDE.md: self-referencing
    round chains must materialize), neighbors via 8 equi LEFT JOINs with
    COALESCE 0 at borders, identical compass order and subpass rules."""
    nbr = {"p2": (0, -1), "p3": (1, -1), "p4": (1, 0), "p5": (1, 1),
           "p6": (0, 1), "p7": (-1, 1), "p8": (-1, 0), "p9": (-1, -1)}
    pairs = [("p2", "p3"), ("p3", "p4"), ("p4", "p5"), ("p5", "p6"),
             ("p6", "p7"), ("p7", "p8"), ("p8", "p9"), ("p9", "p2")]
    ctes = [
        f"s0 AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        f"CASE WHEN q >= {fg_thresh} THEN 1 ELSE 0 END AS b FROM rc)"]
    for k in range(1, 2 * rounds + 1):
        prev = f"s{k - 1}"
        joins = []
        sel = []
        for name, (dx, dy) in nbr.items():
            t = "n" + name[1:]
            joins.append(
                f"LEFT JOIN {prev} {t} ON {t}.tile_x = c.tile_x "
                f"AND {t}.tile_y = c.tile_y AND {t}.px = c.px + ({dx}) "
                f"AND {t}.py = c.py + ({dy})")
            sel.append(f"COALESCE({t}.b, 0) AS {name}")
        a_expr = " + ".join(
            f"(CASE WHEN {a} = 0 AND {b} = 1 THEN 1 ELSE 0 END)"
            for a, b in pairs)
        bsum = " + ".join(nbr)
        if (k - 1) % 2 == 0:
            c1, c2 = "p2 * p4 * p6", "p4 * p6 * p8"
        else:
            c1, c2 = "p2 * p4 * p8", "p2 * p6 * p8"
        inner = (f"SELECT c.tile_x, c.tile_y, c.px, c.py, c.b, "
                 + ", ".join(sel) + f" FROM {prev} c " + " ".join(joins))
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
            f"CASE WHEN b = 1 AND ({bsum}) BETWEEN 2 AND 6 "
            f"AND ({a_expr}) = 1 AND ({c1}) = 0 AND ({c2}) = 0 "
            f"THEN 0 ELSE b END AS b FROM ({inner}))")
    last = f"s{2 * rounds}"
    return (
        f"WITH {tiles_sql(side)}, "
        "rc AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) AS q "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        + ", ".join(ctes) + " "
        "SELECT CAST(f.tile_x AS BIGINT) AS tile_x, "
        "CAST(f.tile_y AS BIGINT) AS tile_y, CAST(f.px AS BIGINT) AS px, "
        "CAST(f.py AS BIGINT) AS py, CAST(f.b AS BIGINT) AS fg, "
        f"CAST(l.b AS BIGINT) AS skel FROM s0 f JOIN {last} l "
        "ON l.tile_x = f.tile_x AND l.tile_y = f.tile_y "
        "AND l.px = f.px AND l.py = f.py"
    )


def _debounce_sql(window_s: int = 300) -> str:
    """SQL twin of streaming.debounce_events: keep-first per tumbling
    key window via ROW_NUMBER over (event time, event_id)."""
    win_us = window_s * 1_000_000
    return (
        "WITH e AS (SELECT user_id, event_type, event_id, ts, "
        "CAST(epoch_us(ts) AS BIGINT) AS ts_us, "
        f"CAST(epoch_us(ts) // {win_us} AS BIGINT) AS win FROM events) "
        "SELECT user_id, event_type, win, event_id, ts, ts_us, "
        "CAST(rn AS BIGINT) AS rn FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY user_id, event_type, win "
        "  ORDER BY ts_us, event_id) AS rn FROM e) WHERE rn <= 1"
    )


def _viewshed_sql(side: int = 16, quant: float = 2.0, obs_h: int = 2,
                  tx_max: int = 15, ty_max: int = 15) -> str:
    """SQL twin of raster.viewshed_stage: identical integer sightline
    sampling and cross-multiplied slope test; n ≤ 1 pixels default
    visible via the LEFT JOIN COALESCE."""
    c = side // 2
    return (
        f"WITH {tiles_sql(side)}, "
        "rc AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) AS q "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        f"o AS (SELECT tile_x, tile_y, q + {obs_h} AS eo2 FROM rc "
        f"  WHERE px = {c} AND py = {c}), "
        "p AS MATERIALIZED (SELECT rc.tile_x, rc.tile_y, rc.px, rc.py, rc.q, "
        f"  o.eo2, GREATEST(ABS(rc.px - {c}), ABS(rc.py - {c})) AS n "
        "  FROM rc JOIN o ON o.tile_x = rc.tile_x AND o.tile_y = rc.tile_y), "
        f"kx AS (SELECT p.*, kr.range AS kk FROM p, range(1, {side // 2}) kr "
        "  WHERE kr.range < p.n), "
        "s AS (SELECT tile_x, tile_y, px, py, q, eo2, n, kk, "
        f"  (2*{c}*n + 2*(px - {c})*kk + n) // (2*n) AS sx, "
        f"  (2*{c}*n + 2*(py - {c})*kk + n) // (2*n) AS sy FROM kx), "
        "e AS (SELECT s.*, r2.q AS ek FROM s JOIN rc r2 "
        "  ON r2.tile_x = s.tile_x AND r2.tile_y = s.tile_y "
        "  AND r2.px = s.sx AND r2.py = s.sy), "
        "v AS (SELECT tile_x, tile_y, px, py, "
        "  MIN(CASE WHEN (ek - eo2) * n <= (q - eo2) * kk THEN 1 ELSE 0 END) "
        "  AS vis FROM e GROUP BY tile_x, tile_y, px, py) "
        "SELECT CAST(p.tile_x AS BIGINT) AS tile_x, "
        "CAST(p.tile_y AS BIGINT) AS tile_y, CAST(p.px AS BIGINT) AS px, "
        "CAST(p.py AS BIGINT) AS py, CAST(p.n AS BIGINT) AS n_steps, "
        "CAST(p.q AS BIGINT) AS q, CAST(COALESCE(v.vis, 1) AS BIGINT) AS vis "
        "FROM p LEFT JOIN v ON v.tile_x = p.tile_x AND v.tile_y = p.tile_y "
        "AND v.px = p.px AND v.py = p.py"
    )


def _label_prop_sql(rounds: int = 4, out_links: int = 4,
                    host_mod: int = 1000) -> str:
    """SQL twin of graph.label_prop_hosts: triangle twin's ue fragment,
    directed both ways, ``rounds`` unrolled MATERIALIZED mode rounds
    (count DESC, label ASC argmax via QUALIFY), isolated nodes coalesce
    to their own label."""
    lk_base = (
        "SELECT CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) AS src, "
        "url || '#out' || CAST(kr.range AS VARCHAR) AS tok "
        f"FROM pages, range(0, {out_links}) kr"
    )
    lk_inner = _sg.chain(
        lk_base,
        [("_f", _sg.fnv1a64_expr("tok")), *_sg.splitmix64_steps("_f", "_h", "lp")])
    ctes = [
        f"lk AS MATERIALIZED (SELECT src, CAST(_h % {host_mod} AS BIGINT) AS dst "
        f"FROM ({lk_inner}))",
        "ue AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS u, "
        "GREATEST(src, dst) AS v FROM lk WHERE src <> dst)",
        "nd AS MATERIALIZED (SELECT DISTINCT node FROM ("
        "  SELECT src AS node FROM lk UNION ALL SELECT dst AS node FROM lk))",
        "dirs AS MATERIALIZED (SELECT u AS nbr, v AS node FROM ue "
        "  UNION ALL SELECT v AS nbr, u AS node FROM ue)",
        "l0 AS MATERIALIZED (SELECT node, node AS lab FROM nd)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"l{k} AS MATERIALIZED (SELECT node, lab FROM ("
            f"  SELECT d.node, l.lab, COUNT(*) AS c FROM dirs d "
            f"  JOIN l{k - 1} l ON l.node = d.nbr GROUP BY d.node, l.lab) "
            "  QUALIFY row_number() OVER (PARTITION BY node "
            "  ORDER BY c DESC, lab) = 1)")
    return (
        f"WITH {pages_sql()}, " + ", ".join(ctes) + " "
        "SELECT nd.node AS host, "
        f"CAST(COALESCE(l{rounds}.lab, nd.node) AS BIGINT) AS label "
        f"FROM nd LEFT JOIN l{rounds} ON l{rounds}.node = nd.node"
    )


def _coloring_sql(rounds: int = 22, out_links: int = 4,
                  host_mod: int = 1000, max_colors: int = 64) -> str:
    """SQL twin of graph.speculative_coloring_hosts: the label_prop host
    graph fragment + splitmix64 HUGEINT priorities, then ``rounds``
    unrolled speculative rounds — mex via a NOT EXISTS range anti-join
    over the colored-neighbor color set, commit blocked by any same-
    tentative higher-priority uncolored neighbor. Measured convergence:
    6 / 6 / 17 rounds at sf0.001/0.01/0.1 (rounds=22 gives margin; an
    unconverged -1 would value-hash-mismatch loudly)."""
    lk_base = (
        "SELECT CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) AS src, "
        "url || '#out' || CAST(kr.range AS VARCHAR) AS tok "
        f"FROM pages, range(0, {out_links}) kr"
    )
    lk_inner = _sg.chain(
        lk_base,
        [("_f", _sg.fnv1a64_expr("tok")), *_sg.splitmix64_steps("_f", "_h", "lp")])
    pr_inner = _sg.chain("SELECT node FROM nd",
                         _sg.splitmix64_steps("node", "p", "cp"))
    ctes = [
        f"lk AS MATERIALIZED (SELECT src, CAST(_h % {host_mod} AS BIGINT) AS dst "
        f"FROM ({lk_inner}))",
        "ue AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS u, "
        "GREATEST(src, dst) AS v FROM lk WHERE src <> dst)",
        "nd AS MATERIALIZED (SELECT DISTINCT node FROM ("
        "  SELECT src AS node FROM lk UNION ALL SELECT dst AS node FROM lk))",
        "dirs AS MATERIALIZED (SELECT u AS nbr, v AS node FROM ue "
        "  UNION ALL SELECT v AS nbr, u AS node FROM ue)",
        f"pr AS MATERIALIZED (SELECT node, p FROM ({pr_inner}))",
        "c0 AS MATERIALIZED (SELECT node, -1 AS color FROM nd)",
    ]
    for k in range(1, rounds + 1):
        p = f"c{k - 1}"
        ctes += [
            f"uc{k} AS MATERIALIZED (SELECT DISTINCT d.node, c.color "
            f"  FROM dirs d JOIN {p} c ON c.node = d.nbr WHERE c.color >= 0)",
            f"mex{k} AS MATERIALIZED (SELECT s.node, MIN(t.range) AS tent "
            f"  FROM (SELECT node FROM {p} WHERE color < 0) s "
            f"  CROSS JOIN range(0, {max_colors}) t "
            f"  WHERE NOT EXISTS (SELECT 1 FROM uc{k} u "
            "    WHERE u.node = s.node AND u.color = t.range) "
            "  GROUP BY s.node)",
            f"bl{k} AS MATERIALIZED (SELECT DISTINCT d.node FROM dirs d "
            f"  JOIN mex{k} a ON a.node = d.node "
            f"  JOIN mex{k} b ON b.node = d.nbr AND b.tent = a.tent "
            "  JOIN pr pa ON pa.node = d.node JOIN pr pb ON pb.node = d.nbr "
            "  WHERE pb.p > pa.p)",
            f"c{k} AS MATERIALIZED (SELECT c.node, "
            "  CASE WHEN c.color >= 0 THEN c.color "
            "  WHEN m.node IS NOT NULL AND b.node IS NULL THEN m.tent "
            f"  ELSE -1 END AS color FROM {p} c "
            f"  LEFT JOIN mex{k} m ON m.node = c.node "
            f"  LEFT JOIN bl{k} b ON b.node = c.node)",
        ]
    return (
        f"WITH {pages_sql()}, " + ", ".join(ctes) + " "
        f"SELECT node AS host, CAST(color AS BIGINT) AS color FROM c{rounds}"
    )


def _exact_median_sql(table: str = "lineitem",
                      col: str = "l_extendedprice") -> str:
    """SQL twin of agg.exact_median: order statistics selected explicitly
    by row_number (NOT quantile_cont — its a+(b−a)·f interpolation can
    differ by an ulp from (a+b)/2), identical final float expression."""
    return (
        f"WITH s AS (SELECT {col} AS v, "
        f"row_number() OVER (ORDER BY {col}) AS rn, "
        f"COUNT(*) OVER () AS n FROM {table}), "
        "e AS (SELECT MAX(n) AS n, "
        "  MAX(CASE WHEN rn = (n + 1) // 2 THEN v END) AS v_lo, "
        "  MAX(CASE WHEN rn = (n + 2) // 2 THEN v END) AS v_hi FROM s) "
        "SELECT CAST(n AS BIGINT) AS n, v_lo, v_hi, "
        "(v_lo + v_hi) / CAST(2.0 AS DOUBLE) AS median FROM e"
    )


def _mst_sql(rounds: int = 12, jumps: int = 24, out_links: int = 4,
             host_mod: int = 1000) -> str:
    """SQL twin of graph.mst_hosts: Borůvka rounds unrolled, each with a
    Shiloach-Vishkin-style inner closure (min over self, neighbors'
    labels, label-of-label — ``jumps`` rounds, far above the measured
    convergence on the ≤ 2·host_mod-node fixture graph); the chosen-edge
    total order (w, u, v) matches the engine's grouped_topk tiebreak."""
    lk_base = (
        "SELECT CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) AS src, "
        "url || '#out' || CAST(kr.range AS VARCHAR) AS tok "
        f"FROM pages, range(0, {out_links}) kr"
    )
    lk_inner = _sg.chain(
        lk_base,
        [("_f", _sg.fnv1a64_expr("tok")), *_sg.splitmix64_steps("_f", "_h", "ms")])
    ctes = [
        f"lk AS MATERIALIZED (SELECT src, CAST(_h % {host_mod} AS BIGINT) AS dst "
        f"FROM ({lk_inner}))",
        "uew AS MATERIALIZED (SELECT LEAST(src, dst) AS u, "
        "GREATEST(src, dst) AS v, CAST(COUNT(*) AS BIGINT) AS w FROM lk "
        "WHERE src <> dst GROUP BY 1, 2)",
        "nd AS MATERIALIZED (SELECT DISTINCT node FROM ("
        "  SELECT u AS node FROM uew UNION ALL SELECT v AS node FROM uew))",
        "comp0 AS MATERIALIZED (SELECT node, node AS c FROM nd)",
    ]
    chosen = []
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"er{r} AS MATERIALIZED (SELECT e.u, e.v, e.w, cu.c AS cu, "
            f"cv.c AS cv FROM uew e JOIN comp{p} cu ON cu.node = e.u "
            f"JOIN comp{p} cv ON cv.node = e.v WHERE cu.c <> cv.c)")
        ctes.append(
            f"ch{r} AS MATERIALIZED (SELECT DISTINCT u, v, w, cu, cv FROM ("
            f"  SELECT c, u, v, w, cu, cv FROM ("
            f"    SELECT cu AS c, u, v, w, cu, cv FROM er{r} "
            f"    UNION ALL SELECT cv AS c, u, v, w, cu, cv FROM er{r}) "
            "  QUALIFY row_number() OVER (PARTITION BY c "
            "  ORDER BY w, u, v) = 1))")
        chosen.append(f"SELECT u, v, w FROM ch{r}")
        ctes.append(
            f"gd{r} AS MATERIALIZED (SELECT cu AS x, cv AS y FROM ch{r} "
            f"UNION ALL SELECT cv AS x, cu AS y FROM ch{r})")
        ctes.append(
            f"j{r}_0 AS MATERIALIZED (SELECT DISTINCT c AS x, c AS p "
            f"FROM comp{p})")
        for t in range(1, jumps + 1):
            q = t - 1
            ctes.append(
                f"j{r}_{t} AS MATERIALIZED (SELECT a.x, "
                f"LEAST(a.p, COALESCE(nb.mn, a.p), pp.p) AS p "
                f"FROM j{r}_{q} a "
                f"LEFT JOIN (SELECT g.x, MIN(l.p) AS mn FROM gd{r} g "
                f"  JOIN j{r}_{q} l ON l.x = g.y GROUP BY g.x) nb "
                f"  ON nb.x = a.x "
                f"JOIN j{r}_{q} pp ON pp.x = a.p)")
        ctes.append(
            f"comp{r} AS MATERIALIZED (SELECT c0.node, j.p AS c "
            f"FROM comp{p} c0 JOIN j{r}_{jumps} j ON j.x = c0.c)")
    return (
        f"WITH {pages_sql()}, " + ", ".join(ctes) + " "
        "SELECT u, v, w FROM (" + " UNION ALL ".join(chosen) + ")"
    )


def _pca_power_sql(dim: int = 64, scale_bits: int = 20, iters: int = 8) -> str:
    """SQL twin of knn.pca_power_top1: HUGEINT Gram via an unnest self-
    join, unrolled fixed-point power rounds, truncating division on
    non-negative operands (Python // parity), exact integer Rayleigh."""
    s = 1 << scale_bits
    ctes = [
        "ex AS MATERIALIZED (SELECT vec_id, CAST(gs.range AS BIGINT) AS i, "
        "CAST(FLOOR(CAST(embedding[CAST(gs.range AS INT)] AS DOUBLE) * "
        f"CAST({s} AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS HUGEINT) AS q "
        f"FROM embeddings, range(1, {dim + 1}) gs)",
        "gram AS MATERIALIZED (SELECT a.i AS i, b.i AS j, SUM(a.q * b.q) AS g "
        "FROM ex a JOIN ex b ON a.vec_id = b.vec_id GROUP BY a.i, b.i)",
        f"v0 AS MATERIALIZED (SELECT CAST(gs.range AS BIGINT) AS i, "
        f"CAST({s} AS HUGEINT) AS q FROM range(1, {dim + 1}) gs)",
    ]
    for t in range(1, iters + 1):
        p = t - 1
        ctes.append(
            f"w{t} AS MATERIALIZED (SELECT g.i, SUM(g.g * v.q) AS w "
            f"FROM gram g JOIN v{p} v ON v.i = g.j GROUP BY g.i)")
        ctes.append(f"m{t} AS (SELECT MAX(ABS(w)) AS mx FROM w{t})")
        ctes.append(
            f"v{t} AS MATERIALIZED (SELECT w.i, "
            f"CASE WHEN m.mx = 0 THEN p.q "
            f"WHEN w.w >= 0 THEN (w.w * {s}) // m.mx "
            f"ELSE -(((-w.w) * {s}) // m.mx) END AS q "
            f"FROM w{t} w JOIN v{p} p ON p.i = w.i, m{t} m)")
    last = f"v{iters}"
    return (
        "WITH " + ", ".join(ctes) + ", "
        f"num AS (SELECT SUM(vi.q * g.g * vj.q) AS n FROM gram g "
        f"JOIN {last} vi ON vi.i = g.i JOIN {last} vj ON vj.i = g.j), "
        f"den AS (SELECT SUM(q * q) AS d FROM {last}) "
        f"SELECT v.i, CAST(v.q AS BIGINT) AS v_q, "
        f"CAST(num.n // den.d AS BIGINT) AS lam_q FROM {last} v, num, den"
    )


def _tile_pyramid_sql(side: int = 16, levels: int = 3, tx_max: int = 15,
                      ty_max: int = 15) -> str:
    """SQL twin of raster.tile_pyramid_stage: per-level GROUP BY of the
    integer block index, SUM/4^L with a power-of-two divisor (exact)."""
    parts = []
    for lev in range(1, levels + 1):
        s = 1 << lev
        parts.append(
            f"SELECT CAST(tile_x AS BIGINT) AS tile_x, "
            f"CAST(tile_y AS BIGINT) AS tile_y, CAST({lev} AS BIGINT) AS level, "
            f"CAST(px // {s} AS BIGINT) AS px, CAST(py // {s} AS BIGINT) AS py, "
            f"SUM(vd) / CAST({s * s} AS DOUBLE) AS mean_v "
            f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max} "
            f"GROUP BY tile_x, tile_y, px // {s}, py // {s}")
    return f"WITH {tiles_sql(side)} " + " UNION ALL ".join(parts)


def _pivot_events_sql(cats=("click", "error", "purchase", "signup",
                            "view")) -> str:
    """SQL twin of agg.pivot_counts over events: CASE-sum pivot with the
    same sorted column set and typed-0 missing cells."""
    cols = ", ".join(
        f"CAST(SUM(CASE WHEN event_type = '{c}' THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS n_{c}" for c in cats)
    return (f"SELECT user_id, {cols}, CAST(COUNT(*) AS BIGINT) AS n_total "
            "FROM events GROUP BY user_id")


def _hits_sql(rounds: int = 8, scale_bits: int = 20, out_links: int = 4,
              host_mod: int = 1000) -> str:
    """SQL twin of graph.hits_hosts: unrolled Q20 integer half-rounds in
    HUGEINT, max-normalized with // on non-negative operands."""
    s = 1 << scale_bits
    lk_base = (
        "SELECT CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) AS src, "
        "url || '#out' || CAST(kr.range AS VARCHAR) AS tok "
        f"FROM pages, range(0, {out_links}) kr"
    )
    lk_inner = _sg.chain(
        lk_base,
        [("_f", _sg.fnv1a64_expr("tok")), *_sg.splitmix64_steps("_f", "_h", "ht")])
    ctes = [
        f"lk AS MATERIALIZED (SELECT src, CAST(_h % {host_mod} AS BIGINT) AS dst "
        f"FROM ({lk_inner}))",
        "e AS MATERIALIZED (SELECT src, dst, CAST(COUNT(*) AS HUGEINT) AS w "
        "FROM lk GROUP BY src, dst)",
        "nd AS MATERIALIZED (SELECT DISTINCT node FROM ("
        "  SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e))",
        f"h0 AS MATERIALIZED (SELECT node, CAST({s} AS HUGEINT) AS q FROM nd)",
    ]
    for t in range(1, rounds + 1):
        p = t - 1
        ctes.append(
            f"ar{t} AS MATERIALIZED (SELECT e.dst AS node, SUM(e.w * h.q) AS raw "
            f"FROM e JOIN h{p} h ON h.node = e.src GROUP BY e.dst)")
        ctes.append(f"am{t} AS (SELECT MAX(raw) AS mx FROM ar{t})")
        ctes.append(
            f"a{t} AS MATERIALIZED (SELECT node, (raw * {s}) // m.mx AS q "
            f"FROM ar{t}, am{t} m)")
        ctes.append(
            f"hr{t} AS MATERIALIZED (SELECT e.src AS node, SUM(e.w * a.q) AS raw "
            f"FROM e JOIN a{t} a ON a.node = e.dst GROUP BY e.src)")
        ctes.append(f"hm{t} AS (SELECT MAX(raw) AS mx FROM hr{t})")
        ctes.append(
            f"h{t} AS MATERIALIZED (SELECT node, (raw * {s}) // m.mx AS q "
            f"FROM hr{t}, hm{t} m)")
    return (
        f"WITH {pages_sql()}, " + ", ".join(ctes) + " "
        "SELECT nd.node AS host, "
        f"CAST(COALESCE(a{rounds}.q, 0) AS BIGINT) AS auth_q, "
        f"CAST(COALESCE(h{rounds}.q, 0) AS BIGINT) AS hub_q "
        f"FROM nd LEFT JOIN a{rounds} ON a{rounds}.node = nd.node "
        f"LEFT JOIN h{rounds} ON h{rounds}.node = nd.node"
    )


def _contour_cells_sql(side: int = 16, quant: float = 2.0, level: int = 4,
                       tx_max: int = 15, ty_max: int = 15) -> str:
    """SQL twin of raster.contour_cells_stage: four equi self-joins give
    the 2×2 corner bits; same case index and saddle rule."""
    return (
        f"WITH {tiles_sql(side)}, "
        "rc AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        f"CASE WHEN CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) "
        f">= {level} THEN 1 ELSE 0 END AS b "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        "c AS (SELECT tl.tile_x, tl.tile_y, tl.px AS cx, tl.py AS cy, "
        "  tl.b * 8 + tr.b * 4 + br.b * 2 + bl.b AS mcase "
        "  FROM rc tl "
        "  JOIN rc tr ON tr.tile_x = tl.tile_x AND tr.tile_y = tl.tile_y "
        "    AND tr.py = tl.py AND tr.px = tl.px + 1 "
        "  JOIN rc br ON br.tile_x = tl.tile_x AND br.tile_y = tl.tile_y "
        "    AND br.py = tl.py + 1 AND br.px = tl.px + 1 "
        "  JOIN rc bl ON bl.tile_x = tl.tile_x AND bl.tile_y = tl.tile_y "
        "    AND bl.py = tl.py + 1 AND bl.px = tl.px) "
        "SELECT CAST(tile_x AS BIGINT) AS tile_x, "
        "CAST(tile_y AS BIGINT) AS tile_y, CAST(cx AS BIGINT) AS cx, "
        "CAST(cy AS BIGINT) AS cy, CAST(mcase AS BIGINT) AS mcase, "
        "CAST(CASE WHEN mcase IN (5, 10) THEN 2 ELSE 1 END AS BIGINT) "
        "AS n_segs FROM c WHERE mcase NOT IN (0, 15)"
    )


def _scene_cuts_sql(threshold: int = 100, frame: int = 32,
                    maxp: int = 256) -> str:
    """SQL twin of multimodal.SceneCutDetector over the GLRM fixture:
    payload bytes are the first 256 utf8 bytes of the doc text (ASCII in
    the fixture, so ord == byte); frame signatures via list sums."""
    return (
        f"WITH s AS (SELECT doc_id AS media_id, substr(text, 1, {maxp}) AS p "
        "FROM documents), "
        f"nf AS (SELECT media_id, p, length(p) // {frame} AS n FROM s), "
        "fr AS (SELECT media_id, n, CAST(gs.range AS BIGINT) AS f, "
        "  list_aggregate(list_transform("
        f"    generate_series(1, {frame}), "
        f"    i -> ord(substr(p, CAST(gs.range * {frame} AS INT) + i, 1))), "
        "  'sum') AS sig "
        "  FROM nf, range(0, 8) gs WHERE gs.range < n), "
        "d AS (SELECT a.media_id, a.f AS cut_after, ABS(b.sig - a.sig) AS delta "
        "  FROM fr a JOIN fr b ON b.media_id = a.media_id AND b.f = a.f + 1) "
        f"SELECT media_id, cut_after, CAST(delta AS BIGINT) AS delta "
        f"FROM d WHERE delta > {threshold}"
    )


def _sq8_sql(dim: int = 64) -> str:
    """SQL twin of knn.sq8_encode: per-dim MIN/MAX over exact f32 casts,
    the identical code/reconstruction float chains, integer aggregates."""
    return (
        "WITH ex AS MATERIALIZED (SELECT vec_id, CAST(gs.range AS BIGINT) AS i, "
        "CAST(embedding[CAST(gs.range AS INT)] AS DOUBLE) AS x "
        f"FROM embeddings, range(1, {dim + 1}) gs), "
        "st AS MATERIALIZED (SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM ex "
        "GROUP BY i), "
        "c AS (SELECT ex.vec_id, ex.i, ex.x, st.mn, st.mx, "
        "  LEAST(GREATEST(FLOOR((ex.x - st.mn) / (st.mx - st.mn) "
        "  * CAST(255.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)), "
        "  CAST(0.0 AS DOUBLE)), CAST(255.0 AS DOUBLE)) AS cd "
        "  FROM ex JOIN st ON st.i = ex.i), "
        "e AS (SELECT vec_id, CAST(cd AS BIGINT) AS cdi, i, "
        "  CAST(FLOOR(ABS(x - (mn + cd / CAST(255.0 AS DOUBLE) * (mx - mn))) "
        "  * CAST(1048576.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS eq "
        "  FROM c) "
        "SELECT vec_id, CAST(SUM(cdi * i) AS BIGINT) AS code_sum, "
        "CAST(MIN(cdi) AS BIGINT) AS code_min, "
        "CAST(MAX(cdi) AS BIGINT) AS code_max, "
        "CAST(SUM(eq) AS BIGINT) AS err_q FROM e GROUP BY vec_id"
    )


def _leverage_sql(k: int = 50, lam: int = 1_000_000) -> str:
    """SQL twin of train.leverage_topk: exact HUGEINT Gram + adjugate,
    generated from the SAME cofactor formulas, and the 9-term quadratic
    form in the identical left-associative f64 order."""
    names = [["a00", "a01", "a02"], ["a10", "a11", "a12"],
             ["a20", "a21", "a22"]]
    det = (f"({names[0][0]}*({names[1][1]}*{names[2][2]} - {names[1][2]}*{names[2][1]})"
           f" - {names[0][1]}*({names[1][0]}*{names[2][2]} - {names[1][2]}*{names[2][0]})"
           f" + {names[0][2]}*({names[1][0]}*{names[2][1]} - {names[1][1]}*{names[2][0]}))")
    adj = {}
    for i in range(3):
        for j in range(3):
            mi = [[names[r][c] for c in range(3) if c != j]
                  for r in range(3) if r != i]
            cof = f"({mi[0][0]}*{mi[1][1]} - {mi[0][1]}*{mi[1][0]})"
            sign = "" if (i + j) % 2 == 0 else "-"
            adj[(j, i)] = f"({sign}{cof})"
    msel = ", ".join(
        f"CAST({adj[(i, j)]} AS DOUBLE) / CAST(det AS DOUBLE) AS m{i}{j}"
        for i in range(3) for j in range(3))
    q = ["q1", "q2", "q3"]
    lev = None
    for i in range(3):
        for j in range(3):
            t = f"(CAST({q[i]}*{q[j]} AS DOUBLE) * m{i}{j})"
            lev = t if lev is None else f"({lev} + {t})"
    return (
        "WITH f AS MATERIALIZED (SELECT l_orderkey, "
        "CAST(l_linenumber AS BIGINT) AS l_linenumber, "
        "CAST(FLOOR(ABS(l_quantity) + 0.5)*SIGN(l_quantity) AS BIGINT) AS q1, "
        "CAST(FLOOR(ABS(l_discount*100.0) + 0.5)*SIGN(l_discount) AS BIGINT) AS q2, "
        "CAST(FLOOR(ABS(l_tax*100.0) + 0.5)*SIGN(l_tax) AS BIGINT) AS q3 "
        "FROM lineitem), "
        "g AS (SELECT SUM(CAST(q1 AS HUGEINT)*q1) AS g00, "
        "SUM(CAST(q1 AS HUGEINT)*q2) AS g01, SUM(CAST(q1 AS HUGEINT)*q3) AS g02, "
        "SUM(CAST(q2 AS HUGEINT)*q2) AS g11, SUM(CAST(q2 AS HUGEINT)*q3) AS g12, "
        "SUM(CAST(q3 AS HUGEINT)*q3) AS g22 FROM f), "
        f"a AS (SELECT g00 + {lam} AS a00, g01 AS a01, g02 AS a02, "
        f"g01 AS a10, g11 + {lam} AS a11, g12 AS a12, "
        f"g02 AS a20, g12 AS a21, g22 + {lam} AS a22 FROM g), "
        f"dd AS (SELECT a.*, {det} AS det FROM a), "
        f"mm AS (SELECT {msel} FROM dd) "
        f"SELECT l_orderkey, l_linenumber, {lev} AS lev FROM f, mm "
        f"QUALIFY row_number() OVER (ORDER BY {lev} DESC, l_orderkey, "
        f"l_linenumber) <= {k}"
    )


def _d8_sql(side: int = 16, quant: float = 2.0, tx_max: int = 15,
            ty_max: int = 15) -> str:
    """SQL twin of raster.d8_directions_stage: candidate explode over the
    8 fixed directions (VALUES), integer slope key, QUALIFY argmax with
    the direction-order tiebreak, sinks via LEFT JOIN."""
    from ..stages.raster import D8_DIRS

    vals = ", ".join(f"({i}, {dx}, {dy}, {3 - (dx * dx + dy * dy)})"
                     for i, (dx, dy) in enumerate(D8_DIRS))
    return (
        f"WITH {tiles_sql(side)}, "
        "rc AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) AS q "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        f"dirs(di, dx, dy, w) AS (VALUES {vals}), "
        "cand AS (SELECT c.tile_x, c.tile_y, c.px, c.py, d.di, "
        "  c.q - n.q AS drop, (c.q - n.q) * (c.q - n.q) * d.w AS key "
        "  FROM rc c, dirs d "
        "  JOIN rc n ON n.tile_x = c.tile_x AND n.tile_y = c.tile_y "
        "    AND n.px = c.px + d.dx AND n.py = c.py + d.dy "
        "  WHERE c.q - n.q > 0), "
        "best AS (SELECT tile_x, tile_y, px, py, di, drop FROM cand "
        "  QUALIFY row_number() OVER (PARTITION BY tile_x, tile_y, px, py "
        "  ORDER BY key DESC, di) = 1) "
        "SELECT CAST(c.tile_x AS BIGINT) AS tile_x, "
        "CAST(c.tile_y AS BIGINT) AS tile_y, CAST(c.px AS BIGINT) AS px, "
        "CAST(c.py AS BIGINT) AS py, "
        "CAST(COALESCE(b.di, -1) AS BIGINT) AS dir, "
        "CAST(COALESCE(b.drop, 0) AS BIGINT) AS best_drop "
        "FROM rc c LEFT JOIN best b ON b.tile_x = c.tile_x "
        "AND b.tile_y = c.tile_y AND b.px = c.px AND b.py = c.py"
    )


def _flow_accum_sql(side: int = 16, quant: float = 2.0, tx_max: int = 15,
                    ty_max: int = 15) -> str:
    """SQL twin of raster.flow_accum_stage: the d8 argmax picks each
    pixel's downstream edge, then a recursive reachability closure walks
    every pixel's drainage path (strictly decreasing quantized elevation →
    guaranteed termination) and COUNT(*) per reached cell is the
    accumulation (each pixel seeds its own path, so acc includes self)."""
    from ..stages.raster import D8_DIRS

    vals = ", ".join(f"({i}, {dx}, {dy}, {3 - (dx * dx + dy * dy)})"
                     for i, (dx, dy) in enumerate(D8_DIRS))
    return (
        f"WITH RECURSIVE {tiles_sql(side)}, "
        "rc AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) AS q "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        f"dirs(di, dx, dy, w) AS (VALUES {vals}), "
        "cand AS (SELECT c.tile_x, c.tile_y, c.px, c.py, "
        "  c.px + d.dx AS nx, c.py + d.dy AS ny, "
        "  (c.q - n.q) * (c.q - n.q) * d.w AS key, d.di "
        "  FROM rc c, dirs d "
        "  JOIN rc n ON n.tile_x = c.tile_x AND n.tile_y = c.tile_y "
        "    AND n.px = c.px + d.dx AND n.py = c.py + d.dy "
        "  WHERE c.q - n.q > 0), "
        "edge AS MATERIALIZED (SELECT tile_x, tile_y, px, py, nx, ny "
        "  FROM cand "
        "  QUALIFY row_number() OVER (PARTITION BY tile_x, tile_y, px, py "
        "  ORDER BY key DESC, di) = 1), "
        "reach AS (SELECT tile_x, tile_y, px AS cx, py AS cy FROM rc "
        "  UNION ALL "
        "  SELECT r.tile_x, r.tile_y, e.nx, e.ny FROM reach r "
        "  JOIN edge e ON e.tile_x = r.tile_x AND e.tile_y = r.tile_y "
        "    AND e.px = r.cx AND e.py = r.cy) "
        "SELECT CAST(tile_x AS BIGINT) AS tile_x, "
        "CAST(tile_y AS BIGINT) AS tile_y, CAST(cx AS BIGINT) AS px, "
        "CAST(cy AS BIGINT) AS py, CAST(COUNT(*) AS BIGINT) AS acc "
        "FROM reach GROUP BY tile_x, tile_y, cx, cy"
    )


def _interval_coverage_sql(base_s: int = 60) -> str:
    """SQL twin of streaming.interval_coverage: gaps-and-islands with
    window functions — new island iff start exceeds the running max end
    of all prior rows of the key (ROWS UNBOUNDED PRECEDING .. 1
    PRECEDING), island id by running SUM, then two GROUP BYs. All int64
    microseconds; the dur expression mirrors the engine's
    ⌊|value|·10 + 0.5⌋ float chain exactly."""
    return (
        "WITH i AS (SELECT user_id, "
        "  CAST(epoch_us(ts) AS BIGINT) AS s, "
        "  CAST(epoch_us(ts) AS BIGINT) + "
        "  (CAST(FLOOR(ABS(value) * CAST(10 AS DOUBLE) + CAST(0.5 AS DOUBLE)) "
        f"   AS BIGINT) + {base_s}) * 1000000 AS e "
        "  FROM events), "
        "m AS (SELECT user_id, s, e, "
        "  CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY user_id "
        "    ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), "
        "    -9223372036854775807) THEN 1 ELSE 0 END AS new_island "
        "  FROM i), "
        "g AS (SELECT user_id, s, e, SUM(new_island) OVER (PARTITION BY user_id "
        "  ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        "  AS iid FROM m), "
        "isl AS (SELECT user_id, iid, MIN(s) AS s0, MAX(e) AS e1, "
        "  COUNT(*) AS n FROM g GROUP BY user_id, iid) "
        "SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events, "
        "CAST(COUNT(*) AS BIGINT) AS n_islands, "
        "CAST(SUM(e1 - s0) AS BIGINT) AS covered_us, "
        "CAST(MAX(e1 - s0) AS BIGINT) AS max_island_us "
        "FROM isl GROUP BY user_id"
    )


def _kcore_sql(rounds: int = 16, out_links: int = 4,
               host_mod: int = 1000) -> str:
    """SQL twin of graph.kcore_hosts: the identical fixed-round H-index
    recurrence unrolled — per round, neighbors' values rank desc per
    node (row_number) and the new value is MAX(LEAST(rn, hq)); tie
    order among equal hq is irrelevant because LEAST depends only on
    the (position, value) multiset. Pure integers throughout."""
    lk_base = (
        "SELECT CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) AS src, "
        "url || '#out' || CAST(kr.range AS VARCHAR) AS tok "
        f"FROM pages, range(0, {out_links}) kr"
    )
    lk_inner = _sg.chain(
        lk_base,
        [("_f", _sg.fnv1a64_expr("tok")), *_sg.splitmix64_steps("_f", "_h", "ht")])
    ctes = [
        f"lk AS MATERIALIZED (SELECT src, CAST(_h % {host_mod} AS BIGINT) AS dst "
        f"FROM ({lk_inner}))",
        "ua AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM lk WHERE src <> dst)",
        "adj AS MATERIALIZED (SELECT a AS v, b AS u FROM ua "
        "UNION ALL SELECT b AS v, a AS u FROM ua)",
        "h0 AS MATERIALIZED (SELECT v AS node, CAST(COUNT(*) AS BIGINT) AS q "
        "FROM adj GROUP BY v)",
    ]
    for t in range(1, rounds + 1):
        ctes.append(
            f"nb{t} AS (SELECT adj.v AS node, h.q AS hq, "
            "row_number() OVER (PARTITION BY adj.v ORDER BY h.q DESC) AS rn "
            f"FROM adj JOIN h{t - 1} h ON h.node = adj.u)")
        ctes.append(
            f"h{t} AS MATERIALIZED (SELECT node, MAX(LEAST(rn, hq)) AS q "
            f"FROM nb{t} GROUP BY node)")
    return (
        f"WITH {pages_sql()}, " + ", ".join(ctes) + " "
        "SELECT CAST(h0.node AS BIGINT) AS host, "
        "CAST(h0.q AS BIGINT) AS degree, "
        f"CAST(h{rounds}.q AS BIGINT) AS core "
        f"FROM h0 JOIN h{rounds} ON h{rounds}.node = h0.node"
    )


def _haar_sql(side: int = 16, levels: int = 2, quant: float = 2.0,
              tx_max: int = 15, ty_max: int = 15) -> str:
    """SQL twin of raster.haar_tiles_stage: level 1 is one signed GROUP
    BY over 2×2 pixel blocks, each further level the same pass over the
    previous level's ll — integer-exact, sums of ≤4 int64 terms."""
    ctes = [
        "rc AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) AS q "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max})",
        "l1 AS MATERIALIZED (SELECT tile_x, tile_y, px // 2 AS bx, "
        "py // 2 AS by, SUM(q) AS ll, "
        "SUM(CASE WHEN px % 2 = 0 THEN q ELSE -q END) AS lh, "
        "SUM(CASE WHEN py % 2 = 0 THEN q ELSE -q END) AS hl, "
        "SUM(CASE WHEN (px + py) % 2 = 0 THEN q ELSE -q END) AS hh "
        "FROM rc GROUP BY tile_x, tile_y, px // 2, py // 2)",
    ]
    for lev in range(2, levels + 1):
        p = lev - 1
        ctes.append(
            f"l{lev} AS MATERIALIZED (SELECT tile_x, tile_y, "
            "bx // 2 AS bx, by // 2 AS by, SUM(ll) AS ll, "
            "SUM(CASE WHEN bx % 2 = 0 THEN ll ELSE -ll END) AS lh, "
            "SUM(CASE WHEN by % 2 = 0 THEN ll ELSE -ll END) AS hl, "
            "SUM(CASE WHEN (bx + by) % 2 = 0 THEN ll ELSE -ll END) AS hh "
            f"FROM l{p} GROUP BY tile_x, tile_y, bx // 2, by // 2)")
    sel = " UNION ALL ".join(
        f"SELECT CAST(tile_x AS BIGINT) AS tile_x, "
        f"CAST(tile_y AS BIGINT) AS tile_y, CAST({lev} AS BIGINT) AS level, "
        "CAST(bx AS BIGINT) AS bx, CAST(by AS BIGINT) AS by, "
        "CAST(ll AS BIGINT) AS ll, CAST(lh AS BIGINT) AS lh, "
        "CAST(hl AS BIGINT) AS hl, CAST(hh AS BIGINT) AS hh "
        f"FROM l{lev}" for lev in range(1, levels + 1))
    return f"WITH {tiles_sql(side)}, " + ", ".join(ctes) + " " + sel


def _watershed_sql(side: int = 16, quant: float = 2.0, tx_max: int = 15,
                   ty_max: int = 15) -> str:
    """SQL twin of raster.watershed_basins_stage: the flow_accum pointer
    walk, but keeping per start pixel the unique path node with no
    outgoing edge (the sink) as its basin label."""
    from ..stages.raster import D8_DIRS

    vals = ", ".join(f"({i}, {dx}, {dy}, {3 - (dx * dx + dy * dy)})"
                     for i, (dx, dy) in enumerate(D8_DIRS))
    return (
        f"WITH RECURSIVE {tiles_sql(side)}, "
        "rc AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) AS q "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        f"dirs(di, dx, dy, w) AS (VALUES {vals}), "
        "cand AS (SELECT c.tile_x, c.tile_y, c.px, c.py, "
        "  c.px + d.dx AS nx, c.py + d.dy AS ny, "
        "  (c.q - n.q) * (c.q - n.q) * d.w AS key, d.di "
        "  FROM rc c, dirs d "
        "  JOIN rc n ON n.tile_x = c.tile_x AND n.tile_y = c.tile_y "
        "    AND n.px = c.px + d.dx AND n.py = c.py + d.dy "
        "  WHERE c.q - n.q > 0), "
        "edge AS MATERIALIZED (SELECT tile_x, tile_y, px, py, nx, ny "
        "  FROM cand "
        "  QUALIFY row_number() OVER (PARTITION BY tile_x, tile_y, px, py "
        "  ORDER BY key DESC, di) = 1), "
        "walk AS (SELECT tile_x, tile_y, px, py, px AS cx, py AS cy FROM rc "
        "  UNION ALL "
        "  SELECT w.tile_x, w.tile_y, w.px, w.py, e.nx, e.ny FROM walk w "
        "  JOIN edge e ON e.tile_x = w.tile_x AND e.tile_y = w.tile_y "
        "    AND e.px = w.cx AND e.py = w.cy) "
        "SELECT CAST(w.tile_x AS BIGINT) AS tile_x, "
        "CAST(w.tile_y AS BIGINT) AS tile_y, CAST(w.px AS BIGINT) AS px, "
        "CAST(w.py AS BIGINT) AS py, "
        f"CAST(w.cy * {side} + w.cx AS BIGINT) AS basin "
        "FROM walk w WHERE NOT EXISTS (SELECT 1 FROM edge e "
        "  WHERE e.tile_x = w.tile_x AND e.tile_y = w.tile_y "
        "  AND e.px = w.cx AND e.py = w.cy)"
    )


def _focal_majority_sql(side: int = 16, quant: float = 2.0,
                        tx_max: int = 15, ty_max: int = 15) -> str:
    """SQL twin of raster.focal_majority_stage: explode the 3×3
    neighborhood (VALUES offsets ⋈ in-tile pixels — the join shrinks at
    borders by construction), count per (pixel, value), QUALIFY the
    (count DESC, value ASC) argmax."""
    offs = ", ".join(f"({dx}, {dy})" for dy in (-1, 0, 1)
                     for dx in (-1, 0, 1))
    return (
        f"WITH {tiles_sql(side)}, "
        "rc AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) AS q "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        "nb AS (SELECT c.tile_x, c.tile_y, c.px, c.py, n.q "
        "  FROM rc c, offs o "
        "  JOIN rc n ON n.tile_x = c.tile_x AND n.tile_y = c.tile_y "
        "    AND n.px = c.px + o.dx AND n.py = c.py + o.dy), "
        "cnts AS (SELECT tile_x, tile_y, px, py, q, COUNT(*) AS n "
        "  FROM nb GROUP BY tile_x, tile_y, px, py, q) "
        "SELECT CAST(tile_x AS BIGINT) AS tile_x, "
        "CAST(tile_y AS BIGINT) AS tile_y, CAST(px AS BIGINT) AS px, "
        "CAST(py AS BIGINT) AS py, CAST(q AS BIGINT) AS mode_q, "
        "CAST(n AS BIGINT) AS mode_n "
        "FROM cnts QUALIFY row_number() OVER (PARTITION BY tile_x, tile_y, "
        "px, py ORDER BY n DESC, q) = 1"
    )


def _link_predict_sql(cap: int = 64, k: int = 200, scale_bits: int = 20,
                      out_links: int = 4, host_mod: int = 1000) -> str:
    """SQL twin of graph.link_predict_hosts: wedge self-join restricted
    to degree-capped centers, ⌊2^20/ln(deg)⌋ integer AA weights (numpy
    log == DuckDB ln bit-for-bit on this box — tfidf precedent), ANTI
    JOIN drops real edges, QUALIFY takes the (aa_q DESC, x, y) top-k."""
    s = 1 << scale_bits
    lk_base = (
        "SELECT CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) AS src, "
        "url || '#out' || CAST(kr.range AS VARCHAR) AS tok "
        f"FROM pages, range(0, {out_links}) kr"
    )
    lk_inner = _sg.chain(
        lk_base,
        [("_f", _sg.fnv1a64_expr("tok")), *_sg.splitmix64_steps("_f", "_h", "ht")])
    return (
        f"WITH {pages_sql()}, "
        f"lk AS MATERIALIZED (SELECT src, CAST(_h % {host_mod} AS BIGINT) AS dst "
        f"FROM ({lk_inner})), "
        "ua AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM lk WHERE src <> dst), "
        "adj AS MATERIALIZED (SELECT a AS v, b AS u FROM ua "
        "UNION ALL SELECT b AS v, a AS u FROM ua), "
        "deg AS (SELECT v AS node, COUNT(*) AS d FROM adj GROUP BY v), "
        f"ctr AS MATERIALIZED (SELECT node, CAST(FLOOR(CAST({s} AS DOUBLE) "
        f"/ ln(CAST(d AS DOUBLE))) AS BIGINT) AS wq FROM deg "
        f"WHERE d >= 2 AND d <= {cap}), "
        "wed AS (SELECT a1.u AS x, a2.u AS y, c.wq "
        "FROM ctr c JOIN adj a1 ON a1.v = c.node "
        "JOIN adj a2 ON a2.v = c.node AND a1.u < a2.u), "
        "sc AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cn, "
        "CAST(SUM(wq) AS BIGINT) AS aa_q FROM wed GROUP BY x, y), "
        "ne AS (SELECT sc.x, sc.y, sc.cn, sc.aa_q FROM sc "
        "ANTI JOIN ua ON ua.a = sc.x AND ua.b = sc.y) "
        "SELECT CAST(x AS BIGINT) AS host_a, CAST(y AS BIGINT) AS host_b, "
        "cn, aa_q FROM ne "
        f"QUALIFY row_number() OVER (ORDER BY aa_q DESC, x, y) <= {k}"
    )


def _loudness_sql(clip: int = 120, frame: int = 32, maxp: int = 256) -> str:
    """SQL twin of multimodal.LoudnessMeter over the GLRM fixture
    (payload = first 256 utf8 bytes of the ASCII doc text, so ord ==
    byte): per 32-byte frame, integer energy/peak/clip-count via list
    kernels."""
    dev = f"ord(substr(p, CAST(gs.range * {frame} AS INT) + i, 1)) - 128"
    return (
        f"WITH s AS (SELECT doc_id AS media_id, substr(text, 1, {maxp}) AS p "
        "FROM documents), "
        f"nf AS (SELECT media_id, p, length(p) // {frame} AS n FROM s), "
        "fr AS (SELECT media_id, CAST(gs.range AS BIGINT) AS frame, "
        "  list_aggregate(list_transform("
        f"    generate_series(1, {frame}), i -> ({dev}) * ({dev})), "
        "  'sum') AS energy, "
        "  list_aggregate(list_transform("
        f"    generate_series(1, {frame}), i -> ABS({dev})), 'max') AS peak, "
        "  list_aggregate(list_transform("
        f"    generate_series(1, {frame}), "
        f"    i -> CASE WHEN ABS({dev}) >= {clip} THEN 1 ELSE 0 END), "
        "  'sum') AS n_clip "
        f"  FROM nf, range(0, {maxp // frame}) gs WHERE gs.range < n) "
        "SELECT media_id, frame, CAST(energy AS BIGINT) AS energy, "
        "CAST(peak AS BIGINT) AS peak, CAST(n_clip AS BIGINT) AS n_clip "
        "FROM fr"
    )


def _kfold_cv_sql(k: int = 5) -> str:
    """SQL twin of train.kfold_cv_1d on lineitem (x = l_quantity,
    y = l_extendedprice, fold = l_orderkey % k): per-fold sufficient
    statistics pivot to columns so the fold totals combine in the
    engine's explicit ascending-fold left-associative order, then the
    identical closed-form/quadratic-form float chains."""
    stats = ("n", "sx", "sy", "sxx", "sxy", "syy")
    piv = ", ".join(
        f"MAX(CASE WHEN fold = {f} THEN {s} END) AS {s}{f}"
        for s in stats for f in range(k))
    tots = []
    for s in stats:
        acc = f"{s}0"
        for f in range(1, k):
            acc = f"({acc} + {s}{f})"
        tots.append(f"{acc} AS t_{s}")
    folds = []
    for f in range(k):
        folds.append(
            f"SELECT CAST({f} AS BIGINT) AS fold, "
            f"CAST(n{f} AS BIGINT) AS n_val, "
            f"(t_n - n{f}) AS trn, (t_sx - sx{f}) AS trsx, "
            f"(t_sy - sy{f}) AS trsy, (t_sxx - sxx{f}) AS trsxx, "
            f"(t_sxy - sxy{f}) AS trsxy, "
            f"n{f} AS vn, sx{f} AS vsx, sy{f} AS vsy, sxx{f} AS vsxx, "
            f"sxy{f} AS vsxy, syy{f} AS vsyy FROM p, t")
    return (
        "WITH f AS (SELECT l_orderkey % " + str(k) + " AS fold, "
        "CAST(l_quantity AS DOUBLE) AS x, "
        "CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem), "
        "s AS (SELECT fold, CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, "
        "SUM(y) AS sy, SUM(x*x) AS sxx, SUM(x*y) AS sxy, SUM(y*y) AS syy "
        "FROM f GROUP BY fold), "
        f"p AS (SELECT {piv} FROM s), "
        f"t AS (SELECT {', '.join(tots)} FROM p), "
        "folds AS (" + " UNION ALL ".join(folds) + "), "
        "w AS (SELECT fold, n_val, vn, vsx, vsy, vsxx, vsxy, vsyy, "
        "((trn * trsxy) - (trsx * trsy)) / ((trn * trsxx) - (trsx * trsx)) AS w1u, "
        "((trsy * trsxx) - (trsx * trsxy)) / ((trn * trsxx) - (trsx * trsx)) AS w0u "
        "FROM folds) "
        "SELECT fold, n_val, ROUND(w0u, 6) AS w0, ROUND(w1u, 6) AS w1, "
        "ROUND((vsyy - 2*((w0u*vsy) + (w1u*vsxy)) "
        "+ (((w0u*w0u)*vn) + (((2*w0u)*w1u)*vsx) + ((w1u*w1u)*vsxx)))/vn, 2) "
        "AS val_mse FROM w"
    )


def _bfs_depth_sql(rounds: int = 8, out_links: int = 4,
                   host_mod: int = 1000) -> str:
    """SQL twin of graph.bfs_depth_hosts: the identical fixed-round
    min-plus relaxation unrolled — per round the new depth is the MIN
    over {previous depth} ∪ {neighbor depth + 1}. Pure integers; INF
    is the same 2^40 sentinel as the engine."""
    inf = 1 << 40
    lk_base = (
        "SELECT CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) AS src, "
        "url || '#out' || CAST(kr.range AS VARCHAR) AS tok "
        f"FROM pages, range(0, {out_links}) kr"
    )
    lk_inner = _sg.chain(
        lk_base,
        [("_f", _sg.fnv1a64_expr("tok")), *_sg.splitmix64_steps("_f", "_h", "ht")])
    ctes = [
        f"lk AS MATERIALIZED (SELECT src, CAST(_h % {host_mod} AS BIGINT) AS dst "
        f"FROM ({lk_inner}))",
        "ua AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM lk WHERE src <> dst)",
        "adj AS MATERIALIZED (SELECT a AS v, b AS u FROM ua "
        "UNION ALL SELECT b AS v, a AS u FROM ua)",
        "nodes AS MATERIALIZED (SELECT DISTINCT v AS node FROM adj)",
        "d0 AS MATERIALIZED (SELECT node, CASE WHEN node = "
        "(SELECT MIN(node) FROM nodes) THEN CAST(0 AS BIGINT) "
        f"ELSE CAST({inf} AS BIGINT) END AS q FROM nodes)",
    ]
    for t in range(1, rounds + 1):
        ctes.append(
            f"d{t} AS MATERIALIZED (SELECT node, MIN(q) AS q FROM ("
            f"SELECT node, q FROM d{t - 1} "
            f"UNION ALL SELECT adj.v AS node, d.q + 1 AS q "
            f"FROM adj JOIN d{t - 1} d ON d.node = adj.u) GROUP BY node)")
    return (
        f"WITH {pages_sql()}, " + ", ".join(ctes) + " "
        "SELECT CAST(node AS BIGINT) AS host, "
        f"CAST(CASE WHEN q >= {inf} THEN -1 ELSE q END AS BIGINT) AS depth "
        f"FROM d{rounds}"
    )


def _variogram_sql(side: int = 16, quant: float = 2.0, max_lag: int = 8,
                   tx_max: int = 15, ty_max: int = 15) -> str:
    """SQL twin of raster.variogram_stage: lag offsets ⋈ in-tile pixels
    (shrinks at borders by construction), integer Σd² per (tile, axis,
    lag), γ = ss/(2n) as one correctly-rounded division of exact ints."""
    lags = ", ".join(f"({h})" for h in range(1, max_lag + 1))
    return (
        f"WITH {tiles_sql(side)}, "
        "rc AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) AS q "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        f"lags(lag) AS (VALUES {lags}), "
        "prs AS ("
        "SELECT c.tile_x, c.tile_y, 'x' AS axis, l.lag, "
        "  (n.q - c.q) * (n.q - c.q) AS d2 "
        "FROM rc c, lags l "
        "JOIN rc n ON n.tile_x = c.tile_x AND n.tile_y = c.tile_y "
        "  AND n.py = c.py AND n.px = c.px + l.lag "
        "UNION ALL "
        "SELECT c.tile_x, c.tile_y, 'y' AS axis, l.lag, "
        "  (n.q - c.q) * (n.q - c.q) AS d2 "
        "FROM rc c, lags l "
        "JOIN rc n ON n.tile_x = c.tile_x AND n.tile_y = c.tile_y "
        "  AND n.px = c.px AND n.py = c.py + l.lag) "
        "SELECT CAST(tile_x AS BIGINT) AS tile_x, "
        "CAST(tile_y AS BIGINT) AS tile_y, axis, "
        "CAST(lag AS BIGINT) AS lag, CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        "CAST(SUM(d2) AS BIGINT) AS ss, "
        "ROUND(CAST(SUM(d2) AS DOUBLE) / CAST(2 * COUNT(*) AS DOUBLE), 9) "
        "AS gamma_r "
        "FROM prs GROUP BY tile_x, tile_y, axis, lag"
    )


def _moran_sql(side: int = 16, quant: float = 2.0,
               tx_max: int = 15, ty_max: int = 15) -> str:
    """SQL twin of raster.moran_i_stage: N-scaled mean-centered values
    keep everything integer; rook offsets count each unordered neighbor
    pair twice exactly as the engine's 2·(row+col) slicing does."""
    n = side * side
    w = 2 * (2 * side * (side - 1))
    return (
        f"WITH {tiles_sql(side)}, "
        "rc AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) AS q "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        "st AS (SELECT tile_x, tile_y, SUM(q) AS s "
        "  FROM rc GROUP BY tile_x, tile_y), "
        "cc AS MATERIALIZED (SELECT r.tile_x, r.tile_y, r.px, r.py, "
        f"  {n} * r.q - st.s AS c "
        "  FROM rc r JOIN st ON st.tile_x = r.tile_x "
        "    AND st.tile_y = r.tile_y), "
        "offs(dx, dy) AS (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)), "
        "nn AS (SELECT a.tile_x, a.tile_y, a.c * b.c AS p "
        "  FROM cc a, offs o "
        "  JOIN cc b ON b.tile_x = a.tile_x AND b.tile_y = a.tile_y "
        "    AND b.px = a.px + o.dx AND b.py = a.py + o.dy), "
        "ag AS (SELECT tile_x, tile_y, SUM(p) AS num "
        "  FROM nn GROUP BY tile_x, tile_y), "
        "dd AS (SELECT tile_x, tile_y, SUM(c * c) AS den "
        "  FROM cc GROUP BY tile_x, tile_y) "
        "SELECT CAST(ag.tile_x AS BIGINT) AS tile_x, "
        "CAST(ag.tile_y AS BIGINT) AS tile_y, "
        f"CAST({n} AS BIGINT) AS n, CAST({w} AS BIGINT) AS w_pairs, "
        "CAST(num AS BIGINT) AS num, CAST(den AS BIGINT) AS den, "
        f"ROUND(CAST(num * {n} AS DOUBLE) / CAST(den * {w} AS DOUBLE), 9) "
        "AS moran_r "
        "FROM ag JOIN dd ON dd.tile_x = ag.tile_x AND dd.tile_y = ag.tile_y"
    )


def _getis_sql(side: int = 16, quant: float = 2.0,
               tx_max: int = 15, ty_max: int = 15) -> str:
    """SQL twin of raster.getis_gi_stage: 3×3 shrink-at-border window
    sums via the offsets join, z from exact-integer numerator and two
    correctly-rounded square roots mirrored op-for-op."""
    n = side * side
    offs = ", ".join(f"({dx}, {dy})" for dy in (-1, 0, 1)
                     for dx in (-1, 0, 1))
    return (
        f"WITH {tiles_sql(side)}, "
        "rc AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) AS q "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        "st AS (SELECT tile_x, tile_y, SUM(q) AS s, SUM(q * q) AS s2 "
        "  FROM rc GROUP BY tile_x, tile_y), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        "wnd AS (SELECT c.tile_x, c.tile_y, c.px, c.py, "
        "  SUM(n.q) AS wsum, COUNT(*) AS n_w "
        "  FROM rc c, offs o "
        "  JOIN rc n ON n.tile_x = c.tile_x AND n.tile_y = c.tile_y "
        "    AND n.px = c.px + o.dx AND n.py = c.py + o.dy "
        "  GROUP BY c.tile_x, c.tile_y, c.px, c.py) "
        "SELECT CAST(w.tile_x AS BIGINT) AS tile_x, "
        "CAST(w.tile_y AS BIGINT) AS tile_y, CAST(w.px AS BIGINT) AS px, "
        "CAST(w.py AS BIGINT) AS py, CAST(w.wsum AS BIGINT) AS wsum, "
        "CAST(w.n_w AS BIGINT) AS n_w, "
        f"ROUND(CAST({n} * w.wsum - st.s * w.n_w AS DOUBLE) / "
        f"(SQRT(CAST({n} * st.s2 - st.s * st.s AS DOUBLE)) * "
        f"SQRT(CAST({n} * w.n_w - w.n_w * w.n_w AS DOUBLE) / "
        f"CAST({n - 1} AS DOUBLE))), 9) AS z_r "
        "FROM wnd w JOIN st ON st.tile_x = w.tile_x "
        "  AND st.tile_y = w.tile_y"
    )


def _clustering_sql(out_links: int = 4, host_mod: int = 1000) -> str:
    """SQL twin of graph.clustering_coeff_hosts: the _triangle_sql plan
    with the wedge CENTER kept, per-node triangle counts from the three
    corners of each closing hit, cc = one correctly-rounded division of
    exact integers (0 when deg < 2)."""
    lk_base = (
        "SELECT CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) AS src, "
        "url || '#out' || CAST(kr.range AS VARCHAR) AS tok "
        f"FROM pages, range(0, {out_links}) kr"
    )
    lk_inner = _sg.chain(
        lk_base,
        [("_f", _sg.fnv1a64_expr("tok")), *_sg.splitmix64_steps("_f", "_h", "cl")])
    return (
        f"WITH {pages_sql()}, "
        f"lk AS MATERIALIZED (SELECT src, CAST(_h % {host_mod} AS BIGINT) AS dst "
        f"FROM ({lk_inner})), "
        "ue AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS u, "
        "GREATEST(src, dst) AS v FROM lk WHERE src <> dst), "
        "nd AS MATERIALIZED (SELECT node, COUNT(*)::BIGINT AS deg FROM ("
        "  SELECT u AS node FROM ue UNION ALL SELECT v AS node FROM ue) "
        "  GROUP BY node), "
        "ornt AS MATERIALIZED (SELECT "
        "  CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u < v) "
        "    THEN u ELSE v END AS s, "
        "  CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u < v) "
        "    THEN v ELSE u END AS t "
        "  FROM ue JOIN nd da ON da.node = ue.u JOIN nd db ON db.node = ue.v), "
        "wd AS MATERIALIZED (SELECT e1.s AS s, e1.t AS a, e2.t AS b "
        "  FROM ornt e1 JOIN ornt e2 ON e1.s = e2.s "
        "  JOIN nd d1 ON d1.node = e1.t JOIN nd d2 ON d2.node = e2.t "
        "  WHERE d1.deg < d2.deg OR (d1.deg = d2.deg AND e1.t < e2.t)), "
        "tri AS MATERIALIZED (SELECT wd.s, wd.a, wd.b FROM wd "
        "  JOIN ornt ON ornt.s = wd.a AND ornt.t = wd.b), "
        "tc AS (SELECT node, COUNT(*)::BIGINT AS tri FROM ("
        "  SELECT s AS node FROM tri UNION ALL SELECT a AS node FROM tri "
        "  UNION ALL SELECT b AS node FROM tri) GROUP BY node) "
        "SELECT CAST(nd.node AS BIGINT) AS host, nd.deg AS deg, "
        "CAST(COALESCE(tc.tri, 0) AS BIGINT) AS tri, "
        "CASE WHEN nd.deg < 2 THEN CAST(0 AS DOUBLE) ELSE "
        "ROUND(CAST(2 * COALESCE(tc.tri, 0) AS DOUBLE) / "
        "CAST(nd.deg * (nd.deg - 1) AS DOUBLE), 9) END AS cc_r "
        "FROM nd LEFT JOIN tc ON tc.node = nd.node"
    )


def _cost_distance_sql(side: int = 16, quant: float = 2.0, offset: int = 5,
                       rounds: int = 36, tx_max: int = 15,
                       ty_max: int = 15) -> str:
    """SQL twin of raster.cost_distance_stage: the identical fixed-round
    integer min-plus recurrence, each round one SELECT whose 4-neighbor
    minimum is LAG/LEAD over the row partition + LAG/LEAD over the column
    partition (the window-function focal recipe — no self-join)."""
    inf = 1 << 40
    ctes = [
        "d0 AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) + {offset} "
        "AS c, "
        f"CASE WHEN px = 0 AND py = 0 THEN 0 ELSE {inf} END AS d "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max})",
    ]
    for t in range(1, rounds + 1):
        p = t - 1
        ctes.append(
            f"d{t} AS MATERIALIZED (SELECT tile_x, tile_y, px, py, c, "
            "LEAST(d, LEAST("
            f"COALESCE(LAG(d) OVER (PARTITION BY tile_x, tile_y, py "
            f"ORDER BY px), {inf}), "
            f"COALESCE(LEAD(d) OVER (PARTITION BY tile_x, tile_y, py "
            f"ORDER BY px), {inf}), "
            f"COALESCE(LAG(d) OVER (PARTITION BY tile_x, tile_y, px "
            f"ORDER BY py), {inf}), "
            f"COALESCE(LEAD(d) OVER (PARTITION BY tile_x, tile_y, px "
            f"ORDER BY py), {inf})) + c) AS d "
            f"FROM d{p})")
    return (
        f"WITH {tiles_sql(side)}, " + ", ".join(ctes) + " "
        "SELECT CAST(tile_x AS BIGINT) AS tile_x, "
        "CAST(tile_y AS BIGINT) AS tile_y, CAST(px AS BIGINT) AS px, "
        "CAST(py AS BIGINT) AS py, CAST(c AS BIGINT) AS cost, "
        f"CAST(d AS BIGINT) AS dist FROM d{rounds}"
    )


def _hyperanf_sql(rounds: int = 3, out_links: int = 4,
                  host_mod: int = 1000) -> str:
    """SQL twin of graph.hyperanf_hosts: the identical p=4 HLL register
    chain (splitmix64 of the node id, rank capped at 53), max-merged over
    undirected neighbors per unrolled round, harmonic sum as the EXACT
    integer Σ 2^(53−reg) + zeros·2^53 ≤ 16·2^53 < 2⁶⁴ (single
    correctly-rounded HUGEINT→DOUBLE cast), α·m² inlined as the
    engine's Python-computed repr literal, linear counting below
    2.5·m with the proven LN parity."""
    m = 16
    am2 = float((0.7213 / (1.0 + 1.079 / m)) * m * m)
    lk_base = (
        "SELECT CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) AS src, "
        "url || '#out' || CAST(kr.range AS VARCHAR) AS tok "
        f"FROM pages, range(0, {out_links}) kr"
    )
    lk_inner = _sg.chain(
        lk_base,
        [("_f", _sg.fnv1a64_expr("tok")), *_sg.splitmix64_steps("_f", "_h", "ha")])
    node_h = _sg.chain(
        "SELECT node FROM nodes",
        [*_sg.splitmix64_steps("CAST(node AS HUGEINT)", "_h", "hn")])
    # rest = (h << 4) | 0xF in 64 bits; rank = 64 - floor(log2(rest)), ≤ 53
    rest = "(_h & 1152921504606846975) * 16 + 15"
    ctes = [
        f"lk AS MATERIALIZED (SELECT src, CAST(_h % {host_mod} AS BIGINT) AS dst "
        f"FROM ({lk_inner}))",
        "ua AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM lk WHERE src <> dst)",
        "adj AS MATERIALIZED (SELECT a AS v, b AS u FROM ua "
        "UNION ALL SELECT b AS v, a AS u FROM ua)",
        "nodes AS MATERIALIZED (SELECT DISTINCT v AS node FROM adj)",
        f"hx AS MATERIALIZED ({node_h})",
        "r0 AS MATERIALIZED (SELECT node, CAST(_h >> 60 AS BIGINT) AS idx, "
        f"LEAST(64 - CAST(FLOOR(LOG2(CAST({rest} AS DOUBLE))) AS BIGINT), 53) "
        "AS reg FROM hx)",
    ]
    for t in range(1, rounds + 1):
        ctes.append(
            f"r{t} AS MATERIALIZED (SELECT node, idx, MAX(reg) AS reg FROM ("
            f"SELECT node, idx, reg FROM r{t - 1} "
            f"UNION ALL SELECT adj.v AS node, r.idx, r.reg FROM adj "
            f"JOIN r{t - 1} r ON r.node = adj.u) GROUP BY node, idx)")
    ests = " UNION ALL ".join(
        f"SELECT node, CAST({t} AS BIGINT) AS rnd, COUNT(*) AS nzc, "
        "SUM(9007199254740992 // (CAST(1 AS BIGINT) << reg)) "
        f"+ ({m} - COUNT(*)) * CAST(9007199254740992 AS HUGEINT) AS ssc "
        f"FROM r{t} GROUP BY node"
        for t in range(0, rounds + 1))
    return (
        f"WITH {pages_sql()}, " + ", ".join(ctes) + ", "
        f"s AS ({ests}), "
        f"e AS (SELECT node, rnd, nzc, {m} - nzc AS zeros, "
        f"CAST({am2!r} AS DOUBLE) / (CAST(ssc AS DOUBLE) "
        "/ CAST(9007199254740992 AS DOUBLE)) AS est FROM s) "
        "SELECT CAST(node AS BIGINT) AS host, rnd AS \"round\", "
        "CAST(nzc AS BIGINT) AS nz, "
        f"ROUND(CASE WHEN est <= CAST(2.5 AS DOUBLE) * {m} AND zeros > 0 "
        f"THEN CAST({m} AS DOUBLE) * LN(CAST({m} AS DOUBLE) / zeros) "
        "ELSE est END, 1) AS ball FROM e"
    )


def _quadtree_sql(cap: int = 25, max_depth: int = 8) -> str:
    """SQL twin of cellindex.quadtree_cells: the closed-form tree — n_d
    CTEs roll the depth-``max_depth`` cell counts up level by level
    (pure integer sums; the FLOOR cell keys are the identical f64
    expression both sides), the ok_d chain keeps exactly the cells all
    of whose ancestors split, leaves are ok cells at/below cap (or at
    the floor). Mirrors the engine's driver/shallow + per-subtree/deep
    split, which partitions the same closed form."""
    side = 1 << max_depth
    ctes = [
        f"n{max_depth} AS MATERIALIZED (SELECT "
        "LEAST(CAST(FLOOR((lon + CAST(180 AS DOUBLE)) / CAST(360 AS DOUBLE) "
        f"* CAST({side} AS DOUBLE)) AS BIGINT), {side - 1}) AS cx, "
        "LEAST(CAST(FLOOR((lat + CAST(90 AS DOUBLE)) / CAST(180 AS DOUBLE) "
        f"* CAST({side} AS DOUBLE)) AS BIGINT), {side - 1}) AS cy, "
        "COUNT(*) AS n FROM loc GROUP BY 1, 2)",
    ]
    for d in range(max_depth - 1, -1, -1):
        ctes.append(
            f"n{d} AS MATERIALIZED (SELECT cx // 2 AS cx, cy // 2 AS cy, "
            f"SUM(n) AS n FROM n{d + 1} GROUP BY 1, 2)")
    ctes.append("ok0 AS (SELECT cx, cy, n FROM n0)")
    for d in range(1, max_depth + 1):
        ctes.append(
            f"ok{d} AS MATERIALIZED (SELECT c.cx, c.cy, c.n FROM n{d} c "
            f"JOIN ok{d - 1} p ON p.cx = c.cx // 2 AND p.cy = c.cy // 2 "
            f"WHERE p.n > {cap})")
    leaves = " UNION ALL ".join(
        f"SELECT CAST({d} AS BIGINT) AS depth, cx, cy, n FROM ok{d} "
        + (f"WHERE n <= {cap}" if d < max_depth else "")
        for d in range(0, max_depth + 1))
    loc = _sg.chain("SELECT url FROM pages", _sg.geocode_steps())
    return (
        f"WITH {pages_sql()}, loc AS MATERIALIZED ({loc}), "
        + ", ".join(ctes) + " "
        "SELECT depth, CAST(cx AS BIGINT) AS cx, CAST(cy AS BIGINT) AS cy, "
        f"CAST(n AS BIGINT) AS n_points FROM ({leaves})"
    )


def _kriging_sql(cs: float = 1.0) -> str:
    """SQL twin of cellindex.kriging_grid: geocode chain + 3×3 ring
    replication (idw pattern), (d², url) ROW_NUMBER ranks, rank-1..3
    pivot, then the EXACT Cramer texts from sqlgen.kriging_cramer_texts
    embedded verbatim — the engine numpy-evals the same strings, so
    every f64 op runs in the identical parse order. det = 0 dropped
    and ±1e6 clamped on both sides."""
    from . import sqlgen as _sg

    det_t, w1_t, w2_t, w3_t = _sg.kriging_cramer_texts()
    inner = _sg.chain(f"WITH {pages_sql()} SELECT url, text FROM pages",
                      _sg.geocode_steps("url"))
    csd = f"CAST({cs!r} AS DOUBLE)"

    def pick(col: str, r: int) -> str:
        return f"MAX(CASE WHEN rk = {r} THEN {col} END)"

    wide_cols = ", ".join(
        f"{pick(c, r)} AS {c}{r}"
        for r in (1, 2, 3) for c in ("lon", "lat", "d2", "v"))
    return (
        f"WITH pts AS MATERIALIZED (SELECT url, lon, lat, "
        "CAST(len(text) AS BIGINT) AS v, "
        f"CAST(FLOOR(lon / {csd}) AS BIGINT) AS cx, "
        f"CAST(FLOOR(lat / {csd}) AS BIGINT) AS cy FROM ({inner})), "
        "rep AS (SELECT cx + dxr.range AS gx, cy + dyr.range AS gy, "
        "  url, lon, lat, v FROM pts, range(-1, 2) dxr, range(-1, 2) dyr), "
        "d AS MATERIALIZED (SELECT gx, gy, url, lon, lat, v, "
        f"  (lon - (CAST(gx AS DOUBLE) + CAST(0.5 AS DOUBLE)) * {csd}) "
        f"  * (lon - (CAST(gx AS DOUBLE) + CAST(0.5 AS DOUBLE)) * {csd}) "
        f"  + (lat - (CAST(gy AS DOUBLE) + CAST(0.5 AS DOUBLE)) * {csd}) "
        f"  * (lat - (CAST(gy AS DOUBLE) + CAST(0.5 AS DOUBLE)) * {csd}) "
        "  AS d2 FROM rep), "
        "r AS MATERIALIZED (SELECT gx, gy, url, lon, lat, v, d2, "
        "  ROW_NUMBER() OVER (PARTITION BY gx, gy ORDER BY d2, url) AS rk, "
        "  COUNT(*) OVER (PARTITION BY gx, gy) AS n_cand FROM d), "
        f"wide AS MATERIALIZED (SELECT gx, gy, MAX(n_cand) AS n_cand, "
        f"  {wide_cols} FROM r WHERE rk <= 3 GROUP BY gx, gy "
        "  HAVING MAX(n_cand) >= 3), "
        "gam AS (SELECT gx, gy, n_cand, "
        "  SQRT((lon1 - lon2) * (lon1 - lon2) + (lat1 - lat2) * (lat1 - lat2)) AS g12, "
        "  SQRT((lon1 - lon3) * (lon1 - lon3) + (lat1 - lat3) * (lat1 - lat3)) AS g13, "
        "  SQRT((lon2 - lon3) * (lon2 - lon3) + (lat2 - lat3) * (lat2 - lat3)) AS g23, "
        "  SQRT(d21) AS b1, SQRT(d22) AS b2, SQRT(d23) AS b3, "
        "  CAST(v1 AS DOUBLE) AS v1, CAST(v2 AS DOUBLE) AS v2, "
        "  CAST(v3 AS DOUBLE) AS v3 FROM wide), "
        f"sol AS (SELECT gx, gy, n_cand, {det_t} AS det, "
        f"  {w1_t} AS w1, {w2_t} AS w2, {w3_t} AS w3, v1, v2, v3 FROM gam) "
        "SELECT CAST(gx AS BIGINT) AS gx, CAST(gy AS BIGINT) AS gy, "
        "CAST(n_cand AS BIGINT) AS n_cand, "
        "ROUND(LEAST(GREATEST(((w1 * v1 + w2 * v2) + w3 * v3) / det, "
        "CAST(-1000000 AS DOUBLE)), CAST(1000000 AS DOUBLE)), 6) AS krig_r "
        "FROM sol WHERE det <> 0"
    )


def _kn_perplexity_sql(scale: int = 1024) -> str:
    """SQL twin of textstages.kn_perplexity_scores: occurrence-level
    bigram explode (lm_perplexity pattern), the five EXACT integer model
    counts as plain aggregates, one mirrored f64 interpolated-KN chain
    (D = 0.75 exact dyadic, CAST literals — the DECIMAL trap), −ln P
    quantized to 1/scale nats before the per-doc integer sum."""
    d = "CAST(0.75 AS DOUBLE)"
    p = (f"(CAST(c12.c12 AS DOUBLE) - {d}) / CAST(c1.c1 AS DOUBLE) "
         f"+ {d} * CAST(c1.nf1 AS DOUBLE) / CAST(c1.c1 AS DOUBLE) "
         "* (CAST(nb.nb2 AS DOUBLE) / CAST(bt.bt AS DOUBLE))")
    return (
        "WITH bgw AS MATERIALIZED ("
        "  SELECT doc_id, split_part(bg, ' ', 1) AS w1, "
        "  split_part(bg, ' ', 2) AS w2, bg FROM ("
        "    SELECT doc_id, unnest(list_transform(generate_series(1, len(l)-1), "
        "      i -> l[i] || ' ' || l[i+1])) AS bg "
        "    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents))), "
        "c1 AS (SELECT w1, COUNT(*)::BIGINT AS c1, "
        "  COUNT(DISTINCT w2)::BIGINT AS nf1 FROM bgw GROUP BY w1), "
        "c12 AS (SELECT bg, COUNT(*)::BIGINT AS c12 FROM bgw GROUP BY bg), "
        "nb AS (SELECT w2, COUNT(DISTINCT w1)::BIGINT AS nb2 "
        "  FROM bgw GROUP BY w2), "
        "bt AS (SELECT COUNT(DISTINCT bg)::BIGINT AS bt FROM bgw), "
        "q AS (SELECT doc_id, CAST(FLOOR((- LN("
        f"{p}"
        f")) * CAST({scale} AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q "
        "  FROM bgw JOIN c1 USING (w1) JOIN c12 USING (bg) "
        "  JOIN nb USING (w2), bt) "
        "SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams, "
        "SUM(q)::BIGINT AS sum_q, "
        f"ROUND(CAST(SUM(q) AS DOUBLE) / CAST({scale} * COUNT(*) AS BIGINT), 6) "
        "AS kn_nll FROM q GROUP BY doc_id"
    )


def _theilsen_sql() -> str:
    """SQL twin of train.theilsen_slopes: equi self-join pairs (ok1 <
    ok2, date-distinct), ONE correctly-rounded division per slope, the
    explicit two-middle median (exact_median recipe), half-away ROUND."""
    return (
        "WITH o AS (SELECT o_custkey AS ck, o_orderkey AS ok, "
        "  CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day, "
        "  CAST(FLOOR(ABS(o_totalprice*100.0) + 0.5)*SIGN(o_totalprice) "
        "  AS BIGINT) AS cents FROM orders), "
        "p AS MATERIALIZED (SELECT a.ck, "
        "  CAST(b.cents - a.cents AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS s "
        "  FROM o a JOIN o b ON b.ck = a.ck AND a.ok < b.ok "
        "  AND a.day <> b.day), "
        "r AS (SELECT ck, s, "
        "  ROW_NUMBER() OVER (PARTITION BY ck ORDER BY s) AS rn, "
        "  COUNT(*) OVER (PARTITION BY ck) AS n FROM p) "
        "SELECT ck AS o_custkey, CAST(MAX(n) AS BIGINT) AS n_pairs, "
        "ROUND((MAX(CASE WHEN rn = (n - 1) // 2 + 1 THEN s END) "
        "+ MAX(CASE WHEN rn = n // 2 + 1 THEN s END)) "
        "/ CAST(2 AS DOUBLE), 6) AS ts_slope_r "
        "FROM r GROUP BY ck"
    )


def _mann_kendall_sql() -> str:
    """SQL twin of train.mann_kendall_orders: day-strict sign-pair sum,
    integer value-tie correction, and the identical 3-op f64 chain
    (div → sqrt → div) for the continuity-corrected z."""
    return (
        "WITH o AS (SELECT o_custkey AS ck, "
        "  CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day, "
        "  CAST(FLOOR(ABS(o_totalprice*100.0) + 0.5)*SIGN(o_totalprice) "
        "  AS BIGINT) AS cents FROM orders), "
        "s AS MATERIALIZED (SELECT a.ck, CAST(SUM(CASE "
        "  WHEN b.cents > a.cents THEN 1 WHEN b.cents < a.cents THEN -1 "
        "  ELSE 0 END) AS BIGINT) AS s "
        "  FROM o a JOIN o b ON b.ck = a.ck AND a.day < b.day GROUP BY a.ck), "
        "n AS (SELECT ck, CAST(COUNT(*) AS BIGINT) AS n FROM o GROUP BY ck), "
        "t AS (SELECT ck, CAST(SUM(c*(c-1)*(2*c+5)) AS BIGINT) AS tt FROM "
        "  (SELECT ck, cents, CAST(COUNT(*) AS BIGINT) AS c FROM o "
        "   GROUP BY ck, cents) GROUP BY ck) "
        "SELECT n.ck AS o_custkey, n.n AS n_orders, "
        "CAST(COALESCE(s.s, 0) AS BIGINT) AS s_stat, "
        "n.n*(n.n-1)*(2*n.n+5) - t.tt AS var18, "
        "ROUND(CASE WHEN COALESCE(s.s, 0) = 0 "
        "  OR n.n*(n.n-1)*(2*n.n+5) - t.tt <= 0 THEN CAST(0 AS DOUBLE) "
        "  ELSE CAST(s.s - SIGN(s.s) AS DOUBLE) "
        "  / SQRT(CAST(n.n*(n.n-1)*(2*n.n+5) - t.tt AS DOUBLE) "
        "         / CAST(18 AS DOUBLE)) END, 6) AS mk_z_r "
        "FROM n JOIN t ON t.ck = n.ck LEFT JOIN s ON s.ck = n.ck"
    )


def _terrain_indices_sql(side: int = 16, quant: float = 2.0,
                         tx_max: int = 15, ty_max: int = 15) -> str:
    """SQL twin of raster.terrain_indices_stage: 8-direction neighbour
    explode (VALUES), pure-integer GROUP BY reductions per pixel —
    TPI numerator, TRI, centered roughness, cardinal Laplacian."""
    from ..stages.raster import TERRAIN_DIRS

    vals = ", ".join(f"({dx}, {dy}, {1 if dx * dx + dy * dy == 1 else 0})"
                     for dx, dy in TERRAIN_DIRS)
    return (
        f"WITH {tiles_sql(side)}, "
        "rc AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) AS q "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        f"dirs(dx, dy, card) AS (VALUES {vals}), "
        "nb AS (SELECT c.tile_x, c.tile_y, c.px, c.py, "
        "  CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(n.q) AS BIGINT) AS s, "
        "  CAST(SUM(ABS(c.q - n.q)) AS BIGINT) AS sad, "
        "  MAX(n.q) AS mx, MIN(n.q) AS mn, "
        "  CAST(SUM(d.card) AS BIGINT) AS c4, "
        "  CAST(SUM(d.card * n.q) AS BIGINT) AS s4 "
        "  FROM rc c, dirs d "
        "  JOIN rc n ON n.tile_x = c.tile_x AND n.tile_y = c.tile_y "
        "    AND n.px = c.px + d.dx AND n.py = c.py + d.dy "
        "  GROUP BY 1, 2, 3, 4) "
        "SELECT CAST(c.tile_x AS BIGINT) AS tile_x, "
        "CAST(c.tile_y AS BIGINT) AS tile_y, CAST(c.px AS BIGINT) AS px, "
        "CAST(c.py AS BIGINT) AS py, b.cnt AS n_nbrs, "
        "b.cnt * c.q - b.s AS tpi_num, b.sad AS tri, "
        "GREATEST(b.mx, c.q) - LEAST(b.mn, c.q) AS rough, "
        "CASE WHEN b.c4 = 4 THEN 4 * c.q - b.s4 ELSE CAST(0 AS BIGINT) END "
        "AS lap4, b.c4 AS n4 "
        "FROM rc c JOIN nb b ON b.tile_x = c.tile_x AND b.tile_y = c.tile_y "
        "AND b.px = c.px AND b.py = c.py"
    )


def _acf_daily_sql(max_lag: int = 7) -> str:
    """SQL twin of streaming.acf_daily_orders: dense day spine via
    lateral generate_series, integer mean-free series n·x − Σx, exact
    integer num/den, one CAST/CAST division per lag."""
    lags = ", ".join(f"({L})" for L in range(1, max_lag + 1))
    return (
        "WITH d AS (SELECT CAST(epoch_us(o_orderdate) // 86400000000 "
        "  AS BIGINT) AS day FROM orders), "
        "c AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS x FROM d GROUP BY day), "
        "r AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d), "
        "s AS MATERIALIZED (SELECT g.day, COALESCE(c.x, 0) AS x "
        "  FROM r, LATERAL (SELECT UNNEST(generate_series(r.d0, r.d1)) "
        "  AS day) g LEFT JOIN c ON c.day = g.day), "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "  CAST(SUM(x) AS BIGINT) AS sx FROM s), "
        "y AS MATERIALIZED (SELECT s.day, nn.n * s.x - nn.sx AS y "
        "  FROM s, nn), "
        "den AS (SELECT CAST(SUM(y * y) AS BIGINT) AS den FROM y), "
        f"lags(L) AS (VALUES {lags}), "
        "num AS (SELECT l.L, CAST(SUM(a.y * b.y) AS BIGINT) AS num, "
        "  CAST(COUNT(*) AS BIGINT) AS nt FROM lags l "
        "  JOIN y a ON TRUE JOIN y b ON b.day = a.day + l.L GROUP BY l.L) "
        "SELECT CAST(num.L AS BIGINT) AS lag, num.nt AS n_terms, "
        "ROUND(CASE WHEN den.den = 0 THEN CAST(0 AS DOUBLE) "
        "  ELSE CAST(num.num AS DOUBLE) / CAST(den.den AS DOUBLE) END, 6) "
        "AS acf_r FROM num, den"
    )


def _mad_outliers_sql() -> str:
    """SQL twin of streaming.mad_outliers_events: hourly counts per
    type, two-middle doubled medians (m2 = 2·median of c, mad4 = 4·MAD),
    pure-integer Hampel flag 2·dev2 > 3·mad4."""
    return (
        "WITH c AS (SELECT event_type, "
        "  CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour, "
        "  CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1, 2), "
        "r AS (SELECT event_type, hour, c, "
        "  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c, hour) "
        "  AS rn, COUNT(*) OVER (PARTITION BY event_type) AS n FROM c), "
        "m AS (SELECT event_type, CAST(MAX(CASE WHEN rn = (n-1)//2 + 1 "
        "  THEN c END) + MAX(CASE WHEN rn = n//2 + 1 THEN c END) "
        "  AS BIGINT) AS m2 FROM r GROUP BY event_type), "
        "d AS MATERIALIZED (SELECT c.event_type, c.hour, c.c, "
        "  ABS(2*c.c - m.m2) AS dev2, m.m2 FROM c "
        "  JOIN m USING (event_type)), "
        "r2 AS (SELECT event_type, dev2, "
        "  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev2) AS rn, "
        "  COUNT(*) OVER (PARTITION BY event_type) AS n FROM d), "
        "md AS (SELECT event_type, CAST(MAX(CASE WHEN rn = (n-1)//2 + 1 "
        "  THEN dev2 END) + MAX(CASE WHEN rn = n//2 + 1 THEN dev2 END) "
        "  AS BIGINT) AS mad4 FROM r2 GROUP BY event_type) "
        "SELECT d.event_type, d.hour, d.c, d.m2, CAST(d.dev2 AS BIGINT) "
        "AS dev2, md.mad4, CAST(CASE WHEN 2*d.dev2 > 3*md.mad4 THEN 1 "
        "ELSE 0 END AS BIGINT) AS is_outlier "
        "FROM d JOIN md USING (event_type)"
    )


def _ams_f2_sql(k: int = 16, group: int = 4) -> str:
    """SQL twin of sketches.ams_f2 over events.user_id: identical hash
    chain per estimator (fnv → xor seed_j → splitmix → low bit), integer
    Z/Z²/group sums, two-middle median, dyadic /8."""
    from ..stages.sketches import _cms_seeds

    seeds = _cms_seeds(k)
    steps = [("_fh", _sg.fnv1a64_expr("k")),
             *_sg.splitmix64_steps("_fh", "_sh", "f")]
    sel = []
    for j in range(k):
        steps.append((f"_x{j}", _sg.u64_xor("_sh", str(int(seeds[j])))))
        steps.extend(_sg.splitmix64_steps(f"_x{j}", f"_h{j}", f"a{j}"))
        sel.append(f"SELECT {j} AS j, CASE WHEN (_h{j} & 1) = 1 "
                   "THEN 1 ELSE -1 END AS s FROM hx")
    return (
        "WITH ev AS (SELECT user_id::VARCHAR AS k FROM events), "
        "hx AS MATERIALIZED (" + _sg.chain("SELECT k FROM ev", steps) + "), "
        "signs AS (" + " UNION ALL ".join(sel) + "), "
        "z AS MATERIALIZED (SELECT j, CAST(SUM(s) AS BIGINT) AS z "
        "  FROM signs GROUP BY j), "
        f"sg AS (SELECT j // {group} AS g, CAST(SUM(z*z) AS BIGINT) AS s "
        "  FROM z GROUP BY 1), "
        "r AS (SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS rn, "
        "  COUNT(*) OVER () AS n FROM sg), "
        "med AS (SELECT CAST(MAX(CASE WHEN rn = (n-1)//2 + 1 THEN s END) "
        "  + MAX(CASE WHEN rn = n//2 + 1 THEN s END) AS BIGINT) AS m2 "
        "  FROM r) "
        "SELECT CAST(z.j AS BIGINT) AS est_id, z.z, z.z*z.z AS z2, "
        f"CAST(med.m2 AS DOUBLE) / CAST({2 * group} AS DOUBLE) AS f2_est "
        "FROM z, med"
    )


def _isotonic_sql() -> str:
    """SQL twin of train.isotonic_orders: the PAVA fit restated as the
    closed-form minimax max_{i<=k} min_{j>=k} avg(i..j) over per-day
    pooled points — every avg is one CAST/CAST division of exact
    integers; max/min commute with the monotone f64 map."""
    return (
        "WITH o AS (SELECT o_custkey AS ck, "
        "  CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day, "
        "  CAST(FLOOR(ABS(o_totalprice*100.0) + 0.5)*SIGN(o_totalprice) "
        "  AS BIGINT) AS cents FROM orders), "
        "g AS (SELECT ck, day, CAST(COUNT(*) AS BIGINT) AS w, "
        "  CAST(SUM(cents) AS BIGINT) AS s FROM o GROUP BY 1, 2), "
        "p AS MATERIALIZED (SELECT ck, day, w, s, "
        "  ROW_NUMBER() OVER (PARTITION BY ck ORDER BY day) AS k, "
        "  CAST(SUM(w) OVER (PARTITION BY ck ORDER BY day) AS BIGINT) AS pw, "
        "  CAST(SUM(s) OVER (PARTITION BY ck ORDER BY day) AS BIGINT) AS ps "
        "  FROM g), "
        "pairs AS MATERIALIZED (SELECT a.ck, a.k AS i, b.k AS j, "
        "  CAST(b.ps - (a.ps - a.s) AS DOUBLE) "
        "  / CAST(b.pw - (a.pw - a.w) AS DOUBLE) AS avgv "
        "  FROM p a JOIN p b ON b.ck = a.ck AND b.k >= a.k), "
        "mn AS (SELECT pr.ck, pr.i, c.k, MIN(pr.avgv) AS m "
        "  FROM pairs pr JOIN p c ON c.ck = pr.ck AND pr.j >= c.k "
        "  AND pr.i <= c.k GROUP BY 1, 2, 3), "
        "fit AS (SELECT ck, k, MAX(m) AS fitv FROM mn GROUP BY 1, 2) "
        "SELECT p.ck AS o_custkey, p.day, p.w AS n_orders, "
        "p.s AS sum_cents, ROUND(fit.fitv, 6) AS fit_r "
        "FROM p JOIN fit ON fit.ck = p.ck AND fit.k = p.k"
    )


def _naive_bayes_sql(n_features: int = 4096, scale: int = 1024) -> str:
    """SQL twin of textstages.naive_bayes_lang: identical hashed
    uni+bigram occurrences (the _dsir_sql featurizer), exact integer
    model counts, every log quantized to floor(ln(p)·scale + 0.5) as
    BIGINT before any sum (lm_perplexity recipe), and the engine's
    dense-matrix score decomposed as pq + q0·nt + Σ cnt·(q − q0) over
    model pairs only (algebraically identical integers). argmax ties
    break on ascending lang both sides."""
    toks = (
        "SELECT doc_id, lang, unnest(list_concat(lf, "
        "list_transform(generate_series(1, len(lf) - 1), "
        "i -> lf[i] || ' ' || lf[i + 1]))) AS tok "
        "FROM (SELECT doc_id, lang, "
        "list_filter(string_split(text, ' '), w -> w <> '') AS lf "
        "FROM documents)"
    )
    hashed_inner = _sg.chain(
        toks,
        [("_f", _sg.fnv1a64_expr("tok")),
         *_sg.splitmix64_steps("_f", "_h", "nb")])
    sc = f"CAST({scale} AS DOUBLE)"
    half = "CAST(0.5 AS DOUBLE)"
    return (
        f"WITH hashed AS MATERIALIZED (SELECT doc_id, lang, "
        f"CAST((_h) & {n_features - 1} AS BIGINT) AS h "
        f"FROM ({hashed_inner})), "
        "mc AS MATERIALIZED (SELECT lang, h, COUNT(*)::BIGINT AS c "
        "FROM hashed GROUP BY 1, 2), "
        "pri AS (SELECT lang, COUNT(*)::BIGINT AS nd "
        "FROM documents GROUP BY 1), "
        "ndt AS (SELECT CAST(SUM(nd) AS DOUBLE) AS n FROM pri), "
        "lt AS (SELECT p.lang, COALESCE(m.cl, 0)::BIGINT AS cl, p.nd "
        "FROM pri p LEFT JOIN (SELECT lang, SUM(c)::BIGINT AS cl "
        "FROM mc GROUP BY 1) m ON m.lang = p.lang), "
        "lq AS MATERIALIZED (SELECT lang, cl, "
        "CAST(FLOOR(ln(CAST(1 AS DOUBLE) / "
        f"CAST(cl + {n_features} AS DOUBLE)) * {sc} + {half}) AS BIGINT) "
        "AS q0, "
        f"CAST(FLOOR(ln(CAST(nd AS DOUBLE) / ndt.n) * {sc} + {half}) "
        "AS BIGINT) AS pq FROM lt, ndt), "
        "q AS (SELECT m.lang, m.h, "
        "CAST(FLOOR(ln(CAST(m.c + 1 AS DOUBLE) / "
        f"CAST(l.cl + {n_features} AS DOUBLE)) * {sc} + {half}) AS BIGINT) "
        "AS qv FROM mc m JOIN lq l USING (lang)), "
        "df AS MATERIALIZED (SELECT doc_id, h, COUNT(*)::BIGINT AS cnt "
        "FROM hashed GROUP BY 1, 2), "
        "nt AS (SELECT doc_id, SUM(cnt)::BIGINT AS nt FROM df GROUP BY 1), "
        "delta AS (SELECT d.doc_id, q.lang, "
        "SUM(d.cnt * (q.qv - l.q0))::BIGINT AS dl "
        "FROM df d JOIN q ON q.h = d.h JOIN lq l ON l.lang = q.lang "
        "GROUP BY 1, 2), "
        "sc AS (SELECT dd.doc_id, dd.lang AS true_lang, l.lang, "
        "l.pq + l.q0 * COALESCE(n.nt, 0) + COALESCE(x.dl, 0) AS s, "
        "COALESCE(n.nt, 0) AS nf "
        "FROM documents dd CROSS JOIN lq l "
        "LEFT JOIN nt n ON n.doc_id = dd.doc_id "
        "LEFT JOIN delta x ON x.doc_id = dd.doc_id AND x.lang = l.lang) "
        "SELECT doc_id, true_lang, lang AS pred_lang, "
        "CAST(s AS BIGINT) AS score_q, CAST(nf AS BIGINT) AS n_feats "
        "FROM sc QUALIFY ROW_NUMBER() OVER "
        "(PARTITION BY doc_id ORDER BY s DESC, lang) = 1"
    )


def _gini_sql() -> str:
    """SQL twin of agg.gini_by_nation: exact integer cents, LEFT-join
    zero-revenue customers, ranks from the same (cents, ck) sort, and
    the rank-covariance Gini as one BIGINT expression divided once."""
    return (
        "WITH rev AS (SELECT o_custkey AS ck, "
        "CAST(SUM(CAST(FLOOR(ABS(o_totalprice*100.0) + 0.5)"
        "*SIGN(o_totalprice) AS BIGINT)) AS BIGINT) AS s FROM orders "
        "GROUP BY 1), "
        "x AS (SELECT c.c_nationkey AS nk, c.c_custkey AS ck, "
        "COALESCE(r.s, 0)::BIGINT AS cents "
        "FROM customer c LEFT JOIN rev r ON r.ck = c.c_custkey), "
        "rk AS (SELECT nk, cents, ROW_NUMBER() OVER "
        "(PARTITION BY nk ORDER BY cents, ck) AS i FROM x), "
        "g AS (SELECT nk, COUNT(*)::BIGINT AS n, SUM(cents)::BIGINT AS s, "
        "SUM(i * cents)::BIGINT AS w FROM rk GROUP BY nk) "
        "SELECT CAST(nk AS BIGINT) AS n_nationkey, n AS n_cust, s AS sum_cents, "
        "ROUND(CASE WHEN s = 0 THEN CAST(0 AS DOUBLE) "
        "ELSE CAST(2*w - (n+1)*s AS DOUBLE) / CAST(n*s AS DOUBLE) END, 9) "
        "AS gini_r FROM g"
    )


def _seasonal_decomp_sql() -> str:
    """SQL twin of streaming.seasonal_decomp_orders: zero-filled daily
    series via a lateral range(), 7-wide window sum restricted to full
    windows, two-middle doubled medians per phase, and the same scaled
    integers (trend7/seas14/resid14) divided once for the ratios."""
    return (
        "WITH dd AS (SELECT CAST(epoch_us(o_orderdate) // 86400000000 "
        "AS BIGINT) AS day FROM orders), "
        "cnt AS (SELECT day, COUNT(*)::BIGINT AS c FROM dd GROUP BY 1), "
        "b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM cnt), "
        "g AS (SELECT unnest(generate_series(b.d0, b.d1)) AS day FROM b), "
        "f AS MATERIALIZED (SELECT g.day, COALESCE(c.c, 0)::BIGINT "
        "AS c FROM g LEFT JOIN cnt c ON c.day = g.day), "
        "w AS (SELECT day, c, CAST(SUM(c) OVER win AS BIGINT) AS t7, "
        "COUNT(*) OVER win AS nw FROM f WINDOW win AS "
        "(ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)), "
        "i AS MATERIALIZED (SELECT day, c, t7, 7*c - t7 AS det7, "
        "day % 7 AS dow FROM w WHERE nw = 7), "
        "r AS (SELECT dow, det7, ROW_NUMBER() OVER "
        "(PARTITION BY dow ORDER BY det7) AS rn, "
        "COUNT(*) OVER (PARTITION BY dow) AS m FROM i), "
        "s AS (SELECT dow, CAST(MAX(CASE WHEN rn = (m-1)//2 + 1 "
        "THEN det7 END) + MAX(CASE WHEN rn = m//2 + 1 THEN det7 END) "
        "AS BIGINT) AS s14 FROM r GROUP BY dow) "
        "SELECT i.day, i.c AS n_orders, CAST(i.dow AS BIGINT) AS dow, "
        "i.t7 AS trend7, s.s14 AS seas14, "
        "CAST(14*i.c - 2*i.t7 - s.s14 AS BIGINT) AS resid14, "
        "ROUND(CAST(i.t7 AS DOUBLE) / CAST(7 AS DOUBLE), 6) AS trend_r, "
        "ROUND(CAST(s.s14 AS DOUBLE) / CAST(14 AS DOUBLE), 6) AS seas_r, "
        "ROUND(CAST(14*i.c - 2*i.t7 - s.s14 AS DOUBLE) / "
        "CAST(14 AS DOUBLE), 6) AS resid_r "
        "FROM i JOIN s USING (dow)"
    )


def _dp_simplify_sql(tol_udeg: int = 20_000_000, rounds: int = 24) -> str:
    """SQL twin of streaming.simplify_trajectories: identical splitmix
    integer geocode, then ``rounds`` unrolled BFS split rounds — per
    round each active segment picks its max-|cross| interior point
    (ties → min k) and splits iff cross² > tol²·len2 in HUGEINT. The
    keep-set is the endpoints plus every split point (DFS == BFS)."""
    tol2 = int(tol_udeg) ** 2
    xor_c = 0x9E3779B97F4A7C15
    inner = _sg.chain(
        "SELECT event_id, ts, user_id FROM events",
        [("_e", _sg.i64_to_u64("event_id")),
         *_sg.splitmix64_steps("_e", "_h1", "dpa"),
         ("_x1", _sg.u64_xor("_h1", str(xor_c))),
         *_sg.splitmix64_steps("_x1", "_h2", "dpb")])
    parts = [
        "WITH p AS MATERIALIZED (SELECT CAST(user_id AS BIGINT) AS u, "
        "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS i, "
        "CAST(_h2 % 360000001 AS BIGINT) - 180000000 AS x, "
        "CAST(_h1 % 180000001 AS BIGINT) - 90000000 AS y "
        f"FROM ({inner})), "
        "nn AS (SELECT u, COUNT(*)::BIGINT AS n FROM p GROUP BY 1), "
        "s0 AS (SELECT u, CAST(1 AS BIGINT) AS i, n AS j FROM nn "
        "WHERE n >= 2)"]
    kept_units = ["SELECT u, CAST(1 AS BIGINT) AS i FROM nn",
                  "SELECT u, n AS i FROM nn WHERE n > 1"]
    for t in range(1, rounds + 1):
        prev = f"s{t - 1}"
        parts.append(
            f"b{t} AS MATERIALIZED (SELECT u, i, j, k, len2, m FROM ("
            "SELECT s.u, s.i, s.j, q.i AS k, "
            "(pb.x - pa.x)*(pb.x - pa.x) + (pb.y - pa.y)*(pb.y - pa.y) "
            "AS len2, "
            "CASE WHEN (pb.x - pa.x)*(pb.x - pa.x) + "
            "(pb.y - pa.y)*(pb.y - pa.y) = 0 "
            "THEN CAST((q.x - pa.x)*(q.x - pa.x) + "
            "(q.y - pa.y)*(q.y - pa.y) AS HUGEINT) "
            "ELSE CAST((pb.x - pa.x)*(q.y - pa.y) - "
            "(pb.y - pa.y)*(q.x - pa.x) AS HUGEINT) * "
            "CAST((pb.x - pa.x)*(q.y - pa.y) - "
            "(pb.y - pa.y)*(q.x - pa.x) AS HUGEINT) END AS m "
            f"FROM {prev} s "
            "JOIN p pa ON pa.u = s.u AND pa.i = s.i "
            "JOIN p pb ON pb.u = s.u AND pb.i = s.j "
            "JOIN p q ON q.u = s.u AND q.i > s.i AND q.i < s.j) "
            "QUALIFY ROW_NUMBER() OVER (PARTITION BY u, i, j "
            "ORDER BY m DESC, k) = 1)")
        parts.append(
            f"w{t} AS MATERIALIZED (SELECT u, i, j, k FROM b{t} "
            f"WHERE CASE WHEN len2 = 0 THEN m > {tol2} "
            f"ELSE m > CAST({tol2} AS HUGEINT) * len2 END)")
        parts.append(
            f"s{t} AS (SELECT u, i, k AS j FROM w{t} "
            f"UNION ALL SELECT u, k AS i, j FROM w{t})")
        kept_units.append(f"SELECT u, k AS i FROM w{t}")
    kept = " UNION ALL ".join(kept_units)
    return (
        ", ".join(parts)
        + f", kept AS ({kept}) "
        "SELECT p.u AS user_id, p.i AS idx, p.x AS lon_udeg, "
        "p.y AS lat_udeg FROM p JOIN kept ON kept.u = p.u "
        "AND kept.i = p.i"
    )


def _nb_confusion_sql() -> str:
    """SQL twin of textstages.classification_report over the
    naive-Bayes predictions: exact integer confusion counts, and each
    metric ONE CAST/CAST division (F1 = 2·tp/(n_pred + n_true))."""
    nb = _naive_bayes_sql()
    return (
        f"WITH m AS MATERIALIZED (SELECT true_lang, pred_lang FROM ({nb})), "
        "ct AS (SELECT true_lang AS t, pred_lang AS p, COUNT(*)::BIGINT "
        "AS c FROM m GROUP BY 1, 2), "
        "cls AS (SELECT DISTINCT lang FROM documents), "
        "tl AS (SELECT t AS lang, SUM(c)::BIGINT AS n_true FROM ct "
        "GROUP BY 1), "
        "pl AS (SELECT p AS lang, SUM(c)::BIGINT AS n_pred FROM ct "
        "GROUP BY 1), "
        "dg AS (SELECT t AS lang, SUM(c)::BIGINT AS tp FROM ct "
        "WHERE t = p GROUP BY 1) "
        "SELECT cls.lang, COALESCE(tl.n_true, 0)::BIGINT AS n_true, "
        "COALESCE(pl.n_pred, 0)::BIGINT AS n_pred, "
        "COALESCE(dg.tp, 0)::BIGINT AS tp, "
        "ROUND(CASE WHEN COALESCE(pl.n_pred, 0) = 0 THEN CAST(0 AS DOUBLE) "
        "ELSE CAST(COALESCE(dg.tp, 0) AS DOUBLE) / CAST(pl.n_pred AS DOUBLE) "
        "END, 6) AS prec_r, "
        "ROUND(CAST(COALESCE(dg.tp, 0) AS DOUBLE) / "
        "CAST(tl.n_true AS DOUBLE), 6) AS rec_r, "
        "ROUND(CAST(2 * COALESCE(dg.tp, 0) AS DOUBLE) / "
        "CAST(COALESCE(pl.n_pred, 0) + tl.n_true AS DOUBLE), 6) AS f1_r "
        "FROM cls LEFT JOIN tl USING (lang) LEFT JOIN pl USING (lang) "
        "LEFT JOIN dg USING (lang)"
    )


def _sssp_sql(rounds: int = 8, out_links: int = 4,
              host_mod: int = 1000) -> str:
    """SQL twin of graph.sssp_hosts: the identical fixed-round weighted
    min-plus relaxation unrolled, edge weights from the same u64 chain
    w = 1 + splitmix(splitmix(a) xor b) % 9, INF = 2^40."""
    inf = 1 << 40
    lk_base = (
        "SELECT CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) AS src, "
        "url || '#out' || CAST(kr.range AS VARCHAR) AS tok "
        f"FROM pages, range(0, {out_links}) kr"
    )
    lk_inner = _sg.chain(
        lk_base,
        [("_f", _sg.fnv1a64_expr("tok")),
         *_sg.splitmix64_steps("_f", "_h", "sp")])
    w_inner = _sg.chain(
        "SELECT a, b FROM ua",
        [("_ua", _sg.i64_to_u64("a")),
         *_sg.splitmix64_steps("_ua", "_s1", "swa"),
         ("_xw", _sg.u64_xor("_s1", _sg.i64_to_u64("b"))),
         *_sg.splitmix64_steps("_xw", "_s2", "swb")])
    ctes = [
        f"lk AS MATERIALIZED (SELECT src, CAST(_h % {host_mod} AS BIGINT) AS dst "
        f"FROM ({lk_inner}))",
        "ua AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM lk WHERE src <> dst)",
        "we AS MATERIALIZED (SELECT a, b, "
        f"CAST(1 + (_s2 % 9) AS BIGINT) AS w FROM ({w_inner}))",
        "adj AS MATERIALIZED (SELECT a AS v, b AS u, w FROM we "
        "UNION ALL SELECT b AS v, a AS u, w FROM we)",
        "nodes AS MATERIALIZED (SELECT DISTINCT v AS node FROM adj)",
        "d0 AS MATERIALIZED (SELECT node, CASE WHEN node = "
        "(SELECT MIN(node) FROM nodes) THEN CAST(0 AS BIGINT) "
        f"ELSE CAST({inf} AS BIGINT) END AS q FROM nodes)",
    ]
    for t in range(1, rounds + 1):
        ctes.append(
            f"d{t} AS MATERIALIZED (SELECT node, MIN(q) AS q FROM ("
            f"SELECT node, q FROM d{t - 1} "
            f"UNION ALL SELECT adj.v AS node, d.q + adj.w AS q "
            f"FROM adj JOIN d{t - 1} d ON d.node = adj.u) GROUP BY node)")
    return (
        f"WITH {pages_sql()}, " + ", ".join(ctes) + " "
        "SELECT CAST(node AS BIGINT) AS host, "
        f"CAST(CASE WHEN q >= {inf} THEN -1 ELSE q END AS BIGINT) AS dist "
        f"FROM d{rounds}"
    )


def _kde_grid_sql(cs: float = 4.0, radius: int = 3, sigma: float = 1.5,
                  scale: int = 64) -> str:
    """SQL twin of cellindex.kde_heat_grid: geocode chain, the same
    integer per-axis kernel table inlined as VALUES (computed once in
    Python — no libm in SQL), offset scatter via two VALUES cross
    joins, exact integer sums."""
    import numpy as _np

    from . import sqlgen as _sg

    qk = _np.floor(_np.exp(-(_np.arange(radius + 1, dtype=_np.float64)
                             ** 2) / (2.0 * sigma * sigma))
                   * scale + 0.5).astype(_np.int64)
    offs = ", ".join(f"({d}, {int(qk[abs(d)])})"
                     for d in range(-radius, radius + 1))
    inner = _sg.chain(f"WITH {pages_sql()} SELECT url FROM pages",
                      _sg.geocode_steps("url"))
    csd = f"CAST({cs!r} AS DOUBLE)"
    return (
        f"WITH pts AS (SELECT "
        f"CAST(FLOOR((lon + CAST(180 AS DOUBLE)) / {csd}) AS BIGINT) AS gi, "
        f"CAST(FLOOR((lat + CAST(90 AS DOUBLE)) / {csd}) AS BIGINT) AS gj "
        f"FROM ({inner})), "
        "c AS MATERIALIZED (SELECT gi, gj, COUNT(*)::BIGINT AS c "
        "FROM pts GROUP BY 1, 2), "
        f"off(d, q) AS (VALUES {offs}) "
        "SELECT c.gi + ox.d AS gi, c.gj + oy.d AS gj, "
        "CAST(SUM(CASE WHEN ox.d = 0 AND oy.d = 0 THEN c.c ELSE 0 END) "
        "AS BIGINT) AS cnt, "
        "CAST(SUM(ox.q * oy.q * c.c) AS BIGINT) AS dens_q "
        "FROM c, off ox, off oy GROUP BY 1, 2"
    )


def _benford_sql() -> str:
    """SQL twin of agg.benford_digits: string first digit of exact
    cents, the engine's nine np.log10 f64 constants inlined as repr
    literals, and each float the same multiply-then-divide chain."""
    import numpy as _np

    p = _np.log10(1.0 + 1.0 / _np.arange(1, 10, dtype=_np.float64))
    pv = ", ".join(f"({d}, CAST({p[d - 1]!r} AS DOUBLE))"
                   for d in range(1, 10))
    return (
        "WITH cents AS (SELECT CAST(FLOOR(ABS(o_totalprice*100.0) + 0.5)"
        "*SIGN(o_totalprice) AS BIGINT) AS c FROM orders), "
        "fd AS (SELECT CAST(SUBSTR(CAST(c AS VARCHAR), 1, 1) AS BIGINT) "
        "AS digit FROM cents), "
        "o AS (SELECT digit, COUNT(*)::BIGINT AS obs FROM fd GROUP BY 1), "
        "n AS (SELECT CAST(SUM(obs) AS DOUBLE) AS n FROM o), "
        f"pt(digit, p) AS (VALUES {pv}) "
        "SELECT o.digit, o.obs, ROUND(n.n * pt.p, 6) AS exp_r, "
        "ROUND(CAST(o.obs AS DOUBLE) / (n.n * pt.p), 6) AS dev_r "
        "FROM o JOIN pt USING (digit), n"
    )


def _kappa_sql() -> str:
    """SQL twin of textstages.cohens_kappa over the naive-Bayes
    predictions: κ = (N·agree − Σ nt·np)/(N² − Σ nt·np), one division
    of exact BIGINTs."""
    nb = _naive_bayes_sql()
    return (
        f"WITH m AS MATERIALIZED (SELECT true_lang, pred_lang FROM ({nb})), "
        "n AS (SELECT COUNT(*)::BIGINT AS n, "
        "SUM(CASE WHEN true_lang = pred_lang THEN 1 ELSE 0 END)::BIGINT "
        "AS agree FROM m), "
        "tl AS (SELECT true_lang AS lang, COUNT(*)::BIGINT AS nt FROM m "
        "GROUP BY 1), "
        "pl AS (SELECT pred_lang AS lang, COUNT(*)::BIGINT AS np FROM m "
        "GROUP BY 1), "
        "pe AS (SELECT COALESCE(SUM(tl.nt * pl.np), 0)::BIGINT AS pe_num "
        "FROM tl JOIN pl USING (lang)) "
        "SELECT n.n AS n_docs, n.agree, pe.pe_num, "
        "ROUND(CASE WHEN n.n * n.n - pe.pe_num = 0 THEN CAST(0 AS DOUBLE) "
        "ELSE CAST(n.n * n.agree - pe.pe_num AS DOUBLE) "
        "/ CAST(n.n * n.n - pe.pe_num AS DOUBLE) END, 6) AS kappa_r "
        "FROM n, pe"
    )


def _label_centroid_sql(quant_bits: int = 20, dim: int = 64) -> str:
    """SQL twin of knn.label_centroid_cosine: exact f64 element sums,
    one mean division, floor(m·2^bits + 0.5) integer quantization, and
    the identical dot/(sqrt(na)·sqrt(nb)) chain."""
    sc = f"CAST({1 << quant_bits} AS DOUBLE)"
    return (
        "WITH se AS MATERIALIZED (SELECT CAST(label AS BIGINT) AS label, "
        f"unnest(range(1, {dim + 1})) AS j, embedding AS emb "
        "FROM embeddings), "
        "s AS (SELECT label, CAST(j AS BIGINT) AS j, "
        "SUM(CAST(emb[j] AS DOUBLE)) AS s FROM se GROUP BY 1, 2), "
        "n AS (SELECT CAST(label AS BIGINT) AS label, "
        "COUNT(*)::BIGINT AS n FROM embeddings GROUP BY 1), "
        "q AS MATERIALIZED (SELECT s.label, s.j, "
        f"CAST(FLOOR((s.s / CAST(n.n AS DOUBLE)) * {sc} "
        "+ CAST(0.5 AS DOUBLE)) AS BIGINT) AS q "
        "FROM s JOIN n USING (label)), "
        "nm AS (SELECT label, SUM(q * q)::BIGINT AS nq FROM q GROUP BY 1), "
        "d AS (SELECT a.label AS label_a, b.label AS label_b, "
        "SUM(a.q * b.q)::BIGINT AS dot_q FROM q a "
        "JOIN q b ON b.j = a.j AND b.label > a.label GROUP BY 1, 2) "
        "SELECT d.label_a, d.label_b, na.n AS n_a, nb.n AS n_b, d.dot_q, "
        "ROUND(CASE WHEN ma.nq = 0 OR mb.nq = 0 THEN CAST(0 AS DOUBLE) "
        "ELSE CAST(d.dot_q AS DOUBLE) / (SQRT(CAST(ma.nq AS DOUBLE)) * "
        "SQRT(CAST(mb.nq AS DOUBLE))) END, 6) AS cos_r "
        "FROM d JOIN n na ON na.label = d.label_a "
        "JOIN n nb ON nb.label = d.label_b "
        "JOIN nm ma ON ma.label = d.label_a "
        "JOIN nm mb ON mb.label = d.label_b"
    )


def _assoc_rules_sql(min_support: int = 2) -> str:
    """SQL twin of streaming.assoc_rules_events: distinct baskets,
    exact integer counts, conf one division, lift the identical
    two-product chain."""
    return (
        "WITH ut AS MATERIALIZED (SELECT DISTINCT user_id, event_type "
        "FROM events), "
        "nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n "
        "FROM ut), "
        "s AS (SELECT event_type, COUNT(*)::BIGINT AS c FROM ut "
        "GROUP BY 1), "
        "p AS (SELECT a.event_type AS x, b.event_type AS y, "
        "COUNT(*)::BIGINT AS cxy FROM ut a JOIN ut b "
        "ON b.user_id = a.user_id AND b.event_type <> a.event_type "
        f"GROUP BY 1, 2 HAVING COUNT(*) >= {min_support}) "
        "SELECT p.x, p.y, p.cxy AS n_xy, sx.c AS n_x, sy.c AS n_y, "
        "ROUND(CAST(p.cxy AS DOUBLE) / CAST(sx.c AS DOUBLE), 6) "
        "AS conf_r, "
        "ROUND((CAST(p.cxy AS DOUBLE) * nu.n) / "
        "(CAST(sx.c AS DOUBLE) * CAST(sy.c AS DOUBLE)), 6) AS lift_r "
        "FROM p JOIN s sx ON sx.event_type = p.x "
        "JOIN s sy ON sy.event_type = p.y, nu"
    )


def _markov_stationary_sql(iters: int = 16) -> str:
    """SQL twin of streaming.markov_stationary_events: LAG transition
    counts (ts, event_id order), then ``iters`` unrolled MATERIALIZED
    Q30 integer rounds — floor division both sides, no teleport."""
    q30 = 1 << 30
    ctes = [
        "pr AS (SELECT LAG(event_type) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS a, "
        "event_type AS b FROM events)",
        "cm AS MATERIALIZED (SELECT a, b, COUNT(*)::BIGINT AS c FROM pr "
        "WHERE a IS NOT NULL GROUP BY 1, 2)",
        "states AS MATERIALIZED (SELECT a AS s FROM cm "
        "UNION SELECT b FROM cm)",
        "ns AS (SELECT COUNT(*)::BIGINT AS s FROM states)",
        "tot AS (SELECT a, SUM(c)::BIGINT AS t FROM cm GROUP BY 1)",
        f"r0 AS MATERIALIZED (SELECT states.s AS state, "
f"CAST({q30} // ns.s AS BIGINT) AS r FROM states, ns)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"r{t} AS MATERIALIZED (SELECT st.s AS state, "
            "COALESCE(x.v, 0)::BIGINT AS r FROM states st LEFT JOIN ("
            "SELECT cm.b AS state, SUM((r.r * cm.c) // tot.t)::BIGINT AS v "
            f"FROM cm JOIN r{t - 1} r ON r.state = cm.a "
            "JOIN tot ON tot.a = cm.a GROUP BY cm.b) x ON x.state = st.s)")
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT state AS event_type, r AS pi_q, "
        f"ROUND(CAST(r AS DOUBLE) / CAST({q30} AS DOUBLE), 9) AS pi_r "
        f"FROM r{iters}"
    )


def _twap_sql() -> str:
    """SQL twin of streaming.twap_events: LEAD holding intervals within
    (type, day), exact integer cents·µs sums, the identical
    divide-then-divide chain."""
    return (
        "WITH e AS (SELECT event_type, "
        "CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, "
        "epoch_us(ts) AS u, event_id, "
        "CAST(FLOOR(ABS(value*100.0) + 0.5)*SIGN(value) AS BIGINT) AS q "
        "FROM events), "
        "w AS (SELECT event_type, day, q, "
        "LEAD(u) OVER (PARTITION BY event_type, day "
        "ORDER BY u, event_id) - u AS dt FROM e), "
        "f AS (SELECT * FROM w WHERE dt IS NOT NULL) "
        "SELECT event_type, day, COUNT(*)::BIGINT AS n_obs, "
        "SUM(dt)::BIGINT AS sum_dt, SUM(q*dt)::BIGINT AS sum_wq, "
        "ROUND((CAST(SUM(q*dt) AS DOUBLE) / CAST(SUM(dt) AS DOUBLE)) "
        "/ CAST(100 AS DOUBLE), 6) AS twap_r "
        "FROM f GROUP BY 1, 2"
    )


def _rolling_zscore_sql(window: int = 8, thresh_sq: int = 9) -> str:
    """SQL twin of streaming.rolling_zscore_events: trailing window
    sums via ROWS BETWEEN, the identical scaled-integer 3σ test."""
    return (
        "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS u, "
        "CAST(FLOOR(ABS(value*100.0) + 0.5)*SIGN(value) AS BIGINT) AS q "
        "FROM events), "
        "w AS (SELECT event_id, user_id, q, "
        "SUM(q) OVER win AS s, SUM(q*q) OVER win AS s2, "
        "COUNT(*) OVER win AS m FROM e WINDOW win AS "
        "(PARTITION BY user_id ORDER BY u, event_id "
        f"ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING)) "
        "SELECT event_id, CAST(user_id AS BIGINT) AS user_id, q, "
        "CAST(s AS BIGINT) AS win_s, CAST(s2 AS BIGINT) AS win_s2, "
        f"CAST(CASE WHEN ({window}*q - s)*({window}*q - s) > "
        f"{thresh_sq}*({window}*s2 - s*s) THEN 1 ELSE 0 END AS BIGINT) "
        f"AS is_anom FROM w WHERE m = {window}"
    )


def _rfm_sql() -> str:
    """SQL twin of agg.rfm_customers: per-customer metrics, ROW_NUMBER
    ranks on (metric, ck), explicit tile = (rn−1)·5 // n + 1."""
    return (
        "WITH m AS MATERIALIZED (SELECT o_custkey AS ck, "
        "CAST(MAX(epoch_us(o_orderdate) // 86400000000) AS BIGINT) "
        "AS last_day, COUNT(*)::BIGINT AS n_orders, "
        "CAST(SUM(CAST(FLOOR(ABS(o_totalprice*100.0) + 0.5)"
        "*SIGN(o_totalprice) AS BIGINT)) AS BIGINT) AS cents "
        "FROM orders GROUP BY 1), "
        "n AS (SELECT COUNT(*)::BIGINT AS n FROM m), "
        "r AS (SELECT m.*, "
        "ROW_NUMBER() OVER (ORDER BY last_day, ck) AS rr, "
        "ROW_NUMBER() OVER (ORDER BY n_orders, ck) AS rf, "
        "ROW_NUMBER() OVER (ORDER BY cents, ck) AS rm FROM m) "
        "SELECT ck AS o_custkey, last_day, n_orders, cents, "
        "CAST((rr - 1) * 5 // n.n + 1 AS BIGINT) AS r_tile, "
        "CAST((rf - 1) * 5 // n.n + 1 AS BIGINT) AS f_tile, "
        "CAST((rm - 1) * 5 // n.n + 1 AS BIGINT) AS m_tile, "
        "CAST(100 * ((rr - 1) * 5 // n.n + 1) "
        "+ 10 * ((rf - 1) * 5 // n.n + 1) "
        "+ ((rm - 1) * 5 // n.n + 1) AS BIGINT) AS rfm_code "
        "FROM r, n"
    )


def _emerging_hotspots_sql(cs: float = 10.0) -> str:
    """SQL twin of cellindex.emerging_hotspots: geocode chain, cell ×
    hour counts, hour-strict Mann-Kendall with the value-tie variance
    correction and the identical div → sqrt → div z chain."""
    from . import sqlgen as _sg

    inner = _sg.chain(f"WITH {pages_sql()} SELECT url, warc_ts FROM pages",
                      _sg.geocode_steps("url"))
    csd = f"CAST({cs!r} AS DOUBLE)"
    return (
        f"WITH pts AS (SELECT "
        f"CAST(FLOOR((lon + CAST(180 AS DOUBLE)) / {csd}) AS BIGINT) AS ci, "
        f"CAST(FLOOR((lat + CAST(90 AS DOUBLE)) / {csd}) AS BIGINT) AS cj, "
        "CAST(epoch_us(warc_ts) // 3600000000 AS BIGINT) AS hour "
        f"FROM ({inner})), "
        "a AS MATERIALIZED (SELECT ci, cj, hour, COUNT(*)::BIGINT AS cnt "
        "FROM pts GROUP BY 1, 2, 3), "
        "s AS MATERIALIZED (SELECT x.ci, x.cj, CAST(SUM(CASE "
        "WHEN y.cnt > x.cnt THEN 1 WHEN y.cnt < x.cnt THEN -1 ELSE 0 END) "
        "AS BIGINT) AS s FROM a x JOIN a y ON y.ci = x.ci AND y.cj = x.cj "
        "AND x.hour < y.hour GROUP BY 1, 2), "
        "n AS (SELECT ci, cj, COUNT(*)::BIGINT AS n, "
        "CAST(SUM(cnt) AS BIGINT) AS total FROM a GROUP BY 1, 2), "
        "t AS (SELECT ci, cj, CAST(SUM(c*(c-1)*(2*c+5)) AS BIGINT) AS tt "
        "FROM (SELECT ci, cj, cnt, COUNT(*)::BIGINT AS c FROM a "
        "GROUP BY 1, 2, 3) GROUP BY 1, 2) "
        "SELECT n.ci, n.cj, n.n AS n_hours, n.total, "
        "CAST(COALESCE(s.s, 0) AS BIGINT) AS s_stat, "
        "n.n*(n.n-1)*(2*n.n+5) - t.tt AS var18, "
        "ROUND(CASE WHEN COALESCE(s.s, 0) = 0 "
        "OR n.n*(n.n-1)*(2*n.n+5) - t.tt <= 0 THEN CAST(0 AS DOUBLE) "
        "ELSE CAST(s.s - SIGN(s.s) AS DOUBLE) "
        "/ SQRT(CAST(n.n*(n.n-1)*(2*n.n+5) - t.tt AS DOUBLE) "
        "/ CAST(18 AS DOUBLE)) END, 6) AS mk_z_r "
        "FROM n JOIN t ON t.ci = n.ci AND t.cj = n.cj "
        "LEFT JOIN s ON s.ci = n.ci AND s.cj = n.cj"
    )


def _media_phash_sql(scale: int = 1024) -> str:
    """SQL twin of multimodal.phash_dedup_stage over the GLRM fixture:
    8×8 payload bytes (text ASCII), the engine's integer DCT basis
    inlined as VALUES, exact coefficient sums, two-middle doubled AC
    median, bit j−1 = 2·c > m2."""
    from ..stages.multimodal import _dct_basis

    B = _dct_basis(scale)
    bvals = ", ".join(f"({u}, {x}, {int(B[u, x])})"
                      for u in range(8) for x in range(8))
    return (
        "WITH px AS MATERIALIZED (SELECT doc_id AS media_id, "
        "CAST(g.range AS BIGINT) AS j, "
        "CAST(CASE WHEN length(text) >= g.range + 1 THEN "
        "ord(substr(text, CAST(g.range + 1 AS INT), 1)) ELSE 0 END "
        "AS BIGINT) AS v FROM documents, range(0, 64) g), "
        f"b(u, x, bv) AS (VALUES {bvals}), "
        "c AS MATERIALIZED (SELECT px.media_id, bu.u AS u, bv2.u AS v, "
        "SUM(bu.bv * bv2.bv * px.v)::BIGINT AS c FROM px "
        "JOIN b bu ON bu.x = px.j // 8 "
        "JOIN b bv2 ON bv2.x = px.j % 8 GROUP BY 1, 2, 3), "
        "nz AS MATERIALIZED (SELECT media_id, 8*u + v AS j, c FROM c "
        "WHERE NOT (u = 0 AND v = 0)), "
        "r AS (SELECT media_id, j, c, ROW_NUMBER() OVER "
        "(PARTITION BY media_id ORDER BY c) AS rn, "
        "COUNT(*) OVER (PARTITION BY media_id) AS m FROM nz), "
        "md AS (SELECT media_id, CAST(MAX(CASE WHEN rn = (m-1)//2 + 1 "
        "THEN c END) + MAX(CASE WHEN rn = m//2 + 1 THEN c END) "
        "AS BIGINT) AS m2 FROM r GROUP BY 1), "
        "h AS MATERIALIZED (SELECT nz.media_id, "
        "CAST(SUM(CASE WHEN 2*nz.c > md.m2 THEN "
        "CAST(1 AS BIGINT) << CAST(nz.j - 1 AS INT) "
        "ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS phash "
        "FROM nz JOIN md USING (media_id) GROUP BY 1) "
        "SELECT media_id, phash, "
        "COUNT(*) OVER (PARTITION BY phash)::BIGINT AS n_same FROM h"
    )


def _convex_hull_sql() -> str:
    """SQL twin of cellindex.convex_hull_hosts: identical integer
    microdegree coords and the extreme-point EXISTS/NOT-EXISTS
    predicate."""
    from . import sqlgen as _sg

    inner = _sg.chain(f"WITH {pages_sql()} SELECT url FROM pages",
                      _sg.geocode_steps("url"))
    return (
        f"WITH pts AS MATERIALIZED (SELECT url, "
        "CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) "
        "AS host, "
        "CAST(FLOOR(ABS(lon*1000000.0) + 0.5)*SIGN(lon) AS BIGINT) AS x, "
        "CAST(FLOOR(ABS(lat*1000000.0) + 0.5)*SIGN(lat) AS BIGINT) AS y "
        f"FROM ({inner})), "
        "nh AS (SELECT host, COUNT(*)::BIGINT AS n FROM pts GROUP BY 1) "
        "SELECT p.url, p.host, p.x, p.y, "
        "CAST(CASE WHEN nh.n = 1 THEN 1 WHEN EXISTS ("
        "SELECT 1 FROM pts q WHERE q.host = p.host AND q.url <> p.url "
        "AND NOT EXISTS (SELECT 1 FROM pts r WHERE r.host = p.host "
        "AND (q.x - p.x)*(r.y - p.y) - (q.y - p.y)*(r.x - p.x) < 0)) "
        "THEN 1 ELSE 0 END AS BIGINT) AS is_hull "
        "FROM pts p JOIN nh ON nh.host = p.host"
    )


def _capped_balance_sql() -> str:
    """SQL twin of streaming.capped_balance_users: the closed-form
    b_t = P_t − min(0, cummin P) with cumulative windows, exact ints."""
    return (
        "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS u, "
        "CASE WHEN event_type = 'purchase' THEN "
        "CAST(FLOOR(ABS(value*100.0) + 0.5)*SIGN(value) AS BIGINT) "
        "ELSE -CAST(FLOOR(ABS(value*100.0) + 0.5)*SIGN(value) AS BIGINT) "
        "END AS delta FROM events), "
        "w AS (SELECT event_id, user_id, u, delta, "
        "CAST(SUM(delta) OVER win AS BIGINT) AS p FROM e WINDOW win AS "
        "(PARTITION BY user_id ORDER BY u, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), "
        "m AS (SELECT event_id, CAST(user_id AS BIGINT) AS user_id, "
        "delta, p AS prefix, "
        "CAST(MIN(p) OVER (PARTITION BY user_id ORDER BY u, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS rm FROM w) "
        "SELECT event_id, user_id, delta, prefix, "
        "CAST(prefix - LEAST(rm, 0) AS BIGINT) AS balance FROM m"
    )


def _psi_drift_sql(n_bins: int = 10) -> str:
    """SQL twin of agg.psi_drift_orders: same integer bins/split, the
    identical 4-op PSI term chain with the exact-int-product ln arg."""
    return (
        "WITH o AS (SELECT "
        "CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day, "
        "CAST(FLOOR(ABS(o_totalprice*100.0) + 0.5)*SIGN(o_totalprice) "
        "AS BIGINT) AS cents FROM orders), "
        "sc AS (SELECT MIN(day) AS d0, MAX(day) AS d1, MAX(cents) AS mc "
        "FROM o), "
        "x AS (SELECT LEAST(CAST("
        f"{n_bins - 1} AS BIGINT), cents * {n_bins} // (sc.mc + 1)) "
        "AS bin, CASE WHEN day >= (sc.d0 + sc.d1 + 1) // 2 THEN 1 "
        "ELSE 0 END AS side FROM o, sc), "
        "t AS (SELECT bin, side, COUNT(*)::BIGINT AS c FROM x "
        "GROUP BY 1, 2), "
        f"bins AS (SELECT unnest(range(0, {n_bins})) AS bin), "
        "w AS (SELECT bins.bin, "
        "COALESCE(a.c, 0)::BIGINT AS n_a, COALESCE(b.c, 0)::BIGINT AS n_b "
        "FROM bins LEFT JOIN t a ON a.bin = bins.bin AND a.side = 0 "
        "LEFT JOIN t b ON b.bin = bins.bin AND b.side = 1), "
        "tot AS (SELECT SUM(n_a)::BIGINT AS ta, SUM(n_b)::BIGINT AS tb "
        "FROM w) "
        "SELECT w.bin, w.n_a, w.n_b, "
        "ROUND(CASE WHEN w.n_a = 0 OR w.n_b = 0 THEN CAST(0 AS DOUBLE) "
        "ELSE (CAST(w.n_a AS DOUBLE) / CAST(tot.ta AS DOUBLE) "
        "- CAST(w.n_b AS DOUBLE) / CAST(tot.tb AS DOUBLE)) "
        "* ln(CAST(w.n_a * tot.tb AS DOUBLE) "
        "/ CAST(w.n_b * tot.ta AS DOUBLE)) END, 6) AS psi_term_r "
        "FROM w, tot"
    )


def _ewma_daily_sql(n_lags: int = 30) -> str:
    """SQL twin of streaming.ewma_daily_orders: dense day spine (acf
    pattern), lag weights 2^-(k+1) inlined as exact dyadic literals —
    every term count*2^-(k+1) is exact, spans <= 22+30 < 53 mantissa
    bits, so SUM order cannot matter."""
    lags = ", ".join(
        f"({k}, CAST({2.0 ** -(k + 1)!r} AS DOUBLE))" for k in range(n_lags))
    return (
        "WITH d AS (SELECT CAST(epoch_us(o_orderdate) // 86400000000 "
        "  AS BIGINT) AS day FROM orders), "
        "c AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS x FROM d GROUP BY day), "
        "r AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d), "
        "s AS MATERIALIZED (SELECT g.day, COALESCE(c.x, 0)::BIGINT AS x "
        "  FROM r, LATERAL (SELECT UNNEST(generate_series(r.d0, r.d1)) "
        "  AS day) g LEFT JOIN c ON c.day = g.day), "
        f"lags(k, w) AS (VALUES {lags}) "
        "SELECT a.day, a.x AS cnt, "
        "SUM(CAST(b.x AS DOUBLE) * l.w) AS ewma "
        "FROM s a JOIN lags l ON TRUE "
        "JOIN s b ON b.day = a.day - l.k "
        "GROUP BY 1, 2"
    )


def _readability_sql() -> str:
    """SQL twin of textstages.readability_docs: identical RE2/re counts,
    the one-division exact-integer FK chain, ROUND on bit-identical f64."""
    return (
        "WITH t AS (SELECT doc_id, "
        "CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS w, "
        "CAST(length(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS s, "
        "CAST(length(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT)"
        " AS v FROM documents), "
        "m AS (SELECT doc_id, w, s, v, GREATEST(w, 1) AS wc, "
        "GREATEST(s, 1) AS sc FROM t) "
        "SELECT doc_id, w AS n_words, s AS n_sents, v AS n_syll, "
        "ROUND(CAST(39*w*wc + 1180*v*sc - 1559*wc*sc AS DOUBLE) "
        "/ CAST(100*wc*sc AS DOUBLE), 4) AS fk_grade_r FROM m"
    )


def _curvature_sql(side: int = 16, quant: float = 8.0,
                   tx_max: int = 15, ty_max: int = 15) -> str:
    """SQL twin of raster.curvature_stage: 8-neighbour conditional-agg
    pivot, exact-integer Zevenbergen-Thorne numerators, ONE division."""
    dirs = ", ".join(f"({dx}, {dy})" for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                     if (dx, dy) != (0, 0))
    piv = {
        "z1": (-1, -1), "z2": (0, -1), "z3": (1, -1), "z4": (-1, 0),
        "z6": (1, 0), "z7": (-1, 1), "z8": (0, 1), "z9": (1, 1)}
    sel = ", ".join(
        f"MAX(CASE WHEN d.dx = {dx} AND d.dy = {dy} THEN n.q END) AS {z}"
        for z, (dx, dy) in piv.items())
    return (
        f"WITH {tiles_sql(side)}, "
        "rc AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) AS q "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        f"dirs(dx, dy) AS (VALUES {dirs}), "
        "nb AS (SELECT c.tile_x, c.tile_y, c.px, c.py, c.q AS z5, "
        f"{sel} FROM rc c, dirs d "
        "JOIN rc n ON n.tile_x = c.tile_x AND n.tile_y = c.tile_y "
        "  AND n.px = c.px + d.dx AND n.py = c.py + d.dy "
        f"WHERE c.px BETWEEN 1 AND {side - 2} "
        f"AND c.py BETWEEN 1 AND {side - 2} "
        "GROUP BY 1, 2, 3, 4, 5), "
        "m AS (SELECT tile_x, tile_y, px, py, "
        "2*(z4+z6) - 4*z5 AS d4, 2*(z2+z8) - 4*z5 AS e4, "
        "-z1+z3+z7-z9 AS f4, z6-z4 AS g2, z2-z8 AS h2 FROM nb) "
        "SELECT CAST(tile_x AS BIGINT) AS tile_x, "
        "CAST(tile_y AS BIGINT) AS tile_y, CAST(px AS BIGINT) AS px, "
        "CAST(py AS BIGINT) AS py, "
        "ROUND(CASE WHEN g2 = 0 AND h2 = 0 THEN CAST(0 AS DOUBLE) ELSE "
        "CAST(-(d4*g2*g2 + e4*h2*h2 + f4*g2*h2) AS DOUBLE) "
        "/ CAST(2*(g2*g2 + h2*h2) AS DOUBLE) END, 9) AS prof_r, "
        "ROUND(CASE WHEN g2 = 0 AND h2 = 0 THEN CAST(0 AS DOUBLE) ELSE "
        "CAST(d4*h2*h2 + e4*g2*g2 - f4*g2*h2 AS DOUBLE) "
        "/ CAST(2*(g2*g2 + h2*h2) AS DOUBLE) END, 9) AS plan_r FROM m"
    )


def _lbp_sql(side: int = 16, tx_max: int = 15, ty_max: int = 15) -> str:
    """SQL twin of raster.lbp_stage: LBP_DIRS weights 2^k, >= compare on
    the identical f64 pixel values, per-tile code histogram."""
    from ..stages.raster import LBP_DIRS

    dirs = ", ".join(f"({dx}, {dy}, {1 << k})"
                     for k, (dx, dy) in enumerate(LBP_DIRS))
    return (
        f"WITH {tiles_sql(side)}, "
        "rc AS MATERIALIZED (SELECT tile_x, tile_y, px, py, vd "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        f"dirs(dx, dy, w) AS (VALUES {dirs}), "
        "cd AS (SELECT c.tile_x, c.tile_y, c.px, c.py, "
        "CAST(SUM(CASE WHEN n.vd >= c.vd THEN d.w ELSE 0 END) AS BIGINT) "
        "AS code FROM rc c, dirs d "
        "JOIN rc n ON n.tile_x = c.tile_x AND n.tile_y = c.tile_y "
        "  AND n.px = c.px + d.dx AND n.py = c.py + d.dy "
        f"WHERE c.px BETWEEN 1 AND {side - 2} "
        f"AND c.py BETWEEN 1 AND {side - 2} "
        "GROUP BY 1, 2, 3, 4) "
        "SELECT CAST(tile_x AS BIGINT) AS tile_x, "
        "CAST(tile_y AS BIGINT) AS tile_y, code, "
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM cd GROUP BY 1, 2, 3"
    )


def _survival_gaps_sql() -> str:
    """SQL twin of streaming.survival_gaps_users: LEAD gaps + censored
    tails, minute floor, suffix-sum at-risk window, tie-free q20 factor."""
    return (
        "WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events), "
        "mx AS (SELECT MAX(us) AS m FROM e), "
        "g AS (SELECT user_id, us, LEAD(us) OVER "
        "(PARTITION BY user_id ORDER BY us) AS nxt FROM e), "
        "obs AS (SELECT (CASE WHEN nxt IS NULL THEN mx.m - us "
        "ELSE nxt - us END) // 60000000 AS dur, "
        "CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS ev FROM g, mx), "
        "t AS (SELECT dur, CAST(SUM(ev) AS BIGINT) AS d, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM obs GROUP BY dur), "
        "km AS (SELECT dur, d, CAST(SUM(c) OVER (ORDER BY dur DESC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS n FROM t) "
        "SELECT dur AS t_min, d, n, "
        "CAST(FLOOR(CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE) "
        "* 1048576.0 + 0.5) AS BIGINT) AS factor_q20 "
        "FROM km WHERE d > 0"
    )


def _bootstrap_ci_sql(n_boot: int = 200) -> str:
    """SQL twin of streaming.bootstrap_ci_orders: day spine, splitmix64
    counter draws (sqlgen chain), exact integer-cent replicate sums."""
    from . import sqlgen as _sg

    g0 = (
        "SELECT bb.range AS b, s.i AS i, r.nd AS nd "
        f"FROM range(0, {n_boot}) bb, s, r")
    gh = _sg.chain(g0, _sg.splitmix64_steps(
        "CAST(b * nd + i AS HUGEINT)", "h", "bs"))
    return (
        "WITH d AS (SELECT CAST(epoch_us(o_orderdate) // 86400000000 "
        "AS BIGINT) AS day, "
        "CAST(FLOOR(ABS(o_totalprice*100.0) + 0.5)*SIGN(o_totalprice) "
        "AS BIGINT) AS cents FROM orders), "
        "c AS (SELECT day, CAST(SUM(cents) AS BIGINT) AS cents "
        "FROM d GROUP BY day), "
        "r AS MATERIALIZED (SELECT MIN(day) AS d0, MAX(day) AS d1, "
        "MAX(day) - MIN(day) + 1 AS nd FROM d), "
        "s AS MATERIALIZED (SELECT g.day - r.d0 AS i, "
        "COALESCE(c.cents, 0)::BIGINT AS cents "
        "FROM r, LATERAL (SELECT UNNEST(generate_series(r.d0, r.d1)) "
        "AS day) g LEFT JOIN c ON c.day = g.day), "
        f"gh AS ({gh}), "
        "dr AS (SELECT b, CAST(h % nd AS BIGINT) AS idx FROM gh), "
        "rs AS (SELECT dr.b, CAST(SUM(s.cents) AS BIGINT) AS sum_cents "
        "FROM dr JOIN s ON s.i = dr.idx GROUP BY dr.b) "
        "SELECT rs.b, r.nd AS n_days, rs.sum_cents, "
        "ROUND(CAST(rs.sum_cents AS DOUBLE) / CAST(r.nd AS DOUBLE), 6) "
        "AS mean_cents_r FROM rs, r"
    )


def _snap_points_sql(n_seg: int = 64) -> str:
    """SQL twin of cellindex.snap_points_pages: identical geocode chain,
    segment constants inlined as VALUES, the same int64 numerator over
    the shared 65025 denominator, ROW_NUMBER argmin with id tiebreak."""
    from ..stages.cellindex import _SNAP_LEN2, snap_segments

    segs = snap_segments(n_seg)
    vals = ", ".join(
        f"({sid}, {ax}, {ay}, {bx}, {by}, {dx}, {dy})"
        for sid, ax, ay, bx, by, dx, dy in segs.tolist())
    located = _sg.chain(
        "SELECT url FROM pages",
        _sg.geocode_steps()
        + [("px", "CAST(FLOOR(lon * 10.0) AS BIGINT)"),
           ("py", "CAST(FLOOR(lat * 10.0) AS BIGINT)")])
    L2 = _SNAP_LEN2
    return (
        f"segs(sid, ax, ay, bx, by, dx, dy) AS (VALUES {vals}), "
        f"pts AS MATERIALIZED (SELECT url, px, py FROM ({located})), "
        "cand AS (SELECT p.url, s.sid, "
        "  s.dx*(p.px - s.ax) + s.dy*(p.py - s.ay) AS tnum, "
        "  CASE WHEN s.dx*(p.px - s.ax) + s.dy*(p.py - s.ay) <= 0 THEN "
        f"    ((p.px-s.ax)*(p.px-s.ax) + (p.py-s.ay)*(p.py-s.ay)) * {L2} "
        f"  WHEN s.dx*(p.px - s.ax) + s.dy*(p.py - s.ay) >= {L2} THEN "
        f"    ((p.px-s.bx)*(p.px-s.bx) + (p.py-s.by)*(p.py-s.by)) * {L2} "
        "  ELSE (s.dx*(p.py - s.ay) - s.dy*(p.px - s.ax)) "
        "     * (s.dx*(p.py - s.ay) - s.dy*(p.px - s.ax)) END AS num "
        "  FROM pts p CROSS JOIN segs s), "
        "best AS (SELECT url, sid, num, tnum, ROW_NUMBER() OVER "
        "  (PARTITION BY url ORDER BY num, sid) AS rn FROM cand) "
        "SELECT url, CAST(sid AS BIGINT) AS seg_id, "
        "CAST(num AS BIGINT) AS d2_num, "
        f"CAST(FLOOR(CAST(LEAST(GREATEST(tnum, 0), {L2}) AS DOUBLE) "
        f"/ {float(L2)!r} * 1048576.0 + 0.5) AS BIGINT) AS t_q20, "
        "ROUND(SQRT(CAST(num AS DOUBLE)) / 255.0, 6) AS dist_deci_r "
        "FROM best WHERE rn = 1"
    )


def _gbm_stumps_sql(n_rounds: int = 2) -> str:
    """SQL twin of train.gbm_stumps_lineitem: per-round bin CTEs,
    window prefix sums, HUGEINT gain pair ranked by the 2^52 limb-split
    double (single rounding == Python float(int)), trunc-div leaves."""
    cents = ("CAST(FLOOR(ABS(l_extendedprice*100.0)+0.5)"
             "*SIGN(l_extendedprice) AS BIGINT)")
    dc = "CAST(FLOOR(ABS(l_discount*100.0)+0.5)*SIGN(l_discount) AS BIGINT)"
    P52 = "CAST(4503599627370496 AS DOUBLE)"
    parts = [
        f"li0 AS MATERIALIZED (SELECT {cents} AS y, "
        f"CAST(l_quantity AS BIGINT) AS f0, {dc} AS f1 FROM lineitem)"]
    sels = []
    for r in range(1, n_rounds + 1):
        li = f"li{r - 1}"
        parts.append(
            f"b{r} AS MATERIALIZED (SELECT 0 AS f, f0 AS v, "
            "CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s "
            f"FROM {li} GROUP BY f0 UNION ALL SELECT 1, f1, "
            "CAST(COUNT(*) AS BIGINT), CAST(SUM(y) AS BIGINT) "
            f"FROM {li} GROUP BY f1)")
        parts.append(
            f"t{r} AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, "
            f"CAST(SUM(s) AS BIGINT) AS st FROM b{r} WHERE f = 0)")
        parts.append(
            f"c{r} AS (SELECT f, v AS thr, "
            "CAST(SUM(n) OVER w AS BIGINT) AS n_l, "
            f"CAST(SUM(s) OVER w AS BIGINT) AS s_l FROM b{r} "
            "WINDOW w AS (PARTITION BY f ORDER BY v "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))")
        parts.append(
            f"g{r} AS MATERIALIZED (SELECT f, thr, n_l, s_l, "
            f"t{r}.nt - n_l AS n_r, t{r}.st - s_l AS s_r, "
            f"CAST(s_l AS HUGEINT)*s_l*(t{r}.nt - n_l) "
            f"+ CAST(t{r}.st - s_l AS HUGEINT)*(t{r}.st - s_l)*n_l AS gnum, "
            f"CAST(n_l AS HUGEINT)*(t{r}.nt - n_l) AS gden "
            f"FROM c{r}, t{r} WHERE t{r}.nt - n_l > 0)")
        parts.append(
            f"gd{r} AS MATERIALIZED (SELECT *, "
            f"(CAST(gnum >> 52 AS DOUBLE)*{P52} "
            "+ CAST(gnum & 4503599627370495 AS DOUBLE)) "
            f"/ CAST(gden AS DOUBLE) AS fd FROM g{r})")
        parts.append(
            f"best{r} AS (SELECT f AS bf, thr AS bt, "
            "CAST(s_l // n_l AS BIGINT) AS wl, "
            f"CAST(s_r // n_r AS BIGINT) AS wr FROM gd{r} "
            "ORDER BY fd DESC, f, thr LIMIT 1)")
        if r < n_rounds:
            parts.append(
                f"li{r} AS MATERIALIZED (SELECT y - CASE WHEN "
                "(CASE WHEN p.bf = 0 THEN f0 ELSE f1 END) <= p.bt "
                f"THEN p.wl ELSE p.wr END AS y, f0, f1 "
                f"FROM li{r - 1}, best{r} p)")
        sels.append(
            f"SELECT CAST({r} AS BIGINT) AS rnd, CAST(f AS BIGINT) "
            "AS feature, CAST(thr AS BIGINT) AS thr, n_l, s_l, n_r, s_r, "
            "fd AS gain_f, CAST(CASE WHEN f = p.bf "
            "AND thr = p.bt THEN 1 ELSE 0 END AS BIGINT) AS is_best "
            f"FROM gd{r}, best{r} p")
    return "WITH " + ", ".join(parts) + " " + " UNION ALL ".join(sels)


def _zipf_fit_sql(k: int = 100) -> str:
    """SQL twin of textstages.zipf_fit_docs: token counts, top-k with
    (cnt desc, tok) order, powers-table exact lq1024, integer-sum
    Cramer slope as one raw division."""
    pows = ", ".join(f"({j}, {1 << j})" for j in range(54))

    def lq(col: str) -> str:
        return (f"1024*(SELECT MAX(j) FROM pow WHERE p <= {col}) "
                f"+ ({col} - (SELECT MAX(p) FROM pow WHERE p <= {col})) "
                f"* 1024 // (SELECT MAX(p) FROM pow WHERE p <= {col})")

    return (
        f"WITH pow(j, p) AS (VALUES {pows}), "
        "tc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM "
        "(SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents) "
        "WHERE tok != '' GROUP BY tok), "
        f"top AS MATERIALIZED (SELECT tok, c, CAST(ROW_NUMBER() OVER "
        "(ORDER BY c DESC, tok) AS BIGINT) AS r FROM tc "
        f"ORDER BY c DESC, tok LIMIT {k}), "
        f"lqt AS MATERIALIZED (SELECT tok, c, r, CAST({lq('r')} AS BIGINT) "
        f"AS x, CAST({lq('c')} AS BIGINT) AS y FROM top), "
        "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
        "CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx "
        "FROM lqt) "
        "SELECT l.r AS rank, l.tok AS token, l.c AS cnt, "
        "l.x AS lq_rank, l.y AS lq_cnt, "
        "CAST(s.n*s.sxy - s.sx*s.sy AS DOUBLE) "
        "/ CAST(s.n*s.sxx - s.sx*s.sx AS DOUBLE) AS slope_f "
        "FROM lqt l, s"
    )


def _changepoint_daily_sql() -> str:
    """SQL twin of streaming.changepoint_daily_orders: day spine,
    window prefix sums, the gbm gain_f limb-free f64 rank (gnum < 2^53
    never holds here, so the same 2^52 limb split as gbm), is_best via
    window argmax with smaller-day tiebreak."""
    P52 = "CAST(4503599627370496 AS DOUBLE)"
    return (
        "WITH d AS (SELECT CAST(epoch_us(o_orderdate) // 86400000000 "
        "AS BIGINT) AS day FROM orders), "
        "c AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS x FROM d "
        "GROUP BY day), "
        "r AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d), "
        "s AS MATERIALIZED (SELECT g.day, COALESCE(c.x, 0)::BIGINT AS x "
        "FROM r, LATERAL (SELECT UNNEST(generate_series(r.d0, r.d1)) "
        "AS day) g LEFT JOIN c ON c.day = g.day), "
        "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt, "
        "CAST(SUM(x) AS BIGINT) AS st FROM s), "
        "pre AS (SELECT day, CAST(ROW_NUMBER() OVER w AS BIGINT) AS n_l, "
        "CAST(SUM(x) OVER w AS BIGINT) AS s_l FROM s "
        "WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING "
        "AND CURRENT ROW)), "
        "g AS MATERIALIZED (SELECT day, n_l, s_l, t.nt - n_l AS n_r, "
        "t.st - s_l AS s_r, "
        "CAST(s_l AS HUGEINT)*s_l*(t.nt - n_l) "
        "+ CAST(t.st - s_l AS HUGEINT)*(t.st - s_l)*n_l AS gnum, "
        "CAST(n_l AS HUGEINT)*(t.nt - n_l) AS gden "
        "FROM pre, t WHERE t.nt - n_l > 0), "
        "gd AS MATERIALIZED (SELECT day, n_l, s_l, n_r, s_r, "
        f"(CAST(gnum >> 52 AS DOUBLE)*{P52} "
        "+ CAST(gnum & 4503599627370495 AS DOUBLE)) "
        "/ CAST(gden AS DOUBLE) AS gain_f FROM g) "
        "SELECT *, CAST(CASE WHEN (day) = (SELECT day FROM gd "
        "ORDER BY gain_f DESC, day LIMIT 1) THEN 1 ELSE 0 END AS BIGINT) "
        "AS is_best FROM gd"
    )


def _cdc_chunks_sql() -> str:
    """SQL twin of dedup.cdc_chunk_dedup: gear table mod 64 inlined as
    VALUES (derived from the same splitmix64 draws), the position-local
    6-term LAG boundary test, window prefix-sum chunk ids, ordered
    string_agg reassembly, fnv1a64 chunk hashes, one GROUP BY hash."""
    from ..stages.dedup import gear6_table

    g6 = gear6_table()
    gear_vals = ", ".join(f"({c}, {int(g6[c])})" for c in range(128))
    lag_terms = " + ".join(
        f"CASE WHEN i > {j} THEN LAG(gv, {j}) OVER w * {1 << j} ELSE 0 END"
        for j in range(1, 6))
    ch_hash = _sg.u64_to_i64(_sg.fnv1a64_expr("ctext"))
    return (
        f"WITH gear(c, gv) AS (VALUES {gear_vals}), "
        "pos AS (SELECT doc_id, text, "
        "UNNEST(generate_series(1, len(text))) AS i FROM documents), "
        "gc AS MATERIALIZED (SELECT doc_id, i, substr(text, i, 1) AS s, "
        "len(text) AS L, gv FROM pos "
        "JOIN gear ON gear.c = ascii(substr(text, i, 1))), "
        "hb AS MATERIALIZED (SELECT doc_id, i, s, "
        f"CASE WHEN ((gv + {lag_terms}) & 63) = 0 OR i = L "
        "THEN 1 ELSE 0 END AS bnd FROM gc "
        "WINDOW w AS (PARTITION BY doc_id ORDER BY i)), "
        "cid AS MATERIALIZED (SELECT doc_id, i, s, "
        "COALESCE(SUM(bnd) OVER (PARTITION BY doc_id ORDER BY i "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cix "
        "FROM hb), "
        "chunks AS MATERIALIZED (SELECT doc_id, cix, "
        "CAST(MIN(i) AS BIGINT) AS start, CAST(COUNT(*) AS BIGINT) AS clen, "
        "string_agg(s, '' ORDER BY i) AS ctext FROM cid "
        "GROUP BY doc_id, cix), "
        f"hashed AS MATERIALIZED (SELECT doc_id, start, clen, "
        f"{ch_hash} AS chunk_hash FROM chunks) "
        "SELECT chunk_hash, CAST(COUNT(*) AS BIGINT) AS n_copies, "
        "CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs, "
        "CAST(SUM(clen) AS BIGINT) AS total_chars, "
        "CAST(MIN(doc_id * 1048576 + start) // 1048576 AS BIGINT) AS rep_doc, "
        "CAST(MIN(doc_id * 1048576 + start) % 1048576 AS BIGINT) AS rep_start "
        "FROM hashed GROUP BY chunk_hash"
    )


def _cube_stats_sql() -> str:
    """SQL twin of agg.cube_stats_orders: GROUP BY CUBE with GROUPING
    bitmask gid, integer-cents sums, one f64 division for the mean."""
    return (
        "WITH b AS (SELECT o_orderpriority AS pr, "
        "CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr, "
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents "
        "FROM orders) "
        "SELECT COALESCE(pr, '(all)') AS o_orderpriority, "
        "COALESCE(yr, CAST(-1 AS BIGINT)) AS o_year, "
        "CAST(GROUPING(pr, yr) AS BIGINT) AS gid, "
        "CAST(COUNT(*) AS BIGINT) AS count, "
        "CAST(SUM(cents) AS BIGINT) AS sum_cents, "
        "CAST(SUM(cents) AS DOUBLE) / CAST(100 * COUNT(*) AS DOUBLE) "
        "AS mean_f FROM b GROUP BY CUBE(pr, yr)"
    )


def _single_linkage_sql(levels: tuple[int, ...] = (1, 2, 3, 4),
                        out_links: int = 4, host_mod: int = 1000) -> str:
    """SQL twin of graph.single_linkage_hosts: the sssp edge/weight CTEs
    (identical u64 chain), one recursive min-label closure per dendrogram
    level, singleton fallback via the closure's self-row, window sizes."""
    lk_base = (
        "SELECT CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) AS src, "
        "url || '#out' || CAST(kr.range AS VARCHAR) AS tok "
        f"FROM pages, range(0, {out_links}) kr"
    )
    lk_inner = _sg.chain(
        lk_base,
        [("_f", _sg.fnv1a64_expr("tok")),
         *_sg.splitmix64_steps("_f", "_h", "sp")])
    w_inner = _sg.chain(
        "SELECT a, b FROM ua",
        [("_ua", _sg.i64_to_u64("a")),
         *_sg.splitmix64_steps("_ua", "_s1", "swa"),
         ("_xw", _sg.u64_xor("_s1", _sg.i64_to_u64("b"))),
         *_sg.splitmix64_steps("_xw", "_s2", "swb")])
    ctes = [
        f"lk AS MATERIALIZED (SELECT src, CAST(_h % {host_mod} AS BIGINT) AS dst "
        f"FROM ({lk_inner}))",
        "ua AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM lk WHERE src <> dst)",
        "we AS MATERIALIZED (SELECT a, b, "
        f"CAST(1 + (_s2 % 9) AS BIGINT) AS w FROM ({w_inner}))",
        "nodes AS MATERIALIZED (SELECT a AS node FROM ua "
        "UNION SELECT b FROM ua)",
    ]
    selects = []
    for t in levels:
        ctes.append(
            f"ce{t} AS MATERIALIZED (SELECT a AS u, b AS v FROM we "
            f"WHERE w <= {t} UNION ALL SELECT b, a FROM we WHERE w <= {t})")
        ctes.append(
            f"r{t} AS (SELECT node, node AS anc FROM nodes "
            f"UNION SELECT r.node, e.v AS anc FROM r{t} r "
            f"JOIN ce{t} e ON e.u = r.anc)")
        ctes.append(
            f"l{t} AS MATERIALIZED (SELECT node, MIN(anc) AS cluster "
            f"FROM r{t} GROUP BY node)")
        selects.append(
            f"SELECT CAST({t} AS BIGINT) AS level, "
            "CAST(node AS BIGINT) AS host, "
            "CAST(cluster AS BIGINT) AS cluster, "
            "CAST(COUNT(*) OVER (PARTITION BY cluster) AS BIGINT) "
            f"AS cluster_size FROM l{t}")
    return (f"WITH RECURSIVE {pages_sql()}, " + ", ".join(ctes) + " "
            + " UNION ALL ".join(selects))


def _g2_collocations_sql(min_count: int = 5, k: int = 50) -> str:
    """SQL twin of textstages.g2_collocations: positional-margin 2×2
    tables over adjacent bigrams, powers-table exact lq1024 (the
    _zipf_fit_sql form), guarded integer terms, (score_q DESC, w1, w2)
    top-k."""
    pows = ", ".join(f"({j}, {1 << j})" for j in range(54))

    def lq(col: str) -> str:
        return (f"(1024*(SELECT MAX(j) FROM pow WHERE p <= {col}) "
                f"+ ({col} - (SELECT MAX(p) FROM pow WHERE p <= {col})) "
                f"* 1024 // (SELECT MAX(p) FROM pow WHERE p <= {col}))")

    def term(o: str, e: str) -> str:
        return (f"CASE WHEN ({o}) > 0 AND ({e}) > 0 THEN "
                f"({o}) * ({lq(f'({o}) * n')} - {lq(f'({e})')}) "
                "ELSE 0 END")

    terms = " + ".join([
        term("cab", "r * c"),
        term("r - cab", "r * (n - c)"),
        term("c - cab", "(n - r) * c"),
        term("n - r - c + cab", "(n - r) * (n - c)")])
    return (
        f"WITH pow(j, p) AS (VALUES {pows}), "
        "toks AS MATERIALIZED (SELECT "
        "  list_filter(string_split(text, ' '), x -> len(x) > 0) AS l "
        "  FROM documents), "
        "bg AS MATERIALIZED (SELECT unnest(list_transform("
        "  generate_series(1, len(l) - 1), i -> l[i] || ' ' || l[i + 1])) AS b "
        "  FROM toks WHERE len(l) >= 2), "
        "bcnt AS MATERIALIZED (SELECT split_part(b, ' ', 1) AS w1, "
        "  split_part(b, ' ', 2) AS w2, CAST(COUNT(*) AS BIGINT) AS cab "
        "  FROM bg GROUP BY b), "
        "m AS MATERIALIZED (SELECT w1, w2, cab, "
        "  CAST(SUM(cab) OVER (PARTITION BY w1) AS BIGINT) AS r, "
        "  CAST(SUM(cab) OVER (PARTITION BY w2) AS BIGINT) AS c, "
        "  CAST(SUM(cab) OVER () AS BIGINT) AS n FROM bcnt), "
        f"s AS (SELECT w1, w2, cab AS pair_count, r AS r_w1, c AS c_w2, "
        f"  CAST({terms} AS BIGINT) AS score_q FROM m "
        f"  WHERE cab >= {min_count}) "
        "SELECT * FROM s "
        f"QUALIFY ROW_NUMBER() OVER (ORDER BY score_q DESC, w1, w2) <= {k}"
    )


def _focal_median_sql(side: int = 16, quant: float = 2.0,
                      tx_max: int = 15, ty_max: int = 15) -> str:
    """SQL twin of raster.focal_median_stage: 3×3 shrink-at-border
    neighbor lists via a dirs cross join, list_sort, and the 1-based
    lower-median index (len+1)//2 — the identical deterministic rule."""
    dirs = ", ".join(f"({dx}, {dy})" for dx in (-1, 0, 1)
                     for dy in (-1, 0, 1))
    return (
        f"WITH {tiles_sql(side)}, "
        "rc AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) AS q "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        f"dirs(dx, dy) AS (VALUES {dirs}), "
        "nb AS (SELECT c.tile_x, c.tile_y, c.px, c.py, "
        "  list_sort(list(n.q)) AS l FROM rc c, dirs d "
        "  JOIN rc n ON n.tile_x = c.tile_x AND n.tile_y = c.tile_y "
        "    AND n.px = c.px + d.dx AND n.py = c.py + d.dy "
        "  GROUP BY 1, 2, 3, 4) "
        "SELECT CAST(tile_x AS BIGINT) AS tile_x, "
        "CAST(tile_y AS BIGINT) AS tile_y, CAST(px AS BIGINT) AS px, "
        "CAST(py AS BIGINT) AS py, "
        "CAST(l[(len(l) + 1) // 2] AS BIGINT) AS med_q, "
        "CAST(len(l) AS BIGINT) AS n_win FROM nb"
    )


def _harris_sql(side: int = 16, quant: float = 8.0,
                tx_max: int = 15, ty_max: int = 15) -> str:
    """SQL twin of raster.harris_corners_stage: Sobel via per-direction
    integer weights (dx·(2−|dy|) / dy·(2−|dx|)), 3×3 box sums as a
    second conditional-agg join, r20 response, strict local max over
    available neighbors."""
    sob = ", ".join(
        f"({dx}, {dy}, {dx * (2 - abs(dy))}, {dy * (2 - abs(dx))})"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    box = ", ".join(f"({dx}, {dy})" for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1))
    n8 = ", ".join(f"({dx}, {dy})" for dx in (-1, 0, 1)
                   for dy in (-1, 0, 1) if (dx, dy) != (0, 0))
    return (
        f"WITH {tiles_sql(side)}, "
        "rc AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) AS q "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        f"sob(dx, dy, wx, wy) AS (VALUES {sob}), "
        f"box(dx, dy) AS (VALUES {box}), "
        f"n8(dx, dy) AS (VALUES {n8}), "
        "g AS MATERIALIZED (SELECT c.tile_x, c.tile_y, c.px, c.py, "
        "  SUM(n.q * s.wx) AS ix, SUM(n.q * s.wy) AS iy "
        "  FROM rc c, sob s "
        "  JOIN rc n ON n.tile_x = c.tile_x AND n.tile_y = c.tile_y "
        "    AND n.px = c.px + s.dx AND n.py = c.py + s.dy "
        f"  WHERE c.px BETWEEN 1 AND {side - 2} "
        f"  AND c.py BETWEEN 1 AND {side - 2} GROUP BY 1, 2, 3, 4), "
        "t AS MATERIALIZED (SELECT c.tile_x, c.tile_y, c.px, c.py, "
        "  SUM(n.ix * n.ix) AS sxx, SUM(n.ix * n.iy) AS sxy, "
        "  SUM(n.iy * n.iy) AS syy FROM g c, box d "
        "  JOIN g n ON n.tile_x = c.tile_x AND n.tile_y = c.tile_y "
        "    AND n.px = c.px + d.dx AND n.py = c.py + d.dy "
        f"  WHERE c.px BETWEEN 2 AND {side - 3} "
        f"  AND c.py BETWEEN 2 AND {side - 3} GROUP BY 1, 2, 3, 4), "
        "r AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        "  20*(sxx*syy - sxy*sxy) - (sxx+syy)*(sxx+syy) AS r20 FROM t), "
        "mx AS (SELECT c.tile_x, c.tile_y, c.px, c.py, "
        "  MAX(n.r20) AS nmax FROM r c, n8 d "
        "  JOIN r n ON n.tile_x = c.tile_x AND n.tile_y = c.tile_y "
        "    AND n.px = c.px + d.dx AND n.py = c.py + d.dy "
        "  GROUP BY 1, 2, 3, 4) "
        "SELECT CAST(r.tile_x AS BIGINT) AS tile_x, "
        "CAST(r.tile_y AS BIGINT) AS tile_y, CAST(r.px AS BIGINT) AS px, "
        "CAST(r.py AS BIGINT) AS py, CAST(r.r20 AS BIGINT) AS r20, "
        "CAST(CASE WHEN r.r20 > 0 AND r.r20 > mx.nmax THEN 1 ELSE 0 END "
        "AS BIGINT) AS is_corner FROM r "
        "JOIN mx ON mx.tile_x = r.tile_x AND mx.tile_y = r.tile_y "
        "AND mx.px = r.px AND mx.py = r.py"
    )


def _twi_sql(side: int = 16, quant: float = 2.0, tx_max: int = 15,
             ty_max: int = 15) -> str:
    """SQL twin of raster.twi_stage: the d8/flow CTE chain (same argmax
    key and recursive drainage closure) + powers-table lq1024 —
    twi_q = lq(acc) − lq(best_drop + 1), all exact integers."""
    from ..stages.raster import D8_DIRS

    pows = ", ".join(f"({j}, {1 << j})" for j in range(54))

    def lq(col: str) -> str:
        return (f"(1024*(SELECT MAX(j) FROM pow WHERE p <= {col}) "
                f"+ ({col} - (SELECT MAX(p) FROM pow WHERE p <= {col})) "
                f"* 1024 // (SELECT MAX(p) FROM pow WHERE p <= {col}))")

    vals = ", ".join(f"({i}, {dx}, {dy}, {3 - (dx * dx + dy * dy)})"
                     for i, (dx, dy) in enumerate(D8_DIRS))
    return (
        f"WITH RECURSIVE pow(j, p) AS (VALUES {pows}), {tiles_sql(side)}, "
        "rc AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) AS q "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        f"dirs(di, dx, dy, w) AS (VALUES {vals}), "
        "cand AS MATERIALIZED (SELECT c.tile_x, c.tile_y, c.px, c.py, "
        "  c.px + d.dx AS nx, c.py + d.dy AS ny, c.q - n.q AS drop, "
        "  (c.q - n.q) * (c.q - n.q) * d.w AS key, d.di "
        "  FROM rc c, dirs d "
        "  JOIN rc n ON n.tile_x = c.tile_x AND n.tile_y = c.tile_y "
        "    AND n.px = c.px + d.dx AND n.py = c.py + d.dy "
        "  WHERE c.q - n.q > 0), "
        "best AS MATERIALIZED (SELECT tile_x, tile_y, px, py, nx, ny, drop "
        "  FROM cand "
        "  QUALIFY row_number() OVER (PARTITION BY tile_x, tile_y, px, py "
        "  ORDER BY key DESC, di) = 1), "
        "reach AS (SELECT tile_x, tile_y, px AS cx, py AS cy FROM rc "
        "  UNION ALL "
        "  SELECT r.tile_x, r.tile_y, e.nx, e.ny FROM reach r "
        "  JOIN best e ON e.tile_x = r.tile_x AND e.tile_y = r.tile_y "
        "    AND e.px = r.cx AND e.py = r.cy), "
        "accs AS MATERIALIZED (SELECT tile_x, tile_y, cx AS px, cy AS py, "
        "  CAST(COUNT(*) AS BIGINT) AS acc FROM reach "
        "  GROUP BY tile_x, tile_y, cx, cy), "
        "j AS MATERIALIZED (SELECT c.tile_x, c.tile_y, c.px, c.py, a.acc, "
        "  COALESCE(b.drop, 0) AS best_drop "
        "  FROM rc c JOIN accs a ON a.tile_x = c.tile_x "
        "    AND a.tile_y = c.tile_y AND a.px = c.px AND a.py = c.py "
        "  LEFT JOIN best b ON b.tile_x = c.tile_x AND b.tile_y = c.tile_y "
        "    AND b.px = c.px AND b.py = c.py) "
        "SELECT CAST(tile_x AS BIGINT) AS tile_x, "
        "CAST(tile_y AS BIGINT) AS tile_y, CAST(px AS BIGINT) AS px, "
        "CAST(py AS BIGINT) AS py, acc, "
        "CAST(best_drop AS BIGINT) AS best_drop, "
        f"CAST({lq('acc')} - {lq('(best_drop + 1)')} AS BIGINT) AS twi_q "
        "FROM j"
    )


def _traj_intersections_sql() -> str:
    """SQL twin of streaming.traj_intersections_users: the dp_simplify
    splitmix geocode, LEAD segments, non-adjacent self-join with the four
    integer orientation predicates (proper crossings only)."""
    xor_c = 0x9E3779B97F4A7C15
    inner = _sg.chain(
        "SELECT event_id, ts, user_id FROM events",
        [("_e", _sg.i64_to_u64("event_id")),
         *_sg.splitmix64_steps("_e", "_h1", "txa"),
         ("_x1", _sg.u64_xor("_h1", str(xor_c))),
         *_sg.splitmix64_steps("_x1", "_h2", "txb")])
    return (
        "WITH p AS MATERIALIZED (SELECT CAST(user_id AS BIGINT) AS u, "
        "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS i, "
        "CAST(_h2 % 360000001 AS BIGINT) - 180000000 AS x, "
        "CAST(_h1 % 180000001 AS BIGINT) - 90000000 AS y "
        f"FROM ({inner})), "
        "seg AS MATERIALIZED (SELECT u, i, x AS ax, y AS ay, "
        "LEAD(x) OVER w AS bx, LEAD(y) OVER w AS by FROM p "
        "WINDOW w AS (PARTITION BY u ORDER BY i) QUALIFY bx IS NOT NULL), "
        "pr AS (SELECT s.u, "
        "(s.bx - s.ax)*(t.ay - s.ay) - (s.by - s.ay)*(t.ax - s.ax) AS o1, "
        "(s.bx - s.ax)*(t.by - s.ay) - (s.by - s.ay)*(t.bx - s.ax) AS o2, "
        "(t.bx - t.ax)*(s.ay - t.ay) - (t.by - t.ay)*(s.ax - t.ax) AS o3, "
        "(t.bx - t.ax)*(s.by - t.ay) - (t.by - t.ay)*(s.bx - t.ax) AS o4 "
        "FROM seg s JOIN seg t ON t.u = s.u AND t.i >= s.i + 2), "
        "x AS (SELECT u, CAST(COUNT(*) FILTER ("
        "((o1 > 0 AND o2 < 0) OR (o1 < 0 AND o2 > 0)) AND "
        "((o3 > 0 AND o4 < 0) OR (o3 < 0 AND o4 > 0))) AS BIGINT) "
        "AS n_crossings FROM pr GROUP BY u), "
        "np AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS n_points FROM p "
        "GROUP BY u) "
        "SELECT np.u AS user_id, np.n_points, "
        "CAST(GREATEST(np.n_points - 1, 0) AS BIGINT) AS n_segments, "
        "CAST(COALESCE(x.n_crossings, 0) AS BIGINT) AS n_crossings "
        "FROM np LEFT JOIN x ON x.u = np.u"
    )


def _closeness_sql(k_sources: int = 4, rounds: int = 8, out_links: int = 4,
                   host_mod: int = 1000) -> str:
    """SQL twin of graph.closeness_hosts: pivots = top-k splitmix64
    draws over the node set (ties → smaller node), one unrolled
    min-plus BFS with a source dimension, exact-integer reach/sum."""
    inf = 1 << 40
    lk_base = (
        "SELECT CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) AS src, "
        "url || '#out' || CAST(kr.range AS VARCHAR) AS tok "
        f"FROM pages, range(0, {out_links}) kr"
    )
    lk_inner = _sg.chain(
        lk_base,
        [("_f", _sg.fnv1a64_expr("tok")), *_sg.splitmix64_steps("_f", "_h", "cl")])
    draw_inner = _sg.chain(
        "SELECT node, CAST(node AS HUGEINT) AS nu FROM nodes",
        [*_sg.splitmix64_steps("nu", "_dw", "cld")])
    ctes = [
        f"lk AS MATERIALIZED (SELECT src, CAST(_h % {host_mod} AS BIGINT) AS dst "
        f"FROM ({lk_inner}))",
        "ua AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM lk WHERE src <> dst)",
        "adj AS MATERIALIZED (SELECT a AS v, b AS u FROM ua "
        "UNION ALL SELECT b AS v, a AS u FROM ua)",
        "nodes AS MATERIALIZED (SELECT DISTINCT v AS node FROM adj)",
        f"srcs AS MATERIALIZED (SELECT node AS s FROM ({draw_inner}) "
        f"QUALIFY ROW_NUMBER() OVER (ORDER BY _dw, node) <= {k_sources})",
        "d0 AS MATERIALIZED (SELECT srcs.s, nodes.node, "
        "CASE WHEN nodes.node = srcs.s THEN CAST(0 AS BIGINT) "
        f"ELSE CAST({inf} AS BIGINT) END AS q FROM srcs, nodes)",
    ]
    for t in range(1, rounds + 1):
        ctes.append(
            f"d{t} AS MATERIALIZED (SELECT s, node, MIN(q) AS q FROM ("
            f"SELECT s, node, q FROM d{t - 1} "
            f"UNION ALL SELECT d.s, adj.v AS node, d.q + 1 AS q "
            f"FROM adj JOIN d{t - 1} d ON d.node = adj.u) GROUP BY s, node)")
    return (
        f"WITH {pages_sql()}, " + ", ".join(ctes) + " "
        "SELECT CAST(s AS BIGINT) AS source, "
        f"CAST(COUNT(*) FILTER (q < {inf} AND q > 0) AS BIGINT) AS n_reached, "
        f"CAST(COALESCE(SUM(q) FILTER (q < {inf} AND q > 0), 0) AS BIGINT) "
        f"AS sum_depth FROM d{rounds} GROUP BY s"
    )


def _rake_sql(k: int = 50, min_count: int = 2) -> str:
    """SQL twin of textstages.rake_keywords: stopword-delimited runs via
    a window prefix sum, deg/freq word scores with the identical 1024
    floor division, per-position phrase sums, (score_q DESC, phrase)
    top-k."""
    from .textproc import STOPWORDS

    stops = ", ".join(f"'{w}'" for w in STOPWORDS)
    return (
        "WITH tl AS MATERIALIZED (SELECT doc_id, "
        "list_filter(string_split(text, ' '), x -> len(x) > 0) AS tl "
        "FROM documents), "
        "tp AS MATERIALIZED (SELECT doc_id, "
        "UNNEST(generate_series(1, len(tl))) AS i, tl FROM tl), "
        "tw AS MATERIALIZED (SELECT doc_id, i, tl[i] AS w, "
        f"tl[i] IN ({stops}) AS is_stop FROM tp), "
        "rn AS MATERIALIZED (SELECT doc_id, i, w, is_stop, "
        "SUM(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER "
        "(PARTITION BY doc_id ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING "
        "AND CURRENT ROW) AS run FROM tw), "
        "cand AS MATERIALIZED (SELECT doc_id, run, i, w FROM rn "
        "WHERE NOT is_stop), "
        "runs AS MATERIALIZED (SELECT doc_id, run, "
        "CAST(COUNT(*) AS BIGINT) AS rlen, "
        "string_agg(w, ' ' ORDER BY i) AS phrase FROM cand "
        "GROUP BY doc_id, run), "
        "wrow AS (SELECT c.w, r.rlen FROM cand c "
        "JOIN runs r ON r.doc_id = c.doc_id AND r.run = c.run), "
        "ws AS MATERIALIZED (SELECT w, "
        "(CAST(SUM(rlen) AS BIGINT) * 1024) // CAST(COUNT(*) AS BIGINT) "
        "AS sq FROM wrow GROUP BY w), "
        "pcnt AS MATERIALIZED (SELECT phrase, CAST(COUNT(*) AS BIGINT) "
        "AS cnt FROM runs GROUP BY phrase), "
        "pw AS (SELECT phrase, UNNEST(string_split(phrase, ' ')) AS w, cnt "
        "FROM pcnt), "
        "tot AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_words, "
        "CAST(MAX(pw.cnt) AS BIGINT) AS cnt, "
        "CAST(SUM(ws.sq) AS BIGINT) AS score_q "
        "FROM pw JOIN ws ON ws.w = pw.w GROUP BY phrase) "
        f"SELECT phrase, n_words, cnt, score_q FROM tot "
        f"WHERE cnt >= {min_count} "
        f"QUALIFY ROW_NUMBER() OVER (ORDER BY score_q DESC, phrase) <= {k}"
    )


def _hough_circles_sql(side: int = 16, tx_max: int = 15, ty_max: int = 15,
                       edge_thresh: float = 0.1,
                       radii: tuple[int, ...] = (3, 4, 5)) -> str:
    """SQL twin of raster.hough_circles_stage: the shared edge CTEs,
    per-radius integer annulus offsets inlined as VALUES, in-tile vote
    accumulator, peak by votes DESC then (cy, cx) ASC."""
    from ..stages.raster import _circle_offsets

    offs = ", ".join(
        f"({r}, {int(dx)}, {int(dy)})"
        for r in radii for dx, dy in _circle_offsets(r))
    rvals = ", ".join(f"({r})" for r in radii)
    return (
        f"WITH {_edge_ctes(side, tx_max, ty_max, edge_thresh)}, "
        f"co(r, dx, dy) AS (VALUES {offs}), "
        f"rads(r) AS (VALUES {rvals}), "
        "acc AS (SELECT e.tile_x, e.tile_y, co.r, "
        "  e.x - co.dx AS cx, e.y - co.dy AS cy, COUNT(*) AS votes "
        "  FROM ed e, co "
        f"  WHERE e.x - co.dx BETWEEN 0 AND {side - 1} "
        f"  AND e.y - co.dy BETWEEN 0 AND {side - 1} "
        "  GROUP BY 1, 2, 3, 4, 5), "
        "pick AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY tile_x, tile_y, r "
        "  ORDER BY votes DESC, cy ASC, cx ASC) AS rr FROM acc), "
        "cnt AS (SELECT tile_x, tile_y, COUNT(*) AS n FROM ed GROUP BY 1, 2), "
        "base AS (SELECT DISTINCT tile_x, tile_y FROM rcl) "
        "SELECT CAST(b.tile_x AS BIGINT) AS tile_x, "
        "CAST(b.tile_y AS BIGINT) AS tile_y, CAST(rads.r AS BIGINT) AS r, "
        "CAST(COALESCE(p.cx, -1) AS BIGINT) AS peak_cx, "
        "CAST(COALESCE(p.cy, -1) AS BIGINT) AS peak_cy, "
        "CAST(COALESCE(p.votes, 0) AS BIGINT) AS votes, "
        "CAST(COALESCE(c.n, 0) AS BIGINT) AS n_edge "
        "FROM base b CROSS JOIN rads "
        "LEFT JOIN cnt c ON c.tile_x = b.tile_x AND c.tile_y = b.tile_y "
        "LEFT JOIN (SELECT * FROM pick WHERE rr = 1) p "
        "ON p.tile_x = b.tile_x AND p.tile_y = b.tile_y AND p.r = rads.r"
    )


def _iforest_sql(n_trees: int = 16, psi: int = 256, max_depth: int = 8,
                 k: int = 50) -> str:
    """SQL twin of train.iforest_orders: REBUILDS the deterministic
    isolation forest level-by-level in unrolled CTEs — per-tree bottom-psi
    id-hash samples (signed splitmix draw, ROW_NUMBER), per-depth
    (tree,node) min/max/count groups deciding internal-vs-leaf with the
    same splitmix(tree*2^20+node) feature/split chain, then an 8-step
    LEFT-JOIN walk of every order through the internal-node table and an
    integer path_q sum (powers-table lq1024 — no transcendental)."""
    XOR = 0xA5A5A5A5DEADBEEF
    pows = ", ".join(f"({j}, {1 << j})" for j in range(54))

    def lq(col: str) -> str:
        return (f"1024*(SELECT MAX(j) FROM pow WHERE p <= {col}) "
                f"+ ({col} - (SELECT MAX(p) FROM pow WHERE p <= {col})) "
                f"* 1024 // (SELECT MAX(p) FROM pow WHERE p <= {col})")

    parts = [f"pow(j, p) AS (VALUES {pows})"]
    parts.append(
        "f AS MATERIALIZED (SELECT CAST(o_orderkey AS BIGINT) AS key, "
        "CAST(FLOOR(ABS(o_totalprice*100.0) + 0.5)*SIGN(o_totalprice) "
        "AS BIGINT) AS f0, "
        "CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS f1, "
        "CAST(o_custkey AS BIGINT) AS f2 FROM orders)")

    seed_chain = _sg.chain(
        f"SELECT CAST(UNNEST(generate_series(0, {n_trees - 1})) AS BIGINT) "
        "AS t",
        _sg.splitmix64_steps("t + 1", "seed", "sd0"))
    parts.append(f"tr AS MATERIALIZED (SELECT t, seed FROM ({seed_chain}))")

    draw_chain = _sg.chain(
        "SELECT f.key, f.f0, f.f1, f.f2, tr.t, tr.seed FROM f, tr",
        _sg.splitmix64_steps(
            _sg.u64_xor("CAST(key AS HUGEINT)", "seed"), "draw_u", "dw")
        + [("draw", _sg.u64_to_i64("draw_u"))])
    parts.append(
        "samp AS MATERIALIZED (SELECT t, key, f0, f1, f2 FROM "
        "(SELECT t, key, f0, f1, f2, ROW_NUMBER() OVER (PARTITION BY t "
        f"ORDER BY draw, key) AS rn FROM ({draw_chain})) WHERE rn <= {psi})")

    parts.append(
        "r0 AS (SELECT t, CAST(1 AS BIGINT) AS node, key, f0, f1, f2 "
        "FROM samp)")
    lvs, sps = [], []
    for d in range(max_depth + 1):
        h_chain = _sg.chain(
            f"SELECT * FROM r{d}",
            _sg.splitmix64_steps(f"t*1048576 + node", "nh", f"nh{d}")
            + _sg.splitmix64_steps(_sg.u64_xor("nh", str(XOR)), "sdr",
                                   f"sd{d}")
            + [("feat", "CAST(nh % 3 AS BIGINT)"),
               ("fv", "CASE feat WHEN 0 THEN f0 WHEN 1 THEN f1 "
                      "ELSE f2 END")])
        parts.append(f"h{d} AS MATERIALIZED ({h_chain})")
        parts.append(
            f"n{d} AS MATERIALIZED (SELECT t, node, MIN(fv) AS lo, "
            "MAX(fv) AS hi, CAST(COUNT(*) AS BIGINT) AS cnt, "
            f"MIN(sdr) AS sdr, MIN(feat) AS feat FROM h{d} "
            "GROUP BY t, node)")
        if d < max_depth:
            lvs.append(f"SELECT t, node, CAST({d} AS BIGINT) AS depth, "
                       f"cnt AS sz FROM n{d} WHERE cnt <= 1 OR lo >= hi")
            sps.append(f"SELECT t, node, feat, lo + 1 + "
                       f"CAST(sdr % (hi - lo) AS BIGINT) AS split "
                       f"FROM n{d} WHERE cnt > 1 AND lo < hi")
            parts.append(
                f"sp{d} AS ({sps[-1]})")
            parts.append(
                f"r{d + 1} AS (SELECT h.t AS t, 2*h.node + CASE WHEN "
                "h.fv >= s.split THEN 1 ELSE 0 END AS node, h.key, "
                f"h.f0, h.f1, h.f2 FROM h{d} h JOIN sp{d} s "
                "ON s.t = h.t AND s.node = h.node)")
        else:
            lvs.append(f"SELECT t, node, CAST({d} AS BIGINT) AS depth, "
                       f"cnt AS sz FROM n{d}")
    parts.append("ints AS MATERIALIZED ("
                 + " UNION ALL ".join(f"SELECT * FROM sp{d}"
                                      for d in range(max_depth)) + ")")
    parts.append("leaves AS (" + " UNION ALL ".join(lvs) + ")")
    parts.append(
        "lf AS MATERIALIZED (SELECT t, node, "
        f"CAST(1024*depth + 2*({lq('sz')}) AS BIGINT) AS path_q "
        "FROM leaves)")

    parts.append("w0 AS (SELECT key, t, f0, f1, f2, "
                 "CAST(1 AS BIGINT) AS pos FROM f, tr)")
    for i in range(max_depth):
        parts.append(
            f"w{i + 1} AS (SELECT w.key, w.t, w.f0, w.f1, w.f2, "
            "CASE WHEN s.node IS NULL THEN w.pos ELSE 2*w.pos + "
            "(CASE WHEN (CASE s.feat WHEN 0 THEN w.f0 WHEN 1 THEN w.f1 "
            "ELSE w.f2 END) >= s.split THEN 1 ELSE 0 END) END AS pos "
            f"FROM w{i} w LEFT JOIN ints s "
            "ON s.t = w.t AND s.node = w.pos)")
    parts.append(
        "sc AS (SELECT w.key, CAST(SUM(l.path_q) AS BIGINT) AS total_q "
        f"FROM w{max_depth} w JOIN lf l ON l.t = w.t AND l.node = w.pos "
        "GROUP BY w.key)")
    return ("WITH " + ", ".join(parts)
            + " SELECT CAST(key AS BIGINT) AS o_orderkey, total_q "
            f"FROM sc ORDER BY total_q, o_orderkey LIMIT {k}")


def _spectrogram_sql(frame: int = 32, nbins: int = 8, maxp: int = 256,
                     scale: int = 1024) -> str:
    """SQL twin of multimodal.Spectrogrammer over the GLRM fixture: the
    same integer-quantized DFT basis (imported and inlined as list
    literals — shared verbatim with the engine), list-kernel re/im sums
    per 32-byte frame, power = re²+im², first-max peak bin via a GREATEST
    chain, and LAG-window positive spectral flux / relative onset — all
    exact int64, zero transcendental in the query text."""
    from ..stages.multimodal import _dft_basis

    C, S = _dft_basis(frame, nbins, scale)
    dev = f"(ord(substr(p, CAST(frame * {frame} AS INT) + i, 1)) - 128)"
    res = []
    for b in range(nbins):
        cl = "[" + ", ".join(str(v) for v in C[b]) + "]"
        sl = "[" + ", ".join(str(v) for v in S[b]) + "]"
        res.append(
            f"list_aggregate(list_transform(generate_series(1, {frame}), "
            f"i -> {dev} * ({cl})[i]), 'sum') AS re{b + 1}")
        res.append(
            f"list_aggregate(list_transform(generate_series(1, {frame}), "
            f"i -> {dev} * ({sl})[i]), 'sum') AS im{b + 1}")
    pcols = ", ".join(
        f"re{b}*re{b} + im{b}*im{b} AS p{b}" for b in range(1, nbins + 1))
    peak_cases = " ".join(
        f"WHEN p{b} >= GREATEST("
        + ", ".join(f"p{j}" for j in range(b + 1, nbins + 1))
        + f") THEN {b}"
        for b in range(1, nbins))
    flux = " + ".join(
        f"GREATEST(p{b} - LAG(p{b}) OVER w, 0)" for b in range(1, nbins + 1))
    tot = " + ".join(f"p{b}" for b in range(1, nbins + 1))
    plist = ", ".join(f"p{b}" for b in range(1, nbins + 1))
    pbig = ", ".join(f"CAST(p{b} AS BIGINT) AS p{b}"
                     for b in range(1, nbins + 1))
    return (
        f"WITH s AS (SELECT doc_id AS media_id, substr(text, 1, {maxp}) "
        "AS p FROM documents), "
        f"nf AS (SELECT media_id, p, length(p) // {frame} AS n FROM s), "
        "fr AS (SELECT media_id, CAST(gs.range AS BIGINT) AS frame, p "
        f"FROM nf, range(0, {maxp // frame}) gs WHERE gs.range < n), "
        f"ri AS MATERIALIZED (SELECT media_id, frame, {', '.join(res)} "
        "FROM fr), "
        f"pw AS MATERIALIZED (SELECT media_id, frame, {pcols} FROM ri), "
        f"fx AS MATERIALIZED (SELECT media_id, frame, {plist}, "
        f"CASE WHEN frame = 0 THEN 0 ELSE {flux} END AS flux, "
        f"LAG({tot}) OVER w AS prev_tot, "
        f"CASE {peak_cases} ELSE {nbins} END AS peak_bin FROM pw "
        "WINDOW w AS (PARTITION BY media_id ORDER BY frame)) "
        f"SELECT media_id, frame, {pbig}, "
        "CAST(peak_bin AS BIGINT) AS peak_bin, CAST(flux AS BIGINT) AS "
        "flux, CAST(CASE WHEN frame > 0 AND 2*flux > prev_tot THEN 1 "
        "ELSE 0 END AS BIGINT) AS is_onset FROM fx"
    )


def _seam_carve_sql(side: int = 16, quant: float = 2.0, tx_max: int = 15,
                    ty_max: int = 15) -> str:
    """SQL twin of raster.seam_carve_stage: quantized-gradient integer
    energy (clamped borders via COALESCE(LAG/LEAD, q)), the seam DP
    unrolled one LAG/LEAD-window CTE per row, the backtrack one
    (ORDER BY m, px LIMIT-1-per-tile) CTE per row — ties toward smaller
    px exactly as the engine's first-hit argmin."""
    inf = 1 << 40
    ctes = [
        "qt AS (SELECT tile_x, tile_y, px, py, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) AS q "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max})",
        "en AS MATERIALIZED (SELECT tile_x, tile_y, px, py, "
        "ABS(COALESCE(LEAD(q) OVER wx, q) - COALESCE(LAG(q) OVER wx, q)) "
        "+ ABS(COALESCE(LEAD(q) OVER wy, q) - COALESCE(LAG(q) OVER wy, q)) "
        "AS e FROM qt "
        "WINDOW wx AS (PARTITION BY tile_x, tile_y, py ORDER BY px), "
        "wy AS (PARTITION BY tile_x, tile_y, px ORDER BY py))",
        "m0 AS MATERIALIZED (SELECT tile_x, tile_y, px, e AS m "
        "FROM en WHERE py = 0)",
    ]
    for y in range(1, side):
        ctes.append(
            f"mp{y} AS (SELECT tile_x, tile_y, px, LEAST(m, "
            f"COALESCE(LAG(m) OVER wx, {inf}), "
            f"COALESCE(LEAD(m) OVER wx, {inf})) AS m3 FROM m{y - 1} "
            "WINDOW wx AS (PARTITION BY tile_x, tile_y ORDER BY px))")
        ctes.append(
            f"m{y} AS MATERIALIZED (SELECT e.tile_x, e.tile_y, e.px, "
            f"e.e + p.m3 AS m FROM (SELECT * FROM en WHERE py = {y}) e "
            f"JOIN mp{y} p ON p.tile_x = e.tile_x AND p.tile_y = e.tile_y "
            "AND p.px = e.px)")
    ctes.append(
        f"bt{side - 1} AS MATERIALIZED (SELECT tile_x, tile_y, px AS sx "
        "FROM (SELECT tile_x, tile_y, px, ROW_NUMBER() OVER (PARTITION BY "
        f"tile_x, tile_y ORDER BY m, px) AS rr FROM m{side - 1}) "
        "WHERE rr = 1)")
    for y in range(side - 2, -1, -1):
        ctes.append(
            f"bt{y} AS MATERIALIZED (SELECT tile_x, tile_y, px AS sx FROM "
            "(SELECT m.tile_x, m.tile_y, m.px, ROW_NUMBER() OVER ("
            "PARTITION BY m.tile_x, m.tile_y ORDER BY m.m, m.px) AS rr "
            f"FROM m{y} m JOIN bt{y + 1} b ON b.tile_x = m.tile_x "
            "AND b.tile_y = m.tile_y AND ABS(m.px - b.sx) <= 1) "
            "WHERE rr = 1)")
    ctes.append("seam AS (" + " UNION ALL ".join(
        f"SELECT tile_x, tile_y, CAST({y} AS BIGINT) AS py, sx FROM bt{y}"
        for y in range(side)) + ")")
    ctes.append("mall AS (" + " UNION ALL ".join(
        f"SELECT tile_x, tile_y, CAST({y} AS BIGINT) AS py, px, m "
        f"FROM m{y}" for y in range(side)) + ")")
    return (
        f"WITH {tiles_sql(side)}, " + ", ".join(ctes) + " "
        "SELECT CAST(s.tile_x AS BIGINT) AS tile_x, "
        "CAST(s.tile_y AS BIGINT) AS tile_y, s.py, "
        "CAST(s.sx AS BIGINT) AS seam_x, CAST(m.m AS BIGINT) AS m_cum, "
        "CAST(e.e AS BIGINT) AS e_seam "
        "FROM seam s JOIN mall m ON m.tile_x = s.tile_x "
        "AND m.tile_y = s.tile_y AND m.py = s.py AND m.px = s.sx "
        "JOIN en e ON e.tile_x = s.tile_x AND e.tile_y = s.tile_y "
        "AND e.py = s.py AND e.px = s.sx"
    )


def _sorted_neighborhood_sql(window: int = 3, key_len: int = 32,
                             gram_len: int = 64) -> str:
    """SQL twin of textstages.sorted_neighborhood_docs: per-lang
    ROW_NUMBER over (substr key, doc_id), rank-gap ≤ window self-join,
    shared-distinct-trigram counts via list_distinct + list_intersect."""
    return (
        f"WITH d AS (SELECT doc_id, lang, substr(text, 1, {key_len}) "
        f"AS skey, substr(text, 1, {gram_len}) AS t64 FROM documents), "
        "r AS (SELECT doc_id, lang, t64, CAST(ROW_NUMBER() OVER ("
        "PARTITION BY lang ORDER BY skey, doc_id) AS BIGINT) AS rk "
        "FROM d), "
        "g AS MATERIALIZED (SELECT doc_id, lang, rk, "
        "list_distinct(list_transform("
        "generate_series(1, GREATEST(length(t64) - 2, 0)), "
        "i -> substr(t64, i, 3))) AS tg FROM r) "
        "SELECT a.lang, CAST(a.doc_id AS BIGINT) AS id_a, "
        "CAST(b.doc_id AS BIGINT) AS id_b, "
        "CAST(b.rk - a.rk AS BIGINT) AS gap, "
        "CAST(len(list_intersect(a.tg, b.tg)) AS BIGINT) AS n_shared "
        "FROM g a JOIN g b ON b.lang = a.lang AND b.rk > a.rk "
        f"AND b.rk <= a.rk + {window}"
    )


def _attribution_sql(horizon_days: int = 7) -> str:
    """SQL twin of streaming.attribution_events: the naive (purchase ×
    in-window touch) LEFT JOIN with ordered FIRST/LAST aggregates — the
    engine's merge_asof pair computes the same first/last/count without
    materializing the pair blow-up."""
    return (
        "WITH t AS (SELECT user_id, ts, event_id FROM events "
        "WHERE event_type IN ('click', 'view')), "
        "p AS (SELECT event_id, user_id, ts, "
        "CAST(FLOOR(ABS(value*100.0) + 0.5)*SIGN(value) AS BIGINT) "
        "AS cents FROM events WHERE event_type = 'purchase') "
        "SELECT p.event_id, CAST(p.user_id AS BIGINT) AS user_id, "
        "p.cents, CAST(COUNT(t.event_id) AS BIGINT) AS n_touches, "
        "CAST(COALESCE(FIRST(t.event_id ORDER BY t.ts, t.event_id), -1) "
        "AS BIGINT) AS first_touch_id, "
        "CAST(COALESCE(LAST(t.event_id ORDER BY t.ts, t.event_id), -1) "
        "AS BIGINT) AS last_touch_id "
        "FROM p LEFT JOIN t ON t.user_id = p.user_id AND t.ts < p.ts "
        f"AND t.ts >= p.ts - INTERVAL {horizon_days} DAY "
        "GROUP BY p.event_id, p.user_id, p.cents"
    )


def _zorder_layout_sql(grid: int = 256, files_shift: int = 6,
                       bbox: tuple[float, float, float, float] =
                       (-10.0, 30.0, 40.0, 60.0)) -> str:
    """SQL twin of cellindex.zorder_layout_pages: geocode chain, the
    identical float cell binning (inlined scale literals), the Morton
    part1by1 mask ladder on BIGINTs, per-file zone-map aggregates and
    the same integer range-intersection pruning predicate."""
    from . import sqlgen as _sg

    lo_x, lo_y, hi_x, hi_y = bbox
    sx = grid / 360.0
    sy = grid / 180.0
    inner = _sg.chain(f"WITH {pages_sql()} SELECT url FROM pages",
                      _sg.geocode_steps("url"))

    def spread(col: str, tag: str) -> list[tuple[str, str]]:
        a, b, c2 = f"_z{tag}a", f"_z{tag}b", f"_z{tag}c"
        return [
            (a, f"(({col} & 255) | (({col} & 255) << 4)) & 3855"),
            (b, f"(({a} | ({a} << 2)) & 13107)"),
            (c2, f"(({b} | ({b} << 1)) & 21845)"),
        ]

    qlo_x = int(np.floor((lo_x + 180.0) * sx))
    qhi_x = int(np.floor((hi_x + 180.0) * sx))
    qlo_y = int(np.floor((lo_y + 90.0) * sy))
    qhi_y = int(np.floor((hi_y + 90.0) * sy))
    cells = _sg.chain(
        f"SELECT lon, lat, "
        f"CAST(LEAST(FLOOR((lon + CAST(180 AS DOUBLE)) * "
        f"CAST({sx!r} AS DOUBLE)), {grid - 1}) AS BIGINT) AS ix, "
        f"CAST(LEAST(FLOOR((lat + CAST(90 AS DOUBLE)) * "
        f"CAST({sy!r} AS DOUBLE)), {grid - 1}) AS BIGINT) AS iy "
        f"FROM ({inner})",
        spread("ix", "x") + spread("iy", "y")
        + [("fid", "((_zxc | (_zyc << 1)) >> " + str(files_shift) + ")"),
           ("hit", f"CASE WHEN lon >= CAST({lo_x!r} AS DOUBLE) "
                   f"AND lon <= CAST({hi_x!r} AS DOUBLE) "
                   f"AND lat >= CAST({lo_y!r} AS DOUBLE) "
                   f"AND lat <= CAST({hi_y!r} AS DOUBLE) "
                   "THEN 1 ELSE 0 END")])
    return (
        f"WITH g AS MATERIALIZED (SELECT fid, COUNT(*)::BIGINT AS n_rows, "
        "MIN(ix) AS min_ix, MAX(ix) AS max_ix, MIN(iy) AS min_iy, "
        "MAX(iy) AS max_iy, CAST(SUM(hit) AS BIGINT) AS n_hits "
        f"FROM ({cells}) GROUP BY fid) "
        "SELECT CAST(fid AS BIGINT) AS fid, n_rows, "
        "CAST(min_ix AS BIGINT) AS min_ix, CAST(max_ix AS BIGINT) AS "
        "max_ix, CAST(min_iy AS BIGINT) AS min_iy, "
        "CAST(max_iy AS BIGINT) AS max_iy, n_hits, "
        f"CAST(CASE WHEN max_ix >= {qlo_x} AND min_ix <= {qhi_x} "
        f"AND max_iy >= {qlo_y} AND min_iy <= {qhi_y} "
        "THEN 1 ELSE 0 END AS BIGINT) AS need_scan FROM g"
    )


def _rrf_fusion_sql(queries: dict[int, list[str]] | None = None,
                    k_lists: int = 10, k_out: int = 10,
                    rrf_c: int = 60) -> str:
    """SQL twin of textstages.rrf_fusion_docs: the two retrieval oracles
    (_bm25_sql and the ann_cosine ranking) as parenthesized subqueries,
    fused by the integer floor(2^20/(c+rank)) RRF surrogate with −1
    absent-rank markers and (rrf_q DESC, id) top-k_out."""
    if queries is None:
        from ..pipelines.querydefs import BM25_QUERIES
        queries = BM25_QUERIES
    nq = len(queries)
    return (
        f"WITH bm AS (SELECT query_id, doc_id AS id, rn AS r "
        f"FROM ({_bm25_sql(queries, k_lists)})), "
        "co AS (SELECT qid // 50 AS query_id, neighbor_id AS id, rank AS r "
        "FROM (SELECT q.qid, e.vec_id AS neighbor_id, "
        "ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY "
        "list_cosine_similarity(CAST(q.qe AS DOUBLE[]), "
        "CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id ASC) AS rank "
        "FROM (SELECT vec_id AS qid, embedding AS qe FROM embeddings "
        f"WHERE vec_id % 50 = 0 AND vec_id // 50 < {nq}) q "
        f"CROSS JOIN embeddings e) WHERE rank <= {k_lists}), "
        "u AS (SELECT query_id, id, r, 0 AS src FROM bm "
        "UNION ALL SELECT query_id, id, r, 1 AS src FROM co), "
        "g AS MATERIALIZED (SELECT query_id, id, "
        f"CAST(SUM(1048576 // ({rrf_c} + r)) AS BIGINT) AS rrf_q, "
        "CAST(COALESCE(MAX(CASE WHEN src = 0 THEN r END), -1) AS BIGINT) "
        "AS bm25_rank, "
        "CAST(COALESCE(MAX(CASE WHEN src = 1 THEN r END), -1) AS BIGINT) "
        "AS cos_rank FROM u GROUP BY query_id, id) "
        "SELECT CAST(query_id AS BIGINT) AS query_id, "
        "CAST(id AS BIGINT) AS id, rrf_q, bm25_rank, cos_rank, "
        "CAST(rn AS BIGINT) AS rn FROM (SELECT *, ROW_NUMBER() OVER ("
        "PARTITION BY query_id ORDER BY rrf_q DESC, id) AS rn FROM g) "
        f"WHERE rn <= {k_out}"
    )


def _textrank_sql(iters: int = 4, k: int = 50) -> str:
    """SQL twin of textstages.textrank_keywords_docs: positional bigram
    list comprehension, undirected weight aggregation, per-source
    out-weight, and the integer fixed-point recurrence unrolled one
    MATERIALIZED CTE per round — every operation an exact BIGINT sum or
    floor division, identical to the engine's."""
    base = (15 * (1 << 20)) // 100
    rounds = []
    for t in range(1, iters + 1):
        rounds.append(
            f"r{t} AS MATERIALIZED (SELECT d.d2 AS tok, "
            f"CAST({base} + (17 * SUM((d.w * r.r) // d.wt)) // 20 "
            f"AS BIGINT) AS r FROM dir d JOIN r{t - 1} r ON r.tok = d.s "
            "GROUP BY d.d2)")
    return (
        "WITH lt AS (SELECT list_filter(string_split(text, ' '), "
        "x -> x <> '') AS l FROM documents), "
        "bi AS (SELECT UNNEST(list_transform("
        "generate_series(1, len(l) - 1), i -> struct_pack(a := l[i], "
        "b := l[i + 1]))) AS p FROM lt), "
        "ab AS (SELECT p.a AS a, p.b AS b FROM bi WHERE p.a <> p.b), "
        "und AS (SELECT LEAST(a, b) AS u, GREATEST(a, b) AS v, "
        "CAST(COUNT(*) AS BIGINT) AS w FROM ab GROUP BY 1, 2), "
        "dir AS MATERIALIZED (SELECT s, d2, w, "
        "CAST(SUM(w) OVER (PARTITION BY s) AS BIGINT) AS wt FROM ("
        "SELECT u AS s, v AS d2, w FROM und "
        "UNION ALL SELECT v AS s, u AS d2, w FROM und)), "
        "r0 AS (SELECT DISTINCT s AS tok, CAST(1048576 AS BIGINT) AS r "
        "FROM dir), "
        + ", ".join(rounds) + " "
        f"SELECT tok AS token, r AS score_q, CAST(ROW_NUMBER() OVER ("
        f"ORDER BY r DESC, tok) AS BIGINT) AS rn FROM r{iters} "
        f"ORDER BY r DESC, tok LIMIT {k}"
    )


def _als_round_sql(lam: int = 3, k_types: int = 5) -> str:
    """SQL twin of train.als_round_events: exact integer num/den rank-1
    ALS statistics and the single final f64 division."""
    return (
        "WITH r AS (SELECT user_id, event_type, "
        "CAST(COUNT(*) AS BIGINT) AS r FROM events "
        "GROUP BY user_id, event_type), "
        "s AS (SELECT user_id, CAST(SUM(r) AS BIGINT) AS su FROM r "
        "GROUP BY user_id), "
        "den AS (SELECT CAST(SUM(su * su) AS BIGINT) + "
        f"{64 * lam} AS den FROM s) "
        "SELECT r.event_type, "
        "CAST(SUM(8 * r.r * s.su) AS BIGINT) AS y_num, "
        "CAST(den.den AS BIGINT) AS y_den, "
        "CAST(SUM(8 * r.r * s.su) AS BIGINT) / CAST(den.den AS DOUBLE) "
        "AS y_f "
        "FROM r JOIN s ON s.user_id = r.user_id, den "
        "GROUP BY r.event_type, den.den"
    )


def _jenks_sql(k_classes: int = 5, v_scale: int = 1_000_000,
               L: int = 26771144400) -> str:
    """SQL twin of cluster.jenks_breaks_nation: the identical exact
    integer DP ((L // n)·S² terms in HUGEINT), one MATERIALIZED CTE per
    class level, argmax ties to the smaller split index, backtrack as a
    chained boundary CTE per class."""
    fs = ["f1 AS MATERIALIZED (SELECT j, g AS val, CAST(1 AS BIGINT) "
          "AS bi FROM cost WHERE i = 1)"]
    for k in range(2, k_classes + 1):
        fs.append(
            f"f{k} AS MATERIALIZED (SELECT j, val, bi FROM ("
            "SELECT c.j, c.i AS bi, p.val + c.g AS val, "
            "ROW_NUMBER() OVER (PARTITION BY c.j "
            "ORDER BY p.val + c.g DESC, c.i) AS rr "
            f"FROM cost c JOIN f{k - 1} p ON p.j = c.i - 1 "
            f"WHERE c.i >= {k}) WHERE rr = 1)")
    bts = [f"b{k_classes} AS (SELECT f{k_classes}.bi AS i, nn.n AS j "
           f"FROM f{k_classes}, nn WHERE f{k_classes}.j = nn.n)"]
    for k in range(k_classes - 1, 0, -1):
        bts.append(
            f"b{k} AS (SELECT f{k}.bi AS i, b{k + 1}.i - 1 AS j "
            f"FROM f{k}, b{k + 1} WHERE f{k}.j = b{k + 1}.i - 1)")
    cls = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS class_id, i, j FROM b{k}"
        for k in range(1, k_classes + 1))
    return (
        "WITH cents AS (SELECT c.c_nationkey AS nk, "
        "CAST(SUM(CAST(FLOOR(ABS(o_totalprice*100.0) + 0.5)"
        "*SIGN(o_totalprice) AS BIGINT)) AS BIGINT) AS cents "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "GROUP BY 1), "
        f"rv AS (SELECT n.n_name, cents.cents // {v_scale} AS v "
        "FROM cents JOIN nation n ON n.n_nationkey = cents.nk), "
        "rk AS MATERIALIZED (SELECT v, CAST(ROW_NUMBER() OVER ("
        "ORDER BY v, n_name) AS BIGINT) AS r FROM rv), "
        "pp AS MATERIALIZED (SELECT r, v, CAST(SUM(v) OVER ("
        "ORDER BY r) AS BIGINT) AS p FROM rk), "
        "nn AS (SELECT MAX(r) AS n FROM rk), "
        "cost AS MATERIALIZED (SELECT i.r AS i, j.r AS j, "
        f"(CAST({L} AS HUGEINT) // (j.r - i.r + 1)) "
        "* CAST(j.p - COALESCE(ip.p, 0) AS HUGEINT) "
        "* CAST(j.p - COALESCE(ip.p, 0) AS HUGEINT) AS g "
        "FROM pp j JOIN pp i ON i.r <= j.r "
        "LEFT JOIN pp ip ON ip.r = i.r - 1), "
        + ", ".join(fs) + ", " + ", ".join(bts) + ", "
        f"classes AS ({cls}) "
        "SELECT c.class_id, CAST(c.i AS BIGINT) AS i_start, "
        "CAST(c.j AS BIGINT) AS i_end, CAST(c.j - c.i + 1 AS BIGINT) "
        "AS n, CAST(pj.p - COALESCE(pi.p, 0) AS BIGINT) AS sum_v, "
        "CAST(vi.v AS BIGINT) AS v_min, CAST(vj.v AS BIGINT) AS v_max "
        "FROM classes c JOIN pp pj ON pj.r = c.j "
        "LEFT JOIN pp pi ON pi.r = c.i - 1 "
        "JOIN pp vi ON vi.r = c.i JOIN pp vj ON vj.r = c.j"
    )


def _code_switch_sql(win: int = 16) -> str:
    """SQL twin of textstages.code_switch_docs: token windows via list
    slices, per-window marker scores generated from the SAME
    _LANG_MARKERS dict as _lang_id_sql, LAG-based switch counting, modal
    window language with lexicographic tie-break."""
    from geospatial_learn_ray.functions.textproc import _LANG_MARKERS

    codes = sorted(_LANG_MARKERS)
    score_cols = []
    for code in codes:
        words = _LANG_MARKERS[code]
        parts = []
        multi = [w for w in words if len(w) > 1]
        if multi:
            inlist = ", ".join(f"'{w}'" for w in multi)
            parts.append(
                "len(list_filter(regexp_split_to_array(wt, '\\s+'), "
                f"t -> t IN ({inlist})))")
        for w in words:
            if len(w) == 1:
                parts.append(
                    f"(length(wt) - length(replace(wt, '{w}', '')))")
        score_cols.append(f"({' + '.join(parts)}) AS s_{code}")
    m = "GREATEST(" + ", ".join(f"s_{c}" for c in codes) + ")"
    case = " ".join(f"WHEN s_{c} = {m} THEN '{c}'" for c in codes)
    return (
        "WITH lt AS (SELECT doc_id, list_filter("
        "regexp_split_to_array(text, '\\s+'), x -> x <> '') AS l "
        "FROM documents), "
        "wi AS (SELECT doc_id, l, UNNEST(generate_series(0, "
        f"(len(l) - 1) // {win})) AS w FROM lt WHERE len(l) > 0), "
        "wt AS (SELECT doc_id, w, array_to_string("
        f"l[w*{win} + 1 : LEAST((w + 1)*{win}, len(l))], ' ') AS wt "
        "FROM wi), "
        f"sc AS (SELECT doc_id, w, {', '.join(score_cols)} FROM wt), "
        f"lg AS MATERIALIZED (SELECT doc_id, w, CASE WHEN {m} = 0 "
        f"THEN 'und' {case} END AS lang FROM sc), "
        "sw AS (SELECT doc_id, COUNT(*) AS n_windows, "
        "SUM(CASE WHEN lang <> 'und' AND prev <> 'und' "
        "AND prev IS NOT NULL AND lang <> prev THEN 1 ELSE 0 END) AS "
        "n_switch FROM (SELECT doc_id, lang, LAG(lang) OVER ("
        "PARTITION BY doc_id ORDER BY w) AS prev FROM lg) GROUP BY 1), "
        "nl AS (SELECT doc_id, COUNT(DISTINCT lang) AS n_lang FROM lg "
        "WHERE lang <> 'und' GROUP BY 1), "
        "md AS (SELECT doc_id, lang AS main_lang FROM ("
        "SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY doc_id "
        "ORDER BY COUNT(*) DESC, lang) AS rr FROM lg "
        "GROUP BY doc_id, lang) WHERE rr = 1) "
        "SELECT sw.doc_id, CAST(sw.n_windows AS BIGINT) AS n_windows, "
        "CAST(sw.n_switch AS BIGINT) AS n_switch, "
        "CAST(COALESCE(nl.n_lang, 0) AS BIGINT) AS n_lang, "
        "md.main_lang FROM sw "
        "LEFT JOIN nl ON nl.doc_id = sw.doc_id "
        "JOIN md ON md.doc_id = sw.doc_id"
    )


def _source_overlap_sql(gram: int = 8) -> str:
    """SQL twin of textstages.source_overlap_docs: positional shingle
    lists, bit_or source masks per DISTINCT shingle (the engine groups
    by the 64-bit shingle hash — collision-free at any realistic corpus,
    the exact_text_dedup precedent), mask histogram, pair counts via a
    bit-test cross join over the observed source-id range."""
    return (
        "WITH lt AS (SELECT CAST(REPLACE(source, 'src', '') AS BIGINT) "
        "AS src, list_filter(regexp_split_to_array(text, '\\s+'), "
        "x -> x <> '') AS l FROM documents), "
        "sh AS (SELECT src, UNNEST(list_transform("
        f"generate_series(1, len(l) - {gram - 1}), "
        f"i -> array_to_string(l[i : i + {gram - 1}], ' '))) AS g8 "
        f"FROM lt WHERE len(l) >= {gram}), "
        "mk AS MATERIALIZED (SELECT CAST(bit_or(CAST(1 AS BIGINT) << src) "
        "AS BIGINT) AS m FROM sh GROUP BY g8), "
        "hist AS MATERIALIZED (SELECT m, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM mk GROUP BY m), "
        "nb AS (SELECT MAX(src) AS hi FROM sh), "
        "si AS (SELECT UNNEST(generate_series(0, (SELECT hi FROM nb))) "
        "AS i) "
        "SELECT CAST(a.i AS BIGINT) AS src_a, CAST(b.i AS BIGINT) AS "
        "src_b, CAST(COALESCE(SUM(CASE WHEN ((h.m >> CAST(a.i AS BIGINT)"
        ") & 1) = 1 AND ((h.m >> CAST(b.i AS BIGINT)) & 1) = 1 THEN h.c "
        "ELSE 0 END), 0) AS BIGINT) AS n_shared "
        "FROM si a JOIN si b ON b.i > a.i LEFT JOIN hist h ON TRUE "
        "GROUP BY a.i, b.i"
    )


def _tasseled_cap_sql(side: int = 32, quant: float = 64.0) -> str:
    """SQL twin of raster.tasseled_cap_stage: the same floor(v*quant+0.5)
    quantization off the rast CTE, the same six derived integer bands (all
    mods on shifted non-negative ints, where numpy % == SQL %), and the
    published coefficients x 10^4 as integer literals — every output is an
    exact BIGINT, so the value-hash match is unconditional."""
    from ..stages.raster import TC_BRIGHT, TC_GREEN, TC_WET

    bands = ["qs", "2*qs + 5", "3*qs + 7", "(qs*qs) % 101",
             "(5*qs + 3) % 83", "(7*qs + 11) % 59"]

    def dot(coefs) -> str:
        return " + ".join(f"({c})*({b})" for c, b in zip(coefs, bands))

    return (
        f"WITH {tiles_sql(side)}, "
        "qq AS (SELECT tile_x, tile_y, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE) + CAST(0.5 AS DOUBLE))"
        " AS BIGINT) + 128 AS qs FROM rast), "
        f"tc AS (SELECT tile_x, tile_y, {dot(TC_BRIGHT)} AS bright, "
        f"{dot(TC_GREEN)} AS green, {dot(TC_WET)} AS wet FROM qq) "
        "SELECT CAST(tile_x AS BIGINT) AS tile_x, "
        "CAST(tile_y AS BIGINT) AS tile_y, "
        "CAST(COUNT(*) AS BIGINT) AS n_px, "
        "CAST(SUM(bright) AS BIGINT) AS bright_sum, "
        "CAST(SUM(green) AS BIGINT) AS green_sum, "
        "CAST(SUM(wet) AS BIGINT) AS wet_sum, "
        "CAST(MAX(bright) AS BIGINT) AS bright_max, "
        "CAST(MIN(green) AS BIGINT) AS green_min "
        "FROM tc GROUP BY tile_x, tile_y"
    )


def _bilinear_resample_sql(side: int = 16, quant: float = 64.0,
                           tx_max: int = 15, ty_max: int = 15) -> str:
    """SQL twin of raster.bilinear_resample_stage: the clamped right/down
    neighbors come from LEAD(..., 1, <self>) windows (default = clamp),
    even output rows reduce as SUM(6q + 2qr) with LEAST/GREATEST over the
    two interleaved pixel forms, odd rows as SUM(3q + qr + 3qd + qdr) —
    all exact BIGINT arithmetic."""
    return (
        f"WITH {tiles_sql(side)}, "
        "qq AS (SELECT tile_x, tile_y, py, px, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE) + CAST(0.5 AS DOUBLE))"
        " AS BIGINT) + 128 AS q FROM rast "
        f"WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        "n1 AS (SELECT *, LEAD(q, 1, q) OVER "
        "(PARTITION BY tile_x, tile_y, py ORDER BY px) AS qr FROM qq), "
        "n2 AS (SELECT *, "
        "LEAD(q, 1, q) OVER (PARTITION BY tile_x, tile_y, px ORDER BY py)"
        " AS qd, "
        "LEAD(qr, 1, qr) OVER (PARTITION BY tile_x, tile_y, px ORDER BY "
        "py) AS qdr FROM n1) "
        "SELECT CAST(tile_x AS BIGINT) AS tile_x, "
        "CAST(tile_y AS BIGINT) AS tile_y, CAST(2*py AS BIGINT) AS oy, "
        "CAST(SUM(6*q + 2*qr) AS BIGINT) AS row_sum, "
        "CAST(MIN(LEAST(4*q, 2*(q + qr))) AS BIGINT) AS row_min, "
        "CAST(MAX(GREATEST(4*q, 2*(q + qr))) AS BIGINT) AS row_max "
        "FROM n2 GROUP BY tile_x, tile_y, py "
        "UNION ALL "
        "SELECT CAST(tile_x AS BIGINT), CAST(tile_y AS BIGINT), "
        "CAST(2*py + 1 AS BIGINT), "
        "CAST(SUM(3*q + qr + 3*qd + qdr) AS BIGINT), "
        "CAST(MIN(LEAST(2*(q + qd), q + qr + qd + qdr)) AS BIGINT), "
        "CAST(MAX(GREATEST(2*(q + qd), q + qr + qd + qdr)) AS BIGINT) "
        "FROM n2 GROUP BY tile_x, tile_y, py"
    )


def _regex_funnel_sql() -> str:
    """SQL twin of streaming.regex_funnel_events: string_agg the per-user
    code string in the same (ts, event_id) total order, then RE2
    regexp_extract_all counts the same non-overlapping matches (leftmost
    greedy scan in both engines for these patterns); max view run is
    list_max over the lengths of ``v+`` matches."""
    return (
        "WITH t AS (SELECT user_id, ts, event_id, "
        "CASE event_type WHEN 'signup' THEN 's' WHEN 'click' THEN 'c' "
        "WHEN 'error' THEN 'e' WHEN 'view' THEN 'v' "
        "WHEN 'purchase' THEN 'p' END AS code FROM events), "
        "s AS (SELECT user_id, string_agg(code, '' ORDER BY ts, event_id)"
        " AS seq FROM t GROUP BY user_id) "
        "SELECT CAST(user_id AS BIGINT) AS user_id, "
        "CAST(len(seq) AS BIGINT) AS n_events, "
        "CAST(len(regexp_extract_all(seq, 'v+p')) AS BIGINT) AS n_funnel, "
        "CAST(len(regexp_extract_all(seq, 'e+[cv]')) AS BIGINT) AS "
        "n_retry, "
        "CAST(COALESCE(list_max(list_transform("
        "regexp_extract_all(seq, 'v+'), x -> len(x))), 0) AS BIGINT) AS "
        "max_view_run FROM s"
    )


def _betweenness_sql(k_pivots: int = 4, rounds: int = 4,
                     out_links: int = 4, host_mod: int = 1000) -> str:
    """SQL twin of graph.betweenness_hosts: the closeness BFS CTE chain
    (same pivot draw, same unrolled min-plus distance rounds) extended
    with per-level sigma CTEs — sig_l holds exactly the depth-l nodes,
    each row the SUM of its depth-(l-1) neighbors' sigmas (exact
    BIGINTs) — then the pivot-pair dependency joins: v is on a shortest
    s-t path iff d_sv + d_tv = d_st, contributing sigma_sv * sigma_tv."""
    inf = 1 << 40
    lk_base = (
        "SELECT CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) AS src, "
        "url || '#out' || CAST(kr.range AS VARCHAR) AS tok "
        f"FROM pages, range(0, {out_links}) kr"
    )
    lk_inner = _sg.chain(
        lk_base,
        [("_f", _sg.fnv1a64_expr("tok")), *_sg.splitmix64_steps("_f", "_h", "cl")])
    draw_inner = _sg.chain(
        "SELECT node, CAST(node AS HUGEINT) AS nu FROM nodes",
        [*_sg.splitmix64_steps("nu", "_dw", "cld")])
    ctes = [
        f"lk AS MATERIALIZED (SELECT src, CAST(_h % {host_mod} AS BIGINT) AS dst "
        f"FROM ({lk_inner}))",
        "ua AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM lk WHERE src <> dst)",
        "adj AS MATERIALIZED (SELECT a AS v, b AS u FROM ua "
        "UNION ALL SELECT b AS v, a AS u FROM ua)",
        "nodes AS MATERIALIZED (SELECT DISTINCT v AS node FROM adj)",
        f"srcs AS MATERIALIZED (SELECT node AS s FROM ({draw_inner}) "
        f"QUALIFY ROW_NUMBER() OVER (ORDER BY _dw, node) <= {k_pivots})",
        "d0 AS MATERIALIZED (SELECT srcs.s, nodes.node, "
        "CASE WHEN nodes.node = srcs.s THEN CAST(0 AS BIGINT) "
        f"ELSE CAST({inf} AS BIGINT) END AS q FROM srcs, nodes)",
    ]
    for t in range(1, rounds + 1):
        ctes.append(
            f"d{t} AS MATERIALIZED (SELECT s, node, MIN(q) AS q FROM ("
            f"SELECT s, node, q FROM d{t - 1} "
            f"UNION ALL SELECT d.s, adj.v AS node, d.q + 1 AS q "
            f"FROM adj JOIN d{t - 1} d ON d.node = adj.u) GROUP BY s, node)")
    ctes.append("sig0 AS MATERIALIZED (SELECT s, s AS node, "
                "CAST(1 AS BIGINT) AS sig FROM srcs)")
    for t in range(1, rounds + 1):
        ctes.append(
            f"sig{t} AS MATERIALIZED (SELECT p.s, adj.v AS node, "
            f"CAST(SUM(p.sig) AS BIGINT) AS sig "
            f"FROM adj JOIN sig{t - 1} p ON p.node = adj.u "
            f"JOIN d{rounds} dv ON dv.s = p.s AND dv.node = adj.v "
            f"WHERE dv.q = {t} GROUP BY p.s, adj.v)")
    sig_union = " UNION ALL ".join(
        f"SELECT * FROM sig{t}" for t in range(rounds + 1))
    ctes.append(f"sig AS MATERIALIZED ({sig_union})")
    ctes.append(
        f"dfin AS MATERIALIZED (SELECT s, node, q FROM d{rounds} "
        f"WHERE q < {inf})")
    ctes.append("pr AS (SELECT a.s AS s1, b.s AS s2 FROM srcs a "
                "JOIN srcs b ON b.s > a.s)")
    ctes.append("pd AS (SELECT pr.s1, pr.s2, d.q AS dq FROM pr "
                "JOIN dfin d ON d.s = pr.s1 AND d.node = pr.s2)")
    return (
        f"WITH {pages_sql()}, " + ", ".join(ctes) + " "
        "SELECT CAST(pd.s1 AS BIGINT) AS s1, CAST(pd.s2 AS BIGINT) AS s2, "
        "CAST(d1.node AS BIGINT) AS node, "
        "CAST(g1.sig * g2.sig AS BIGINT) AS pt, "
        "CAST(0 AS BIGINT) AS is_end "
        "FROM pd "
        "JOIN dfin d1 ON d1.s = pd.s1 "
        "JOIN dfin d2 ON d2.s = pd.s2 AND d2.node = d1.node "
        "JOIN sig g1 ON g1.s = pd.s1 AND g1.node = d1.node "
        "JOIN sig g2 ON g2.s = pd.s2 AND g2.node = d1.node "
        "WHERE d1.q + d2.q = pd.dq "
        "AND d1.node <> pd.s1 AND d1.node <> pd.s2 "
        "UNION ALL "
        "SELECT CAST(pd.s1 AS BIGINT), CAST(pd.s2 AS BIGINT), "
        "CAST(pd.s2 AS BIGINT), CAST(g.sig AS BIGINT), CAST(1 AS BIGINT) "
        "FROM pd JOIN sig g ON g.s = pd.s1 AND g.node = pd.s2"
    )


def _mmr_rerank_sql(k: int = 10, n_cand: int = 64, scale: float = 128.0,
                    dim: int = 64) -> str:
    """SQL twin of knn.mmr_rerank: identical integer quantization, the
    same top-n_cand candidate cut (rel DESC, vec_id), and the greedy
    selection unrolled as k QUALIFY-argmax CTE rounds over the integer
    candidate dot matrix."""
    qexpr = (f"list_transform(embedding, x -> CAST(FLOOR(CAST(x AS "
             f"DOUBLE) * CAST({scale!r} AS DOUBLE) + CAST(0.5 AS DOUBLE))"
             f" AS BIGINT))")
    dot = (f"CAST(list_sum(list_transform(generate_series(1, {dim}), "
           "i -> {a}.qe[i] * {b}.qe[i])) AS BIGINT)")
    ctes = [
        f"ev AS MATERIALIZED (SELECT vec_id, {qexpr} AS qe "
        "FROM embeddings)",
        "qm AS (SELECT MIN(vec_id) AS qid FROM embeddings)",
        "qq AS (SELECT qe FROM ev, qm WHERE vec_id = qid)",
        "rel AS (SELECT e.vec_id, "
        + dot.format(a="e", b="q") + " AS rel, e.qe "
        "FROM ev e, qq q, qm WHERE e.vec_id <> qm.qid)",
        f"cand AS MATERIALIZED (SELECT vec_id, rel, qe FROM rel "
        f"QUALIFY ROW_NUMBER() OVER (ORDER BY rel DESC, vec_id) "
        f"<= {n_cand})",
        "dots AS MATERIALIZED (SELECT a.vec_id AS va, b.vec_id AS vb, "
        + dot.format(a="a", b="b") + " AS d "
        "FROM cand a JOIN cand b ON b.vec_id <> a.vec_id)",
        "s1 AS MATERIALIZED (SELECT CAST(1 AS BIGINT) AS rank, vec_id, "
        "rel, 2*rel AS score FROM cand "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY rel DESC, vec_id) = 1)",
    ]
    for t in range(2, k + 1):
        ctes.append(
            f"s{t} AS MATERIALIZED (SELECT * FROM s{t - 1} UNION ALL "
            f"(SELECT CAST({t} AS BIGINT), j.vec_id, j.rel, j.score "
            "FROM (SELECT c.vec_id, c.rel, 2*c.rel - MAX(d.d) AS score "
            "FROM cand c JOIN dots d ON d.va = c.vec_id "
            f"JOIN s{t - 1} s ON s.vec_id = d.vb "
            f"WHERE c.vec_id NOT IN (SELECT vec_id FROM s{t - 1}) "
            "GROUP BY c.vec_id, c.rel) j "
            "QUALIFY ROW_NUMBER() OVER "
            "(ORDER BY j.score DESC, j.vec_id) = 1))")
    return (
        "WITH " + ", ".join(ctes) +
        f" SELECT CAST(rank AS BIGINT) AS rank, "
        "CAST(vec_id AS BIGINT) AS vec_id, CAST(rel AS BIGINT) AS rel, "
        f"CAST(score AS BIGINT) AS score FROM s{k}"
    )


def _cart_depth2_sql() -> str:
    """SQL twin of train.cart_depth2_lineitem: long-form (f, v, y)
    histograms, cumulative window sums per feature, the identical
    weighted-purity f64 expression (sl/nl + sr/nr over exact BIGINT
    squares), argmax by (score DESC, f ASC, thr ASC), children re-scored
    conditioned on the root pick; splitless children emit the (-1, -1,
    n, c1, -1) leaf marker."""
    score = ("CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE) "
             "+ CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE)")
    sq = ("CAST(FLOOR((" + score + ") * CAST(1048576.0 AS DOUBLE) "
          "+ CAST(0.5 AS DOUBLE)) AS BIGINT)")
    return (
        "WITH ft AS MATERIALIZED (SELECT CAST(l_quantity AS BIGINT) AS f0, "
        "  CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS f1, "
        "  CAST(ROUND(l_tax * 100, 0) AS BIGINT) AS f2, "
        "  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y FROM lineitem), "
        "h0 AS MATERIALIZED ("
        "  SELECT 0 AS f, f0 AS v, y, COUNT(*) AS n FROM ft GROUP BY 2, 3 "
        "  UNION ALL SELECT 1, f1, y, COUNT(*) FROM ft GROUP BY 2, 3 "
        "  UNION ALL SELECT 2, f2, y, COUNT(*) FROM ft GROUP BY 2, 3), "
        "pv AS (SELECT f, v, CAST(SUM(CASE WHEN y = 0 THEN n ELSE 0 END) AS BIGINT) AS a0, "
        "  CAST(SUM(CASE WHEN y = 1 THEN n ELSE 0 END) AS BIGINT) AS a1 FROM h0 GROUP BY 1, 2), "
        "cum AS (SELECT f, v, "
        "  CAST(SUM(a0) OVER w AS BIGINT) AS c0, CAST(SUM(a1) OVER w AS BIGINT) AS c1, "
        "  CAST(SUM(a0) OVER (PARTITION BY f) AS BIGINT) AS t0, "
        "  CAST(SUM(a1) OVER (PARTITION BY f) AS BIGINT) AS t1, "
        "  MAX(v) OVER (PARTITION BY f) AS vmax FROM pv "
        "  WINDOW w AS (PARTITION BY f ORDER BY v)), "
        "sc AS (SELECT f, v AS thr, c0 + c1 AS nl, (t0 - c0) + (t1 - c1) AS nr, "
        "  c0*c0 + c1*c1 AS sl, (t0 - c0)*(t0 - c0) + (t1 - c1)*(t1 - c1) AS sr "
        "  FROM cum WHERE v < vmax AND c0 + c1 > 0 AND (t0 - c0) + (t1 - c1) > 0), "
        "root AS (SELECT f, thr, nl, nr, sl, sr FROM sc "
        f"  ORDER BY {score} DESC, f ASC, thr ASC LIMIT 1), "
        "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "  CAST(SUM(y) AS BIGINT) AS c1 FROM ft), "
        "fts AS MATERIALIZED (SELECT ft.*, CASE WHEN "
        "  (CASE root.f WHEN 0 THEN f0 WHEN 1 THEN f1 ELSE f2 END) <= root.thr "
        "  THEN 0 ELSE 1 END AS side FROM ft, root), "
        "h2 AS MATERIALIZED ("
        "  SELECT side, 0 AS f, f0 AS v, y, COUNT(*) AS n FROM fts GROUP BY 1, 3, 4 "
        "  UNION ALL SELECT side, 1, f1, y, COUNT(*) FROM fts GROUP BY 1, 3, 4 "
        "  UNION ALL SELECT side, 2, f2, y, COUNT(*) FROM fts GROUP BY 1, 3, 4), "
        "pv2 AS (SELECT side, f, v, CAST(SUM(CASE WHEN y = 0 THEN n ELSE 0 END) AS BIGINT) AS a0, "
        "  CAST(SUM(CASE WHEN y = 1 THEN n ELSE 0 END) AS BIGINT) AS a1 FROM h2 GROUP BY 1, 2, 3), "
        "cum2 AS (SELECT side, f, v, "
        "  CAST(SUM(a0) OVER w AS BIGINT) AS c0, CAST(SUM(a1) OVER w AS BIGINT) AS c1, "
        "  CAST(SUM(a0) OVER (PARTITION BY side, f) AS BIGINT) AS t0, "
        "  CAST(SUM(a1) OVER (PARTITION BY side, f) AS BIGINT) AS t1, "
        "  MAX(v) OVER (PARTITION BY side, f) AS vmax FROM pv2 "
        "  WINDOW w AS (PARTITION BY side, f ORDER BY v)), "
        "sc2 AS (SELECT side, f, v AS thr, c0 + c1 AS nl, (t0 - c0) + (t1 - c1) AS nr, "
        "  c0*c0 + c1*c1 AS sl, (t0 - c0)*(t0 - c0) + (t1 - c1)*(t1 - c1) AS sr "
        "  FROM cum2 WHERE v < vmax AND c0 + c1 > 0 AND (t0 - c0) + (t1 - c1) > 0), "
        "pick2 AS (SELECT side, f, thr, nl, nr, sl, sr, "
        f"  ROW_NUMBER() OVER (PARTITION BY side ORDER BY {score} DESC, f ASC, thr ASC) AS rr "
        "  FROM sc2), "
        "st AS (SELECT side, CAST(COUNT(*) AS BIGINT) AS n, "
        "  CAST(SUM(y) AS BIGINT) AS c1 FROM fts GROUP BY side) "
        "SELECT CAST(0 AS BIGINT) AS node, CAST(r.f AS BIGINT) AS feature, "
        "CAST(r.thr AS BIGINT) AS threshold, t.n, t.c1, "
        f"{sq} AS score_q FROM root r, tot t "
        "UNION ALL "
        "SELECT CAST(s.side + 1 AS BIGINT), CAST(COALESCE(p.f, -1) AS BIGINT), "
        "CAST(COALESCE(p.thr, -1) AS BIGINT), s.n, s.c1, "
        "COALESCE(CAST(FLOOR((CAST(p.sl AS DOUBLE) / CAST(p.nl AS DOUBLE) "
        "+ CAST(p.sr AS DOUBLE) / CAST(p.nr AS DOUBLE)) * CAST(1048576.0 AS DOUBLE) "
        "+ CAST(0.5 AS DOUBLE)) AS BIGINT), -1) AS score_q "
        "FROM st s LEFT JOIN (SELECT * FROM pick2 WHERE rr = 1) p USING (side)"
    )


def _ann_binary_sql(k: int = 10, n_cand: int = 40, qscale: float = 64.0) -> str:
    """SQL twin of knn.binary_quant_topk: Hamming = the direct sign
    disagreement count over dims (no bit packing needed SQL-side),
    candidates = ROW_NUMBER over (ham ASC, vec_id ASC) <= n_cand, rerank
    score = the identical f64 chain over exact integer-quantized dot and
    norms (zero-norm guard -2)."""
    return (
        "WITH q AS MATERIALIZED (SELECT vec_id AS qid, embedding AS qe "
        "FROM embeddings WHERE vec_id % 50 = 0), "
        "ham AS MATERIALIZED (SELECT q.qid AS query_id, e.vec_id AS neighbor_id, "
        "  SUM(CASE WHEN (q.qe[i.range] > 0) <> (e.embedding[i.range] > 0) "
        "  THEN 1 ELSE 0 END) AS h "
        "  FROM q CROSS JOIN embeddings e CROSS JOIN range(1, 65) i "
        "  GROUP BY 1, 2), "
        "cand AS MATERIALIZED (SELECT query_id, neighbor_id FROM ham "
        "  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id "
        f"  ORDER BY h ASC, neighbor_id ASC) <= {n_cand}), "
        "xq AS MATERIALIZED (SELECT vec_id, i.range AS i, "
        f"  CAST(FLOOR(CAST(embedding[i.range] AS DOUBLE) * CAST({qscale!r} AS DOUBLE) "
        "  + CAST(0.5 AS DOUBLE)) AS BIGINT) AS v "
        "  FROM embeddings CROSS JOIN range(1, 65) i), "
        "nrm AS MATERIALIZED (SELECT vec_id, SUM(v * v) AS n2 FROM xq GROUP BY vec_id), "
        "sc AS (SELECT c.query_id, c.neighbor_id, "
        "  SUM(a.v * b.v) AS dot, ANY_VALUE(na.n2) AS qn, ANY_VALUE(nb.n2) AS xn "
        "  FROM cand c "
        "  JOIN xq a ON a.vec_id = c.query_id "
        "  JOIN xq b ON b.vec_id = c.neighbor_id AND b.i = a.i "
        "  JOIN nrm na ON na.vec_id = c.query_id "
        "  JOIN nrm nb ON nb.vec_id = c.neighbor_id "
        "  GROUP BY 1, 2), "
        "rk AS (SELECT query_id, neighbor_id, "
        "  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY "
        "  CASE WHEN xn > 0 AND qn > 0 THEN CAST(dot AS DOUBLE) "
        "  / SQRT(CAST(xn * qn AS DOUBLE)) ELSE -2.0 END DESC, "
        "  neighbor_id ASC) AS rank FROM sc) "
        f"SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM rk WHERE rank <= {k}"
    )


def _zonemap_sql(zone_width: int = 256, pred_lo: int = 45,
                 pred_hi: int = 50) -> str:
    """SQL twin of agg.zonemap_stats: zones are l_orderkey // width; all
    outputs exact integers, prunable = the disjointness test."""
    return (
        f"SELECT l_orderkey // {zone_width} AS zone, "
        "CAST(COUNT(*) AS BIGINT) AS n_rows, "
        "CAST(MIN(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v_min, "
        "CAST(MAX(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v_max, "
        f"CAST(CASE WHEN MAX(CAST(l_quantity AS BIGINT)) < {pred_lo} "
        f"OR MIN(CAST(l_quantity AS BIGINT)) > {pred_hi} THEN 1 ELSE 0 END "
        "AS BIGINT) AS prunable "
        "FROM lineitem GROUP BY 1"
    )


def _registry_pipeline_sql() -> str:
    """SQL twin of the named-registry pipeline query (drop_empty_text →
    add_n_chars → lang_char_range)."""
    return (
        "SELECT lang, CAST(MIN(length(text)) AS BIGINT) AS mn, "
        "CAST(MAX(length(text)) AS BIGINT) AS mx, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM documents WHERE length(text) > 0 GROUP BY lang"
    )


def _gated_corpus_sql(quality_min: float = 0.5, cap_k: int = 3) -> str:
    """SQL twin of textstages.gated_corpus_pages: robots NOT-matched +
    the standard quality fragment + per-host ROW_NUMBER over the signed
    url-hash draw. ``pages`` must be provided by the caller (pages_sql
    prefix added at registration)."""
    ws = "GREATEST(len(regexp_extract_all(text, '\\S+')), 1)"
    punct = "len(regexp_extract_all(text, '[^\\w\\s]'))"
    stop = ("(" + " + ".join(
        f"len(regexp_extract_all(text, '\\b{w}\\b'))"
        for w in ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"))
        + ")")
    draw_inner = _sg.chain(
        "SELECT host, url FROM kept",
        [("_f", _sg.fnv1a64_expr("url")), *_sg.splitmix64_steps("_f", "dh", "gc")])
    return (
        "hp AS (SELECT url, text, "
        "  regexp_extract(url, '^https?://([^/]+)(/.*)?$', 1) AS rhost, "
        "  COALESCE(NULLIF(regexp_extract(url, '^https?://([^/]+)(/.*)?$', 2), ''), '/') AS path "
        "  FROM pages), "
        "kept AS (SELECT CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) AS host, url "
        "  FROM hp WHERE NOT (rhost = 'site-7.example' AND starts_with(path, '/')) "
        "  AND NOT starts_with(path, '/src3/') "
        "  AND NOT (rhost = 'site-13.example' AND starts_with(path, '/src1')) "
        "  AND ROUND(0.4 * LEAST(length(text)::BIGINT / 500.0, 1.0) "
        f"  + 0.3 * LEAST(({stop}::DOUBLE / {ws}) * 5.0, 1.0) "
        f"  + 0.3 * (1.0 - LEAST(({punct}::DOUBLE / GREATEST(length(text), 1)) * 10.0, 1.0)), 4) "
        f"  >= CAST({quality_min!r} AS DOUBLE)), "
        f"dr AS (SELECT host, url, {_sg.u64_to_i64('dh')} AS draw FROM ({draw_inner})) "
        "SELECT host, url FROM dr "
        f"QUALIFY ROW_NUMBER() OVER (PARTITION BY host ORDER BY draw ASC, url ASC) <= {cap_k}"
    )


def _incremental_stats_sql() -> str:
    """SQL twin of agg.incremental_stats: the merged incremental result
    equals the full recompute (partial-moment associativity)."""
    return (
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS count, "
        "ROUND(SUM(value), 4) AS sum_value, ROUND(AVG(value), 4) AS mean_value, "
        "ROUND(MIN(value), 4) AS min_value, ROUND(MAX(value), 4) AS max_value "
        "FROM events GROUP BY event_type"
    )


def _matryoshka_sql(k: int = 10, prefix_dim: int = 16, full_dim: int = 64,
                    qscale: float = 64.0) -> str:
    """SQL twin of knn.matryoshka_overlap: two quantized-cosine rankings
    (full vs prefix dims — the ann_binary rerank metric), overlap counts
    via top-k set joins."""
    def ranking(dims: int, name: str) -> str:
        return (
            f"x{name} AS MATERIALIZED (SELECT vec_id, i.range AS i, "
            f"CAST(FLOOR(CAST(embedding[i.range] AS DOUBLE) * CAST({qscale!r} AS DOUBLE) "
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT) AS v "
            f"FROM embeddings CROSS JOIN range(1, {dims + 1}) i), "
            f"n{name} AS MATERIALIZED (SELECT vec_id, SUM(v * v) AS n2 FROM x{name} GROUP BY vec_id), "
            f"t{name} AS MATERIALIZED (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
            "ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY "
            "CASE WHEN ne.n2 > 0 AND nq.n2 > 0 THEN CAST(s.dot AS DOUBLE) "
            "/ SQRT(CAST(ne.n2 * nq.n2 AS DOUBLE)) ELSE -2.0 END DESC, "
            "e.vec_id ASC) AS rank "
            "FROM (SELECT vec_id FROM embeddings WHERE vec_id % 50 = 0) q "
            "CROSS JOIN embeddings e "
            f"JOIN (SELECT a.vec_id AS qid, b.vec_id AS nid, SUM(a.v * b.v) AS dot "
            f"  FROM x{name} a JOIN x{name} b ON b.i = a.i "
            "  WHERE a.vec_id % 50 = 0 GROUP BY 1, 2) s "
            "  ON s.qid = q.vec_id AND s.nid = e.vec_id "
            f"JOIN n{name} nq ON nq.vec_id = q.vec_id "
            f"JOIN n{name} ne ON ne.vec_id = e.vec_id)"
        )

    half = (k + 1) // 2
    return (
        f"WITH {ranking(full_dim, 'f')}, {ranking(prefix_dim, 'p')} "
        "SELECT f.query_id, "
        f"CAST(COUNT(*) FILTER (f.rank <= {k} AND p.rank IS NOT NULL) AS BIGINT) AS overlap_k, "
        f"CAST(COUNT(*) FILTER (f.rank <= {half} AND p.rank <= {half}) AS BIGINT) AS overlap_half "
        f"FROM (SELECT * FROM tf WHERE rank <= {k}) f "
        f"LEFT JOIN (SELECT * FROM tp WHERE rank <= {k}) p "
        "ON p.query_id = f.query_id AND p.neighbor_id = f.neighbor_id "
        "GROUP BY f.query_id"
    )


def _dataset_fingerprint_sql(n_shards: int = 16) -> str:
    """SQL twin of dedup.dataset_fingerprint: identical
    splitmix64(fnv1a64(text)) content hashes, per-shard HUGEINT sums
    masked to 2⁶⁴ (the engine's uint64 wrap), root = masked sum of
    splitmix64(digest ⊕ shard); digests emitted as the signed i64
    bit-view."""
    m = (1 << 64) - 1
    inner = _sg.chain(
        "SELECT doc_id, text FROM documents",
        [("_f", _sg.fnv1a64_expr("text")), *_sg.splitmix64_steps("_f", "h", "df")])
    root_inner = _sg.chain(
        "SELECT shard, digu FROM sh",
        _sg.splitmix64_steps(_sg.u64_xor("digu", "shard"), "rh", "rt"))
    return (
        f"WITH hx AS MATERIALIZED (SELECT doc_id % {n_shards} AS shard, "
        f"doc_id, h FROM ({inner})), "
        "sh AS MATERIALIZED (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n, "
        f"(SUM(CAST(h AS HUGEINT)) & {m}) AS digu, "
        "CAST(MIN(doc_id) AS BIGINT) AS mn, CAST(MAX(doc_id) AS BIGINT) AS mx "
        "FROM hx GROUP BY shard), "
        f"rt AS (SELECT (SUM(rh) & {m}) AS rdig FROM ({root_inner})) "
        "SELECT CAST(shard AS BIGINT) AS shard, n, "
        f"{_sg.u64_to_i64('digu')} AS dig, mn, mx FROM sh "
        "UNION ALL "
        "SELECT CAST(-1 AS BIGINT), (SELECT CAST(SUM(n) AS BIGINT) FROM sh), "
        f"{_sg.u64_to_i64('rdig')}, (SELECT MIN(mn) FROM sh), "
        "(SELECT MAX(mx) FROM sh) FROM rt"
    )


def _hopping_distinct_sql(window_hours: int = 2, hop_hours: int = 1) -> str:
    """SQL twin of streaming.hopping_distinct_users."""
    n_wins = window_hours // hop_hours
    hop_us = hop_hours * 3600000000
    return (
        "SELECT win_start, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
        f"FROM (SELECT user_id, make_timestamp(epoch_us(ts) // {hop_us} * {hop_us}) "
        f"- to_microseconds(k.range * {hop_us}) AS win_start "
        f"FROM events, range(0, {n_wins}) k) GROUP BY win_start"
    )


def _tokenizer_fertility_sql() -> str:
    """SQL twin of textstages.tokenizer_fertility_docs: identical regex
    token rules (RE2 and Python re agree on these leftmost-greedy
    classes), integer sums, power-of-two-quantized ratios with the
    engine's divide-then-scale op order."""
    sub_re = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return (
        "WITH d AS (SELECT lang, "
        "len(regexp_extract_all(text, '\\S+')) AS words, "
        f"len(regexp_extract_all(text, '{sub_re}')) AS sub, "
        "octet_length(encode(text)) AS nbytes FROM documents) "
        "SELECT lang, CAST(SUM(words) AS BIGINT) AS words, "
        "CAST(SUM(sub) AS BIGINT) AS sub, "
        "CAST(SUM(nbytes) AS BIGINT) AS nbytes, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(FLOOR(CAST(SUM(sub) AS DOUBLE) / CAST(GREATEST(SUM(words), 1) AS DOUBLE) "
        "* CAST(1048576.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS fertility_q, "
        "CAST(FLOOR(CAST(SUM(nbytes) AS DOUBLE) / CAST(GREATEST(SUM(sub), 1) AS DOUBLE) "
        "* CAST(1048576.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS bytes_per_tok_q "
        "FROM d GROUP BY lang"
    )


def _span_mask_sql(mask_permille: int = 150) -> str:
    """SQL twin of textstages.span_mask_docs: per-token positions via
    generate_series over the filtered token list, the identical
    splitmix64(splitmix64(doc_id) ⊕ pos) %% 1000 draw, spans as masked
    runs found by LAG windows, longest span via per-run counts."""
    base_inner = _sg.chain(
        "SELECT doc_id, len(list_filter(string_split(text, ' '), "
        "x -> len(x) > 0)) AS n FROM documents",
        _sg.splitmix64_steps("doc_id", "base", "smd"))
    draw_inner = _sg.chain(
        "SELECT doc_id, n, base, UNNEST(generate_series(0, n - 1)) AS pos "
        "FROM tl2 WHERE n > 0",
        _sg.splitmix64_steps(_sg.u64_xor("base", "pos"), "dw", "smp"))
    return (
        f"WITH tl2 AS MATERIALIZED (SELECT doc_id, n, base FROM ({base_inner})), "
        f"tok AS MATERIALIZED (SELECT doc_id, n, pos, "
        f"CASE WHEN dw % 1000 < {mask_permille} THEN 1 ELSE 0 END AS m "
        f"FROM ({draw_inner})), "
        "runs AS (SELECT doc_id, n, pos, m, "
        "CASE WHEN m = 1 AND COALESCE(LAG(m) OVER w, 0) = 0 THEN 1 ELSE 0 END AS st "
        "FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)), "
        "grp AS (SELECT doc_id, n, pos, m, st, "
        "SUM(st) OVER (PARTITION BY doc_id ORDER BY pos) AS sid FROM runs), "
        "per_run AS (SELECT doc_id, sid, COUNT(*) AS rl FROM grp "
        "WHERE m = 1 GROUP BY doc_id, sid), "
        "agg AS (SELECT doc_id, ANY_VALUE(n) AS n_tokens, "
        "CAST(SUM(m) AS BIGINT) AS n_masked, CAST(SUM(st) AS BIGINT) AS n_spans "
        "FROM grp GROUP BY doc_id), "
        "lg AS (SELECT doc_id, CAST(MAX(rl) AS BIGINT) AS longest FROM per_run GROUP BY doc_id) "
        "SELECT d.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens, "
        "COALESCE(a.n_masked, 0) AS n_masked, COALESCE(a.n_spans, 0) AS n_spans, "
        "COALESCE(l.longest, 0) AS longest_span "
        "FROM documents d LEFT JOIN agg a USING (doc_id) LEFT JOIN lg l ON l.doc_id = d.doc_id"
    )


def _good_turing_sql(max_r: int = 10) -> str:
    """SQL twin of textstages.good_turing_docs: same single-space token
    split, per-type totals capped at max_r+2, frequency-of-frequencies,
    and the identical floor((r+1)·N_{r+1}/N_r · 2²⁰ + 0.5) float chain
    (one f64 division, exact power-of-two scale)."""
    cap = max_r + 2
    return (
        "WITH tl AS MATERIALIZED (SELECT list_filter("
        "string_split(text, ' '), x -> len(x) > 0) AS l FROM documents), "
        "tok AS MATERIALIZED (SELECT UNNEST(list_transform("
        "generate_series(1, len(l) - 2), "
        "i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2])) AS tok FROM tl), "
        "tc AS MATERIALIZED (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok), "
        f"nr AS MATERIALIZED (SELECT LEAST(cnt, {cap}) AS r, "
        "COUNT(*) AS n_r FROM tc GROUP BY 1) "
        "SELECT CAST(a.r AS BIGINT) AS r, CAST(a.n_r AS BIGINT) AS n_r, "
        "CAST(COALESCE(b.n_r, 0) AS BIGINT) AS n_r1, "
        "CAST(FLOOR(CAST((a.r + 1) * COALESCE(b.n_r, 0) AS DOUBLE) "
        "/ CAST(a.n_r AS DOUBLE) * CAST(1048576.0 AS DOUBLE) "
        "+ CAST(0.5 AS DOUBLE)) AS BIGINT) AS r_star_q "
        f"FROM nr a LEFT JOIN nr b ON b.r = a.r + 1 WHERE a.r <= {max_r}"
    )


def _vocab_growth_sql(n_checkpoints: int = 8) -> str:
    """SQL twin of textstages.vocab_growth_docs: a type is in prefix t
    iff MIN(doc_id) ≤ t; correlated counted subqueries over the K
    checkpoints (all-integer outputs)."""
    return (
        "WITH mx AS (SELECT MAX(doc_id) AS m FROM documents), "
        f"ck AS (SELECT k.range + 1 AS k, (m * (k.range + 1)) // {n_checkpoints} "
        f"AS threshold FROM mx, range(0, {n_checkpoints}) k), "
        "tok AS MATERIALIZED (SELECT doc_id, UNNEST(list_filter("
        "string_split(text, ' '), x -> len(x) > 0)) AS tok FROM documents), "
        "fd AS MATERIALIZED (SELECT tok, MIN(doc_id) AS fd FROM tok GROUP BY tok), "
        "tn AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id) "
        "SELECT CAST(k AS BIGINT) AS k, CAST(threshold AS BIGINT) AS threshold, "
        "CAST((SELECT COUNT(*) FROM fd WHERE fd.fd <= ck.threshold) AS BIGINT) AS vocab, "
        "CAST((SELECT COALESCE(SUM(n), 0) FROM tn WHERE tn.doc_id <= ck.threshold) "
        "AS BIGINT) AS tokens FROM ck"
    )


def _oov_rate_sql(vocab_size: int = 256) -> str:
    """SQL twin of textstages.oov_rate_docs: the same single-space token
    split, (cnt DESC, tok ASC) top-V vocab, and exact integer floor
    permille."""
    return (
        "WITH tl AS MATERIALIZED (SELECT doc_id, "
        "list_filter(string_split(text, ' '), x -> len(x) > 0) AS l "
        "FROM documents), "
        "tok AS MATERIALIZED (SELECT doc_id, UNNEST(l) AS tok FROM tl), "
        "voc AS MATERIALIZED (SELECT tok FROM tok GROUP BY tok "
        f"QUALIFY ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) "
        f"<= {vocab_size}) "
        "SELECT CAST(t.doc_id AS BIGINT) AS doc_id, "
        "CAST(COUNT(*) AS BIGINT) AS n_tokens, "
        "CAST(COUNT(*) FILTER (v.tok IS NULL) AS BIGINT) AS n_oov, "
        "CAST((COUNT(*) FILTER (v.tok IS NULL)) * 1000 "
        "// GREATEST(COUNT(*), 1) AS BIGINT) AS oov_permille "
        "FROM tok t LEFT JOIN voc v ON v.tok = t.tok "
        "GROUP BY t.doc_id"
    )


def _postings_varint_sql() -> str:
    """SQL twin of textstages.postings_varint_docs: LAG over the sorted
    per-term doc ids gives the gaps (first gap = doc_id + 1), bit length
    is length(bin(gap)) — exact for BIGINT — and the varint cost is
    (bits + 6) // 7."""
    return (
        "WITH tok AS MATERIALIZED (SELECT DISTINCT doc_id, "
        "UNNEST(list_filter(string_split(text, ' '), x -> len(x) > 0)) "
        "AS term FROM documents), "
        "gp AS (SELECT term, doc_id, "
        "COALESCE(doc_id - LAG(doc_id) OVER "
        "(PARTITION BY term ORDER BY doc_id), doc_id + 1) AS gap "
        "FROM tok) "
        "SELECT term, CAST(COUNT(*) AS BIGINT) AS df, "
        "CAST(MIN(doc_id) AS BIGINT) AS first_doc, "
        "CAST(MAX(doc_id) AS BIGINT) AS last_doc, "
        "CAST(SUM((length(bin(gap)) + 6) // 7) AS BIGINT) AS "
        "bytes_varint, "
        "CAST(8 * COUNT(*) AS BIGINT) AS bytes_fixed "
        "FROM gp GROUP BY term"
    )


def _sieve_sql(side: int = 16, quant: float = 2.0, min_size: int = 6,
               rounds: int = 20, tx_max: int = 15,
               ty_max: int = 15) -> str:
    """SQL twin of raster.sieve_stage: the shared CCL CTEs label per-tile
    regions, right/down pixel joins mirrored both ways count shared
    borders, QUALIFY picks each small region's (w DESC, lb ASC) non-small
    neighbor, and the survivor inventory regroups on the mapped label —
    exact integers throughout."""
    ctes = _ccl_ctes(quant, side, rounds, tx_max, ty_max)
    return (
        "WITH " + ", ".join(ctes) + ", "
        "regn AS MATERIALIZED (SELECT tile_x, tile_y, lab, "
        "CAST(MIN(q) AS BIGINT) AS cq, CAST(COUNT(*) AS BIGINT) AS area "
        "FROM fin GROUP BY tile_x, tile_y, lab), "
        "bp AS MATERIALIZED (SELECT a.tile_x, a.tile_y, a.lab AS la, "
        "b.lab AS lb, CAST(COUNT(*) AS BIGINT) AS w FROM fin a "
        "JOIN fin b ON b.tile_x = a.tile_x AND b.tile_y = a.tile_y AND ("
        f"(b.idx = a.idx + 1 AND a.idx % {side} < {side - 1}) OR "
        f"b.idx = a.idx + {side}) "
        "WHERE b.lab <> a.lab GROUP BY a.tile_x, a.tile_y, a.lab, b.lab), "
        "adjw AS MATERIALIZED (SELECT tile_x, tile_y, la, lb, "
        "CAST(SUM(w) AS BIGINT) AS w FROM ("
        "SELECT tile_x, tile_y, la, lb, w FROM bp "
        "UNION ALL SELECT tile_x, tile_y, lb AS la, la AS lb, w FROM bp) "
        "GROUP BY tile_x, tile_y, la, lb), "
        "tgt AS MATERIALIZED (SELECT s.tile_x, s.tile_y, s.lab AS sl, "
        "a.lb AS tl FROM regn s "
        "JOIN adjw a ON a.tile_x = s.tile_x AND a.tile_y = s.tile_y "
        "AND a.la = s.lab "
        "JOIN regn rb ON rb.tile_x = s.tile_x AND rb.tile_y = s.tile_y "
        "AND rb.lab = a.lb "
        f"WHERE s.area < {min_size} AND rb.area >= {min_size} "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY s.tile_x, s.tile_y, "
        "s.lab ORDER BY a.w DESC, a.lb) = 1), "
        "fmap AS (SELECT r.tile_x, r.tile_y, r.lab, "
        "COALESCE(t.tl, r.lab) AS fl, r.area, "
        "CASE WHEN t.tl IS NULL THEN 0 ELSE 1 END AS merged "
        "FROM regn r LEFT JOIN tgt t ON t.tile_x = r.tile_x "
        "AND t.tile_y = r.tile_y AND t.sl = r.lab) "
        "SELECT CAST(f.tile_x AS BIGINT) AS tile_x, "
        "CAST(f.tile_y AS BIGINT) AS tile_y, "
        "CAST(f.fl AS BIGINT) AS region_label, rc.cq AS class_q, "
        "CAST(SUM(f.area) AS BIGINT) AS area, "
        "CAST(SUM(f.merged) AS BIGINT) AS n_merged "
        "FROM fmap f JOIN regn rc ON rc.tile_x = f.tile_x "
        "AND rc.tile_y = f.tile_y AND rc.lab = f.fl "
        "GROUP BY f.tile_x, f.tile_y, f.fl, rc.cq"
    )


def _brovey_sql(side: int = 32, quant: float = 64.0,
                ratio_scale: int = 1024) -> str:
    """SQL twin of raster.brovey_pansharpen_stage: same quantization,
    same derived bands, same exact floor division."""
    return (
        f"WITH {tiles_sql(side)}, "
        "qq AS (SELECT tile_x, tile_y, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE) + CAST(0.5 AS DOUBLE))"
        " AS BIGINT) + 128 AS qs FROM rast), "
        "bb AS (SELECT tile_x, tile_y, qs AS r, 2*qs + 5 AS g, "
        "3*qs + 7 AS b, 3*(qs + (2*qs + 5) + (3*qs + 7)) AS d3, "
        "(qs + (2*qs + 5) + (3*qs + 7)) AS pan3 FROM qq), "
        "sh AS (SELECT tile_x, tile_y, "
        f"(r * pan3 * {ratio_scale}) // d3 AS ro, "
        f"(g * pan3 * {ratio_scale}) // d3 AS go, "
        f"(b * pan3 * {ratio_scale}) // d3 AS bo FROM bb) "
        "SELECT CAST(tile_x AS BIGINT) AS tile_x, "
        "CAST(tile_y AS BIGINT) AS tile_y, "
        "CAST(COUNT(*) AS BIGINT) AS n_px, "
        "CAST(SUM(ro) AS BIGINT) AS red_sum, "
        "CAST(SUM(go) AS BIGINT) AS green_sum, "
        "CAST(SUM(bo) AS BIGINT) AS blue_sum, "
        "CAST(MIN(ro) AS BIGINT) AS red_min, "
        "CAST(MAX(ro) AS BIGINT) AS red_max "
        "FROM sh GROUP BY tile_x, tile_y"
    )


def _soundex_word_ctes() -> list:
    """The relational Soundex automaton (see _soundex_sql) over a
    ``wn(word)`` CTE already in scope — chars UNNEST with position,
    consonant-class CASE codes, the h/w-transparent previous code via
    LAST_VALUE(... IGNORE NULLS), first three emitted digits,
    zero-padded. Ends with ``sxw(word, sx)``."""
    code_case = (
        "CASE WHEN c IN ('b','f','p','v') THEN 1 "
        "WHEN c IN ('c','g','j','k','q','s','x','z') THEN 2 "
        "WHEN c IN ('d','t') THEN 3 WHEN c = 'l' THEN 4 "
        "WHEN c IN ('m','n') THEN 5 WHEN c = 'r' THEN 6 "
        "WHEN c IN ('h','w') THEN 7 ELSE 0 END")
    return [
        "nm AS (SELECT word, lower(word) AS w FROM wn)",
        "ch AS (SELECT word, w, t.i, w[t.i] AS c FROM nm, "
        "LATERAL (SELECT UNNEST(generate_series(1, len(w))) AS i) t)",
        f"cd AS (SELECT word, w, i, c, {code_case} AS code FROM ch)",
        "pv AS (SELECT word, w, i, code, "
        "LAST_VALUE(CASE WHEN code <> 7 THEN code END IGNORE NULLS) "
        "OVER (PARTITION BY word ORDER BY i "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev "
        "FROM cd)",
        "em AS (SELECT word, i, code FROM pv "
        "WHERE i > 1 AND code BETWEEN 1 AND 6 "
        "AND (prev IS NULL OR code <> prev) "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY word ORDER BY i) <= 3)",
        "dg AS (SELECT word, string_agg(CAST(code AS VARCHAR), '' "
        "ORDER BY i) AS d FROM em GROUP BY word)",
        "sxw AS (SELECT nm.word, upper(nm.w[1]) || "
        "rpad(COALESCE(dg.d, ''), 3, '0') AS sx "
        "FROM nm LEFT JOIN dg ON dg.word = nm.word)",
    ]


def _soundex_sql() -> str:
    """SQL twin of textstages.soundex_block_parts (automaton factored
    into _soundex_word_ctes)."""
    ctes = ["wn AS MATERIALIZED (SELECT string_split(p_name, ' ')[1] "
            "AS word, CAST(COUNT(*) AS BIGINT) AS n_parts FROM part "
            "GROUP BY 1)"] + _soundex_word_ctes()
    return ("WITH " + ", ".join(ctes) + " "
            "SELECT wn.word, sxw.sx, wn.n_parts "
            "FROM wn JOIN sxw ON sxw.word = wn.word")


def _percolation_sql(thresholds: tuple = (1, 2, 3, 5, 8, 13, 21),
                     out_links: int = 4, host_mod: int = 1000) -> str:
    """SQL twin of graph.percolation_curve_hosts: the MSF query embeds as
    a subselect; components(t) = n − |{forest edges w ≤ t}| (unique
    forest under the (w, u, v) total order); the node total restates the
    host-edge derivation (label_prop's lk fragment)."""
    vals = ", ".join(f"({t})" for t in thresholds)
    lk_base = (
        "SELECT CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) AS src, "
        "url || '#out' || CAST(kr.range AS VARCHAR) AS tok "
        f"FROM pages, range(0, {out_links}) kr"
    )
    lk_inner = _sg.chain(
        lk_base,
        [("_f", _sg.fnv1a64_expr("tok")), *_sg.splitmix64_steps("_f", "_h", "pc")])
    return (
        f"WITH {pages_sql(cols='url')}, "
        f"lk2 AS MATERIALIZED (SELECT src, CAST(_h % {host_mod} AS BIGINT) AS dst "
        f"FROM ({lk_inner})), "
        "nn AS (SELECT CAST(COUNT(DISTINCT node) AS BIGINT) AS n FROM ("
        "  SELECT src AS node FROM lk2 UNION ALL SELECT dst FROM lk2)), "
        f"msf AS MATERIALIZED ({_mst_sql()}) "
        "SELECT CAST(t.t AS BIGINT) AS threshold, "
        "CAST((SELECT COUNT(*) FROM msf WHERE w <= t.t) AS BIGINT) AS mst_edges_le, "
        "CAST(nn.n - (SELECT COUNT(*) FROM msf WHERE w <= t.t) AS BIGINT) AS n_components "
        f"FROM (VALUES {vals}) t(t), nn"
    )


def _rbo_snapshots_sql() -> str:
    """SQL twin of textstages.rbo_snapshot_terms: per-snapshot top-K via
    QUALIFY (count DESC, token ASC), X_d per depth via a rank-bounded
    self-join, and the RBO accumulation UNROLLED left-to-right with the
    SAME weight literals the engine uses (no cross-engine pow)."""
    from ..sources.snapshots import snapshot_sql
    from ..stages.textstages import RBO_K, RBO_WEIGHTS

    def top(version: int) -> str:
        return (
            f"t{version} AS MATERIALIZED (SELECT tok, "
            "ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) AS rnk FROM ("
            "SELECT tok, COUNT(*)::BIGINT AS cnt FROM ("
            "SELECT UNNEST(list_filter(string_split(text, ' '), "
            f"x -> len(x) > 0)) AS tok FROM v{version}) GROUP BY tok) "
            f"QUALIFY rnk <= {RBO_K})"
        )

    acc = "CAST(0.0 AS DOUBLE)"
    for d in range(1, RBO_K + 1):
        w = repr(RBO_WEIGHTS[d - 1])
        acc = (f"({acc} + CAST({w} AS DOUBLE) * "
               f"CAST((SELECT x_d FROM xs WHERE d = {d}) AS DOUBLE) "
               f"/ CAST({d} AS DOUBLE))")
    return (
        f"WITH {snapshot_sql(1)}, {snapshot_sql(2)}, {top(1)}, {top(2)}, "
        f"xs AS MATERIALIZED (SELECT k.range + 1 AS d, "
        "CAST((SELECT COUNT(*) FROM t1 a JOIN t2 b ON b.tok = a.tok "
        "WHERE a.rnk <= k.range + 1 AND b.rnk <= k.range + 1) AS BIGINT) AS x_d "
        f"FROM range(0, {RBO_K}) k) "
        "SELECT CAST(d AS BIGINT) AS d, x_d, "
        f"CAST(FLOOR({acc} * CAST(1048576.0 AS DOUBLE) "
        "+ CAST(0.5 AS DOUBLE)) AS BIGINT) AS rbo_q FROM xs"
    )


def _blocking_quality_sql() -> str:
    """SQL twin of textstages.blocking_quality_parts: exact C(n,2) pair
    counts over the three groupings, ratios ·2²⁰-quantized with the
    engine's op order."""
    ctes = [
        "pw AS MATERIALIZED (SELECT string_split(p_name, ' ')[1] AS word, "
        "p_brand AS brand, CAST(p_size AS BIGINT) AS size FROM part)",
        "wn AS (SELECT DISTINCT word FROM pw)",
    ] + _soundex_word_ctes() + [
        "tbl AS MATERIALIZED (SELECT s.sx, pw.brand, pw.size, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM pw "
        "JOIN sxw s ON s.word = pw.word GROUP BY 1, 2, 3)",
        "tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_rec FROM tbl)",
        "bl AS (SELECT CAST(SUM(x) AS BIGINT) AS cand FROM ("
        "  SELECT SUM(n) * (SUM(n) - 1) // 2 AS x FROM tbl GROUP BY sx))",
        "ma AS (SELECT CAST(SUM(x) AS BIGINT) AS mtch FROM ("
        "  SELECT SUM(n) * (SUM(n) - 1) // 2 AS x FROM tbl GROUP BY brand, size))",
        "cb AS (SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS cob FROM tbl)",
    ]
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT t.n_rec AS n_records, "
        "CAST(t.n_rec * (t.n_rec - 1) // 2 AS BIGINT) AS total_pairs, "
        "bl.cand AS cand_pairs, ma.mtch AS match_pairs, cb.cob AS co_blocked_pairs, "
        "CAST(FLOOR((1.0 - CAST(bl.cand AS DOUBLE) "
        "/ CAST(t.n_rec * (t.n_rec - 1) // 2 AS DOUBLE)) "
        "* CAST(1048576.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS reduction_q, "
        "CAST(FLOOR(CAST(cb.cob AS DOUBLE) / CAST(GREATEST(ma.mtch, 1) AS DOUBLE) "
        "* CAST(1048576.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS completeness_q "
        "FROM tot t, bl, ma, cb"
    )


def _profile_sql() -> str:
    """SQL twin of agg.profile_lineitem: one UNION ALL block per profiled
    column with the identical canonical encodings (half-away cents,
    epoch_us, raw strings)."""
    from ..stages.agg import PROFILE_SPEC

    blocks = []
    for col, kind in PROFILE_SPEC:
        if kind == "cents":
            key = f"CAST(ROUND({col} * 100, 0) AS BIGINT)"
        elif kind == "micros":
            key = f"epoch_us({col})"
        else:
            key = col
        if kind == "str":
            mn, mx = f"MIN({col})", f"MAX({col})"
        else:
            mn = f"CAST(MIN({key}) AS VARCHAR)"
            mx = f"CAST(MAX({key}) AS VARCHAR)"
        blocks.append(
            f"SELECT '{col}' AS col, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_null, "
            f"CAST(COUNT(DISTINCT {key}) AS BIGINT) AS n_distinct, "
            f"{mn} AS min_s, {mx} AS max_s FROM lineitem")
    return " UNION ALL ".join(blocks)


def _dq_checks_sql() -> str:
    """SQL twin of agg.dq_checks_orders: one aggregate block per check."""
    checks = [
        ("not_null_custkey",
         "COUNT(*) FILTER (o_custkey IS NULL)"),
        ("positive_price", "COUNT(*) FILTER (o_totalprice <= 0)"),
        ("domain_status",
         "COUNT(*) FILTER (o_orderstatus NOT IN ('O','F','P'))"),
        ("ref_custkey",
         "COUNT(*) FILTER (o_custkey NOT IN "
         "(SELECT c_custkey FROM customer))"),
        ("price_cap_50k",
         "COUNT(*) FILTER (o_totalprice > CAST(50000.0 AS DOUBLE))"),
        ("fresh_since_1996",
         "COUNT(*) FILTER (o_orderdate < TIMESTAMP '1996-01-01')"),
        ("unique_orderkey",
         "COUNT(*) - COUNT(DISTINCT o_orderkey)"),
    ]
    return " UNION ALL ".join(
        f"SELECT '{name}' AS \"check\", CAST(COUNT(*) AS BIGINT) AS "
        f"n_rows, CAST({expr} AS BIGINT) AS n_violations FROM orders"
        for name, expr in checks)


def _tophat_sql(side: int = 16, quant: float = 2.0, tx_max: int = 15,
                ty_max: int = 15) -> str:
    """SQL twin of raster.tophat_stage: cross-SE erosion/dilation as
    LEAST/GREATEST of the row and column 3-windows (both contain the
    center; ROWS BETWEEN shrinks at borders = the engine's in-bounds
    min/max), opening/closing as the second pass over the first."""

    def morph(src: str, dst: str, fn2: str) -> str:
        agg2 = "MIN" if fn2 == "LEAST" else "MAX"
        return (
            f"{dst} AS MATERIALIZED (SELECT tile_x, tile_y, py, px, "
            f"{fn2}("
            f"{agg2}(v) OVER (PARTITION BY tile_x, tile_y, py ORDER BY px "
            "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), "
            f"{agg2}(v) OVER (PARTITION BY tile_x, tile_y, px ORDER BY py "
            "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)) AS v "
            f"FROM {src})")

    return (
        f"WITH {tiles_sql(side)}, "
        "q0 AS MATERIALIZED (SELECT tile_x, tile_y, py, px, "
        f"CAST(FLOOR(vd * CAST({quant!r} AS DOUBLE)) AS BIGINT) AS v "
        f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}), "
        + morph("q0", "er", "LEAST") + ", "
        + morph("er", "op", "GREATEST") + ", "
        + morph("q0", "di", "GREATEST") + ", "
        + morph("di", "cl", "LEAST") + " "
        "SELECT CAST(q0.tile_x AS BIGINT) AS tile_x, "
        "CAST(q0.tile_y AS BIGINT) AS tile_y, "
        "CAST(COUNT(*) AS BIGINT) AS n_px, "
        "CAST(SUM(q0.v - op.v) AS BIGINT) AS wth_sum, "
        "CAST(COUNT(*) FILTER (q0.v - op.v > 0) AS BIGINT) AS wth_nz, "
        "CAST(MAX(q0.v - op.v) AS BIGINT) AS wth_max, "
        "CAST(SUM(cl.v - q0.v) AS BIGINT) AS bth_sum, "
        "CAST(COUNT(*) FILTER (cl.v - q0.v > 0) AS BIGINT) AS bth_nz, "
        "CAST(MAX(cl.v - q0.v) AS BIGINT) AS bth_max "
        "FROM q0 "
        "JOIN op ON op.tile_x = q0.tile_x AND op.tile_y = q0.tile_y "
        "AND op.py = q0.py AND op.px = q0.px "
        "JOIN cl ON cl.tile_x = q0.tile_x AND cl.tile_y = q0.tile_y "
        "AND cl.py = q0.py AND cl.px = q0.px "
        "GROUP BY q0.tile_x, q0.tile_y"
    )


def _hilbert_layout_sql(grid: int = 256, files_shift: int = 6,
                        bbox: tuple[float, float, float, float] =
                        (-10.0, 30.0, 40.0, 60.0)) -> str:
    """SQL twin of cellindex.hilbert_layout_pages: geocode chain, the
    identical cell binning, then the Hilbert rotate-and-accumulate
    unrolled one CTE-chain step per bit level (xor() on BIGINTs, CASE
    for the conditional reflect+swap), and the zorder twin's zone-map
    aggregate on the Hilbert file id."""
    from . import sqlgen as _sg

    order = int(np.log2(grid))
    lo_x, lo_y, hi_x, hi_y = bbox
    sx = grid / 360.0
    sy = grid / 180.0
    inner = _sg.chain(f"WITH {pages_sql()} SELECT url FROM pages",
                      _sg.geocode_steps("url"))
    steps: list[tuple[str, str]] = []
    px, py, pd_ = "ix", "iy", "0"
    for lvl in range(order):
        s = 1 << (order - 1 - lvl)
        rx, ry = f"rx{lvl}", f"ry{lvl}"
        steps.append((rx, f"CASE WHEN ({px} & {s}) > 0 THEN 1 ELSE 0 END"))
        steps.append((ry, f"CASE WHEN ({py} & {s}) > 0 THEN 1 ELSE 0 END"))
        steps.append((f"hd{lvl}",
                      f"{pd_} + {s * s} * xor(3 * {rx}, {ry})"))
        steps.append((f"hx{lvl}",
                      f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
                      f"THEN {s - 1} - {py} ELSE {py} END) "
                      f"ELSE {px} END"))
        steps.append((f"hy{lvl}",
                      f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
                      f"THEN {s - 1} - {px} ELSE {px} END) "
                      f"ELSE {py} END"))
        px, py, pd_ = f"hx{lvl}", f"hy{lvl}", f"hd{lvl}"
    steps.append(("fid", f"({pd_}) >> {files_shift}"))
    steps.append(("hit",
                  f"CASE WHEN lon >= CAST({lo_x!r} AS DOUBLE) "
                  f"AND lon <= CAST({hi_x!r} AS DOUBLE) "
                  f"AND lat >= CAST({lo_y!r} AS DOUBLE) "
                  f"AND lat <= CAST({hi_y!r} AS DOUBLE) "
                  "THEN 1 ELSE 0 END"))
    qlo_x = int(np.floor((lo_x + 180.0) * sx))
    qhi_x = int(np.floor((hi_x + 180.0) * sx))
    qlo_y = int(np.floor((lo_y + 90.0) * sy))
    qhi_y = int(np.floor((hi_y + 90.0) * sy))
    cells = _sg.chain(
        f"SELECT lon, lat, "
        f"CAST(LEAST(FLOOR((lon + CAST(180 AS DOUBLE)) * "
        f"CAST({sx!r} AS DOUBLE)), {grid - 1}) AS BIGINT) AS ix, "
        f"CAST(LEAST(FLOOR((lat + CAST(90 AS DOUBLE)) * "
        f"CAST({sy!r} AS DOUBLE)), {grid - 1}) AS BIGINT) AS iy "
        f"FROM ({inner})", steps)
    return (
        f"WITH g AS MATERIALIZED (SELECT fid, COUNT(*)::BIGINT AS "
        "n_rows, MIN(ix) AS min_ix, MAX(ix) AS max_ix, "
        "MIN(iy) AS min_iy, MAX(iy) AS max_iy, "
        f"CAST(SUM(hit) AS BIGINT) AS n_hits FROM ({cells}) "
        "GROUP BY fid) "
        "SELECT CAST(fid AS BIGINT) AS fid, n_rows, "
        "CAST(min_ix AS BIGINT) AS min_ix, "
        "CAST(max_ix AS BIGINT) AS max_ix, "
        "CAST(min_iy AS BIGINT) AS min_iy, "
        "CAST(max_iy AS BIGINT) AS max_iy, n_hits, "
        f"CAST(CASE WHEN max_ix >= {qlo_x} AND min_ix <= {qhi_x} "
        f"AND max_iy >= {qlo_y} AND min_iy <= {qhi_y} "
        "THEN 1 ELSE 0 END AS BIGINT) AS need_scan FROM g"
    )


def _ks_test_sql(grp_a: str = "1-URGENT", grp_b: str = "5-LOW") -> str:
    """SQL twin of agg.ks_test_orders: pooled per-cents counts, window
    cumulative sums, |cum_a*n_b - cum_b*n_a| argmax with the smallest-
    value tiebreak."""
    return (
        "WITH s AS MATERIALIZED (SELECT "
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents, "
        f"CASE WHEN o_orderpriority = '{grp_a}' THEN 1 ELSE 0 END AS isa "
        f"FROM orders WHERE o_orderpriority IN ('{grp_a}', '{grp_b}')), "
        "n AS (SELECT CAST(SUM(isa) AS BIGINT) AS na, "
        "CAST(SUM(1 - isa) AS BIGINT) AS nb FROM s), "
        "g AS (SELECT cents, CAST(SUM(isa) AS BIGINT) AS ca, "
        "CAST(SUM(1 - isa) AS BIGINT) AS cb FROM s GROUP BY cents), "
        "c AS (SELECT cents, SUM(ca) OVER (ORDER BY cents) AS la, "
        "SUM(cb) OVER (ORDER BY cents) AS lb FROM g), "
        "d AS (SELECT cents, ABS(la * n.nb - lb * n.na) AS dv "
        "FROM c, n) "
        "SELECT n.na AS n_a, n.nb AS n_b, "
        "CAST(d.dv AS BIGINT) AS d_scaled, "
        "CAST(d.cents AS BIGINT) AS v_cents, "
        "CAST(d.dv * 1000 // GREATEST(n.na * n.nb, 1) AS BIGINT) AS "
        "ks_permille FROM d, n "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY d.dv DESC, d.cents) = 1"
    )


def _mannwhitney_sql(grp_a: str = "1-URGENT", grp_b: str = "5-LOW") -> str:
    """SQL twin of agg.mannwhitney_orders: per-value pooled counts,
    window cumulative 'ranks before', the doubled tie-averaged rank sum,
    and the U identities — all exact BIGINTs."""
    return (
        "WITH s AS MATERIALIZED (SELECT "
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents, "
        f"CASE WHEN o_orderpriority = '{grp_a}' THEN 1 ELSE 0 END AS isa "
        f"FROM orders WHERE o_orderpriority IN ('{grp_a}', '{grp_b}')), "
        "g AS (SELECT cents, CAST(SUM(isa) AS BIGINT) AS ca, "
        "CAST(SUM(1 - isa) AS BIGINT) AS cb FROM s GROUP BY cents), "
        "c AS (SELECT cents, ca, cb, ca + cb AS t, "
        "COALESCE(SUM(ca + cb) OVER (ORDER BY cents "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        "AS bef FROM g), "
        "agg3 AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, "
        "CAST(SUM(cb) AS BIGINT) AS nb, "
        "CAST(SUM(ca * (2 * bef + t + 1)) AS BIGINT) AS r2a, "
        "CAST(SUM(t*t*t - t) AS BIGINT) AS tie FROM c) "
        "SELECT na AS n_a, nb AS n_b, "
        "CAST(r2a - na * (na + 1) AS BIGINT) AS u2_a, "
        "CAST(2 * na * nb - (r2a - na * (na + 1)) AS BIGINT) AS u2_b, "
        "tie AS tie_term FROM agg3"
    )


def _assortativity_sql(out_links: int = 4, host_mod: int = 1000) -> str:
    """SQL twin of graph.assortativity_hosts: the closeness twins' edge
    CTEs, degree counts off the directed adjacency, exact integer sums."""
    lk_base = (
        "SELECT CAST(regexp_extract(url, 'site-(\\d+)\\.example', 1) AS BIGINT) AS src, "
        "url || '#out' || CAST(kr.range AS VARCHAR) AS tok "
        f"FROM pages, range(0, {out_links}) kr"
    )
    lk_inner = _sg.chain(
        lk_base,
        [("_f", _sg.fnv1a64_expr("tok")), *_sg.splitmix64_steps("_f", "_h", "cl")])
    return (
        f"WITH {pages_sql()}, "
        f"lk AS MATERIALIZED (SELECT src, CAST(_h % {host_mod} AS BIGINT)"
        f" AS dst FROM ({lk_inner})), "
        "ua AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM lk WHERE src <> dst), "
        "adj AS (SELECT a AS v FROM ua UNION ALL SELECT b FROM ua), "
        "dg AS MATERIALIZED (SELECT v AS h, CAST(COUNT(*) AS BIGINT) "
        "AS d FROM adj GROUP BY v), "
        "st AS (SELECT CAST(2 * COUNT(*) AS BIGINT) AS m2, "
        "CAST(SUM(da.d + db.d) AS BIGINT) AS sx, "
        "CAST(SUM(da.d * da.d + db.d * db.d) AS BIGINT) AS sxx, "
        "CAST(SUM(2 * da.d * db.d) AS BIGINT) AS sxy "
        "FROM ua JOIN dg da ON da.h = ua.a JOIN dg db ON db.h = ua.b) "
        "SELECT m2, sx, sxx, sxy, "
        "CAST(m2 * sxy - sx * sx AS BIGINT) AS num, "
        "CAST(m2 * sxx - sx * sx AS BIGINT) AS den FROM st"
    )


def _json_props_sql() -> str:
    """SQL twin of streaming.json_props_events: identical regex (RE2 and
    Python agree on this digit pattern), grouped exact integers."""
    return (
        "WITH p AS (SELECT event_type AS et, "
        "regexp_extract(props, '\"k\": (-?\\d+)', 1) AS ks FROM events), "
        "v AS (SELECT et, CASE WHEN ks = '' THEN NULL "
        "ELSE CAST(ks AS BIGINT) END AS k FROM p) "
        "SELECT et, CAST(COUNT(*) AS BIGINT) AS n_rows, "
        "CAST(COUNT(*) FILTER (k IS NULL) AS BIGINT) AS n_bad, "
        "CAST(COALESCE(SUM(k), 0) AS BIGINT) AS sum_k, "
        "CAST(COALESCE(MIN(k), 0) AS BIGINT) AS min_k, "
        "CAST(COALESCE(MAX(k), 0) AS BIGINT) AS max_k, "
        "CAST(COUNT(DISTINCT k) AS BIGINT) AS nd_k "
        "FROM v GROUP BY et"
    )


def _fellegi_sunter_sql(min_score: int = 3) -> str:
    """SQL twin of textstages.fellegi_sunter_parts: blocked self-join on
    (brand, size), identical dyadic weights and bit pattern."""
    return (
        "WITH p AS MATERIALIZED (SELECT p_partkey AS key, p_brand, "
        "p_size, p_type, string_split(p_name, ' ')[-1] AS tok2, "
        "CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS cents "
        "FROM part), "
        "m AS (SELECT a.key AS key_a, b.key AS key_b, "
        "CASE WHEN a.p_type = b.p_type THEN 1 ELSE 0 END AS ag_t, "
        "CASE WHEN a.tok2 = b.tok2 THEN 1 ELSE 0 END AS ag_n, "
        "CASE WHEN ABS(a.cents - b.cents) <= 1000 THEN 1 ELSE 0 END "
        "AS ag_p FROM p a JOIN p b ON b.p_brand = a.p_brand "
        "AND b.p_size = a.p_size AND b.key > a.key) "
        "SELECT CAST(key_a AS BIGINT) AS key_a, "
        "CAST(key_b AS BIGINT) AS key_b, "
        "CAST(ag_t + 2 * ag_n + 4 * ag_p AS BIGINT) AS pattern, "
        "CAST(CASE WHEN ag_t = 1 THEN 3 ELSE -2 END "
        "+ CASE WHEN ag_n = 1 THEN 2 ELSE -1 END "
        "+ CASE WHEN ag_p = 1 THEN 1 ELSE -1 END AS BIGINT) AS score "
        "FROM m "
        f"WHERE (CASE WHEN ag_t = 1 THEN 3 ELSE -2 END "
        "+ CASE WHEN ag_n = 1 THEN 2 ELSE -1 END "
        f"+ CASE WHEN ag_p = 1 THEN 1 ELSE -1 END) >= {min_score}"
    )


def _semseg_cnn_sql(side: int = 16, tx_max: int = 15, ty_max: int = 15,
                    chain_only: bool = False) -> str:
    """SQL twin of scorer.semseg_cnn_stage: the integer CNN forward
    (functions/convnet.py weights, shared verbatim) as LAG/LEAD window
    chains. A general 3×3 conv splits into per-kernel-row horizontal
    passes over px then one vertical combine over py (zero-pad borders →
    COALESCE(..., 0)); ReLU is GREATEST(0, ·); argmax ties take the
    smallest class (np.argmax first-max ≡ the >= CASE chain)."""
    from . import convnet as _cn

    wrow = "PARTITION BY tile_x, tile_y, py ORDER BY px"
    wcol = "PARTITION BY tile_x, tile_y, px ORDER BY py"

    def hrow(col: str, w3) -> str:
        terms = []
        if w3[0]:
            terms.append(f"{w3[0]}*COALESCE(LAG({col}) OVER ({wrow}), 0)")
        if w3[1]:
            terms.append(f"{w3[1]}*{col}")
        if w3[2]:
            terms.append(f"{w3[2]}*COALESCE(LEAD({col}) OVER ({wrow}), 0)")
        return " + ".join(terms) if terms else "0"

    def vsum(r0: str, r1: str, r2: str) -> str:
        return (f"COALESCE(LAG({r0}) OVER ({wcol}), 0) + {r1} "
                f"+ COALESCE(LEAD({r2}) OVER ({wcol}), 0)")

    steps: list[tuple[str, str]] = []
    for c in range(2):
        for r in range(3):
            steps.append((f"h{c}{r}", hrow("q", _cn.W1[c][r])))
    for c in range(2):
        steps.append((f"a{c}",
                      f"GREATEST(0, {vsum(f'h{c}0', f'h{c}1', f'h{c}2')} + {_cn.B1[c]})"))
    for c in range(2):
        for i in range(2):
            for r in range(3):
                steps.append((f"g{c}{i}{r}", hrow(f"a{i}", _cn.W2[c][i][r])))
    for c in range(2):
        steps.append((f"z{c}",
                      f"GREATEST(0, {vsum(f'g{c}00', f'g{c}01', f'g{c}02')} "
                      f"+ {vsum(f'g{c}10', f'g{c}11', f'g{c}12')} + {_cn.B2[c]})"))
    for k in range(3):
        steps.append((f"l{k}", f"{_cn.WH[k][0]}*z0 + {_cn.WH[k][1]}*z1 + {_cn.BH[k]}"))
    steps.append(("pred", "CASE WHEN l0 >= l1 AND l0 >= l2 THEN 0 "
                          "WHEN l1 >= l2 THEN 1 ELSE 2 END"))
    steps.append(("win", "CASE pred WHEN 0 THEN l0 WHEN 1 THEN l1 ELSE l2 END"))

    base = (f"SELECT tile_x, tile_y, px, py, "
            f"CAST(FLOOR(vd * CAST({_cn.QUANT!r} AS DOUBLE)) AS BIGINT) AS q "
            f"FROM rast WHERE tile_x <= {tx_max} AND tile_y <= {ty_max}")
    net = _sg.chain(base, steps)
    if chain_only:
        return net
    return (
        f"WITH {tiles_sql(side)}, net AS ({net}) "
        "SELECT CAST(tile_x AS BIGINT) AS tile_x, "
        "CAST(tile_y AS BIGINT) AS tile_y, "
        "CAST(SUM(CASE WHEN pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c0, "
        "CAST(SUM(CASE WHEN pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_c1, "
        "CAST(SUM(CASE WHEN pred = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_c2, "
        "CAST(SUM(win) AS BIGINT) AS win_logit_sum "
        "FROM net GROUP BY tile_x, tile_y"
    )


def _rf_forest_sql(n_trees: int = 8, seed: int = 11,
                   mode: str = "predict") -> str:
    """SQL twin of train.rf_predict_lineitem (mode="predict") and
    train.rf_oob_error (mode="oob"): per-tree bag bits from the
    identical splitmix64(k ^ seed_b) draw (seeds inlined as literals),
    each tree's depth-2 CART re-derived by the _cart_depth2_sql recipe
    (cumulative histograms, identical weighted-purity f64 argmax, ties to
    smallest (f, thr)) restricted to its bag, leaf classes by majority
    with ties to 0, then one routing pass CROSS JOINed with every tree's
    single param row. Splitless children carry thr 2^62 (route left);
    OOB mode counts the signed majority of bag-excluding trees only."""
    from ..stages.train import (RF_BAG_PERMILLE, _RF_NO_SPLIT_THR,
                                _rf_mtry_excl, _rf_seeds)

    B = n_trees
    seeds = _rf_seeds(B, seed)
    score = ("CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE) "
             "+ CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE)")
    nosplit = int(_RF_NO_SPLIT_THR)

    # label noise + bag bits for all trees in one chained, materialized pass
    bag_steps: list[tuple[str, str]] = []
    bag_steps += _sg.splitmix64_steps("k", "yh", "rfy")
    bag_steps.append(("y", "CASE WHEN 10*f0 + 7*f1 + 13*f2 + yh % 40 > 360 "
                           "THEN 1 ELSE 0 END"))
    for b in range(B):
        bag_steps += _sg.splitmix64_steps(
            _sg.u64_xor("k", str(int(seeds[b]))), f"bh{b}", f"rft{b}")
        bag_steps.append(
            (f"bag{b}", f"CASE WHEN bh{b} % 1000 < {RF_BAG_PERMILLE} "
                        "THEN 1 ELSE 0 END"))
    base = ("SELECT CAST(l_orderkey AS BIGINT) AS okey, "
            "CAST(l_linenumber AS BIGINT) AS lnum, "
            "CAST(l_quantity AS BIGINT) AS f0, "
            "CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS f1, "
            "CAST(ROUND(l_tax * 100, 0) AS BIGINT) AS f2, "
            "CAST(l_orderkey * 8 + l_linenumber AS BIGINT) AS k "
            "FROM lineitem")
    ctes = [f"ftb AS MATERIALIZED ({_sg.chain(base, bag_steps)})"]

    def tree_ctes(b: int) -> None:
        p = f"t{b}_"
        fv = "(CASE r.f WHEN 0 THEN f0 WHEN 1 THEN f1 ELSE f2 END)"
        ctes.append(
            f"{p}h0 AS (SELECT 0 AS f, f0 AS v, y, COUNT(*) AS n "
            f"FROM ftb WHERE bag{b} = 1 GROUP BY 2, 3 "
            f"UNION ALL SELECT 1, f1, y, COUNT(*) FROM ftb WHERE bag{b} = 1 GROUP BY 2, 3 "
            f"UNION ALL SELECT 2, f2, y, COUNT(*) FROM ftb WHERE bag{b} = 1 GROUP BY 2, 3)")
        ctes.append(
            f"{p}pv AS (SELECT f, v, "
            "CAST(SUM(CASE WHEN y = 0 THEN n ELSE 0 END) AS BIGINT) AS a0, "
            "CAST(SUM(CASE WHEN y = 1 THEN n ELSE 0 END) AS BIGINT) AS a1 "
            f"FROM {p}h0 GROUP BY 1, 2)")
        ctes.append(
            f"{p}cum AS (SELECT f, v, "
            "CAST(SUM(a0) OVER w AS BIGINT) AS c0, CAST(SUM(a1) OVER w AS BIGINT) AS c1, "
            "CAST(SUM(a0) OVER (PARTITION BY f) AS BIGINT) AS t0, "
            "CAST(SUM(a1) OVER (PARTITION BY f) AS BIGINT) AS t1, "
            f"MAX(v) OVER (PARTITION BY f) AS vmax FROM {p}pv "
            "WINDOW w AS (PARTITION BY f ORDER BY v))")
        ctes.append(
            f"{p}sc AS (SELECT f, v AS thr, c0 + c1 AS nl, "
            "(t0 - c0) + (t1 - c1) AS nr, c0*c0 + c1*c1 AS sl, "
            "(t0 - c0)*(t0 - c0) + (t1 - c1)*(t1 - c1) AS sr "
            f"FROM {p}cum WHERE v < vmax AND c0 + c1 > 0 "
            "AND (t0 - c0) + (t1 - c1) > 0)")
        ctes.append(
            f"{p}root AS (SELECT f, thr FROM {p}sc "
            f"WHERE f <> {_rf_mtry_excl(b, 0, seed)} "
            f"ORDER BY {score} DESC, f ASC, thr ASC LIMIT 1)")
        ctes.append(
            f"{p}h2 AS (SELECT CASE WHEN {fv} <= r.thr THEN 0 ELSE 1 END AS side, "
            f"0 AS f, f0 AS v, y, COUNT(*) AS n FROM ftb, {p}root r "
            f"WHERE bag{b} = 1 GROUP BY 1, 3, 4 "
            f"UNION ALL SELECT CASE WHEN {fv} <= r.thr THEN 0 ELSE 1 END, 1, f1, y, "
            f"COUNT(*) FROM ftb, {p}root r WHERE bag{b} = 1 GROUP BY 1, 3, 4 "
            f"UNION ALL SELECT CASE WHEN {fv} <= r.thr THEN 0 ELSE 1 END, 2, f2, y, "
            f"COUNT(*) FROM ftb, {p}root r WHERE bag{b} = 1 GROUP BY 1, 3, 4)")
        ctes.append(
            f"{p}pv2 AS (SELECT side, f, v, "
            "CAST(SUM(CASE WHEN y = 0 THEN n ELSE 0 END) AS BIGINT) AS a0, "
            "CAST(SUM(CASE WHEN y = 1 THEN n ELSE 0 END) AS BIGINT) AS a1 "
            f"FROM {p}h2 GROUP BY 1, 2, 3)")
        ctes.append(
            f"{p}cum2 AS (SELECT side, f, v, "
            "CAST(SUM(a0) OVER w AS BIGINT) AS c0, CAST(SUM(a1) OVER w AS BIGINT) AS c1, "
            "CAST(SUM(a0) OVER (PARTITION BY side, f) AS BIGINT) AS t0, "
            "CAST(SUM(a1) OVER (PARTITION BY side, f) AS BIGINT) AS t1, "
            f"MAX(v) OVER (PARTITION BY side, f) AS vmax FROM {p}pv2 "
            "WINDOW w AS (PARTITION BY side, f ORDER BY v))")
        ctes.append(
            f"{p}sc2 AS (SELECT side, f, v AS thr, c0 + c1 AS nl, "
            "(t0 - c0) + (t1 - c1) AS nr, c0*c0 + c1*c1 AS sl, "
            "(t0 - c0)*(t0 - c0) + (t1 - c1)*(t1 - c1) AS sr, "
            "c1 AS cl1, t1 AS tt1 "
            f"FROM {p}cum2 WHERE v < vmax AND c0 + c1 > 0 "
            "AND (t0 - c0) + (t1 - c1) > 0)")
        e1, e2 = _rf_mtry_excl(b, 1, seed), _rf_mtry_excl(b, 2, seed)
        ctes.append(
            f"{p}pick AS (SELECT side, f, thr, "
            "CASE WHEN 2*cl1 > nl THEN 1 ELSE 0 END AS ll, "
            "CASE WHEN 2*(tt1 - cl1) > nr THEN 1 ELSE 0 END AS lr, "
            f"ROW_NUMBER() OVER (PARTITION BY side ORDER BY {score} DESC, "
            f"f ASC, thr ASC) AS rr FROM {p}sc2 "
            f"WHERE NOT (side = 0 AND f = {e1}) "
            f"AND NOT (side = 1 AND f = {e2}))")
        ctes.append(
            f"{p}st AS (SELECT CASE WHEN {fv} <= r.thr THEN 0 ELSE 1 END AS side, "
            "CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS c1 "
            f"FROM ftb, {p}root r WHERE bag{b} = 1 GROUP BY 1)")
        ctes.append(
            f"{p}par AS (SELECT r.f AS rf, r.thr AS rt, "
            f"COALESCE(q0.f, 0) AS s0f, COALESCE(q0.thr, {nosplit}) AS s0t, "
            "COALESCE(q0.ll, m0.cls) AS c00, COALESCE(q0.lr, m0.cls) AS c01, "
            f"COALESCE(q1.f, 0) AS s1f, COALESCE(q1.thr, {nosplit}) AS s1t, "
            "COALESCE(q1.ll, m1.cls) AS c10, COALESCE(q1.lr, m1.cls) AS c11 "
            f"FROM {p}root r "
            f"LEFT JOIN (SELECT * FROM {p}pick WHERE rr = 1) q0 ON q0.side = 0 "
            f"LEFT JOIN (SELECT * FROM {p}pick WHERE rr = 1) q1 ON q1.side = 1 "
            f"LEFT JOIN (SELECT side, CASE WHEN 2*c1 > n THEN 1 ELSE 0 END AS cls "
            f"FROM {p}st) m0 ON m0.side = 0 "
            f"LEFT JOIN (SELECT side, CASE WHEN 2*c1 > n THEN 1 ELSE 0 END AS cls "
            f"FROM {p}st) m1 ON m1.side = 1)")

    for b in range(B):
        tree_ctes(b)

    def route(b: int) -> str:
        p = f"p{b}"
        def fsel(fcol: str) -> str:
            return f"(CASE {p}.{fcol} WHEN 0 THEN f0 WHEN 1 THEN f1 ELSE f2 END)"
        return (
            f"CASE WHEN {fsel('rf')} <= {p}.rt THEN "
            f"CASE WHEN {fsel('s0f')} <= {p}.s0t THEN {p}.c00 ELSE {p}.c01 END "
            f"ELSE CASE WHEN {fsel('s1f')} <= {p}.s1t THEN {p}.c10 ELSE {p}.c11 END END")

    joins = " ".join(f"CROSS JOIN t{b}_par p{b}" for b in range(B))
    if mode == "oob":
        # OOB signed majority: only trees whose bag excludes the row vote
        signed = " + ".join(
            f"(CASE WHEN bag{b} = 0 THEN 2*({route(b)}) - 1 ELSE 0 END)"
            for b in range(B))
        has_vote = " + ".join(f"(1 - bag{b})" for b in range(B))
        return (
            "WITH " + ", ".join(ctes) + ", "
            f"ob AS (SELECT y, ({signed}) AS sv, ({has_vote}) AS hv "
            f"FROM ftb {joins}) "
            "SELECT CAST(SUM(CASE WHEN hv > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oob, "
            "CAST(SUM(CASE WHEN hv > 0 AND "
            "(CASE WHEN sv > 0 THEN 1 ELSE 0 END) <> y THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_err, "
            "CAST(FLOOR(CAST(1000.0 AS DOUBLE) "
            "* SUM(CASE WHEN hv > 0 AND (CASE WHEN sv > 0 THEN 1 ELSE 0 END) <> y "
            "THEN 1 ELSE 0 END) "
            "/ GREATEST(SUM(CASE WHEN hv > 0 THEN 1 ELSE 0 END), 1) "
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT) AS err_permille "
            "FROM ob"
        )
    votes = " + ".join(f"({route(b)})" for b in range(B))
    return (
        "WITH " + ", ".join(ctes) + " "
        f"SELECT okey AS l_orderkey, lnum AS l_linenumber, "
        f"CAST(({votes}) AS BIGINT) AS votes, "
        f"CAST(CASE WHEN 2*({votes}) > {B} THEN 1 ELSE 0 END AS BIGINT) AS pred "
        f"FROM ftb {joins}"
    )


def _dp_counts_sql(seed: int = 2024, bound: int = 5) -> str:
    """SQL twin of governance.dp_noisy_counts: identical seeded draw —
    splitmix64(fnv1a64(key) ^ splitmix64(seed)) % (2·bound+1) − bound —
    over the exact grouped counts."""
    sd = int(_smx(np.asarray([seed], np.uint64))[0])
    base = ("SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM events GROUP BY 1")
    chained = _sg.chain(
        f"SELECT event_type, n, {_sg.fnv1a64_expr('event_type')} AS fh "
        f"FROM ({base})",
        _sg.splitmix64_steps(_sg.u64_xor("fh", str(sd)), "nh", "dp"))
    return (
        "SELECT event_type, n, "
        f"CAST(GREATEST(n + (nh % {2 * bound + 1}) - {bound}, 0) "
        "AS BIGINT) AS released "
        f"FROM ({chained})")


def _compact_plan_sql(target_bytes: int = 1 << 18) -> str:
    """SQL twin of querydefs._q_compact_plan: per-host byte totals,
    signed-int64 layout key = splitmix64(fnv1a64(host)) two's-complement
    view, exclusive window prefix sum in key order, group = prefix //
    target (prefix >= 0, so DuckDB's truncating // equals numpy floor)."""
    hk = _sg.chain(
        "SELECT host, nbytes, "
        f"{_sg.fnv1a64_expr('host')} AS fh FROM hb",
        _sg.splitmix64_steps("fh", "hku", "cp"))
    return (
        f"WITH {pages_sql()}, "
        "hb AS (SELECT regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host, "
        "CAST(SUM(octet_length(encode(text))) AS BIGINT) AS nbytes "
        "FROM pages GROUP BY 1), "
        f"hk AS (SELECT host, nbytes, CAST(hku - CASE WHEN hku >= {1 << 63} "
        f"THEN CAST({1 << 64} AS HUGEINT) ELSE 0 END AS BIGINT) AS hkey "
        f"FROM ({hk})), "
        "pre AS (SELECT host, nbytes, hkey, "
        "COALESCE(SUM(nbytes) OVER (ORDER BY hkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix "
        "FROM hk) "
        "SELECT host, nbytes, hkey, "
        f"CAST(prefix // {target_bytes} AS BIGINT) AS grp FROM pre")


def _scene_semseg_zonal_sql(side: int = 16, tx_max: int = 15,
                            ty_max: int = 15) -> str:
    """SQL twin of querydefs._q_scene_semseg_zonal — the composed
    round-5 pipeline: scene-TIFF windowed ingest (bit-exact, so the
    closed-form raster stands in), integer CNN forward (_semseg_cnn_sql
    chain), per-tile class counts, tile-center→polygon zonal rollup
    (_TILE_FEATURE_SQL map)."""
    net = _semseg_cnn_sql(side, tx_max, ty_max, chain_only=True)
    return (
        f"WITH {tiles_sql(side)}, {polygons_sql()}, {_TILE_GRID_SQL}, "
        f"{_TILE_FEATURE_SQL}, net AS ({net}), "
        "per AS (SELECT tile_x, tile_y, "
        "SUM(CASE WHEN pred = 0 THEN 1 ELSE 0 END) AS c0, "
        "SUM(CASE WHEN pred = 1 THEN 1 ELSE 0 END) AS c1, "
        "SUM(CASE WHEN pred = 2 THEN 1 ELSE 0 END) AS c2, "
        "SUM(win) AS wl FROM net GROUP BY tile_x, tile_y) "
        "SELECT CAST(f.feature_id AS BIGINT) AS feature_id, "
        "CAST(COUNT(*) AS BIGINT) AS n_tiles, "
        "CAST(SUM(p.c0) AS BIGINT) AS n_c0, "
        "CAST(SUM(p.c1) AS BIGINT) AS n_c1, "
        "CAST(SUM(p.c2) AS BIGINT) AS n_c2, "
        "CAST(SUM(p.wl) AS BIGINT) AS win_logit_sum "
        "FROM tfeat f JOIN per p USING (tile_x, tile_y) "
        "GROUP BY f.feature_id")


def _png_roundtrip_sql() -> str:
    """SQL twin of multimodal.png_roundtrip_stage: the deterministic
    image keystream (splitmix64(doc_id ^ seed) base, per-pixel
    splitmix64(base + idx) & 255) restated with the shared sqlgen
    chains; the engine's stats come from PIXELS DECODED OUT OF REAL PNG
    BYTES, so equality certifies the codec."""
    from ..stages.multimodal import PNG_SEED, PNG_SIDE

    npx = PNG_SIDE * PNG_SIDE
    based = _sg.chain(
        "SELECT doc_id FROM documents",
        _sg.splitmix64_steps(_sg.u64_xor("doc_id", str(int(PNG_SEED))),
                             "base", "pngb"))
    drawn = _sg.chain(
        f"SELECT doc_id, base, i.range AS idx FROM ({based}) "
        f"CROSS JOIN range(0, {npx}) i",
        _sg.splitmix64_steps("(base + idx)", "dw", "pngd"))
    return (
        f"WITH px AS MATERIALIZED (SELECT doc_id, dw & 255 AS b "
        f"FROM ({drawn})) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        f"CAST({npx} AS BIGINT) AS n_px, "
        "CAST(SUM(b) AS BIGINT) AS px_sum, "
        "CAST(MIN(b) AS BIGINT) AS px_min, "
        "CAST(MAX(b) AS BIGINT) AS px_max "
        "FROM px GROUP BY doc_id")


def _warc_roundtrip_sql() -> str:
    """SQL twin of querydefs._q_warc_roundtrip: the html payload is the
    page generator's concat (pure ASCII — verified octet_length ==
    length corpus-wide), fingerprinted with the shared fnv1a64 chain;
    equality certifies WARC framing + gzip round-trip byte-exactness."""
    html = ("'<html><head><title>d' || doc_id || "
            "'</title></head><body><p>' || text || '</p></body></html>'")
    base = (
        "SELECT 'https://site-' || (doc_id % 1000) || '.example/' || source "
        "|| '/' || doc_id AS url, "
        "TIMESTAMP '2024-01-01 00:00:00' "
        "+ to_microseconds(doc_id * 37000000) AS warc_ts, "
        f"{html} AS html FROM documents")
    return (
        f"WITH pg AS MATERIALIZED ({base}), "
        "fh AS (SELECT url, warc_ts, "
        "CAST(octet_length(encode(html)) AS BIGINT) AS payload_len, "
        f"{_sg.fnv1a64_expr('html')} AS fhv FROM pg) "
        "SELECT url, warc_ts, payload_len, "
        f"CAST(fhv - CASE WHEN fhv >= {1 << 63} "
        f"THEN CAST({1 << 64} AS HUGEINT) ELSE 0 END AS BIGINT) "
        "AS payload_fnv FROM fh")


def _emd_drift_sql(n_bins: int = 10) -> str:
    """SQL twin of agg.emd_drift_orders: the psi twin's bins/split, then
    W1·n_a·n_b = Σ |CumA·n_b − CumB·n_a| over the first n_bins−1 dense
    bins — exact BIGINT throughout."""
    return (
        "WITH o AS (SELECT "
        "CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day, "
        "CAST(FLOOR(ABS(o_totalprice*100.0) + 0.5)*SIGN(o_totalprice) "
        "AS BIGINT) AS cents FROM orders), "
        "sc AS (SELECT MIN(day) AS d0, MAX(day) AS d1, MAX(cents) AS mc "
        "FROM o), "
        "x AS (SELECT LEAST(CAST("
        f"{n_bins - 1} AS BIGINT), cents * {n_bins} // (sc.mc + 1)) "
        "AS bin, CASE WHEN day >= (sc.d0 + sc.d1 + 1) // 2 THEN 1 "
        "ELSE 0 END AS side FROM o, sc), "
        "t AS (SELECT bin, side, COUNT(*)::BIGINT AS c FROM x "
        "GROUP BY 1, 2), "
        f"bins AS (SELECT unnest(range(0, {n_bins})) AS bin), "
        "w AS (SELECT bins.bin, "
        "COALESCE(a.c, 0)::BIGINT AS ca, COALESCE(b.c, 0)::BIGINT AS cb "
        "FROM bins LEFT JOIN t a ON a.bin = bins.bin AND a.side = 0 "
        "LEFT JOIN t b ON b.bin = bins.bin AND b.side = 1), "
        "cum AS (SELECT bin, "
        "SUM(ca) OVER (ORDER BY bin)::BIGINT AS cum_a, "
        "SUM(cb) OVER (ORDER BY bin)::BIGINT AS cum_b FROM w), "
        "tot AS (SELECT SUM(ca)::BIGINT AS na, SUM(cb)::BIGINT AS nb "
        "FROM w) "
        "SELECT tot.na AS n_a, tot.nb AS n_b, "
        "CAST(SUM(ABS(cum.cum_a * tot.nb - cum.cum_b * tot.na)) AS BIGINT) "
        "AS w1_scaled FROM cum, tot "
        f"WHERE cum.bin < {n_bins - 1} GROUP BY tot.na, tot.nb"
    )


def _dtw_pairs_sql(n_users: int = 8, max_len: int = 12) -> str:
    """SQL twin of streaming.dtw_pairs_users: the dp_simplify splitmix
    geocode, per-user ROW_NUMBER truncation, exact-int L1 cell costs,
    and the DTW recurrence unrolled as anti-diagonal WAVEFRONT CTEs —
    cells with i+j = k read only wavefronts k−1 (up/left) and k−2
    (diagonal); border cells COALESCE to +INF so the LEAST picks the
    only legal predecessor, and (1,1) seeds from the implicit dp(0,0)=0."""
    xor_c = 0x9E3779B97F4A7C15
    INF = 1 << 62
    inner = _sg.chain(
        f"SELECT event_id, ts, user_id FROM events WHERE user_id < {n_users}",
        [("_e", _sg.i64_to_u64("event_id")),
         *_sg.splitmix64_steps("_e", "_h1", "dta"),
         ("_x1", _sg.u64_xor("_h1", str(xor_c))),
         *_sg.splitmix64_steps("_x1", "_h2", "dtb")])
    ctes = [
        "p AS MATERIALIZED (SELECT CAST(user_id AS BIGINT) AS u, "
        "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i, "
        "CAST(_h2 % 360000001 AS BIGINT) - 180000000 AS x, "
        "CAST(_h1 % 180000001 AS BIGINT) - 90000000 AS y "
        f"FROM ({inner}) QUALIFY i <= {max_len})",
        "c AS MATERIALIZED (SELECT a.u AS u1, b.u AS u2, a.i AS i, b.i AS j, "
        "ABS(a.x - b.x) + ABS(a.y - b.y) AS cost "
        "FROM p a JOIN p b ON a.u < b.u)",
        "d2 AS MATERIALIZED (SELECT u1, u2, i, j, cost AS dp FROM c WHERE i = 1 AND j = 1)",
    ]
    for k in range(3, 2 * max_len + 1):
        up_lf = f"d{k - 1}"
        dg = f"d{k - 2}" if k >= 4 else None
        dg_join = (f"LEFT JOIN {dg} dg ON dg.u1 = c.u1 AND dg.u2 = c.u2 "
                   "AND dg.i = c.i - 1 AND dg.j = c.j - 1 " if dg else "")
        dg_val = "COALESCE(dg.dp, " + str(INF) + ")" if dg else str(INF)
        ctes.append(
            f"d{k} AS MATERIALIZED (SELECT c.u1, c.u2, c.i, c.j, c.cost + LEAST("
            f"COALESCE(up.dp, {INF}), COALESCE(lf.dp, {INF}), {dg_val}) AS dp "
            f"FROM c LEFT JOIN {up_lf} up ON up.u1 = c.u1 AND up.u2 = c.u2 "
            "AND up.i = c.i - 1 AND up.j = c.j "
            f"LEFT JOIN {up_lf} lf ON lf.u1 = c.u1 AND lf.u2 = c.u2 "
            "AND lf.i = c.i AND lf.j = c.j - 1 "
            + dg_join +
            f"WHERE c.i + c.j = {k})")
    union = " UNION ALL ".join(f"SELECT * FROM d{k}"
                               for k in range(2, 2 * max_len + 1))
    ctes.append(f"alldp AS ({union})")
    ctes.append("nl AS (SELECT u, MAX(i) AS n FROM p GROUP BY u)")
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT d.u1, d.u2, na.n AS n1, nb.n AS n2, CAST(d.dp AS BIGINT) AS dtw "
        "FROM alldp d JOIN nl na ON na.u = d.u1 JOIN nl nb ON nb.u = d.u2 "
        "WHERE d.i = na.n AND d.j = nb.n")


def _interval_schedule_sql(cap: int = 24) -> str:
    """SQL twin of streaming.interval_schedule_users: the greedy chain
    unrolls as ``cap`` MATERIALIZED rounds — round k's pick is
    MIN(end) over intervals starting at or after round k−1's end (on
    end ties every eligible choice shares the same next end, so MIN is
    the greedy count's exact semantics, no tie rule needed)."""
    ctes = [
        "ev AS (SELECT CAST(user_id AS BIGINT) AS u, "
        "epoch_us(ts) AS s, "
        "epoch_us(ts) + (event_id % 7 + 1) * 60000000 AS e "
        "FROM events)",
        "iv AS MATERIALIZED (SELECT u, s, e FROM (SELECT u, s, e, "
        "ROW_NUMBER() OVER (PARTITION BY u ORDER BY e, s) AS rn FROM ev) "
        f"WHERE rn <= {cap})",
        "g1 AS MATERIALIZED (SELECT u, MIN(e) AS le FROM iv GROUP BY u)",
    ]
    for k in range(2, cap + 1):
        ctes.append(
            f"g{k} AS MATERIALIZED (SELECT g.u, MIN(iv.e) AS le "
            f"FROM g{k - 1} g JOIN iv ON iv.u = g.u AND iv.s >= g.le "
            "GROUP BY g.u)")
    union = " UNION ALL ".join(f"SELECT u FROM g{k}"
                               for k in range(1, cap + 1))
    ctes.append(f"picks AS (SELECT u, COUNT(*) AS n FROM ({union}) "
                "GROUP BY u)")
    ctes.append("nv AS (SELECT u, COUNT(*) AS ni FROM iv GROUP BY u)")
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT nv.u, CAST(COALESCE(p.n, 0) AS BIGINT) AS n_scheduled, "
        "CAST(nv.ni AS BIGINT) AS n_intervals "
        "FROM nv LEFT JOIN picks p ON p.u = nv.u")


def _bloom_zone_sql(zone_width: int = 4096, m_bits: int = 4096, k: int = 3,
                    n_probes: int = 20) -> str:
    """SQL twin of sketches.bloom_zone_prune: per-zone bit positions via
    the identical CMS chain (splitmix64(fnv1a64(key)) xor seed_j →
    splitmix64 → % m), probe positions computed in Python with the
    ENGINE's own hash functions and inlined as literals (the CMS probe
    precedent), hits = all k probe positions set in the zone."""
    from ..stages.sketches import _cms_index, _cms_seeds

    seeds = _cms_seeds(k)
    probe_keys = list(range(n_probes))
    P = _cms_index(np.array([str(x) for x in probe_keys], object),
                   seeds, m_bits)
    steps = [("_fh", _sg.fnv1a64_expr("kk")),
             *_sg.splitmix64_steps("_fh", "_sh", "bz")]
    for j in range(k):
        steps.append((f"_x{j}", _sg.u64_xor("_sh", str(int(seeds[j])))))
        steps.extend(_sg.splitmix64_steps(f"_x{j}", f"_h{j}", f"bzp{j}"))
        steps.append((f"pos{j}", f"CAST(_h{j} % {m_bits} AS BIGINT)"))
    keyed = _sg.chain(
        f"SELECT zone, ck, ck::VARCHAR AS kk FROM z", steps)
    bits_union = " UNION ".join(
        f"SELECT zone, pos{j} AS pos FROM kp" for j in range(k))
    probes_vals = ", ".join(
        f"({q}, {q}, {int(P[0][q])}, {int(P[1][q])}, {int(P[2][q])})"
        for q in range(n_probes))
    return (
        f"WITH z AS MATERIALIZED (SELECT o_orderkey // {zone_width} AS zone, "
        "o_custkey AS ck FROM orders), "
        f"kp AS MATERIALIZED ({keyed}), "
        f"bits AS MATERIALIZED ({bits_union}), "
        f"probes(q, pkey, p0, p1, p2) AS (VALUES {probes_vals}), "
        "zs AS (SELECT DISTINCT zone FROM z), "
        "hits AS (SELECT p.q, s.zone FROM probes p CROSS JOIN zs s "
        "WHERE EXISTS (SELECT 1 FROM bits b WHERE b.zone = s.zone AND b.pos = p.p0) "
        "AND EXISTS (SELECT 1 FROM bits b WHERE b.zone = s.zone AND b.pos = p.p1) "
        "AND EXISTS (SELECT 1 FROM bits b WHERE b.zone = s.zone AND b.pos = p.p2)), "
        "pres AS (SELECT DISTINCT z.zone, z.ck FROM z "
        f"WHERE z.ck >= 0 AND z.ck < {n_probes}), "
        "nz AS (SELECT COUNT(*) AS n FROM zs) "
        "SELECT CAST(p.q AS BIGINT) AS probe_key, "
        "CAST(nz.n AS BIGINT) AS n_zones, "
        "CAST(COALESCE(h.c, 0) AS BIGINT) AS n_hit, "
        "CAST(COALESCE(e.c, 0) AS BIGINT) AS n_present, "
        "CAST(COALESCE(h.c, 0) - COALESCE(e.c, 0) AS BIGINT) AS n_false_pos "
        "FROM probes p CROSS JOIN nz "
        "LEFT JOIN (SELECT q, COUNT(*) AS c FROM hits GROUP BY q) h ON h.q = p.q "
        "LEFT JOIN (SELECT ck, COUNT(*) AS c FROM pres GROUP BY ck) e "
        "ON e.ck = p.pkey")
