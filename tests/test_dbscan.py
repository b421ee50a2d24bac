"""DBSCAN parity vs a brute-force numpy oracle (same deterministic rules)."""

import numpy as np
import pandas as pd
import pytest

from geowave_spark.operators.dbscan import dbscan

rng = np.random.default_rng(42)


def _mk_points():
    """Three dense blobs + sparse noise + a bridge of border points."""
    blobs = []
    for cx, cy, n in [(0.0, 0.0, 60), (1.0, 1.0, 50), (-2.0, 3.0, 40)]:
        blobs.append(np.column_stack([
            cx + rng.normal(0, 0.05, n),
            cy + rng.normal(0, 0.05, n),
        ]))
    noise = np.column_stack([rng.uniform(-5, 5, 25), rng.uniform(-5, 5, 25)])
    pts = np.vstack(blobs + [noise])
    ids = [f"p{i:05d}" for i in range(len(pts))]
    return pd.DataFrame({"pid": ids, "lon": pts[:, 0], "lat": pts[:, 1]})


def oracle_dbscan(pdf, eps, min_pts):
    x = pdf["lon"].to_numpy()
    y = pdf["lat"].to_numpy()
    ids = pdf["pid"].to_numpy()
    n = len(pdf)
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    nbr = (d2 <= eps * eps)
    deg = nbr.sum(axis=1)  # includes self
    core = deg >= min_pts
    # components over core-core adjacency
    label = {i: None for i in range(n)}
    comp = {}
    for i in np.nonzero(core)[0]:
        if label[i] is not None:
            continue
        stack = [i]
        members = []
        while stack:
            j = stack.pop()
            if label[j] is not None:
                continue
            label[j] = -2  # visiting
            members.append(j)
            for k in np.nonzero(nbr[j] & core)[0]:
                if label[k] is None:
                    stack.append(k)
        cid = min(ids[m] for m in members)
        for m in members:
            comp[m] = cid
    out = {}
    for i in range(n):
        if core[i]:
            out[ids[i]] = (comp[i], True)
        else:
            core_nbrs = [comp[j] for j in np.nonzero(nbr[i] & core)[0] if j != i]
            out[ids[i]] = (min(core_nbrs) if core_nbrs else None, False)
    return out


@pytest.mark.parametrize("eps,min_pts", [(0.15, 5), (0.3, 10)])
def test_dbscan_matches_oracle(spark, eps, min_pts):
    pdf = _mk_points()
    df = spark.createDataFrame(pdf)
    got = {
        r["pid"]: (r["cluster"], r["is_core"])
        for r in dbscan(df, eps, min_pts, id_col="pid").collect()
    }
    want = oracle_dbscan(pdf, eps, min_pts)
    assert got == want
    clusters = {c for c, _ in want.values() if c}
    assert len(clusters) >= 2  # fixture really forms clusters
    assert any(c is None for c, _ in want.values())  # and noise


def test_long_chain_distributed_equals_unionfind(spark):
    """A 300-point chain (diameter 300 hops) must resolve to ONE cluster
    on BOTH component paths — the plain edge relax silently returned
    unconverged labels past max_iter before pointer jumping."""
    import pandas as pd

    from geowave_spark.operators.dbscan import dbscan

    n = 300
    pdf = pd.DataFrame(
        {"image_id": [f"p{i:04d}" for i in range(n)],
         "lon": np.arange(n) * 0.5, "lat": np.zeros(n)}
    )
    df = spark.createDataFrame(pdf)
    fast = dbscan(df, eps=0.6, min_pts=2).toPandas()
    dist = dbscan(df, eps=0.6, min_pts=2, driver_cc_limit=0).toPandas()
    for out in (fast, dist):
        out = out.sort_values("image_id")
        assert out["cluster"].nunique() == 1 and out["cluster"].notna().all()
    assert fast.sort_values("image_id")["cluster"].tolist() == dist.sort_values("image_id")["cluster"].tolist()
