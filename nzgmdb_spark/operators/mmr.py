"""MMR (maximal-marginal-relevance) greedy re-rank as ONE Arrow kernel.

Round-2 review flagged the unrolled-plan formulation (k argmax branches →
120 broadcast joins / 40 shuffles at k=5, plan size linear in k) as the
wrong serving shape. The operator semantics are: given a small candidate
set (top-N by query relevance, N ≈ tens — always broadcastable), greedily
pick k items maximizing  lam·rel − mu·max_sim(candidate, already-picked).

That greedy is O(N·k) with all-candidate state at every step — i.e. a
driver-side-looking loop over a *bounded* set. The right Spark shape is a
single `applyInPandas` group kernel over the candidate set: one stage, one
tiny shuffle, plan size CONSTANT in k. The unrolled DataFrame plan is kept
(mmr_unrolled_plan) as the cross-checkable twin — equality at several k is
property-tested in tests/test_properties.py.

Cross-engine exactness: pairwise cosines inside the kernel reproduce the
SQL twin's DECIMAL(38,12) semantics — each float64 product is quantized
HALF_UP to 12 dp (what Spark/DuckDB `CAST(double AS DECIMAL(38,12))` do),
summed exactly in `decimal`, and converted to double with one correct
rounding. Scores therefore match the unrolled plan and the DuckDB oracle
bit-for-bit, so selection (incl. ties, broken by vec_id) is identical.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_Q12 = Decimal("1e-12")


def _dot_decimal12(a: np.ndarray, b: np.ndarray) -> float:
    """sum(CAST(a_i*b_i AS DECIMAL(38,12))) cast back to DOUBLE — the exact
    reduction-order-free dot product both engines compute in SQL."""
    total = Decimal(0)
    for x, y in zip(a, b):
        total += Decimal(float(x) * float(y)).quantize(_Q12, rounding=ROUND_HALF_UP)
    return float(total)


def mmr_rerank(
    cand: DataFrame, k: int, lam: float, mu: float | None = None
) -> DataFrame:
    """Greedy MMR over a candidate DataFrame with columns
    (vec_id, rel, nrm, embedding). Returns (rank, vec_id, score) with raw
    (unrounded) scores; ties broken by ascending vec_id like the SQL twin's
    ORDER BY score DESC, vec_id."""
    if mu is None:
        mu = round(1.0 - lam, 1)

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n == 0:
            return pd.DataFrame(columns=["rank", "vec_id", "score"])
        ids = pdf["vec_id"].to_numpy()
        rel = pdf["rel"].to_numpy(dtype=np.float64)
        nrm = pdf["nrm"].to_numpy(dtype=np.float64)
        vecs = [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
        sims = np.zeros((n, n))
        for i in range(n):
            for j in range(i + 1, n):
                s = _dot_decimal12(vecs[i], vecs[j]) / (nrm[i] * nrm[j])
                sims[i, j] = sims[j, i] = s
        picked: list[int] = []
        out = []
        for rank in range(1, min(k, n) + 1):
            best_i, best_key = -1, None
            for i in range(n):
                if i in picked:
                    continue
                if picked:
                    score = lam * rel[i] - mu * max(sims[i, j] for j in picked)
                else:
                    score = lam * rel[i]
                key = (-score, ids[i])
                if best_key is None or key < best_key:
                    best_i, best_key = i, key
            picked.append(best_i)
            out.append(
                {"rank": rank, "vec_id": int(ids[best_i]), "score": -best_key[0]}
            )
        return pd.DataFrame(out, columns=["rank", "vec_id", "score"])

    return (
        cand.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(
            lambda _key, pdf: greedy(pdf), "rank int, vec_id bigint, score double"
        )
    )
