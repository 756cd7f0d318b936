"""Model-inference adapter (VERDICT r1 #9): artifact loading, worker-side
caching, backend gating, and the Spark predict_batch_udf path."""

from __future__ import annotations

import numpy as np
import pytest

from nzgmdb_spark.kernels.inference import (
    NpzMLP,
    load_model,
    mlp_weights,
    predict_batch_udf,
    write_mlp_artifact,
)


def test_npz_artifact_roundtrip(tmp_path):
    path = str(tmp_path / "m.npz")
    write_mlp_artifact(path)
    model = NpzMLP(path)
    w = mlp_weights()
    x = np.random.default_rng(3).standard_normal((10, 64))
    want = 1.0 / (1.0 + np.exp(-((np.maximum(x @ w["W1"] + w["b1"], 0.0) @ w["W2"]) + w["b2"]).ravel()))
    np.testing.assert_allclose(model.predict(x), want, rtol=1e-15)


def test_load_model_caches_per_path(tmp_path):
    path = str(tmp_path / "m.npz")
    write_mlp_artifact(path)
    assert load_model(path) is load_model(path)


def test_onnx_backend_gated(tmp_path):
    # onnxruntime is absent in this container: the .onnx branch must fail
    # with a clear NotImplementedError, not an obscure ImportError later
    path = tmp_path / "m.onnx"
    path.write_bytes(b"not a real model")
    with pytest.raises((NotImplementedError, Exception)) as ei:
        load_model(str(path))
    assert "onnxruntime" in str(ei.value) or "onnx" in str(ei.value).lower()


def test_unknown_artifact_type(tmp_path):
    path = tmp_path / "m.bin"
    path.write_bytes(b"")
    with pytest.raises(ValueError, match="unknown model artifact"):
        load_model(str(path))


def test_predict_batch_udf_spark(spark, tmp_path):
    path = str(tmp_path / "m.npz")
    write_mlp_artifact(path)
    rng = np.random.default_rng(9)
    rows = [(i, [float(v) for v in rng.standard_normal(64)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: r.p
        for r in df.select("vec_id", predict_batch_udf(path)("embedding").alias("p")).collect()
    }
    model = NpzMLP(path)
    x = np.stack([np.asarray(e) for _, e in rows])
    want = model.predict(x)
    for i in range(40):
        assert got[i] == pytest.approx(want[i], rel=1e-14)
