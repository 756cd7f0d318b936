"""Batched model-inference adapter (reference filtering.py:15-59 ClipNet,
run_phasenet.py:48-106 PhaseNet: neural scorers applied per record).

The engine treats a model as an ARTIFACT + a schema-in/schema-out batch
function, served through Arrow-batched pandas UDFs — the
``predict_batch_udf`` pattern: the artifact is loaded ONCE PER EXECUTOR
WORKER (process-level cache keyed by path+mtime), never per batch and
never on the driver, and inference runs vectorized over each Arrow batch.

Backends, resolved by file extension:
- ``.onnx`` → onnxruntime session (import-gated: raises a clear
  NotImplementedError when onnxruntime is absent, as in this container);
- ``.npz``  → a real, loadable MLP artifact (W1/b1/W2/b2 arrays,
  forward = sigmoid(relu(x@W1+b1)@W2+b2)) run with numpy — used by the
  oracle-checked registered query and the integration tests;
- anything else → ValueError.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

_MODEL_CACHE: dict = {}  # (path, mtime) -> model; one entry per worker


class NpzMLP:
    """Tiny real MLP artifact: npz with W1 (d_in×h), b1, W2 (h×1), b2."""

    def __init__(self, path: str):
        with np.load(path) as z:
            self.w1 = z["W1"].astype(np.float64)
            self.b1 = z["b1"].astype(np.float64)
            self.w2 = z["W2"].astype(np.float64)
            self.b2 = z["b2"].astype(np.float64)

    @property
    def n_out(self) -> int:
        return self.w2.shape[1]

    def predict(self, x: np.ndarray) -> np.ndarray:
        """(n, d_in) → (n,) for single-output artifacts, (n, k) for
        multi-output ones (e.g. a GMC-style score/fmin/multi head)."""
        h = np.maximum(x @ self.w1 + self.b1, 0.0)
        logit = h @ self.w2 + self.b2
        out = 1.0 / (1.0 + np.exp(-logit))
        return out.ravel() if self.n_out == 1 else out


class OnnxModel:  # pragma: no cover - exercised only where onnxruntime exists
    def __init__(self, path: str):
        try:
            import onnxruntime as ort
        except ImportError as e:
            raise NotImplementedError(
                "onnxruntime is not installed in this environment; ship a "
                ".npz MLP artifact or install onnxruntime to serve .onnx"
            ) from e
        self.session = ort.InferenceSession(path)
        self.input_name = self.session.get_inputs()[0].name

    def predict(self, x: np.ndarray) -> np.ndarray:
        out = self.session.run(None, {self.input_name: x.astype(np.float32)})
        return np.asarray(out[0]).ravel()


def load_model(path: str):
    """Worker-side artifact load with a process-level cache."""
    key = (path, os.path.getmtime(path))
    model = _MODEL_CACHE.get(key)
    if model is None:
        if path.endswith(".onnx"):
            model = OnnxModel(path)
        elif path.endswith(".npz"):
            model = NpzMLP(path)
        else:
            raise ValueError(f"unknown model artifact type: {path}")
        _MODEL_CACHE.clear()  # one live model per worker is plenty here
        _MODEL_CACHE[key] = model
    return model


def predict_batch_udf(model_path: str):
    """pandas UDF: array<float> feature column → double score. The model
    loads lazily inside the executor worker on first batch."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _predict(features):
        model = load_model(model_path)
        x = np.stack([np.asarray(f, dtype=np.float64) for f in features])
        return pd.Series(model.predict(x))

    return pandas_udf(_predict, "double")


def predict_batch_udf_multi(model_path: str):
    """pandas UDF: array<float> features → array<double> of k model
    outputs (multi-head artifacts such as a GMC-style scorer)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _predict(features):
        model = load_model(model_path)
        x = np.stack([np.asarray(f, dtype=np.float64) for f in features])
        out = np.atleast_2d(model.predict(x))
        return pd.Series([row.tolist() for row in out])

    return pandas_udf(_predict, "array<double>")


# --- Deterministic artifact generation (md5-derived weights, the engine's
# seeding convention): the SAME integers parametrize the staged npz file
# AND the SQL oracle's inline weight tables, so real file-backed inference
# is value-hash-checkable.


def _md5_weight(tag: str, i: int, j: int) -> float:
    h = hashlib.md5(f"{tag}_{i}_{j}".encode()).hexdigest()
    return (int(h[0], 16) - 7.5) / 8.0


def mlp_weights(
    d_in: int = 64, hidden: int = 4, n_out: int = 1
) -> dict[str, np.ndarray]:
    w1 = np.array(
        [[_md5_weight("w1", i, j) for j in range(hidden)] for i in range(d_in)]
    )
    b1 = np.array([_md5_weight("b1", 0, j) for j in range(hidden)])
    w2 = np.array(
        [[_md5_weight("w2", j, o) for o in range(n_out)] for j in range(hidden)]
    )
    b2 = np.array([_md5_weight("b2", 0, o) for o in range(n_out)])
    return {"W1": w1, "b1": b1, "W2": w2, "b2": b2}


def write_mlp_artifact(
    path: str, d_in: int = 64, hidden: int = 4, n_out: int = 1
) -> None:
    np.savez(path, **mlp_weights(d_in, hidden, n_out))
