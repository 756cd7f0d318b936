"""Skip-if-absent tests for the real-artifact seams.

Each import-gated slot (onnxruntime .onnx serving, PIL image decode, fiona
shapefile scan) has a working synthetic twin that the main suite exercises;
these tests drive the REAL path so the seams are provably one `pip install`
from live. In environments without the optional dependency the test skips
with a visible reason instead of silently not existing — the round-2 review
asked for exactly this visibility.

Why the skips persist in this sandbox (round-4 review asked to attempt
`pip install pillow onnxruntime fiona`): the build environment explicitly
prohibits package installation (no pip/apt; only the baked-in set —
pyspark, pyarrow, pandas, numpy, duckdb, pytest, hypothesis). The skips
are therefore environmental by policy, not by a failed install; any
environment that ships these packages runs the tests live with zero code
changes.
"""

from __future__ import annotations

import os

import numpy as np
import pytest


def test_onnx_model_serves_real_artifact(tmp_path):
    ort = pytest.importorskip(
        "onnxruntime",
        reason="onnxruntime not installed — OnnxModel seam is one import from live",
    )
    onnx = pytest.importorskip(
        "onnx", reason="onnx (model builder) not installed — cannot author a .onnx artifact"
    )
    from onnx import TensorProto, helper, numpy_helper

    from nzgmdb_spark.kernels.inference import OnnxModel, mlp_weights

    w = mlp_weights()
    # author the SAME MLP the .npz artifact carries: x@W1+b1 -> relu -> @W2+b2 -> sigmoid
    nodes = [
        helper.make_node("MatMul", ["x", "W1"], ["h0"]),
        helper.make_node("Add", ["h0", "b1"], ["h1"]),
        helper.make_node("Relu", ["h1"], ["h2"]),
        helper.make_node("MatMul", ["h2", "W2"], ["l0"]),
        helper.make_node("Add", ["l0", "b2"], ["l1"]),
        helper.make_node("Sigmoid", ["l1"], ["y"]),
    ]
    inits = [
        numpy_helper.from_array(w["W1"].astype(np.float32), "W1"),
        numpy_helper.from_array(w["b1"].astype(np.float32), "b1"),
        numpy_helper.from_array(w["W2"].astype(np.float32), "W2"),
        numpy_helper.from_array(w["b2"].astype(np.float32), "b2"),
    ]
    graph = helper.make_graph(
        nodes,
        "mlp",
        [helper.make_tensor_value_info("x", TensorProto.FLOAT, [None, w["W1"].shape[0]])],
        [helper.make_tensor_value_info("y", TensorProto.FLOAT, [None, 1])],
        inits,
    )
    model = helper.make_model(graph)
    path = os.path.join(str(tmp_path), "clip.onnx")
    onnx.save(model, path)

    m = OnnxModel(path)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, w["W1"].shape[0])).astype(np.float32)
    got = m.predict(x)
    h = np.maximum(x @ w["W1"].astype(np.float32) + w["b1"].astype(np.float32), 0)
    want = 1.0 / (1.0 + np.exp(-(h @ w["W2"].astype(np.float32) + w["b2"].astype(np.float32))))
    assert np.allclose(got, want.ravel(), atol=1e-5)


def test_pil_decodes_real_png():
    pytest.importorskip(
        "PIL", reason="PIL not installed — real_image_decoder seam is one import from live"
    )
    import io

    from PIL import Image

    from nzgmdb_spark.operators.multimodal import real_image_decoder

    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (12, 9, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    got = real_image_decoder(buf.getvalue())
    assert got.shape == (12, 9, 3)
    assert np.array_equal(got, arr)  # PNG is lossless


def test_fiona_reads_real_shapefile(spark, tmp_path):
    fiona = pytest.importorskip(
        "fiona", reason="fiona not installed — read_shapefile seam is one import from live"
    )
    from nzgmdb_spark.sources.remote import read_shapefile

    schema = {
        "geometry": "Polygon",
        "properties": {"name": "str", "domain_no": "int"},
    }
    path = os.path.join(str(tmp_path), "domains.shp")
    ring = [(174.0, -41.0), (175.0, -41.0), (175.0, -40.0), (174.0, -41.0)]
    with fiona.open(path, "w", driver="ESRI Shapefile", schema=schema) as dst:
        dst.write(
            {
                "geometry": {"type": "Polygon", "coordinates": [ring]},
                "properties": {"name": "TVZ", "domain_no": 4},
            }
        )
    df = read_shapefile(spark, path)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["name"] == "TVZ" and rows[0]["domain_no"] == 4
    # vertices come back [lat, lon]
    assert rows[0]["vertices"][0] == [-41.0, 174.0]

    # The reference layer's own property names (reference
    # tect_domain.py:336: 'Domain_No'/'DomainType') resolve via the
    # default key map — no silent '' / 0 defaults.
    ref_schema = {
        "geometry": "Polygon",
        "properties": {"DomainType": "str", "Domain_No": "int"},
    }
    ref_path = os.path.join(str(tmp_path), "ref_keys.shp")
    with fiona.open(ref_path, "w", driver="ESRI Shapefile", schema=ref_schema) as dst:
        dst.write(
            {
                "geometry": {"type": "Polygon", "coordinates": [ring]},
                "properties": {"DomainType": "Taupo Volcanic Zone", "Domain_No": 4},
            }
        )
    ref_rows = read_shapefile(spark, ref_path).collect()
    assert ref_rows[0]["name"] == "Taupo Volcanic Zone"
    assert ref_rows[0]["domain_no"] == 4

    # A layer missing every candidate key raises instead of defaulting.
    bad_schema = {"geometry": "Polygon", "properties": {"other": "str"}}
    bad_path = os.path.join(str(tmp_path), "bad_keys.shp")
    with fiona.open(bad_path, "w", driver="ESRI Shapefile", schema=bad_schema) as dst:
        dst.write(
            {
                "geometry": {"type": "Polygon", "coordinates": [ring]},
                "properties": {"other": "x"},
            }
        )
    with pytest.raises(KeyError, match="none of"):
        read_shapefile(spark, bad_path)

    # A projected (non-4326) layer is rejected — NZTM meters must not be
    # silently read as degrees.
    from fiona.crs import CRS

    nztm_path = os.path.join(str(tmp_path), "nztm.shp")
    nztm_ring = [(1570000.0, 5180000.0), (1600000.0, 5180000.0), (1600000.0, 5200000.0), (1570000.0, 5180000.0)]
    with fiona.open(
        nztm_path, "w", driver="ESRI Shapefile", schema=schema, crs=CRS.from_epsg(2193)
    ) as dst:
        dst.write(
            {
                "geometry": {"type": "Polygon", "coordinates": [nztm_ring]},
                "properties": {"name": "TVZ", "domain_no": 4},
            }
        )
    with pytest.raises(ValueError, match="EPSG:2193"):
        read_shapefile(spark, nztm_path)


def test_gated_slots_raise_cleanly_without_deps():
    """When the optional deps are absent the slots must fail loudly with an
    actionable message, not crash obscurely mid-pipeline."""
    for mod, fn in [
        ("onnxruntime", lambda: __import__("nzgmdb_spark.kernels.inference", fromlist=["OnnxModel"]).OnnxModel("/nonexistent.onnx")),
        ("PIL", lambda: __import__("nzgmdb_spark.operators.multimodal", fromlist=["real_image_decoder"]).real_image_decoder(b"")),
    ]:
        try:
            __import__(mod)
        except ImportError:
            with pytest.raises(NotImplementedError):
                fn()
