"""Binary waveform scan/decode and waveform sinks (SURVEY.md §2.1 S9, S11,
S13; multimodal binary-column pattern).

The reference reads MiniSEED with mseedlib into (1, n_samples, 3) float
arrays (mseed_management/reading.py:15-68, 113-124) and writes processed
series as per-component ASCII text (process_observed.py:156-166). Here a
waveform is a ROW: ``(record_id, dt, acc_000, acc_090, acc_ver)`` with
array<double> components — the side HDF5 file for probability series
(run_phasenet.py:237-251) becomes just another array column (S11), no
side-channel files.

The decode step is pluggable: ``mseed_decoder`` is a REAL MiniSEED
decoder built on the first-principles SEED 2.4 codec in ``mseed_codec``
(fixed header + blockette 1000 + Steim1/Steim2/INT/FLOAT payloads — no
mseedlib dependency), round-trip tested bit-exact; ``synthetic_decoder``
is a deterministic fake that derives a waveform from the blob bytes,
keeping oracle-checked queries independent of real fixture files. Both
run the same Spark plumbing (binaryFile scan → Arrow batch → decode →
array columns).
This is the same pattern the engine uses for image/audio/video columns:
opaque binary + typed metadata, decode behind a mapInPandas boundary.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WAVEFORM_SCHEMA = (
    "record_id string, dt double, n_samples int, "
    "acc_000 array<double>, acc_090 array<double>, acc_ver array<double>"
)

Decoder = Callable[[str, bytes], dict]


def read_waveform_blobs(
    spark: SparkSession, root: str, pattern: str = "*.mseed"
) -> DataFrame:
    """S9 scan half: binary files as (path, content) rows. Files are split
    across tasks by Spark's binary source; maxPartitionBytes controls
    packing of many small records into one task.
    """
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", True)
        .load(root)
        .select("path", "content")
    )


# channel last-character → waveform component (FDSN orientation codes)
_COMPONENT_BY_ORIENT = {
    "1": "acc_000", "N": "acc_000",
    "2": "acc_090", "E": "acc_090",
    "Z": "acc_ver",
}


def mseed_decoder(path: str, blob: bytes) -> dict:
    """Real MiniSEED decode (reference reading.py:15-68), via the
    first-principles SEED 2.4 codec in ``mseed_codec`` (fixed header +
    blockette 1000 + Steim1/Steim2/INT/FLOAT payloads) — no mseedlib
    dependency. Channels are mapped to the 3-component waveform row by
    FDSN orientation code (…1/…N → 000, …2/…E → 090, …Z → vertical);
    missing components decode as empty arrays.
    """
    from nzgmdb_spark.sources.mseed_codec import decode_records

    segments = decode_records(bytes(blob))
    if not segments:
        raise ValueError(f"{path}: no MiniSEED records decoded")
    comps: dict[str, np.ndarray] = {}
    rate = None
    for seg in segments:
        comp = _COMPONENT_BY_ORIENT.get(seg.channel[-1:])
        if comp is None or comp in comps:
            continue  # unknown orientation / duplicate: first wins
        comps[comp] = np.asarray(seg.samples, dtype=np.float64)
        rate = rate or seg.rate
    if rate is None or rate <= 0:
        raise ValueError(f"{path}: no usable channel orientations")
    n = max((len(v) for v in comps.values()), default=0)
    record_id = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
    empty = np.zeros(0, dtype=np.float64)
    return {
        "record_id": record_id,
        "dt": 1.0 / rate,
        "n_samples": n,
        "acc_000": comps.get("acc_000", empty),
        "acc_090": comps.get("acc_090", empty),
        "acc_ver": comps.get("acc_ver", empty),
    }


def synthetic_decoder(path: str, blob: bytes) -> dict:
    """Deterministic fake decode: blob bytes → seed → fixed-rate 3-component
    waveform. Same output for the same blob on any executor/partitioning.
    """
    digest = hashlib.sha256(blob).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    n = 256 + int(digest[8]) * 4
    t = np.arange(n) * 0.01
    base = np.sin(2 * np.pi * (1.0 + digest[9] / 64.0) * t)
    comps = [base * rng.standard_normal() + 0.01 * rng.standard_normal(n) for _ in range(3)]
    record_id = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
    return {
        "record_id": record_id,
        "dt": 0.01,
        "n_samples": n,
        "acc_000": comps[0],
        "acc_090": comps[1],
        "acc_ver": comps[2],
    }


def decode_waveform_blobs(
    blobs: DataFrame, decoder: Decoder = synthetic_decoder
) -> DataFrame:
    """S9 decode half: (path, content) → waveform rows via one narrow
    mapInPandas pass (no shuffle; Arrow-batched)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                decoder(p, bytes(b))
                for p, b in zip(pdf["path"], pdf["content"])
            ]
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(run, schema=WAVEFORM_SCHEMA)


def write_waveform_ascii(
    waveforms: DataFrame, out_dir: str, values_per_line: int = 8
) -> DataFrame:
    """S13: processed-waveform ASCII sink (timeseries_to_text equivalent,
    process_observed.py:156-166): one text file per (record, component).

    Executor-side foreachPartition writer — each task writes its own
    records, no driver collect. Returns the manifest (record_id, component,
    path, n_samples) as a DataFrame for downstream bookkeeping.
    """
    import os

    comps = ("acc_000", "acc_090", "acc_ver")

    def write_partition(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        os.makedirs(out_dir, exist_ok=True)
        for pdf in pdfs:
            out = []
            for row in pdf.itertuples(index=False):
                for comp in comps:
                    vals = np.asarray(getattr(row, comp), dtype=np.float64)
                    suffix = comp.rsplit("_", 1)[-1]
                    path = os.path.join(out_dir, f"{row.record_id}.{suffix}")
                    with open(path, "w") as f:
                        f.write(f"{row.record_id} {suffix} {row.dt:.6g} {len(vals)}\n")
                        for i in range(0, len(vals), values_per_line):
                            f.write(
                                " ".join(f"{v:.6e}" for v in vals[i : i + values_per_line])
                                + "\n"
                            )
                    out.append((row.record_id, suffix, path, len(vals)))
            yield pd.DataFrame(
                out, columns=["record_id", "component", "path", "n_samples"]
            )

    return waveforms.mapInPandas(
        write_partition,
        schema="record_id string, component string, path string, n_samples int",
    )
