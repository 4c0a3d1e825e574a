"""Per-file media-probe fan-out.

The reference shells out to ``ffprobe -print_format json`` once per A/V
file and lands the JSON in enrichment tables (itdbmetadata.py:135-157,
:107-125). Engine shape: an incremental anti-join picks unprobed tracks
(plans.unprobed_av_tracks), then a ``mapInPandas`` fan-out runs the probe
subprocess inside executors — parallel across partitions, with per-file
error capture (the reference logs-and-skips, itdbmetadata.py:156-157).

``ffprobe`` is not installed in this container: the prober is injectable
and defaults to a deterministic stub so the distribution plumbing (batch
iteration, timeout/error capture, JSON landing schema) is fully testable.
"""

from __future__ import annotations

import json
import shutil
import subprocess
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

PROBE_SCHEMA = T.StructType(
    [
        T.StructField("Persistent_ID", T.StringType(), False),
        T.StructField("path", T.StringType(), True),
        T.StructField("ffprobe", T.StringType(), True),  # raw JSON (itdbmetadata.py:107-115)
        T.StructField("error", T.StringType(), True),
    ]
)


def ffprobe_available() -> bool:
    return shutil.which("ffprobe") is not None


def real_probe(path: str, timeout_s: int = 30) -> str:
    """The reference's subprocess probe (itdbmetadata.py:142-154)."""
    out = subprocess.run(
        ["ffprobe", "-v", "quiet", "-print_format", "json", "-show_format",
         "-show_streams", path],
        capture_output=True,
        timeout=timeout_s,
        check=True,
    )
    return out.stdout.decode("utf-8", "replace")


def stub_probe(path: str, timeout_s: int = 30) -> str:
    """Deterministic fake: metadata derived from the path string."""
    h = sum(path.encode()) % 3
    height = [480, 720, 1080][h]
    return json.dumps(
        {"streams": [{"index": 0, "codec_type": "video", "height": height,
                      "width": height * 16 // 9}],
         "format": {"filename": path}}
    )


def probe_files(df: DataFrame, id_col: str = "Persistent_ID",
                path_col: str = "path", prober=None) -> DataFrame:
    """(id, path) → (id, path, ffprobe JSON, error) via mapInPandas.

    Scale: one subprocess per file, parallel per executor core; errors are
    captured per row, never failing the job (matching the reference's
    log-and-continue). Repartition upstream to spread files evenly —
    probe cost is per-file, not per-byte."""
    probe = prober or (real_probe if ffprobe_available() else stub_probe)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for pid, path in zip(pdf[id_col], pdf[path_col]):
                try:
                    out.append((pid, path, probe(path), None))
                except Exception as e:  # log-and-skip (itdbmetadata.py:156-157)
                    out.append((pid, path, None, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(out, columns=["Persistent_ID", "path", "ffprobe", "error"])

    return df.select(id_col, path_col).mapInPandas(run, PROBE_SCHEMA)


def explode_streams(probed: DataFrame) -> DataFrame:
    """Raw ffprobe JSON → one row per stream (ffprobe_streams shape,
    itdbmetadata.py:116-125) using from_json + explode — JVM-side."""
    from pyspark.sql import functions as F

    streams_t = "STRUCT<streams: ARRAY<STRING>>"
    # Keep each stream as raw JSON text (the reference stores JSON columns);
    # typed access goes through get_json_object at query time.
    parsed = probed.where(F.col("ffprobe").isNotNull()).select(
        "Persistent_ID",
        F.from_json("ffprobe", streams_t).alias("j"),
    )
    return parsed.select(
        "Persistent_ID",
        F.posexplode("j.streams").alias("stream_index", "stream"),
    )
