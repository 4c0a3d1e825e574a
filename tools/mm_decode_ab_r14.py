#!/usr/bin/env python
"""Round-14 decode-stage A/B (r13 VERDICT #4): the vendored PNG
unfilter was a per-byte Python loop; decode_png_pixels_batch runs it
numpy-vectorized across every same-shape image in the Arrow batch.
This times the CUMULATIVE kernel stages of mm-ahash's pipeline at the
given SF dirs with the decode step in both forms:

  encode        — synth + vendored PNG encode (shared prefix)
  decode_scalar — + per-image decode_png_pixels        (the r13 form)
  decode_batch  — + batched decode_png_pixels_batch    (the r14 form)
  full          — the registered mm-ahash query (now on the batch form)

Prints one JSON line per SF dir (best-of-3 after worker warmup).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from itdb_spark.queries import load_all
from itdb_spark.session import get_spark

SF_DIRS = sys.argv[1:] or ["/root/repo/.scale/sf1.0", "/root/repo/.scale/sf10"]


def kernel(stage):
    def work(batches):
        import pandas as pd

        from itdb_spark.operators.pngcodec import (
            decode_png_pixels,
            decode_png_pixels_batch,
            encode_png,
        )

        for pdf in batches:
            out = 0
            pngs = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                g = doc_id % 50
                w = 1 + g % 13
                h = 1 + (g * 3) % 11
                v = (doc_id // 50) % 5
                raw = bytes(
                    (g * 31 + i * 7 + (v if i % 29 == 0 else 0)) % 251
                    for i in range(w * h * 3)
                )
                png = encode_png(w, h, raw, 2, phase=doc_id % 5)
                out ^= png[0]
                if stage == "decode_scalar":
                    dw, dh, ch, px = decode_png_pixels(png)
                    out ^= px[0]
                elif stage == "decode_batch":
                    pngs.append(png)
            if stage == "decode_batch":
                for dw, dh, ch, px in decode_png_pixels_batch(pngs):
                    out ^= px[0]
            yield pd.DataFrame({"v": [out]})

    return work


def best(f, n=3):
    b = float("inf")
    for _ in range(n):  # first pass warms the python worker pool
        t0 = time.perf_counter()
        f()
        b = min(b, time.perf_counter() - t0)
    return round(b, 3)


def main() -> None:
    spark = get_spark("mm_decode_ab_r14", cpus=32)
    q = load_all()["mm-ahash"].spark
    for sf_dir in SF_DIRS:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id"
        )
        row = {"sf_dir": sf_dir, "docs": docs.count()}
        for stage in ("encode", "decode_scalar", "decode_batch"):
            row[stage] = best(
                lambda s=stage: docs.mapInPandas(kernel(s), "v long").count()
            )
        row["decode_stage_scalar"] = round(
            row["decode_scalar"] - row["encode"], 3
        )
        row["decode_stage_batch"] = round(
            row["decode_batch"] - row["encode"], 3
        )
        row["full"] = best(
            lambda: q(spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
