#!/usr/bin/env python
"""Round-13 stage attribution (r12 VERDICT #6): mm-ahash's 3.0x second
decade, decomposed. The query is scan → per-doc Python kernel
(synthesize raw RGB → encode PNG → decode PNG → 64-point luma sample →
bit string) → ONE fingerprint shuffle. Each stage is timed cumulatively
at the given SF (best-of-2 after warmup, noop-equivalent count sinks):

  scan     — documents.select(doc_id) alone
  synth    — + raw byte synthesis
  encode   — + vendored PNG encode
  decode   — + vendored PNG decode (geometry check included)
  sample   — + 64-point luma sampling + mean + bit string (full kernel)
  full     — the registered query (kernel + fingerprint groupBy)

Prints one JSON line per SF dir given (default sf1.0 and sf10).
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
            encode_png,
        )

        for pdf in batches:
            out = 0
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                g = doc_id % 50
                w = 1 + g % 13
                h = 1 + (g * 3) % 11
                v = (doc_id // 50) % 5
                if stage == "synth" or stage in ("encode", "decode", "sample"):
                    raw = bytes(
                        (g * 31 + i * 7 + (v if i % 29 == 0 else 0)) % 251
                        for i in range(w * h * 3)
                    )
                    out ^= raw[0]
                if stage in ("encode", "decode", "sample"):
                    png = encode_png(w, h, raw, 2, phase=doc_id % 5)
                    out ^= png[0]
                if stage in ("decode", "sample"):
                    dw, dh, ch, px = decode_png_pixels(png)
                    out ^= px[0]
                if stage == "sample":
                    lumas = []
                    for k in range(64):
                        r, c = k // 8, k % 8
                        p = ((r * h) // 8) * w + ((c * w) // 8)
                        lumas.append(
                            (px[3 * p] + px[3 * p + 1] + px[3 * p + 2]) // 3
                        )
                    mean = sum(lumas) // 64
                    out ^= len("".join("1" if x > mean else "0" for x in lumas))
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
    spark = get_spark("ahash_profile_r13", cpus=32)
    q = load_all()["mm-ahash"].spark
    for sf_dir in SF_DIRS:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id"
        )
        row = {"sf_dir": sf_dir, "docs": docs.count()}
        row["scan"] = best(lambda: docs.count())
        for stage in ("synth", "encode", "decode", "sample"):
            row[stage] = best(
                lambda s=stage: docs.mapInPandas(kernel(s), "v long").count()
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
