"""Scaling evidence for the multimodal family: push synthetic binary
payloads through the Arrow-batched `mapInPandas` stages (feature
extraction 1->1, frame sampling 1->N) and report rows/s and MB/s — the
codec bodies are stubs, so what this measures is exactly the part that
stays when a real decoder is swapped in: Arrow transfer + Python batch
iteration + schema plumbing.

    python scripts/scaling_multimodal.py [n_rows] [payload_bytes]

Prints one JSON line (SCALE.md records a representative run).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from agile_lakehouse_spark import get_session
from agile_lakehouse_spark.operators import multimodal


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    spark = get_session("scaling-multimodal")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic payloads generated executor-side: `size` pseudo-random
    # bytes per row from xxhash64 (no driver data)
    payload = F.expr(
        f"CAST(concat_ws('', transform(sequence(1, {size // 16}), "
        "j -> substr(md5(concat(CAST(id AS STRING), '_', CAST(j AS STRING))), 1, 16))) AS BINARY)"
    )
    media = multimodal.as_media_table(spark.range(n).select("id", payload.alias("p")), "id", F.col("p"))
    media = media.repartition(64).persist()
    media.count()
    mb = n * size / 1e6

    t0 = time.time()
    feats = multimodal.extract_features(media)
    n_out = feats.count()
    feat_s = round(time.time() - t0, 2)
    assert n_out == n

    t0 = time.time()
    frames = multimodal.sample_frames(media, every_n_bytes=max(256, size // 4), max_frames=4)
    n_frames = frames.count()
    frame_s = round(time.time() - t0, 2)

    media.unpersist()

    # REAL compressed decode throughput (round 5): encode -> decode PNG
    # 16x16 images through the mapInPandas codec stage — zlib inflate +
    # un-filter per row, the pipeline a real image corpus pays
    docs = spark.range(n // 10 or 1).select(F.col("id").alias("doc_id"))
    png_media = multimodal.synthesize_image_media(
        docs, "doc_id", width=16, height=16, container="png"
    ).persist()
    png_media.count()  # materialize: encode cost excluded from decode timing
    t0 = time.time()
    n_png = multimodal.image_stats(png_media).count()
    png_s = round(time.time() - t0, 2)
    assert n_png == (n // 10 or 1)
    png_media.unpersist()
    print(
        json.dumps(
            {
                "n_rows": n,
                "payload_bytes": size,
                "extract_s": feat_s,
                "extract_rows_per_s": round(n / feat_s),
                "extract_mb_per_s": round(mb / feat_s, 1),
                "frames_s": frame_s,
                "n_frames": n_frames,
                "frames_rows_per_s": round(n / frame_s),
                "png_decode_s": png_s,
                "png_images": n_png,
                "png_decode_imgs_per_s": round(n_png / png_s),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
