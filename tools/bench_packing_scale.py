"""Sequence-packing decade measurement (re-run for the r9 FFD rewrite).

Usage: python tools/bench_packing_scale.py [sf_dir] [cpus] [seq_len]

Measures pack_sequences (concat-and-chunk) and pack_ffd (whole-doc FFD,
now leftmost-fit-tree + auto shards) over the corpus at sf_dir; wall
includes the whitespace token-count scan that feeds both, matching the
r8 SCALE.md rows (256 shards for chunk mode; FFD uses its new default).
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hyperdx_spark.pipeline.packing import pack_ffd, pack_sequences  # noqa: E402
from hyperdx_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    seq_len = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    spark = get_spark("packing-scale", cpus=cpus)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.size(F.split("text", r"\s+")).alias("n_tokens"))
    )
    out: dict = {"sf_dir": sf_dir, "seq_len": seq_len, "n_docs": docs.count()}

    t0 = time.time()
    n_spans = pack_sequences(docs, seq_len, num_shards=256).count()
    out["chunk_s"] = round(time.time() - t0, 2)
    out["chunk_spans"] = n_spans

    t0 = time.time()
    n_rows = pack_ffd(docs, seq_len).count()  # new auto-shard default
    out["ffd_s"] = round(time.time() - t0, 2)
    out["ffd_rows"] = n_rows

    print(json.dumps(out))


if __name__ == "__main__":
    main()
