#!/usr/bin/env python
"""Build every persisted serving index for a corpus in one pass — the
operational entry point for the build-once index discipline (the
reference runs init_db.sql once to create its HNSW + GIN indexes,
scripts/init_db.sql:53-67; this is the engine's equivalent).

Builds, idempotently per corpus dir:
- sign-LSH ANN bucket index      (plans/search.py::build_ann_index)
- MinHash band-bucket dedup index (plans/dedup.py::build_minhash_index)
- IVF+PQ code index + codebook    (plans/search.py::build_pq_index)
- full-text postings index        (plans/search.py::build_text_index)

Usage: python scripts/build_indexes.py [sf_dir ...]
       (default: /root/testdata/sf0.001 /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    from email_etl_spark.session import get_spark

    spark = get_spark("build-indexes")
    spark.sparkContext.setLogLevel("ERROR")

    from email_etl_spark.plans.dedup import build_minhash_index
    from email_etl_spark.plans.search import build_ann_index, build_pq_index, build_text_index

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    for sf_dir in sf_dirs:
        for name, build in (
            ("ann_lsh", build_ann_index),
            ("minhash", build_minhash_index),
            ("ivf_pq", build_pq_index),
            ("text", build_text_index),
        ):
            t0 = time.time()
            out = build(spark, sf_dir)
            print(f"{sf_dir} {name}: {out} ({time.time() - t0:.1f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
