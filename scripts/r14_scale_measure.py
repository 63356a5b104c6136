"""Round-14 scale measurements for SCALE.md: language-id throughput and
the persisted IVF∘PQ path at sf1 (the new-this-round components the
per-round bench registry doesn't cover).

Usage: python scripts/r14_scale_measure.py [sf_dir]  (default .scale/sf1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vectrekker_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    spark = get_spark(app_name="r14-scale")

    # ---- language id throughput -------------------------------------
    import random

    from vectrekker_spark.operators.langid import fit_langid, predict_lang

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    # train on a tiny planted bilingual set (throughput doesn't care about
    # label fidelity on the real corpus; the fixture is the accuracy test)
    rng = random.Random(14)
    lat = [(" ".join("the quick brown words of prose text".split()[
        rng.randrange(7)] for _ in range(25)), "lat") for _ in range(40)]
    cyr = [(" ".join("".join(rng.choice("абвгдежзик") for _ in range(5))
                     for _ in range(25)), "cyr") for _ in range(40)]
    model = fit_langid(
        spark.createDataFrame(lat + cyr, "text string, lang string"),
        n_features=1 << 14, iters=100,
    )
    t0 = time.perf_counter()
    out = predict_lang(docs, model, conf_col=None)
    n_pred = out.where(F.col("lang").isNotNull()).count()
    dt = time.perf_counter() - t0
    print(f"langid: {n_docs} docs, {n_pred} predicted, "
          f"{dt:.1f}s = {n_docs / dt:,.0f} docs/s")

    # ---- persisted IVF∘PQ at scale ----------------------------------
    import shutil
    import tempfile

    from vectrekker_spark.operators.ann import ivf_build
    from vectrekker_spark.operators.pq import (
        ivfpq_save,
        ivfpq_search,
        ivfpq_search_cells,
        pq_encode,
        pq_search,
        pq_train,
    )

    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).cache()
    n_vec = em.count()
    n_cells = max(2, min(1024, int(n_vec ** 0.5)))
    t0 = time.perf_counter()
    centroids, assign = ivf_build(em, n_centroids=n_cells, assign_k=1)
    assign = assign.cache()
    assign.count()
    t_ivf = time.perf_counter() - t0
    t0 = time.perf_counter()
    cb = pq_train(em, m=16, nbits=8, sample_fraction=min(1.0, 50_000 / n_vec))
    cb = cb.cache()
    cb.count()
    t_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    codes = pq_encode(em, cb).cache()
    codes.count()
    t_enc = time.perf_counter() - t0
    path = tempfile.mkdtemp(prefix="r14_ivfpq_")
    t0 = time.perf_counter()
    ivfpq_save(path, cb, centroids, assign, codes)
    t_save = time.perf_counter() - t0
    print(f"ivfpq build at n={n_vec}: ivf {t_ivf:.1f}s, pq_train "
          f"{t_train:.1f}s, encode {t_enc:.1f}s, save {t_save:.1f}s "
          f"({n_cells} cells)")

    q = em.where(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    ).cache()
    q.count()
    n_probe = max(1, n_cells // 16)

    t0 = time.perf_counter()
    r1 = ivfpq_search_cells(q, path, k=10, n_probe=n_probe).count()
    t_cells = time.perf_counter() - t0
    t0 = time.perf_counter()
    r2 = ivfpq_search(q, codes, cb, centroids, assign, k=10,
                      n_probe=n_probe).count()
    t_mem = time.perf_counter() - t0
    t0 = time.perf_counter()
    r3 = pq_search(q, codes, cb, k=10).count()
    t_full = time.perf_counter() - t0
    print(f"search 100 queries, n_probe={n_probe}/{n_cells}: "
          f"persisted partition-pruned {t_cells:.1f}s ({r1} rows), "
          f"in-memory assignment-join {t_mem:.1f}s ({r2} rows), "
          f"full-scan ADC {t_full:.1f}s ({r3} rows)")
    shutil.rmtree(path, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
