"""Per-round profile of bpe_train_batched at the bench 2048 shape (r12).

Replicates bench.py's md5 corpus and prints per-round wall time plus
the vocab partition count after the initial groupBy — the knobs the
round cost depends on.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import kingfisher_process_spark.functions.text as T
    from kingfisher_process_spark.session import get_spark

    spark = get_spark("kps-r12-bpeprof")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(10000)
    corpus = li.selectExpr(
        "md5(concat_ws('-', l_orderkey, l_linenumber)) AS h"
    ).selectExpr(
        "concat_ws('', transform(sequence(0, 15),"
        " i -> char(256 + cast(conv(substring(h, i*2+1, 2), 16, 10)"
        " AS INT)))) AS text")
    corpus.limit(1).collect()  # warm

    # monkeypatch _select_batch to log round boundaries
    orig = T._select_batch
    t_last = [time.perf_counter()]
    rounds = [0]

    def timed(cands, limit):
        now = time.perf_counter()
        rounds[0] += 1
        print(f"round {rounds[0]:3d}: count-job+fold {now - t_last[0]:.3f}s"
              f"  cands={len(cands)}", flush=True)
        out = orig(cands, limit)
        t_last[0] = time.perf_counter()
        return out

    T._select_batch = timed
    t0 = time.perf_counter()
    merges, nrounds = T.bpe_train_batched(corpus, n_merges=n_merges,
                                          batch=batch)
    total = time.perf_counter() - t0
    T._select_batch = orig
    print(f"TOTAL {total:.2f}s  rounds={nrounds} merges={len(merges)}")


if __name__ == "__main__":
    main()
