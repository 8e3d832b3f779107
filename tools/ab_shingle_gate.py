"""Interleaved A/B: shingles_for gate = plan-size estimate (new) vs
bounded limit-count job (old), same session, alternating rounds.
Times dedup_minhash_verified / dedup_jaccard_pairs / dedup_spans
through the noop sink. Usage: python tools/ab_shingle_gate.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from dataforge_spark.session import get_spark  # noqa: E402
from dataforge_spark.dedup import ngram_jaccard as nj  # noqa: E402


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_shingle_gate")
    qs = dict(entrymod.queries())
    names = ["dedup_minhash_verified", "dedup_jaccard_pairs", "dedup_spans"]

    new_gate = nj.shingles_for

    def old_gate(df, col, n=3):
        small = df.limit(nj.UDF_MIN_DOCS + 1).count() <= nj.UDF_MIN_DOCS
        return (nj.word_shingles_hof(col, n) if small
                else nj.word_shingles(col, n))

    res: dict[tuple[str, str], list[float]] = {}
    for r in range(rounds):
        for tag, gate in (("new", new_gate), ("old", old_gate)):
            nj.shingles_for = gate
            # minhash.py binds `shingles_for` at import time — patch there too
            from dataforge_spark.dedup import minhash as mh
            mh.shingles_for = gate
            for name in names:
                spark.sparkContext.setJobDescription(f"{tag}:{name}:r{r}")
                t0 = time.time()
                df = qs[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                res.setdefault((name, tag), []).append(time.time() - t0)
    nj.shingles_for = new_gate
    for name in names:
        for tag in ("old", "new"):
            runs = res[(name, tag)]
            print(f"{name:26s} {tag}: min {min(runs):6.3f}  "
                  f"runs {[round(x, 2) for x in runs]}")


if __name__ == "__main__":
    main()
