#!/usr/bin/env python
"""sf1-local falsifiability for the exact-audit volume knobs (r9, per the
r8 verdict's item 4).

Round 7/8 threaded `sample_frac`/`max_pairs` through the engine's two
super-linear exact-rescoring legs (`minhash_accuracy_audit` and the
containment audit's `shingle_overlap_pairs` call) and CLAIMED the knob
makes the exact leg's cost flat in corpus size. Round 8 proved exactly this
kind of claim falsifiable (the plain-LSH duplicate-quadratic); this script
measures the knob claim the same way: the audit at sf0.01 / sf0.1 /
sf1-local (10x, duplicate-heavy — scripts/make_sf1_local.py), FULL
population vs max_pairs=2000, wall-clock per leg.

Expectation to falsify: knob-on total time grows roughly with the LINEAR
stages (shingling + banding scale with corpus), while the exact-leg
surplus (full minus knob-on at the same scale, and knob-on growth beyond
the linear baseline) stays bounded — if knob-on time tracked the FULL
audit's super-linear growth, the knob would be decorative.

Usage: python scripts/scaling_audit_knobs.py [max_pairs]
Writes one JSON line per (scale, variant).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1-local", None),  # resolved to <repo>/.sf1_local below
]


def main(max_pairs: int) -> None:
    from dumpr_spark.functions import dedup as dd
    from dumpr_spark.session import get_spark

    spark = get_spark("scaling_audit_knobs")
    spark.sparkContext.setLogLevel("ERROR")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # the exact near-twin dup corpus the registered dedup queries use —
    # imported, not reimplemented, so a future corpus-convention change
    # cannot desynchronize this measurement from the queries it
    # characterizes (r9 review finding)
    from dumpr_spark.queries.llm import _dup_corpus

    def corpus(sf_dir: str):
        return _dup_corpus(spark, sf_dir, near=True)

    for label, sf_dir in SCALES:
        if sf_dir is None:
            sf_dir = os.path.join(repo, ".sf1_local")
            if not os.path.isdir(sf_dir):
                print(json.dumps({"scale": label, "skipped": "run make_sf1_local.py"}))
                continue
        c = corpus(sf_dir).localCheckpoint(eager=True)  # isolate audit cost
        n_docs = c.count()
        for variant, kwargs in (
            ("full", {}),
            (f"max_pairs={max_pairs}", {"max_pairs": max_pairs}),
        ):
            t0 = time.time()
            out = dd.minhash_accuracy_audit(c, **kwargs)
            n_pairs = out.count()
            dt = round(time.time() - t0, 2)
            print(json.dumps({
                "scale": label, "leg": "minhash_accuracy",
                "n_docs": n_docs, "variant": variant,
                "pairs_scored": n_pairs, "sec": dt,
            }), flush=True)
        # the OTHER knob-threaded exact leg (dedup_jaccard_containment's
        # shingle_overlap_pairs call — r9 review: the docstring framed
        # both legs but only one was measured)
        sig = dd.minhash_signature(c)
        cands_all = dd.lsh_candidate_pairs(dd.lsh_bands(sig), "doc_id")
        for variant, capped in (
            ("full", cands_all),
            (f"max_pairs={max_pairs}",
             dd.subset_candidate_pairs(cands_all, max_pairs=max_pairs)),
        ):
            t0 = time.time()
            n_pairs = dd.shingle_overlap_pairs(c, capped).count()
            dt = round(time.time() - t0, 2)
            print(json.dumps({
                "scale": label, "leg": "containment_overlap",
                "n_docs": n_docs, "variant": variant,
                "pairs_scored": n_pairs, "sec": dt,
            }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000)
